package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Dedup, Multimodal, Relational, Similarity, StreamThrough, TextAnalysis, TrainingPipeline}

/** The user-facing operator surface, named 1:1 after the reference
  * lineage's operators (SURVEY.md §2) so a reference user can map every
  * statement of an existing script onto one call here. Each method is a
  * thin, documented delegation to the idiomatic-Spark implementation —
  * the DataFrame stays the universal currency, so Engine calls compose
  * freely with raw DataFrame code.
  *
  * Pig-script shape:                      Engine shape:
  * {{{
  * A = LOAD 'p' USING PigStorage(',');    val a = Engine.load(spark, "p", "csv")
  * B = FILTER A BY q > 5;                 val b = Engine.filter(a, col("q") > 5)
  * C = FOREACH B GENERATE x, y+1 AS z;    val c = Engine.foreach(b, col("x"), (col("y")+1).as("z"))
  * G = GROUP C BY x;                      val g = Engine.groupAsBags(c, Seq("x"))
  * R = FOREACH G GENERATE group, COUNT(C);    // prefer aggregate(c, ...) — see groupAsBags scaladoc
  * S = ORDER R BY x; STORE S INTO 'out';  Engine.store(Engine.order(r, col("x").asc), "out")
  * }}}
  *
  * Macros (`DEFINE ... RETURNS`) are plain Scala `DataFrame => DataFrame`
  * functions applied with `.transform(...)`; parameter substitution
  * (`%declare`) is ordinary Scala values — both are language features
  * here rather than engine machinery.
  */
object Engine {

  /** AvroStorage (SURVEY §2.1): the Avro reader/writer is compiled into
    * spark-sql itself; deployments without the separate spark-avro
    * module lack only the service registration that resolves the bare
    * name "avro" — pass this explicit provider class instead. */
  val AvroFormat = "org.apache.spark.sql.avro.AvroFileFormat"

  // ---------------- LOAD / STORE / DUMP (SURVEY §2.1) ----------------

  def load(spark: SparkSession, path: String, format: String = "parquet",
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.format(format).options(options).load(path)

  /** PigStorage equivalent: delimited text w/ positional columns. */
  def loadDelimited(spark: SparkSession, path: String, delimiter: String = "\t"): DataFrame =
    spark.read.option("delimiter", delimiter).csv(path)

  def store(df: DataFrame, path: String, format: String = "parquet"): Unit =
    df.write.format(format).mode("overwrite").save(path)

  def dump(df: DataFrame, n: Int = 20): Unit = df.show(n, truncate = false)

  // ---------------- row-level ops (§2.2) ----------------

  /** FOREACH ... GENERATE — projection + scalar computation. */
  def foreach(df: DataFrame, exprs: Column*): DataFrame = df.select(exprs: _*)

  def filter(df: DataFrame, cond: Column): DataFrame = df.filter(cond)

  /** FOREACH ... GENERATE FLATTEN(bagCol) — one output row per element. */
  def flatten(df: DataFrame, bagCol: String, as: String): DataFrame =
    df.withColumn(as, explode(col(bagCol))).drop(bagCol)

  def split(df: DataFrame, branches: Seq[(String, Column)],
      otherwise: Option[String] = None): Map[String, DataFrame] =
    Relational.split(df, branches, otherwise)

  /** SAMPLE p — Bernoulli row sample (seeded for reproducibility). */
  def sample(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(fraction, seed)

  def assertBy(df: DataFrame, cond: Column, msg: String): DataFrame =
    Relational.assertRows(df, cond, msg)

  /** STREAM A THROUGH 'cmd' — external process pipe per partition. */
  def streamThrough(df: DataFrame, command: Seq[String], outputCols: Seq[String]): DataFrame =
    StreamThrough(df, command, outputCols)

  /** Multi-sink STORE (the reference's MultiQueryOptimizer case,
    * SURVEY §4.2): several sinks sharing one upstream scan. The shared
    * parent is persisted (spillable) for the duration of the writes so
    * the scan runs once, then released. */
  def multiStore(shared: DataFrame, sinks: (DataFrame => DataFrame, String)*): Unit = {
    val parent = shared.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try sinks.foreach { case (branch, path) => store(branch(parent), path) }
    finally { parent.unpersist(); () }
  }

  // ---------------- grouping (§2.3) ----------------

  /** GROUP ... BY followed by aggregation — the 99% case. Never builds
    * bags; partial aggregation is automatic. */
  def aggregate(df: DataFrame, keys: Seq[String], aggs: Column*): DataFrame =
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)

  /** Literal Pig GROUP semantics: (group, bag{tuple}). Only use when the
    * script manipulates the bag structurally — for plain aggregation use
    * [[aggregate]]; bags materialize whole groups (SURVEY §7.5.1). */
  def groupAsBags(df: DataFrame, keys: Seq[String], bagName: String = "bag"): DataFrame = {
    val valueCols = df.columns.filterNot(keys.contains).map(col)
    df.groupBy(keys.map(col): _*).agg(collect_list(struct(valueCols: _*)).as(bagName))
  }

  def groupAll(df: DataFrame, aggs: Column*): DataFrame = df.agg(aggs.head, aggs.tail: _*)

  def cogroup(keyNames: Seq[String], inputs: (String, DataFrame, Seq[String])*): DataFrame =
    Relational.cogroup(keyNames, inputs: _*)

  def distinct(df: DataFrame): DataFrame = df.distinct()

  def cube(df: DataFrame, dims: Seq[Column], aggs: Column*): DataFrame =
    df.cube(dims: _*).agg(aggs.head, aggs.tail: _*)

  def rollup(df: DataFrame, dims: Seq[Column], aggs: Column*): DataFrame =
    df.rollup(dims: _*).agg(aggs.head, aggs.tail: _*)

  // ---------------- joins (§2.4) ----------------

  /** JOIN ... BY (default hash/shuffle strategy; Catalyst + AQE pick
    * SMJ/shuffled-hash and handle skew). */
  def join(left: DataFrame, right: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame = left.join(right, cond, joinType)

  /** USING 'replicated' — explicit broadcast of the small side. */
  def joinReplicated(left: DataFrame, small: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame = left.join(broadcast(small), cond, joinType)

  /** USING 'skewed' — AQE skew-join handles this automatically; kept as
    * a named strategy for script parity. */
  def joinSkewed(left: DataFrame, right: DataFrame, cond: Column,
      joinType: String = "inner"): DataFrame = left.join(right, cond, joinType)

  def semiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_semi")

  def antiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "left_anti")

  def cross(left: DataFrame, right: DataFrame): DataFrame = left.crossJoin(right)

  def asofJoin(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, rightPayload: Seq[String],
      rightTiebreak: String): DataFrame =
    AsOfJoin.asofLeft(left, right, leftKey, rightKey, leftTime, rightTime,
      rightPayload, rightTiebreak)

  /** Bloom pre-filter for a big⋈small join (Pig BuildBloom/Bloom). */
  def bloomPrefilter(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
      expectedItems: Long = 1000000L): DataFrame =
    Relational.bloomSemiFilter(big, bigKey, small, smallKey, expectedItems)

  // ---------------- ordering / ranking / limiting (§2.5) ----------------

  /** ORDER ... BY — total order via range partitioning (built-in). */
  def order(df: DataFrame, cols: Column*): DataFrame = df.orderBy(cols: _*)

  def limit(df: DataFrame, n: Int): DataFrame = df.limit(n)

  /** RANK A BY keys — scalable two-pass global rank (no single-partition
    * window); adds `rank` and `dense_rank` columns. */
  def rank(df: DataFrame, keys: Seq[String], ascending: Boolean = true): DataFrame =
    Relational.rankBy(df, keys, ascending)

  /** TOP(n, field, per-group) — bounded per-group top-k. */
  def top(df: DataFrame, groupCols: Seq[String], orderCol: String, n: Int,
      tiebreak: String): DataFrame =
    Relational.topPerGroup(df, groupCols, orderCol, n, tiebreak)

  def union(dfs: DataFrame*): DataFrame = dfs.reduce(_ unionAll _)

  /** UNION ONSCHEMA — align by name, missing columns null. */
  def unionOnSchema(dfs: DataFrame*): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  def intersect(a: DataFrame, b: DataFrame): DataFrame = a.intersect(b)
  def except(a: DataFrame, b: DataFrame): DataFrame = a.except(b)

  // ---------------- LLM-pipeline extensions (§7.1) ----------------

  def dedupExact(df: DataFrame, cols: Seq[String]): DataFrame = df.dropDuplicates(cols)

  def dedupFuzzy(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame =
    Dedup.fuzzyDupPairs(df, idCol, textCol, threshold = threshold)

  def similarTopK(corpus: DataFrame, queries: DataFrame, corpusId: String,
      queryId: String, vecCol: String, k: Int, approximate: Boolean = false): DataFrame =
    if (approximate) Similarity.lshTopK(corpus, queries, corpusId, queryId, vecCol, k)
    else Similarity.bruteForceTopK(corpus, queries, corpusId, queryId, vecCol, k)

  def languageId(df: DataFrame, textCol: String, as: String = "lang_pred"): DataFrame =
    df.withColumn(as, TextAnalysis.langId(col(textCol)))

  def qualityScore(df: DataFrame, textCol: String, as: String = "quality"): DataFrame =
    df.withColumn(as, TextAnalysis.qualityScore(col(textCol)))

  def fingerprint(df: DataFrame, textCol: String, as: String = "fp"): DataFrame =
    df.withColumn(as, TextAnalysis.docFingerprint(col(textCol)))

  def packMedia(df: DataFrame, srcCol: String, mime: String): DataFrame =
    Multimodal.packMedia(df, srcCol, mime)

  // round-6 surface: semantic dedup, repetition/classifier quality
  // signals, cross-doc repeats, tokenizer induction, index + codes

  def dedupSemantic(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, tau: Double = 0.9): DataFrame =
    Similarity.semDedup(df, idCol, vecCol, k, tau)

  def repetitionSignals(df: DataFrame, textCol: String, n: Int = 2,
      as: String = "repetition"): DataFrame =
    df.withColumn(as, TextAnalysis.repetitionFeatures(col(textCol), n))

  def classifierScore(df: DataFrame, textCol: String,
      as: String = "cls"): DataFrame =
    df.withColumn(as, TextAnalysis.hashClassifierScore(col(textCol)))

  def crossDocRepeats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 5): DataFrame =
    TextAnalysis.crossDocRepeats(df, idCol, textCol, n)

  def bpePairCounts(df: DataFrame, textCol: String, topK: Int = 20): DataFrame =
    TextAnalysis.bpePairCounts(df, textCol, topK)

  def invertedIndex(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame =
    TextAnalysis.invertedIndex(df, idCol, textCol, k)

  def quantizeEmbeddings(df: DataFrame, vecCol: String,
      as: String = "q8"): DataFrame =
    df.withColumn(as, Similarity.quantizeInt8(col(vecCol)))

  // round-7 surface: paper-scale semantic dedup (broadcast centroids /
  // per-cluster LSH prune / fitted centroids), exact-substring spans,
  // full BPE training

  def dedupSemanticLsh(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, tau: Double = 0.9, planes: Int = 10, bands: Int = 4): DataFrame =
    Similarity.semDedupLsh(df, idCol, vecCol, k, tau, planes, bands)

  def fitCentroids(df: DataFrame, vecCol: String, k: Int,
      iters: Int = 5, sampleN: Int = 100000, init: String = "auto"): DataFrame =
    Similarity.kMeansFit(df, vecCol, k, iters, sampleN, init)

  def assignClusters(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame =
    Similarity.assignByCentroidTable(df, idCol, vecCol, centroids)

  def verbatimSpans(df: DataFrame, idCol: String, textCol: String,
      minLen: Int = 20, maxDocFreq: Int = 50): DataFrame =
    Dedup.verbatimSpans(df, idCol, textCol, minLen, maxDocFreq)

  def bpeTrain(df: DataFrame, textCol: String, nMerges: Int)
      : (Seq[TextAnalysis.BpeMerge], DataFrame) = {
    // route through the incremental trainer (zero per-merge Spark
    // jobs); the legacy one-job-per-merge loop survives only as the
    // parity oracle inside graft (TextAnalysis.bpeTrain)
    val (merges, vocab, _) = TextAnalysis.bpeTrainIncremental(df, textCol, nMerges)
    (merges, vocab)
  }

  // round-8 surface: exact-substring REMOVAL, BPE apply-side, exact
  // heavy hitters (+ hot n-grams), hard token budgets

  def hotNgrams(df: DataFrame, textCol: String, n: Int, minCount: Long,
      capacity: Int = 131072): DataFrame =
    TextAnalysis.hotNgrams(df, textCol, n, minCount, capacity)

  /** IVF ANN over FITTED centroids — compose [[fitCentroids]] with the
    * IVF cell machinery (fitted cells route queries where their
    * neighbors actually live; a hash-sampled centroid set can leave a
    * dense region unrepresented at the same nProbe). */
  def annTopKFitted(corpus: DataFrame, queries: DataFrame,
      corpusId: String, queryId: String, vecCol: String, k: Int,
      centroids: DataFrame, nProbe: Int = 4): DataFrame =
    Similarity.ivfTopKWithCentroids(corpus, queries, corpusId, queryId,
      vecCol, k, centroids, nProbe)

  def removeVerbatimSpans(df: DataFrame, idCol: String, textCol: String,
      minLen: Int = 20, maxDocFreq: Int = 50): DataFrame =
    Dedup.removeVerbatimSpans(df, idCol, textCol, minLen, maxDocFreq)

  def bpeEncode(df: DataFrame, textCol: String,
      merges: Seq[TextAnalysis.BpeMerge], as: String = "bpe"): DataFrame =
    df.withColumn(as, TextAnalysis.bpeEncode(col(textCol), merges))

  def heavyHitters(df: DataFrame, textCol: String, minCount: Long,
      capacity: Int = 4096): DataFrame =
    TextAnalysis.heavyHitters(df, textCol, minCount, capacity)

  def tokenBudgetSample(df: DataFrame, groupCol: String, idCol: String,
      textCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L): DataFrame =
    TrainingPipeline.tokenBudgetSample(df, groupCol, idCol, textCol,
      budgets, defaultBudget)

  /** Product-quantization codebooks for [[annTopKPq]] (round 9). */
  def pqTrain(df: DataFrame, vecCol: String, m: Int, nCodes: Int = 256,
      iters: Int = 5): graft.plans.PqCodebooks =
    Similarity.pqTrain(df, vecCol, m, nCodes, iters)

  /** IVF-PQ ANN with optional exact refine (round 9): the corpus ships
    * m code bytes per row through the cell shuffle, not embeddings. */
  def annTopKPq(corpus: DataFrame, queries: DataFrame,
      corpusId: String, queryId: String, vecCol: String, k: Int,
      centroids: DataFrame, pq: graft.plans.PqCodebooks,
      nProbe: Int = 4, refine: Int = 0): DataFrame =
    Similarity.ivfPqTopK(corpus, queries, corpusId, queryId, vecCol, k,
      centroids, pq, nProbe, refine)

  /** DSIR-style hashed-n-gram importance weights (round 9). */
  def importanceWeights(source: DataFrame, target: DataFrame,
      idCol: String, textCol: String): DataFrame =
    TrainingPipeline.importanceWeights(source, target, idCol, textCol)

  /** Streaming near-dup verdicts over a staged doc stream (round 9);
    * see [[graft.streaming.CurationStreaming]]. */
  def streamNearDupVerdicts(spark: org.apache.spark.sql.SparkSession,
      stagedDir: String, numHashes: Int = 128, bands: Int = 16): DataFrame =
    graft.streaming.CurationStreaming.streamNearDupVerdicts(
      spark, stagedDir, numHashes, bands)

  /** Deterministic training export: md5-nibble shards + a read-back
    * manifest proving completeness (round 9). */
  def exportShards(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, outDir: String): DataFrame =
    TrainingPipeline.exportShards(docs, idCol, textCol, nShards, outDir)

  /** Train the hashed linear quality classifier in-engine (round 9):
    * deterministic distributed logistic regression over the same
    * md5-bucket features [[classifierScore]] applies. */
  def trainClassifier(docs: DataFrame, textCol: String, labelCol: String,
      dim: Int = 1024, iters: Int = 10, lr: Double = 0.5)
      : graft.operators.ClassifierTrain.Fit =
    graft.operators.ClassifierTrain.fit(docs, textCol, labelCol, dim, iters, lr)

  /** Score with a trained classifier fit: P(label) per row. */
  def classifierProb(df: DataFrame, textCol: String,
      fit: graft.operators.ClassifierTrain.Fit, dim: Int = 1024,
      as: String = "p"): DataFrame =
    df.withColumn(as, graft.operators.ClassifierTrain.score(col(textCol), fit, dim))

  /** One-call training-data curation: language/quality filter -> exact
    * dedup -> fuzzy dedup clusters -> token annotations. */
  def curate(df: DataFrame, idCol: String, textCol: String,
      cfg: TrainingPipeline.Config = TrainingPipeline.Config()): DataFrame =
    TrainingPipeline.curate(df, idCol, textCol, cfg)
}
