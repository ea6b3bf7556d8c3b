package graft.operators

import graft.core.GraftSession.Materialize
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the composition the
  * LLM-pipeline extension operators exist for (SURVEY.md §7.1): filter
  * by language and quality, drop exact duplicates deterministically,
  * collapse fuzzy duplicate clusters to one canonical doc, and annotate
  * token counts — as ONE declarative dataflow.
  *
  * Dataflow (each stage a documented operator, composed with
  * `DataFrame.transform` like Pig macros):
  *
  *   docs
  *     │ langId / qualityScore annotations   (expressions, no shuffle)
  *     │ filter(lang ∈ keep, quality ≥ τ)
  *     │ exact dedup: md5 fingerprint groupBy, keep min id  (1 shuffle)
  *     │ fuzzy dedup: MinHash LSH → Jaccard verify → CC clusters,
  *     │              keep cluster min id                   (LSH shuffles)
  *     │ token counts annotation
  *     ▼
  *   curated corpus
  *
  * At 100 TB: every stage is the scale-shaped variant (banded LSH, no
  * all-pairs; bounded label propagation; fan-out before per-row heavy
  * compute). Nothing collects to the driver.
  */
object TrainingPipeline {

  final case class Config(
      keepLangs: Set[String] = Set("en", "und"),
      minQuality: Double = 0.5,
      fuzzyThreshold: Double = 0.8,
      // round-6 gates: Gopher repetition thresholds (permissive
      // defaults — refuse only the degenerate tail) and the hashed
      // -feature classifier floor (0 = gate off)
      maxDupNgramFrac: Double = 0.9,
      maxTopNgramCharFrac: Double = 0.6,
      minClassifierPpm: Long = 0L,
      // round-8 gate: exact-substring span removal over the SURVIVORS
      // (0 = off). Appends text_clean / tokens_removed / tokens_kept
      // (Lee et al.: cut all-but-one copy of every >=minLen-token
      // verbatim overlap; the min-id doc keeps its copy).
      spanRemoveMinLen: Int = 0,
      spanRemoveMaxDocFreq: Int = 50)

  /** Deterministic stratified sample at scale: exactly `n` docs per
    * stratum, keyed by md5(id) so every engine/partitioning picks the
    * SAME rows (the q63 contract), but built on the bounded
    * [[graft.functions.Aggregators.TopKByScore]] aggregator instead of
    * a per-stratum window: a window sorts EVERY row of a stratum (and
    * a 5-language corpus caps parallelism at 5 sort groups); the
    * aggregator reduces each map task's slice to ≤ n candidates, so
    * the shuffle carries n-element states per (stratum, partition)
    * regardless of corpus size.
    *
    * Ordering note: the aggregator ranks by the first 13 md5 nibbles
    * (52 bits — exactly representable in the Double score), which
    * equals the full-hash lexicographic order unless two ids collide
    * on all 52 bits (~2^-52 per pair — not a realistic tie source;
    * ids break ties).
    *
    * Non-integral id columns (string doc ids are the norm in web
    * corpora) can't ride in the aggregator's (Double, Long) state;
    * they transparently fall back to the same id-type-generic window
    * formulation [[Similarity.boundedTopK]] uses — identical selection
    * (md5-prefix order, id tiebreak), shuffles scored rows instead of
    * n-element states. */
  def stratifiedSample(docs: DataFrame, strataCol: String, idCol: String, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val integral = docs.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    // score DESC in the aggregator/window == md5-prefix ASC via negation
    val score =
      -conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10).cast("double")
    if (!integral) {
      val scored = docs.select(
        col(strataCol).as("__stratum"), col(idCol).as("__id"), score.as("__score"))
      Relational.topPerGroup(scored, Seq("__stratum"), "__score", n, "__id")
        .select(col("__id").as(idCol), col("__stratum").as(strataCol),
          col("rn").cast("long").as("rn"))
    } else {
      val scored = docs.select(
        col(strataCol).as("__stratum"),
        col(idCol).cast("long").as("__id"),
        score.as("__score"))
      scored.as[(String, Long, Double)]
        .groupByKey(_._1)
        .mapValues(t => (t._3, t._2))
        .agg(new graft.functions.Aggregators.TopKByScore(n).toColumn)
        .flatMap { case (stratum, top) =>
          top.iterator.zipWithIndex.map { case ((_, id), i) => (id, stratum, (i + 1).toLong) }
        }
        .toDF(idCol, strataCol, "rn")
    }
  }

  /** Annotate every doc (kept or not) with the curation signals. */
  def annotate(docs: DataFrame, textCol: Column): DataFrame = docs
    .withColumn("lang_pred", TextAnalysis.langId(textCol))
    .withColumn("quality", TextAnalysis.qualityScore(textCol))
    .withColumn("fp", TextAnalysis.docFingerprint(textCol))
    .withColumn("ws_tokens", TextAnalysis.wsTokenCount(textCol))
    .withColumn("bpeish_tokens", TextAnalysis.bpeishTokenCount(textCol))

  /** Full curation: returns the curated corpus (one row per surviving
    * doc, with annotations and the dedup bookkeeping columns). */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): DataFrame = {
    val annotated = annotate(docs, col(textCol))
    val filtered = annotated
      .filter(col("lang_pred").isin(cfg.keepLangs.toSeq.map(x => x: Any): _*))
      .filter(col("quality") >= cfg.minQuality)
      // Gopher repetition + classifier gates (round 6): still pure
      // per-row expressions, so the whole filter stack is one
      // scan-resident stage before any shuffle
      .withColumn("__rep", TextAnalysis.repetitionFeatures(col(textCol), 2))
      .filter(col("__rep.dup_ngram_frac") <= cfg.maxDupNgramFrac &&
        col("__rep.top_ngram_char_frac") <= cfg.maxTopNgramCharFrac)
      .withColumn("__cls", TextAnalysis.hashClassifierScore(col(textCol)))
      .filter(col("__cls.score_ppm") >= cfg.minClassifierPpm)
      .drop("__rep", "__cls")

    // exact dedup on the canonical fingerprint: deterministic winner
    val exactWinners = filtered
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_exact_dups"))
      .join(filtered, Seq(idCol, "fp"))

    // fuzzy dedup: cluster near-dups among the exact-unique docs,
    // keep the cluster's min id
    val assignments = Dedup.dedupAssignments(
      exactWinners.select(col(idCol), col(textCol)), idCol, textCol,
      threshold = cfg.fuzzyThreshold)
    val survivors = exactWinners
      .join(assignments, Seq(idCol))
      .filter(col("keep_id") === col(idCol))
      .drop("keep_id")

    // optional final stage: exact-substring span REMOVAL over the
    // deduped survivors (doc-level dedup first, then span-level —
    // running span removal before doc dedup would pay the window
    // index for docs that are about to be dropped whole)
    if (cfg.spanRemoveMinLen <= 0) survivors
    else survivors.join(
      Dedup.removeVerbatimSpans(
          survivors.select(col(idCol), col(textCol)), idCol, textCol,
          cfg.spanRemoveMinLen, cfg.spanRemoveMaxDocFreq)
        .select(col(idCol), col("text_clean"),
          col("tokens_removed"), col("tokens_kept")),
      Seq(idCol))
  }

  /** Deterministic epoch shuffle — the training-order op: a stable
    * pseudo-random permutation of the corpus per `seed`, reproducible
    * across engines, partitionings, and reruns (the property a
    * data-loader checkpoint needs). Key = md5("seed:id") — uniform and
    * engine-portable (any SQL engine computes the same hex); the
    * global order index comes from the two-pass zero-skew sequence
    * ([[Relational.rankSequence]]: range-sort then per-partition
    * offsets from bounded count longs), NOT a single-partition window
    * — at 100 TB a window over a global ORDER BY is one task sorting
    * the world. */
  /** Sequence packing — assign documents to consecutive fixed-budget
    * training sequences (the step between token chunking and
    * batching): within each shard, docs in deterministic id order are
    * laid on a concatenated token stream and `seq_id =
    * floor(exclusive-prefix-tokens / budget)` — the standard
    * concatenated-stream packing (a doc may straddle a boundary; the
    * loader masks across the seam).
    *
    * Shape at 100 TB: one shuffle on the shard key; the running sum is
    * a window per shard, so per-shard row counts must be bounded —
    * which is exactly what [[graft.SparkEntry]]'s shard-assignment op
    * (q66) guarantees upstream. Deterministic in (shard, id), so any
    * retry/partitioning produces identical sequence ids. */
  def packSequences(docs: DataFrame, shardCol: String, idCol: String,
      tokens: Column, budgetTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs.withColumn("__tok", tokens)
      .withColumn("seq_id",
        coalesce(floor(sum(col("__tok")).over(w) / budgetTokens), lit(0))
          .cast("long"))
      .drop("__tok")
  }

  /** Temperature-based mixture resampling — the data-mixing step of
    * every multi-source pretraining run: per-source token masses t_i
    * become sampling weights w_i = t_i^τ / Σ t_j^τ (τ < 1 upweights
    * small sources), a token budget B = budgetFrac · Σ t_i allocates
    * target_i = B · w_i per source, and each doc keeps with rate
    * min(1, target_i / t_i) — decided DETERMINISTICALLY by the doc's
    * md5-fraction (first 6 nibbles → u ∈ [0,1), exact small-integer
    * arithmetic, so any engine / retry / partitioning keeps the same
    * docs; same contract as q63/q75).
    *
    * Scale shape: one aggregate over docs for the per-source masses
    * (few sources → a broadcast rate table), then a pure per-row
    * filter — no sort, no window, no per-source top-k; the expected
    * budget error is binomial (O(1/√n_i) per source), which is what
    * production mixers accept in exchange for a shuffle-free pass. */
  def temperatureMixture(docs: DataFrame, idCol: String, sourceCol: String,
      tokenCount: Column, tau: Double, budgetFrac: Double): DataFrame = {
    val masses = docs.groupBy(col(sourceCol))
      .agg(sum(tokenCount).cast("double").as("t_i"))
    val z = masses.agg(sum(pow(col("t_i"), tau)).as("z"),
      sum(col("t_i")).as("t_total"))
    val rates = masses.crossJoin(broadcast(z)) // 1 row by construction
      .select(col(sourceCol),
        least(lit(1.0),
          pow(col("t_i"), tau) / col("z") * lit(budgetFrac) * col("t_total") / col("t_i"))
          .as("rate"))
    docs.join(broadcast(rates), sourceCol)
      .filter(md5Fraction(idCol) < col("rate"))
      .select(col(idCol), col(sourceCol))
  }

  /** Deterministic uniform-in-[0,1) draw per id: the first 6 md5
    * nibbles as a dyadic fraction — exact small-integer arithmetic, so
    * any engine / retry / partitioning draws the same value (q63/q75
    * contract; the DuckDB oracles replay it digit by digit). */
  private[operators] def md5Fraction(idCol: String): Column =
    (0 until 6).map { k =>
      (expr(s"position(substring(md5(cast($idCol as string)), ${k + 1}, 1) " +
        "IN '0123456789abcdef')") - 1).cast("double") / math.pow(16.0, k + 1)
    }.reduce(_ + _)

  /** Curation funnel report — per-stage survivor accounting for a
    * cumulative filter chain ("input → lang → length → dedup → …"),
    * the observability artifact every production curation run ships
    * with its output.
    *
    * Scale shape: ONE scan, not one pass per stage. Each row computes
    * the deepest stage it survives (a cumulative-AND chain folded into
    * a codegen'd integer), a tiny groupBy(level) aggregates docs +
    * tokens per level (≤ stages+1 rows), and the suffix sums that turn
    * "failed at level k" into "survived stage k" run driver-side on
    * that bounded result. A naive funnel re-filters and re-counts the
    * corpus per stage — k scans of 100 TB instead of one.
    *
    * Stage predicates must be per-row columns; anything needing a join
    * (e.g. "is the dedup keeper") is the caller's job to precompute as
    * a boolean column first. Output: (stage, name, n_docs, n_tokens),
    * stage 0 = raw input.
    */
  def curationFunnel(docs: DataFrame, tokenCount: Column,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    val (_, reached) = stages.foldLeft((lit(true), lit(0))) {
      case ((cond, r), (_, pred)) =>
        val c2 = cond && coalesce(pred, lit(false))
        (c2, r + when(c2, 1).otherwise(0))
    }
    val perLevel = docs
      .select(reached.as("lvl"), coalesce(tokenCount.cast("long"), lit(0L)).as("nt"))
      .groupBy(col("lvl"))
      .agg(count(lit(1)).as("c"), sum(col("nt")).as("t"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val names = "input" +: stages.map(_._1)
    val rows = names.zipWithIndex.map { case (name, k) =>
      val (c, t) = (k to stages.length).foldLeft((0L, 0L)) { case ((dc, dt), lvl) =>
        val (lc, lt) = perLevel.getOrElse(lvl, (0L, 0L))
        (dc + lc, dt + lt)
      }
      (k, name, c, t)
    }
    val spark = docs.sparkSession
    import spark.implicits._
    rows.toDF("stage", "name", "n_docs", "n_tokens")
  }

  /** [[md5Fraction]] over an arbitrary key EXPRESSION (not just an id
    * column): first 6 md5 nibbles via one base-16 conv — the same
    * dyadic rational the nibble-sum form yields, exact in IEEE. */
  def md5FractionOf(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 6), 16, 10)
      .cast("long").cast("double") / lit(16777216.0)

  /** Leakage-safe train/validation split: the side is a function of a
    * CLUSTER KEY, not the row — every doc sharing the key (exact-dup
    * fingerprint, MinHash cluster id, source domain…) lands on the
    * same side BY CONSTRUCTION, so a val doc can never have a
    * train-side duplicate. Splitting on a per-row draw — what a naive
    * `randomSplit` does — leaks every duplicated document across the
    * boundary, which inflates eval scores exactly like benchmark
    * contamination does.
    *
    * Deterministic (md5 draw, dyadic `valFrac` recommended) and
    * shuffle-free: one per-row hash, no join — cluster coherence costs
    * nothing because the key itself carries it. Expected val fraction
    * is valFrac of CLUSTERS (weighted by cluster size on docs).
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, clusterKey: Column,
      valFrac: Double): DataFrame = {
    require(valFrac > 0.0 && valFrac < 1.0, "valFrac in (0,1)")
    docs.select(col(idCol),
      when(md5FractionOf(clusterKey) < valFrac, lit("val"))
        .otherwise(lit("train")).as("side"))
  }

  /** Fractional UPsampling — the half of data mixing
    * [[temperatureMixture]] refuses (its rate is capped at 1): a mix
    * sheet that says "repeat wiki 2.5x" emits every wiki doc twice and
    * half of them (md5-chosen, deterministic) a third time. Output one
    * row per (doc, copy), copy = 1..n where
    * n = floor(rate) + [md5Fraction(id) < frac(rate)].
    *
    * Use dyadic fractional parts (.5, .25, .75) when exact budget
    * replay matters: the md5 draw is a dyadic rational, so comparisons
    * against dyadic rates are exact in IEEE and replay identically in
    * any engine.
    *
    * Scale shape: shuffle-free — a broadcast-free per-row CASE on the
    * source column plus one generator (explode) per row; output size is
    * the only cost, which is the point of upsampling. */
  def upsampleRepeat(docs: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(_ >= 0.0), "rates must be >= 0")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, v)) =>
      when(col(sourceCol) === k, lit(v)).otherwise(acc) }
    val copies = (floor(rate) +
      when(md5Fraction(idCol) < rate - floor(rate), 1).otherwise(0)).cast("int")
    docs.select(col(idCol), col(sourceCol), copies.as("__n"))
      .filter(col("__n") >= 1)
      .select(col(idCol), col(sourceCol),
        explode(sequence(lit(1), col("__n"))).as("copy"))
      .withColumn("copy", col("copy").cast("long"))
  }

  /** Hard per-group token budgets — the other half of data mixing:
    * where [[temperatureMixture]] keeps docs at a RATE (binomial budget
    * error, shuffle-free), this fills each group's budget EXACTLY
    * (greedily, in a deterministic md5 order) — the "2 B tokens of
    * wiki, 30 B of CC" recipe every pretraining mix sheet specifies.
    * A doc survives iff its group's running token total INCLUDING it
    * stays ≤ the group's budget, walking docs in md5(group|id) order
    * (id tiebreak), so any engine / retry / partitioning selects the
    * same set. Groups absent from `budgets` get `defaultBudget`.
    *
    * Scale shape (round 9 — the rankBy trick applied to running sums):
    * a naive `Window.partitionBy(group)` makes parallelism = group
    * count, so one task sorts and scans an entire domain at 100 TB.
    * Instead each group is cut into `shardsPerGroup` md5-RANGE shards
    * (shard = top 16 bits of the order hash, monotonically collapsed
    * to [0, S), so shard boundaries ARE hash-order boundaries and
    * (shard ASC, hash ASC, id ASC) equals the serial walk):
    *
    *   1. one tokenize pass → narrow (group, id, n_tokens, hash,
    *      shard) projection, materialized so text is read once
    *      (same lifetime discipline as [[Relational.rankBy]]);
    *   2. per-(group, shard) token masses — groups × S rows, bounded
    *      driver metadata (this is per-DOMAIN accounting; a guard
    *      refuses high-cardinality group columns) — exclusive
    *      prefix-summed on the driver into shard offsets;
    *   3. the running sum windows over (group, SHARD) — parallelism =
    *      groups × S, not groups — plus the broadcast offset.
    *
    * Greedy prefix identical to the serial form (proven in spec by
    * S=1 vs S=32 equality). The greedy-prefix rule means one
    * oversized doc mid-order can shadow a smaller doc later
    * (first-fit would keep it) — documented, not a bug: the prefix
    * rule is what makes selection order-stable. */
  def tokenBudgetSample(docs: DataFrame, groupCol: String, idCol: String,
      textCol: String, budgets: Map[String, Long],
      defaultBudget: Long = 0L, shardsPerGroup: Int = 32): DataFrame = {
    require(shardsPerGroup >= 1 && shardsPerGroup <= 65536,
      s"tokenBudgetSample: shardsPerGroup must be in [1, 65536], got $shardsPerGroup")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
    val spark = docs.sparkSession
    val h = md5(concat_ws("|", col(groupCol), col(idCol)))
    val narrow = docs.select(
        col(groupCol), col(idCol),
        size(Dedup.tokens(col(textCol))).cast("long").as("__nt"),
        h.as("__h"))
      .withColumn("__shard",
        (conv(substring(col("__h"), 1, 4), 16, 10).cast("long") *
          shardsPerGroup / 65536L).cast("int"))
      // null-safe string join key: a plain equi-join on the group
      // column would drop null-group rows the serial window kept
      .withColumn("__gk", when(col(groupCol).isNull, lit("\u0000"))
        .otherwise(concat(lit("="), col(groupCol).cast("string"))))
      .materialized()
    val masses = narrow.groupBy(col("__gk"), col("__shard"))
      .agg(coalesce(sum(col("__nt")), lit(0L)).as("__mass")).collect()
    require(masses.length <= (1 << 20),
      "tokenBudgetSample: group column cardinality is too high for per-group " +
        "budget accounting (shard-offset table exceeds 2^20 rows); hard budgets " +
        "are a per-DOMAIN recipe — for fine-grained keys use temperatureMixture")
    val offRows: java.util.List[org.apache.spark.sql.Row] = {
      val l = new java.util.ArrayList[org.apache.spark.sql.Row](masses.length)
      masses.groupBy(_.getString(0)).valuesIterator.foreach { rs =>
        val sorted = rs.sortBy(_.getInt(1))
        var off = 0L
        sorted.foreach { r =>
          l.add(org.apache.spark.sql.Row(r.getString(0), r.getInt(1), off))
          off += r.getLong(2)
        }
      }
      l
    }
    val offsets = spark.createDataFrame(offRows, StructType(Seq(
      StructField("__gk", StringType, nullable = false),
      StructField("__shard", IntegerType, nullable = false),
      StructField("__off", LongType, nullable = false))))
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (g, b)) =>
      when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    val wShard = Window.partitionBy(col("__gk"), col("__shard"))
      .orderBy(col("__h"), col(idCol))
    narrow.join(broadcast(offsets), Seq("__gk", "__shard"))
      .withColumn("__cum", col("__off") + sum(col("__nt")).over(wShard))
      .filter(col("__cum") <= budget)
      .select(col(idCol), col(groupCol), col("__nt").as("n_tokens"),
        col("__cum").as("cum_tokens"))
  }

  /** Probability-proportional-to-size SYSTEMATIC sampling — the exact,
    * replayable way to draw "a size-proportional sample of k docs"
    * (survey-sampling's classic PPS systematic design, Madow 1949):
    * walk the corpus in deterministic md5(seed|id) order, accumulate
    * integer weights, and select every row whose cumulative interval
    * (cum-w, cum] contains a sampling point {offset, offset+step, …}.
    * Selection probability is exactly weight/step (for weight < step);
    * a row with weight >= step is selected with multiplicity
    * `mult` >= 1 — reported, never silently collapsed.
    *
    * Everything is INTEGER arithmetic on longs (div = floor on the
    * non-negative shifted terms), so the draw is bit-replayable by any
    * engine from (seed, offset, step) alone — no IEEE pow/log ordering
    * to diverge on, unlike Efraimidis–Spirakis exponential keys.
    *
    * Scale shape: the running sum is the q150 rankBy trick — md5-RANGE
    * shards (top 16 hash bits collapsed to [0, shards)), per-shard
    * masses driver-prefix-summed into offsets, window per SHARD — so
    * parallelism = shards, never 1. One narrow materialized
    * projection; weights are probed non-negative (bounded limit-1
    * probe; a negative weight would silently corrupt every cum after
    * it, the same refuse-don't-fake rule as mergeUpsert ambiguity).
    *
    * NULL weights count as 0: the row occupies its order position but
    * can never straddle a sampling point. */
  def ppsSystematicSample(docs: DataFrame, idCol: String, weightCol: String,
      step: Long, offset: Long, seed: Int = 42,
      shards: Int = 256): DataFrame = {
    require(step >= 1, s"step must be >= 1, got $step")
    require(offset >= 1 && offset <= step,
      s"offset must be in [1, step], got $offset")
    require(shards >= 1 && shards <= 65536,
      s"shards must be in [1, 65536], got $shards")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    val spark = docs.sparkSession
    val h = md5(concat_ws("|", lit(seed), col(idCol)))
    val narrow = docs.select(col(idCol),
        coalesce(col(weightCol).cast("long"), lit(0L)).as("__w"),
        h.as("__h"))
      .withColumn("__shard",
        (conv(substring(col("__h"), 1, 4), 16, 10).cast("long") *
          shards / 65536L).cast("int"))
      .materialized()
    val neg = narrow.filter(col("__w") < 0L).limit(1).count()
    require(neg == 0L, "ppsSystematicSample: negative weight — cumulative " +
      "intervals would be non-monotone; clean the weight column first")
    val masses = narrow.groupBy(col("__shard"))
      .agg(coalesce(sum(col("__w")), lit(0L)).as("__mass")).collect()
    val offRows: java.util.List[org.apache.spark.sql.Row] = {
      val l = new java.util.ArrayList[org.apache.spark.sql.Row](masses.length)
      var off = 0L
      masses.sortBy(_.getInt(0)).foreach { r =>
        l.add(org.apache.spark.sql.Row(r.getInt(0), off))
        off += r.getLong(1)
      }
      l
    }
    val offsets = spark.createDataFrame(offRows, StructType(Seq(
      StructField("__shard", IntegerType, nullable = false),
      StructField("__off", LongType, nullable = false))))
    val wShard = Window.partitionBy(col("__shard"))
      .orderBy(col("__h"), col(idCol))
    narrow.join(broadcast(offsets), Seq("__shard"))
      .withColumn("__cum", col("__off") + sum(col("__w")).over(wShard))
      // points in (cum-w, cum]: floor((cum-offset+step)/step) -
      // floor((cum-w-offset+step)/step); the +step shift keeps both
      // numerators non-negative so truncating div == floor in every
      // engine
      .withColumn("mult", expr(
        s"((__cum - $offset + $step) div $step) - " +
        s"((__cum - __w - $offset + $step) div $step)"))
      .filter(col("mult") >= 1L)
      .select(col(idCol), col("__w").as("weight"),
        col("__cum").as("cum_weight"), col("mult"))
  }

  def epochShuffle(docs: DataFrame, idCol: String, seed: Int): DataFrame = {
    val keyed = docs.withColumn("__shuffle_key",
      md5(concat_ws(":", lit(seed), col(idCol))))
    val ordered = keyed.orderBy(col("__shuffle_key"), col(idCol))
    Relational.rankSequence(ordered, "ord")
      .drop("__shuffle_key")
  }

  /** Deterministic training-export: write the corpus as `nShards`
    * content-addressed shards (the q66 md5-nibble rule, so ANY engine
    * can recompute which shard owns a doc) and return a MANIFEST
    * computed from the READ-BACK files — per shard: doc count, token
    * count, id sum, and an order-invariant content checksum (sum of
    * md5-prefix ints). The export contract a training job needs:
    * because the manifest derives from what actually landed on disk
    * while the oracle recomputes the same stats from the SOURCE table
    * plus the shard rule, a hash match proves the export is complete
    * (no doc lost, none duplicated, every doc in its assigned shard).
    *
    * Scale: one repartition-by-shard shuffle, one partitioned write,
    * one read-back aggregation — all corpus-sized-linear; the
    * manifest is nShards rows. Shard count bounds downstream
    * packing/windowing work exactly like [[packSequences]]' sharder. */
  def exportShards(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, outDir: String): DataFrame = {
    require(nShards >= 1 && nShards <= 16, s"nShards=$nShards (md5-nibble rule: <= 16)")
    val withShard = docs
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("shard",
        (expr("position(substring(__h, 1, 1) IN '0123456789abcdef')").cast("long") - 1L)
          .mod(lit(nShards.toLong)))
      .drop("__h")
    withShard
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val back = docs.sparkSession.read.parquet(outDir)
    back.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(Dedup.tokens(col(textCol))).cast("long")).as("n_tokens"),
        sum(col(idCol)).cast("long").as("sum_id"),
        sum(conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
          .cast("long")).as("checksum"))
      .select(col("shard").cast("long").as("shard"), col("n_docs"),
        col("n_tokens"), col("sum_id"), col("checksum"))
  }

  /** DSIR-style hashed-n-gram importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling",
    * arXiv:2302.03169): score each SOURCE doc by how much its
    * hashed-n-gram feature distribution looks like the TARGET
    * domain's, so a web-scale corpus can be resampled toward a
    * high-quality domain without training a classifier.
    *
    * Deterministic integer formulation (so any engine replays it
    * hash-exact): features are word unigrams + bigrams hashed to
    * `16^hexChars` buckets by an md5 hex prefix (md5 bytes agree
    * across engines, unlike engine-native hash functions); a
    * bucket's weight is `(target_count × scale) div source_count`
    * in EXACT integer arithmetic — the target/source frequency
    * ratio the paper's importance weight estimates, scaled and
    * floored instead of logged, which keeps per-doc scores exact
    * BIGINT sums (order-invariant) rather than float log-sums whose
    * summation order differs per engine. The constant global
    * Tsource/Ttarget factor is dropped: it rescales every doc
    * identically and resampling only reads relative weights.
    *
    * Scale shape: the weight table is bounded a priori at
    * `16^hexChars` rows (4096 at the default) — it BROADCASTS into
    * the doc-scoring scan; the only corpus-sized movements are the
    * two vocab-bucketed count aggregations and the per-doc score
    * groupBy. Nothing collects to the driver. Docs with no grams
    * score 0 (kept in the output via left join).
    *
    * Resample with the existing deterministic samplers: threshold
    * the returned `iw`, or feed it to [[temperatureMixture]]-style
    * md5-coin keeps. */
  def importanceWeights(source: DataFrame, target: DataFrame,
      idCol: String, textCol: String, hexChars: Int = 3,
      scale: Long = 1000000L): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8, s"hexChars=$hexChars")
    def buckets(df: DataFrame): DataFrame = {
      val t = Dedup.tokens(col(textCol))
      df.select(col(idCol), t.as("__t"))
        .select(col(idCol),
          explode(concat(
            col("__t"),
            when(size(col("__t")) >= 2,
              transform(sequence(lit(1), size(col("__t")) - 1), i =>
                concat(element_at(col("__t"), i), lit(" "),
                  element_at(col("__t"), i + 1))))
              .otherwise(array()))).as("gram"))
        .select(col(idCol),
          substring(md5(col("gram").cast("binary")), 1, hexChars).as("bucket"))
    }
    val src = buckets(source)
    val sc = src.groupBy(col("bucket")).agg(count(lit(1)).as("s"))
    val tc = buckets(target).groupBy(col("bucket")).agg(count(lit(1)).as("c"))
    val weights = sc.join(tc, Seq("bucket"), "left")
      .select(col("bucket"),
        expr(s"(coalesce(c, 0L) * ${scale}L) div s").as("w"))
    val scores = src.join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol)).agg(sum(col("w")).as("iw"))
    source.select(col(idCol))
      .join(scores, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("iw"), lit(0L)).as("iw"))
  }
}
