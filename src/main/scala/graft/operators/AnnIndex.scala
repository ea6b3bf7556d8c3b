package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index — the "train once, serve many" half of the
  * ANN story ([[Similarity.ivfPqTopK]] is the train-and-query-in-one
  * half). Production similarity serving fits coarse centroids and PQ
  * codebooks ONCE, encodes the corpus ONCE, and then answers many
  * query batches against the stored artifacts; retraining per query
  * run (what q154 deliberately does to exercise the trainer) is the
  * wrong cost shape at scale.
  *
  * Layout under `dir` (all parquet — columnar, splittable, and
  * readable by any engine, unlike a pickled model):
  *
  *   - `centroids/`  (pos INT, cv ARRAY<DOUBLE>) — coarse cells, one
  *     row per cell; `pos` IS the cell id (cells are positional in
  *     [[Similarity.collectCentroids]] order, so the saved order is
  *     the contract, made explicit as a column).
  *   - `codebooks/`  (sub INT, code INT, cv ARRAY<DOUBLE>) — the PQ
  *     model, one row per (subspace, code); ragged subspaces (fewer
  *     distinct subvectors than nCodes) round-trip naturally.
  *   - `codes/`      (<idCol>, cell INT, __codes ARRAY<INT>) — the
  *     encoded corpus: ~m bytes of payload per row instead of the
  *     vector. This is the only corpus-sized artifact and it is
  *     exactly what query-time joins consume — serving never touches
  *     the raw vectors unless the caller asks for exact refine.
  *   - `manifest/`   one-row parquet, written LAST: format_version,
  *     column names, model dims, and row-count receipts. A crashed
  *     save leaves no manifest, so [[load]] refuses half-written
  *     indexes instead of serving from them.
  *
  * Scale shape: save = one corpus-sized encode pass (zero shuffles —
  * cell routing and PQ encoding are per-row codegen kernels) + two
  * model-sized writes; load = two model-sized collects and a lazy
  * corpus-codes scan. Serving a query batch from a loaded index costs
  * the same plan as the in-memory path minus the entire train+encode
  * stage. At 100 TB the codes table is ~1% of the corpus bytes and
  * can itself be partitioned/z-ordered by `cell` so a probe touches
  * only its cells' files.
  */
object AnnIndex {

  val FormatVersion = 1

  /** A loaded index: driver-sized models + the lazy codes scan.
    * `dim` is the full vector dimension (subDim × m). */
  final case class Loaded(
      cents: Seq[Seq[Double]],
      pq: graft.plans.PqCodebooks,
      codes: DataFrame,
      idCol: String,
      dim: Int)

  /** Fit-and-save convenience is deliberately absent: training policy
    * (sample sizes, iterations, init) belongs to the caller — compose
    * [[Similarity.kMeansFit]] + [[Similarity.pqTrain]] and pass the
    * results here. `save` encodes `corpus` with them and persists all
    * four artifacts. Overwrites `dir` whole (single-writer discipline;
    * concurrent writers need the manifest-log protocol, see
    * VersionedTable). Returns the manifest row as a receipt. */
  def save(spark: SparkSession, dir: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, pq: graft.plans.PqCodebooks,
      partitionCodesByCell: Boolean = false): DataFrame = {
    import spark.implicits._
    val cents = Similarity.collectCentroids(centroids, "AnnIndex.save")
    val subDim = pq.subDim
    val dim = subDim * pq.m
    require(cents.forall(_.length == dim),
      s"AnnIndex.save: centroid dim ${cents.map(_.length).distinct} != " +
        s"PQ model dim $dim (subDim=$subDim × m=${pq.m})")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    // model-sized artifacts: positional centroids, (sub, code) books
    cents.zipWithIndex.map { case (cv, pos) => (pos, cv) }
      .toDF("pos", "cv").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    pq.codes.zipWithIndex.flatMap { case (book, sub) =>
      book.zipWithIndex.map { case (cv, code) => (sub, code, cv.toSeq) }
    }.toSeq.toDF("sub", "code", "cv").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/codebooks")
    // the one corpus-sized pass: route + quantize. Unpartitioned =
    // zero shuffles; partitionCodesByCell pays ONE shuffle on cell so
    // the codes table lands one directory per cell — a probe of
    // nProbe cells then reads only those cells' files (the SCALE.md
    // claim, made real: PartitionFilters-prunable serving scans).
    val encoded = Similarity.ivfPqEncode(corpus, idCol, vecCol, cents, pq)
    if (partitionCodesByCell)
      encoded.repartition(col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(s"$dir/codes")
    else encoded.write.mode("overwrite").parquet(s"$dir/codes")
    val nCodes = spark.read.parquet(s"$dir/codes").count()
    // manifest LAST — its presence is the commit marker
    val manifest = Seq((FormatVersion, idCol, vecCol, subDim, pq.m,
        cents.length, pq.codes.map(_.length).toSeq, nCodes))
      .toDF("format_version", "id_col", "vec_col", "sub_dim", "m",
        "n_centroids", "codes_per_sub", "n_rows")
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$dir/manifest")
    manifest
  }

  /** Load a saved index. Refuses (loudly) an index with no manifest
    * (half-written save), a format version from the future, or
    * artifacts inconsistent with the manifest's receipts — serving
    * from a torn index would silently return wrong neighbors.
    *
    * `includeDeltas`: streamed-in rows land under `codes_delta/`
    * ([[graft.streaming.CurationStreaming.annIngestStream]]) encoded
    * under this SAME frozen model; loading unions them into the codes
    * scan so serving sees ingested rows without an index rebuild.
    * The manifest's n_rows receipt covers the BASE codes only —
    * deltas are exactly-once by the snapshot discipline instead. */
  def load(spark: SparkSession, dir: String,
      includeDeltas: Boolean = true): Loaded = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/manifest")),
      s"AnnIndex.load: no manifest under $dir — not an index, or a save " +
        "that crashed before commit; re-run save")
    val m = spark.read.parquet(s"$dir/manifest").collect()
    require(m.length == 1, s"AnnIndex.load: manifest must be one row, got ${m.length}")
    val row = m(0)
    val ver = row.getAs[Int]("format_version")
    require(ver >= 1 && ver <= FormatVersion,
      s"AnnIndex.load: format_version $ver is newer than this build's " +
        s"$FormatVersion — upgrade before reading this index")
    val idCol = row.getAs[String]("id_col")
    val subDim = row.getAs[Int]("sub_dim")
    val nSub = row.getAs[Int]("m")
    val nCentroids = row.getAs[Int]("n_centroids")
    val codesPerSub = row.getSeq[Int](row.fieldIndex("codes_per_sub"))
    val centRows = spark.read.parquet(s"$dir/centroids")
      .orderBy(col("pos").asc).collect()
    require(centRows.length == nCentroids,
      s"AnnIndex.load: manifest says $nCentroids centroids, found ${centRows.length}")
    require(centRows.map(_.getAs[Int]("pos")).toSeq == (0 until nCentroids),
      "AnnIndex.load: centroid positions are not the contiguous 0..n-1 range")
    val centVecs: Seq[Seq[Double]] =
      centRows.map(r => r.getSeq[Double](r.fieldIndex("cv"))).toSeq
    val bookRows = spark.read.parquet(s"$dir/codebooks").collect()
    require(bookRows.length == codesPerSub.sum,
      s"AnnIndex.load: manifest says ${codesPerSub.sum} codebook rows, " +
        s"found ${bookRows.length}")
    val bySub = bookRows
      .map(r => (r.getAs[Int]("sub"), r.getAs[Int]("code"),
        r.getSeq[Double](r.fieldIndex("cv")).toArray))
      .groupBy(_._1)
    val books = Array.tabulate(nSub) { s =>
      val rows = bySub.getOrElse(s, Array.empty)
      require(rows.length == codesPerSub(s),
        s"AnnIndex.load: subspace $s has ${rows.length} codes, " +
          s"manifest says ${codesPerSub(s)}")
      rows.sortBy(_._2).map(_._3)
    }
    val pq = new graft.plans.PqCodebooks(subDim, books)
    val base = spark.read.parquet(s"$dir/codes")
    val deltaPath = new org.apache.hadoop.fs.Path(s"$dir/codes_delta")
    val codes =
      if (includeDeltas && fs.exists(deltaPath))
        base.unionByName(spark.read.parquet(deltaPath.toString)
          .select(base.columns.map(org.apache.spark.sql.functions.col).toSeq: _*))
      else base
    Loaded(centVecs, pq, codes, idCol, subDim * nSub)
  }

  /** Answer a query batch from a loaded index — the serving path.
    * Identical semantics (and, with the same parameters, identical
    * results) to [[Similarity.ivfPqTopK]], minus train+encode.
    * `exactCorpus` (idCol + vecCol of the ORIGINAL vectors) is
    * required for refine > 0; serving ADC-only needs no vectors at
    * all. */
  def topK(loaded: Loaded, queries: DataFrame, queryId: String,
      vecCol: String, k: Int, nProbe: Int = 4, refine: Int = 0,
      exactCorpus: Option[DataFrame] = None): DataFrame =
    Similarity.ivfPqServe(loaded.codes, queries, loaded.idCol, queryId,
      vecCol, k, loaded.cents, loaded.pq, nProbe, refine, exactCorpus)
}
