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
    * concurrent or crash-safe publication goes through
    * [[savePublished]], which stages a save like this one under a
    * generation dir and promotes it atomically). Returns the manifest
    * row as a receipt. */
  def save(spark: SparkSession, dir: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, pq: graft.plans.PqCodebooks,
      partitionCodesByCell: Boolean = false): DataFrame = {
    val cents = Similarity.collectCentroids(centroids, "AnnIndex.save")
    val subDim = pq.subDim
    val dim = subDim * pq.m
    require(cents.forall(_.length == dim),
      s"AnnIndex.save: centroid dim ${cents.map(_.length).distinct} != " +
        s"PQ model dim $dim (subDim=$subDim × m=${pq.m})")
    // the one corpus-sized pass: route + quantize
    val encoded = Similarity.ivfPqEncode(corpus, idCol, vecCol, cents, pq)
    writeIndex(spark, dir, encoded, idCol, vecCol, cents, pq,
      partitionCodesByCell)
  }

  /** Persist a flat index from an ALREADY-ENCODED codes table (the
    * compaction path — folding deltas must reuse stored codes, never
    * re-encode a corpus it does not have the vectors of). */
  private def writeIndex(spark: SparkSession, dir: String,
      encoded: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Seq[Double]], pq: graft.plans.PqCodebooks,
      partitionCodesByCell: Boolean): DataFrame = {
    import spark.implicits._
    val subDim = pq.subDim
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
    // Unpartitioned = zero shuffles; partitionCodesByCell pays ONE
    // shuffle on cell so the codes table lands one directory per
    // cell — a probe of nProbe cells then reads only those cells'
    // files (the SCALE.md claim, made real: PartitionFilters-prunable
    // serving scans).
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
    * scan so serving sees ingested rows without an index rebuild —
    * EXCEPT delta dirs named in `folded/` (a [[compact]] already
    * baked them into this generation's base; a replayed ingest batch
    * that re-lands such a dir must not double-serve its rows). Rows
    * whose id appears under `tombstones/` ([[deleteIds]]) are
    * anti-joined out of the serving scan. The manifest's n_rows
    * receipt covers the BASE codes only — deltas are exactly-once by
    * the snapshot discipline instead.
    *
    * `dirOrRoot` may be a flat index dir OR a published root
    * ([[savePublished]]) — the latter resolves to its active
    * generation first. */
  def load(spark: SparkSession, dirOrRoot: String,
      includeDeltas: Boolean = true): Loaded = {
    val dir = activeDir(spark, dirOrRoot)
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
    val withDeltas =
      if (includeDeltas && fs.exists(deltaPath)) {
        val folded = foldedDirs(spark, dir)
        val live = fs.listStatus(deltaPath).toSeq
          .filter(_.isDirectory).map(_.getPath.getName)
          .filterNot(folded.contains).sorted
        if (live.isEmpty) base
        else base.unionByName(
          spark.read.parquet(live.map(n => s"$dir/codes_delta/$n"): _*)
            .select(base.columns.map(org.apache.spark.sql.functions.col).toSeq: _*))
      } else base
    val tsPath = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val tsBatches =
      if (fs.exists(tsPath))
        fs.listStatus(tsPath).toSeq.filter(_.isDirectory)
          .map(_.getPath.toString).sorted
      else Seq.empty
    val codes =
      if (tsBatches.nonEmpty)
        withDeltas.join(
          broadcast(spark.read.parquet(tsBatches: _*)
            .select(col(idCol)).distinct()),
          Seq(idCol), "left_anti")
      else withDeltas
    Loaded(centVecs, pq, codes, idCol, subDim * nSub)
  }

  /** Delta dir names a previous [[compact]] already folded into this
    * generation's base codes. */
  private def foldedDirs(spark: SparkSession, dir: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/folded")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else spark.read.parquet(p.toString).select(col("dirname"))
      .collect().map(_.getString(0)).toSet
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

  // ------------------- generation publication (round 12) -------------------
  //
  // The flat [[save]] overwrites its target whole — a crashed re-train
  // would destroy the serving index. Publication fixes that with the
  // smallest possible log (the [[VersionedTable]] CAS, reused): a
  // generation dir `g<N>-<writer>/` holding a COMPLETE flat index is
  // staged fully, then `_pub/<N>.pub` is created atomically. The pub
  // file's existence IS the publication — readers resolve the highest
  // pub and can never observe a half-written generation; a crashed
  // save leaves an unpublished dir the old generation serves through
  // untouched.

  final class PublishConflict(msg: String) extends RuntimeException(msg)

  private def pubDir(root: String) = s"$root/_pub"

  /** Published generations under `root`, ascending. */
  def generations(spark: SparkSession, root: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(pubDir(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".pub")).map(_.stripSuffix(".pub").toLong).sorted
  }

  private def genDirOf(spark: SparkSession, root: String, gen: Long): String = {
    val p = new org.apache.hadoop.fs.Path(s"${pubDir(root)}/$gen.pub")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val rel = body.linesIterator.collectFirst {
      case l if l.startsWith("gen=") => l.stripPrefix("gen=")
    }.getOrElse(throw new IllegalStateException(
      s"pub file $p carries no gen= line"))
    s"$root/$rel"
  }

  /** Resolve a caller-facing index path to the physical flat index
    * dir: a published root resolves to its ACTIVE (highest) published
    * generation; anything else (a flat index, or a dir about to
    * become one) resolves to itself. Every read/ingest/delete path
    * funnels through this, so callers hold ONE path across the
    * index's whole retrain lifecycle. */
  def activeDir(spark: SparkSession, dirOrRoot: String): String =
    generations(spark, dirOrRoot).lastOption
      .map(genDirOf(spark, dirOrRoot, _)).getOrElse(dirOrRoot)

  /** [[save]] + atomic publication: stage a complete flat index under
    * `root/g<N>-<writer>/`, then CAS `_pub/<N>.pub`. A crashed or
    * losing save never disturbs the serving generation. Returns the
    * published generation number. */
  def savePublished(spark: SparkSession, root: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, pq: graft.plans.PqCodebooks,
      partitionCodesByCell: Boolean = false,
      writerId: String = "trainer"): Long = {
    require(writerId.nonEmpty && !writerId.exists(c => c == '/' || c == '\n'),
      s"writerId must be a plain token, got '$writerId'")
    val gen = generations(spark, root).lastOption.map(_ + 1).getOrElse(0L)
    val rel = s"g$gen-$writerId"
    save(spark, s"$root/$rel", corpus, idCol, vecCol, centroids, pq,
      partitionCodesByCell)
    publishStaged(spark, root, gen, rel, writerId, kind = "train")
    gen
  }

  private def pubKind(spark: SparkSession, root: String, gen: Long): String = {
    val p = new org.apache.hadoop.fs.Path(s"${pubDir(root)}/$gen.pub")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    body.linesIterator.collectFirst {
      case l if l.startsWith("kind=") => l.stripPrefix("kind=")
    }.getOrElse("train") // unknown provenance = assume retrain (conservative)
  }

  /** Refuse if any generation published after `sinceGen` carries a
    * RETRAINED model (kind=train). Compactions copy models
    * byte-stable, so a stream encoding under a model loaded at
    * `sinceGen` stays correct across them; a retrain does not, and
    * silently encoding new rows under the stale model would route
    * them to the wrong cells of the new index. */
  def requireModelStable(spark: SparkSession, root: String,
      sinceGen: Long): Unit = {
    val retrained = generations(spark, root).filter(_ > sinceGen)
      .filter(pubKind(spark, root, _) == "train")
    require(retrained.isEmpty,
      s"index at $root was retrained (generation ${retrained.mkString(",")}) " +
        "after this stream loaded its model — restart the ingest stream " +
        "against the new model; encoding under the stale one would " +
        "mis-route every new row")
  }

  private def publishStaged(spark: SparkSession, root: String, gen: Long,
      rel: String, writerId: String, kind: String): Unit = {
    val won = VersionedTable.casCreate(spark,
      new org.apache.hadoop.fs.Path(s"${pubDir(root)}/$gen.pub"),
      new org.apache.hadoop.fs.Path(s"${pubDir(root)}/.tmp-$writerId-$gen"),
      s"gen=$rel\nwriter=$writerId\nkind=$kind\n")
    if (!won) {
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(s"$root/$rel"), true)
      throw new PublishConflict(
        s"publish to $root: lost the race for generation $gen — staged " +
          "index removed; re-read, retrain if needed, retry")
    }
  }

  /** Mark ids as deleted from the ACTIVE generation: a tombstone
    * batch lands under `tombstones/` and [[load]] anti-joins it out
    * of every serve. Terminal until the next [[compact]] physically
    * drops the rows and clears the tombstones — re-ingesting a
    * deleted id before that compact stays suppressed (document order:
    * delete wins over in-flight ingest; the Lucene delete-marker
    * contract). Admin-serial by design (no CAS — deletes compose, and
    * two delete batches landing in either order serve identically).
    * Returns the tombstone batch's row count. */
  def deleteIds(spark: SparkSession, dirOrRoot: String, ids: DataFrame): Long = {
    val dir = activeDir(spark, dirOrRoot)
    require(ids.columns.length == 1,
      s"deleteIds wants a single id column, got ${ids.columns.mkString(",")}")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tsRoot = new org.apache.hadoop.fs.Path(s"$dir/tombstones")
    val next =
      if (!fs.exists(tsRoot)) 0
      else fs.listStatus(tsRoot).count(_.isDirectory)
    val idCol = spark.read.parquet(s"$dir/manifest")
      .collect()(0).getAs[String]("id_col")
    val batch = ids.toDF(idCol).distinct()
    batch.write.mode("overwrite").parquet(s"$dir/tombstones/ts-$next")
    spark.read.parquet(s"$dir/tombstones/ts-$next").count()
  }

  /** Fold the active generation's base + live deltas − tombstones
    * into a NEW generation's clean base, published atomically. Model
    * artifacts are copied byte-stable (compaction reorganizes codes;
    * it must never drift the model); stored codes are reused, never
    * re-encoded. Delta dirs folded here are recorded in the new
    * generation's `folded/` list so a replayed ingest batch that
    * re-lands one of them is ignored by [[load]] instead of
    * double-serving. The old generation keeps serving any reader that
    * already resolved it — its files are untouched until
    * [[expireGenerations]]. Returns the new generation number. */
  def compact(spark: SparkSession, root: String,
      writerId: String = "compactor"): Long = {
    import spark.implicits._
    val gens = generations(spark, root)
    require(gens.nonEmpty,
      s"compact: $root is not a published index root — flat indexes " +
        "have no atomic publish to ride; wrap the index with " +
        "savePublished first")
    val dir = genDirOf(spark, root, gens.last)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val loaded = load(spark, root) // folded-skip + tombstones applied
    val newGen = gens.last + 1
    val rel = s"g$newGen-$writerId"
    val tgt = s"$root/$rel"
    fs.delete(new org.apache.hadoop.fs.Path(tgt), true)
    // byte-stable model copy + manifest rewrite with the new n_rows
    for (art <- Seq("centroids", "codebooks"))
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(s"$dir/$art"),
        fs, new org.apache.hadoop.fs.Path(s"$tgt/$art"),
        false, spark.sparkContext.hadoopConfiguration)
    // preserve the cell-partitioned layout choice of the source gen
    val celled = fs.exists(new org.apache.hadoop.fs.Path(s"$dir/codes")) &&
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/codes"))
        .exists(s => s.isDirectory && s.getPath.getName.startsWith("cell="))
    if (celled)
      loaded.codes.repartition(col("cell")).write.mode("overwrite")
        .partitionBy("cell").parquet(s"$tgt/codes")
    else loaded.codes.write.mode("overwrite").parquet(s"$tgt/codes")
    // every CURRENT delta dir (live or previously folded) is folded
    // now — its rows are in the new base or tombstoned away
    val deltaPath = new org.apache.hadoop.fs.Path(s"$dir/codes_delta")
    val nowFolded = (foldedDirs(spark, dir) ++ (
      if (fs.exists(deltaPath))
        fs.listStatus(deltaPath).toSeq.filter(_.isDirectory)
          .map(_.getPath.getName)
      else Seq.empty)).toSeq.sorted
    if (nowFolded.nonEmpty)
      nowFolded.toDF("dirname").coalesce(1)
        .write.mode("overwrite").parquet(s"$tgt/folded")
    val nCodes = spark.read.parquet(s"$tgt/codes").count()
    spark.read.parquet(s"$dir/manifest")
      .withColumn("n_rows", lit(nCodes))
      .coalesce(1).write.mode("overwrite").parquet(s"$tgt/manifest")
    publishStaged(spark, root, newGen, rel, writerId, kind = "compact")
    newGen
  }

  /** Retention over published generations: drop all but the newest
    * `keep` (pub file first — the generation disappears atomically —
    * then its dir). keep >= 2: a reader that resolved generation N
    * must not lose its files while a writer publishes N+1 (the same
    * floor as [[VersionedTable.expire]]). */
  def expireGenerations(spark: SparkSession, root: String,
      keep: Int = 2): Seq[Long] = {
    require(keep >= 2, s"keep must be >= 2, got $keep")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victims = generations(spark, root).dropRight(keep)
    victims.foreach { g =>
      val dir = genDirOf(spark, root, g)
      fs.delete(new org.apache.hadoop.fs.Path(s"${pubDir(root)}/$g.pub"), false)
      fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    }
    victims
  }
}
