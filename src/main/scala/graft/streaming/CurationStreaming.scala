package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.apache.spark.sql.types._

/** STREAMING training-data curation (SURVEY §7.1 × §2.7): the batch
  * MinHash-LSH near-dup pipeline, incrementalized — an arriving doc is
  * flagged a near-duplicate the moment any of its LSH band keys was
  * already claimed by an earlier doc, without ever re-scanning the
  * corpus. This is the ingest-time shape of fuzzy dedup: the batch
  * operator ([[graft.operators.Dedup.fuzzyDupPairs]]) answers "which
  * pairs collide" after the fact; this one answers "is THIS doc new"
  * as data lands.
  *
  * Dataflow: the doc stream computes shingle hashes → MinHash
  * signature → banded keys IN the stream (stateless projections over
  * the same codegen'd kernels as batch), then a typed
  * `transformWithState` keyed by (band, sig) records each band key's
  * OWNER — the earliest (ts, doc_id) ever seen — and emits one verdict
  * per (doc, band): owner or dup. A doc is a near-dup iff ANY of its
  * bands is owned by someone else (downstream per-doc aggregation;
  * OR-amplification exactly like the batch banding).
  *
  * Determinism: rows within a micro-batch arrive in partition order,
  * so the processor SORTS each batch's rows per key by (ts, doc_id)
  * before deciding ownership — the emitted verdicts equal the batch
  * min-(ts, id) owner rule under any partitioning. Across
  * micro-batches, ownership is first-seen: with event time monotone in
  * arrival order (the replay contract here) that is again min-(ts,id);
  * a genuinely out-of-order source keeps at-most-once ownership per
  * key but a later-arriving earlier-ts doc cannot retract an already
  * emitted verdict — the same trade every streaming dedup makes
  * (q129's dropDuplicatesWithinWatermark included).
  *
  * Scale: state is ONE (ts, id) pair per distinct band key in the
  * watermark horizon — bounded by content diversity, not corpus size,
  * and identical to what the batch band join would shuffle. The
  * parity/replay harnesses run TTL-free (finite replays); production
  * passes `stateTtlMs` so band ownership expires with the dedup
  * horizon, exactly like q129's/q151's watermark-bounded dedup state
  * — exercised by StreamingSpec's production-trigger TTL smoke
  * (continuous trigger, bounded wall-time, eviction asserted).
  * Caveat, measured r13 and pinned by that test: state TTL requires
  * TimeMode.ProcessingTime, under which an AvailableNow replay — and
  * processAllAvailable under ANY trigger — never terminates (TTL
  * timer micro-batches keep the query "not caught up"); TTL runs
  * under continuous triggers the caller stops, and PARITY HARNESSES
  * ONLY stay TTL-free. */
object CurationStreaming {

  final case class BandRow(band: Int, sig: Long, doc_id: Long, ts_ms: Long)
  final case class BandVerdict(doc_id: Long, band: Int, dup_band: Boolean)

  /** Keyed owner state: earliest (ts_ms, doc_id) per (band, sig).
    * `ttlMs > 0` = the production posture: ownership expires with the
    * dedup horizon (requires TimeMode.ProcessingTime — see
    * [[streamNearDupVerdicts]]'s trigger contract). */
  final class BandOwnerProcessor(ttlMs: Long = 0L)
      extends StatefulProcessor[(Int, Long), BandRow, BandVerdict] {
    @transient private var owner: ValueState[(Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      owner = getHandle.getValueState[(Long, Long)](
        "owner", Encoders.product[(Long, Long)],
        if (ttlMs > 0L) new TTLConfig(java.time.Duration.ofMillis(ttlMs))
        else TTLConfig.NONE)
    override def handleInputRows(key: (Int, Long), rows: Iterator[BandRow],
        timerValues: TimerValues): Iterator[BandVerdict] = {
      // deterministic within-batch order: the verdicts must match the
      // batch min-(ts, id) rule under any partitioning/arrival order
      val sorted = rows.toArray.sortBy(r => (r.ts_ms, r.doc_id))
      var cur: Option[(Long, Long)] = if (owner.exists()) Some(owner.get()) else None
      val out = new Array[BandVerdict](sorted.length)
      var i = 0
      while (i < sorted.length) {
        val r = sorted(i)
        val me = (r.ts_ms, r.doc_id)
        val isOwner = cur.isEmpty || me == cur.get ||
          Ordering[(Long, Long)].lt(me, cur.get)
        if (isOwner) cur = Some(if (cur.isEmpty) me else
          Ordering[(Long, Long)].min(me, cur.get))
        out(i) = BandVerdict(r.doc_id, r.band, !isOwner)
        i += 1
      }
      if (cur.isDefined) owner.update(cur.get)
      out.iterator
    }
  }

  /** Schema of the staged doc stream: (doc_id, text, ts). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  /** Banded key projection shared by the stream and its batch
    * reference — the SAME native kernels as the batch dedup pipeline
    * (the codegen'd shingle-hash path; the HOF formulation measured
    * 52 s vs ~2 s for 5000 docs — interpreted lambdas again, the
    * KMeansSoak lesson). */
  def bandRows(docs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val hashes = graft.plans.TextExpressions.shingleHash64(col("text"), 3)
    val sig = graft.operators.Dedup.minhashSig(hashes, numHashes)
    docs
      .select(col("doc_id"), (col("ts").cast("double") * 1000).cast("long").as("ts_ms"),
        explode(graft.operators.Dedup.lshBands(sig, bands, numHashes / bands)).as("b"))
      .select(col("b.band").as("band"), col("b.sig").as("sig"),
        col("doc_id"), col("ts_ms"))
  }

  /** The streaming stage: staged parquet docs → in-stream banding →
    * per-band-key typed ownership state → (doc, band) verdicts.
    *
    * `stateTtlMs > 0` = the PRODUCTION posture: band ownership expires
    * after the dedup horizon, bounding state on an unbounded corpus.
    * TTL requires TimeMode.ProcessingTime, and under ProcessingTime an
    * AvailableNow replay never terminates (the trigger keeps
    * scheduling timer micro-batches) — so the TTL form is for
    * CONTINUOUS triggers stopped by the caller (the StreamingSpec TTL
    * smoke runs exactly that: bounded wall-time, assert eviction);
    * parity/replay harnesses use the TTL-free default. */
  def streamNearDupVerdicts(spark: SparkSession, stagedDir: String,
      numHashes: Int = 128, bands: Int = 16,
      stateTtlMs: Long = 0L): DataFrame = {
    EventsStreaming.ensureRocksDbProvider(spark, "streamNearDupVerdicts")
    import spark.implicits._
    val stream = spark.readStream.schema(docSchema).parquet(stagedDir)
    bandRows(stream, numHashes, bands)
      .as[BandRow]
      .groupByKey(r => (r.band, r.sig))
      .transformWithState(new BandOwnerProcessor(stateTtlMs),
        if (stateTtlMs > 0L) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Update())
      .toDF()
  }

  /** The batch reference the stream must reproduce: per band key the
    * owner is min-(ts, id); a doc is a near-dup iff any of its bands
    * is owned by another doc.
    *
    * Shape: rank-within-band-key (rank 1 = owner) over ONE banding
    * pass. The former owners-then-join formulation scanned `banded`
    * twice — and the banding pass IS the cost (the 128-hash minhash
    * kernel, ~2.4 s per pass on the sf0.1 corpus vs milliseconds for
    * the join), so the self-join doubled the reference's price. The
    * window sorts tiny groups (a band key holds the docs sharing one
    * band signature) after the same single shuffle the join needed
    * anyway. */
  def batchNearDupFlags(docs: DataFrame, numHashes: Int = 128,
      bands: Int = 16): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "sig").orderBy("ts_ms", "doc_id")
    bandRows(docs, numHashes, bands)
      .withColumn("rk", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(max((col("rk") > 1).cast("int")).as("d"))
      .select(col("doc_id"), (col("d") === 1).as("is_dup"))
  }

  // ------------- exactly-once streaming shard export (round 10) -------------

  /** Streaming counterpart of
    * [[graft.operators.TrainingPipeline.exportShards]]: docs arrive as
    * a stream and land in md5-nibble shards EXACTLY ONCE across
    * micro-batches, restarts, and batch retries.
    *
    * The exactly-once mechanics are the standard foreachBatch contract:
    * the checkpoint names which source files belong to each batchId
    * (deterministic replay), and the batch writes
    * `outDir/batch=<id>/shard=<k>/` in OVERWRITE mode — a retried or
    * restarted batch rewrites ITS OWN directory and cannot duplicate
    * rows. Parquet partition discovery then reads the whole export as
    * one table (batch and shard become partition columns), so the
    * manifest aggregation and every downstream consumer see one
    * dataset regardless of how many batches produced it.
    *
    * Scale shape: per batch, ONE repartition on shard + a partitioned
    * write — identical to the batch exporter, amortized over arrivals;
    * state is only the checkpoint's file log. */
  def exportStream(spark: SparkSession, stagedDir: String, outDir: String,
      ckpt: String, nShards: Int, maxFilesPerTrigger: Int = 1): Unit = {
    require(nShards >= 1 && nShards <= 16, "md5-nibble rule: nShards <= 16")
    val stream = spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stagedDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .withColumn("__h", md5(col("doc_id").cast("string")))
          .withColumn("shard",
            (expr("position(substring(__h, 1, 1) IN '0123456789abcdef')")
              .cast("long") - 1L).mod(lit(nShards.toLong)))
          .drop("__h")
          .repartition(col("shard"))
          .write.mode("overwrite").partitionBy("shard")
          .parquet(s"$outDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming ANN-index ingest (round 11): newly arrived vectors are
    * PQ-encoded under the index's PERSISTED, FROZEN model and appended
    * as `codes_delta/batch=<id>` — the overwrite-own-directory
    * exactly-once contract of [[exportStream]] (a retried/replayed
    * batch rewrites its own directory with identical content; it can
    * never double-land). Model freeze is the production serving
    * contract: ingest encodes under the trained centroids/codebooks,
    * and re-training is a separate offline job that REBUILDS the
    * index — silently re-fitting on ingest would shift every cell
    * boundary under the served corpus.
    * [[graft.operators.AnnIndex.load]] unions the deltas into the
    * codes scan, so serving sees streamed rows with no rebuild.
    * Scale shape: per batch, one batch-sized encode pass (per-row
    * codegen kernels, zero shuffles) + one batch-sized write. */
  def annIngestStream(spark: SparkSession, stagedDir: String, idxDir: String,
      ckpt: String, vecCol: String,
      srcSchema: StructType, maxFilesPerTrigger: Int = 1): Unit = {
    // `idxDir` may be a flat index or a savePublished root; the model
    // is loaded ONCE (frozen), each batch re-resolves the ACTIVE
    // generation so deltas land where serving looks. A compaction
    // mid-stream is safe (models copied byte-stable; folded markers
    // make replayed old batches inert); a RETRAIN is not — the
    // stability guard refuses the batch instead of mis-routing rows.
    val startGen = graft.operators.AnnIndex
      .generations(spark, idxDir).lastOption.getOrElse(-1L)
    val loaded = graft.operators.AnnIndex.load(spark, idxDir,
      includeDeltas = false)
    val stream = spark.readStream
      .schema(srcSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stagedDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.AnnIndex.requireModelStable(spark, idxDir, startGen)
        val dir = graft.operators.AnnIndex.activeDir(spark, idxDir)
        graft.operators.Similarity
          .ivfPqEncode(batch, loaded.idCol, vecCol, loaded.cents, loaded.pq)
          .write.mode("overwrite")
          .parquet(s"$dir/codes_delta/batch=$batchId")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  // ------------- streaming SCD2 snapshot maintenance (round 10) -------------

  /** Streaming counterpart of
    * [[graft.operators.Incremental.scd2Apply]]: CDC change batches
    * arrive as staged files (each carrying ONE `as_of` timestamp) and
    * fold into a versioned dimension history EXACTLY ONCE across
    * micro-batches, restarts, and batch retries.
    *
    * Snapshot discipline (the foreachBatch exactly-once contract,
    * same as [[exportStream]]): batch `id` reads the LATEST snapshot
    * with id' < id (or `init` if none), applies scd2Apply, and writes
    * `snapDir/snap=<id>` in OVERWRITE mode. A retried batch re-reads
    * the same predecessor and rewrites its OWN directory — it cannot
    * double-apply; a restart replays the checkpoint's batch→file
    * mapping against snapshots that already exist, landing in the
    * same directories with the same content.
    *
    * Scale shape: per batch, one outer join of the snapshot's CURRENT
    * slice against the (small) change batch — scd2Apply's contract
    * that closed history is never joined holds here too; the write is
    * snapshot-sized. Production would compact/expire old `snap=` dirs
    * (retention), which is [[graft.operators.Layout.compact]]'s job.
    * A batch mixing multiple as_of timestamps is REFUSED (bounded
    * 2-row probe): fold order inside one batch would be ambiguous —
    * stage chunks so a trigger sees one consistent CDC cut
    * (maxFilesPerTrigger=1 enforces that for file sources). */
  def scd2Stream(spark: SparkSession, stagedDir: String, snapDir: String,
      ckpt: String, keys: Seq[String], init: DataFrame,
      chgSchema: StructType, maxFilesPerTrigger: Int = 1): Unit = {
    require(chgSchema.fieldNames.contains("as_of"),
      "change schema must carry as_of TIMESTAMP")
    val initCols = init.columns.toSeq
    val stream = spark.readStream
      .schema(chgSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stagedDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val asOfs = batch.select(col("as_of")).distinct().limit(2).collect()
        if (asOfs.nonEmpty) {
          require(asOfs.length == 1,
            s"scd2Stream: batch $batchId mixes as_of timestamps")
          val asOf = asOfs(0).getTimestamp(0)
          val predId = snapshotIds(spark, snapDir).filter(_ < batchId)
            .maxOption
          val hist = latestSnapshot(spark, snapDir, batchId)
            .map(_.select(initCols.map(col): _*)).getOrElse(init)
          graft.operators.Incremental
            .scd2Apply(hist, batch.drop("as_of"), keys, asOf)
            .write.mode("overwrite").parquet(s"$snapDir/snap=$batchId")
          writePredMarker(spark, snapDir, batchId, predId)
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def snapshotIds(spark: SparkSession, snapDir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(snapDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("snap="))
      .map(_.getPath.getName.stripPrefix("snap=").toLong)
  }

  /** Each snapshot carries a `_pred` sidecar naming the snapshot it
    * was folded from (`init` for a true first fold). Underscore
    * prefix = invisible to the parquet scan; written AFTER the data
    * so a sidecar implies a complete snapshot. This is what lets a
    * replay distinguish "I never had a predecessor" (legal init
    * fold) from "my predecessor was expired under me" (torn chain). */
  private def writePredMarker(spark: SparkSession, snapDir: String,
      id: Long, pred: Option[Long]): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$snapDir/snap=$id/_pred")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(pred.map(_.toString).getOrElse("init").getBytes("UTF-8"))
    finally out.close()
  }

  private def readPredMarker(spark: SparkSession, snapDir: String,
      id: Long): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$snapDir/snap=$id/_pred")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
      finally in.close()
    }
  }

  /** Latest snapshot strictly BEFORE `beforeId` — a retried batch must
    * see its original predecessor, never its own partial output.
    *
    * Corruption guard: no predecessor on disk is only legal when this
    * batch never HAD one. Two tells that it did: (a) any LATER
    * snapshot exists, or (b) the batch's own snapshot (a replay's
    * partial output, snap=beforeId) exists and its `_pred` sidecar
    * names a predecessor — that predecessor was expired while this
    * batch was uncommitted, and falling back to `init` would silently
    * rebuild the history from scratch. Refuse both instead.
    * [[scd2Expire]]'s keep >= 2 floor makes this unreachable under
    * the documented discipline; the throw is the belt to that
    * suspender. A replayed snapshot whose sidecar says `init` (the
    * stream's true first fold, possibly after empty batches) is the
    * one case that legitimately proceeds from `init`. */
  private def latestSnapshot(spark: SparkSession, snapDir: String,
      beforeId: Long): Option[DataFrame] = {
    val ids = snapshotIds(spark, snapDir)
    val pred = ids.filter(_ < beforeId).maxOption
    if (pred.isEmpty) {
      val ownPred =
        if (ids.contains(beforeId))
          // missing sidecar = pre-upgrade or torn write; conservative
          Some(readPredMarker(spark, snapDir, beforeId).getOrElse("unknown"))
        else None
      val torn = ids.exists(_ > beforeId) || ownPred.exists(_ != "init")
      if (torn)
        throw new IllegalStateException(
          s"snapshot chain under $snapDir is torn: batch $beforeId has no " +
            s"predecessor snapshot but the chain shows it had one " +
            s"(ids=${ids.sorted.mkString(",")}, own _pred=$ownPred); its " +
            "predecessor was expired while the batch was uncommitted — " +
            "restore it or reset the stream")
    }
    pred.map(id => spark.read.parquet(s"$snapDir/snap=$id"))
  }

  /** The current materialized history: the highest-id snapshot. */
  def scd2Latest(spark: SparkSession, snapDir: String): DataFrame = {
    val ids = snapshotIds(spark, snapDir)
    require(ids.nonEmpty, s"scd2Latest: no snapshots under $snapDir")
    spark.read.parquet(s"$snapDir/snap=${ids.max}")
  }

  // ---------------- streaming data-quality accumulation ----------------

  /** Streaming counterpart of [[graft.operators.DataQuality.report]]
    * for ROW-LOCAL checks: each micro-batch computes its counter
    * state (ONE aggregate over the batch) and merges it into the
    * accumulated state — Deequ's incremental-metrics contract, under
    * the same exactly-once snapshot discipline as [[scd2Stream]]
    * (batch id reads latest state < id, overwrites `snap=<id>`;
    * retries/restarts cannot double-count a batch). The final report
    * over N batches equals the batch report over their union
    * (counter additivity, law-tested in DataQualitySpec). */
  def dqStream(spark: SparkSession, stagedDir: String, stateDir: String,
      ckpt: String, checks: Seq[graft.operators.DataQuality.Check],
      srcSchema: StructType, maxFilesPerTrigger: Int = 1): Unit = {
    val stream = spark.readStream
      .schema(srcSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stagedDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = graft.operators.DataQuality.rowLocalState(batch, checks)
        val predId = snapshotIds(spark, stateDir).filter(_ < batchId)
          .maxOption
        val merged = latestSnapshot(spark, stateDir, batchId) match {
          case Some(prev) => graft.operators.DataQuality.mergeStates(prev, s)
          case None => s
        }
        merged.write.mode("overwrite").parquet(s"$stateDir/snap=$batchId")
        writePredMarker(spark, stateDir, batchId, predId)
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The report over everything streamed so far. */
  def dqLatestReport(spark: SparkSession, stateDir: String,
      checks: Seq[graft.operators.DataQuality.Check]): DataFrame =
    graft.operators.DataQuality.reportFromState(
      scd2Latest(spark, stateDir), checks)

  /** Retention: delete all but the newest `keep` snapshots (driver
    * metadata work — each snapshot is a directory). The current table
    * ([[scd2Latest]]) is untouched; a restart replaying an OLD batch
    * id against an expired predecessor cannot happen because the
    * checkpoint only replays batches at-or-after the last committed
    * one, whose predecessor is always within the keep window —
    * PROVIDED keep >= 2. keep = 1 is refused: a batch that wrote
    * `snap=B` but crashed before its checkpoint commit leaves B as
    * the newest snapshot while B's replay still needs B-1; keep = 1
    * would delete B-1 in that uncommitted window (the replay then
    * trips [[latestSnapshot]]'s torn-chain guard instead of silently
    * rebuilding, but the recipe should never get there).
    * Returns the deleted snapshot ids. */
  def scd2Expire(spark: SparkSession, snapDir: String, keep: Int): Seq[Long] = {
    require(keep >= 2, s"keep must be >= 2 (keep=1 can expire the " +
      s"predecessor of an uncommitted batch mid-replay), got $keep")
    val ids = snapshotIds(spark, snapDir).sorted
    val victims = ids.dropRight(keep)
    val fs = new org.apache.hadoop.fs.Path(snapDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    victims.foreach { id =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$snapDir/snap=$id"), true)
    }
    victims
  }

  // ─────── exactly-once streaming MERGE into a versioned table (round 12) ───────

  /** The newest committed stream-batch marker on `tableDir` for
    * `marker` — scanned newest manifest first, stopping at the first
    * hit (bounded by the commits since the stream's last merge). */
  private def lastStreamBatch(spark: SparkSession, tableDir: String,
      marker: String): Option[Long] = {
    import graft.operators.VersionedTable
    VersionedTable.versions(spark, tableDir).reverseIterator
      .map(v => VersionedTable.readManifest(spark, tableDir, v).meta.get(marker))
      .collectFirst { case Some(b) => b.toLong }
  }

  /** Content fingerprint of a file-source micro-batch: md5 over the
    * sorted input file NAMES (names, not full paths — the fingerprint
    * must survive path re-qualification and replica roots). None when
    * the batch cannot be attributed to files (non-file source). */
  private def batchFilesHash(batch: DataFrame): Option[String] = {
    val names = batch.inputFiles.toSeq
      .map(f => new org.apache.hadoop.fs.Path(f).getName).sorted
    if (names.isEmpty) None
    else Some(java.security.MessageDigest.getInstance("MD5")
      .digest(names.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
  }

  /** The recorded content fingerprint of the commit that carried
    * stream batch `batchId` (inner Option: the commit exists but
    * predates fingerprinting). Stream merges are serial, so marker
    * values descend with versions — the scan stops at the first
    * marker below `batchId`. */
  private def committedBatchHash(spark: SparkSession, tableDir: String,
      marker: String, batchId: Long): Option[Option[String]] = {
    import graft.operators.VersionedTable
    VersionedTable.versions(spark, tableDir).reverseIterator
      .map(v => VersionedTable.readManifest(spark, tableDir, v).meta)
      .flatMap(meta => meta.get(marker).map(b => (b.toLong, meta)))
      .takeWhile { case (b, _) => b >= batchId }
      .collectFirst { case (b, meta) if b == batchId =>
        meta.get(s"$marker.files")
      }
  }

  /** Stream CDC batches (staged files under `stagedDir`, each batch
    * key-unique) into a [[graft.operators.VersionedTable]] as
    * file-granular MERGE commits, EXACTLY ONCE across micro-batches,
    * restarts, and batch retries.
    *
    * The exactly-once hinge: each merge commit carries its stream
    * batch id as a manifest `meta` entry, so "the batch's rows are in
    * the table" and "the batch is marked done" are ONE atomic CAS. A
    * replayed batch (crash after commit, before the checkpoint ack)
    * finds its id already committed and is inert; a crash before the
    * commit replays into a fresh merge. Interleaved OTHER writers are
    * handled by re-reading the head and retrying the CAS — the
    * stream's own commits are serial, so the retry loop only races
    * external writers.
    *
    * Retention contract: the newest stream commit's manifest carries
    * the high-water marker; [[graft.operators.VersionedTable.expire]]
    * keep-window sizing must retain it across a restart horizon (the
    * scd2Expire keep >= 2 discipline — a marker expired while its
    * batch could still replay would double-apply).
    *
    * Scale shape per batch: one churn-sized MERGE (envelope-pruned
    * scan + touched-file rewrite) — the table never rewrites beyond
    * the batch's key footprint; checkpoint state is the file-source
    * log only. */
  def tableMergeStream(spark: SparkSession, stagedDir: String,
      tableDir: String, keys: Seq[String], ckpt: String,
      srcSchema: StructType, deleteCol: Option[String] = None,
      maxFilesPerTrigger: Int = 1, maxCasRetries: Int = 5,
      marker: String = "stream.merge.batch"): Unit = {
    import graft.operators.VersionedTable
    val stream = spark.readStream
      .schema(srcSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(stagedDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Inertness is keyed on batch CONTENT, not the raw batchId:
        // batch ids are only stable within one checkpoint, so a fresh
        // checkpoint that groups the staged files differently (bigger
        // maxFilesPerTrigger, interleaved arrivals) must not have its
        // batches silently suppressed by markers from the old
        // checkpoint — that is data loss, not idempotence. A replay is
        // inert iff a committed manifest carries BOTH this batchId and
        // this batch's file fingerprint; a recorded id with a DIFFERENT
        // fingerprint refuses loudly (divergent checkpoint).
        val done = lastStreamBatch(spark, tableDir, marker)
        val h = batchFilesHash(batch)
        committedBatchHash(spark, tableDir, marker, batchId) match {
          case Some(recorded) =>
            val diverged = (recorded, h) match {
              case (Some(r), Some(x)) => r != x
              case _ => false // pre-fingerprint commit or unattributable batch
            }
            if (diverged) throw new IllegalStateException(
              s"stream batch $batchId replayed with different contents than " +
                s"its committed marker on $tableDir (recorded files hash " +
                s"$recorded, replay $h) — the checkpoint was reset and the " +
                "new batch grouping diverged; restart from the ORIGINAL " +
                "checkpoint, or reset with a fresh marker namespace after " +
                "verifying the table state")
            () // true replay of a committed batch: inert
          case None if done.exists(_ >= batchId) =>
            throw new IllegalStateException(
              s"stream batch $batchId is below the committed high-water " +
                s"${done.get} on $tableDir but no commit carries its marker " +
                "— either retention expired the marker inside the restart " +
                "horizon (keep-window too small) or a fresh checkpoint " +
                "regrouped the source; refusing to guess between " +
                "double-apply and data loss")
          case None =>
            var attempts = 0
            var committed = false
            while (!committed) {
              val cur = VersionedTable.latestVersion(spark, tableDir)
              try {
                VersionedTable.merge(spark, tableDir, batch, keys, cur,
                  s"stream-b$batchId", deleteCol,
                  meta = Map(marker -> batchId.toString) ++
                    h.map(x => s"$marker.files" -> x))
                committed = true
              } catch {
                case _: VersionedTable.CommitConflict if attempts < maxCasRetries =>
                  attempts += 1 // an external writer took the version; re-plan
              }
            }
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Manifest of a [[exportStream]] output from the READ-BACK files
    * (same stats as the batch exporter — count, tokens, id sum,
    * md5-prefix checksum per shard), aggregated across all batches. */
  def exportStreamManifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.operators.Dedup.tokens(col("text"))).cast("long")).as("n_tokens"),
        sum(col("doc_id")).cast("long").as("sum_id"),
        sum(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long")).as("checksum"))
      .select(col("shard").cast("long").as("shard"), col("n_docs"),
        col("n_tokens"), col("sum_id"), col("checksum"))
}
