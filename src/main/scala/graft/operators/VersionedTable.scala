package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal atomic commit protocol for the versioned-table family —
  * the piece that turns "a directory of parquet" into a table two
  * writers can safely race on (the Delta/Iceberg commit-log idea at
  * its smallest: monotonic integer versions, one manifest file per
  * committed version, atomic create-exclusive as the CAS).
  *
  * Layout under `dir`:
  *
  *   - `_log/<version>.manifest` — one file per COMMITTED version; the
  *     body lists the version's data directory (exactly one per
  *     commit) plus the writer id and expected-parent receipt. A
  *     version exists iff its manifest file exists — manifest
  *     creation IS the commit.
  *   - `data/v<version>-<writer>/` — the version's parquet, staged
  *     fully BEFORE the commit attempt. Losers' staged dirs are
  *     deleted on conflict; a crashed writer leaves an orphan staging
  *     dir that no manifest references (harmless; [[vacuum]] sweeps
  *     them).
  *
  * The CAS: commit(expectedVersion = v) creates `_log/{v+1}.manifest`
  * with create-exclusive semantics (HDFS `create(overwrite=false)` is
  * atomic; the rename-based variant has the same contract). Two
  * writers racing from the same parent both stage data, but exactly
  * ONE creates the manifest — the other gets [[CommitConflict]],
  * loudly, with its staging cleaned up. Readers resolve the table by
  * listing `_log` (bounded, version-count-sized driver metadata) and
  * reading the referenced data directory — they can never observe a
  * half-committed version because the manifest lands after the data.
  *
  * Scale shape: the log is O(versions) tiny files and every data
  * version is immutable-once-committed, so snapshot reads need no
  * locks; time travel ([[readVersion]]) is a manifest lookup. At
  * 100 TB, per-version data dirs hold the same partitioned/z-ordered
  * layouts as any other table ([[Layout]] applies unchanged), and
  * expired versions are dropped by deleting old manifests + their
  * dirs ([[expire]]) — newest-first retention, same discipline as
  * [[graft.streaming.CurationStreaming.scd2Expire]] including its
  * keep >= 2 floor.
  */
object VersionedTable {

  final class CommitConflict(msg: String) extends RuntimeException(msg)

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir(dir: String) = s"$dir/_log"

  /** Committed versions, ascending. Bounded driver metadata. */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(logDir(dir))
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".manifest"))
      .map(_.stripSuffix(".manifest").toLong)
      .sorted
  }

  /** Latest committed version, or -1 for an empty table (so the first
    * commit's expectedVersion is -1 — "I expect no table yet"). */
  def latestVersion(spark: SparkSession, dir: String): Long =
    versions(spark, dir).lastOption.getOrElse(-1L)

  private def manifestPath(dir: String, v: Long) =
    new org.apache.hadoop.fs.Path(s"${logDir(dir)}/$v.manifest")

  private def readManifest(spark: SparkSession, dir: String, v: Long): Map[String, String] = {
    val f = fs(spark, dir)
    val in = f.open(manifestPath(dir, v))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    body.linesIterator.filter(_.contains("=")).map { l =>
      val i = l.indexOf('='); (l.substring(0, i), l.substring(i + 1))
    }.toMap
  }

  /** Commit `df` as the child of `expectedVersion`. Stages the data
    * fully, then CASes the manifest. Returns the new version number.
    * Throws [[CommitConflict]] (staging cleaned) if another writer
    * committed first — the caller re-reads the table, reconciles, and
    * retries; silent last-writer-wins is exactly the torn-table bug
    * this protocol exists to prevent. `writerId` must be unique per
    * concurrent writer (staging isolation), not globally. */
  def commit(spark: SparkSession, dir: String, df: DataFrame,
      expectedVersion: Long, writerId: String,
      allowSchemaChange: Boolean = false): Long = {
    require(writerId.nonEmpty && !writerId.exists(c => c == '/' || c == '\n'),
      s"writerId must be a plain token, got '$writerId'")
    val f = fs(spark, dir)
    val newV = expectedVersion + 1
    // fast-path staleness check (the CAS below still decides)
    val cur = latestVersion(spark, dir)
    if (cur != expectedVersion)
      throw new CommitConflict(
        s"commit to $dir: expected version $expectedVersion but table is " +
          s"at $cur — re-read, reconcile, retry")
    // schema-drift guard (the Delta contract): a commit that silently
    // changes column names/types breaks every downstream reader of
    // the NEXT version — evolution must be an explicit decision
    if (cur >= 0 && !allowSchemaChange) {
      def shape(s: org.apache.spark.sql.types.StructType) =
        s.fields.map(x => (x.name, x.dataType)).toSeq
      val prev = readVersion(spark, dir, cur).schema
      require(shape(prev) == shape(df.schema),
        s"commit to $dir: schema changed (was ${prev.simpleString}, " +
          s"committing ${df.schema.simpleString}) — pass " +
          "allowSchemaChange = true to evolve the table explicitly")
    }
    val dataRel = s"data/v$newV-$writerId"
    val dataPath = new org.apache.hadoop.fs.Path(s"$dir/$dataRel")
    df.write.mode("overwrite").parquet(dataPath.toString)
    val body =
      s"version=$newV\nparent=$expectedVersion\nwriter=$writerId\ndata=$dataRel\n"
    f.mkdirs(new org.apache.hadoop.fs.Path(logDir(dir)))
    val mp = manifestPath(dir, newV)
    // Stage the FULL manifest body first, then promote atomically —
    // readers must never observe a half-written manifest. The promote
    // is the CAS: exactly one racer wins the destination name.
    //   - local fs: hard-link (POSIX link(2) fails atomically if the
    //     destination exists; content appears complete or not at all)
    //   - everything else: FileContext.rename with Rename.NONE — the
    //     HDFS-atomic no-overwrite rename (the Delta LogStore recipe)
    val tmp = new org.apache.hadoop.fs.Path(
      s"${logDir(dir)}/.tmp-$writerId-$newV")
    val out = f.create(tmp, true)
    try { out.write(body.getBytes("UTF-8")) } finally out.close()
    val won =
      if (f.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(mp.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath))
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      } else {
        try {
          org.apache.hadoop.fs.FileContext
            .getFileContext(mp.toUri, spark.sparkContext.hadoopConfiguration)
            .rename(tmp, mp, org.apache.hadoop.fs.Options.Rename.NONE)
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.io.IOException if f.exists(mp) => false
        }
      }
    f.delete(tmp, false)
    if (!won) {
      f.delete(dataPath, true)
      throw new CommitConflict(
        s"commit to $dir: lost the race for version $newV — staged data " +
          "removed; re-read, reconcile, retry")
    }
    newV
  }

  /** The table at a specific committed version (time travel). */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame = {
    val m = readManifest(spark, dir, v)
    spark.read.parquet(s"$dir/${m("data")}")
  }

  /** A committed version's data directory — for layout receipts
    * (file envelopes, skipping ratios): a version whose commit
    * carried a clustered plan (repartitionByRange + sort) has files
    * whose min/max stats PROVE the clustering, and this is where a
    * caller points [[Layout.fileEnvelopes]] at. */
  def dataDir(spark: SparkSession, dir: String, v: Long): String =
    s"$dir/${readManifest(spark, dir, v)("data")}"

  /** The table at its latest committed version. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val v = latestVersion(spark, dir)
    require(v >= 0, s"no committed versions under $dir")
    readVersion(spark, dir, v)
  }

  /** Retention: drop all but the newest `keep` versions — manifest
    * first (the version disappears atomically), then its data dir.
    * keep >= 2 for the same uncommitted-window reason as scd2Expire:
    * a reader that resolved version N must not lose N's data while a
    * writer is mid-commit on N+1. Returns dropped versions. */
  def expire(spark: SparkSession, dir: String, keep: Int): Seq[Long] = {
    require(keep >= 2, s"keep must be >= 2, got $keep")
    val f = fs(spark, dir)
    val victims = versions(spark, dir).dropRight(keep)
    victims.foreach { v =>
      val m = readManifest(spark, dir, v)
      f.delete(manifestPath(dir, v), false)
      f.delete(new org.apache.hadoop.fs.Path(s"$dir/${m("data")}"), true)
    }
    victims
  }

  /** Sweep orphan staging dirs (crashed writers): any `data/v*` dir
    * no manifest references. Never touches committed data. */
  def vacuum(spark: SparkSession, dir: String): Seq[String] = {
    val f = fs(spark, dir)
    val dataRoot = new org.apache.hadoop.fs.Path(s"$dir/data")
    if (!f.exists(dataRoot)) return Seq.empty
    val referenced = versions(spark, dir)
      .map(v => readManifest(spark, dir, v)("data")).toSet
    val orphans = f.listStatus(dataRoot).toSeq
      .filter(_.isDirectory)
      .map(s => s"data/${s.getPath.getName}")
      .filterNot(referenced.contains)
    orphans.foreach(rel => f.delete(new org.apache.hadoop.fs.Path(s"$dir/$rel"), true))
    orphans
  }
}
