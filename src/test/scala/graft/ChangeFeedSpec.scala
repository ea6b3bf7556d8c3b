package graft

import org.apache.spark.sql.functions._
import graft.operators.VersionedTable

/** Persisted change feed (operators/VersionedTable.scala, round 13):
  * a `feed.keys`-declared table materializes each commit's keyed
  * change rows under `_changes/v<N>` and is consumable as a vanilla
  * Structured Streaming file source. Load-bearing claims: feed files
  * equal [[VersionedTable.changesBetween]] row for row, a crashed
  * feed write re-derives identically ([[VersionedTable.ensureFeed]]),
  * the stream delivers each feed exactly once across restarts, and a
  * non-add migration leaves an explicit RESET gap instead of a torn
  * feed. */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def base(n: Int) =
    spark.range(n).select($"id".as("k"), concat(lit("v"), $"id").as("v"))

  test("feed files: bootstrap inserts, churn diffs, dv deletes") {
    val dir = tmp("feed-basic")
    VersionedTable.commit(spark, dir, base(20), -1L, "w",
      meta = Map(VersionedTable.FeedKey -> "k"))
    // v0 bootstrap: every row an insert
    val f0 = spark.read.parquet(s"$dir/_changes/v0")
    assert(f0.count() == 20L &&
      f0.filter($"op" =!= "insert" || $"version" =!= 0L).count() == 0L)
    // v1: a merge (feed declaration inherits — no meta re-passed)
    val ch = Seq((3L, "upd3"), (100L, "new100")).toDF("k", "v")
    VersionedTable.merge(spark, dir, ch, Seq("k"), 0L, "m")
    val f1 = spark.read.parquet(s"$dir/_changes/v1")
    assert(f1.select($"k", $"op").as[(Long, String)].collect().toSet ==
      Set((3L, "update"), (100L, "insert")))
    // v2: a DV delete feeds deletes
    VersionedTable.deleteWhere(spark, dir, "k in (5, 7)", 1L, "gdpr")
    val f2 = spark.read.parquet(s"$dir/_changes/v2")
    assert(f2.select($"k", $"op").as[(Long, String)].collect().toSet ==
      Set((5L, "delete"), (7L, "delete")))
    // each feed equals changesBetween row for row
    val cb = VersionedTable.changesBetween(spark, dir, 1L, 2L, Seq("k"))
    assert(f2.drop("version").exceptAll(cb).isEmpty &&
      cb.exceptAll(f2.drop("version")).isEmpty)
  }

  test("ensureFeed repairs a crashed feed write, byte-identically") {
    val dir = tmp("feed-repair")
    VersionedTable.commit(spark, dir, base(10), -1L, "w",
      meta = Map(VersionedTable.FeedKey -> "k"))
    VersionedTable.merge(spark, dir,
      Seq((1L, "x")).toDF("k", "v"), Seq("k"), 0L, "m")
    val before = spark.read.parquet(s"$dir/_changes/v1").collect().toSet
    // simulate a crash between the commit CAS and the feed write
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/_changes/v1"), true)
    assert(VersionedTable.ensureFeed(spark, dir) == Seq(1L))
    assert(spark.read.parquet(s"$dir/_changes/v1").collect().toSet == before)
    // idempotent: nothing missing now
    assert(VersionedTable.ensureFeed(spark, dir).isEmpty)
  }

  test("changeStream: exactly-once across restarts, version-ordered replay") {
    val dir = tmp("feed-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("feed-ckpt").toString
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]
    def runOnce(): Unit = {
      val q = VersionedTable.changeStream(spark, dir)
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select(col("k"), col("op"), col("version"))
            .collect().foreach(r =>
              out.add((r.getLong(0), r.getString(1), r.getLong(2))))
          ()
        }.start()
      q.awaitTermination()
    }
    VersionedTable.commit(spark, dir, base(6), -1L, "w",
      meta = Map(VersionedTable.FeedKey -> "k"))
    VersionedTable.merge(spark, dir,
      Seq((2L, "u2")).toDF("k", "v"), Seq("k"), 0L, "m")
    runOnce()
    import scala.jdk.CollectionConverters._
    assert(out.asScala.toSet ==
      (0L until 6L).map(k => (k, "insert", 0L)).toSet + ((2L, "update", 1L)))
    // restart with more commits: ONLY the new feed arrives
    out.clear()
    VersionedTable.deleteWhere(spark, dir, "k = 4", 1L, "gdpr")
    runOnce()
    assert(out.asScala.toSet == Set((4L, "delete", 2L)),
      s"already-checkpointed feeds must not replay: ${out.asScala.toSet}")
    // a replayed sink applying by max-version reconstructs the table
    out.clear()
  }

  test("non-add migration leaves a RESET gap; the feed resumes after") {
    val dir = tmp("feed-reset")
    VersionedTable.commit(spark, dir, base(5), -1L, "w",
      meta = Map(VersionedTable.FeedKey -> "k"))
    // drop a column: changesBetween(0,1) is undefined
    VersionedTable.commit(spark, dir,
      base(5).select($"k"), 0L, "w", allowSchemaChange = true)
    VersionedTable.merge(spark, dir, Seq(Tuple1(99L)).toDF("k"),
      Seq("k"), 1L, "m")
    assert(VersionedTable.feedResets(spark, dir) == Seq(1L))
    // the reset version contributes NOTHING to a stream; v2 feeds again
    val files = spark.read.parquet(s"$dir/_changes/v2")
    assert(files.select($"k", $"op").as[(Long, String)].collect().toSet ==
      Set((99L, "insert")))
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(f.exists(new org.apache.hadoop.fs.Path(s"$dir/_changes/v1/_RESET")))
  }

  test("streaming MERGE into a feed-declared table feeds every batch") {
    // composition: tableMergeStream commits ride the same expectMeta
    // inheritance, so each micro-batch MERGE also materializes its
    // feed — stream in, stream out, no extra wiring
    val root = java.nio.file.Files.createTempDirectory("feed-compose").toString
    val src = s"$root/src"; val vt = s"$root/t"; val ckpt = s"$root/ckpt"
    VersionedTable.commit(spark, vt, base(10).withColumn("__keep", lit(1))
        .drop("__keep"), -1L, "w",
      meta = Map(VersionedTable.FeedKey -> "k"))
    val leg = Seq((3L, "streamed3", false), (77L, "new77", false),
      (4L, "x", true)).toDF("k", "v", "__del")
    leg.coalesce(1).write.mode("append").parquet(src)
    val ss = graft.streaming.EventsStreaming.replaySession(spark)
    graft.streaming.CurationStreaming.tableMergeStream(
      ss, src, vt, Seq("k"), ckpt, leg.schema, deleteCol = Some("__del"))
    assert(VersionedTable.latestVersion(spark, vt) == 1L)
    val f1 = spark.read.parquet(s"$vt/_changes/v1")
    assert(f1.select($"k", $"op").as[(Long, String)].collect().toSet ==
      Set((3L, "update"), (77L, "insert"), (4L, "delete")),
      "the streamed batch's merge must feed its exact change set")
  }

  test("history reads the audit trail off the manifests") {
    val dir = tmp("feed-history")
    VersionedTable.commit(spark, dir, base(10), -1L, "alice",
      meta = Map(VersionedTable.FeedKey -> "k"))
    VersionedTable.merge(spark, dir,
      Seq((1L, "u")).toDF("k", "v"), Seq("k"), 0L, "bob")
    VersionedTable.deleteWhere(spark, dir, "k = 2", 1L, "gdpr-job")
    val h = VersionedTable.history(spark, dir)
      .select($"version", $"writer", $"files_added", $"files_removed",
        $"masked_rows")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(h.map(_._1) == Seq(2L, 1L, 0L), "newest first")
    assert(h.map(_._2) == Seq("gdpr-job", "bob", "alice"))
    val dv = h.head
    assert(dv._3 == 0L && dv._4 == 0L && dv._5 == 1L,
      s"a DV commit adds/removes nothing and masks 1 row: $dv")
    assert(VersionedTable.history(spark, dir)
      .filter($"meta".contains("feed.keys=k")).count() == 3L,
      "declarations inherit and show in the audit trail")
  }

  test("maintain: purge over budget, compact, expire, vacuum — one call") {
    val dir = tmp("feed-maintain")
    val df = spark.range(1000).select($"id".as("k"),
      concat(lit("v"), $"id").as("v"))
    VersionedTable.commit(spark, dir, df, -1L, "w",
      clusterBy = Seq("k"), clusterFiles = 4)
    VersionedTable.deleteWhere(spark, dir, "k % 10 = 0", 0L, "gdpr") // 10%
    val st = VersionedTable.maintain(spark, dir, "janitor",
      maskedBudget = 0.02, smallBytes = 1L << 20, keepVersions = 2,
      graceMs = 0L)
    assert(st.purged.nonEmpty, "10% masked >= 2% budget must purge")
    assert(VersionedTable.readManifest(spark, dir,
      VersionedTable.latestVersion(spark, dir)).dv.isEmpty)
    assert(VersionedTable.read(spark, dir).count() == 900L)
    // under budget: no purge
    VersionedTable.deleteWhere(spark, dir, "k = 1",
      VersionedTable.latestVersion(spark, dir), "gdpr")
    val st2 = VersionedTable.maintain(spark, dir, "janitor",
      maskedBudget = 0.02, smallBytes = 1L, keepVersions = 2, graceMs = 0L)
    assert(st2.purged.isEmpty, "1/900 masked is under the 2% budget")
    assert(VersionedTable.read(spark, dir).count() == 899L)
  }

  test("expire drops victims' feed dirs; vacuum sweeps stale stages") {
    val dir = tmp("feed-expire")
    VersionedTable.commit(spark, dir, base(8), -1L, "w",
      meta = Map(VersionedTable.FeedKey -> "k"))
    (1 to 3).foreach(i => VersionedTable.merge(spark, dir,
      Seq((i.toLong, s"u$i")).toDF("k", "v"), Seq("k"), i - 1L, "m"))
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    VersionedTable.expire(spark, dir, keep = 2)
    def feeds = f.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_changes"))
      .toSeq.map(_.getPath.getName).sorted
    assert(feeds == Seq("v2", "v3"), s"got $feeds")
    // a promoted-but-unswept stage dir is garbage once its target exists
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/_feedstage/v3-w-dead"))
    assert(VersionedTable.vacuum(spark, dir).contains("_feedstage/v3-w-dead"))
  }
}
