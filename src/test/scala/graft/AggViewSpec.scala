package graft

import org.apache.spark.sql.functions._
import graft.operators.{AggView, VersionedTable}

/** Incremental materialized aggregate views (operators/AggView.scala):
  * a versioned STATE table maintained from the source's CDC feed by
  * exact retraction. Load-bearing claims: after any churn mix
  * (updates, inserts, DV deletes, group moves) the synced view equals
  * the direct aggregate of the source bit-for-bit; refresh cost is
  * churn-sized; a lost ack never double-applies (the view.synced
  * marker decides the feed start, not the cursor). */
class AggViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(tag).toString

  private val measures = Seq("x" -> col("x"))

  /** Direct (non-incremental) answer for comparison. */
  private def direct(srcDir: String) =
    AggView.finalize(AggView.state(
      VersionedTable.read(spark, srcDir), Seq("g"), measures))

  private def viewEqualsDirect(srcDir: String, viewDir: String): Unit = {
    val v = AggView.read(spark, viewDir)
    val d = direct(srcDir)
    assert(v.exceptAll(d).isEmpty && d.exceptAll(v).isEmpty,
      s"view != direct aggregate:\nview=${v.collect().toSeq}\n" +
        s"direct=${d.collect().toSeq}")
  }

  test("view tracks updates, inserts, deletes, and group moves exactly") {
    val root = tmp("aggview")
    val src = s"$root/src"; val view = s"$root/view"
    val base = spark.range(100).select($"id".as("k"),
      (($"id" % 4).cast("string")).as("g"), ($"id" * 10).cast("double").as("x"))
    VersionedTable.commit(spark, src, base, -1L, "w",
      clusterBy = Seq("k"), clusterFiles = 4)
    AggView.init(spark, src, view, "vmaint", Seq("g"), measures)
    viewEqualsDirect(src, view)
    // churn 1: price updates + a GROUP MOVE (k=8 moves g 0→9) + inserts
    val ch = Seq((3L, "3", 77.0), (8L, "9", 80.0), (500L, "9", 5.0))
      .toDF("k", "g", "x")
    VersionedTable.merge(spark, src, ch, Seq("k"), 0L, "w")
    // churn 2: a DV delete wipes part of group "1"
    VersionedTable.deleteWhere(spark, src, "k % 4 = 1 and k < 40", 1L, "w")
    val applied = AggView.sync(spark, src, view, "vmaint", Seq("k"),
      Seq("g"), measures)
    assert(applied.contains((0L, 2L)), s"got $applied")
    viewEqualsDirect(src, view)
    // caught up: sync is a no-op
    assert(AggView.sync(spark, src, view, "vmaint", Seq("k"),
      Seq("g"), measures).isEmpty)
    // a group emptied by deletion disappears from the view
    VersionedTable.deleteWhere(spark, src, "g = '2'", 2L, "w")
    AggView.sync(spark, src, view, "vmaint", Seq("k"), Seq("g"), measures)
    assert(AggView.read(spark, view).filter($"g" === "2").count() == 0L,
      "an emptied group must leave the view, not linger at cnt=0")
    viewEqualsDirect(src, view)
  }

  test("view converges across a RESTORE: the undo feed retracts the bad batch") {
    val root = tmp("aggview-rst")
    val src = s"$root/src"; val view = s"$root/view"
    val base = spark.range(100).select($"id".as("k"),
      (($"id" % 4).cast("string")).as("g"), ($"id" * 10).cast("double").as("x"))
    VersionedTable.commit(spark, src, base, -1L, "w",
      clusterBy = Seq("k"), clusterFiles = 4)
    AggView.init(spark, src, view, "vmaint", Seq("g"), measures)
    // a bad batch lands AND the view syncs it (the worst case: the
    // corruption is already folded into the view's state)
    val bad = Seq((3L, "3", 1e6), (500L, "0", 1e6)).toDF("k", "g", "x")
    VersionedTable.merge(spark, src, bad, Seq("k"), 0L, "w")
    AggView.sync(spark, src, view, "vmaint", Seq("k"), Seq("g"), measures)
    viewEqualsDirect(src, view)
    // RESTORE rolls the source back; the view must converge through
    // the restore's UNDO feed — exact retraction, no re-bootstrap
    VersionedTable.restore(spark, src, 0L, 1L, "op")
    AggView.sync(spark, src, view, "vmaint", Seq("k"), Seq("g"), measures)
    viewEqualsDirect(src, view)
    val d = direct(src)
    assert(d.agg(max(col("sum_x"))).head.getDouble(0) < 1e6,
      "the bad values must be fully retracted")
  }

  test("a lost ack never double-applies: the marker decides the feed") {
    val root = tmp("aggview-crash")
    val src = s"$root/src"; val view = s"$root/view"
    val base = spark.range(50).select($"id".as("k"),
      lit("a").as("g"), lit(1.0).as("x"))
    VersionedTable.commit(spark, src, base, -1L, "w")
    AggView.init(spark, src, view, "vmaint", Seq("g"), measures)
    VersionedTable.merge(spark, src,
      Seq((1L, "a", 100.0)).toDF("k", "g", "x"), Seq("k"), 0L, "w")
    AggView.sync(spark, src, view, "vmaint", Seq("k"), Seq("g"), measures)
    // simulate "merge landed, ack lost": rewind the cursor to v0
    // while the view's marker stays at v1
    VersionedTable.dropCursor(spark, src, "vmaint")
    VersionedTable.initCursor(spark, src, "vmaint", 0L)
    // more churn stacks on top of the un-acked range
    VersionedTable.merge(spark, src,
      Seq((2L, "a", 200.0)).toDF("k", "g", "x"), Seq("k"), 1L, "w")
    val applied = AggView.sync(spark, src, view, "vmaint", Seq("k"),
      Seq("g"), measures)
    assert(applied.contains((0L, 2L)))
    // a cursor-driven feed would re-apply v0→v1 (the +99 on k=1) and
    // overcount sum by 99; the marker-driven feed must not
    viewEqualsDirect(src, view)
    val sum = AggView.read(spark, view).select($"sum_x").as[Double].head()
    assert(sum == 48.0 + 100.0 + 200.0, s"double-applied: $sum")
  }

  test("views compose: a feed-declared view feeds downstream streams") {
    val root = tmp("aggview-compose")
    val src = s"$root/src"; val view = s"$root/view"
    val base = spark.range(20).select($"id".as("k"),
      (($"id" % 2).cast("string")).as("g"), lit(1.0).as("x"))
    VersionedTable.commit(spark, src, base, -1L, "w")
    AggView.init(spark, src, view, "vmaint", Seq("g"), measures,
      viewMeta = Map(VersionedTable.FeedKey -> "g"))
    // the view's own bootstrap feed exists (the view IS a table)
    assert(spark.read.parquet(s"$view/_changes/v0").count() == 2L)
    VersionedTable.merge(spark, src,
      Seq((0L, "0", 50.0)).toDF("k", "g", "x"), Seq("k"), 0L, "w")
    AggView.sync(spark, src, view, "vmaint", Seq("k"), Seq("g"), measures)
    // the sync's merge fed the view's OWN change rows downstream:
    // group "0" state changed (update), group "1" untouched
    val f1 = spark.read.parquet(s"$view/_changes/v1")
    assert(f1.select($"g", $"op").as[(String, String)].collect().toSet ==
      Set(("0", "update")), "only the affected group's state feeds")
    viewEqualsDirect(src, view)
  }

  test("refresh reads churn, not the source: feed receipts") {
    val root = tmp("aggview-cost")
    val src = s"$root/src"; val view = s"$root/view"
    val base = spark.range(1000).select($"id".as("k"),
      (($"id" % 10).cast("string")).as("g"), lit(2.0).as("x"))
    VersionedTable.commit(spark, src, base, -1L, "w",
      clusterBy = Seq("k"), clusterFiles = 8)
    AggView.init(spark, src, view, "vmaint", Seq("g"), measures)
    // localized churn touches 1 of 8 source files; the CDF the sync
    // consumes is churn-sized (the changesBetween contract, already
    // plan-verified) — here we pin the VIEW-side cost: the view merge
    // touches only the affected groups' files
    VersionedTable.merge(spark, src,
      spark.range(10).select($"id".as("k"), lit("0").as("g"),
        lit(9.0).as("x")), Seq("k"), 0L, "w")
    AggView.sync(spark, src, view, "vmaint", Seq("k"), Seq("g"), measures)
    viewEqualsDirect(src, view)
  }

  test("hybrid MIN/MAX: incremental when provable, group-scoped rescan when not") {
    val root = tmp("aggview-ext")
    val src = s"$root/src"; val view = s"$root/view"
    val ext = Seq("x" -> col("x"))
    def check(): Unit = {
      val v = AggView.read(spark, view)
      val d = AggView.finalize(AggView.state(
        VersionedTable.read(spark, src), Seq("g"), measures, extremes = ext))
      assert(v.exceptAll(d).isEmpty && d.exceptAll(v).isEmpty,
        s"view != direct:\nview=${v.orderBy($"g").collect().toSeq}\n" +
          s"direct=${d.orderBy($"g").collect().toSeq}")
    }
    def rescanMeta: Map[String, String] =
      VersionedTable.readManifest(spark, view,
        VersionedTable.latestVersion(spark, view)).meta
    def srcV = VersionedTable.latestVersion(spark, src)
    def syncNow() = AggView.sync(spark, src, view, "vm", Seq("k"),
      Seq("g"), measures, extremes = ext)
    // cluster the SOURCE by the group column so the uncertain-group
    // re-scan has a stats envelope to prune on
    val base = spark.range(800).select($"id".as("k"),
      (($"id" % 8).cast("string")).as("g"), $"id".cast("double").as("x"))
    VersionedTable.commit(spark, src, base, -1L, "w",
      clusterBy = Seq("g"), clusterFiles = 8)
    AggView.init(spark, src, view, "vm", Seq("g"), measures, extremes = ext)
    check()
    // 1. insert-only churn sets a new group max: tightens in place
    VersionedTable.merge(spark, src,
      Seq((9001L, "1", 1e6)).toDF("k", "g", "x"), Seq("k"), srcV, "w")
    syncNow(); check()
    assert(rescanMeta.get(AggView.RescanGroupsKey).contains("0"),
      s"insert-only churn must not re-scan: $rescanMeta")
    // 2. delete a row strictly INSIDE a group's range: still no rescan
    VersionedTable.deleteWhere(spark, src, "k = 100", srcV, "w")
    syncNow(); check()
    assert(rescanMeta.get(AggView.RescanGroupsKey).contains("0"),
      s"an interior retraction must not re-scan: $rescanMeta")
    // 3. delete group 1's MAX (the 1e6 row): provably uncertain — the
    //    rescan runs, but reads only the affected group's files
    //    (receipt in the view commit, pruned via the source's stats)
    VersionedTable.deleteWhere(spark, src, "k = 9001", srcV, "w")
    syncNow(); check()
    val m3 = rescanMeta
    val total = VersionedTable.liveFiles(spark, src, srcV).length
    assert(m3(AggView.RescanGroupsKey).toInt == 1, s"one uncertain group: $m3")
    assert(m3(AggView.RescanFilesKey).toInt > 0 &&
      m3(AggView.RescanFilesKey).toInt < total,
      s"rescan must read a pruned file subset, not the table: $m3 of $total")
    assert(AggView.read(spark, view).filter($"g" === "1")
      .select($"max_x").as[Double].head() == 793.0,
      "the recomputed max must be the pre-insert group max")
    // 4. a GROUP MOVE of a group's max row: retraction side rescans
    //    the old group, applied side tightens the new group in place
    VersionedTable.merge(spark, src,
      Seq((798L, "7", 1.0)).toDF("k", "g", "x"), Seq("k"), srcV, "w")
    syncNow(); check()
    assert(AggView.read(spark, view).filter($"g" === "7")
      .select($"min_x").as[Double].head() == 1.0)
  }

  test("resolved config survives a source rename of group AND measure") {
    val root = tmp("aggview-rn")
    val src = s"$root/src"; val view = s"$root/view"
    val rows = (1L to 300L).map(k => (k, (k % 4).toString, k.toDouble))
      .toDF("k", "g", "x")
    VersionedTable.commit(spark, src, rows, -1L, "w",
      clusterBy = Seq("k"), clusterFiles = 4)
    AggView.initResolved(spark, src, view, "dash", keys = Seq("k"),
      groupCols = Seq("g"), measures = Seq("x" -> "x"),
      extremes = Seq("x" -> "x"))
    // churn 1 under original names
    VersionedTable.merge(spark, src,
      Seq((7L, "2", 700.0), (400L, "9", 4.0)).toDF("k", "g", "x"),
      Seq("k"), 0L, "w")
    assert(AggView.syncResolved(spark, src, view, "dash")
      .contains((0L, 1L)))
    // the rename between syncs: group AND measure columns
    VersionedTable.renameColumns(spark, src,
      Map("g" -> "grp", "x" -> "val"), 1L, "mig")
    // churn 2 under NEW names: update + delete + group move
    VersionedTable.merge(spark, src,
      Seq((8L, "3", 800.0), (400L, "2", 5.0)).toDF("k", "grp", "val"),
      Seq("k"), 2L, "w")
    VersionedTable.deleteWhere(spark, src, "k = 7", 3L, "w")
    val applied = AggView.syncResolved(spark, src, view, "dash")
    assert(applied.contains((1L, 4L)), s"post-rename sync: $applied")
    // the view's header tracked the rename (metadata-only)
    assert(VersionedTable.schemaOf(spark, view,
      VersionedTable.latestVersion(spark, view)).fieldNames.head == "grp")
    // bit-exact vs the direct aggregate under the NEW names
    val v = AggView.read(spark, view)
    val d = AggView.finalize(AggView.state(
      VersionedTable.read(spark, src), Seq("grp"),
      Seq("x" -> col("val")), extremes = Seq("x" -> col("val"))))
    assert(v.exceptAll(d).isEmpty && d.exceptAll(v).isEmpty,
      s"view != direct:\nview=${v.collect().toSeq}\nd=${d.collect().toSeq}")
    // a caught-up resolved sync is a no-op
    assert(AggView.syncResolved(spark, src, view, "dash").isEmpty)
  }
}
