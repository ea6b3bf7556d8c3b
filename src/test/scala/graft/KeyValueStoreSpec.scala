package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import graft.sources.KeyValueStore

/** §2.1 HBaseStorage slot: the sorted-KV DSv2 connector. The
  * load-bearing asserts are the REGION-SERVER behaviors HBaseStorage
  * pushed down: key ranges prune files and bound the in-file scan, and
  * projection reaches the reader. */
class KeyValueStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Files.createTempDirectory("kvstore").toString
  private lazy val kv: String = {
    val p = s"$base/customer_kv"
    KeyValueStore.write(tables.customer, "c_custkey",
      Seq("c_name", "c_nationkey", "c_acctbal"), p, nFiles = 8)
    p
  }

  private def read = spark.read.format(KeyValueStore.Format).load(kv)

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("full read equals the source projection") {
    val got = read.select($"key", $"c_name",
      $"c_nationkey".cast("int").as("c_nationkey"))
    val want = tables.customer.select($"c_custkey".as("key"), $"c_name",
      $"c_nationkey")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("key range prunes files (partitions < files) and rows are exact") {
    val all = scanOf(read).inputRDD.getNumPartitions
    assert(all == 8, s"expected 8 files, planned $all")
    val narrow = read.filter($"key" >= 100 && $"key" < 160)
    assert(scanOf(narrow).inputRDD.getNumPartitions < all,
      "range scan must not open every file")
    assert(narrow.count() ==
      tables.customer.filter($"c_custkey" >= 100 && $"c_custkey" < 160).count())
  }

  test("point get plans a single partition") {
    val one = read.filter($"key" === 42L)
    assert(scanOf(one).inputRDD.getNumPartitions == 1)
    assert(one.select($"c_name").as[String].collect().toSeq ==
      tables.customer.filter($"c_custkey" === 42)
        .select($"c_name").as[String].collect().toSeq)
  }

  test("projection is pushed: scan description lists only requested columns") {
    val df = read.filter($"key" >= 100).select($"c_name")
    val desc = scanOf(df).scan.description()
    assert(desc.contains("cols=c_name"), desc)
    assert(desc.contains("range=[100,"), desc)
  }

  test("empty range yields zero partitions and zero rows") {
    val none = read.filter($"key" > 100000000L)
    assert(scanOf(none).inputRDD.getNumPartitions == 0)
    assert(none.count() == 0)
  }

  test("NULL and empty string are distinct across the round trip") {
    val p = s"$base/nullable_kv"
    // row 2: NULL v1; row 3: EMPTY v1 — the two must not conflate
    // (HBaseStorage skips null cells entirely; our positional encoding
    // marks them in-band and restores real null on read)
    val src = Seq((1L, Some("a"), Some("x")), (2L, None, Some("y")),
      (3L, Some(""), None)).toDF("k", "v1", "v2")
    KeyValueStore.write(src, "k", Seq("v1", "v2"), p, nFiles = 2)
    val back = spark.read.format(KeyValueStore.Format).load(p)
    assert(back.count() == 3)
    val byKey = back.collect().map(r =>
      r.getLong(0) -> (Option(r.getString(1)), Option(r.getString(2)))).toMap
    assert(byKey(2L) == (None, Some("y")), s"null cell lost: ${byKey(2L)}")
    assert(byKey(3L) == (Some(""), None), s"empty cell lost: ${byKey(3L)}")
    // the declared nullable schema is actually exercisable
    assert(back.filter($"v1".isNull).count() == 1)
    assert(back.filter($"v1" === "").count() == 1)
  }

  test("empty table writes a valid sidecar; read plans zero partitions") {
    val p = s"$base/empty_kv"
    KeyValueStore.write(tables.customer.filter($"c_custkey" < 0),
      "c_custkey", Seq("c_name"), p, nFiles = 2)
    val back = spark.read.format(KeyValueStore.Format).load(p)
    assert(back.columns.toSeq == Seq("key", "c_name"))
    assert(back.count() == 0)
  }

  test("negative keys are rejected at write (rowkeys sort as bytes)") {
    val src = Seq((-1L, "a")).toDF("k", "v1")
    intercept[org.apache.spark.SparkException] {
      KeyValueStore.write(src, "k", Seq("v1"), s"$base/neg_kv", nFiles = 1)
    }
  }

  test("DSv2 write: append merges the sidecar; schema is validated") {
    val p = s"$base/append_kv"
    Seq((1L, "a"), (2L, "b")).toDF("key", "v")
      .write.format(KeyValueStore.Format).option("files", "1")
      .mode("append").save(p)
    Seq((10L, "x")).toDF("key", "v")
      .write.format(KeyValueStore.Format).option("files", "1")
      .mode("append").save(p)
    val back = spark.read.format(KeyValueStore.Format).load(p)
    assert(back.count() == 3)
    assert(back.filter($"key" === 10L).select($"v").as[String].collect()(0) == "x")
    intercept[IllegalArgumentException] { // leading column must be the long key
      Seq(("a", 1L)).toDF("v", "key")
        .write.format(KeyValueStore.Format).mode("append").save(s"$base/bad_kv")
    }
  }

  test("connector inserts the range+sort itself: unsorted input still scans by range") {
    val p = s"$base/unsorted_kv"
    Seq(5L, 1L, 9L, 3L, 7L, 2L, 8L, 4L, 6L, 0L).map(k => (k, s"v$k"))
      .toDF("key", "v")
      .write.format(KeyValueStore.Format).option("files", "3")
      .mode("append").save(p)
    val back = spark.read.format(KeyValueStore.Format).load(p)
      .filter($"key" >= 3 && $"key" <= 6)
    assert(back.select($"v").as[String].collect().sorted.toSeq ==
      Seq("v3", "v4", "v5", "v6"))
  }

  test("script STORE … USING HBaseStorage round-trips through the connector") {
    val p = s"$base/script_store_kv"
    graft.pig.PigScript.run(spark,
      s"""N = LOAD '$sf/nation.parquet' USING parquet;
          P = FOREACH N GENERATE n_nationkey, n_name, n_regionkey;
          STORE P INTO '$p'
            USING org.apache.pig.backend.hadoop.hbase.HBaseStorage('d:name d:rk');""",
      executeStores = true)
    val back = graft.pig.PigScript.query(spark,
      s"""R = LOAD '$p' USING HBaseStorage('d:name d:rk', '-loadKey true')
            AS (nk:int, name:chararray, rk:int);
          STORE R INTO 'out';""")
    val want = tables.nation.select($"n_nationkey".as("nk"),
      $"n_name".as("name"), $"n_regionkey".as("rk"))
    assert(back.exceptAll(want).count() == 0 && want.exceptAll(back).count() == 0)
  }

  test("LOAD … USING HBaseStorage through the Pig front end") {
    val df = graft.pig.PigScript.query(spark,
      s"""C = LOAD '$kv'
            USING org.apache.pig.backend.hadoop.hbase.HBaseStorage(
              'd:c_name d:c_nationkey', '-loadKey true')
            AS (ck:long, name:chararray, nk:int);
          F = FILTER C BY ck <= 50;
          STORE F INTO 'out';""")
    val want = tables.customer.filter($"c_custkey" <= 50)
      .select($"c_custkey".as("ck"), $"c_name".as("name"),
        $"c_nationkey".as("nk"))
    assert(df.exceptAll(want).count() == 0 && want.exceptAll(df).count() == 0)
  }

  test("aggregate pushdown: COUNT/MIN/MAX from the file index; unsound ranges refuse") {
    val p = Files.createTempDirectory("kv_agg").toString + "/t"
    KeyValueStore.write(
      (1 to 100).map(i => (i.toLong, s"v$i")).toDF("key", "v"),
      "key", Seq("v"), p, nFiles = 4)
    val back = spark.read.format(KeyValueStore.Format).load(p)
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    // full table: answered from the index, no data file opened
    val full = back.agg(expr("count(*)").as("n"),
      min($"key").as("mn"), max($"key").as("mx"))
    assert(planOf(full).contains("STATS-ONLY"), planOf(full).take(1500))
    assert(full.as[(Long, Long, Long)].head() == ((100L, 1L, 100L)))
    // covering range: still stats-only (every file fully contained)
    val cover = back.filter($"key" >= 1 && $"key" <= 100)
      .agg(expr("count(*)").as("n"), min($"key").as("mn"), max($"key").as("mx"))
    assert(planOf(cover).contains("STATS-ONLY"), planOf(cover).take(1500))
    assert(cover.as[(Long, Long, Long)].head() == ((100L, 1L, 100L)))
    // partial range: a file overlaps without being contained — the
    // pushdown REFUSES and the ordinary scan answers correctly
    val part = back.filter($"key" >= 2 && $"key" <= 99)
      .agg(expr("count(*)").as("n"), min($"key").as("mn"), max($"key").as("mx"))
    assert(!planOf(part).contains("STATS-ONLY"), planOf(part).take(1500))
    assert(part.as[(Long, Long, Long)].head() == ((98L, 2L, 99L)))
    // empty range: SQL aggregate-on-empty semantics from zero files
    val empty = back.filter($"key" > 1000)
      .agg(expr("count(*)").as("n"), min($"key").as("mn"), max($"key").as("mx"))
    assert(planOf(empty).contains("STATS-ONLY"), planOf(empty).take(1500))
    val er = empty.collect()(0)
    assert(er.getLong(0) == 0L && er.isNullAt(1) && er.isNullAt(2))
    // grouped aggregation is never pushed; plain answer still correct
    val grouped = back.groupBy(($"key" % 2).as("par")).count()
    assert(!planOf(grouped).contains("STATS-ONLY"))
    assert(grouped.as[(Long, Long)].collect().toMap == Map(0L -> 50L, 1L -> 50L))
    // AVG/SUM cannot come from (min,max,count) — refused, not wrong
    val avg = back.agg(sum($"key").as("s"))
    assert(!planOf(avg).contains("STATS-ONLY"))
    assert(avg.as[Long].head() == 5050L)
  }
}
