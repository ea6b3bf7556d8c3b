package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.SparseIndex

/** §2 merge-sparse row: parquet-footer min/max index + file-pruned
  * lookup join. The load-bearing assertions are (a) the index reflects
  * the range layout, (b) a selective probe actually SKIPS files, and
  * (c) pruning never changes the answer. */
class SparseIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Files.createTempDirectory("sparseidx").toString

  /** lineitem sorted by l_orderkey into 8 range files. */
  private lazy val sorted: String = {
    val p = s"$base/li_sorted"
    tables.lineitem.select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .repartitionByRange(8, $"l_orderkey")
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(p)
    p
  }

  test("index: one entry per file, ranges cover the data and are disjoint") {
    val idx = SparseIndex.index(spark, sorted, "l_orderkey").sortBy(_.min)
    assert(idx.length == 8)
    assert(idx.forall(f => f.min <= f.max && f.rows > 0))
    // range partitioning → consecutive files do not interleave
    idx.sliding(2).foreach {
      case Seq(a, b) => assert(a.max <= b.min)
      case _ =>
    }
    val (lo, hi) = tables.lineitem
      .agg(min($"l_orderkey"), max($"l_orderkey"))
      .as[(Long, Long)].collect()(0)
    assert(idx.head.min == lo && idx.last.max == hi)
  }

  test("selective probe prunes files; result equals the plain join") {
    val idx = SparseIndex.index(spark, sorted, "l_orderkey").sortBy(_.min)
    // keys confined to the first file's range → exactly one file survives
    val firstMax = idx.head.max
    val probe = tables.orders
      .filter($"o_orderkey" <= firstMax && $"o_orderkey" % 7 === 0)
      .select($"o_orderkey", $"o_orderpriority")
    assert(probe.count() > 0, "fixture sanity: probe must be non-empty")
    val pruned = idx.filter { f =>
      val keys = probe.select($"o_orderkey").as[Long].collect().sorted
      val i = java.util.Arrays.binarySearch(keys, f.min)
      val from = if (i >= 0) i else -i - 1
      from < keys.length && keys(from) <= f.max
    }
    assert(pruned.length < idx.length, "probe must not select every file")
    val got = SparseIndex.lookupJoin(spark, sorted, "l_orderkey", probe, "o_orderkey")
      .select($"l_orderkey", $"l_linenumber", $"o_orderpriority")
    val want = spark.read.parquet(sorted)
      .join(probe, $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_linenumber", $"o_orderpriority")
    assert(got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0)
  }

  test("probe keys are pushed into the parquet scan (row-group pruning)") {
    val probe = tables.orders.filter($"o_orderkey" % 997 === 0)
      .select($"o_orderkey", $"o_orderpriority")
    val df = SparseIndex.lookupJoin(spark, sorted, "l_orderkey", probe, "o_orderkey")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(l_orderkey") ||
      plan.contains("PushedFilters: [l_orderkey IN"), // formatting varies
      s"probe keys not pushed to the scan:\n${plan.take(1500)}")
  }

  test("probe with no matching key range reads nothing and returns empty") {
    val probe = Seq((-5L, "none")).toDF("o_orderkey", "o_orderpriority")
    val got = SparseIndex.lookupJoin(spark, sorted, "l_orderkey", probe, "o_orderkey")
    assert(got.count() == 0)
  }

  test("maxKeys guards the selective-probe contract") {
    val probe = tables.orders.select($"o_orderkey", $"o_orderpriority")
    intercept[IllegalArgumentException] {
      SparseIndex.lookupJoin(spark, sorted, "l_orderkey", probe,
        "o_orderkey", maxKeys = 10)
    }
  }

  /** File-level root paths in some scan of the plan = the pruned read
    * (a plain directory read has exactly one root, the dir). */
  private def hasFileLevelScan(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            // pruned reads list individual part files; directory reads
            // have the dir (or the fixture's *.parquet table path) as root
            fs.location.rootPaths.exists(_.getName.startsWith("part-"))
          case _ => false
        }
    }.exists(identity)

  test("script JOIN … USING 'merge-sparse' routes to the pruned scan") {
    val df = graft.pig.PigScript.query(spark,
      s"""P0 = LOAD '$sf/orders.parquet' USING parquet;
          P = FILTER P0 BY o_orderkey % 997 == 0;
          B = LOAD '$sorted' USING parquet;
          J = JOIN P BY o_orderkey, B BY l_orderkey USING 'merge-sparse';
          R = FOREACH J GENERATE l_orderkey, o_orderpriority;
          STORE R INTO 'out';""")
    assert(hasFileLevelScan(df), "expected a footer-pruned file-level scan")
    val want = tables.lineitem
      .join(tables.orders.filter($"o_orderkey" % 997 === 0),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"o_orderpriority")
    assert(df.exceptAll(want).count() == 0 && want.exceptAll(df).count() == 0)
  }

  test("'merge-sparse' over a non-scan right side falls back to SMJ, same answer") {
    val df = graft.pig.PigScript.query(spark,
      s"""P0 = LOAD '$sf/orders.parquet' USING parquet;
          P = FILTER P0 BY o_orderkey % 997 == 0;
          B0 = LOAD '$sorted' USING parquet;
          B = FILTER B0 BY l_quantity > 0;
          J = JOIN P BY o_orderkey, B BY l_orderkey USING 'merge-sparse';
          R = FOREACH J GENERATE l_orderkey, o_orderpriority;
          STORE R INTO 'out';""")
    assert(!hasFileLevelScan(df), "filtered right side must not be routed")
    val want = tables.lineitem.filter($"l_quantity" > 0)
      .join(tables.orders.filter($"o_orderkey" % 997 === 0),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"o_orderpriority")
    assert(df.exceptAll(want).count() == 0 && want.exceptAll(df).count() == 0)
  }
}
