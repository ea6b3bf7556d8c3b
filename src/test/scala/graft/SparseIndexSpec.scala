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
}
