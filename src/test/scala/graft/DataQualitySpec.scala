package graft

import org.apache.spark.sql.functions._
import graft.operators.DataQuality
import graft.operators.DataQuality._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.select("check_name", "target", "observed", "passed")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getBoolean(3))).toMap

  test("row-local checks: null semantics fail closed, ratios exact") {
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "A", 0.02), (2L, "B", 0.05), (3L, null, 0.20),
      (null, "A", null), (5L, "Z", 0.03)
    ).toDF("id", "flag", "disc")
    val rep = asMap(DataQuality.report(df, Seq(
      NotNull("id"),
      Completeness("flag", 0.8),
      InRange("disc", 0.0, 0.1),          // null + 0.20 -> 2 violations
      AcceptedValues("flag", Seq("A", "B")), // null + Z -> 2 violations
      MatchesRatio("flag", "^[AB]$", 0.5),   // 3/5 match
      MinRowCount(5L))))
    assert(rep(("not_null", "id")) == (1.0, false))
    assert(rep(("completeness", "flag")) == (0.8, true))
    assert(rep(("in_range", "disc")) == (2.0, false),
      "NULL must count as an in_range violation (fail closed)")
    assert(rep(("accepted_values", "flag")) == (2.0, false))
    assert(rep(("matches_ratio", "flag")) == (0.6, true))
    assert(rep(("min_row_count", "*")) == (5.0, true))
  }

  test("unique counts excess rows; null keys group as values") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "x"), (1L, "x"), (1L, "y"), (2L, "x"),
      (null, "x"), (null, "x")
    ).toDF("k", "s")
    val rep = asMap(DataQuality.report(df, Seq(
      Unique(Seq("k", "s")),   // (1,x) twice, (null,x) twice -> 2 excess
      Unique(Seq("k")))))      // 1 x3, null x2 -> 2 + 1 = 3 excess
    assert(rep(("unique", "k,s")) == (2.0, false))
    assert(rep(("unique", "k")) == (3.0, false))
  }

  test("functional_dependency: NULL-inclusive distinct; violating groups counted") {
    val df = Seq[(java.lang.Long, String, String)](
      (1L, "a", "x"), (1L, "a", "x"),   // consistent duplicate rows
      (2L, "b", "x"), (2L, "b", "y"),   // b -> {x, y}: violates
      (3L, "c", null), (3L, "c", "z"),  // {NULL, z}: violates
      (4L, "d", null), (4L, "d", null)  // all-NULL group: consistent
    ).toDF("k", "det", "dep")
    val rep = asMap(DataQuality.report(df, Seq(
      FunctionalDependency(Seq("det"), "dep"),
      FunctionalDependency(Seq("det", "dep"), "k"))))
    assert(rep(("functional_dependency", "det->dep")) == (2.0, false),
      "groups b ({x,y}) and c ({NULL,z}) violate; d (all NULL) does not")
    assert(rep(("functional_dependency", "det,dep->k")) == (0.0, true))
  }

  test("ref_integrity: orphan rows counted, NULL FK vacuously passes") {
    val facts = Seq[(java.lang.Long, String)](
      (1L, "a"), (2L, "b"), (9L, "c"), (9L, "d"), (null, "e")
    ).toDF("fk", "v")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val rep = asMap(DataQuality.report(facts,
      Seq(RefIntegrity("fk", dim, "pk"))))
    assert(rep(("ref_integrity", "fk")) == (2.0, false),
      "both rows with fk=9 are orphans; the NULL row is not")
    val ok = asMap(DataQuality.report(facts.filter($"fk".isNull || $"fk" < 3),
      Seq(RefIntegrity("fk", dim, "pk"))))
    assert(ok(("ref_integrity", "fk")) == (0.0, true))
  }

  test("empty input: ratios vacuously 1.0, counts 0 — suite stays green") {
    val df = Seq.empty[(java.lang.Long, String)].toDF("id", "flag")
    val rep = asMap(DataQuality.report(df, Seq(
      NotNull("id"), Completeness("flag", 0.9),
      MatchesRatio("flag", "^A$", 0.9), InRange("id", 0, 10),
      Unique(Seq("id")),
      MinRowCount(0L))))
    assert(rep(("not_null", "id")) == (0.0, true))
    assert(rep(("completeness", "flag")) == (1.0, true))
    assert(rep(("matches_ratio", "flag")) == (1.0, true))
    assert(rep(("in_range", "id")) == (0.0, true))
    assert(rep(("unique", "id")) == (0.0, true))
    assert(rep(("min_row_count", "*")) == (0.0, true))
  }

  test("mergeable states: report(merge(state(a), state(b))) == report(a ++ b)") {
    val checks = Seq(
      NotNull("id"), Completeness("flag", 0.8),
      InRange("disc", 0.0, 0.1), AcceptedValues("flag", Seq("A", "B")),
      MatchesRatio("flag", "^[AB]$", 0.5), MinRowCount(5L))
    val all = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "A", 0.02), (2L, "B", 0.05), (3L, null, 0.20),
      (null, "A", null), (5L, "Z", 0.03), (6L, "B", 0.01), (7L, null, 0.09)
    ).toDF("id", "flag", "disc")
    // any split point must give the same final report
    for (cut <- Seq(1, 3, 6)) {
      val a = all.filter($"id".isNull || $"id" <= cut)
      val b = all.filter($"id".isNotNull && $"id" > cut)
      val merged = DataQuality.reportFromState(
        DataQuality.mergeStates(
          DataQuality.rowLocalState(a, checks),
          DataQuality.rowLocalState(b, checks)), checks)
      val whole = DataQuality.report(all, checks)
      assert(merged.exceptAll(whole).isEmpty && whole.exceptAll(merged).isEmpty,
        s"split at $cut must be invisible to the report")
    }
    // empty slice is the identity element
    val empty = DataQuality.rowLocalState(all.limit(0), checks)
    val withEmpty = DataQuality.reportFromState(
      DataQuality.mergeStates(DataQuality.rowLocalState(all, checks), empty),
      checks)
    val whole = DataQuality.report(all, checks)
    assert(withEmpty.exceptAll(whole).isEmpty && whole.exceptAll(withEmpty).isEmpty)
    // grouped-evidence checks are refused, not silently wrong
    intercept[IllegalArgumentException] {
      DataQuality.rowLocalState(all, Seq(Unique(Seq("id"))))
    }
    intercept[IllegalArgumentException] {
      DataQuality.rowLocalState(all,
        Seq(FunctionalDependency(Seq("id"), "flag")))
    }
  }

  test("row-local suite is ONE aggregate over ONE scan of the input") {
    val df = tables.lineitem
    val rep = DataQuality.report(df, Seq(
      NotNull("l_orderkey"), Completeness("l_shipdate", 0.5),
      InRange("l_discount", 0.0, 1.0), MinRowCount(1L),
      MatchesRatio("l_linestatus", "^[OF]$", 0.5)))
    val plan = rep.queryExecution.executedPlan.toString
    val scans = "FileScan|BatchScan".r.findAllIn(plan).length
    assert(scans == 1, s"expected exactly one scan, got $scans in:\n$plan")
    assert(!plan.contains("Window"), "no window anywhere in a DQ report")
    assert(rep.count() == 5)
  }

  test("report on the real tables matches independent recounts") {
    val li = tables.lineitem
    val rep = asMap(DataQuality.report(li, Seq(
      InRange("l_discount", 0.0, 0.05),
      Unique(Seq("l_suppkey")),
      RefIntegrity("l_orderkey", tables.orders, "o_orderkey"))))
    val overDisc = li.filter($"l_discount".isNull || $"l_discount" < 0.0 ||
      $"l_discount" > 0.05).count().toDouble
    assert(rep(("in_range", "l_discount"))._1 == overDisc)
    val excess = (li.count() -
      li.select("l_suppkey").distinct().count()).toDouble
    assert(rep(("unique", "l_suppkey"))._1 == excess)
    assert(rep(("ref_integrity", "l_orderkey")) == (0.0, true),
      "generator guarantees lineitem.l_orderkey is a subset of orders")
  }
}
