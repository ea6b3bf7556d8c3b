package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the Deequ-style
  * validation gate a production pipeline runs before promoting a
  * snapshot (SURVEY.md §7.1's curation discipline applied to table
  * contracts; Schelter et al., "Automating Large-Scale Data Quality
  * Verification", VLDB 2018, describes the public pattern).
  *
  * A suite is a list of [[Check]]s; [[report]] evaluates ALL of them
  * and returns one row per check: (check_name, target, observed,
  * threshold, passed). The report is a DataFrame — nothing is
  * collected; callers gate on `passed` however they like.
  *
  * Scale shape (the whole point at 100 TB):
  *   - every ROW-LOCAL check (not_null, completeness, in_range,
  *     accepted_values, matches_ratio, min_row_count) folds into ONE
  *     aggregate over ONE scan — adding a 20th check costs zero extra
  *     passes, and the aggregate is map-side combined (one partial row
  *     per task, regardless of input size);
  *   - each [[Unique]] costs exactly one shuffle on its key set (the
  *     excess-row count is an aggregate over the grouped counts —
  *     never a self-join); each [[FunctionalDependency]] likewise is
  *     one grouped pass on its determinant;
  *   - each [[RefIntegrity]] is one LEFT ANTI join against the
  *     DISTINCT reference keys (broadcastable for dimension-sized
  *     refs; AQE picks the strategy) feeding a count — orphans are
  *     counted, never materialized.
  *
  * NULL semantics, fixed and documented (q172's fail-closed rule):
  * in_range / accepted_values / matches_ratio count NULL as a
  * violation (a row that cannot prove compliance fails); not_null
  * counts them by definition; ref_integrity follows SQL FK semantics
  * (NULL foreign keys vacuously pass). Ratios on an EMPTY input are
  * vacuously 1.0 (and counts 0), so an empty partition can never flip
  * a green suite.
  */
object DataQuality {

  sealed trait Check

  /** Zero NULLs allowed in `col`. */
  final case class NotNull(col: String) extends Check
  /** non-NULL fraction of `col` must be >= minRatio. */
  final case class Completeness(col: String, minRatio: Double) extends Check
  /** Every value in [lo, hi]; NULL is a violation. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check
  /** Every value in `vals`; NULL is a violation. */
  final case class AcceptedValues(col: String, vals: Seq[String]) extends Check
  /** Fraction of rows fully matching `regex` must be >= minRatio;
    * NULL does not match. Keep the pattern in the common Java/RE2
    * subset — the oracle replays it in another engine. */
  final case class MatchesRatio(col: String, regex: String, minRatio: Double)
      extends Check
  /** Total row count must be >= n. */
  final case class MinRowCount(n: Long) extends Check
  /** Key-set uniqueness; observed = number of EXCESS rows
    * (sum over duplicated keys of count-1). NULLs group as values. */
  final case class Unique(cols: Seq[String]) extends Check
  /** Every non-NULL `col` value exists in ref.refCol (FK check);
    * observed = orphan ROW count. */
  final case class RefIntegrity(col: String, ref: DataFrame, refCol: String)
      extends Check
  /** `determinant` functionally determines `dependent`; observed =
    * number of determinant groups carrying more than one distinct
    * dependent value (NULL counts as a value — a group with {NULL, x}
    * violates). The profiling primitive behind candidate-key and
    * denormalization checks. */
  final case class FunctionalDependency(determinant: Seq[String],
      dependent: String) extends Check

  private def resultRow(name: String, target: String, observed: Column,
      threshold: Double, passed: Column): Column =
    struct(lit(name).as("check_name"), lit(target).as("target"),
      observed.cast("double").as("observed"),
      lit(threshold).cast("double").as("threshold"), passed.as("passed"))

  // ---------------- mergeable row-local metric states ----------------
  //
  // Deequ's incremental-metrics contract (Schelter et al. §3.3): every
  // row-local check's evidence is a pair of LONG counters, so states
  // from disjoint slices ADD — reportFromState(merge(state(a),
  // state(b))) == report(a ++ b), law-tested in DataQualitySpec and
  // driven per-micro-batch by q189's streaming accumulation. Unique /
  // FunctionalDependency / RefIntegrity are deliberately NOT mergeable
  // from counters (their evidence is key-grouped) — refused at the
  // type level by rowLocalOnly below.

  private def rowLocalOnly(checks: Seq[Check]): Seq[Check] = {
    checks.foreach {
      case _: Unique | _: RefIntegrity | _: FunctionalDependency =>
        throw new IllegalArgumentException(
          "mergeable DQ states cover row-local checks only; " +
            "unique/FD/FK evidence is key-grouped, not counter-additive")
      case _ => ()
    }
    checks
  }

  /** Per-check counter pair: (__total, and per check i: __c<i>).
    * Count-style checks store VIOLATIONS; ratio-style store COMPLIANT
    * rows; MinRowCount stores nothing extra. ONE aggregate, one scan —
    * the same single-pass shape as [[report]]. */
  def rowLocalState(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val cs = rowLocalOnly(checks)
    require(cs.nonEmpty, "empty check suite")
    val counters = cs.zipWithIndex.map { case (c, i) =>
      val cnt = c match {
        case NotNull(col0) => sum(when(col(col0).isNull, 1L).otherwise(0L))
        case Completeness(col0, _) => sum(when(col(col0).isNotNull, 1L).otherwise(0L))
        case InRange(col0, lo, hi) =>
          sum(when(col(col0).isNull || col(col0) < lo || col(col0) > hi, 1L)
            .otherwise(0L))
        case AcceptedValues(col0, vals) =>
          sum(when(!col(col0).isin(vals: _*) || col(col0).isNull, 1L).otherwise(0L))
        case MatchesRatio(col0, re, _) =>
          sum(when(col(col0).rlike(re), 1L).otherwise(0L))
        case MinRowCount(_) => sum(lit(0L))
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      coalesce(cnt, lit(0L)).as(s"__c$i")
    }
    df.agg(count(lit(1)).as("__total"), counters: _*)
  }

  /** Add two (or more) states column-wise. */
  def mergeStates(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "no states")
    val cols = states.head.columns.toSeq
    states.tail.foreach(s => require(s.columns.toSeq == cols,
      "states must come from the same suite"))
    states.reduce(_ unionByName _)
      .agg(sum(col(cols.head)).as(cols.head),
        cols.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** Derive the report (same shape as [[report]]) from a state. */
  def reportFromState(state: DataFrame, checks: Seq[Check]): DataFrame = {
    val cs = rowLocalOnly(checks)
    val total = col("__total")
    def ratio(compliant: Column) =
      when(total === 0L, lit(1.0)).otherwise(compliant.cast("double") / total)
    val structs = cs.zipWithIndex.map { case (c, i) =>
      val cnt = col(s"__c$i")
      c match {
        case NotNull(col0) => resultRow("not_null", col0, cnt, 0.0, cnt === 0L)
        case Completeness(col0, m) =>
          val r = ratio(cnt); resultRow("completeness", col0, r, m, r >= m)
        case InRange(col0, _, _) => resultRow("in_range", col0, cnt, 0.0, cnt === 0L)
        case AcceptedValues(col0, _) =>
          resultRow("accepted_values", col0, cnt, 0.0, cnt === 0L)
        case MatchesRatio(col0, _, m) =>
          val r = ratio(cnt); resultRow("matches_ratio", col0, r, m, r >= m)
        case MinRowCount(n) =>
          resultRow("min_row_count", "*", total, n.toDouble, total >= n)
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    }
    state.select(explode(array(structs: _*)).as("r")).select(col("r.*"))
  }

  /** Evaluate the suite; one report row per check. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty check suite")
    val rowLocal = checks.filter {
      case _: Unique | _: RefIntegrity | _: FunctionalDependency => false
      case _ => true
    }
    // --- pass 1: every row-local check in ONE aggregate ---
    val local: Option[DataFrame] = if (rowLocal.isEmpty) None else Some {
      val total = count(lit(1))
      // coalesce: SUM over an EMPTY input is NULL, and a NULL observed
      // would make `passed` NULL too — an empty partition must read as
      // zero violations, not an indeterminate report row
      def viol(c: Column) = coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
      // ratio with empty-input = vacuous pass
      def ratio(compliant: Column) =
        when(total === 0L, lit(1.0)).otherwise(compliant.cast("double") / total)
      val structs = rowLocal.map {
        case NotNull(c) =>
          val v = viol(col(c).isNull)
          resultRow("not_null", c, v, 0.0, v === 0L)
        case Completeness(c, m) =>
          val r = ratio(sum(when(col(c).isNotNull, 1L).otherwise(0L)))
          resultRow("completeness", c, r, m, r >= m)
        case InRange(c, lo, hi) =>
          val v = viol(col(c).isNull || col(c) < lo || col(c) > hi)
          resultRow("in_range", c, v, 0.0, v === 0L)
        case AcceptedValues(c, vals) =>
          val v = viol(!col(c).isin(vals: _*) || col(c).isNull)
          resultRow("accepted_values", c, v, 0.0, v === 0L)
        case MatchesRatio(c, re, m) =>
          val r = ratio(sum(when(col(c).rlike(re), 1L).otherwise(0L)))
          resultRow("matches_ratio", c, r, m, r >= m)
        case MinRowCount(n) =>
          resultRow("min_row_count", "*", total, n.toDouble, total >= n)
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
      df.agg(array(structs: _*).as("rows"))
        .select(explode(col("rows")).as("r")).select(col("r.*"))
    }
    // --- one grouped pass per distinct Unique key set ---
    val uniques = checks.collect { case Unique(cols) =>
      require(cols.nonEmpty, "Unique needs at least one column")
      val excess = coalesce(
        sum(when(col("__n") > 1L, col("__n") - 1L).otherwise(0L)), lit(0L))
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__n"))
        .agg(excess.as("observed"))
        .select(resultRow("unique", cols.mkString(","), col("observed"), 0.0,
          col("observed") === 0L).as("r"))
        .select(col("r.*"))
    }
    // --- one grouped pass per FunctionalDependency: a determinant
    //     group violates iff its NULL-inclusive distinct dependent
    //     count exceeds 1 (countDistinct skips NULLs, so NULL presence
    //     is added back as its own value) ---
    val fds = checks.collect { case FunctionalDependency(det, dep) =>
      require(det.nonEmpty, "FunctionalDependency needs a determinant")
      val nd = countDistinct(col(dep)) +
        max(when(col(dep).isNull, 1L).otherwise(0L))
      val violating = coalesce(
        sum(when(col("__nd") > 1L, 1L).otherwise(0L)), lit(0L))
      df.groupBy(det.map(col): _*).agg(nd.as("__nd"))
        .agg(violating.as("observed"))
        .select(resultRow("functional_dependency",
          s"${det.mkString(",")}->$dep", col("observed"), 0.0,
          col("observed") === 0L).as("r"))
        .select(col("r.*"))
    }
    // --- one anti-join pass per RefIntegrity ---
    val refs = checks.collect { case RefIntegrity(c, ref, rc) =>
      val orphans = df.select(col(c)).filter(col(c).isNotNull)
        .join(ref.select(col(rc).as(c)).distinct(), Seq(c), "left_anti")
        .agg(count(lit(1)).as("observed"))
      orphans.select(resultRow("ref_integrity", c, col("observed"), 0.0,
        col("observed") === 0L).as("r")).select(col("r.*"))
    }
    (local.toSeq ++ uniques ++ fds ++ refs).reduce(_ unionByName _)
  }
}
