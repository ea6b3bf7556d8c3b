package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental aggregate maintenance (SURVEY.md §7.1 extension surface;
  * the classic algebraic-aggregate contract behind Pig's
  * `Algebraic` UDF interface and materialized-view delta maintenance).
  *
  * The point at 100 TB: a daily rollup over an append-only fact table
  * should cost one scan of the DELTA, not one scan of history. That
  * works exactly when the aggregate state is a commutative monoid:
  *
  *   state(a ∪ b) == merge(state(a), state(b))
  *
  * [[aggState]] produces such a state per group (exact DECIMAL sums +
  * non-null counts + min/max per measure), [[mergeStates]] is the monoid
  * op (re-aggregation of partial states), and [[finalizeState]] derives
  * the user-facing aggregates (count / sum / avg / min / max) from the
  * state. AVG is deliberately NOT part of the state — it is derived at
  * finalize time from (exact sum, count), which is what makes it
  * mergeable; the sums are DECIMAL so the result is identical under any
  * split of the input into deltas and any merge order.
  *
  * Deltas are INSERT-ONLY by design: sums and counts would support
  * retraction via signed rows, but MIN/MAX are not invertible — a
  * deleted current-minimum row forces a group recompute. Production
  * systems (e.g. streaming aggregation in Spark itself) make the same
  * split; handling deletes correctly is a different operator with a
  * different state (order statistics), refused here rather than done
  * wrong.
  *
  * Scale shape: aggState is ONE combiner-friendly shuffle of the delta
  * (map-side partial aggregation, group-count-sized output);
  * mergeStates shuffles only STATES (rows = |groups| per input, not
  * |facts|); finalize is per-row arithmetic on the state — no data
  * scan. Persist the state table partitioned by the group keys and the
  * nightly maintenance job never touches history.
  */
object Incremental {

  private def sumCol(m: String) = s"${m}__sum"
  private def cntCol(m: String) = s"${m}__cnt"
  private def minCol(m: String) = s"${m}__min"
  private def maxCol(m: String) = s"${m}__max"

  /** Partial-aggregate state of `df` grouped by `keys`, for the named
    * numeric measures. State columns per measure m:
    * m__sum (DECIMAL(38,scale) exact), m__cnt (non-null count),
    * m__min / m__max (original type); plus a group row count `__cnt`.
    */
  def aggState(df: DataFrame, keys: Seq[String],
      measures: Seq[(String, Column)], scale: Int = 2): DataFrame = {
    require(measures.nonEmpty, "at least one measure")
    val aggs = count(lit(1)).as("__cnt") +: measures.flatMap { case (m, c) =>
      Seq(
        sum(c.cast(DecimalType(38, scale))).as(sumCol(m)),
        count(c).as(cntCol(m)),
        min(c).as(minCol(m)),
        max(c).as(maxCol(m)))
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Monoid merge of two or more compatible states (same keys + state
    * schema): union then re-aggregate — sums add, counts add, mins min,
    * maxes max. Exact: DECIMAL addition is associative/commutative, so
    * any merge tree yields the identical state. */
  def mergeStates(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "nothing to merge")
    val all = states.reduce(_ unionByName _)
    val stateCols = all.columns.filter(c =>
      c == "__cnt" || c.endsWith("__sum") || c.endsWith("__cnt") ||
      c.endsWith("__min") || c.endsWith("__max"))
    val keys = all.columns.filterNot(stateCols.contains)
    val aggs = stateCols.toSeq.map {
      case c if c.endsWith("__min") => min(col(c)).as(c)
      case c if c.endsWith("__max") => max(col(c)).as(c)
      case c                        => sum(col(c)).as(c) // __sum and counts
    }
    val merged = all.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
    // re-establish the exact state schema: Spark widens DECIMAL(38,s)
    // sums to (38,s) already (cannot widen past 38) and counts to long;
    // cast sums back in case a narrower input state was passed in
    stateCols.foldLeft(merged) { (d, c) =>
      if (c.endsWith("__sum"))
        d.withColumn(c, col(c).cast(all.schema(c).dataType))
      else d
    }
  }

  /** Convenience: fold an insert-only delta of raw FACTS into an
    * existing state. Scans only the delta. */
  def applyDelta(state: DataFrame, delta: DataFrame, keys: Seq[String],
      measures: Seq[(String, Column)], scale: Int = 2): DataFrame =
    mergeStates(state, aggState(delta, keys, measures, scale))

  /** Key-uniqueness guard folded INTO the dataflow rather than run as a
    * separate probe job: pre-aggregate by key (count + first() pass-
    * through of every non-key column) and trip `assert_true` on any
    * count > 1. The groupBy hash-partitions on exactly the key the
    * downstream join needs, so Catalyst reuses the exchange — the guard
    * rides the shuffle the join pays anyway, instead of costing an
    * extra full scan + shuffle per guarded side (the r11 q181 plan
    * finding). For a key-unique input, first() is the row's own value,
    * so the output is the input exactly. The violation surfaces at
    * ACTION time as a SparkException (task failure) whose cause chain
    * carries `msg` — later than an eager require, but at 100 TB a
    * guard that doubles the scan count is the wrong trade. */
  private def keyUniqueGuarded(df: DataFrame, keys: Seq[String],
      prefix: String, msg: String): DataFrame = {
    val others = df.columns.filterNot(keys.contains).toSeq
    val aggs = count(lit(1)).as(s"${prefix}n") +:
      others.map(c => first(col(c)).as(s"$prefix$c"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
      // assert_true returns NULL when the condition holds; the filter
      // forces per-row evaluation and passes every (asserted) row
      .filter(assert_true(col(s"${prefix}n") === 1, lit(msg)).isNull)
      .drop(s"${prefix}n")
      .withColumn(s"${prefix}present", lit(true))
  }

  /** MERGE-style upsert (the Delta/Iceberg `MERGE INTO` dataflow,
    * expressed engine-neutrally): apply a CHANGES table to a BASE table
    * by key — matched rows take the change's values, unmatched changes
    * insert, unmatched base rows carry over, and changes flagged
    * `deleteCol` remove the row. The result is what rewriting the base
    * table would produce; pair with [[aggState]]/[[applyDelta]] when
    * only a rollup (not the table) must be maintained.
    *
    * Requires the changes table to be key-unique — an ambiguous MERGE
    * source is the classic silent corruption; Delta throws `MERGE
    * destination matched multiple source rows` for the same reason.
    * The guard is [[keyUniqueGuarded]]: it rides the join's own
    * shuffle (zero extra jobs) and surfaces a violation at action time
    * as a SparkException carrying "ambiguous MERGE source".
    *
    * Scale shape: ONE full-outer shuffle join on the key — the minimum
    * any engine pays to reconcile two keyed tables; broadcastable
    * automatically when the change set is small (the common CDC case),
    * which AQE decides from runtime sizes. */
  def mergeUpsert(base: DataFrame, changes: DataFrame, keys: Seq[String],
      deleteCol: Option[String] = None): DataFrame = {
    require(keys.nonEmpty, "at least one merge key")
    val dataCols = base.columns.filterNot(keys.contains).toSeq
    require(changes.columns.toSet == base.columns.toSet ++ deleteCol,
      s"changes schema must be base schema + optional delete flag: " +
        s"${changes.columns.mkString(",")} vs ${base.columns.mkString(",")}")
    // presence markers: a full-outer join nulls every column of the
    // absent side, and a change may legitimately SET a column to null —
    // so row presence must be a carried literal, not value nullability
    val b = dataCols.foldLeft(base) { (d, c) => d.withColumnRenamed(c, s"__b_$c") }
      .withColumn("__b_present", lit(true))
    val c2 = keyUniqueGuarded(changes, keys, "__c_",
      "mergeUpsert: a key matches multiple change rows — ambiguous MERGE source")
    val j = b.join(c2, keys, "full_outer")
    val afterDelete = deleteCol match {
      case Some(dc) => j.filter(!coalesce(col(s"__c_$dc"), lit(false)))
      case None     => j
    }
    afterDelete.select(keys.map(col) ++ dataCols.map(c =>
      when(col("__c_present").isNotNull, col(s"__c_$c"))
        .otherwise(col(s"__b_$c")).as(c)): _*)
  }

  /** Point-in-time read over an SCD2 history — "the table AS OF t"
    * (Kimball's point-in-time query; the same contract as Delta/Iceberg
    * time travel, answered from versioned rows instead of file
    * snapshots): a version is visible iff valid_from <= t < valid_to
    * (NULL valid_to = still current). Returns the reconstructed
    * snapshot (keys ++ attrs, validity columns dropped).
    *
    * Scale shape: a pure FILTER over the history — predicate-pushable
    * into the scan, no join, no shuffle; if the history is partitioned
    * or z-ordered on valid_from, partition/file pruning applies. */
  def asOfSnapshot(hist: DataFrame, t: java.sql.Timestamp): DataFrame = {
    require(hist.columns.contains("valid_from") && hist.columns.contains("valid_to"),
      "hist must carry valid_from/valid_to")
    hist.filter(col("valid_from") <= lit(t) &&
        (col("valid_to").isNull || col("valid_to") > lit(t)))
      .drop("valid_from", "valid_to")
  }

  /** Point-in-time JOIN: enrich each fact with the dimension version
    * that was valid AT the fact's own timestamp — the feature-store
    * correctness rule (joining "current" attributes onto historical
    * facts leaks the future into training labels; Kimball calls this
    * the type-2 dimension lookup). A fact matches AT MOST one version
    * because SCD2 validity intervals are disjoint per key; facts
    * before the key's first version (or with no key) keep NULL attrs
    * under the default left join.
    *
    * Distinct from [[AsOfJoin]]: as-of picks the NEAREST earlier event
    * from a sorted stream; this picks the version whose [valid_from,
    * valid_to) interval CONTAINS the fact timestamp — the interval
    * end also bounds matches, so a fact after a deleted/closed version
    * correctly gets nothing.
    *
    * Scale shape: an EQUI-join on the key (shuffle/broadcast decided
    * by AQE like any dimension join) with the interval predicate as a
    * residual filter — never a range-only join; per-key version
    * counts are small, so the residual is cheap. Fact columns must
    * not collide with history attribute names (require'd). */
  def pitJoin(facts: DataFrame, hist: DataFrame, keys: Seq[String],
      tsCol: String, how: String = "left"): DataFrame = {
    require(keys.nonEmpty, "at least one key")
    require(hist.columns.contains("valid_from") && hist.columns.contains("valid_to"),
      "hist must carry valid_from/valid_to")
    val attrs = hist.columns.filterNot(c =>
      keys.contains(c) || c == "valid_from" || c == "valid_to").toSeq
    val clash = facts.columns.toSet.intersect(attrs.toSet)
    require(clash.isEmpty,
      s"fact columns collide with history attributes: ${clash.mkString(",")}")
    // alias both sides: facts and history routinely derive from the
    // SAME upstream (a table and its own SCD2 rollup), and dataset-
    // reference conditions trip Spark's ambiguous-self-join check
    // there (found by the 5M soak)
    val f = facts.alias("__pit_f")
    val h = hist.alias("__pit_h")
    val cond = keys.map(k => col(s"__pit_f.$k") === col(s"__pit_h.$k"))
      .reduce(_ && _) &&
      col("__pit_h.valid_from") <= col(s"__pit_f.$tsCol") &&
      (col("__pit_h.valid_to").isNull ||
        col("__pit_h.valid_to") > col(s"__pit_f.$tsCol"))
    f.join(h, cond, how)
      .select(facts.columns.map(c => col(s"__pit_f.$c")) ++
        attrs.map(a => col(s"__pit_h.$a")): _*)
  }

  /** Snapshot diff — the INVERSE of [[mergeUpsert]]: derive the
    * MINIMAL change feed (inserts + updates + deletes, `op` column)
    * that transforms `base` into `target`. The two operators are a
    * round-trip law — mergeUpsert(base, snapshotDiff(base, target))
    * == target — which q181 require()s per-run and the spec law-tests;
    * it is also how a pipeline bootstraps CDC when the upstream only
    * ships full snapshots (diff two snapshots, feed the delta to every
    * incremental consumer instead of reprocessing the world).
    *
    * Output: keys ++ attrs (TARGET values; NULL for deletes, which are
    * keyed removals) ++ `op` in ('insert','update','delete').
    * Unchanged keys are OMITTED — that minimality is the point.
    * Attribute comparison is NULL-SAFE (NULL -> value and value ->
    * NULL are both real updates). Both sides must be key-unique
    * ([[keyUniqueGuarded]] — the check rides the diff's own shuffle
    * and surfaces at action time; a diff between ambiguous snapshots
    * has no well-defined change feed).
    *
    * Scale shape: ONE full-outer shuffle join on the key — the floor
    * for reconciling two keyed tables — and the output is
    * change-sized, not snapshot-sized. The uniqueness guards add no
    * jobs and no shuffles (r11 plan audit: the old eager probes were
    * two extra full scans). */
  def snapshotDiff(base: DataFrame, target: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one diff key")
    require(target.columns.toSet == base.columns.toSet,
      s"snapshot schemas must match: ${base.columns.mkString(",")} vs " +
        target.columns.mkString(","))
    val attrs = base.columns.filterNot(keys.contains).toSeq
    val b = keyUniqueGuarded(base, keys, "__b_",
      "snapshotDiff: base snapshot is not key-unique")
    val t = keyUniqueGuarded(target, keys, "__t_",
      "snapshotDiff: target snapshot is not key-unique")
    val j = b.join(t, keys, "full_outer")
    val differs = attrs.map(c => !(col(s"__b_$c") <=> col(s"__t_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val op = when(col("__b_present").isNull, lit("insert"))
      .when(col("__t_present").isNull, lit("delete"))
      .when(differs, lit("update"))
    j.withColumn("op", op).filter(col("op").isNotNull)
      .select(keys.map(col) ++ attrs.map(c =>
        when(col("op") === "delete", lit(null)).otherwise(col(s"__t_$c")).as(c))
        :+ col("op"): _*)
  }

  /** [[snapshotDiff]] in the Delta change-data-feed shape, WITH
    * preimages: inserts and deletes carry their row's values (a
    * delete is NOT null-padded here — its old values ARE the
    * retraction), and an update emits TWO rows, `update_preimage`
    * (base values) and `update_postimage` (target values). This is
    * the shape invertible-aggregate maintenance needs: retract the
    * pre rows, apply the post rows ([[AggView]]). One full-outer
    * join, one pass — the two update rows come from exploding a
    * per-key array, never a second scan. */
  def snapshotDiffCdf(base: DataFrame, target: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "at least one diff key")
    require(target.columns.toSet == base.columns.toSet,
      s"snapshot schemas must match: ${base.columns.mkString(",")} vs " +
        target.columns.mkString(","))
    val attrs = base.columns.filterNot(keys.contains).toSeq
    val b = keyUniqueGuarded(base, keys, "__b_",
      "snapshotDiffCdf: base snapshot is not key-unique")
    val t = keyUniqueGuarded(target, keys, "__t_",
      "snapshotDiffCdf: target snapshot is not key-unique")
    val j = b.join(t, keys, "full_outer")
    def side(prefix: String, op: String) =
      struct(attrs.map(c => col(s"$prefix$c").as(c)) :+ lit(op).as("op"): _*)
    val differs = attrs.map(c => !(col(s"__b_$c") <=> col(s"__t_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val rows = when(col("__b_present").isNull,
        array(side("__t_", "insert")))
      .when(col("__t_present").isNull,
        array(side("__b_", "delete")))
      .when(differs,
        array(side("__b_", "update_preimage"),
          side("__t_", "update_postimage")))
      .otherwise(array())
    j.select(keys.map(col) :+ explode(rows).as("__r"): _*)
      .select(keys.map(col) ++ attrs.map(c => col(s"__r.$c").as(c))
        :+ col("__r.op").as("op"): _*)
  }

  /** SCD Type 2 history maintenance — the dimension-table discipline
    * that keeps EVERY version of a row with its validity interval
    * (Kimball's slowly-changing-dimension type 2): applying a change
    * batch at time T closes the current version of each genuinely
    * changed key (valid_to = T) and opens a new version
    * (valid_from = T, valid_to = NULL); a change whose attributes
    * equal the current version is a no-op (no spurious versions).
    * New keys open their first version.
    *
    * `hist` schema: keys ++ attrs ++ (valid_from TIMESTAMP,
    * valid_to TIMESTAMP nullable — NULL marks the current version).
    * `changes`: keys ++ attrs, key-unique ([[keyUniqueGuarded]], rides
    * the join shuffle), all applied at one `asOf` timestamp — the
    * batch-CDC shape.
    * Attribute comparison is NULL-SAFE (a change from NULL to value
    * and value to NULL are both real changes).
    *
    * Scale shape: closed history passes through UNTOUCHED (never
    * joined, never shuffled — at 100 TB the history dwarfs the current
    * slice); one outer join of the CURRENT slice against the change
    * batch decides closes/opens/no-ops. */
  def scd2Apply(hist: DataFrame, changes: DataFrame, keys: Seq[String],
      asOf: java.sql.Timestamp): DataFrame = {
    require(keys.nonEmpty, "at least one key")
    val attrs = hist.columns.filterNot(c =>
      keys.contains(c) || c == "valid_from" || c == "valid_to").toSeq
    require(hist.columns.contains("valid_from") && hist.columns.contains("valid_to"),
      "hist must carry valid_from/valid_to")
    require(changes.columns.toSet == (keys ++ attrs).toSet,
      s"changes must be keys ++ attrs: ${changes.columns.mkString(",")}")
    val closed = hist.filter(col("valid_to").isNotNull)
    val current = hist.filter(col("valid_to").isNull)
    val ch = keyUniqueGuarded(changes, keys, "__c_",
      "scd2Apply: ambiguous change batch (duplicate key)")
    val j = current.join(ch, keys, "full_outer")
    val differs = attrs.map(c => !(col(c) <=> col(s"__c_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val isUpdate = col("__c_present").isNotNull && col("valid_from").isNotNull && differs
    val isInsert = col("__c_present").isNotNull && col("valid_from").isNull
    // Each joined row emits up to TWO output rows (the kept-or-closed
    // current version and the newly opened one) from ONE pass: a
    // filter-each-branch-then-union would make Catalyst duplicate the
    // join subtree and scan the current slice twice (plan-asserted).
    val kept = struct((keys ++ attrs).map(c => col(c).as(c)) ++ Seq(
      col("valid_from").as("valid_from"),
      when(isUpdate, lit(asOf)).otherwise(col("valid_to")).as("valid_to"),
      col("valid_from").isNotNull.as("__emit")): _*)
    val opened = struct(keys.map(c => col(c).as(c)) ++
      attrs.map(c => col(s"__c_$c").as(c)) ++ Seq(
      lit(asOf).cast("timestamp").as("valid_from"),
      lit(null).cast("timestamp").as("valid_to"),
      (isUpdate || isInsert).as("__emit")): _*)
    val outCols = (keys ++ attrs) :+ "valid_from" :+ "valid_to"
    val merged = j.select(explode(array(kept, opened)).as("r"))
      .filter(col("r.__emit"))
      .select(outCols.map(c => col(s"r.$c").as(c)): _*)
    closed.unionByName(merged)
  }

  /** User-facing aggregates from a state: cnt plus, per measure m,
    * sum_m (double, from the exact decimal), avg_m (double, exact-sum /
    * count), min_m, max_m. Groups whose measure count is 0 surface NULL
    * sum/avg (matching SQL aggregate semantics on empty input). */
  def finalizeState(state: DataFrame): DataFrame = {
    val ms = state.columns.filter(_.endsWith("__sum")).map(_.stripSuffix("__sum")).toSeq
    val keys = state.columns.filterNot(c =>
      c == "__cnt" || c.endsWith("__sum") || c.endsWith("__cnt") ||
      c.endsWith("__min") || c.endsWith("__max")).toSeq
    val outCols =
      keys.map(col) ++ Seq(col("__cnt").as("cnt")) ++ ms.flatMap { m =>
        val nonNull = col(cntCol(m)) > 0
        Seq(
          when(nonNull, col(sumCol(m)).cast("double")).as(s"sum_$m"),
          when(nonNull, col(sumCol(m)).cast("double") / col(cntCol(m))).as(s"avg_$m"),
          col(minCol(m)).as(s"min_$m"),
          col(maxCol(m)).as(s"max_$m"))
      }
    state.select(outCols: _*)
  }
}
