package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental materialized AGGREGATE VIEWS over versioned tables —
  * the "don't re-aggregate 100 TB to refresh a dashboard" piece,
  * composed entirely from machinery this engine already has: the
  * view is itself a [[VersionedTable]] holding exact partial-agg
  * STATE (count + DECIMAL sums per measure, grouped by the view
  * keys), maintained from the source table's cursor CDC feed
  * ([[VersionedTable.pollChangesCdf]] — the preimage-carrying shape)
  * by RETRACTING preimage/delete rows and APPLYING postimage/insert
  * rows. Each refresh costs O(churn + affected groups), never a
  * source re-scan.
  *
  * Exactly-once refresh with no extra transaction store: the view
  * commit's manifest carries a `view.synced=<srcVersion>` marker, so
  * a crash between the view MERGE and the cursor ack re-polls the
  * same feed, sees the marker, and acks WITHOUT re-applying (the
  * [[graft.streaming.CurationStreaming.tableMergeStream]] marker
  * discipline, reused verbatim). Racing maintainers resolve through
  * the same two CASes (view manifest + cursor) — one winner, loud
  * losers.
  *
  * Scope: COUNT/SUM/AVG (sums are invertible; DECIMAL(38) addition is
  * exact, so retraction is bit-exact, not float-drift), plus — round
  * 14 — MIN/MAX via HYBRID maintenance (`extremes`): min/max are not
  * invertible under deletes, so the common case is maintained
  * incrementally (an applied row only ever TIGHTENS an extremum:
  * new_min = least(cur_min, applied_min)) and ONLY the provably
  * uncertain case — a retracted value that TIES the current extremum
  * with no applied value beating it — re-scans, and re-scans ONLY the
  * affected groups, read through the source's own data skipping
  * ([[VersionedTable.prunedFiles]] on the leading group column). The
  * re-scan receipt (`view.rescan.groups` / `view.rescan.files`) rides
  * the view commit's manifest, so "bounded by affected-group file
  * bytes" is checkable, not vibes.
  *
  * Scale shape: the feed is churn-sized; the delta state aggregates
  * it map-side; the view MERGE rewrites only the view files whose
  * groups changed (file-granular, like any merge). A group whose
  * count reaches zero is DELETED from the view (never a ghost row).
  */
object AggView {

  /** Meta key on the VIEW table recording the source version its
    * state reflects — the exactly-once marker. */
  val SyncedKey = "view.synced"

  private def sumCol(m: String) = s"${m}__sum"
  private def cntCol(m: String) = s"${m}__cnt"
  private def minCol(m: String) = s"${m}__min"
  private def maxCol(m: String) = s"${m}__max"

  /** Receipt meta keys the view commit carries when a sync's hybrid
    * MIN/MAX maintenance had to re-scan: how many groups were
    * uncertain and how many source files the skipping-pruned re-scan
    * read (0/0 on the common fully-incremental path). */
  val RescanGroupsKey = "view.rescan.groups"
  val RescanFilesKey = "view.rescan.files"

  /** Exact invertible partial-agg state of `df`: groupCols ++ `__cnt`
    * (group row count) ++ per measure m: m__sum (DECIMAL(38,scale)),
    * m__cnt (non-null count) — plus, per `extremes` entry, m__min and
    * m__max in the column's own type (value picks, no accumulation). */
  def state(df: DataFrame, groupCols: Seq[String],
      measures: Seq[(String, Column)], scale: Int = 2,
      extremes: Seq[(String, Column)] = Seq.empty): DataFrame = {
    require(groupCols.nonEmpty && measures.nonEmpty,
      "at least one group column and one measure")
    val aggs = (count(lit(1)).as("__cnt") +: measures.flatMap { case (m, c) =>
      Seq(
        coalesce(sum(c.cast(DecimalType(38, scale))),
          lit(0).cast(DecimalType(38, scale))).as(sumCol(m)),
        count(c).as(cntCol(m)))
    }) ++ extremes.flatMap { case (m, c) =>
      Seq(min(c).as(minCol(m)), max(c).as(maxCol(m)))
    }
    df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The retraction of a state: every count and sum negated. Merging
    * a state with its own negation cancels exactly (DECIMAL). */
  def negate(state: DataFrame): DataFrame =
    state.columns.foldLeft(state) { (d, c) =>
      if (c == "__cnt" || c.endsWith("__sum") || c.endsWith("__cnt"))
        d.withColumn(c, -col(c))
      else d
    }

  /** User-facing view: groupCols, cnt, per measure sum_m (double,
    * from the exact decimal) and avg_m, and per extreme min_m/max_m.
    * NULL sum/avg for groups whose measure count is zero (SQL
    * aggregate-of-nothing semantics). */
  def finalize(state: DataFrame): DataFrame = {
    val ms = state.columns.filter(_.endsWith("__sum"))
      .map(_.stripSuffix("__sum")).toSeq
    val es = state.columns.filter(_.endsWith("__min"))
      .map(_.stripSuffix("__min")).toSeq
    val groupCols = state.columns.filterNot(c =>
      c == "__cnt" || c.endsWith("__sum") || c.endsWith("__cnt") ||
      c.endsWith("__min") || c.endsWith("__max")).toSeq
    state.select(groupCols.map(col) ++ Seq(col("__cnt").as("cnt")) ++
      ms.flatMap { m =>
        val nonNull = col(cntCol(m)) > 0
        Seq(
          when(nonNull, col(sumCol(m)).cast("double")).as(s"sum_$m"),
          when(nonNull, col(sumCol(m)).cast("double") / col(cntCol(m)))
            .as(s"avg_$m"))
      } ++ es.flatMap { m =>
        Seq(col(minCol(m)).as(s"min_$m"), col(maxCol(m)).as(s"max_$m"))
      }: _*)
  }

  /** Bootstrap: aggregate the source's LATEST version into a new view
    * table and register the maintenance cursor at that version. The
    * one full-scan this view ever pays. */
  def init(spark: SparkSession, srcDir: String, viewDir: String,
      consumer: String, groupCols: Seq[String],
      measures: Seq[(String, Column)], scale: Int = 2,
      viewMeta: Map[String, String] = Map.empty,
      extremes: Seq[(String, Column)] = Seq.empty): Long = {
    val srcV = VersionedTable.latestVersion(spark, srcDir)
    require(srcV >= 0, s"init: no committed versions under $srcDir")
    require(VersionedTable.latestVersion(spark, viewDir) < 0,
      s"init: $viewDir already exists — sync resumes, it never re-inits")
    val st = state(VersionedTable.readVersion(spark, srcDir, srcV),
      groupCols, measures, scale, extremes)
    // viewMeta composes the view with everything tables already do:
    // declare feed.keys here and the VIEW itself feeds downstream
    // streams (views all the way down), expectations constrain it, …
    VersionedTable.commit(spark, viewDir, st, -1L, consumer,
      clusterBy = groupCols.take(1),
      meta = viewMeta + (SyncedKey -> srcV.toString))
    VersionedTable.initCursor(spark, srcDir, consumer, srcV)
    srcV
  }

  /** The source version the view's state reflects. */
  def syncedVersion(spark: SparkSession, viewDir: String): Long = {
    val v = VersionedTable.latestVersion(spark, viewDir)
    require(v >= 0, s"no view table under $viewDir")
    VersionedTable.readManifest(spark, viewDir, v).meta
      .get(SyncedKey).map(_.toLong).getOrElse(
        throw new IllegalStateException(
          s"$viewDir carries no $SyncedKey marker — not an AggView table"))
  }

  /** One maintenance step: poll the source feed from the cursor,
    * retract/apply it into the view state, MERGE the affected groups
    * into the view table (marker = the consumed source version), ack.
    * Returns the (from, to) source range applied, None when caught
    * up. Crash-safe at every boundary: before the merge → re-derive;
    * between merge and ack → marker makes the re-poll ack-only. */
  def sync(spark: SparkSession, srcDir: String, viewDir: String,
      consumer: String, keys: Seq[String], groupCols: Seq[String],
      measures: Seq[(String, Column)], scale: Int = 2,
      extremes: Seq[(String, Column)] = Seq.empty)
      : Option[(Long, Long)] = {
    val cur = VersionedTable.cursorVersion(spark, srcDir, consumer)
      .getOrElse(throw new IllegalStateException(
        s"sync: consumer '$consumer' has no cursor on $srcDir — init first"))
    val latest = VersionedTable.latestVersion(spark, srcDir)
    if (latest <= cur) return None
    // apply exactly the UNAPPLIED suffix: the view's own marker, not
    // the cursor, decides where the feed starts — after a crash
    // between a merge and its ack (cursor behind marker), or with new
    // source commits stacked on top, the already-merged prefix is
    // never re-applied. The cursor's remaining job is the retention
    // shield + the ack CAS that serializes racing maintainers.
    val synced = syncedVersion(spark, viewDir)
    if (synced < latest) {
      val feed = VersionedTable.changesBetweenCdf(
        spark, srcDir, synced, latest, keys)
      // fused signed delta: ONE pass over the feed (apply and retract
      // as ±1 weights in the same aggregation) — a filter-then-union
      // would recompute the CDF join once per side. Extreme candidates
      // ride the same pass: per extreme, the applied side's min/max
      // (can only TIGHTEN the view's extremum) and the retracted
      // side's min/max (decides whether the old extremum is at risk).
      val w = when(col("op").isin("insert", "update_postimage"), 1L)
        .otherwise(-1L)
      val aggs = (sum(col("__w")).as("__cnt") +:
        measures.flatMap { case (m, c) =>
          val dec = c.cast(DecimalType(38, scale))
          Seq(
            coalesce(sum(when(col("__w") > 0, dec).otherwise(-dec)),
              lit(0).cast(DecimalType(38, scale))).as(sumCol(m)),
            coalesce(sum(when(c.isNotNull, col("__w")).otherwise(0L)),
              lit(0L)).as(cntCol(m)))
        }) ++ extremes.flatMap { case (m, c) =>
          Seq(
            min(when(col("__w") > 0, c)).as(s"${m}__min_app"),
            max(when(col("__w") > 0, c)).as(s"${m}__max_app"),
            min(when(col("__w") < 0, c)).as(s"${m}__min_ret"),
            max(when(col("__w") < 0, c)).as(s"${m}__max_ret"))
        }
      val candCols = extremes.map(_._1).flatMap(m => Seq(
        s"${m}__min_app", s"${m}__max_app", s"${m}__min_ret",
        s"${m}__max_ret"))
      val extCols = extremes.map(_._1).flatMap(m =>
        Seq(minCol(m), maxCol(m)))
      val deltaAll = feed.withColumn("__w", w)
        .groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
        .localCheckpoint() // one feed pass, reused by inv + ext paths
      val delta = deltaAll.drop(candCols: _*)
      // fold the delta into the CURRENT state of the affected groups
      // only (semi-join: the view side is view-sized, the delta
      // churn-sized), then merge keyed on the group columns — groups
      // emptied by retraction are deleted from the view
      val viewV = VersionedTable.latestVersion(spark, viewDir)
      val affected = VersionedTable.readVersion(spark, viewDir, viewV)
        .join(deltaAll.select(groupCols.map(col): _*), groupCols,
          "left_semi")
      val invNext = Incremental.mergeStates(
        affected.drop(extCols: _*), delta)
      val (next, rescanMeta) =
        if (extremes.isEmpty)
          (invNext, Map.empty[String, String])
        else {
          // hybrid MIN/MAX: incremental when provable, re-scan ONLY
          // the uncertain groups. A group is uncertain iff a retracted
          // value TIES its current extremum and no applied value beats
          // it — a retraction strictly inside the range can never move
          // an extremum, and an applied value at/past it pins the new
          // one without looking at the data.
          val curExt = affected.select(
            (groupCols.map(col) ++ extCols.map(col)): _*)
          val cand = deltaAll.select(
            (groupCols.map(col) ++ candCols.map(col)): _*)
          val needAny = extremes.map { case (m, _) =>
            val (cMin, cMax) = (col(minCol(m)), col(maxCol(m)))
            (cMin.isNotNull && col(s"${m}__min_ret").isNotNull &&
              col(s"${m}__min_ret") <= cMin &&
              !(col(s"${m}__min_app").isNotNull &&
                col(s"${m}__min_app") <= cMin)) ||
            (cMax.isNotNull && col(s"${m}__max_ret").isNotNull &&
              col(s"${m}__max_ret") >= cMax &&
              !(col(s"${m}__max_app").isNotNull &&
                col(s"${m}__max_app") >= cMax))
          }.reduce(_ || _)
          // full outer: brand-new groups have no current row (extremum
          // = the applied candidate), untouched-extreme groups no
          // candidate row (extremum carried)
          val resolved = curExt.join(cand, groupCols, "full_outer")
            .select((groupCols.map(col) ++ Seq(needAny.as("__need")) ++
              extremes.flatMap { case (m, _) =>
                Seq(
                  least(col(minCol(m)), col(s"${m}__min_app"))
                    .as(minCol(m)),
                  greatest(col(maxCol(m)), col(s"${m}__max_app"))
                    .as(maxCol(m)))
              }): _*).localCheckpoint() // decided once; reused 3×
          val k = groupCols.head
          val env = resolved.filter(col("__need"))
            .agg(count(lit(1)), min(col(k)), max(col(k))).head()
          val nRescan = env.getLong(0)
          if (nRescan == 0L)
            (invNext.join(resolved.drop("__need"), groupCols, "left"),
              Map(RescanGroupsKey -> "0", RescanFilesKey -> "0"))
          else {
            // re-scan reads ONLY the files that can hold the uncertain
            // groups — the source's own stats index prunes on the
            // leading group column's envelope (receipt in the commit)
            val (kept, _) = scala.util.Try(
              VersionedTable.prunedFiles(spark, srcDir, latest, Seq(
                VersionedTable.ColBound(k, Option(env.get(1)),
                  Option(env.get(2)))))).getOrElse(
              (VersionedTable.liveFiles(spark, srcDir, latest), 0))
            val srcRows = VersionedTable.readFilesMasked(spark, srcDir,
              VersionedTable.readManifest(spark, srcDir, latest), kept,
              VersionedTable.schemaOf(spark, srcDir, latest))
            val reAggs = extremes.flatMap { case (m, c) =>
              Seq(min(c).as(s"${m}__min_re"), max(c).as(s"${m}__max_re"))
            }
            val re = srcRows.join(
                resolved.filter(col("__need"))
                  .select(groupCols.map(col): _*), groupCols, "left_semi")
              .groupBy(groupCols.map(col): _*)
              .agg(reAggs.head, reAggs.tail: _*)
            val fixed = resolved.join(re, groupCols, "left")
              .select((groupCols.map(col) ++
                extremes.flatMap { case (m, _) =>
                  Seq(
                    when(col("__need"), col(s"${m}__min_re"))
                      .otherwise(col(minCol(m))).as(minCol(m)),
                    when(col("__need"), col(s"${m}__max_re"))
                      .otherwise(col(maxCol(m))).as(maxCol(m)))
                }): _*)
            (invNext.join(fixed, groupCols, "left"),
              Map(RescanGroupsKey -> nRescan.toString,
                RescanFilesKey -> kept.length.toString))
          }
        }
      VersionedTable.merge(spark, viewDir,
        next.withColumn("__del", col("__cnt") === 0), groupCols, viewV,
        consumer, deleteCol = Some("__del"),
        meta = Map(SyncedKey -> latest.toString) ++ rescanMeta)
    }
    VersionedTable.ackChanges(spark, srcDir, consumer, cur, latest)
    Some((cur, latest))
  }

  /** The view, finalized for reading. */
  def read(spark: SparkSession, viewDir: String): DataFrame =
    finalize(VersionedTable.read(spark, viewDir))

  // ─────────── rename-proof views: resolved config (round 15) ───────────
  //
  // The r14 documented breakage: the view's group/measure config was
  // caller-held STRINGS, so a source `renameColumns` broke sync (the
  // feed arrives under the new logical names). The fix is the same
  // carrier that takes feeds across renames: the view manifest stores
  // its config by the source's PHYSICAL column names (sticky across
  // any number of renames), and every sync translates physical →
  // CURRENT logical through the source's colmap. A group-column
  // rename additionally propagates to the VIEW's own schema (a
  // metadata-only renameColumns on the view), so the view's columns
  // track the source's current names — the dashboard never sees a
  // stale header.

  private val CfgPrefix = "view.cfg."
  private def plainToken(s: String): String = {
    require(s.nonEmpty && !s.exists(c => c == ',' || c == ':' ||
        c == '\t' || c == '\n'),
      s"resolved-view names must be plain tokens, got '$s'")
    s
  }

  private def toPhys(colmap: Map[String, String], c: String): String =
    colmap.getOrElse(c, c)

  private def toLogical(colmap: Map[String, String], phys: String): String =
    colmap.collectFirst { case (lg, ph) if ph == phys => lg }.getOrElse(phys)

  /** [[init]] + persist the view's RESOLVED config (source-physical
    * column names) in the view manifest, so [[syncResolved]] needs no
    * caller-held strings and survives source renames. Measures and
    * extremes are (label -> source column name) — plain columns by
    * design: an expression has no physical identity to resolve. */
  def initResolved(spark: SparkSession, srcDir: String, viewDir: String,
      consumer: String, keys: Seq[String], groupCols: Seq[String],
      measures: Seq[(String, String)], scale: Int = 2,
      extremes: Seq[(String, String)] = Seq.empty,
      viewMeta: Map[String, String] = Map.empty): Long = {
    val srcV = VersionedTable.latestVersion(spark, srcDir)
    require(srcV >= 0, s"initResolved: no committed versions under $srcDir")
    val colmap = VersionedTable.readManifest(spark, srcDir, srcV).colmap
    def enc(cs: Seq[String]) =
      cs.map(c => plainToken(toPhys(colmap, c))).mkString(",")
    def encPairs(ps: Seq[(String, String)]) =
      ps.map { case (m, c) =>
        s"${plainToken(m)}:${plainToken(toPhys(colmap, c))}" }.mkString(",")
    val cfg = Map(
      s"${CfgPrefix}keys" -> enc(keys),
      s"${CfgPrefix}group" -> enc(groupCols),
      s"${CfgPrefix}measures" -> encPairs(measures),
      s"${CfgPrefix}scale" -> scale.toString) ++
      (if (extremes.isEmpty) Map.empty
       else Map(s"${CfgPrefix}extremes" -> encPairs(extremes)))
    init(spark, srcDir, viewDir, consumer, groupCols,
      measures.map { case (m, c) => m -> col(c) }, scale,
      viewMeta ++ cfg, extremes.map { case (m, c) => m -> col(c) })
  }

  /** [[sync]] driven entirely by the manifest-stored config: resolves
    * each stored physical name to the source's CURRENT logical name,
    * propagates group-column renames to the view's own schema, then
    * runs the normal incremental maintenance. The spec-pinned claim:
    * a source rename between syncs is a NON-EVENT — the next
    * syncResolved applies the churn under the new names and the view
    * hash-matches a direct aggregate. */
  def syncResolved(spark: SparkSession, srcDir: String, viewDir: String,
      consumer: String): Option[(Long, Long)] = {
    val viewV = VersionedTable.latestVersion(spark, viewDir)
    require(viewV >= 0, s"no view table under $viewDir")
    val meta = VersionedTable.readManifest(spark, viewDir, viewV).meta
    def cfg(k: String): String = meta.getOrElse(s"$CfgPrefix$k",
      throw new IllegalStateException(
        s"$viewDir carries no $CfgPrefix$k — init the view with " +
          "initResolved to sync without caller-held config"))
    val srcV = VersionedTable.latestVersion(spark, srcDir)
    val colmap = VersionedTable.readManifest(spark, srcDir, srcV).colmap
    def dec(s: String) = s.split(',').toSeq.filter(_.nonEmpty)
    def decPairs(s: String) = dec(s).map { p =>
      val i = p.indexOf(':'); (p.substring(0, i), p.substring(i + 1))
    }
    val keys = dec(cfg("keys")).map(toLogical(colmap, _))
    val group = dec(cfg("group")).map(toLogical(colmap, _))
    val measures = decPairs(cfg("measures"))
      .map { case (m, ph) => m -> col(toLogical(colmap, ph)) }
    val extremes = meta.get(s"${CfgPrefix}extremes").map(decPairs)
      .getOrElse(Seq.empty)
      .map { case (m, ph) => m -> col(toLogical(colmap, ph)) }
    val scale = cfg("scale").toInt
    // propagate source group renames to the view's own columns: the
    // view's group columns are (by construction) its leading columns,
    // in config order — a metadata-only rename keeps the view's
    // headers tracking the source's current names
    val viewSchema = VersionedTable.schemaOf(spark, viewDir, viewV)
    val renames = viewSchema.fieldNames.take(group.length).toSeq
      .zip(group).filter { case (o, n) => o != n }
    if (renames.nonEmpty)
      VersionedTable.renameColumns(spark, viewDir, renames.toMap,
        viewV, consumer)
    sync(spark, srcDir, viewDir, consumer, keys, group, measures,
      scale, extremes)
  }
}
