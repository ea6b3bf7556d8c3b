package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure range joins (point-in-interval with NO equi key) — the case the
  * reference writes as CROSS + FILTER (SURVEY.md §2.4), which Spark
  * plans as BroadcastNestedLoopJoin: O(|points|·|intervals|) compares
  * and a broadcast side that must fit in memory. Unusable at 100 TB.
  *
  * Binned strategy: quantize the value domain into fixed-width bins;
  * each interval explodes to the bins it overlaps, each point maps to
  * one bin; join becomes an EQUI join on bin id + residual predicate.
  * Work drops to O(points + intervals·binsPerInterval + trueMatches),
  * shuffled on bin — fully parallel, AQE-skew-splittable.
  *
  * Pick binSize ≈ the typical interval width: one-ish bin per interval,
  * few false candidates per point.
  */
object RangeJoin {

  /** Inner join of `points` (value `pointCol`) with `intervals`
    * ([loCol, hiCol), hi exclusive) on containment. */
  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binSize: Double): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val ptBin = floor(col(pointCol) / binSize).cast("long")
    // interval [lo, hi) explodes to bins floor(lo/b) .. floor(hi/b); the
    // top bin is superfluous only when hi sits exactly on a bin edge, and
    // the residual predicate discards those candidates — one spare bin
    // per interval is cheaper than an epsilon that silently drops points
    // lying within eps below hi (or does nothing once eps < ulp(hi)).
    val loBin = floor(col(loCol) / binSize).cast("long")
    val hiBin = floor(col(hiCol) / binSize).cast("long")
    val binned = intervals
      .withColumn("__bin", explode(sequence(loBin, greatest(hiBin, loBin))))
    points.withColumn("__bin", ptBin)
      .join(binned, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bin")
  }
}
