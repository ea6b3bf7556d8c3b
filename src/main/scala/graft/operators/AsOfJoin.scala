package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join — absent from the reference surface
  * (SURVEY.md §2.4 marks it an extension); a time-series staple worth
  * having first-class.
  *
  * For each left row (k, t) find the right row with the same key and the
  * greatest t' <= t. Implemented the scalable way: tag + union both
  * sides, ONE shuffle partitioned by key, a partitioned window carrying
  * the last-seen right payload forward (`last(_, ignoreNulls)` over
  * unbounded-preceding), then keep left rows. No broadcast of the right
  * side, no per-row range probe, no single-partition window — at 100 TB
  * this is a single well-partitioned sort pass. (Skewed keys: salt the
  * key or pre-aggregate the right side before calling.)
  *
  * The right payload is carried as ONE struct (not per-column last()),
  * so legitimately-null payload fields never tear across rows.
  *
  * Tie semantics: right rows sort BEFORE left rows at equal time
  * (inclusive `t' <= t`), and among right rows at the same (key, time)
  * the one with the greatest `rightTiebreak` wins — deterministic.
  */
object AsOfJoin {

  def asofLeft(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String],
      rightTiebreak: String): DataFrame = {

    val leftCols = left.columns.toSeq
    val payload = struct(rightPayload.map(col): _*)

    val lTagged = left.select(
      (Seq(col(leftKey).as("__k"), col(leftTime).cast("timestamp").as("__t"),
           lit(1).as("__side"), lit(null).cast(right.schema(rightTiebreak).dataType).as("__tb"),
           lit(null).cast(right.select(payload).schema.head.dataType).as("__payload")) ++
        leftCols.map(col)): _*)
    val rTagged = right.select(
      (Seq(col(rightKey).as("__k"), col(rightTime).cast("timestamp").as("__t"),
           lit(0).as("__side"), col(rightTiebreak).as("__tb"),
           payload.as("__payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("__carry", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++ rightPayload.map(c => col(s"__carry.$c").as(c)): _*)
  }
}
