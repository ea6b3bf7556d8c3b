package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the driver-generated test tables (FIXTURES.md).
  * Every read is a plain parquet scan — filters and column pruning are
  * pushed down by Catalyst, so callers should NOT pre-select columns
  * here; declare the full query and let the optimizer prune.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame    = table("region")
  def nation: DataFrame    = table("nation")
  def customer: DataFrame  = table("customer")
  def supplier: DataFrame  = table("supplier")
  def part: DataFrame      = table("part")
  def orders: DataFrame    = table("orders")
  def lineitem: DataFrame  = table("lineitem")
  /** `ts` is TIMESTAMP(NANOS) in the parquet; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a long,
    * which we truncate to microseconds (integer div — no double
    * round-trip, exact for the full epoch-nanos range) to match how
    * DuckDB's reader narrows nanos. */
  def events: DataFrame = {
    val raw = table("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
