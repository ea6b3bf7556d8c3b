package graft

import org.apache.spark.sql.functions._

/** Demonstrates the engine's skew posture end-to-end: AQE splits a hot
  * join key at runtime (thresholds scaled down to toy data size). This
  * is the `USING 'skewed'` strategy of the reference — zero engine code,
  * but worth pinning so a config regression is caught.
  *
  * Two non-obvious preconditions discovered while writing this:
  *  - skew splitting works at MAP-OUTPUT-BLOCK granularity: a shuffle
  *    fed by a single map task (one small parquet file) can never split,
  *    regardless of how hot the key is — hence the repartition(8). On a
  *    real cluster the mapper count makes this moot.
  *  - `coalescePartitions.minPartitionSize` (default 1MB) clamps the
  *    split target; toy-size partitions need it lowered.
  */
class SkewSpec extends SparkSpec {

  test("AQE splits a skewed join partition at runtime") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "16KB")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val li = graft.core.Tables(s, "/root/testdata/sf0.01").lineitem
      .repartition(8) // multiple map blocks — see scaladoc
      // hot key: ~90% of rows collapse onto key 1
      .withColumn("k", when(col("l_orderkey") % 10 === 0, col("l_orderkey")).otherwise(lit(1L)))
    val dim = graft.core.Tables(s, "/root/testdata/sf0.01").orders
      .select(col("o_orderkey").as("k"), col("o_orderstatus"))
    val joined = li.join(dim, Seq("k"))
      .select(col("k"), col("l_extendedprice"), col("l_shipdate"), col("o_orderstatus"))
    // materialize THROUGH this DataFrame's own QueryExecution (count()
    // would build a fresh plan and leave this one unexecuted)
    val n = joined.queryExecution.executedPlan.executeCollect().length
    assert(n > 0)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"), finalPlan.take(3000))
  }
}
