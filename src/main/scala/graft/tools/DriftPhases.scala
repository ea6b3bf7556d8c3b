package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q185 drift ATTRIBUTION probe (round 17, VERDICT r16 #1): the bench
  * medians for q185_distribution_drift rose monotonically across three
  * driver records (1.96 → 2.12 → 2.63 at sf0.1) on untouched code.
  * This splits one q185 run into its two phases so the growth — if
  * real — localizes:
  *
  *   phase A — `equiDepthHistogram(base)` + the 17-value bounds
  *             collect: the two-pass exact rank (the expensive part);
  *   phase B — the union scan of base+target binned against the
  *             broadcast bounds and counted (one shuffle agg).
  *
  * Median of 5 per phase, same session, warm pass first — run it
  * isolated at quiet load (`sbt "runMain graft.tools.DriftPhases"`,
  * SPARK_GRAFT_SF_DIR as in the bench). Findings go to ROUND17_NOTES. */
object DriftPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val target = li.filter(col("l_quantity") <= 10)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def phaseA(): Array[Double] = {
      val hist = graft.operators.Relational
        .equiDepthHistogram(li, "l_extendedprice", buckets = 16)
      hist.select(col("bucket"), col("hi").cast("double"))
        .collect().sortBy(_.getLong(0)).map(_.getDouble(1))
    }
    def phaseB(bounds: Array[Double]): Long = {
      val cap = bounds.length - 1
      val bArr = array(bounds.map(lit): _*)
      def binned(df: org.apache.spark.sql.DataFrame, side: String) =
        df.select(col("l_extendedprice").cast("double").as("__x"))
          .filter(col("__x").isNotNull)
          .select(least(size(filter(bArr, b => b < col("__x"))), lit(cap))
            .cast("long").as("bucket"), lit(side).as("__side"))
      binned(li, "base").unionByName(binned(target, "target"))
        .groupBy(col("bucket"))
        .agg(sum(when(col("__side") === "base", 1L).otherwise(0L)).as("base_cnt"),
          sum(when(col("__side") === "target", 1L).otherwise(0L)).as("target_cnt"))
        .count()
    }
    // warm both phases (JIT + page cache), then 5 timed runs each
    val warmBounds = phaseA(); phaseB(warmBounds)
    val aT = (1 to 5).map(_ => timed { phaseA(); () }).sorted
    val bounds = phaseA()
    val bT = (1 to 5).map(_ => timed { phaseB(bounds); () }).sorted
    val fullT = (1 to 5).map(_ => timed {
      graft.operators.Relational.distributionDrift(
        li, target, "l_extendedprice", 16).count()
    }).sorted
    def med(xs: Seq[Double]) = xs(xs.length / 2)
    println(f"""{"probe":"q185_phases","rank_hist_sec":${med(aT)}%.3f,"binning_sec":${med(bT)}%.3f,"full_sec":${med(fullT)}%.3f,"rank_raw":"${aT.map(t => f"$t%.2f").mkString(",")}","bin_raw":"${bT.map(t => f"$t%.2f").mkString(",")}","full_raw":"${fullT.map(t => f"$t%.2f").mkString(",")}"}""")
    spark.stop()
    sys.exit(0)
  }
}
