package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: kMeansFit wall time at soak scale, isolated from the
  * full Soak battery. Same synthetic centered embeddings as Soak.
  * Usage: `sbt "runMain graft.tools.KMeansSoak [rows] [k] [init]"`. */
object KMeansSoak {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(1024)
    val init = args.lift(2).getOrElse("parallel")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.range(rows).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 15), i -> cast(pmod(hash(id, i), 97) as double) / 97.0 - 0.5)")
        .as("embedding"))
    for (_ <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.operators.Similarity
        .kMeansFit(emb, "embedding", k = k, iters = 2, init = init).count()
      println(f"[kmsoak] rows=$rows k=$k init=$init centroids=$n " +
        f"secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    spark.stop()
  }
}
