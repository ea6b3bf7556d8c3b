package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: IVF-PQ at soak scale, isolated from the full Soak
  * battery — pqTrain wall time, encode throughput (the per-row cost
  * a 100 TB corpus pays in the scan), and the end-to-end
  * ivfPqTopK query path including the exact refine.
  * Same synthetic centered embeddings as KMeansSoak.
  * Usage: `sbt "runMain graft.tools.PqSoak [rows] [m] [nCodes]"`. */
object PqSoak {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val m = args.lift(1).map(_.toInt).getOrElse(8)
    val nCodes = args.lift(2).map(_.toInt).getOrElse(256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.range(rows).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 15), i -> cast(pmod(hash(id, i), 97) as double) / 97.0 - 0.5)")
        .as("embedding"))
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[pqsoak] $name rows=$rows m=$m c=$nCodes " +
        f"secs=${(System.nanoTime() - t0) / 1e9}%.1f")
      r
    }
    val pq = time("pq_train")(graft.operators.Similarity.pqTrain(
      emb, "embedding", m = m, nCodes = nCodes, iters = 2))
    time("pq_encode") {
      // the full-corpus scan cost: unitize + m subspace argmins/row
      val n = emb.select(graft.plans.PqExpressions.pqEncode(
          graft.operators.Similarity.unitize(col("embedding")), pq).as("c"))
        .agg(sum(element_at(col("c"), 1))).collect()
      n
    }
    val cents = time("coarse_fit")(graft.operators.Similarity.kMeansFit(
      emb, "embedding", k = 256, iters = 2, init = "parallel"))
    val qs = emb.filter(col("vec_id") % (rows / 1000) === 0)
    for (_ <- 1 to 2) time("ivfpq_topk_refined") {
      graft.operators.Similarity.ivfPqTopK(
        emb, qs, "vec_id", "vec_id", "embedding", k = 10,
        centroids = cents, pq = pq, nProbe = 16, refine = 4).count()
    }
    spark.stop()
  }
}
