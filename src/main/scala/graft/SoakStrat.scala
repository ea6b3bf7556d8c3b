package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolate stratifiedSample cost drivers (dev tool). */
object SoakStrat {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", rows).option("partitions", 64).load()

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[strat] $name n=$n secs=${(System.nanoTime() - t0) / 1e9}%.1f")
    }
    time("md5_conv_only")(
      docs.select((-conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("double")).as("s")).agg(min(col("s"))).count())
    time("sample_k5")(
      graft.operators.TrainingPipeline.stratifiedSample(docs, "lang", "doc_id", 5).count())
    time("sample_k100")(
      graft.operators.TrainingPipeline.stratifiedSample(docs, "lang", "doc_id", 100).count())
    time("sample_k1000")(
      graft.operators.TrainingPipeline.stratifiedSample(docs, "lang", "doc_id", 1000).count())
    spark.stop()
  }
}
