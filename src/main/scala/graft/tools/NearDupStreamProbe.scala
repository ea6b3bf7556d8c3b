package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does the q158 streaming near-dup replay spend its
  * time at a given SF — banding, the stateful stream, or the batch
  * reference? */
object NearDupStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[16]")
        .config("spark.sql.shuffle.partitions", 16)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ndprobe] $name secs=${(System.nanoTime() - t0) / 1e9}%.1f")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("ts", to_timestamp(lit(1700000000L) + col("doc_id")))
    val n = docs.count()
    println(s"[ndprobe] docs=$n")
    time("band_rows_batch")(
      graft.streaming.CurationStreaming.bandRows(docs, 128, 16).count())
    time("batch_reference")(
      graft.streaming.CurationStreaming.batchNearDupFlags(docs).count())
    val tmp = java.nio.file.Files.createTempDirectory("ndprobe_").toString
    docs.coalesce(2).write.mode("append").parquet(s"$tmp/src")
    val ss = graft.streaming.EventsStreaming.replaySession(spark)
    time("stream_replay") {
      graft.streaming.EventsStreaming.runAvailableNow(
        graft.streaming.CurationStreaming.streamNearDupVerdicts(ss, s"$tmp/src"),
        "ndprobe_out", org.apache.spark.sql.streaming.OutputMode.Update())
      ss.table("ndprobe_out").count()
    }
    spark.stop()
  }
}
