package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where does the stream–stream OUTER interval-join replay spend its
  * time? (VERDICT r8 #5: q144 right-outer at 9.2 s vs q138 left-outer
  * at 6.3 s — same two-phase sentinel replay, same source, same
  * interval.) This probe re-runs the q138/q144 replay shape with
  * per-phase wall times and the per-micro-batch progress Spark records
  * (batch count, durationMs breakdown, state rows), so the slow part is
  * attributable: query startup, batch execution, state commit, or the
  * sentinel flush.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *        sbt -batch "runMain graft.tools.StreamJoinProbe [left_outer|right_outer] [shufflePartitions]"
  */
object StreamJoinProbe {
  def main(args: Array[String]): Unit = {
    val joinType = args.headOption.getOrElse("right_outer")
    val parts = args.lift(1).map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def phase[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // one warm + two timed full replays
    (0 to 2).foreach { round =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_probe_$joinType").toString
      val src = s"$tmp/src"; val sink = s"$tmp/sink"; val ckpt = s"$tmp/ckpt"
      val t0 = System.nanoTime()
      val ev = graft.core.Tables(spark, sfDir).events
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
      phase(s"r$round write-src")(ev.coalesce(1).write.mode("append").parquet(src))
      val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
      val sentinelTs = new java.sql.Timestamp(maxTs.getTime + 365L * 86400 * 1000)
      val ss = graft.streaming.EventsStreaming.replaySession(spark, parts)
      def run(tag: String): Unit = phase(s"r$round $tag") {
        val clicks = graft.streaming.EventsStreaming.readEvents(ss, src)
          .filter(col("event_type").isin("click", "__sentinel"))
          .select(col("event_id").as("click_id"), col("ts").as("click_ts"),
            col("user_id").as("click_user"))
        val buys = graft.streaming.EventsStreaming.readEvents(ss, src)
          .filter(col("event_type").isin("purchase", "__sentinel"))
          .select(col("event_id").as("buy_id"), col("ts").as("buy_ts"),
            col("user_id"), col("value"))
        val q = graft.streaming.EventsStreaming.streamIntervalJoin(
            clicks, buys, "click_user", "user_id", "click_ts", "buy_ts",
            within = "30 minutes", joinType = joinType)
          .select(col("click_id"), col("buy_id"), col("user_id").as("buy_user"),
            expr("CAST(floor(value * 100) AS BIGINT)").as("value_cents"))
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        q.recentProgress.foreach { p =>
          val dur = Option(p.durationMs).map(m =>
            m.entrySet().toArray.map(_.toString).sorted.mkString(", ")).getOrElse("")
          val st = Option(p.stateOperators).getOrElse(Array.empty).map(s =>
            s"rowsTotal=${s.numRowsTotal} commitMs=${s.commitTimeMs}").mkString("; ")
          System.err.println(s"[probe]   batch=${p.batchId} rows=${p.numInputRows} {$dur} [$st]")
        }
      }
      val singlePhase = args.contains("single")
      if (singlePhase) {
        // sentinel already in the source: batch 0 emits inner matches and
        // lifts the watermark past every interval; batch 1 flushes the
        // null-extended rows — one query startup, one replay
        phase(s"r$round write-sentinel") {
          ev.limit(1).select(lit(-1L).as("event_id"), lit(sentinelTs).as("ts"),
              lit(-1L).as("user_id"), lit("__sentinel").as("event_type"),
              lit(0.0).as("value"), lit(null).cast("string").as("props"))
            .coalesce(1).write.mode("append").parquet(src)
        }
        run("single")
      } else {
        run("phase1")
        phase(s"r$round write-sentinel") {
          ev.limit(1).select(lit(-1L).as("event_id"), lit(sentinelTs).as("ts"),
              lit(-1L).as("user_id"), lit("__sentinel").as("event_type"),
              lit(0.0).as("value"), lit(null).cast("string").as("props"))
            .coalesce(1).write.mode("append").parquet(src)
        }
        run("phase2")
      }
      val n = phase(s"r$round read-sink")(spark.read.parquet(sink).count())
      System.err.println(f"[probe] r$round TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s  sinkRows=$n")
    }
    spark.stop()
  }
}
