package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** q235 change-stream replay ATTRIBUTION probe (round 19): after the
  * fixture-once work the replay's floor is ~2.7 s — this splits one
  * bench-shaped run into its steps so the "not yet optimized" entry in
  * OPTIMIZATION_r19.md carries numbers, not guesses:
  *
  *   copy   — FileUtils.copyDirectory of the committed v0 table;
  *   merge  — VersionedTable.merge of the churn (v1 feed production);
  *   drain1 — bootstrap + merge feed through one AvailableNow drain;
  *   delete — deleteWhere DV commit (v2 feed production);
  *   drain2 — restart drain delivering exactly the delete feed;
  *   read   — the sink read the bench counts.
  *
  * Median of 3 per step (steps are sequential within a replay, so each
  * replay contributes one sample per step). */
object ChangeStreamPhases {
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
    import graft.operators.VersionedTable

    // fixture: committed v0 (the bench's vtCustFixture shape)
    val fxRoot = java.nio.file.Files.createTempDirectory("csp_fx_").toString
    val cust = graft.core.Tables(spark, sfDir).customer
      .select(col("c_custkey").as("k"), col("c_name").as("name"),
        col("c_acctbal").as("bal"))
    require(VersionedTable.commit(spark, s"$fxRoot/t", cust, -1L, "loader",
      clusterBy = Seq("k"), clusterFiles = 16,
      meta = Map(VersionedTable.FeedKey -> "k")) == 0L)

    def onePass(): Map[String, Double] = {
      val tmp = java.nio.file.Files.createTempDirectory("csp_run_").toString
      val vt = s"$tmp/t"
      var out = Map.empty[String, Double]
      def step(tag: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        out += tag -> (System.nanoTime() - t0) / 1e9
      }
      step("copy") {
        org.apache.commons.io.FileUtils.copyDirectory(
          new java.io.File(s"$fxRoot/t"), new java.io.File(vt))
      }
      val changes = cust.filter(col("k") % 7 === 0)
          .select(col("k"), col("name"), (col("bal") + 100).as("bal"))
        .unionByName(cust.filter(col("k") % 53 === 0)
          .select((col("k") + 5000000L).as("k"),
            concat(lit("n_"), col("k").cast("string")).as("name"),
            lit(0.0).as("bal")))
      step("merge") { VersionedTable.merge(spark, vt, changes, Seq("k"), 0L, "merger") }
      def drain(): Unit = {
        val q = VersionedTable.changeStream(spark, vt)
          .writeStream.format("parquet")
          .option("path", s"$tmp/out").option("checkpointLocation", s"$tmp/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      step("drain1") { drain() }
      step("delete") {
        VersionedTable.deleteWhere(spark, vt, "k % 97 = 1 and k < 5000000", 1L, "gdpr")
      }
      step("drain2") { drain() }
      step("read") { spark.read.parquet(s"$tmp/out").count(); () }
      out
    }
    onePass() // warm
    val runs = (1 to 3).map(_ => onePass())
    val keys = Seq("copy", "merge", "drain1", "delete", "drain2", "read")
    val med = keys.map { k =>
      val xs = runs.map(_(k)).sorted; k -> xs(xs.length / 2)
    }
    println("{\"probe\":\"q235_phases\"," +
      med.map { case (k, v) => f""""${k}_sec":$v%.3f""" }.mkString(",") +
      f""","total_sec":${med.map(_._2).sum}%.3f}""")
    spark.stop()
    sys.exit(0)
  }
}
