package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: can this sandbox run a Spark Connect SERVER in-process
  * and drive it through the CLIENT (gRPC) path? If yes, Federation
  * gains the SURVEY §3.2/§7.4 full-case substrate: the orchestrator
  * drives clusters through `sc://host:port` URIs — the same protocol
  * it would use against physically remote clusters. */
object ConnectProbe {
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(15002)
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.connect.grpc.binding.port", port.toString)
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.spark.sql.connect.service.SparkConnectService.start(spark.sparkContext)
    println(s"[connect-probe] server started on port $port")
    val client = org.apache.spark.sql.connect.SparkSession.builder()
      .remote(s"sc://localhost:$port").create()
    println(s"[connect-probe] client session: ${client.getClass.getName}")
    val n = client.range(1000).selectExpr("sum(id) as s").collect()(0).getLong(0)
    println(s"[connect-probe] sum(range(1000)) via gRPC = $n (expect 499500)")
    // two INDEPENDENT client sessions: catalog isolation check
    val c2 = org.apache.spark.sql.connect.SparkSession.builder()
      .remote(s"sc://localhost:$port").create()
    client.range(5).createOrReplaceTempView("probe_t")
    val visible1 = client.catalog.tableExists("probe_t")
    val visible2 = c2.catalog.tableExists("probe_t")
    println(s"[connect-probe] temp view visible in own session=$visible1 other session=$visible2")
    // parquet write/read through the client (the federation cut-edge path)
    val dir = java.nio.file.Files.createTempDirectory("graft_connect_probe_").toString
    client.range(100).write.mode("overwrite").parquet(s"$dir/t")
    val back = c2.read.parquet(s"$dir/t").count()
    println(s"[connect-probe] cut-edge parquet roundtrip rows=$back (expect 100)")
    client.close(); c2.close()
    org.apache.spark.sql.connect.service.SparkConnectService.stop(None, None)
    spark.stop()
    println("[connect-probe] OK")
  }
}
