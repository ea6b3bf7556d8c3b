package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: window-fingerprint construction cost, native kernel vs
  * the slice+concat Column formulation, isolated from the span joins.
  * Usage: `sbt "runMain graft.tools.WinHashBench [rows]"`; fixture dir
  * from `SPARK_GRAFT_SF_DIR` like Bench/RecallProbe. */
object WinHashBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(500000L)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // replicate the ~55-token documents fixture to `rows` docs — the
    // synthetic source's ~9-token texts underweight per-doc window cost
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text"))
      .crossJoin(spark.range(math.max(1L, rows / 500)))
      .repartition(64)
      .cache()
    docs.count()
    def time(name: String)(body: => Long): Unit = {
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = body
        println(f"[winhash] $name n=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      }
    }
    val L = 8
    time("kernel")(
      docs.select(posexplode(graft.plans.TextExpressions.windowHash64(col("text"), L))
        .as(Seq("p", "h"))).agg(count(lit(1))).head().getLong(0))
    val tk = graft.operators.Dedup.tokens(col("text"))
    time("slice_concat")(
      docs.select(tk.as("tk"))
        .filter(size(col("tk")) >= L)
        .select(explode(sequence(lit(1), size(col("tk")) - (L - 1))).as("pos"), col("tk"))
        .select(xxhash64(concat_ws("", slice(col("tk"), col("pos"), lit(L)))).as("h"))
        .agg(count(lit(1))).head().getLong(0))
    spark.stop()
  }
}
