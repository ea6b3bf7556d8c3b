package graft.tools

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Dev probe: prices the bignum SUM aggregator's buffer discipline.
  *
  * The round-6 SumAgg buffered the running sum as its canonical STRING:
  * every reduce re-parsed the buffer (`new BigDecimal(s)`) and
  * re-rendered it (`stripTrailingZeros.toPlainString`) — two
  * allocations plus digit-conversion per input row. The round-7 version
  * keeps a live java.math.BigDecimal in the ObjectHashAggregate buffer
  * (kryo only at shuffle/spill boundaries). This main times both over
  * the same synthetic 30-digit workload so the delta is a measured
  * number, not a claim; the old shape is kept HERE as the reference.
  *
  * Usage: `sbt "runMain graft.tools.BigNumBench [rows]"` (default 2M).
  */
object BigNumBench {

  /** The round-6 string-buffered sum, verbatim shape (reference). */
  private object StringSumAgg extends Aggregator[String, String, String] {
    private def jbd(s: String) = new java.math.BigDecimal(s)
    def zero: String = ""
    def reduce(b: String, a: String): String =
      if (a == null) b
      else if (b.isEmpty) jbd(a).stripTrailingZeros.toPlainString
      else jbd(b).add(jbd(a)).stripTrailingZeros.toPlainString
    def merge(a: String, b: String): String =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else jbd(a).add(jbd(b)).stripTrailingZeros.toPlainString
    def finish(r: String): String = if (r.isEmpty) null else r
    def bufferEncoder: Encoder[String] = Encoders.STRING
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 30-digit positive integers with ~1% nulls — the exact input shape
    // sumBig sees after BigNum.str()
    val vals = spark.range(rows).select(
      when(col("id") % 100 === 7, lit(null))
        .otherwise(concat(lit("98765432109876543210"),
          lpad((col("id") % 10000000000L).cast("string"), 10, "0")))
        .as("s"))
      .cache()
    vals.count() // materialize off the clock

    def time(name: String, agg: org.apache.spark.sql.Column): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val out = vals.agg(agg.as("s")).head().getString(0)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[bignum-bench] $name pass$i rows=$rows secs=$secs%.2f " +
          f"rate=${rows / secs}%.0f rows/s digits=${out.length}")
      }
    }
    // both sides aggregate the same raw string column — no wrap/unwrap
    // kernels on the clock, the delta is the buffer discipline alone
    time("string_buffer_r6", udaf(StringSumAgg).apply(col("s")))
    time("typed_buffer_r7", udaf(graft.functions.BigNum.SumAgg).apply(col("s")))
    spark.stop()
  }
}
