package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The reference lineage's distributable-aggregate UDF protocol
  * (Algebraic Initial/Intermed/Final + streamed Accumulator, SURVEY.md
  * §2.9) maps onto `Aggregator[IN, BUF, OUT]`: Spark runs `reduce` as
  * the partial (map-side/combiner) phase and `merge` as the final
  * phase, with spillable buffers — the 3-phase contract for free.
  */
object Aggregators {

  /** Weighted average with an EXACT integer buffer (values scaled to
    * cents) so the result is identical at any partition count — the
    * discipline every money-typed Algebraic UDF here follows. */
  final case class WeightedAvgBuf(sumVW: Long, sumW: Long)

  /** IN = (value, weight), both ~2-decimal doubles. */
  object WeightedAvg extends Aggregator[(Double, Double), WeightedAvgBuf, Double] {
    def zero: WeightedAvgBuf = WeightedAvgBuf(0L, 0L)
    def reduce(b: WeightedAvgBuf, in: (Double, Double)): WeightedAvgBuf = {
      val v = math.round(in._1 * 100) // cents
      val w = math.round(in._2 * 100)
      WeightedAvgBuf(b.sumVW + v * w, b.sumW + w)
    }
    def merge(a: WeightedAvgBuf, b: WeightedAvgBuf): WeightedAvgBuf =
      WeightedAvgBuf(a.sumVW + b.sumVW, a.sumW + b.sumW)
    // sumVW carries cents*cents (1e4·Σvw) while sumW carries cents
    // (1e2·Σw); the quotient is 100× the true mean, so rescale here.
    def finish(b: WeightedAvgBuf): Double =
      if (b.sumW == 0) 0.0 else b.sumVW.toDouble / b.sumW.toDouble / 100.0
    def bufferEncoder: Encoder[WeightedAvgBuf] = Encoders.product[WeightedAvgBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Streamed per-group concatenation with a bound — the Accumulator
    * shape (consumes the group iterator, bounded state). */
  final case class TopStrBuf(items: List[String])

  class BoundedConcat(n: Int, sep: String) extends Aggregator[String, TopStrBuf, String] {
    def zero: TopStrBuf = TopStrBuf(Nil)
    def reduce(b: TopStrBuf, s: String): TopStrBuf =
      TopStrBuf((s :: b.items).sorted.take(n))
    def merge(a: TopStrBuf, b: TopStrBuf): TopStrBuf =
      TopStrBuf((a.items ++ b.items).sorted.take(n))
    def finish(b: TopStrBuf): String = b.items.mkString(sep)
    def bufferEncoder: Encoder[TopStrBuf] = Encoders.product[TopStrBuf]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Bounded top-k by (score desc, id asc) — the partial-aggregation
    * shape for distributed top-k-per-group: each map task reduces its
    * slice to ≤ k entries, so the shuffle moves k-element STATES (one
    * per group per partition), never the scored rows themselves. At
    * 100 TB that is the difference between shuffling ~|corpus|·|queries|
    * rows and shuffling |partitions|·|queries|·k.
    *
    * Selection is order-insensitive (ties broken by id), so the result
    * is identical at any partition count. IN = (score, id).
    */
  class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {
    private val ord: Ordering[(Double, Long)] = Ordering.by(t => (-t._1, t._2))
    def zero: List[(Double, Long)] = Nil
    def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
      if (b.lengthCompare(k) >= 0 && ord.gteq(a, b.last)) b // below the bar: O(1) reject
      else (a :: b).sorted(ord).take(k)
    def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
      (a ++ b).sorted(ord).take(k)
    def finish(r: List[(Double, Long)]): Seq[(Double, Long)] = r.sorted(ord)
    def bufferEncoder: Encoder[List[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Register SQL-callable forms on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("weighted_avg",
      org.apache.spark.sql.functions.udaf(WeightedAvg))
    spark.udf.register("bounded_concat3",
      org.apache.spark.sql.functions.udaf(new BoundedConcat(3, ",")))
  }
}
