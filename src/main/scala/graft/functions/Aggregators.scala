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
    * shape (consumes the group iterator, bounded state). Buffer carries
    * an unsorted list + tracked bar, same as [[TopKBuf]]. */
  final case class TopStrBuf(items: List[String], cnt: Int, bar: String, hasBar: Boolean)

  /** The n lexicographically-smallest strings, joined by `sep` — with
    * the SAME prune discipline as [[TopKByScore]]: O(1) append/reject
    * per row, sort only at 4n buffer fill (a per-row re-sort is exactly
    * the quadratic landmine the k=1000 soak surfaced there; the
    * "harmless at n=3" version was the same bug waiting for a bigger n).
    * Selection-based, so order- and partition-invariant (law-tested). */
  class BoundedConcat(n: Int, sep: String) extends Aggregator[String, TopStrBuf, String] {
    private val maxBuf = math.max(4 * n, 64)
    private def prune(items: List[String]): TopStrBuf = {
      val kept = items.sorted.take(n)
      TopStrBuf(kept, kept.length, kept.last, kept.length >= n)
    }
    def zero: TopStrBuf = TopStrBuf(Nil, 0, "", hasBar = false)
    def reduce(b: TopStrBuf, s: String): TopStrBuf =
      if (b.hasBar && s >= b.bar) b // provably outside the n smallest
      else if (b.cnt + 1 >= maxBuf) prune(s :: b.items)
      else TopStrBuf(s :: b.items, b.cnt + 1, b.bar, b.hasBar)
    def merge(a: TopStrBuf, b: TopStrBuf): TopStrBuf =
      if (a.cnt == 0) b else if (b.cnt == 0) a else prune(a.items ++ b.items)
    def finish(b: TopStrBuf): String = b.items.sorted.take(n).mkString(sep)
    def bufferEncoder: Encoder[TopStrBuf] = Encoders.product[TopStrBuf]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Buffer for [[TopKByScore]]: unsorted accumulation list with a
    * tracked count and the current "bar" (k-th best seen at the last
    * prune). Appends are O(1); the list is sorted only when it reaches
    * 4k elements (amortized O(log k) per row) — a per-row full re-sort
    * made k=1000 quadratic during buffer fill. */
  final case class TopKBuf(items: List[(Double, Long)], cnt: Int,
      barScore: Double, barId: Long, hasBar: Boolean)

  /** Bounded top-k by (score desc, id asc) — the partial-aggregation
    * shape for distributed top-k-per-group: each map task reduces its
    * slice to ≤ k entries (4k transiently), so the shuffle moves
    * k-element STATES (one per group per partition), never the scored
    * rows themselves. At 100 TB that is the difference between
    * shuffling ~|corpus|·|queries| rows and shuffling
    * |partitions|·|queries|·k.
    *
    * Selection is order-insensitive (ties broken by id): the bar only
    * rejects items provably outside the top k, and pruning keeps the k
    * best seen — the result is identical at any partition count and
    * any arrival order (law-tested in PropertyLawsSpec). IN = (score, id).
    */
  class TopKByScore(k: Int)
      extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {
    // score DESC with SQL sort semantics: NaN ranks ABOVE +Inf (what
    // Spark's window ORDER BY desc and DuckDB both do — a plain
    // Ordering.by(-score) would rank NaN last and silently drop a
    // zero-norm vector's NaN cosine from the top-k), -0.0 == 0.0
    // (ties break by id, not by sign bit), ties by id ASC.
    private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val sa = if (a._1 == 0.0) 0.0 else a._1
        val sb = if (b._1 == 0.0) 0.0 else b._1
        val aN = java.lang.Double.isNaN(sa)
        val bN = java.lang.Double.isNaN(sb)
        val c =
          if (aN && bN) 0
          else if (aN) -1
          else if (bN) 1
          else java.lang.Double.compare(sb, sa)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }
    private val maxBuf = math.max(4 * k, 64)

    private def prune(items: List[(Double, Long)]): TopKBuf = {
      val kept = items.sorted(ord).take(k)
      val bar = kept.last
      TopKBuf(kept, kept.length, bar._1, bar._2, hasBar = kept.length >= k)
    }

    def zero: TopKBuf = TopKBuf(Nil, 0, 0.0, 0L, hasBar = false)

    def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf =
      if (b.hasBar && ord.gteq(a, (b.barScore, b.barId))) b // outside top-k: O(1) reject
      else if (b.cnt + 1 >= maxBuf) prune(a :: b.items)
      else b.copy(items = a :: b.items, cnt = b.cnt + 1)

    def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      if (a.cnt == 0) b else if (b.cnt == 0) a
      else prune(a.items ++ b.items)

    def finish(r: TopKBuf): Seq[(Double, Long)] = r.items.sorted(ord).take(k)

    def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Buffer for [[ArgMinByScore]]: the single best (score, id) seen. */
  final case class ArgMinBuf(score: Double, id: Long, set: Boolean)

  /** Argmin by (score ASC, id ASC) — the k=1 selection used by centroid
    * assignment. Why a typed Aggregator and not `min(struct(...))`:
    * Min over a struct is a declarative aggregate with a non-mutable
    * buffer, which Spark can only plan as SortAggregate — a full SORT
    * of the corpus×k candidate stream. This shape runs as
    * ObjectHashAggregate with a 17-byte state per group and map-side
    * partial reduction, so the shuffle carries one state per (group,
    * partition), never the candidate rows.
    *
    * Ordering matches the literal-inlined `sort_array` path and DuckDB
    * struct min: NaN ranks GREATEST (a zero-norm vector's NaN cosine
    * loses to any real score), -0.0 == 0.0, ties by id ASC. */
  class ArgMinByScore extends Aggregator[(Double, Long), ArgMinBuf, Long] {
    private def lt(aScore: Double, aId: Long, bScore: Double, bId: Long): Boolean = {
      val sa = if (aScore == 0.0) 0.0 else aScore
      val sb = if (bScore == 0.0) 0.0 else bScore
      val aN = java.lang.Double.isNaN(sa)
      val bN = java.lang.Double.isNaN(sb)
      val c =
        if (aN && bN) 0
        else if (aN) 1
        else if (bN) -1
        else java.lang.Double.compare(sa, sb)
      if (c != 0) c < 0 else aId < bId
    }
    def zero: ArgMinBuf = ArgMinBuf(Double.NaN, Long.MaxValue, set = false)
    def reduce(b: ArgMinBuf, a: (Double, Long)): ArgMinBuf =
      if (!b.set || lt(a._1, a._2, b.score, b.id)) ArgMinBuf(a._1, a._2, set = true)
      else b
    def merge(x: ArgMinBuf, y: ArgMinBuf): ArgMinBuf =
      if (!x.set) y
      else if (!y.set) x
      else if (lt(y.score, y.id, x.score, x.id)) y else x
    def finish(b: ArgMinBuf): Long = b.id
    def bufferEncoder: Encoder[ArgMinBuf] = Encoders.product[ArgMinBuf]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Buffer for [[KMinValues]]: unsorted accumulation (may transiently
    * hold duplicates) + the unsigned bar from the last prune. */
  final case class KmvBuf(items: List[Long], cnt: Int, bar: Long, hasBar: Boolean)

  /** K-minimum-values sketch (Bar-Yossef et al. 2002): the k smallest
    * DISTINCT 64-bit hashes under UNSIGNED order. The state is the
    * mergeable summary behind distinct-count AND set-overlap estimation
    * — unlike HLL, two KMV sketches support a Jaccard estimate, which
    * is what cross-corpus contamination measurement needs.
    *
    * Same prune discipline as [[TopKByScore]]: O(1) bar-reject per row,
    * dedup+sort only at 4k buffer fill; selection-based, so the sketch
    * is identical at any partition count and arrival order. The merged
    * sketch of two streams equals the sketch of their union EXACTLY
    * (both are "k smallest distinct of the same multiset") — law-tested.
    */
  class KMinValues(k: Int) extends Aggregator[Long, KmvBuf, Seq[Long]] {
    require(k >= 1, "k must be positive")
    private val maxBuf = math.max(4 * k, 64)
    private def ult(a: Long, b: Long) = java.lang.Long.compareUnsigned(a, b) < 0
    private def prune(items: List[Long]): KmvBuf = {
      val kept = items.distinct.sortWith(ult).take(k)
      KmvBuf(kept, kept.length, kept.last, kept.length >= k)
    }
    def zero: KmvBuf = KmvBuf(Nil, 0, 0L, hasBar = false)
    def reduce(b: KmvBuf, h: Long): KmvBuf =
      if (b.hasBar && !ult(h, b.bar)) b // provably outside the k smallest
      else if (b.cnt + 1 >= maxBuf) prune(h :: b.items)
      else KmvBuf(h :: b.items, b.cnt + 1, b.bar, b.hasBar)
    def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
      if (a.cnt == 0) b else if (b.cnt == 0) a else prune(a.items ++ b.items)
    def finish(b: KmvBuf): Seq[Long] = b.items.distinct.sortWith(ult).take(k)
    def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Register SQL-callable forms on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.udf.register("weighted_avg",
      org.apache.spark.sql.functions.udaf(WeightedAvg))
    spark.udf.register("bounded_concat3",
      org.apache.spark.sql.functions.udaf(new BoundedConcat(3, ",")))
  }
}
