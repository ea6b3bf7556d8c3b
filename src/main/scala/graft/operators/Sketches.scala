package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** KMV set sketches for cross-corpus overlap estimation (SURVEY.md §7.1
  * extension surface; Bar-Yossef et al. 2002, Beyer et al. SIGMOD 2007).
  *
  * The training-pipeline use: "how much of benchmark B leaked into
  * corpus A?" at 100 TB means comparing n-gram SETS of two corpora.
  * Exact set intersection is a full-shuffle join of both distinct
  * shingle sets; the KMV sketch reduces each corpus to k longs — ONE
  * combiner-friendly aggregation per corpus, k-element states on the
  * shuffle — and then any number of pairwise overlap estimates are
  * driver-side arithmetic on 2·k values. 20 corpora = 20 sketches =
  * 190 overlap estimates for free, where the exact path would be 190
  * distributed joins.
  *
  * Determinism: the sketch is a selection (k smallest distinct
  * xxhash64 values, unsigned order) — identical at any partition count;
  * merge(sketch(A), sketch(B)) == sketch(A ∪ B) exactly. Estimates are
  * therefore reproducible numbers, not distributions, and their
  * measured error on a fixed corpus can be pinned as a contract.
  */
object Sketches {

  /** One KMV sketch per group over the (already hashed) element column.
    * Output: (groupCol, sketch ARRAY<BIGINT> ascending unsigned). */
  def kmvPerGroup(df: DataFrame, groupCol: String, elemHashCol: String,
      k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(String, Long)] =
      df.select(col(groupCol).cast("string"), col(elemHashCol).cast("long"))
        .as[(String, Long)]
    ds.groupByKey(_._1).mapValues(_._2)
      .agg(new graft.functions.Aggregators.KMinValues(k).toColumn.name("sketch"))
      .toDF(groupCol, "sketch")
  }

  private def unsignedFraction(h: Long): Double =
    (BigDecimal(BigInt(java.lang.Long.toUnsignedString(h))) /
      BigDecimal(BigInt(1) << 64)).toDouble

  /** Distinct-count estimate from a sketch: exact when the set had
    * < k distinct elements (the sketch IS the set), else the k-th
    * order-statistic estimator (k-1)/u_k. */
  def distinctEstimate(sketch: Seq[Long], k: Int): Double =
    if (sketch.size < k) sketch.size.toDouble
    else (k - 1).toDouble / unsignedFraction(sketch.last)

  /** Exact monoid merge: k smallest distinct of the union of sketches —
    * equals the sketch of the concatenated streams. */
  def mergeSketches(a: Seq[Long], b: Seq[Long], k: Int): Seq[Long] =
    (a ++ b).distinct
      .sortWith((x, y) => java.lang.Long.compareUnsigned(x, y) < 0).take(k)

  /** Jaccard estimate: among the k smallest of A ∪ B (an unbiased
    * sample of the union), count how many are in both sketches.
    * Error ~ 1/sqrt(k). */
  def jaccardEstimate(a: Seq[Long], b: Seq[Long], k: Int): Double = {
    val m = mergeSketches(a, b, k)
    if (m.isEmpty) 0.0
    else {
      val sa = a.toSet; val sb = b.toSet
      m.count(h => sa(h) && sb(h)).toDouble / m.size
    }
  }

  /** Intersection-size estimate: Ĵ · D̂(A ∪ B). */
  def intersectionEstimate(a: Seq[Long], b: Seq[Long], k: Int): Double =
    jaccardEstimate(a, b, k) * distinctEstimate(mergeSketches(a, b, k), k)
}
