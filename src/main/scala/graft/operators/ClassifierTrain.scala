package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine training for the hashed linear quality classifier
  * (completes the fastText-shape story: [[TextAnalysis.hashClassifierScore]]
  * APPLIES a weight table; this trains one) — batch logistic
  * regression by full-gradient descent, built so that the fitted
  * weights are DETERMINISTIC under any partitioning:
  *
  *  - features are the SAME md5 token buckets as the scorer
  *    (`pmod(md5-prefix, dim)`, binary per distinct bucket), so a
  *    trained model drops into the scoring dataflow unchanged;
  *  - each iteration is ONE distributed job: broadcast-free margin
  *    computation (the weight vector rides the plan as a literal
  *    array — dim+1 doubles, model-sized), per-row error/logloss in
  *    IEEE doubles (deterministic per row), then the gradient
  *    aggregation casts every per-row contribution to
  *    DECIMAL(38,18) BEFORE summing — exact, order-invariant sums
  *    (the codebase-wide aggregate-through-DECIMAL discipline), so
  *    the weight trajectory is bit-identical at any partition count;
  *  - driver state is the dim+1 weight vector and the loss
  *    trajectory — model-sized, like every other fit in the engine.
  *
  * Scale: the per-iteration cost is one scan + one vocab-bounded
  * shuffle (≤ dim+1 gradient cells); nothing corpus-sized ever
  * collects. At 100 TB the scan dominates and iterations are
  * embarrassingly data-parallel — the classic distributed-LR shape.
  */
object ClassifierTrain {

  final case class Fit(weights: Array[Double], bias: Double,
      losses: Seq[Double], n: Long)

  /** md5 token bucket — MUST match [[TextAnalysis.hashClassifierScore]]. */
  def tokenBucket(t: Column, dim: Int): Column =
    pmod(conv(substring(md5(t), 1, 8), 16, 10).cast("long"), lit(dim))

  /** Distinct feature buckets of a doc. */
  def docBuckets(text: Column, dim: Int): Column =
    array_distinct(transform(Dedup.tokens(text), t => tokenBucket(t, dim)))

  /** Fit logistic weights for `labelCol` (boolean/0-1) over hashed
    * text features. Returns the fitted weights, bias, and the exact
    * mean-logloss trajectory (losses.head = before any update). */
  def fit(docs: DataFrame, textCol: String, labelCol: String,
      dim: Int = 1024, iters: Int = 10, lr: Double = 0.5): Fit = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(dim >= 1 && iters >= 0, s"dim=$dim iters=$iters")
    val feats = docs
      .select(col(labelCol).cast("double").as("y"),
        docBuckets(col(textCol), dim).as("bs"))
      .filter(col("y").isNotNull)
      .cache()
    val n = feats.count()
    require(n > 0, "no labeled rows")
    var w = new Array[Double](dim)
    var bias = 0.0
    val losses = scala.collection.mutable.ArrayBuffer.empty[Double]
    val dec = "decimal(38,18)"
    for (it <- 0 to iters) {
      val wLit = lit(w)
      // margin = bias + Σ w(bucket); logistic p; error e = p − y.
      // element_at is 1-based; buckets are 0-based.
      val scored = feats.select(col("y"), col("bs"),
        (lit(bias) + coalesce(aggregate(col("bs"), lit(0.0d),
          (acc, b) => acc + element_at(wLit, (b + 1).cast("int"))), lit(0.0d)))
          .as("m"))
        .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("m"))))
        .withColumn("e", col("p") - col("y"))
        // per-row logloss, clamped away from log(0); cast to DECIMAL
        // so the sum is exact in any order
        .withColumn("ll",
          (-(col("y") * log(greatest(col("p"), lit(1e-12))) +
            (lit(1.0) - col("y")) * log(greatest(lit(1.0) - col("p"), lit(1e-12)))))
            .cast(dec))
      val lossRow = scored.agg(
        sum(col("ll")).as("sll"),
        sum(col("e").cast(dec)).as("se")).collect()(0)
      losses += lossRow.getDecimal(0).doubleValue() / n
      if (it < iters) {
        // bucket gradients: Σ e over docs containing the bucket —
        // DECIMAL-exact, vocab-bounded (≤ dim cells)
        val grads = scored
          .select(col("e").cast(dec).as("ed"), explode(col("bs")).as("b"))
          .groupBy(col("b")).agg(sum(col("ed")).as("g"))
          .as[(Long, java.math.BigDecimal)].collect()
        val biasGrad = lossRow.getDecimal(1).doubleValue() / n
        val w2 = w.clone()
        grads.foreach { case (b, g) =>
          w2(b.toInt) = w2(b.toInt) - lr * (g.doubleValue() / n) }
        w = w2
        bias = bias - lr * biasGrad
      }
    }
    feats.unpersist()
    Fit(w, bias, losses.toSeq, n)
  }

  /** Score a text column with a trained fit: P(label). */
  def score(text: Column, fit: Fit, dim: Int): Column = {
    val wLit = lit(fit.weights)
    val m = lit(fit.bias) + coalesce(aggregate(docBuckets(text, dim), lit(0.0d),
      (acc, b) => acc + element_at(wLit, (b + 1).cast("int"))), lit(0.0d))
    lit(1.0) / (lit(1.0) + exp(-m))
  }
}
