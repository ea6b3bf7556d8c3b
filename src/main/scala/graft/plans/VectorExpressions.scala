package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over two
  * `array<double>` columns (SURVEY.md §7.3 "custom Catalyst only if
  * profiling demands"): the HOF formulation (`aggregate`/`zip_with`)
  * evaluates its lambdas interpreted, boxing every element; this is a
  * single codegen'd loop over the unsafe array data — the hot inner
  * kernel of brute-force similarity search.
  *
  * Bit-compatibility: accumulates dot, |a|² and |b|² left-to-right in
  * doubles and combines as dot / (sqrt(na) * sqrt(nb)) — the exact
  * floating-point evaluation order of [[graft.operators.Similarity.cosine]]
  * and of DuckDB's list_cosine_similarity on DOUBLE[], so results are
  * interchangeable with both.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double>; VectorExpressions.cosineSim
  // inserts the casts (no ExpectsInputTypes: AbstractDataType is
  // Scala-package-private in 4.1).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = $a.getDouble($i);
         |  double $y = $b.getDouble($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket, one native pass.
  *
  * Bit-compatible with the HOF formulation in
  * [[graft.operators.Similarity.rpLshBucketHof]]: plane components are
  * the same chained XXH64 Spark's `xxhash64(lit(p), i)` computes for
  * two int columns (seed 42), mapped to [-1, 1]; projections accumulate
  * left-to-right over the vector. The HOF version evaluates 12
  * interpreted lambda chains per row (zip_with + aggregate per plane) —
  * ~26 s per 1M rows at dim 16; this kernel precomputes the
  * (planes × dim) component table once per shape and does the pure
  * multiply-add loop (~1000× less per-row overhead).
  */
object RpLshKernels {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]()

  private def table(planes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val key = (seed, planes, dim)
    var t = cache.get(key)
    if (t == null) {
      t = Array.tabulate(planes, dim) { (p, i) =>
        XXH64.hashInt(i, XXH64.hashInt(p, seed)).toDouble / Long.MaxValue.toDouble
      }
      cache.putIfAbsent(key, t)
    }
    t
  }

  /** Seed 42 matches Spark's `xxhash64` default — the bit-compat
    * contract with [[graft.operators.Similarity.rpLshBucketHof]]. Other
    * seeds give INDEPENDENT plane sets (LSH OR-amplification bands). */
  def bucket(v: ArrayData, planes: Int, seed: Long): Long = {
    val dim = v.numElements()
    val t = table(planes, dim, seed)
    var res = 0L
    var p = 0
    while (p < planes) {
      val row = t(p)
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += v.getDouble(i) * row(i); i += 1 }
      if (acc >= 0) res |= 1L << p
      p += 1
    }
    res
  }
}

case class RpLshBucket(child: Expression, planes: Int, seed: Long = 42L)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "rp_lsh_bucket"

  override def nullSafeEval(input: Any): Any =
    RpLshKernels.bucket(input.asInstanceOf[ArrayData], planes, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.RpLshKernels.bucket($v, $planes, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): RpLshBucket =
    copy(child = newChild)
}

/** A driver-built candidate matrix shipped to executors inside the
  * TASK BINARY (`ctx.addReferenceObj`), not as a Catalyst literal and
  * not as a broadcast-join relation: no literal budget, no analyzer
  * churn on giant trees, and — unlike the crossJoin + partial-agg
  * shape — no per-(row × candidate) row materialization or shuffle.
  * The k-means|| init paid two sample-sized shuffles per round through
  * that shape (r8 soak: ~60% of the 1M×k1024 fit); against a set this
  * size (≤ a few thousand × dim doubles) a fused in-row scan is the
  * right plan. For corpus-scale candidate TABLES (millions of rows)
  * the join shapes in [[graft.operators.Similarity]] remain correct —
  * this class is for driver-sized sets only. */
final class CandMatrix(val vecs: Array[Array[Double]]) extends Serializable {
  require(vecs.nonEmpty, "empty candidate set")
}

object CandSetKernels {
  // Per-pair accumulation order matches CosineSim exactly (dot/na/nb
  // left-to-right, n = min(len)) so every score is bit-identical to
  // the crossJoin formulation these kernels replace.
  private def cos(v: ArrayData, c: Array[Double]): Double = {
    val n = java.lang.Math.min(v.numElements(), c.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = v.getDouble(i); val y = c(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  /** 1 − max cosine to any candidate; a NaN cosine (zero norm) counts
    * as −1 ("far") — `min over (1 − nanvl(cos, −1))` exactly. */
  def minCosDist(v: ArrayData, m: CandMatrix): Double = {
    val cs = m.vecs
    var best = Double.PositiveInfinity
    var j = 0
    while (j < cs.length) {
      var c = cos(v, cs(j))
      if (java.lang.Double.isNaN(c)) c = -1.0
      val d = 1.0 - c
      if (d < best) best = d
      j += 1
    }
    best
  }

  /** Index of the max-cosine candidate, ties and all-NaN resolving to
    * the LOWEST index — the `min(ns) → filter(ns = mn) → min(cid)`
    * two-pass argmin's semantics in one scan. */
  def cosArgMax(v: ArrayData, m: CandMatrix): Long = {
    val cs = m.vecs
    var bi = 0
    var bs = Double.NegativeInfinity
    var j = 0
    while (j < cs.length) {
      var c = cos(v, cs(j))
      if (java.lang.Double.isNaN(c)) c = Double.NegativeInfinity
      if (c > bs) { bs = c; bi = j }
      j += 1
    }
    bi.toLong
  }
}

/** Min spherical distance (1 − cos) from a vector column to a
  * driver-sized candidate set riding the plan as a reference object. */
case class MinCosDistToSet(child: Expression, cands: CandMatrix)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "min_cos_dist_to_set"
  override def nullSafeEval(input: Any): Any =
    CandSetKernels.minCosDist(input.asInstanceOf[ArrayData], cands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cands", cands, classOf[CandMatrix].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.CandSetKernels.minCosDist($v, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): MinCosDistToSet =
    copy(child = newChild)
}

/** Argmax-cosine candidate index (lowest index on ties) — the in-row
  * form of the broadcast-table argmin join. */
case class CosArgMaxToSet(child: Expression, cands: CandMatrix)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "cos_arg_max_to_set"
  override def nullSafeEval(input: Any): Any =
    CandSetKernels.cosArgMax(input.asInstanceOf[ArrayData], cands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cands", cands, classOf[CandMatrix].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.CandSetKernels.cosArgMax($v, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): CosArgMaxToSet =
    copy(child = newChild)
}

/** Driver-sized affine projection model riding the plan as a reference
  * object (the [[CandMatrix]] mechanics): out[r] = Σ_i (v[i] − mean[i])
  * · rows[r][i], accumulated left-to-right — the per-row kernel of PCA
  * projection / whitening. k×dim doubles ship once per task binary. */
final class AffineMatrix(val mean: Array[Double], val rows: Array[Array[Double]])
    extends Serializable {
  require(rows.forall(_.length == mean.length), "row/mean dim mismatch")
  override def hashCode(): Int =
    java.util.Arrays.hashCode(mean) * 31 +
      rows.map(java.util.Arrays.hashCode).toSeq.hashCode()
  override def equals(o: Any): Boolean = o match {
    case a: AffineMatrix =>
      java.util.Arrays.equals(mean, a.mean) && rows.length == a.rows.length &&
        rows.indices.forall(i => java.util.Arrays.equals(rows(i), a.rows(i)))
    case _ => false
  }
}

object AffineKernels {
  def project(v: ArrayData, m: AffineMatrix): ArrayData = {
    // refuse, don't fake: a wrong-length input must not silently become
    // a partial dot product (public Column API — callers may feed it
    // vectors the fit never saw)
    if (v.numElements() != m.mean.length)
      throw new IllegalArgumentException(
        s"affineProject: input vector has ${v.numElements()} elements, " +
          s"model expects ${m.mean.length}")
    val k = m.rows.length
    val out = new Array[Double](k)
    var r = 0
    while (r < k) {
      val row = m.rows(r)
      val n = row.length
      var acc = 0.0
      var i = 0
      while (i < n) { acc += (v.getDouble(i) - m.mean(i)) * row(i); i += 1 }
      out(r) = acc
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object MomentKernels {
  /** Flattened [v[0..d), upper-triangle products v[i]*v[j] (i ≤ j,
    * row-major)] — one codegen pass builds the whole moment
    * contribution of a row; the decimal casts and exact sums happen in
    * the (map-side combined) aggregation layer above. */
  def momentVector(v: ArrayData, dim: Int): ArrayData = {
    // the dim guard lives IN the kernel (not a separate count/min/max
    // pre-pass over the corpus): a wrong-length vector fails loudly
    // with row context, and the moments need only ONE corpus pass
    if (v.numElements() != dim)
      throw new IllegalArgumentException(
        s"moment_vector: vector size ${v.numElements()} != dim $dim " +
          "(null vectors arrive as size 0)")
    val out = new Array[Double](dim + dim * (dim + 1) / 2)
    var i = 0
    while (i < dim) { out(i) = v.getDouble(i); i += 1 }
    var k = dim
    i = 0
    while (i < dim) {
      val x = v.getDouble(i)
      var j = i
      while (j < dim) { out(k) = x * v.getDouble(j); k += 1; j += 1 }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Per-row moment contributions [means ++ upper-triangle products] as
  * one codegen'd array<double> — the row side of the exact
  * second-moments pass (a column-per-moment formulation plans 2 145
  * separate aggregates; this keeps the plan ONE generator + ONE
  * grouped sum). */
case class MomentVector(child: Expression, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "moment_vector"
  override def nullSafeEval(input: Any): Any =
    MomentKernels.momentVector(input.asInstanceOf[ArrayData], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.MomentKernels.momentVector($v, $dim);")
  override protected def withNewChildInternal(newChild: Expression): MomentVector =
    copy(child = newChild)
}

/** Centered matrix-vector projection against a driver-sized model. */
case class AffineProject(child: Expression, m: AffineMatrix)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "affine_project"
  override def nullSafeEval(input: Any): Any =
    AffineKernels.project(input.asInstanceOf[ArrayData], m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("affine", m, classOf[AffineMatrix].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.AffineKernels.project($v, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): AffineProject =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-level entry point; inputs are cast to array<double>. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSim(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))

  /** Min spherical distance to a driver-sized candidate set (see
    * [[CandMatrix]] for the shipping mechanics). */
  def minCosDistToSet(vec: Column, cands: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(MinCosDistToSet(
      GraftSqlBridge.expression(vec.cast("array<double>")),
      new CandMatrix(cands.map(_.toArray).toArray)))

  /** Argmax-cosine index into a driver-sized candidate set. */
  def cosArgMaxToSet(vec: Column, cands: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(CosArgMaxToSet(
      GraftSqlBridge.expression(vec.cast("array<double>")),
      new CandMatrix(cands.map(_.toArray).toArray)))

  /** Column-level entry point; input cast to array<double>. Distinct
    * `seed`s give independent plane sets (multi-band LSH). */
  def rpLshBucket(vec: Column, planes: Int, seed: Long = 42L): Column =
    GraftSqlBridge.column(RpLshBucket(
      GraftSqlBridge.expression(vec.cast("array<double>")), planes, seed))

  /** Per-row [means ++ upper-triangle products] moment contributions. */
  def momentVector(vec: Column, dim: Int): Column =
    GraftSqlBridge.column(MomentVector(
      GraftSqlBridge.expression(vec.cast("array<double>")), dim))

  /** Centered projection v ↦ M(v − μ) against a driver-sized model. */
  def affineProject(vec: Column, mean: Seq[Double], rows: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(AffineProject(
      GraftSqlBridge.expression(vec.cast("array<double>")),
      new AffineMatrix(mean.toArray, rows.map(_.toArray).toArray)))

  /** SQL registration: `SELECT cosine_sim(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs(0), exprs(1)), "built-in")
}
