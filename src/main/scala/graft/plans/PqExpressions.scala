package graft.plans

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Product-quantization (PQ) kernels (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — the
  * standard billion-scale ANN compression; SURVEY.md §7.1 similarity
  * extension). A vector is split into `m` contiguous subspaces of
  * `subDim` dims; each subspace has its own small codebook (≤ 256
  * centroids fitted by L2 Lloyd over a bounded sample), and a vector
  * compresses to `m` small code ids — at m=8 that is 8 bytes of
  * state per corpus vector instead of 64 × 8 bytes of doubles, the
  * difference between shuffling a 100 TB corpus and shuffling ~1 TB
  * of codes in the IVF cell co-location exchange.
  *
  * Query scoring is asymmetric-distance computation (ADC): the QUERY
  * stays exact; per query a lookup table `lut[sub][j] = dot(q_sub,
  * codebook[sub][j])` is built once (Σ nCodes_sub doubles, model-
  * sized), and each candidate scores as `Σ_sub lut[sub][code_sub]` —
  * `m` array reads per candidate, no per-dim work. With a LOSSLESS
  * codebook (every subvector present) each per-subspace dot is
  * BIT-exact; the cross-subspace total is a grouped sum, so at m=1
  * ADC reproduces `dot(q, x)` bit-for-bit and at m>1 it differs
  * from the sequential dot only by grouped-vs-sequential-summation
  * ulps — both properties the spec pins.
  *
  * All codebook state ships like [[CandMatrix]]: inside the task
  * binary via `ctx.addReferenceObj` — no literal budget, no
  * broadcast relation, driver-sized models only (m × nCodes ×
  * subDim doubles; 8 × 256 × 8 = 16k doubles at the defaults).
  * Codebooks may be RAGGED (a subspace with fewer distinct
  * subvectors than `nCodes` keeps what it has); `offsets` flattens
  * ragged codebooks into the single LUT array.
  *
  * Tie rule everywhere: lowest code index wins on equal distance —
  * the same deterministic two-pass-argmin convention as
  * [[CandSetKernels]], so encoding is partition- and
  * collect-order-invariant.
  */
final class PqCodebooks(val subDim: Int,
    val codes: Array[Array[Array[Double]]]) extends Serializable {
  require(codes.nonEmpty, "empty codebook set")
  require(codes.forall(_.nonEmpty), "a subspace has an empty codebook")
  val m: Int = codes.length
  /** LUT layout for ragged codebooks: subspace `s` occupies
    * `offsets(s) until offsets(s) + codes(s).length`. */
  val offsets: Array[Int] = codes.scanLeft(0)(_ + _.length).dropRight(1)
  val lutLen: Int = offsets.last + codes.last.length
}

object PqKernels {

  /** L2² argmin of `v[base, base+subDim)` over one subspace codebook;
    * missing tail dims read as 0.0 (shorter input vectors encode the
    * zero-padded prefix). Lowest index on ties. */
  private def subArgMin(v: ArrayData, base: Int,
      cb: Array[Array[Double]], subDim: Int): Int = {
    val n = v.numElements()
    var bi = 0
    var bd = Double.PositiveInfinity
    var j = 0
    while (j < cb.length) {
      val c = cb(j)
      var d = 0.0
      var i = 0
      while (i < subDim) {
        val x = if (base + i < n) v.getDouble(base + i) else 0.0
        val t = x - c(i)
        d += t * t
        i += 1
      }
      if (d < bd) { bd = d; bi = j }
      j += 1
    }
    bi
  }

  /** Encode a full vector to its `m` code ids. */
  def encode(v: ArrayData, cb: PqCodebooks): ArrayData = {
    val out = new Array[Int](cb.m)
    var s = 0
    while (s < cb.m) {
      out(s) = subArgMin(v, s * cb.subDim, cb.codes(s), cb.subDim)
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Training-time argmin within ONE subspace: the exploded
    * (subspace, subvector) training rows assign through this — one
    * distributed job per Lloyd iteration covers all m codebooks. */
  def subspaceArgMin(sub: Long, subvec: ArrayData, cb: PqCodebooks): Long =
    subArgMin(subvec, 0, cb.codes(sub.toInt), cb.subDim).toLong

  /** Per-query ADC lookup table: `lut[offsets(s) + j] =
    * dot(q[s·subDim, …), codebook(s)(j))`, dims accumulated
    * left-to-right (the bit-compat contract with [[CosineSim]]'s
    * numerator). */
  def lut(q: ArrayData, cb: PqCodebooks): ArrayData = {
    val out = new Array[Double](cb.lutLen)
    val n = q.numElements()
    var s = 0
    var o = 0
    while (s < cb.m) {
      val base = s * cb.subDim
      val sub = cb.codes(s)
      var j = 0
      while (j < sub.length) {
        val c = sub(j)
        var dot = 0.0
        var i = 0
        while (i < cb.subDim) {
          val x = if (base + i < n) q.getDouble(base + i) else 0.0
          dot += x * c(i)
          i += 1
        }
        out(o) = dot
        o += 1
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC score: Σ_sub lut[offsets(sub) + codes(sub)], subspaces
    * accumulated left-to-right. */
  def adc(codes: ArrayData, lut: ArrayData, cb: PqCodebooks): Double = {
    var acc = 0.0
    var s = 0
    while (s < cb.m) {
      acc += lut.getDouble(cb.offsets(s) + codes.getInt(s))
      s += 1
    }
    acc
  }

  /** ADC score straight from the QUERY VECTOR — bit-identical to
    * `adc(codes, lut(q))`: the per-subspace dot accumulates dims
    * left-to-right exactly like [[lut]], and subspaces accumulate
    * left-to-right exactly like [[adc]] (same FP ops, same order).
    * Exists because a row-join cannot share a LUT by reference: the
    * cell join copies the build-side row into EVERY joined output
    * row, so carrying the (m·nCodes)-double LUT costs nCodes/subDim
    * times the bytes of carrying the (m·subDim)-double query itself
    * (64× at the m16/c256/d64 defaults — measured as ~1 GB of
    * single-task row materialization in the q191 serve at sf0.1). */
  def adcFromQuery(codes: ArrayData, q: ArrayData, cb: PqCodebooks): Double = {
    val n = q.numElements()
    var acc = 0.0
    var s = 0
    while (s < cb.m) {
      val base = s * cb.subDim
      val c = cb.codes(s)(codes.getInt(s))
      var dot = 0.0
      var i = 0
      while (i < cb.subDim) {
        val x = if (base + i < n) q.getDouble(base + i) else 0.0
        dot += x * c(i)
        i += 1
      }
      acc += dot
      s += 1
    }
    acc
  }

  /** Top-`n` argmax-cosine candidate INDICES (score desc, index asc on
    * ties; NaN cosines sort last) — the multi-probe generalization of
    * [[CandSetKernels.cosArgMax]]: IVF query routing needs the nProbe
    * nearest cells, and doing it in-kernel removes the literal-budget
    * cap the literal `topCells` array carries. Selection is an
    * insertion pass over an n-sized buffer (n ≪ candidates). */
  def topCosArgMax(v: ArrayData, m: CandMatrix, n: Int): ArrayData = {
    val cs = m.vecs
    val keep = java.lang.Math.min(n, cs.length)
    val bs = new Array[Double](keep)
    val bi = new Array[Int](keep)
    var filled = 0
    var j = 0
    while (j < cs.length) {
      val c0 = cosRaw(v, cs(j))
      val c = if (java.lang.Double.isNaN(c0)) Double.NegativeInfinity else c0
      // find insertion point: stable (score strictly greater wins;
      // equal scores keep the earlier = lower index first)
      var p = filled
      while (p > 0 && bs(p - 1) < c) p -= 1
      if (p < keep) {
        val last = java.lang.Math.min(filled, keep - 1)
        var q = last
        while (q > p) { bs(q) = bs(q - 1); bi(q) = bi(q - 1); q -= 1 }
        bs(p) = c
        bi(p) = j
        if (filled < keep) filled += 1
      }
      j += 1
    }
    val out = new Array[Long](filled)
    var i = 0
    while (i < filled) { out(i) = bi(i).toLong; i += 1 }
    new GenericArrayData(out)
  }

  // CosineSim's exact accumulation order (dot/na/nb left-to-right).
  private def cosRaw(v: ArrayData, c: Array[Double]): Double = {
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
}

/** `array<double>` → `array<int>` of `m` PQ code ids. */
case class PqEncode(child: Expression, cb: PqCodebooks)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  override def nullSafeEval(input: Any): Any =
    PqKernels.encode(input.asInstanceOf[ArrayData], cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cb", cb, classOf[PqCodebooks].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.PqKernels.encode($v, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Query-side ADC lookup table (`array<double>` of `lutLen`). */
case class PqLut(child: Expression, cb: PqCodebooks)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"
  override def nullSafeEval(input: Any): Any =
    PqKernels.lut(input.asInstanceOf[ArrayData], cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cb", cb, classOf[PqCodebooks].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.PqKernels.lut($v, $ref);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** ADC score of a code array against a query LUT. */
case class PqAdc(left: Expression, right: Expression, cb: PqCodebooks)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqKernels.adc(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cb", cb, classOf[PqCodebooks].getName)
    nullSafeCodeGen(ctx, ev, (c, l) =>
      s"${ev.value} = graft.plans.PqKernels.adc($c, $l, $ref);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** ADC score of a code array against the query vector itself —
  * bit-identical to `PqAdc(codes, PqLut(q))` without materializing
  * the LUT per joined row (see [[PqKernels.adcFromQuery]]). */
case class PqAdcQuery(left: Expression, right: Expression, cb: PqCodebooks)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_query"
  override def nullSafeEval(codes: Any, q: Any): Any =
    PqKernels.adcFromQuery(codes.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData], cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cb", cb, classOf[PqCodebooks].getName)
    nullSafeCodeGen(ctx, ev, (c, q) =>
      s"${ev.value} = graft.plans.PqKernels.adcFromQuery($c, $q, $ref);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcQuery =
    copy(left = newLeft, right = newRight)
}

/** Training-time per-subspace argmin: (subspace idx, subvector) →
  * code id. */
case class PqSubspaceArgMin(left: Expression, right: Expression, cb: PqCodebooks)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "pq_subspace_argmin"
  override def nullSafeEval(sub: Any, vec: Any): Any =
    PqKernels.subspaceArgMin(sub.asInstanceOf[Long], vec.asInstanceOf[ArrayData], cb)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cb", cb, classOf[PqCodebooks].getName)
    nullSafeCodeGen(ctx, ev, (s, v) =>
      s"${ev.value} = graft.plans.PqKernels.subspaceArgMin($s, $v, $ref);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqSubspaceArgMin =
    copy(left = newLeft, right = newRight)
}

/** Top-`n` argmax-cosine indices into a [[CandMatrix]] —
  * `array<long>`, score desc / index asc. */
case class TopCosArgMaxToSet(child: Expression, cands: CandMatrix, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"n=$n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "top_cos_arg_max_to_set"
  override def nullSafeEval(input: Any): Any =
    PqKernels.topCosArgMax(input.asInstanceOf[ArrayData], cands, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cands", cands, classOf[CandMatrix].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.plans.PqKernels.topCosArgMax($v, $ref, $n);")
  }
  override protected def withNewChildInternal(newChild: Expression): TopCosArgMaxToSet =
    copy(child = newChild)
}

object PqExpressions {
  def pqEncode(vec: Column, cb: PqCodebooks): Column =
    GraftSqlBridge.column(PqEncode(
      GraftSqlBridge.expression(vec.cast("array<double>")), cb))

  def pqLut(vec: Column, cb: PqCodebooks): Column =
    GraftSqlBridge.column(PqLut(
      GraftSqlBridge.expression(vec.cast("array<double>")), cb))

  def pqAdc(codes: Column, lut: Column, cb: PqCodebooks): Column =
    GraftSqlBridge.column(PqAdc(
      GraftSqlBridge.expression(codes),
      GraftSqlBridge.expression(lut), cb))

  def pqAdcQuery(codes: Column, qvec: Column, cb: PqCodebooks): Column =
    GraftSqlBridge.column(PqAdcQuery(
      GraftSqlBridge.expression(codes),
      GraftSqlBridge.expression(qvec.cast("array<double>")), cb))

  def pqSubspaceArgMin(sub: Column, subvec: Column, cb: PqCodebooks): Column =
    GraftSqlBridge.column(PqSubspaceArgMin(
      GraftSqlBridge.expression(sub.cast("long")),
      GraftSqlBridge.expression(subvec.cast("array<double>")), cb))

  def topCosArgMaxToSet(vec: Column, cands: Seq[Seq[Double]], n: Int): Column =
    GraftSqlBridge.column(TopCosArgMaxToSet(
      GraftSqlBridge.expression(vec.cast("array<double>")),
      new CandMatrix(cands.map(_.toArray).toArray), n))
}
