package graft.functions

import graft.plans.{BigNumBin, BigNumNorm, BigNumSortKey, BigNumTrunc}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.sql.{Column, Encoder, Encoders, GraftSqlBridge}

/** Arbitrary-precision numeric column type — Pig BIGINTEGER/BIGDECIMAL
  * beyond Spark's DecimalType(38) cap (SURVEY.md §1.1).
  *
  * A bignum column is a struct `{__bn_k: string, __bn_s: string}`:
  * `__bn_s` the canonical decimal string, `__bn_k` an injective
  * order-preserving key ([[graft.plans.BigNumOps.sortKey]]). Because
  * Spark orders structs field-by-field and `__bn_k` is primary,
  * `orderBy` / `min` / `max` / range comparisons on the struct ARE
  * numeric order, `groupBy`/`join`/`distinct` hash the canonical pair
  * — every relational operator works on bignums with no custom
  * comparator and full codegen/Tungsten support. The per-value cost is
  * one kernel call per op (object-free generated Java calling static
  * [[graft.plans.BigNumOps]] forwarders), the scale cost identical to
  * any string column: at 100 TB a bignum is just two short strings.
  */
object BigNum {

  val kField = "__bn_k"
  val sField = "__bn_s"
  val schema: StructType = StructType(Seq(
    StructField(kField, StringType), StructField(sField, StringType)))

  def isBig(dt: DataType): Boolean = dt match {
    case StructType(Array(StructField(`kField`, StringType, _, _),
                          StructField(`sField`, StringType, _, _))) => true
    case _ => false
  }

  private def expr(c: Column) = GraftSqlBridge.expression(c)
  private def colOf(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    GraftSqlBridge.column(e)

  /** Wrap a canonical-string column into the struct rep (null in →
    * null struct, not a struct of nulls) — one null-intolerant kernel
    * evaluating `s` exactly once (see [[graft.plans.BigNumWrap]]; the
    * CASE-WHEN formulation re-evaluated chained arithmetic per field
    * access because codegen CSE skips conditional branches). */
  private def wrapCanon(s: Column): Column =
    colOf(graft.plans.BigNumWrap(expr(s)))

  /** Any numeric/string column → bignum. Numerics go through their
    * string rendering (exact for integral and decimal types; a double
    * contributes its shortest round-trip decimal form). */
  def big(c: Column): Column =
    wrapCanon(colOf(BigNumNorm(expr(c.cast("string")))))

  /** Pig (biginteger): truncate toward zero. */
  def bigInteger(c: Column): Column =
    wrapCanon(colOf(BigNumTrunc(expr(c.cast("string")))))

  /** The canonical decimal string of a bignum (what STORE writes). */
  def str(c: Column): Column = c.getField(sField)

  private def bin(op: String)(a: Column, b: Column): Column =
    wrapCanon(colOf(BigNumBin(op, expr(str(a)), expr(str(b)))))

  def add(a: Column, b: Column): Column = bin("+")(a, b)
  def sub(a: Column, b: Column): Column = bin("-")(a, b)
  def mul(a: Column, b: Column): Column = bin("*")(a, b)
  def div(a: Column, b: Column): Column = bin("/")(a, b)
  def mod(a: Column, b: Column): Column = bin("%")(a, b)
  def neg(c: Column): Column = sub(big(lit(0)), c)

  /** Mutable sum buffer: a long-scaled fast lane for canonical ≤17-digit
    * integers (no BigDecimal allocation at all — most BIGINTEGER data)
    * plus an exact BigDecimal slow lane everything else lands in. `fast`
    * flushes into `slow` before it can overflow (|input| < 1e17, flush
    * bound Long.Max − 1e17), and on every merge. `seen` distinguishes
    * "no non-null input yet" (SUM → null, the Pig/SQL convention) from
    * an all-zero sum. Addition is exact in both lanes, so the result is
    * independent of partition count and reduction order; kryo only runs
    * at serialization boundaries (partial→final shuffle, spill). */
  final class SumBuf(
      var slow: java.math.BigDecimal, var fast: Long, var seen: Boolean)
      extends Serializable {
    def addStr(a: String): SumBuf = {
      val l = BigNum.fastLong17(a)
      if (l != Long.MinValue) {
        if (fast > SumBuf.FlushBound || fast < -SumBuf.FlushBound) flush()
        fast += l
      } else slow = SumBuf.addSlow(slow, new java.math.BigDecimal(a))
      seen = true
      this
    }
    def flush(): Unit =
      if (fast != 0L) {
        slow = SumBuf.addSlow(slow, java.math.BigDecimal.valueOf(fast))
        fast = 0L
      }
    def total: java.math.BigDecimal = {
      flush()
      if (!seen) null
      else if (slow == null) java.math.BigDecimal.ZERO
      else slow
    }
  }
  object SumBuf {
    val FlushBound: Long = Long.MaxValue - 200000000000000000L // 2e17 headroom
    def addSlow(b: java.math.BigDecimal, x: java.math.BigDecimal): java.math.BigDecimal =
      if (b == null) x else b.add(x)
  }

  /** Canonical ≤17-digit integer → its long, else Long.MinValue (a
    * 17-digit value can never be MinValue, so the sentinel is safe). */
  private[graft] def fastLong17(s: String): Long = {
    val n = s.length
    if (n == 0) return Long.MinValue
    val neg = s.charAt(0) == '-'
    val start = if (neg) 1 else 0
    val d = n - start
    if (d <= 0 || d > 17) return Long.MinValue
    var v = 0L
    var i = start
    while (i < n) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return Long.MinValue
      v = v * 10 + (c - '0')
      i += 1
    }
    if (s.charAt(start) == '0' && (d > 1 || neg)) return Long.MinValue
    if (neg) -v else v
  }

  /** Exact sum — Algebraic protocol over [[SumBuf]] (long fast lane +
    * BigDecimal slow lane; see SumBuf for the exactness argument).
    * Canonicalization (stripTrailingZeros, plain string) happens once
    * in finish. */
  object SumAgg extends Aggregator[String, SumBuf, String] {
    def zero: SumBuf = new SumBuf(null, 0L, false)
    def reduce(b: SumBuf, a: String): SumBuf =
      if (a == null) b else b.addStr(a)
    def merge(a: SumBuf, b: SumBuf): SumBuf = {
      b.flush()
      if (b.slow != null) a.slow = SumBuf.addSlow(a.slow, b.slow)
      a.seen ||= b.seen
      a
    }
    def finish(r: SumBuf): String = {
      val t = r.total
      if (t == null) null else t.stripTrailingZeros.toPlainString
    }
    def bufferEncoder: Encoder[SumBuf] = Encoders.kryo[SumBuf]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  /** Exact running sum + count — the [[SumBuf]] lanes plus a count;
    * finish divides at DECIMAL128. */
  object AvgAgg extends Aggregator[String, (SumBuf, Long), String] {
    def zero: (SumBuf, Long) = (new SumBuf(null, 0L, false), 0L)
    def reduce(b: (SumBuf, Long), a: String): (SumBuf, Long) =
      if (a == null) b else (b._1.addStr(a), b._2 + 1)
    def merge(a: (SumBuf, Long), b: (SumBuf, Long)): (SumBuf, Long) = {
      b._1.flush()
      if (b._1.slow != null) a._1.slow = SumBuf.addSlow(a._1.slow, b._1.slow)
      a._1.seen ||= b._1.seen
      (a._1, a._2 + b._2)
    }
    def finish(r: (SumBuf, Long)): String =
      if (r._2 == 0) null
      else r._1.total.divide(java.math.BigDecimal.valueOf(r._2),
        java.math.MathContext.DECIMAL128).stripTrailingZeros.toPlainString
    def bufferEncoder: Encoder[(SumBuf, Long)] = Encoders.kryo[(SumBuf, Long)]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  private lazy val sumUdaf = udaf(SumAgg)
  private lazy val avgUdaf = udaf(AvgAgg)

  /** Aggregates over a bignum column. SUM/AVG run the exact string
    * aggregators; MIN/MAX are Spark's native struct min/max (ordered
    * by `__bn_k`) — fully codegen'd, no UDAF. */
  def sumBig(c: Column): Column = wrapCanon(sumUdaf(str(c)))
  def avgBig(c: Column): Column = wrapCanon(avgUdaf(str(c)))
  def minBig(c: Column): Column = min(c)
  def maxBig(c: Column): Column = max(c)

  /** Does this type contain a bignum carrier anywhere (top level or
    * nested in a bag/tuple/map value)? */
  private def containsBig(dt: DataType): Boolean = dt match {
    case s: StructType => isBig(s) || s.fields.exists(f => containsBig(f.dataType))
    case org.apache.spark.sql.types.ArrayType(et, _) => containsBig(et)
    case org.apache.spark.sql.types.MapType(_, vt, _) => containsBig(vt)
    case _ => false
  }

  /** The schema after unwrapping: carrier struct → string, recursively. */
  private def unwrapType(dt: DataType): DataType = dt match {
    case s: StructType if isBig(s) => StringType
    case s: StructType =>
      StructType(s.fields.map(f => f.copy(dataType = unwrapType(f.dataType))))
    case a @ org.apache.spark.sql.types.ArrayType(et, _) =>
      a.copy(elementType = unwrapType(et))
    case m @ org.apache.spark.sql.types.MapType(_, vt, _) =>
      m.copy(valueType = unwrapType(vt))
    case other => other
  }

  private def unwrapCol(c: Column, dt: DataType): Column = dt match {
    case s: StructType if isBig(s) => c.getField(sField)
    case s: StructType if containsBig(s) =>
      val rebuilt = struct(s.fields.map(f =>
        unwrapCol(c.getField(f.name), f.dataType).as(f.name)).toSeq: _*)
      when(c.isNull, lit(null).cast(unwrapType(s))).otherwise(rebuilt)
    case org.apache.spark.sql.types.ArrayType(et, _) if containsBig(et) =>
      transform(c, x => unwrapCol(x, et))
    case org.apache.spark.sql.types.MapType(_, vt, _) if containsBig(vt) =>
      transform_values(c, (_, v) => unwrapCol(v, vt))
    case _ => c
  }

  /** Replace every bignum struct — top-level OR nested inside a
    * bag/tuple/map (e.g. STORE of a grouped relation whose bag carries
    * bignum fields) — with its canonical decimal string: what
    * STORE/DUMP emit (Pig renders BIGINTEGER/BIGDECIMAL as plain
    * decimal text). */
  def unwrapAll(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (!df.schema.fields.exists(f => containsBig(f.dataType))) df
    else df.select(df.schema.fields.map { f =>
      val c = df.col(s"`${f.name}`")
      if (containsBig(f.dataType)) unwrapCol(c, f.dataType).as(f.name) else c
    }.toSeq: _*)
}
