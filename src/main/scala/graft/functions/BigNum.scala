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
    * null struct, not a struct of nulls). */
  private def wrapCanon(s: Column): Column = {
    val keyed = struct(
      colOf(BigNumSortKey(expr(s))).as(kField), s.as(sField))
    when(s.isNull, lit(null).cast(schema)).otherwise(keyed)
  }

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

  /** Exact sum — Algebraic protocol (partial strings merge
    * associatively; result independent of partition count). The empty
    * buffer "" means "no non-null input yet": SUM of an all-null (or
    * empty) group is null, the Pig/SQL convention — not 0. */
  object SumAgg extends Aggregator[String, String, String] {
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

  final case class AvgBuf(sum: String, n: Long)

  /** Exact running sum + count; finish divides at DECIMAL128. */
  object AvgAgg extends Aggregator[String, AvgBuf, String] {
    private def jbd(s: String) = new java.math.BigDecimal(s)
    def zero: AvgBuf = AvgBuf("0", 0L)
    def reduce(b: AvgBuf, a: String): AvgBuf =
      if (a == null) b
      else AvgBuf(jbd(b.sum).add(jbd(a)).stripTrailingZeros.toPlainString, b.n + 1)
    def merge(a: AvgBuf, b: AvgBuf): AvgBuf =
      AvgBuf(jbd(a.sum).add(jbd(b.sum)).stripTrailingZeros.toPlainString, a.n + b.n)
    def finish(r: AvgBuf): String =
      if (r.n == 0) null
      else jbd(r.sum).divide(java.math.BigDecimal.valueOf(r.n),
        java.math.MathContext.DECIMAL128).stripTrailingZeros.toPlainString
    def bufferEncoder: Encoder[AvgBuf] = Encoders.product[AvgBuf]
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
