package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Arbitrary-precision decimal kernels for Pig's BIGINTEGER/BIGDECIMAL
  * types (SURVEY.md §1.1, §2.6 — the one documented precision cap left
  * after round 5: DecimalType tops out at 38 digits, Pig's types do
  * not). Values travel as canonical decimal strings (no exponent, no
  * trailing fraction zeros, "-0" → "0"); the engine wraps them in a
  * 2-field struct `{__bn_k, __bn_s}` where `__bn_k` is an
  * order-preserving byte-comparable encoding — so ORDER BY / MIN / MAX
  * / GROUP BY / JOIN on bignums ride Spark's native struct ordering
  * with zero custom comparator machinery (see
  * [[graft.functions.BigNum]]).
  *
  * Static-forwarder methods so generated Java calls
  * `graft.plans.BigNumOps.add(a, b)` directly — same discipline as
  * [[HashKernels]].
  */
object BigNumOps {
  import java.math.{MathContext, RoundingMode, BigDecimal => JBD, BigInteger => JBI}

  private def parse(s: UTF8String): JBD = new JBD(s.toString.trim)

  // ---- canonical-integer fast paths -------------------------------------
  //
  // Arithmetic operands are canonical by construction (every kernel
  // emits canonical form), and the overwhelmingly common bignum type is
  // Pig BIGINTEGER — plain digit strings. The BigDecimal slow path costs
  // a parse (String alloc + digit scan + BigInteger build) and a canon
  // (stripTrailingZeros + toPlainString) per call; for canonical
  // integers every one of those is computable directly from the bytes.
  // q133's per-row chain (2 casts + 2 multiplies + sort-key + filter +
  // sum input) ran ~8 BigDecimal round-trips per row before these.

  /** Digit count (sign excluded) when `s` is a canonical integer —
    * optional '-', all digits, no leading zero unless the single "0",
    * never "-0" — else -1. */
  def canonIntDigits(s: UTF8String): Int = {
    val n = s.numBytes
    if (n == 0) return -1
    val neg = s.getByte(0) == '-'
    val start = if (neg) 1 else 0
    val d = n - start
    if (d <= 0) return -1
    var i = start
    while (i < n) {
      val b = s.getByte(i)
      if (b < '0' || b > '9') return -1
      i += 1
    }
    if (s.getByte(start) == '0' && (d > 1 || neg)) return -1
    d
  }

  /** `s` is 10^k for some k ≥ 0 (canonical "1", "10", "100", …). */
  private def isPow10(s: UTF8String, digits: Int): Boolean = {
    if (s.numBytes != digits || s.getByte(0) != '1') return false
    var i = 1
    while (i < digits) { if (s.getByte(i) != '0') return false; i += 1 }
    true
  }

  /** Append `k` zeros (integer × 10^k); zero stays zero. */
  private def shift10(x: UTF8String, k: Int): UTF8String = {
    if (k == 0 || (x.numBytes == 1 && x.getByte(0) == '0')) return x
    val sb = new java.lang.StringBuilder(x.numBytes + k)
    sb.append(x.toString)
    var i = 0
    while (i < k) { sb.append('0'); i += 1 }
    UTF8String.fromString(sb.toString)
  }

  /** Parse a ≤18-digit canonical integer (caller guarantees shape). */
  private def toLongCanon(s: UTF8String): Long = {
    val w = new UTF8String.LongWrapper
    if (!s.toLong(w))
      throw new NumberFormatException(s"canonical int failed long parse: $s")
    w.value
  }

  private def utf(l: Long): UTF8String = UTF8String.fromString(java.lang.Long.toString(l))

  /** Canonical form: strip trailing fraction zeros, plain (non
    * -scientific) rendering. Java 17's stripTrailingZeros maps every
    * zero (0.00, -0, 0E-5) to plain 0. */
  private def canon(b: JBD): UTF8String =
    UTF8String.fromString(b.stripTrailingZeros.toPlainString)

  /** Cast entry points are LENIENT: unparseable input → null, matching
    * Pig's cast-failure-warns-and-nulls semantics — a malformed row in
    * a 100 TB scan must not kill the job. Arithmetic stays strict: its
    * operands are canonical by construction, so a parse failure there
    * is a bug worth surfacing. */
  def normalize(s: UTF8String): UTF8String =
    if (canonIntDigits(s) > 0) s // already canonical — passthrough
    else try canon(parse(s)) catch { case _: NumberFormatException => null }

  /** Truncate toward zero — Pig's (biginteger) cast semantics. */
  def trunc(s: UTF8String): UTF8String =
    if (canonIntDigits(s) > 0) s // integral → truncation is identity
    else try canon(parse(s).setScale(0, RoundingMode.DOWN))
    catch { case _: NumberFormatException => null }

  def add(a: UTF8String, b: UTF8String): UTF8String = {
    val da = canonIntDigits(a); val db = canonIntDigits(b)
    if (da > 0 && db > 0) {
      if (da <= 18 && db <= 18) // |x| < 1e18 each → sum fits a long
        return utf(toLongCanon(a) + toLongCanon(b))
      return UTF8String.fromString(
        new JBI(a.toString).add(new JBI(b.toString)).toString)
    }
    canon(parse(a).add(parse(b)))
  }
  def sub(a: UTF8String, b: UTF8String): UTF8String = {
    val da = canonIntDigits(a); val db = canonIntDigits(b)
    if (da > 0 && db > 0) {
      if (da <= 18 && db <= 18)
        return utf(toLongCanon(a) - toLongCanon(b))
      return UTF8String.fromString(
        new JBI(a.toString).subtract(new JBI(b.toString)).toString)
    }
    canon(parse(a).subtract(parse(b)))
  }
  def mul(a: UTF8String, b: UTF8String): UTF8String = {
    val da = canonIntDigits(a); val db = canonIntDigits(b)
    if (da > 0 && db > 0) {
      // ×10^k is a byte append — the "scale by 1e15" idiom costs a concat
      if (isPow10(a, da)) return shift10(b, da - 1)
      if (isPow10(b, db)) return shift10(a, db - 1)
      if (da + db <= 18) // |product| < 1e18 → fits a long
        return utf(toLongCanon(a) * toLongCanon(b))
      return UTF8String.fromString(
        new JBI(a.toString).multiply(new JBI(b.toString)).toString)
    }
    canon(parse(a).multiply(parse(b)))
  }

  /** Decimal division at DECIMAL128 (34 significant digits) — exact
    * whenever the quotient terminates within that precision. A script
    * needing Pig's truncating BIGINTEGER division writes
    * `(biginteger)(a/b)`, which applies [[trunc]] on top. Div-by-zero
    * raises ArithmeticException, consistent with the engine's ANSI
    * arithmetic elsewhere. */
  def div(a: UTF8String, b: UTF8String): UTF8String =
    canon(parse(a).divide(parse(b), MathContext.DECIMAL128))

  def mod(a: UTF8String, b: UTF8String): UTF8String =
    canon(parse(a).remainder(parse(b)))

  def neg(s: UTF8String): UTF8String = canon(parse(s).negate)

  def cmp(a: UTF8String, b: UTF8String): Int = {
    val da = canonIntDigits(a); val db = canonIntDigits(b)
    if (da > 0 && db > 0) {
      val negA = a.getByte(0) == '-'; val negB = b.getByte(0) == '-'
      // canonical zeros compare as magnitude-0 positives ("0" only)
      if (negA != negB) return if (negA) -1 else 1
      val mag = if (da != db) Integer.compare(da, db) else a.compareTo(b)
      return if (negA) -mag else mag
    }
    parse(a).compareTo(parse(b))
  }

  /** Order-preserving injective string encoding of a decimal:
    * unlimited precision, exponent bounded at ±5000 (beyond any data).
    *
    * Normalize to sign · 0.d₁…dₙ · 10^e (d₁ ≠ 0, no trailing zeros):
    *   zero      → "1"
    *   positive  → "2" + pad4(e + 5000) + digits
    *   negative  → "0" + pad4(4999 − e) + nines-complement(digits) + ":"
    *
    * Positive keys compare correctly without a terminator because
    * normalized mantissas have no trailing zeros (a proper prefix is
    * always the smaller value); negative keys need the ":" (sorts
    * above '9') to flip that prefix rule. */
  def sortKey(s: UTF8String): UTF8String = {
    // canonical-integer fast path: mantissa = digits minus trailing
    // zeros, exponent = digit count — straight from the bytes, no
    // BigDecimal round-trip (identical output to the slow path below;
    // BigNumSpec's fast-vs-slow law pins the equivalence)
    val dFast = canonIntDigits(s)
    if (dFast > 0 && dFast < 5000) {
      val neg = s.getByte(0) == '-'
      val start = if (neg) 1 else 0
      if (dFast == 1 && s.getByte(start) == '0')
        return UTF8String.fromString("1")
      var end = s.numBytes - 1
      while (s.getByte(end) == '0') end -= 1
      val sb = new java.lang.StringBuilder(6 + (end - start + 1) + 1)
      if (!neg) {
        sb.append('2')
        val e = dFast + 5000
        sb.append(('0' + e / 1000).toChar).append(('0' + e / 100 % 10).toChar)
          .append(('0' + e / 10 % 10).toChar).append(('0' + e % 10).toChar)
        var i = start
        while (i <= end) { sb.append(s.getByte(i).toChar); i += 1 }
      } else {
        sb.append('0')
        val e = 4999 - dFast
        sb.append(('0' + e / 1000).toChar).append(('0' + e / 100 % 10).toChar)
          .append(('0' + e / 10 % 10).toChar).append(('0' + e % 10).toChar)
        var i = start
        while (i <= end) { sb.append(('9' - s.getByte(i) + '0').toChar); i += 1 }
        sb.append(':')
      }
      return UTF8String.fromString(sb.toString)
    }
    val b = parse(s).stripTrailingZeros
    val sig = b.signum
    if (sig == 0) return UTF8String.fromString("1")
    val abs = b.abs
    val digits = abs.unscaledValue.toString
    val e = abs.precision - abs.scale // abs = 0.digits × 10^e
    if (e <= -5000 || e >= 5000)
      throw new ArithmeticException(s"bignum exponent $e out of sortable range (±5000)")
    val out =
      if (sig > 0) f"2${e + 5000}%04d$digits"
      else {
        val comp = digits.map(c => ('9' - c + '0').toChar)
        f"0${4999 - e}%04d$comp:"
      }
    UTF8String.fromString(out)
  }
}

/** Re-canonicalize any numeric rendered as a string (accepts exponent
  * notation, so `CAST(double AS STRING)` round-trips). */
case class BigNumNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bignum"
  // lenient cast: unparseable -> null even when the input is non-null
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    BigNumOps.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.plans.BigNumOps.normalize($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): BigNumNorm =
    copy(child = newChild)
}

/** Truncate-toward-zero — the (biginteger) cast. */
case class BigNumTrunc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bignum_trunc"
  // lenient cast: unparseable -> null even when the input is non-null
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    BigNumOps.trunc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.plans.BigNumOps.trunc($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): BigNumTrunc =
    copy(child = newChild)
}

/** The byte-comparable sort key (see [[BigNumOps.sortKey]]). */
case class BigNumSortKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "bignum_sort_key"
  override def nullSafeEval(input: Any): Any =
    BigNumOps.sortKey(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.plans.BigNumOps.sortKey($c)")
  override protected def withNewChildInternal(newChild: Expression): BigNumSortKey =
    copy(child = newChild)
}

/** Exact arbitrary-precision arithmetic over canonical strings. */
case class BigNumBin(op: String, left: Expression, right: Expression)
    extends BinaryExpression {
  require(BigNumBin.methods.contains(op), s"unknown bignum op '$op'")
  override def dataType: DataType = StringType
  override def prettyName: String = s"bignum_$op"
  private val method = BigNumBin.methods(op)
  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    op match {
      case "+" => BigNumOps.add(x, y)
      case "-" => BigNumOps.sub(x, y)
      case "*" => BigNumOps.mul(x, y)
      case "/" => BigNumOps.div(x, y)
      case "%" => BigNumOps.mod(x, y)
    }
  }
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.BigNumOps.$method($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BigNumBin =
    copy(left = newLeft, right = newRight)
}

object BigNumBin {
  val methods: Map[String, String] =
    Map("+" -> "add", "-" -> "sub", "*" -> "mul", "/" -> "div", "%" -> "mod")
}

/** The bignum carrier struct type — single source of truth
  * ([[graft.functions.BigNum]] forwards to these). */
object BigNumCarrier {
  val kField = "__bn_k"
  val sField = "__bn_s"
  val schema: StructType = StructType(Seq(
    StructField(kField, StringType), StructField(sField, StringType)))
  def isCarrier(dt: DataType): Boolean = dt match {
    case StructType(Array(StructField(`kField`, StringType, _, _),
                          StructField(`sField`, StringType, _, _))) => true
    case _ => false
  }
}

/** Canonical string → the full carrier struct {__bn_k, __bn_s} as ONE
  * null-intolerant kernel: the child is evaluated exactly once, and a
  * null input yields a null STRUCT (SQL null semantics for the bignum
  * value as a whole).
  *
  * This exists for performance, not expressiveness: the Column-level
  * formulation `CASE WHEN isnull(s) THEN null ELSE struct(sort_key(s),
  * s) END` evaluates `s` up to three times per row (condition + both
  * struct fields) because whole-stage-codegen common-subexpression
  * elimination skips conditionally-evaluated branches. Chained bignum
  * arithmetic squares that cost per nesting level. One expression,
  * one evaluation ([[SimplifyBigNumCarriers]] then folds field
  * extractions back to the bare child / [[BigNumSortKey]]). */
case class BigNumWrap(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BigNumCarrier.schema
  override def prettyName: String = "bignum_wrap"
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](BigNumOps.sortKey(s), s))
  }
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { graft.plans.BigNumOps.sortKey($c), $c });""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): BigNumWrap =
    copy(child = newChild)
}
