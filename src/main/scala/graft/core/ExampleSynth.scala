package graft.core

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.types._

/** ILLUSTRATE example synthesis (SURVEY §2: the reference lineage's
  * `pen.ExampleGenerator` behavior): when the sample walk reaches an
  * alias whose Filter kills every sampled row, the user still deserves
  * to SEE what a surviving row would look like. This synthesizes one.
  *
  * Approach (deliberately solver-light, like the reference's
  * constraint-based generator): start from type defaults, assign
  * attribute values from the predicate's simple conjuncts
  * (`a = lit`, `a > lit`, `a IN (...)`, `startswith` ...), then VERIFY
  * the candidate by evaluating the full bound predicate with Catalyst —
  * so partial understanding can never fabricate a false example: if the
  * solved row does not actually satisfy the predicate, no example is
  * shown. A Filter's output schema equals its child's, so the
  * synthesized row is directly presentable as the alias's example.
  */
object ExampleSynth {

  /** Synthesize one row satisfying `df`'s root Filter, if the plan is
    * rooted at one and the predicate can be satisfied by the solver +
    * verifier. */
  def synthesize(df: DataFrame): Option[Row] = {
    df.queryExecution.analyzed match {
      case Filter(cond, child) =>
        val attrs = child.output
        candidates(cond, attrs).collectFirst {
          case values if evalTrue(cond, attrs, values) =>
            val converters = attrs.map(a =>
              CatalystTypeConverters.createToScalaConverter(a.dataType))
            new GenericRowWithSchema(
              values.zip(converters).map { case (v, c) => c(v) },
              StructType(attrs.map(a => StructField(a.name, a.dataType, a.nullable))))
        }
      case _ => None
    }
  }

  /** Candidate assignments (catalyst values, ordered as `attrs`): one
    * per OR alternative, each solving the AND-conjuncts it can. */
  private def candidates(cond: Expression, attrs: Seq[Attribute]): Seq[Array[Any]] =
    orBranches(cond).map { branch =>
      val values = attrs.map(a => defaultFor(a.dataType)).toArray[Any]
      conjuncts(branch).foreach(applyConjunct(_, attrs, values))
      values
    }

  private def orBranches(e: Expression): Seq[Expression] = e match {
    case Or(l, r) => orBranches(l) ++ orBranches(r)
    case other => Seq(other)
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Mutates `values` to satisfy one conjunct when it is a recognized
    * shape; unrecognized conjuncts are left to the verifier. */
  private def applyConjunct(c: Expression, attrs: Seq[Attribute], values: Array[Any]): Unit = {
    def idx(a: Attribute): Int = attrs.indexWhere(_.exprId == a.exprId)
    def set(a: Attribute, v: Any): Unit = { val i = idx(a); if (i >= 0) values(i) = v }
    // `col > 5.0` over an int col arrives as Cast(col) > lit: solve on
    // the underlying attribute with the literal cast back to its type
    def asAttrLit(l: Expression, r: Expression): Option[(Attribute, Any, DataType)] =
      (strip(l), r) match {
        case (Some(a), Literal(v, dt)) =>
          if (dt == a.dataType) Some((a, v, dt))
          else {
            val back = Cast(Literal(v, dt), a.dataType, Some("UTC")).eval(InternalRow.empty)
            if (back == null) None else Some((a, back, a.dataType))
          }
        case _ => None
      }
    c match {
      case EqualTo(l, r) =>
        asAttrLit(l, r).orElse(asAttrLit(r, l)).foreach { case (a, v, _) => set(a, v) }
      case EqualNullSafe(l, r) =>
        asAttrLit(l, r).orElse(asAttrLit(r, l)).foreach { case (a, v, _) => set(a, v) }
      case GreaterThan(l, r) =>
        asAttrLit(l, r).foreach { case (a, v, _) => set(a, step(v, a.dataType, +1)) }
        asAttrLit(r, l).foreach { case (a, v, _) => set(a, step(v, a.dataType, -1)) }
      case GreaterThanOrEqual(l, r) =>
        asAttrLit(l, r).orElse(asAttrLit(r, l)).foreach { case (a, v, _) => set(a, v) }
      case LessThan(l, r) =>
        asAttrLit(l, r).foreach { case (a, v, _) => set(a, step(v, a.dataType, -1)) }
        asAttrLit(r, l).foreach { case (a, v, _) => set(a, step(v, a.dataType, +1)) }
      case LessThanOrEqual(l, r) =>
        asAttrLit(l, r).orElse(asAttrLit(r, l)).foreach { case (a, v, _) => set(a, v) }
      case In(l, Literal(v, dt) +: _) =>
        strip(l).foreach { a =>
          if (dt == a.dataType) set(a, v)
        }
      case StartsWith(l, Literal(v, StringType)) => strip(l).foreach(set(_, v))
      case EndsWith(l, Literal(v, StringType)) => strip(l).foreach(set(_, v))
      case Contains(l, Literal(v, StringType)) => strip(l).foreach(set(_, v))
      case _ => () // IsNotNull holds on defaults; anything else → verifier
    }
  }

  /** Attribute under an optional Cast. */
  private def strip(e: Expression): Option[Attribute] = e match {
    case a: Attribute => Some(a)
    case Cast(a: Attribute, _, _, _) => Some(a)
    case _ => None
  }

  /** Smallest useful move for strict inequalities, per type (catalyst
    * values: strings are UTF8String, timestamps are micros). */
  private def step(v: Any, dt: DataType, dir: Int): Any = (v, dt) match {
    case (x: Int, _) => x + dir
    case (x: Long, _) => x + dir
    case (x: Short, _) => (x + dir).toShort
    case (x: Byte, _) => (x + dir).toByte
    case (x: Double, _) => x + dir
    case (x: Float, _) => x + dir
    case (x: Decimal, d: DecimalType) =>
      Decimal(x.toBigDecimal + BigDecimal(dir) / BigDecimal(10).pow(d.scale), d.precision, d.scale)
    case (s: org.apache.spark.unsafe.types.UTF8String, _) =>
      if (dir > 0) org.apache.spark.unsafe.types.UTF8String.concat(
        s, org.apache.spark.unsafe.types.UTF8String.fromString("a"))
      else if (s.numChars() > 0) s.substring(0, s.numChars() - 1)
      else s
    case _ => v
  }

  private def defaultFor(dt: DataType): Any = dt match {
    case IntegerType => 0
    case LongType => 0L
    case ShortType => 0.toShort
    case ByteType => 0.toByte
    case DoubleType => 0.0
    case FloatType => 0.0f
    case BooleanType => false
    case StringType => org.apache.spark.unsafe.types.UTF8String.fromString("example")
    case d: DecimalType => Decimal(0, d.precision, d.scale)
    case DateType => 0
    case TimestampType | TimestampNTZType => 0L
    case ArrayType(et, _) => org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[Any])
    case _: MapType => org.apache.spark.sql.catalyst.util.ArrayBasedMapData(Map.empty[Any, Any])
    case s: StructType => InternalRow.fromSeq(s.fields.map(f => defaultFor(f.dataType)))
    case _ => null
  }

  private def evalTrue(cond: Expression, attrs: Seq[Attribute], values: Array[Any]): Boolean =
    BindReferences.bindReference(cond, attrs)
      .eval(InternalRow.fromSeq(values)) == true
}
