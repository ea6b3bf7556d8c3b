package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.Literal.FalseLiteral
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StructType

/** Collapses the bignum carrier's null-guard scaffolding so kernel
  * chains become plain expression trees.
  *
  * Why this exists: a bignum column is built as
  * `CASE WHEN isnull(s) THEN null ELSE struct(sort_key(s), s) END`
  * ([[graft.functions.BigNum]] wrapCanon — the guard is what makes a
  * null bignum a null STRUCT, not a struct of nulls). Chained
  * arithmetic then extracts `__bn_s` from that CASE to feed the next
  * kernel, so an expression like `(bi)a * (bi)b * 1e15BI` nests a
  * conditional per level — and Spark's whole-stage-codegen common-
  * subexpression elimination SKIPS conditionally-evaluated branches,
  * so every field access and every downstream consumer (a pushed-down
  * filter, each aggregate input) re-evaluates the entire kernel chain.
  * Measured on q133 (600k rows, two casts + two multiplies + compare +
  * 3 aggregates): 7.2 s with the scaffolding, 2.3× less after this
  * rule lets CSE see the kernels unconditionally.
  *
  * Two rewrites, run to fixed point inside the operator-optimization
  * batch (injected via [[GraftExtensions]]):
  *
  * 1. `GetStructField(CaseWhen(...))` → `CaseWhen` over the extracted
  *    field (null-literal branches extract to typed null literals).
  *    Safe unconditionally: extracting from a null struct is null.
  *    The builtin SimplifyExtractValueOps then reduces the
  *    `GetStructField(CreateNamedStruct(...))` in each branch.
  * 2. `CASE WHEN isnull(s) THEN null ELSE e END` → `e` when `e` is
  *    null-propagating in `s` (e IS s, or a null-intolerant bignum
  *    kernel / field extraction over s) — the guard is redundant and
  *    only exists to blind CSE.
  */
object SimplifyBigNumCarriers extends Rule[LogicalPlan] {

  /** The carrier struct itself, or a struct with a carrier field (the
    * shape a FOREACH that keeps a bignum alongside other columns
    * produces). */
  private def carrierBearing(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case st: StructType =>
      BigNumCarrier.isCarrier(st) || st.fields.exists(f => BigNumCarrier.isCarrier(f.dataType))
    case _ => false
  }

  private def isNullLit(e: Expression): Boolean = e match {
    case Literal(null, _) => true
    case c: Cast => c.child match {
      case Literal(null, _) => true
      case _ => false
    }
    case _ => false
  }

  /** e evaluates to null whenever s is null. */
  private def nullPropagates(e: Expression, s: Expression): Boolean = e match {
    case x if x.semanticEquals(s) => true
    case BigNumSortKey(c) => c.semanticEquals(s)
    case BigNumNorm(c) => c.semanticEquals(s)
    case BigNumTrunc(c) => c.semanticEquals(s)
    case g: GetStructField => g.child.semanticEquals(s)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val p1 = plan.transformAllExpressions {
      // field extraction over the one-kernel carrier: back to the bare
      // canonical string / a direct sort-key kernel — the chain-collapse
      // that makes `str(bin(a, b))` feed the next kernel directly
      case GetStructField(BigNumWrap(s), ordinal, _) =>
        if (ordinal == 1) s else BigNumSortKey(s)
      // comparisons between two carriers reduce to their sort keys:
      // __bn_k is order-preserving AND injective on canonical strings,
      // so every BinaryComparison verdict is decided by the key alone —
      // the __bn_s side of each operand need never be evaluated
      case cmp: BinaryComparison
          if BigNumCarrier.isCarrier(cmp.left.dataType) &&
            BigNumCarrier.isCarrier(cmp.right.dataType) =>
        cmp.withNewChildren(Seq(
          GetStructField(cmp.left, 0, Some(BigNumCarrier.kField)),
          GetStructField(cmp.right, 0, Some(BigNumCarrier.kField))))
      // scoped to bignum carriers (or structs holding one): pushing the
      // extraction into every branch duplicates the CASE per extracted
      // field, which is a net LOSS for unrelated struct-typed CASEs
      // (codegen CSE skips conditional branches — the very premise of
      // this rule), so non-carrier plans are left untouched
      case gsf @ GetStructField(cw: CaseWhen, _, _)
          if carrierBearing(cw.dataType) =>
        def ext(e: Expression): Expression =
          if (isNullLit(e)) Literal(null, gsf.dataType)
          else GetStructField(e, gsf.ordinal, gsf.name)
        CaseWhen(cw.branches.map { case (c, v) => (c, ext(v)) },
          cw.elseValue.map(ext))
      case CaseWhen(Seq((IsNull(s), nl)), Some(e))
          if isNullLit(nl) && nullPropagates(e, s) =>
        e
    }
    // Filter-context: `CASE WHEN isnull(s) THEN false ELSE p END` ≡ p
    // when p is a null-intolerant predicate over s — SQL filters treat
    // a null predicate as not-pass, which is exactly the THEN branch
    p1.transform {
      case f @ logical.Filter(CaseWhen(Seq((IsNull(s), FalseLiteral)), Some(p)), child)
          if predNullPropagates(p, s) =>
        logical.Filter(p, child)
    }
  }

  /** p evaluates to null (or is unaffected) whenever s is null —
    * restricted to null-intolerant comparisons over s. */
  private def predNullPropagates(p: Expression, s: Expression): Boolean = p match {
    case cmp: BinaryComparison if !cmp.isInstanceOf[EqualNullSafe] =>
      nullPropagates(cmp.left, s) || nullPropagates(cmp.right, s) ||
        cmp.left.semanticEquals(s) || cmp.right.semanticEquals(s)
    case _ => false
  }
}
