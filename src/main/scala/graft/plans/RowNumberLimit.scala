package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: route the declarative top-k-per-key pattern
  *
  *   df.withColumn("rn", row_number().over(partitionBy(keys).orderBy(ord)))
  *     .filter($"rn" <= k)
  *
  * to [[TopKPerKeyNode]] — the engine's two-phase operator (map-side
  * bounded heaps → shuffle of ≤ k·keys·tasks rows → streaming final rank)
  * — so a user who writes the window form gets the reduced-shuffle plan
  * without knowing the operator exists. This is the whole point of owning
  * a Rule[LogicalPlan]: the optimization applies to the DECLARED plan,
  * engine-wide, not to callers of a special API.
  *
  * Spark 4's own InferWindowGroupLimit serves the same pattern by
  * inserting a pre-shuffle WindowGroupLimit below the Window (the Window
  * itself, with its full per-partition sort, remains). This rewrite
  * replaces the Window entirely: the partial phase buffers at most k rows
  * per key under an injectable budget with a safe pass-through degrade,
  * and the final phase streams ranks over SortExec-sorted reduced rows —
  * no full-width partition sort survives anywhere in the plan. If
  * InferWindowGroupLimit ran first, its node is subsumed (stripped).
  *
  * Fires ONLY when the rewrite is exactly equivalent to the window form:
  *  - the Window computes a single row_number() (rank()/dense_rank() tie
  *    semantics differ — not rewritten);
  *  - partition and order specs are both non-empty;
  *  - some conjunct of the Filter bounds that row_number by an integer
  *    literal (`rn <= k`, `rn < k`, `rn = 1`, reversed comparisons);
  *    remaining conjuncts stay in a Filter above the rewritten node.
  * The rank attribute keeps the alias's name and exprId, so references
  * above the Filter resolve unchanged.
  */
object RowNumberLimitRule extends Rule[LogicalPlan] with PredicateHelper {

  /** k such that `e` ⇔ rank ≤ k, for the row_number attribute `rn`. */
  private def bound(e: Expression, rn: ExprId): Option[Int] = e match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
      if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k))
      if a.exprId == rn => Some(k - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1))
      if a.exprId == rn => Some(1)
    case EqualTo(IntegerLiteral(1), a: AttributeReference)
      if a.exprId == rn => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference)
      if a.exprId == rn => Some(k)
    case GreaterThan(IntegerLiteral(k), a: AttributeReference)
      if a.exprId == rn => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(parts, order,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)))
          , _)), _, _, wchild, _))
        if parts.nonEmpty && order.nonEmpty =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hit = conjuncts.iterator
        .map(c => (c, bound(c, alias.exprId))).collectFirst {
          case (c, Some(k)) if k >= 1 => (c, k)
        }
      hit match {
        case None => f
        case Some((used, k)) =>
          // a WindowGroupLimit inserted below the Window is subsumed by
          // the operator's own partial phase
          val child = wchild match {
            case wgl: WindowGroupLimit => wgl.child
            case c => c
          }
          val rankAttr = AttributeReference(alias.name, IntegerType,
            nullable = false)(exprId = alias.exprId)
          val node = TopKPerKeyNode(parts, order, k, child,
            rankAttr = rankAttr)
          val rest = conjuncts.filterNot(_ eq used)
          if (rest.isEmpty) node else Filter(rest.reduce(And), node)
      }
  }
}
