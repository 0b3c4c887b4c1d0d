package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite the ubiquitous window top-k idiom
  *
  * {{{
  *   SELECT p..., score, id, rnk FROM (
  *     SELECT *, row_number() OVER (
  *       PARTITION BY p... ORDER BY score DESC, id ASC) AS rnk FROM t)
  *   WHERE rnk <= k
  * }}}
  *
  * into the bounded [[TopKByAggregate]] (`graft_topk`) formulation. Spark's
  * own `InferWindowGroupLimit` (3.5+) already bounds the rank-limit shuffle
  * row count (a partial WindowGroupLimit before the exchange); what this
  * rewrite removes on top of that is the two full SORTS the window plan
  * still runs — one over every mapper's surviving rows before the shuffle
  * and one per reducer partition after it — plus the window's
  * whole-row buffering: the aggregate's O(k) insertion buffer keeps
  * (score, id) pairs only, never sorts a partition, and merges in the
  * partial-aggregation path. Users writing plain window SQL get the
  * bounded plan automatically when the [[GraftExtensions]] are registered.
  *
  * The rewrite fires only when it is provably semantics-preserving:
  *   - single window expression = `row_number()`, filtered `rnk <= lit`
  *     (or `rnk < lit`, or the mirrored literal-first forms);
  *   - order spec is exactly (score: double DESC, id: bigint ASC), both
  *     direct attributes — the (score desc, id asc) total order is what
  *     [[TopKBuffer]] implements (NaN greatest, -0.0 == 0.0, id tiebreak);
  *   - score and id are null-free: non-nullable, or guaranteed by the
  *     child's constraints (e.g. an explicit IS NOT NULL filter below) —
  *     the window would rank null scores after all non-null ones while the
  *     aggregate drops them, so nullable inputs without the guarantee are
  *     left alone;
  *   - partition keys are attributes and the window child outputs exactly
  *     {partition keys, score, id} — the aggregate carries nothing else, so
  *     any extra payload column disables the rewrite.
  *
  * Output attributes keep the original `ExprId`s (aliases pin them), so
  * parent operators are untouched. Registered via
  * `SparkSessionExtensions.injectOptimizerRule` — it joins the operator-
  * optimization fixed point, and is idempotent because the rewritten plan
  * no longer contains a Filter-over-Window.
  */
object TopKWindowRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) => rewrite(f, cond, w).getOrElse(f)
  }

  /** k such that `cond` ≡ `rank <= k`, if it is that shape. */
  private def rankLimit(cond: Expression, rank: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.exprId == rank => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.exprId == rank => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.exprId == rank => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: Attribute) if a.exprId == rank => Some(k - 1)
    case _ => None
  }

  private def nullFree(a: Attribute, child: LogicalPlan): Boolean =
    !a.nullable || child.constraints.exists(_.semanticEquals(IsNotNull(a)))

  private def rewrite(f: Filter, cond: Expression, w: Window): Option[LogicalPlan] = {
    // Spark's InferWindowGroupLimit may already have slid a WindowGroupLimit
    // under the Window (it runs in a later batch, but this rule re-enters
    // the fixed point). The limit node is redundant once the whole
    // Filter-over-Window collapses into the bounded aggregate — and keeping
    // it would re-introduce the per-partition sort the rewrite exists to
    // remove — so aggregate over its child instead.
    val base = w.child match {
      case wgl: WindowGroupLimit => wgl.child
      case c                     => c
    }
    w.windowExpressions match {
      case Seq(rankAlias @ Alias(WindowExpression(RowNumber(), _), _)) =>
        for {
          k <- rankLimit(cond, rankAlias.exprId)
          if k > 0
          scoreId <- w.orderSpec match {
            case Seq(SortOrder(s: Attribute, Descending, _, _),
                SortOrder(i: Attribute, Ascending, _, _))
                if s.dataType == DoubleType && i.dataType == LongType &&
                  nullFree(s, base) && nullFree(i, base) =>
              Some((s, i))
            case _ => None
          }
          pAttrs <- if (w.partitionSpec.forall(_.isInstanceOf[Attribute]))
            Some(w.partitionSpec.map(_.asInstanceOf[Attribute])) else None
          if base.outputSet == AttributeSet(pAttrs :+ scoreId._1 :+ scoreId._2)
        } yield {
          val (score, id) = scoreId
          val topAlias = Alias(
            TopKByAggregate(score, id, Literal(k)).toAggregateExpression(), "__graft_top")()
          val agg = Aggregate(pAttrs, pAttrs :+ topAlias, base)
          val posAttr = AttributeReference("pos", IntegerType, nullable = false)()
          val entryAttr = AttributeReference("col",
            StructType(Seq(
              StructField("score", DoubleType, nullable = false),
              StructField("id", LongType, nullable = false))),
            nullable = false)()
          val gen = Generate(PosExplode(topAlias.toAttribute),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(posAttr, entryAttr), agg)
          val projections: Seq[NamedExpression] = f.output.map { out =>
            if (out.exprId == score.exprId)
              Alias(GetStructField(entryAttr, 0, Some("score")), out.name)(exprId = out.exprId)
            else if (out.exprId == id.exprId)
              Alias(GetStructField(entryAttr, 1, Some("id")), out.name)(exprId = out.exprId)
            else if (out.exprId == rankAlias.exprId)
              Alias(Add(posAttr, Literal(1)), out.name)(exprId = out.exprId)
            else out
          }
          Project(projections, gen)
        }
      case _ => None
    }
  }
}
