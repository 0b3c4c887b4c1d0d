package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute,
  AttributeMap, AttributeSet, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Restores predicate pushdown around [[EvalOnceExpression]] barriers.
  *
  * The barrier's one honest lie — declaring itself non-deterministic so
  * no rule duplicates its child — has a collateral cost: Spark's
  * `PushPredicateThroughNonJoin` refuses to push ANY predicate through a
  * Project containing ANY non-deterministic field (SPARK-13473's
  * ordering-safety guard, still in 4.1). So `.where(col("lang") === "en")`
  * above a pinned quality-scoring projection would stop reaching the
  * parquet scan, losing data-source filter pushdown and partition
  * pruning for a conjunct that has nothing to do with the pinned kernel.
  *
  * This rule reopens exactly the safe half: a barrier is SEMANTICALLY
  * deterministic (it forwards eval/codegen to a deterministic child —
  * the declaration exists only to stop inlining), so reordering a
  * deterministic conjunct below the projection cannot change its value
  * or the kernel's. Conjuncts are split the way the stock rule would
  * have: parts referencing only pass-through attributes (or outputs of
  * genuinely deterministic aliases, substituted like `replaceAlias`)
  * push below the Project; parts referencing a barrier output stay
  * above it. Projects whose non-determinism is NOT all barrier-rooted
  * (a real rand()) are left strictly alone.
  */
object PushThroughEvalOnce extends Rule[LogicalPlan] with PredicateHelper {

  /** The expression with every barrier unwrapped — deterministic iff the
    * non-determinism was all the barrier's declaration. */
  private def stripBarriers(e: Expression): Expression =
    e.transform { case EvalOnceExpression(c) => c }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, p @ Project(fields, child))
        if fields.exists(!_.deterministic) &&
          fields.forall(fld => stripBarriers(fld).deterministic) =>
      val aliasMap = AttributeMap(fields.collect {
        case a @ Alias(e, _) if e.deterministic => (a.toAttribute, e)
      })
      val pushable = AttributeSet(fields.collect {
        case a: Attribute => a
        case a @ Alias(e, _) if e.deterministic => a.toAttribute
      })
      val (push, stay) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references.subsetOf(pushable))
      if (push.isEmpty) f
      else {
        val substituted = push.map(_.transform {
          case a: Attribute => aliasMap.getOrElse(a, a)
        })
        val projected = p.copy(child = Filter(substituted.reduce(And), child))
        stay.reduceOption(And).map(Filter(_, projected)).getOrElse(projected)
      }
  }
}
