package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** AS-OF join as a first-class logical operator (build-brief tier (c):
  * custom `LogicalPlan` + `Rule`, registered through
  * `SparkSessionExtensions` — see graft.GraftExtensions).
  *
  * Semantics: for each left row, attach the single right row with the
  * same key and the greatest `rightTs <= leftTs` (latest-prior match);
  * left rows with no prior right row are dropped (inner as-of).
  *
  * Spark has no *public* ASOF operator for the Scala API (catalyst
  * carries an internal logical.AsOfJoin reachable only from the pandas
  * layer); rather than a bespoke physical exec, `RewriteAsOfJoin`
  * LOWERS this node to built-in operators during analysis:
  *
  *   left JOIN right ON key AND rightTs <= leftTs
  *        (equi-prefix hash join + residual range filter — never a
  *         nested loop; skew on hot keys is AQE-splittable)
  *   GROUP BY left.* -> max_by(right.*, rightTs)
  *
  * so Catalyst keeps full visibility (pushdown through both sides,
  * broadcast/SMJ choice, AQE) — the payoff of lowering to relational
  * algebra instead of hand-writing an exec node. The declared
  * `join_asof` oracle query uses the identical formulation, so the
  * operator inherits its cross-engine verification.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Expression])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.asInstanceOf[Attribute])

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Lowers AsOfJoin to join + aggregate (runs in the resolution batch
  * injected by GraftExtensions). */
object RewriteAsOfJoin extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.dsl.plans._
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.expressions.aggregate.MaxBy
  import org.apache.spark.sql.catalyst.plans.Inner
  import org.apache.spark.sql.catalyst.plans.logical._

  // note: catalyst has its own logical.AsOfJoin (pandas API) pulled in
  // by the wildcard import — qualify ours
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case a: graft.plans.AsOfJoin if a.childrenResolved =>
      val cond = And(
        EqualTo(a.leftKey, a.rightKey),
        LessThanOrEqual(a.rightTs, a.leftTs))
      val joined = Join(a.left, a.right, Inner, Some(cond), JoinHint.NONE)
      val aggs = a.payload.map { p =>
        Alias(
          MaxBy(p, a.rightTs).toAggregateExpression(),
          p.asInstanceOf[NamedExpression].name)(
          exprId = p.asInstanceOf[NamedExpression].exprId)
      }
      Aggregate(a.left.output, a.left.output ++ aggs, joined)
  }
}
