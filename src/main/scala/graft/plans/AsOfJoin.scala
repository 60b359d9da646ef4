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
  * Payload columns are atomic — they all come from ONE right row (ties
  * on rightTs resolve arbitrarily but consistently across columns).
  * Duplicate left rows are preserved, one output row each.
  *
  * Spark has no *public* ASOF operator for the Scala API (catalyst
  * carries an internal logical.AsOfJoin reachable only from the pandas
  * layer); rather than a bespoke physical exec, `RewriteAsOfJoin`
  * LOWERS this node to built-in operators during analysis — the LINEAR
  * formulation:
  *
  *   UNION(left tagged isL=true, right tagged isL=false)
  *   WINDOW last(struct(payload), ignoreNulls)
  *          OVER (PARTITION BY key ORDER BY ts, isL
  *                ROWS UNBOUNDED PRECEDING..CURRENT)
  *   FILTER isL AND last IS NOT NULL; PROJECT left.* ++ struct fields
  *
  * One shuffle on the key, O(|left|+|right|) rows end-to-end. The
  * naive `JOIN ON key AND rightTs <= leftTs` + max_by materializes
  * (left × all-prior-right) per key — quadratic per hot key — which is
  * why the lowering does NOT use it. Right rows sort before left rows
  * at equal ts (boolean ascending) so the inclusive bound holds.
  * Catalyst keeps full visibility (pushdown through both sides, AQE)
  * — the payoff of lowering to relational algebra instead of
  * hand-writing an exec node. The declared `join_asof` oracle query
  * computes the identical result via the portable groupBy-max SQL, so
  * the operator inherits its cross-engine verification.
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

/** Lowers AsOfJoin to union + running-last window (runs in the
  * resolution batch injected by GraftExtensions). */
object RewriteAsOfJoin extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.expressions.aggregate.Last
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.types.{BooleanType, StructField, StructType}

  // note: catalyst has its own logical.AsOfJoin (pandas API) pulled in
  // by the wildcard import — qualify ours
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case a: graft.plans.AsOfJoin if a.childrenResolved =>
      val payloadAttrs = a.payload.map(_.asInstanceOf[NamedExpression])
      val payType = StructType(payloadAttrs.map(p =>
        StructField(p.name, p.dataType, nullable = true)))
      // NULL discipline, matching the join contract exactly: a NULL
      // key matches nothing (so NULL-key rows are dropped up front on
      // both sides — the window would otherwise group NULLs together),
      // and a NULL rightTs can never satisfy `rightTs <= leftTs` (so
      // those right rows are dropped too; a NULL leftTs left row keeps
      // flowing and is eliminated by the IS NOT NULL match filter,
      // because no right row can sort at-or-before it).
      // pad both sides to: left.* ++ [__pay struct, __key, __ts, __isL]
      val leftSide = Project(
        a.left.output ++ Seq(
          Alias(Literal(null, payType), "__pay")(),
          Alias(a.leftKey, "__key")(),
          Alias(a.leftTs, "__ts")(),
          Alias(Literal(true, BooleanType), "__isL")()),
        Filter(IsNotNull(a.leftKey), a.left))
      val rightSide = Project(
        a.left.output.map(o =>
          Alias(Literal(null, o.dataType), o.name)()) ++ Seq(
          Alias(CreateStruct(payloadAttrs), "__pay")(),
          Alias(a.rightKey, "__key")(),
          Alias(a.rightTs, "__ts")(),
          Alias(Literal(false, BooleanType), "__isL")()),
        Filter(And(IsNotNull(a.rightKey), IsNotNull(a.rightTs)), a.right))
      val union = Union(leftSide, rightSide)
      // union.output carries leftSide's exprIds (nullability merged)
      val n = a.left.output.size
      val leftAttrs = union.output.take(n)
      val Seq(payA, keyA, tsA, isLA) = union.output.drop(n)
      val frame =
        SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
      val order = Seq(SortOrder(tsA, Ascending), SortOrder(isLA, Ascending))
      val spec = WindowSpecDefinition(Seq(keyA), order, frame)
      val lastPay = Alias(
        WindowExpression(
          Last(payA, ignoreNulls = true).toAggregateExpression(), spec),
        "__last_pay")()
      val win = Window(Seq(lastPay), Seq(keyA), order, union)
      val matched = Filter(
        And(isLA, IsNotNull(lastPay.toAttribute)), win)
      val outPayload = payloadAttrs.zipWithIndex.map { case (p, i) =>
        Alias(
          GetStructField(lastPay.toAttribute, i, Some(p.name)),
          p.name)(exprId = p.exprId)
      }
      Project(leftAttrs ++ outPayload, matched)
  }
}
