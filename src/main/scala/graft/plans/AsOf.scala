package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** User-facing as-of join API over the AsOfJoin logical operator.
  * Lowers eagerly through RewriteAsOfJoin so it works on any session;
  * sessions with graft.GraftExtensions can also embed the raw node and
  * let the injected analyzer rule lower it (tested both ways).
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payload: Seq[String]): DataFrame =
    org.apache.spark.sql.classic.GraftBridge.ofRows(
      left.sparkSession, RewriteAsOfJoin(node(left, right, leftKey, rightKey, leftTs, rightTs, payload)))

  /** The raw logical node (for extension-lowering tests / advanced use). */
  def node(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      payload: Seq[String]): AsOfJoin = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String, side: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"no column '$n' on $side side; available: ${p.output.map(_.name).mkString(", ")}"))
    AsOfJoin(lp, rp,
      attr(lp, leftKey, "left"), attr(rp, rightKey, "right"),
      attr(lp, leftTs, "left"), attr(rp, rightTs, "right"),
      payload.map(attr(rp, _, "right")))
  }
}
