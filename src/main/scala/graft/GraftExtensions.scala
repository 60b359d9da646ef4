package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSimilarity
import graft.plans.RewriteAsOfJoin

/** Session-extension entry point: enable the whole graft surface in any
  * Spark deployment with
  *   spark.sql.extensions=graft.GraftExtensions
  * (or SparkSession.builder().withExtensions(new GraftExtensions)).
  *
  * Injects:
  *  - the `cosine_sim` codegen expression as a SQL function;
  *  - RewriteAsOfJoin, the resolution rule lowering graft.plans.AsOfJoin
  *    to join+aggregate relational algebra.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => RewriteAsOfJoin)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
  }
}
