package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic-law checks over the engine (SURVEY §5.4). Pure-function
  * properties run under ScalaCheck in CosineProps; the DataFrame-level
  * laws here use the fixed sf0.001 corpus (deterministic by §5.3). */
class PropertySpec extends AnyFunSuite {
  import SharedSpark._

  test("filter conjunction is order-independent (pushdown invariance)") {
    val li = Tables(spark, sf0001, "lineitem")
    val a = li.filter(col("l_quantity") > 20).filter(col("l_discount") < 0.05).count()
    val b = li.filter(col("l_discount") < 0.05).filter(col("l_quantity") > 20).count()
    val c = li.filter(col("l_quantity") > 20 && col("l_discount") < 0.05).count()
    assert(a == b && b == c)
  }

  test("inner join is commutative on row count") {
    val o = Tables(spark, sf0001, "orders")
    val c = Tables(spark, sf0001, "customer")
    val ab = o.join(c, o("o_custkey") === c("c_custkey")).count()
    val ba = c.join(o, o("o_custkey") === c("c_custkey")).count()
    assert(ab == ba)
  }

  test("union-distinct is idempotent") {
    val k = Tables(spark, sf0001, "customer").select("c_custkey")
    assert(k.union(k).distinct().count() == k.distinct().count())
  }

  test("jaccard outputs are within [0, 1]") {
    val j = ops.TextSim.dedupNearJaccard(spark, sf0001)
    assert(j.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
  }

  test("PageRank top-30 mass is positive and bounded by total mass 1") {
    val topSum = ops.GraphOps.graphPagerank3(spark, sf0001)
      .agg(sum(col("pagerank"))).collect()(0).getDouble(0)
    assert(topSum > 0 && topSum <= 1.0 + 1e-6)
  }

  test("sessionization: session count bounded by event count per user") {
    val s = ops.StreamOps.streamSessionize(spark, sf0001)
    val ev = Tables(spark, sf0001, "events").groupBy("user_id").count()
    assert(s.join(ev, "user_id").filter(col("n_sessions") > col("count")).count() == 0)
  }

  test("simhash hamming distances are within [0, 32]") {
    val d = ops.Pipelines.dedupSimhash(spark, sf0001)
    assert(d.filter(col("hamming") < 0 || col("hamming") > 32).count() == 0)
  }
}
