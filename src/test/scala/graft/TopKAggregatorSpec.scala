package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKAggregator

/** The bounded-buffer top-k aggregate equals the window row_number
  * formulation — but shuffles k rows per group instead of all rows. */
class TopKAggregatorSpec extends AnyFunSuite {
  import SharedSpark._

  test("typed top-k aggregator equals window row_number top-k") {
    val spark0 = spark
    import spark0.implicits._
    val orders = Tables(spark, sf0001, "orders")

    val topk = new TopKAggregator(3).toColumn
    val viaAgg = orders
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(topk.name("top"))
      .flatMap { case (status, top) =>
        top.zipWithIndex.map { case ((price, key), i) =>
          (status, i + 1, key, price)
        }
      }
      .toDF("o_orderstatus", "rn", "o_orderkey", "o_totalprice")

    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .select(col("o_orderstatus"), col("o_totalprice"), col("o_orderkey"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .select("o_orderstatus", "rn", "o_orderkey", "o_totalprice")

    assert(viaAgg.count() == viaWindow.count())
    assert(viaAgg.exceptAll(viaWindow).count() == 0)
  }
}
