package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  import SharedSpark._

  test("salted join equals plain equi-join (lineitem x part)") {
    val li = Tables(spark, sf0001, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey")
    val p = Tables(spark, sf0001, "part").select("p_partkey", "p_brand")
    val plain = li.join(p, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
    val salted = Skew.saltedJoin(li, p, "l_partkey", "p_partkey", salts = 8)
      .select("l_orderkey", "l_linenumber", "p_brand")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("salt values spread across the configured range") {
    val li = Tables(spark, sf0001, "lineitem")
    val distinctSalts = li.withColumn("s",
      pmod(xxhash64(li.columns.map(col).toSeq: _*), lit(8)).cast("int"))
      .select("s").distinct().collect().map(_.getInt(0)).toSet
    assert(distinctSalts.subsetOf((0 until 8).toSet) && distinctSalts.size > 4)
  }
}
