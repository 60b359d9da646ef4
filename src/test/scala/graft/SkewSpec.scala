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

  test("AQE splits a skewed sort-merge join partition at runtime (skew=true)") {
    // the OTHER skew lever the build brief names: no salting, AQE
    // detects the oversized post-shuffle partition and splits it.
    // Bench runs with AQE off (local KB-scale shuffles); this pins
    // that turning it on actually re-plans under skew — the runtime
    // defense a 1000-executor job relies on when a hot key appears in
    // data the planner never saw.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 90% of fact rows share key 0 -> one post-shuffle partition
      // dwarfs the rest; dim is uniform
      val fact = spark.range(0, 200000)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id") % 1000)
          .as("k"), col("id").as("payload"))
      val dim = spark.range(0, 1000)
        .select(col("id").as("dk"), concat(lit("d"), col("id")).as("dname"))
      val joined = fact.join(dim, col("k") === col("dk"))
      // materialize THIS dataset's own queryExecution (count() would
      // plan a separate aggregate query and leave this one unexecuted)
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${finalPlan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hot-targeted salted join equals plain equi-join on a 30%-hot key") {
    val li = Tables(spark, sf0001, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        // remap ~30% of rows onto one hot part key — the SkewBench
        // fixture shape
        when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(10)) < 3,
          lit(1L)).otherwise(col("l_partkey")).as("k"))
    val p = Tables(spark, sf0001, "part").select("p_partkey", "p_brand")
    val plain = li.join(p, col("k") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
    val hot = Skew.saltedJoinHot(li, p, "k", "p_partkey",
        salts = 8, hotFraction = 0.05)
      .select("l_orderkey", "l_linenumber", "p_brand")
    assert(hot.count() == plain.count())
    assert(hot.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(hot).count() == 0)
  }

  test("hot-targeted salted join degenerates to the plain join when nothing is hot") {
    val li = Tables(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val p = Tables(spark, sf0001, "part").select("p_partkey", "p_brand")
    // no part key carries >5% of sf0.001 lineitem rows
    val plain = li.join(p, col("l_partkey") === col("p_partkey"))
      .select("l_orderkey", "l_linenumber", "p_brand")
    val hot = Skew.saltedJoinHot(li, p, "l_partkey", "p_partkey",
        salts = 8, hotFraction = 0.05)
      .select("l_orderkey", "l_linenumber", "p_brand")
    assert(hot.count() == plain.count())
    assert(hot.exceptAll(plain).count() == 0)
  }
}
