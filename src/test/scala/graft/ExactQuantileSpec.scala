package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ExactQuantile

/** Bit-equality proof for the two-pass bucketed exact quantile: every
  * value ExactQuantile returns must equal Spark's own `percentile()`
  * aggregate TO THE BIT (java.lang.Double.doubleToLongBits), because
  * the four re-shaped fact-grain queries floor-quantize these numbers
  * — a 1-ulp drift across an integer boundary would flip a hash-pinned
  * cell. Exercised on real sf0.001 orders (grouped + ungrouped, the
  * exact percentile sets the queries use), on synthetic data with
  * heavy ties and negative values, and on knife-edge percentiles
  * (0, 1, and ranks straddling bucket boundaries).
  */
class ExactQuantileSpec extends AnyFunSuite {
  import SharedSpark._

  private def bits(d: Double): Long = java.lang.Double.doubleToLongBits(d)

  private def sparkPercentile(df: org.apache.spark.sql.DataFrame,
      valueSql: String, groupCol: Option[String], ps: Seq[Double])
      : Map[String, Map[Double, Double]] = {
    val aggs = ps.zipWithIndex.map { case (p, i) =>
      expr(s"percentile($valueSql, ${p}D)").as(s"q$i")
    }
    val rows = groupCol match {
      case Some(g) => df.groupBy(col(g).cast("string").as("g"))
        .agg(aggs.head, aggs.tail: _*).collect()
      case None => df.agg(aggs.head, aggs.tail: _*)
        .withColumn("g", lit("")).select(col("g") +: ps.indices.map(i => col(s"q$i")): _*)
        .collect()
    }
    rows.map { r =>
      val g = groupCol.map(_ => r.getString(0)).getOrElse(r.getString(0))
      g -> ps.zipWithIndex.map { case (p, i) => p -> r.getDouble(i + 1) }.toMap
    }.toMap
  }

  test("orders grouped by status: the aggMedianQuantile/aggIqrOutliers sets, bit-exact") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val ps = Seq(0.25, 0.5, 0.75, 0.90)
    val want = sparkPercentile(o, "o_totalprice", Some("o_orderstatus"), ps)
    val got = ExactQuantile.quantiles(o, col("o_totalprice"),
      Some(col("o_orderstatus")), ps, bucketWidth = 64.0)
    assert(got.keySet == want.keySet)
    for (g <- want.keySet; p <- ps)
      assert(bits(got(g)._2(p)) == bits(want(g)(p)),
        s"group=$g p=$p got=${got(g)._2(p)} want=${want(g)(p)}")
    // n matches the group row count (no nulls in this column)
    val counts = o.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (g <- want.keySet) assert(got(g)._1 == counts(g))
  }

  test("orders ungrouped: the winsorized/trimmed sets incl. decimal-cast value, bit-exact") {
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
    val ps = Seq(0.05, 0.10, 0.90, 0.95)
    val vSql = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)"
    val want = sparkPercentile(o, vSql, None, ps)("")
    val got = ExactQuantile.quantiles(o,
      col("o_totalprice").cast("decimal(18,2)").cast("double"),
      None, ps, bucketWidth = 64.0)("")
    for (p <- ps) assert(bits(got._2(p)) == bits(want(p)), s"p=$p")
  }

  test("heavy ties, negatives, edge percentiles, tiny buckets") {
    import spark.implicits._
    // 5k rows, 40 distinct values spanning negatives; width 0.5 forces
    // many single-value buckets AND values exactly on bucket edges
    val df = spark.range(0, 5000)
      .select((pmod(col("id") * 7919, lit(40)) - 20).cast("double").as("v"),
        pmod(col("id"), lit(3)).cast("string").as("g"))
    val ps = Seq(0.0, 0.001, 0.25, 0.5, 0.75, 0.999, 1.0)
    val want = sparkPercentile(df, "v", Some("g"), ps)
    val got = ExactQuantile.quantiles(df, col("v"), Some(col("g")), ps, 0.5)
    for (g <- want.keySet; p <- ps)
      assert(bits(got(g)._2(p)) == bits(want(g)(p)), s"g=$g p=$p")
  }

  test("continuous doubles (no ties): interpolation path, bit-exact") {
    import spark.implicits._
    val df = spark.range(1, 2001)
      .select((sin(col("id").cast("double")) * 1000.0).as("v"))
    val ps = Seq(0.05, 0.1, 0.25, 0.5, 0.9, 0.95)
    val want = sparkPercentile(df, "v", None, ps)("")
    val got = ExactQuantile.quantiles(df, col("v"), None, ps, 64.0)("")
    for (p <- ps) assert(bits(got._2(p)) == bits(want(p)), s"p=$p")
  }

  test("valueAtRanks: lower median rank equals the SQL cum-count rule") {
    import spark.implicits._
    // heavy ties so the rank->value walk crosses duplicate runs
    val df = spark.range(0, 3001)
      .select(pmod(col("id") * 31, lit(97)).cast("double").as("v"),
        pmod(col("id"), lit(2)).cast("string").as("g"))
    val got = graft.ops.ExactQuantile.valueAtRanks(df, col("v"),
      Some(col("g")), n => Seq((n - 1) / 2), 8.0)
    // oracle rule: smallest v whose cumulative count satisfies
    // 2*cum >= n + (n % 2) — the agg_mood_median_test convention
    val rows = df.collect().map(r => (r.getString(1), r.getDouble(0)))
    for ((g, (n, at)) <- got) {
      val vs = rows.filter(_._1 == g).map(_._2).sorted
      assert(n == vs.length)
      val want = vs((n.toInt - 1) / 2)
      assert(bits(at((n - 1) / 2)) == bits(want), s"g=$g")
    }
  }

  test("nulls ignored like percentile()") {
    import spark.implicits._
    val df = spark.range(0, 100)
      .select(when(col("id") % 4 === 0, lit(null))
        .otherwise(col("id").cast("double")).as("v"))
    val want = sparkPercentile(df, "v", None, Seq(0.5))("")
    val got = ExactQuantile.quantiles(df, col("v"), None, Seq(0.5), 8.0)("")
    assert(got._1 == 75L)
    assert(bits(got._2(0.5)) == bits(want(0.5)))
  }
}
