package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.GlobalRank

/** Equivalence proof for the range-partitioned global ordering
  * (GlobalRank): every derived quantity must be bit-identical to the
  * single-partition `Window.orderBy` it replaces, on data generated to
  * exercise tie groups that straddle range-partition boundaries,
  * empty-ish partitions (numParts > distinct keys), and the N < k
  * ntile edge.
  */
class GlobalRankSpec extends AnyFunSuite {
  import SharedSpark._

  // 10k rows, value has heavy ties (500 distinct), id unique tiebreak
  private lazy val data = {
    import spark.implicits._
    spark.range(0, 10000)
      .select(col("id"),
        pmod(xxhash64(col("id")), lit(500)).as("v"))
      .persist()
  }

  test("ranked == row_number over a global window (heavy ties, 8 slices)") {
    val w = Window.orderBy(col("v"), col("id"))
    val expected = data.select(col("id"), row_number().over(w).cast("long").as("rn"))
    val (got, n) = GlobalRank.ranked(data, Seq(col("v"), col("id")), "rn", numParts = 8)
    assert(n == 10000L)
    assert(got.select(col("id"), col("rn")).exceptAll(expected).count() == 0)
    assert(expected.exceptAll(got.select(col("id"), col("rn"))).count() == 0)
  }

  test("ntileOf == ntile window for k=10 and k=4") {
    val w = Window.orderBy(col("v"), col("id"))
    for (k <- Seq(4, 10)) {
      val expected = data.select(col("id"), ntile(k).over(w).cast("long").as("b"))
      val (r, n) = GlobalRank.ranked(data, Seq(col("v"), col("id")), "rn", numParts = 8)
      val got = r.select(col("id"), GlobalRank.ntileOf(col("rn"), n, k).as("b"))
      assert(got.exceptAll(expected).count() == 0, s"k=$k")
      assert(expected.exceptAll(got).count() == 0, s"k=$k")
    }
  }

  test("ntileOf matches window ntile on every small N (N < k, N % k != 0)") {
    import spark.implicits._
    val w = Window.orderBy(col("id"))
    for (n <- Seq(1, 3, 7, 10, 11, 25)) {
      val small = spark.range(0, n).select(col("id"))
      val expected = small.select(col("id"), ntile(10).over(w).cast("long").as("b"))
      val (r, total) = GlobalRank.ranked(small, Seq(col("id")), "rn", numParts = 4)
      val got = r.select(col("id"), GlobalRank.ntileOf(col("rn"), total, 10).as("b"))
      assert(total == n)
      assert(got.exceptAll(expected).count() == 0, s"N=$n")
      assert(expected.exceptAll(got).count() == 0, s"N=$n")
    }
  }

  test("percentRankOf / cumeDistOf == window percent_rank / cume_dist (total order)") {
    val w = Window.orderBy(col("v"), col("id"))
    val expected = data.select(col("id"),
      percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
    val (r, n) = GlobalRank.ranked(data, Seq(col("v"), col("id")), "rn", numParts = 8)
    val got = r.select(col("id"),
      GlobalRank.percentRankOf(col("rn"), n).as("pr"),
      GlobalRank.cumeDistOf(col("rn"), n).as("cd"))
    // bit-identical doubles: exceptAll compares exact binary values
    assert(got.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(got).count() == 0)
  }

  test("withRunningSum == global window running sum (signed deltas, tie groups)") {
    // sweep-line shape: tied (t, kind) groups with same-sign deltas
    val points = data.select(
      pmod(col("v"), lit(50)).as("t"),
      pmod(col("id"), lit(2)).cast("int").as("kind"),
      when(pmod(col("id"), lit(2)) === 0, 1L).otherwise(-1L).as("delta"),
      col("id"))
    val w = Window.orderBy(col("t"), col("kind"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = points
      .select(col("id"), sum(col("delta")).over(w).cast("long").as("running"))
    val got = GlobalRank.withRunningSum(
      points, Seq(col("t"), col("kind"), col("id")), "delta", "running",
      numParts = 8).select(col("id"), col("running"))
    assert(got.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(got).count() == 0)
  }

  test("withRunningSums == two global window running sums (one shuffle)") {
    // the two-sample ECDF shape: per-key counts for two populations
    val points = data.select(col("v"), col("id"),
      when(pmod(col("id"), lit(2)) === 0, 1L).otherwise(0L).as("c1"),
      when(pmod(col("id"), lit(3)) === 0, 1L).otherwise(0L).as("c2"))
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = points.select(col("id"),
      sum(col("c1")).over(w).cast("long").as("cum1"),
      sum(col("c2")).over(w).cast("long").as("cum2"))
    val got = GlobalRank.withRunningSums(points,
      Seq(col("v"), col("id")), Seq("c1" -> "cum1", "c2" -> "cum2"),
      numParts = 8).select(col("id"), col("cum1"), col("cum2"))
    assert(got.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(got).count() == 0)
  }

  test("withRunningMaxExclusive == exclusive-prefix window max") {
    val points = data.select(col("v"), col("id"),
      pmod(xxhash64(col("id"), lit(7)), lit(1000)).as("x"))
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = points.select(col("id"),
      max(col("x")).over(w).cast("long").as("pm"))
    val got = GlobalRank.withRunningMaxExclusive(points,
      Seq(col("v"), col("id")), "x", "pm", numParts = 8)
      .select(col("id"), col("pm"))
    assert(got.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(got).count() == 0)
    // the first row in the global order must carry NULL (no predecessor)
    val firstId = points.orderBy(col("v"), col("id")).limit(1)
      .collect()(0).getAs[Long]("id")
    assert(got.filter(col("id") === firstId).collect()(0).isNullAt(1))
  }

  test("single-row and empty inputs") {
    import spark.implicits._
    val one = spark.range(0, 1).select(col("id"))
    val (r1, n1) = GlobalRank.ranked(one, Seq(col("id")), "rn", numParts = 4)
    assert(n1 == 1L)
    assert(r1.select("rn").collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(r1.select(GlobalRank.percentRankOf(col("rn"), n1)).collect()
      .head.getDouble(0) == 0.0)
    val empty = spark.range(0, 0).select(col("id"))
    val (r0, n0) = GlobalRank.ranked(empty, Seq(col("id")), "rn", numParts = 4)
    assert(n0 == 0L && r0.count() == 0)
  }
}
