package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, LongType}
import graft.sources.{MaterializedView, VersionedTable}
import graft.sources.MaterializedView.AggSpec
import java.nio.file.Files

/** Round-12 monitor wiring (VERDICT item 7): the §2.37 monitor folds
  * (CUSUM, Holt-Winters) read a DAY-GRAIN revenue MaterializedView
  * maintained incrementally from the versioned base's change feed —
  * so the daily monitor pass costs O(delta) end to end (the
  * IncrementalDedup discipline applied to time-series state). The
  * invariant: after every base version (append / update / delete),
  * the MV equals the full recompute AND the monitor folds fed from
  * the MV equal the folds fed from a full snapshot scan. */
class MonitorSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import SharedSpark.sf0001

  private def tmp(): String = Files.createTempDirectory("mon").toString

  test("day-grain revenue MV feeds the CUSUM and Holt folds at O(delta)") {
    val base = tmp() + "/daymetric"
    val view = tmp() + "/dayrev_mv"
    // the silver day-metric relation a monitor pipeline lands:
    // (okey key, dt, cents) — day grain + integer cents, ready to fold
    val silver = Tables(spark, sf0001, "orders").select(
      col("o_orderkey").as("okey"),
      col("o_orderdate").cast(DateType).as("dt"),
      (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType).as("cents"))
      .localCheckpoint(true)

    def fullDaily() = VersionedTable.read(spark, base)
      .groupBy(col("dt"))
      .agg(count(lit(1)).as("x"), sum(col("cents")).as("rev"))

    def assertMonitorPass(): Unit = {
      val mv = MaterializedView.read(spark, view)
      val full = fullDaily()
      // state equality: the folded MV is the full recompute
      assert(mv.select("dt", "x", "rev")
        .exceptAll(full.select("dt", "x", "rev")).count() == 0)
      assert(mv.count() == full.count())
      // monitor pass equality: both folds read the MV and match the
      // full-scan read, row for row
      val cusumMv = ops.TimeSeries.cusumTopFromDaily(mv.select("dt", "x"))
        .collect().toSeq
      val cusumFull = ops.TimeSeries.cusumTopFromDaily(full.select("dt", "x"))
        .collect().toSeq
      assert(cusumMv == cusumFull)
      val holtMv = ops.TimeSeries.holtWintersFromDaily(
        mv.select(col("dt"), col("rev").as("c"))).collect().toSeq
      val holtFull = ops.TimeSeries.holtWintersFromDaily(
        full.select(col("dt"), col("rev").as("c"))).collect().toSeq
      assert(holtMv == holtFull && holtMv.size == 7)
    }

    // v1: bootstrap with the first ~80% of days
    val cut = silver.selectExpr("percentile(unix_date(dt), 0.8)")
      .collect()(0).getDouble(0).toLong
    VersionedTable.create(spark, base,
      silver.filter(expr("unix_date(dt)") <= cut))
    MaterializedView.create(spark, view, base, Seq("dt"),
      Seq(AggSpec("count", "*", "x"), AggSpec("sum", "cents", "rev")),
      keys = Seq("okey"))
    assertMonitorPass()

    // v2: APPEND the remaining days (the nightly ingest) — the refresh
    // must fold only the appended files, never rescan the base
    VersionedTable.append(spark, base,
      silver.filter(expr("unix_date(dt)") > cut))
    val (_, _, m2) = MaterializedView.refresh(spark, view)
    assert(m2 == "incremental", s"append refresh mode was $m2")
    assertMonitorPass()

    // v3: UPDATE — a late correction rewrites some orders' amounts;
    // the keyed invertible view maintains from the change feed (O(delta))
    val corrections = VersionedTable.read(spark, base)
      .filter(col("okey") % 97 === 0)
      .select(col("okey"), col("dt"), (col("cents") + 500L).as("cents"))
    VersionedTable.merge(spark, base, corrections, Seq("okey"))
    val (_, _, m3) = MaterializedView.refresh(spark, view)
    assert(m3 == "delta", s"merge refresh mode was $m3")
    assertMonitorPass()

    // v4: DELETE — a GDPR-style purge of one key range; still O(delta)
    VersionedTable.deleteWhere(spark, base, "okey % 89 = 0")
    val (_, _, m4) = MaterializedView.refresh(spark, view)
    assert(m4 == "delta", s"delete refresh mode was $m4")
    assertMonitorPass()

    // round 13: the LIVE Holt-Winters monitor consumes the SAME MV day
    // grain — replay the maintained view through Streams.holtMonitor
    // and the final emission's 7 horizons must equal the batch fold of
    // the view (bit-exact: the monitor is an expression-tree
    // transliteration). This closes the O(delta) loop for the
    // forecasting monitor the way cusumMonitor closed it for CUSUM.
    {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val mvDays = MaterializedView.read(spark, view)
        .select(col("dt"), col("rev").as("c"))
        .orderBy("dt").as[(java.sql.Date, Long)].collect().toSeq
      val src = MemoryStream[(java.sql.Date, Long)]
      val q = graft.streaming.Streams.holtMonitor(src.toDF().toDF("dt", "c"))
        .writeStream.format("memory").queryName("t_holt_mv")
        .outputMode("append").start()
      val half = mvDays.size / 2
      Seq(mvDays.take(half), mvDays.drop(half)).foreach { chunk =>
        src.addData(chunk); q.processAllAvailable()
      }
      q.stop()
      val last = spark.table("t_holt_mv").collect()
        .maxBy(_.getDate(0).getTime).getSeq[Double](4).toSeq
      val batch = ops.TimeSeries.holtWintersFromDaily(
        MaterializedView.read(spark, view)
          .select(col("dt"), col("rev").as("c")))
        .orderBy("h").collect().map(_.getDouble(1)).toSeq
      assert(last == batch,
        "live Holt monitor drifted from the batch fold of the MV")
    }
  }
}
