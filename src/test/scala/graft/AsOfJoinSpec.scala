package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOf

/** The custom AsOfJoin logical operator: API path (eager lowering) and
  * extension path (analyzer rule injected via GraftExtensions) both
  * reproduce the oracle-checked join_asof result. */
class AsOfJoinSpec extends AnyFunSuite {
  import SharedSpark._

  private def purchases = Tables(spark, sf0001, "events")
    .filter(col("event_type") === "purchase")
    .select("event_id", "user_id", "ts")
  private def clicks = Tables(spark, sf0001, "events")
    .filter(col("event_type") === "click")
    .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("value").as("c_value"))

  test("asofJoin API equals the declared join_asof query") {
    val got = AsOf.asofJoin(purchases, clicks,
        "user_id", "c_user", "ts", "c_ts", payload = Seq("c_ts"))
      .select(col("event_id"), col("user_id"), col("c_ts").as("last_click_ts"))
    val want = ops.Relational.joinAsof(spark, sf0001)
    assert(got.count() == want.count())
    assert(got.exceptAll(want.select("event_id", "user_id", "last_click_ts")).count() == 0)
  }

  test("payload columns carry the latest-prior right row (max_by)") {
    val got = AsOf.asofJoin(purchases, clicks,
      "user_id", "c_user", "ts", "c_ts", payload = Seq("c_ts", "c_value"))
    // recompute via window: value of the latest prior click
    val j = purchases.join(clicks,
        col("c_user") === col("user_id") && col("c_ts") <= col("ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_id")).orderBy(col("c_ts").desc)
    val want = j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("event_id", "user_id", "ts", "c_ts", "c_value")
    assert(got.count() == want.count())
    assert(got.select("event_id", "c_ts", "c_value")
      .exceptAll(want.select("event_id", "c_ts", "c_value")).count() == 0)
  }

  test("NULL keys and NULL right timestamps never match (join contract)") {
    val s = spark
    import s.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val left = Seq(
      (1L, Option(10L), Option(ts(100))),  // normal: matches click at 50
      (2L, None: Option[Long], Option(ts(100))), // NULL key: must drop
      (3L, Option(30L), None: Option[java.sql.Timestamp]) // NULL leftTs: must drop
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Option(10L), Option(ts(50)), 1.0),
      (None: Option[Long], Option(ts(50)), 2.0),  // NULL key: never matches row 2
      (Option(30L), None: Option[java.sql.Timestamp], 3.0) // NULL ts: never matches row 3
    ).toDF("c_user", "c_ts", "c_value")
    val got = plans.AsOf.asofJoin(left, right,
      "user_id", "c_user", "ts", "c_ts", payload = Seq("c_ts", "c_value"))
      .collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getDouble(4) == 1.0)
  }

  test("GraftExtensions lowers the raw node through the analyzer") {
    val node = AsOf.node(purchases, clicks, "user_id", "c_user", "ts", "c_ts", Seq("c_ts"))
    // a session carrying the extension, sharing the context
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    try {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      val extSession = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val viaAnalyzer =
        org.apache.spark.sql.classic.GraftBridge.ofRows(extSession, node)
      assert(viaAnalyzer.count() == ops.Relational.joinAsof(spark, sf0001).count())
      // injected SQL function works too
      assert(extSession.sql("SELECT cosine_sim(array(1.0f), array(1.0f))")
        .collect()(0).getDouble(0) == 1.0)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
