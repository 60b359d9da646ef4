package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series reshaping (SURVEY §2.9 adjunct): regular-grid resample
  * with forward fill — the operator behind dashboards and feature
  * windows ("one row per entity per day, carrying the last observed
  * value"). Spark-first shape: the day grid is sequence()+explode over
  * the observed bounds (no driver loop), the fill is one
  * last(ignoreNulls) window per entity — a single shuffle on the
  * entity key, linear rows. The DuckDB oracle mirrors it with
  * generate_series + last_value IGNORE NULLS. */
object TimeSeries {

  /** Daily resample of per-user event values (users 0-4), forward-
    * filled across observation gaps; days before a user's first
    * observation stay null. Grid bounds are the corpus-wide min/max
    * event day, so both engines derive the identical frame. */
  val tsResampleGapfill: Q = (s, d) => {
    val ev = table(s, d, "events").filter(col("user_id") < 5)
    // last observation per (user, day) = value at the day's highest
    // event_id (unique, so the pick is total-ordered cross-engine).
    // null values are excluded BEFORE the pick — DuckDB's arg_max
    // ignores null args, and struct-max would otherwise return a null
    // value sitting at the max event_id
    val daily = ev
      .filter(col("value").isNotNull)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"),
        struct(col("event_id"), col("value")).as("obs"))
      .groupBy(col("user_id"), col("day"))
      .agg(max(col("obs")).as("o"))
      .select(col("user_id"), col("day"), col("o.value").as("v"))
    val bounds = table(s, d, "events")
      .agg(date_trunc("day", min(col("ts"))).as("d0"),
        date_trunc("day", max(col("ts"))).as("d1"))
    val days = bounds
      .select(explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY"))).as("day"))
    val users = ev.select(col("user_id")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    users.crossJoin(days)
      .join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("day"),
        round(col("filled").cast(DoubleType), 2).as("value_ff"),
        col("v").isNotNull.as("observed"))
      .orderBy("user_id", "day")
  }
}
