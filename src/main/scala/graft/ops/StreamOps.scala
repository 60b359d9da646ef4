package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Streaming semantics on batch (SURVEY.md §2.9). Each query is the
  * deterministic batch twin of a Structured Streaming operator:
  * tumbling ≡ window(ts, "1 hour"), sliding ≡ window(ts, "1 hour",
  * "30 minutes"), sessionize ≡ session_window(ts, "30 minutes").
  * The true readStream variants live in graft.streaming and are
  * asserted batch-equivalent in the test suite.
  */
object StreamOps {

  val streamTumbling1h: Q = (s, d) =>
    table(s, d, "events")
      .groupBy(date_trunc("hour", col("ts")).as("w_start"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum2(col("value")).as("v_sum"))
      .orderBy("w_start", "event_type")

  /** Sliding 1h/30m via epoch arithmetic: each event explodes into its
    * two containing windows — the shuffle-free window-assignment shape
    * Structured Streaming uses internally. */
  val streamSliding1h30m: Q = (s, d) =>
    table(s, d, "events")
      .select(col("ts"), col("value"), explode(array(lit(0L), lit(1800L))).as("off"))
      .select(
        timestamp_seconds(
          floor((unix_timestamp(col("ts")) - col("off")) / 3600) * 3600 + col("off"))
          .as("w_start"),
        col("value"))
      .groupBy(col("w_start"))
      .agg(count(lit(1)).as("n"), moneySum2(col("value")).as("v_sum"))
      .orderBy("w_start")

  /** 30-min-gap sessionization: lag + cumulative-sum gap-and-island. */
  val streamSessionize: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(w)
    val flagged = table(s, d, "events").select(
      col("user_id"), col("ts"), col("event_id"),
      when(prevTs.isNull ||
        (col("ts").cast(DoubleType) - prevTs.cast(DoubleType)) > 1800, 1)
        .otherwise(0).as("new_sess"))
    val sess = flagged.withColumn("sess_id",
      sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perSession = sess.groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("cnt"))
    perSession.groupBy(col("user_id"))
      .agg(
        countDistinct(col("sess_id")).as("n_sessions"),
        sum(col("cnt")).as("n_events"),
        max(col("cnt")).as("max_session_events"))
      .orderBy("user_id")
  }
}
