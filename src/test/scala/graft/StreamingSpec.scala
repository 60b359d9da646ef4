package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streams

/** Structured Streaming batch-equivalence (SURVEY §5.4): replaying
  * events.parquet through readStream must reproduce the oracle-checked
  * batch results. */
class StreamingSpec extends AnyFunSuite {
  import SharedSpark._

  test("streaming tumbling window equals batch stream_tumbling_1h") {
    val stream = Streams.tumbling1h(Streams.eventsStream(spark, sf0001))
    val got = Streams.runToBatch(spark, stream, "t_tumbling")
      .select("w_start", "event_type", "n", "v_sum")
    val want = ops.StreamOps.streamTumbling1h(spark, sf0001)
    assert(got.count() == want.count())
    assert(got.exceptAll(want.select("w_start", "event_type", "n", "v_sum")).count() == 0)
  }

  test("streaming sliding window equals batch stream_sliding_1h_30m") {
    val stream = Streams.sliding1h30m(Streams.eventsStream(spark, sf0001))
    val got = Streams.runToBatch(spark, stream, "t_sliding")
    val want = ops.StreamOps.streamSliding1h30m(spark, sf0001)
    assert(got.count() == want.count())
    assert(got.select("w_start", "n", "v_sum")
      .exceptAll(want.select("w_start", "n", "v_sum")).count() == 0)
  }

  test("flatMapGroupsWithState custom sessionization equals batch sessionize") {
    val stream = Streams.sessionizeStateful(Streams.eventsStream(spark, sf0001))
    // bounded replay in one AvailableNow batch: final emission per user
    val got = Streams.runToBatchAppend(spark, stream, "t_state_sessions")
      .groupBy("user_id")
      .agg(max(col("n_sessions")).as("n_sessions"),
        max(col("max_session_events")).as("max_session_events"))
    val want = ops.StreamOps.streamSessionize(spark, sf0001)
      .select("user_id", "n_sessions", "max_session_events")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
  }

  test("streaming session_window session counts match batch sessionize") {
    val stream = Streams.sessions30m(Streams.eventsStream(spark, sf0001))
    val got = Streams.runToBatch(spark, stream, "t_sessions")
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
    val want = ops.StreamOps.streamSessionize(spark, sf0001)
      .select("user_id", "n_sessions")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).count() == 0)
  }
}
