package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** True Structured Streaming variants of the §2.9 batch queries
  * (SURVEY.md phase D). Non-oracle: temporal nondeterminism (watermarks,
  * state) cannot hash-match DuckDB; instead the test suite asserts
  * batch-equivalence — the final streaming state must equal the batch
  * result, which Structured Streaming's repeatable-source model
  * guarantees for file replays.
  *
  * At scale these run with checkpointing + RocksDB state store; here the
  * file source replays events.parquet in micro-batches.
  */
object Streams {

  /** readStream over the events table, with the same ns->us timestamp
    * conversion Tables.read applies on the batch side. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // schema as Spark parses it under nanosAsLong (ts: long nanos);
    // the file stream source needs a directory, so scope the sfDir
    // with a glob on the events file
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    spark.readStream
      .schema(raw.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling 1h counts/sums per event_type — streaming twin of
    * StreamOps.streamTumbling1h. */
  def tumbling1h(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType), 2).as("v_sum"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("v_sum"))

  /** Sliding 1h/30m — streaming twin of streamSliding1h30m. */
  def sliding1h30m(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType), 2).as("v_sum"))
      .select(col("window.start").as("w_start"), col("n"), col("v_sum"))

  /** 30-min-gap session windows per user — streaming twin of
    * streamSessionize (native session_window operator). */
  def sessions30m(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n_events"))

  /** Run a streaming DataFrame to completion against the bounded file
    * source (AvailableNow) and return the final result from the memory
    * sink. outputMode complete for full-state comparison. */
  def runToBatch(spark: SparkSession, stream: DataFrame, name: String): DataFrame = {
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
