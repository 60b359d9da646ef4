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

  /** readStream over the events table, with the same footer-driven
    * TIMESTAMP(NANOS) handling Tables.read applies on the batch side:
    * fields physically stored as nanos are read as long (nanosAsLong)
    * and truncated to µs; fields already µs (the fixtures since round
    * 6) pass through untouched. Round-6 lesson: hard-coding the ns->µs
    * conversion broke every events-based streaming spec when the
    * testdata was regenerated with timestamp[us]. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    val nanosFields = Tables.nanosTimestampFields(spark, path)
    if (nanosFields.nonEmpty)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // schema as the batch reader parses it, with TIMESTAMP_NTZ coerced
    // to TimestampType — the µs fixtures carry no isAdjustedToUTC flag
    // so inference yields NTZ, which watermarks reject; under the
    // pinned UTC session TZ the LTZ reading is value-identical (same
    // policy as Tables.read). The file stream source needs a
    // directory, so scope the sfDir with a glob on the events file.
    val rawSchema = StructType(spark.read.parquet(path).schema.map {
      case f if f.dataType == TimestampNTZType => f.copy(dataType = TimestampType)
      case f => f
    })
    val base = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
    nanosFields.foldLeft(base) { (df, f) =>
      df.withColumn(f, timestamp_micros(expr(s"`$f` div 1000")))
    }
  }

  /** readStream over any single-table parquet (file-source replay) —
    * the generic subscription source. The events table needs the
    * ns->us timestamp conversion; use [[eventsStream]] for it. */
  def tableStream(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    spark.readStream
      .schema(raw.schema)
      .option("pathGlobFilter", s"$name.parquet")
      .parquet(sfDir)
  }

  /** Unbounded non-file source wiring: Spark's built-in deterministic
    * `rate-micro-batch` source shaped into the events schema. Batch k
    * carries values [k·rowsPerBatch, (k+1)·rowsPerBatch) with event
    * time advancing one minute per batch — so every downstream
    * windowed aggregate is exactly predictable from the number of rows
    * processed (asserted in StreamingSpec). A Kafka deployment swaps
    * `.format("kafka").option("subscribe", …)` + a from_json projection
    * in front of the SAME transforms — no broker ships in this
    * container, so the rate source is the live unbounded path. */
  def rateEvents(spark: SparkSession, rowsPerBatch: Int): DataFrame =
    spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toLong)
      .option("startTimestamp", 0L)
      .option("advanceMillisPerBatch", 60000L)
      .load() // (timestamp, value)
      .select(
        col("value").as("event_id"),
        col("timestamp").as("ts"),
        pmod(col("value"), lit(50)).as("user_id"),
        element_at(
          array(lit("click"), lit("view"), lit("purchase")),
          (pmod(col("value"), lit(3)) + 1).cast("int")).as("event_type"),
        (pmod(col("value") * 7, lit(100)).cast(DoubleType) / 10).as("value"))

  /** Streaming exact deduplication — the unbounded twin of
    * TextSim.dedupExact. `dropDuplicatesWithinWatermark` keeps one row
    * per key and EXPIRES key state once the watermark passes it, so
    * state is bounded by (keys per watermark window), not by the whole
    * stream's key cardinality — the property that makes exact dedup
    * viable on an infinite stream. Duplicates farther apart than the
    * watermark are the documented residue (re-dedup downstream in
    * batch if required). */
  def dedupWithinWatermark(events: DataFrame, keys: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

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

  /** Streaming PSI drift monitor (round 10): per tumbling 1-hour
    * window, the population-stability index of the event-value
    * distribution against a REFERENCE histogram — `agg_psi_drift`
    * (§2.29) turned into the live scorecard drift check it exists
    * for. The reference (10 fixed 50-wide value bins → counts, e.g.
    * from `valueHistogram` over a trusted history slice) is collected
    * ONCE driver-side — 10 bounded rows, the suite's
    * broadcast-threshold convention — and enters the plan as
    * LITERALS, so the whole monitor is ONE streaming aggregation
    * whose per-window state is exactly 11 counters: no chained
    * stateful operators, no stream-static join state, watermark
    * evicts closed windows. Same add-1 smoothed (p−q)·ln(p/q)
    * arithmetic as the batch op. Works identically on a batch frame
    * (watermark applied only when streaming), which is what the
    * batch-equivalence spec asserts. Size `duration` so windows hold
    * enough events for PSI to mean anything — with ~20 events in a
    * window, the add-1 smoothing over 10 bins dominates and every
    * window reads "drifted" (measured at sf0.001 hourly; the spec
    * monitors daily there). */
  def psiDriftPerHour(events: DataFrame, reference: DataFrame,
      duration: String = "1 hour"): DataFrame = {
    val ref: Map[Long, Long] = reference.select(col("bin"), col("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refTot = (ref.values.sum + 10).toDouble
    val bin = least(floor(col("value") / 50.0), lit(9.0)).cast(LongType)
    val wm = if (events.isStreaming) events.withWatermark("ts", "10 minutes")
             else events
    val counts = (0 until 10)
      .map(b => sum(when(bin === b, 1L).otherwise(0L)).as(s"c$b"))
    val agg = wm.filter(col("value").isNotNull)
      .groupBy(window(col("ts"), duration))
      .agg(count(lit(1)).as("n_events"), counts: _*)
    val tot = (0 until 10).map(b => col(s"c$b")).reduce(_ + _)
      .cast(DoubleType) + lit(10.0)
    val psi = (0 until 10).map { b =>
      val p = (col(s"c$b") + 1).cast(DoubleType) / tot
      val q = lit((ref.getOrElse(b.toLong, 0L) + 1).toDouble / refTot)
      (p - q) * log(p / q)
    }.reduce(_ + _)
    agg.select(col("window.start").as("w_start"), col("n_events"),
      round(psi, 6).as("psi"), (psi > 0.25).as("drifted"))
  }

  /** Live PII guardrail (round 14, the psiDriftPerHour shape): per
    * (tumbling window, source), detection counts for every shared
    * `Pipelines.piiPatterns` regex over a streaming document feed
    * (ts, source, text) — the "did a source start leaking PII" alarm
    * completing the monitor family. ONE streaming aggregation with
    * |patterns|+2 counters of per-group state; the patterns are
    * inlined literals (the SAME automata as pipeline_pii_profile /
    * Curation.piiProfile, so live and batch readouts cannot drift) and
    * the regexp counting fuses into the stream's row path — no extra
    * stateful operator, no stream-static join. A window flags when its
    * per-mille hit rate (pii_total·1000 vs n_docs·maxPerMille) crosses
    * the threshold. Works identically on a batch frame (watermark
    * skipped) — StreamingSpec pins stream == batch twin and that a
    * planted leak flags. */
  def piiMonitor(docs: DataFrame, duration: String = "1 hour",
      maxPerMille: Long = 400): DataFrame = {
    val perRow = graft.ops.Pipelines.piiPatterns.map { case (_, p, _) =>
      size(regexp_extract_all(col("text"), lit(p), lit(0))).cast(LongType)
    }.reduce(_ + _)
    val perType = graft.ops.Pipelines.piiPatterns.map { case (n, p, _) =>
      sum(size(regexp_extract_all(col("text"), lit(p), lit(0)))
        .cast(LongType)).as(n + "s")
    }
    val wm = if (docs.isStreaming) docs.withWatermark("ts", "10 minutes")
             else docs
    wm.select(col("ts"), col("source"), perRow.as("hits"), col("text"))
      .groupBy(window(col("ts"), duration), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        Seq(sum(when(col("hits") > 0, 1L).otherwise(0L)).as("docs_with_pii"),
          sum(col("hits")).as("pii_total")) ++ perType: _*)
      .select(Seq(col("window.start").as("w_start"), col("source"),
        col("n_docs"), col("docs_with_pii"), col("pii_total")) ++
        graft.ops.Pipelines.piiPatterns.map(t => col(t._1 + "s")) ++
        Seq((col("pii_total") * 1000 > col("n_docs") * maxPerMille)
          .as("flagged")): _*)
  }

  /** Live crawl-hygiene monitor (round 15, the piiMonitor shape): per
    * (tumbling window, source) over a streaming document feed
    * (ts, source, text) — extraction retention (chars surviving the
    * shared `Crawl.extractHtmlText` chain), mojibake-doc rate (the
    * shared repair chain would rewrite the doc), and NFC-denormalized
    * doc rate (the shared codegen'd normalizer would). The three
    * crawl-regression signals a feed pipeline must catch the hour a
    * source's renderer or charset handling breaks — computed with the
    * IDENTICAL expression chains the §2.51 censuses hash-pin, so live
    * and batch readouts cannot drift. ONE streaming aggregation with
    * five counters of per-group state; every detector fuses into the
    * stream's row path (no extra stateful op, no joins). A window
    * flags when retention drops below `minRetainedPerMille` or either
    * dirt rate crosses its per-mille ceiling. Works identically on a
    * batch frame (watermark skipped) — StreamingSpec pins stream ==
    * batch twin and that a planted encoding regression flags. */
  def crawlMonitor(docs: DataFrame, duration: String = "1 hour",
      minRetainedPerMille: Long = 500, maxMojibakePerMille: Long = 100,
      maxDenormPerMille: Long = 100): DataFrame = {
    val spark = docs.sparkSession
    val raw = col("text")
    val wm = if (docs.isStreaming) docs.withWatermark("ts", "10 minutes")
             else docs
    wm.select(col("ts"), col("source"),
        length(raw).cast("long").as("cr"),
        length(graft.ops.Crawl.extractHtmlText(raw)).cast("long").as("ct"),
        when(graft.ops.Crawl.repairEncoding(raw) =!= raw, 1L)
          .otherwise(0L).as("moj"),
        when(graft.ops.Crawl.nfcText(spark, raw) =!= raw, 1L)
          .otherwise(0L).as("den"))
      .groupBy(window(col("ts"), duration), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("cr")).as("chars_raw"), sum(col("ct")).as("chars_text"),
        sum(col("moj")).as("mojibake_docs"), sum(col("den")).as("denorm_docs"))
      .select(col("window.start").as("w_start"), col("source"),
        col("n_docs"), col("chars_raw"), col("chars_text"),
        (col("chars_text") * 1000 < col("chars_raw") * minRetainedPerMille ||
          col("mojibake_docs") * 1000 > col("n_docs") * maxMojibakePerMille ||
          col("denorm_docs") * 1000 > col("n_docs") * maxDenormPerMille)
          .as("flagged"),
        col("mojibake_docs"), col("denorm_docs"))
  }

  /** The 10-bin fixed-width value histogram `psiDriftPerHour` takes
    * as its reference — run it over the trusted history slice. */
  def valueHistogram(events: DataFrame): DataFrame =
    events.filter(col("value").isNotNull)
      .groupBy(least(floor(col("value") / 50.0), lit(9.0)).cast(LongType).as("bin"))
      .agg(count(lit(1)).as("cnt"))

  /** 30-min-gap session windows per user — streaming twin of
    * streamSessionize (native session_window operator). */
  def sessions30m(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n_events"))

  /** Stream-stream interval join: each purchase joined to the clicks
    * of the same user in the preceding hour. Both sides carry
    * watermarks and the join has a two-sided time bound, so Spark can
    * evict state (the unbounded-state trap of stream-stream joins);
    * asserted batch-equivalent in StreamingSpec. */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(clicks,
      col("c_user") === col("p_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
  }

  /** LEFT OUTER stream-stream interval join: every purchase, with its
    * preceding-hour clicks OR nulls if none arrived — the attribution
    * join that must also surface unattributed conversions. Outer
    * emission is watermark-driven: a purchase's null row can only be
    * produced once the watermark proves no matching click can still
    * arrive, so results for the trailing watermark-delay of the
    * stream stay in state (Spark runs a final no-data batch under
    * AvailableNow precisely so closable rows flush). Same two-sided
    * time bound ⇒ state stays evictable. Batch-equivalence (on the
    * watermark-closed prefix) in StreamingSpec. */
  def clickPurchaseJoinOuter(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicksWm = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    purchases.join(clicksWm,
      col("c_user") === col("p_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
      "leftOuter")
  }

  /** Chained stateful operators (Spark 4 multi-stateful support): the
    * stream-stream click→purchase join feeding a tumbling-hour
    * windowed aggregation — conversions-per-hour as ONE streaming
    * query instead of join-to-sink-to-second-job. The watermark
    * propagates through the join into the aggregation, so the window
    * state is still evicted; append mode emits each window once it is
    * provably complete. Closed-window batch-equivalence in
    * StreamingSpec. */
  def conversionsPerHour(events: DataFrame): DataFrame =
    clickPurchaseJoin(events)
      .groupBy(window(col("p_ts"), "1 hour"))
      // count(*) over join rows, not countDistinct(p_id): distinct
      // aggregates are unsupported over streams, and the pair count is
      // the attribution weight anyway
      .agg(count(lit(1)).as("n_attributed_pairs"))
      .select(col("window.start").as("h"), col("n_attributed_pairs"))

  /** Continuous per-hour revenue leaderboard (round 8): CHAINED
    * streaming aggregations — a watermarked (window, user) revenue sum
    * feeding a second stateful aggregation that keeps only the top-k
    * users per window via the typed [[graft.functions.TopKAggregator]]
    * (bounded k-element buffers, map-side combined — the scale
    * alternative to ranking every user; registered through
    * `functions.udaf`, the Aggregator-tier UDAF surface). Append mode:
    * a window's leaderboard emits exactly once, when the propagated
    * watermark closes it — the "hourly top spenders" feed every
    * ops/abuse dashboard keeps live. Batch-equivalence (emitted
    * windows == the batch window+row_number top-k) in StreamingSpec. */
  def topUsersPerHour(events: DataFrame, k: Int = 3): DataFrame = {
    val topk = udaf(new graft.functions.TopKAggregator(k),
      org.apache.spark.sql.Encoders.product[(Double, Long)])
    val per = events
      .filter(col("event_type") === "purchase" && col("value").isNotNull &&
        col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("user_id"))
      .agg(sum(col("value").cast(DecimalType(18, 2))).as("total"))
    per
      .groupBy(col("window"))
      .agg(topk(col("total").cast(DoubleType), col("user_id")).as("top"))
      .select(col("window.start").as("h"), posexplode(col("top")))
      .select(col("h"), (col("pos") + 1).cast(LongType).as("rn"),
        col("col._2").as("user_id"),
        round(col("col._1"), 2).as("total"))
  }

  /** Custom sessionization state kept per user across micro-batches. */
  case class SessionState(sessionCount: Long, lastTs: Long, currentLen: Long, maxLen: Long)
  case class UserSessions(user_id: Long, n_sessions: Long, max_session_events: Long)

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * arbitrary-state path (SURVEY §7.4 hard item 3) for semantics
    * session_window can't express. Gap rule identical to the batch
    * gap-and-island query: a new session starts when the gap EXCEEDS
    * 30 minutes (strictly greater). Emits the running per-user summary
    * each micro-batch; with a bounded replay the final emission equals
    * the batch stream_sessionize result (asserted in StreamingSpec).
    *
    * Events within a micro-batch are sorted per group; correctness
    * across batches relies on the file source replaying in order (for
    * production out-of-order data this would buffer by watermark —
    * deliberately kept minimal here).
    */
  def sessionizeStateful(events: DataFrame): org.apache.spark.sql.Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val byUser = events
      .select(col("user_id").as("u"), unix_micros(col("ts")).as("tsUs"))
      .as[(Long, Long)]
      .groupByKey(_._1)
    byUser.flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (user: Long, rows: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
        val sorted = rows.map(_._2).toSeq.sorted
        var st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L, 0L))
        sorted.foreach { ts =>
          st =
            if (st.sessionCount == 0L || ts - st.lastTs > 1800L * 1000000L)
              SessionState(st.sessionCount + 1, ts, 1L, math.max(st.maxLen, 1L))
            else
              SessionState(st.sessionCount, ts, st.currentLen + 1,
                math.max(st.maxLen, st.currentLen + 1))
        }
        state.update(st)
        Iterator(UserSessions(user, st.sessionCount, st.maxLen))
    }
  }

  /** The transformWithState twin of [[sessionizeStateful]] — Spark 4's
    * successor API for arbitrary streaming state (SPARK-40434 /
    * "state-v2"): typed named state handles (`ValueState`/`ListState`/
    * `MapState`) with per-state TTL, timers, and schema evolution,
    * instead of flatMapGroupsWithState's single opaque state object.
    * Same gap rule, same emission; requires the RocksDB state store
    * provider (enforced by Spark), which is also SCALING.md's 100 TB
    * state backend — so the modern path and the scale path are the
    * same path. Batch-equivalence asserted in StreamingSpec alongside
    * the legacy API's. */
  class SessionizeProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, Long), UserSessions] {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var st: ValueState[SessionState] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[SessionState]("sess",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)
    override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
        tv: TimerValues): Iterator[UserSessions] = {
      val sorted = rows.map(_._2).toSeq.sorted
      var s =
        if (st.exists()) st.get()
        else SessionState(0L, Long.MinValue, 0L, 0L)
      sorted.foreach { ts =>
        s =
          if (s.sessionCount == 0L || ts - s.lastTs > 1800L * 1000000L)
            SessionState(s.sessionCount + 1, ts, 1L, math.max(s.maxLen, 1L))
          else
            SessionState(s.sessionCount, ts, s.currentLen + 1,
              math.max(s.maxLen, s.currentLen + 1))
      }
      st.update(s)
      Iterator(UserSessions(user, s.sessionCount, s.maxLen))
    }
  }

  /** A CLOSED session: emitted exactly once, when either a successor
    * event proves the gap rule closed it, or the event-time watermark
    * passes its close deadline. Bounds in exact microseconds. */
  case class ClosedSession(user_id: Long, s_start_us: Long, s_end_us: Long,
      n_events: Long)

  /** State for [[SessionCloseProcessor]]: the one still-open trailing
    * session and the close deadline its registered timer encodes. */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, timerMs: Long)

  /** Event-time TIMER path of the state-v2 API (the capability
    * [[SessionizeProcessor]] leaves unused): sessions that end
    * mid-stream are emitted inline when their successor event arrives,
    * but the LAST session of an idle user can only close when the
    * WATERMARK proves no more events can join it — exactly what
    * `getHandle.registerTimer` + `handleExpiredTimer` exist for. Each
    * user keeps one open session and one registered timer at
    * lastTs + gap; new events delete and re-register the timer
    * (sliding deadline), and the timer firing emits the session and
    * clears state — so state size is bounded by live sessions, not by
    * users ever seen. Gap rule identical to the batch gaps-islands
    * query (new session when the gap strictly exceeds 30 minutes).
    * Closed-set batch-equivalence asserted in StreamingSpec. */
  class SessionCloseProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, (Long, java.sql.Timestamp), ClosedSession] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    private val GapUs = 1800L * 1000000L
    private val GapMs = 1800L * 1000L
    @transient private var st: ValueState[OpenSession] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[OpenSession]("open",
        org.apache.spark.sql.Encoders.product[OpenSession], TTLConfig.NONE)
    private def us(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
    override def handleInputRows(user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
        tv: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.map(r => us(r._2)).toSeq.sorted
      val out = scala.collection.mutable.ArrayBuffer[ClosedSession]()
      var cur: Option[OpenSession] = if (st.exists()) Some(st.get()) else None
      cur.filter(_.timerMs > 0L).foreach(c => getHandle.deleteTimer(c.timerMs))
      sorted.foreach { ts =>
        cur match {
          case Some(c) if ts - c.lastUs <= GapUs =>
            cur = Some(c.copy(lastUs = math.max(c.lastUs, ts), n = c.n + 1))
          case Some(c) =>
            out += ClosedSession(user, c.startUs, c.lastUs, c.n)
            cur = Some(OpenSession(ts, ts, 1L, 0L))
          case None =>
            cur = Some(OpenSession(ts, ts, 1L, 0L))
        }
      }
      cur.foreach { c =>
        val deadline = c.lastUs / 1000L + GapMs + 1L
        st.update(c.copy(timerMs = deadline))
        getHandle.registerTimer(deadline)
      }
      out.iterator
    }
    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[ClosedSession] = {
      val cur: Option[OpenSession] = if (st.exists()) Some(st.get()) else None
      st.clear()
      cur.iterator.map(c => ClosedSession(user, c.startUs, c.lastUs, c.n))
    }
  }

  /** Watermark-closed sessionization via event-time timers (see
    * [[SessionCloseProcessor]]). `delay` is the watermark delay. */
  def sessionizeClosed(events: DataFrame, delay: String = "10 minutes")
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .withWatermark("ts", delay)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionCloseProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Sessionization via transformWithState (see [[SessionizeProcessor]]). */
  def sessionizeTws(events: DataFrame): org.apache.spark.sql.Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .select(col("user_id").as("u"), unix_micros(col("ts")).as("tsUs"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionizeProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Append-mode runner for arbitrary-state operators. */
  def runToBatchAppend(spark: SparkSession, stream: org.apache.spark.sql.Dataset[_],
      name: String): DataFrame = {
    val q = stream.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

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

  // ---- round 12: sequential monitors as LIVE streams (§2.35's point) ----

  case class SprtState(n: Long, x: Long)
  case class SprtCheckpoint(n: Long, x: Long, llr_q6: Long, decision: String)

  /** Streaming Wald SPRT monitor (round 12): `agg_sprt_decision`
    * (§2.35) run WHILE arrivals stream in — which is the entire point
    * of a sequential test: it may stop the experiment early, so
    * waiting for a batch pass wastes exactly the samples SPRT exists
    * to save. Consumes an arrival stream carrying (mk, okey, conv) —
    * the same md5-keyed arrival order + conversion flag the batch op
    * derives — and maintains ONE cumulative (n, x) state (a monitor IS
    * a global statistic: key cardinality 1 BY DEFINITION, state is two
    * longs, so the single-key shuffle is the stream's commit order,
    * not a skew hazard). At every 100th arrival it EMITS the
    * checkpoint with the identical inlined Wald LLR factors and
    * quantized ln(19) boundaries as the batch op — closed-prefix
    * equality pinned in StreamingSpec: after any replayed prefix (in
    * mk order — the spec replays md5-sorted files one per trigger),
    * the emitted checkpoints equal the batch op's first rows.
    * Within a micro-batch arrivals are sorted by (mk, okey); across
    * batches order relies on the replay, the sessionizeStateful
    * convention. */
  def sprtMonitor(arrivals: DataFrame)
      : org.apache.spark.sql.Dataset[SprtCheckpoint] = {
    import arrivals.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = arrivals
      .select(col("mk").cast(StringType), col("okey").cast(LongType),
        col("conv").cast(LongType))
      .as[(String, Long, Long)]
      .groupByKey(_ => 0)
    typed.flatMapGroupsWithState(OutputMode.Append(),
      GroupStateTimeout.NoTimeout()) {
      (_: Int, rows: Iterator[(String, Long, Long)],
          state: GroupState[SprtState]) =>
        var st = state.getOption.getOrElse(SprtState(0L, 0L))
        val out = Vector.newBuilder[SprtCheckpoint]
        rows.toVector.sortBy(r => (r._1, r._2)).foreach { case (_, _, conv) =>
          st = SprtState(st.n + 1, st.x + conv)
          if (st.n % 100 == 0) {
            // the batch op's exact LLR tree: x·ln(p1/p0) + (n−x)·
            // ln((1−p1)/(1−p0)) with the factors inlined as literals
            // (Relational.sprtCheckpoints), floor-quantized 1e6
            val llr = math.floor((st.x.toDouble * 0.3364722366212129 +
              (st.n - st.x).toDouble * -0.1431008436406733) * 1e6).toLong
            val dec =
              if (llr >= 2944438L) "reject_h0"
              else if (llr <= -2944439L) "accept_h0"
              else "continue"
            out += SprtCheckpoint(st.n, st.x, llr, dec)
          }
        }
        state.update(st)
        out.result().iterator
    }
  }

  case class CusumState(s: Long, lastEpochDay: Long)
  case class CusumPoint(dt: java.sql.Date, x: Long, cusum_s: Long)

  /** Streaming one-sided CUSUM monitor (round 12): the `ts_cusum_top`
    * recursion S_t = max(0, S_{t−1} + x_t − μ − slack) run as a LIVE
    * consumer of a day-grain metric stream (dt, x) — e.g. the
    * incrementally-maintained day-grain MaterializedView's deltas, so
    * the daily monitor pass is O(delta) end to end. μ is a FIXED
    * reference rate (the psiDriftPerHour convention: the reference is
    * decided from trusted history and enters as a literal — a
    * streaming monitor cannot use the batch op's full-series mean
    * without peeking at the future; with μ = the head snapshot's
    * `tot div nd` the emissions reproduce ts_cusum_top exactly, which
    * is what StreamingSpec pins). One global state of two longs (the
    * sprtMonitor rationale); days must arrive in calendar order
    * (enforced) — each day emits its statistic exactly once. */
  def cusumMonitor(daily: DataFrame, mu: Long, slack: Long = 1L)
      : org.apache.spark.sql.Dataset[CusumPoint] = {
    import daily.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = daily
      .select(col("dt").cast(DateType), col("x").cast(LongType))
      .as[(java.sql.Date, Long)]
      .groupByKey(_ => 0)
    typed.flatMapGroupsWithState(OutputMode.Append(),
      GroupStateTimeout.NoTimeout()) {
      (_: Int, rows: Iterator[(java.sql.Date, Long)],
          state: GroupState[CusumState]) =>
        var st = state.getOption.getOrElse(CusumState(0L, Long.MinValue))
        val out = Vector.newBuilder[CusumPoint]
        rows.toVector.sortBy(_._1.getTime).foreach { case (dt, x) =>
          val epochDay = dt.toLocalDate.toEpochDay
          require(epochDay > st.lastEpochDay,
            s"cusumMonitor: day $dt arrived out of order " +
              s"(state already at epoch day ${st.lastEpochDay})")
          val s2 = math.max(0L, st.s + x - mu - slack)
          out += CusumPoint(dt, x, s2)
          st = CusumState(s2, epochDay)
        }
        state.update(st)
        out.result().iterator
    }
  }

  case class HoltState(n: Long, lastEpochDay: Long, buf: Seq[Double],
      l: Double, b: Double, s: Seq[Double])
  case class HoltPoint(dt: java.sql.Date, n: Long, level: Double,
      trend: Double, forecasts: Seq[Double])

  /** Streaming Holt–Winters monitor (round 13, verdict item 7): the
    * `ts_holt_winters` level/trend/7-day-seasonal recursion (α=0.2,
    * β=0.05, γ=0.1) run LIVE over a day-grain revenue-cents stream
    * (dt, c) — the forecasting face of the monitor family beside
    * sprt/cusum, fed by the same O(delta)-maintained day-grain
    * MaterializedView. The arithmetic is a Scala transliteration of
    * the batch op's SQL `aggregate` fold with IDENTICAL expression
    * trees (same left-assoc 7-day init mean, b updated from the
    * recomputed level expression, seasonal shifted then appended), so
    * every double is bit-equal to the batch fold on the same prefix —
    * StreamingSpec pins the closed-prefix h=1..7 forecasts against
    * `TimeSeries.holtWintersFromDaily` exactly. First 7 days buffer
    * (init: l = mean, b = 0, s_i = x_i − mean); every later day folds
    * once and emits the refreshed 7-horizon forecast (floored cents →
    * dollars, the batch output convention). One global state (the
    * monitor-is-a-global-statistic rationale); in-order days enforced
    * like cusumMonitor. */
  def holtMonitor(daily: DataFrame)
      : org.apache.spark.sql.Dataset[HoltPoint] = {
    import daily.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = daily
      .select(col("dt").cast(DateType), col("c").cast(LongType))
      .as[(java.sql.Date, Long)]
      .groupByKey(_ => 0)
    typed.flatMapGroupsWithState(OutputMode.Append(),
      GroupStateTimeout.NoTimeout()) {
      (_: Int, rows: Iterator[(java.sql.Date, Long)],
          state: GroupState[HoltState]) =>
        var st = state.getOption.getOrElse(
          HoltState(0L, Long.MinValue, Vector.empty, 0.0, 0.0, Vector.empty))
        val out = Vector.newBuilder[HoltPoint]
        rows.toVector.sortBy(_._1.getTime).foreach { case (dt, c) =>
          val epochDay = dt.toLocalDate.toEpochDay
          require(epochDay > st.lastEpochDay,
            s"holtMonitor: day $dt arrived out of order " +
              s"(state already at epoch day ${st.lastEpochDay})")
          val x = c.toDouble
          if (st.n < 7L) {
            val buf = st.buf :+ x
            if (buf.size == 7) {
              // same left-assoc sum and division as the SQL init
              val mean = (((((buf(0) + buf(1)) + buf(2)) + buf(3)) + buf(4))
                + buf(5) + buf(6)) / 7.0
              st = HoltState(7L, epochDay, Vector.empty,
                mean, 0.0, buf.map(_ - mean))
            } else st = st.copy(n = st.n + 1, lastEpochDay = epochDay, buf = buf)
          } else {
            // the batch fold, expression-tree identical:
            //   l' = 0.2(x − s₁) + 0.8(l + b)
            //   b' = 0.05(l' − l) + 0.95 b   (l' recomputed inline)
            //   s  = shift ⧺ [0.1(x − l') + 0.9 s₁]
            val l2 = 0.2 * (x - st.s.head) + 0.8 * (st.l + st.b)
            val b2 = 0.05 * ((0.2 * (x - st.s.head) + 0.8 * (st.l + st.b))
              - st.l) + 0.95 * st.b
            val s2 = st.s.drop(1) :+
              (0.1 * (x - (0.2 * (x - st.s.head) + 0.8 * (st.l + st.b)))
                + 0.9 * st.s.head)
            st = HoltState(st.n + 1, epochDay, Vector.empty, l2, b2, s2)
            val fc = (1 to 7).map(h =>
              math.floor(st.l + h.toDouble * st.b + st.s(h - 1)) / 100.0)
            out += HoltPoint(dt, st.n, st.l, st.b, fc)
          }
        }
        state.update(st)
        out.result().iterator
    }
  }
}
