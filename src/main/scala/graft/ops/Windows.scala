package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Window functions (SURVEY.md §2.4). Rank-family outputs are cast to
  * BIGINT to match DuckDB result types. */
object Windows {

  val winRankTopn: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    table(s, d, "orders")
      .select(
        col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"),
        asLong(row_number().over(w)).as("rn"),
        asLong(rank().over(w)).as("rk"),
        asLong(dense_rank().over(w)).as("drk"))
      .filter(col("rn") <= 20)
      .orderBy("o_orderstatus", "rn")
  }

  val winLagLead: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    table(s, d, "events")
      .select(
        col("user_id"), col("event_id"),
        round(col("value"), 2).as("v"),
        round(lag(col("value"), 1).over(w), 2).as("prev_v"),
        round(lead(col("value"), 1).over(w), 2).as("next_v"),
        round(col("value") - coalesce(lag(col("value"), 1).over(w), lit(0.0)), 2).as("delta"))
      .orderBy("user_id", "event_id")
  }

  val winMovingFrame: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(-3, Window.currentRow)
    table(s, d, "events")
      .select(
        col("user_id"), col("event_id"),
        round(sum(dec2(col("value"))).over(w).cast(DoubleType), 2).as("mov_sum4"))
      .orderBy("user_id", "event_id")
  }

  val winRunningTotal: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, d, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(dec2(col("o_totalprice"))).over(w).cast(DoubleType), 2).as("run_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Global rank family (ntile / percent_rank / cume_dist) over a
    * totalized order — routed through GlobalRank.ranked (range
    * shuffle + broadcast prefix offsets) instead of an unpartitioned
    * window, so no single task ever holds the full table. With a
    * total order rank == row_number, so all three are pure per-row
    * arithmetic in (rn, N): ntile the standard bucket formula,
    * pr = (rn-1)/(N-1), cd = rn/N — bit-identical to the window
    * functions (GlobalRankSpec proves equivalence). */
  val winNtileDist: Q = (s, d) => {
    val (ranked, n) = GlobalRank.ranked(
      table(s, d, "customer").select(col("c_custkey"), col("c_acctbal")),
      Seq(col("c_acctbal"), col("c_custkey")), "__rn")
    ranked
      .select(
        col("c_custkey"), col("c_acctbal"),
        GlobalRank.ntileOf(col("__rn"), n, 4).as("quartile"),
        round(GlobalRank.percentRankOf(col("__rn"), n), 6).as("pr"),
        round(GlobalRank.cumeDistOf(col("__rn"), n), 6).as("cd"))
      .orderBy("c_custkey")
  }

  /** first/last/nth value family; last_value needs the full-partition
    * frame (default frame stops at CURRENT ROW in both engines). */
  val winFirstLast: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    table(s, d, "orders")
      .select(
        col("o_custkey"), col("o_orderkey"),
        first(col("o_totalprice")).over(w).as("first_price"),
        last(col("o_totalprice")).over(wFull).as("last_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Time-based RANGE frame (1 hour preceding) — the event-time window
    * family ROWS frames can't express; via SQL window expressions since
    * the Scala rangeBetween API is numeric-only. */
  val winRange1h: Q = (s, d) =>
    table(s, d, "events")
      .select(
        col("event_id"), col("user_id"),
        expr("""count(*) OVER (PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""").as("n_last_hour"),
        round(expr("""sum(cast(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)""").cast(DoubleType), 2)
          .as("v_last_hour"))
      .orderBy("event_id")

  /** Ratio-to-report: each event's share of its user's total. */
  val winRatio: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id"))
    table(s, d, "events")
      .select(
        col("user_id"), col("event_id"),
        round(col("value").cast(DoubleType) /
          sum(dec2(col("value"))).over(w).cast(DoubleType), 6).as("share"))
      .orderBy("user_id", "event_id")
  }

  val topkPerGroup: Q = (s, d) => {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    table(s, d, "part")
      .select(
        col("p_brand"), col("p_partkey"), col("p_retailprice"),
        asLong(rank().over(w)).as("rk"))
      .filter(col("rk") <= 3)
      .orderBy("p_brand", "rk", "p_partkey")
  }

  /** percent_rank / cume_dist over account balance per market segment
    * (round 3). Outputs stay UNROUNDED doubles: both engines compute
    * (rank-1)/(n-1) and frac-of-rows as one IEEE division over the
    * same integers, so the bits match exactly — rounding would only
    * add a half-even-vs-half-up hazard. Order key includes c_custkey
    * so tied balances rank identically cross-engine. */
  val winPercentRankCume: Q = (s, d) => {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    table(s, d, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy("c_custkey")
  }

  /** Moving exact median (round 4): a true aggregate (not a ranking
    * function) evaluated over a sliding row frame — the window-frame
    * aggregate family. Exact sort-based median; even frames
    * interpolate (a+b)/2 on identical IEEE operands in both engines.
    * Scale: per-event_type partitioning, 7-row frames re-sort locally
    * per row — O(rows x frame log frame) within each partition. */
  val winMovingMedian: Q = (s, d) => {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-6, Window.currentRow)
    table(s, d, "events")
      .select(col("event_id"), col("event_type"),
        round(expr("percentile(value, 0.5)").over(w), 4).as("med7"))
      .orderBy("event_id")
  }

  /** Gaps-and-islands (round 4): consecutive-day activity streaks per
    * user via the classic anchor-date trick — day minus its
    * row_number is constant exactly within a consecutive run, so one
    * window + two hash aggregates find every streak. All date/integer
    * arithmetic: cross-engine exact. Scale: the window and both
    * aggregates share the user_id partitioning; rows after the
    * distinct are bounded by users x active days. */
  val winGapsIslands: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    table(s, d, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts").cast(DateType).as("day")).distinct()
      .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("anchor"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest"),
        sum(col("len")).cast(LongType).as("active_days"))
      .orderBy("user_id")
  }

  /** Running COUNT(DISTINCT) over a window (round 4) — not natively
    * supported by either engine's window functions, so it is composed:
    * a row is a "first occurrence" iff row_number over (key, value)
    * is 1, and the running distinct count is the running SUM of that
    * flag. Two window passes sharing one event_type shuffle; exact
    * integers, tiebroken on event_id, cross-engine deterministic.
    * Scale: both windows partition by event_type — per-partition
    * streaming aggregation, no whole-table sort. */
  val winDistinctRunning: Q = (s, d) => {
    val firstSeen = Window.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val running = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, d, "events")
      .select(col("event_id"), col("event_type"), col("ts"),
        when(row_number().over(firstSeen) === 1, 1L).otherwise(0L).as("flag"))
      .select(col("event_id"), col("event_type"),
        sum(col("flag")).over(running).as("distinct_users"))
      .orderBy("event_id")
  }

  /** Resetting running total (§2.4, r6): per-user cumulative value
    * that restarts after every purchase — the sessionized-accumulator
    * window shape (gaps-and-islands composed with a frame sum).
    * `grp` = purchases strictly BEFORE the row (so a purchase closes
    * its own segment); value summed as DECIMAL(18,2) so the running
    * sum is exact and engine-order-independent, cast to double only
    * for the rounded output. */
  val winResetRunningTotal: Q = (s, d) => {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    table(s, d, "events")
      .filter(col("user_id") % 25 === 0)
      .withColumn("grp", coalesce(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("run", sum(dec2(col("value"))).over(
        Window.partitionBy(col("user_id"), col("grp"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("user_id"), asLong(col("grp")).as("grp"),
        round(col("run").cast(DoubleType), 2).as("run_total"))
      .orderBy("user_id", "event_id")
  }

  /** rank vs dense_rank vs row_number under ties (§2.18b): the three
    * rank semantics side by side on a heavily tied key (integral
    * quantities) — rank/dense_rank are deterministic under ties by
    * definition; row_number is totalized with the key columns so it
    * is too. Per-flag partitioned windows, one shuffle. */
  val winRankVariants: Q = (s, d) => {
    val wTied = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
    val wTotal = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
    table(s, d, "lineitem")
      .filter(col("l_orderkey") <= 300)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        asLong(col("l_quantity")).as("qty"),
        asLong(rank().over(wTied)).as("rnk"),
        asLong(dense_rank().over(wTied)).as("drnk"),
        asLong(row_number().over(wTotal)).as("rn"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Per-group cumulative revenue share (§2.18b): orders ranked desc
    * by price within status, each carrying the running share of its
    * group's total — the per-group Pareto curve (pareto_revenue is the
    * global 3-row summary; this is the row-level curve). Both the
    * running sum and the group total are exact DECIMAL window sums;
    * the share divides identical operands. One status shuffle. */
  val winGroupCumshare: Q = (s, d) => {
    val wRun = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("o_orderstatus"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    table(s, d, "orders")
      .filter(col("o_orderkey") <= 5000)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        round(sum(dec2(col("o_totalprice"))).over(wRun).cast(DoubleType) /
          sum(dec2(col("o_totalprice"))).over(wAll).cast(DoubleType), 6)
          .as("cum_share"))
      .orderBy("o_orderkey")
  }

  /** 7-day rolling mean/σ band over daily purchase revenue with a
    * breakout flag (§2.18, r8): the Bollinger-style monitor next to
    * ts_ewma. Power sums over the frame stay exact DECIMAL (Σx 18,2;
    * Σx² 38,4) so mean/σ evaluate one identical IEEE tree per engine;
    * the ±2σ comparison runs on those exact doubles; the first frame
    * (n=1) yields a NULL flag via an explicit guard (σ undefined).
    * The window runs over DAYS — calendar-bounded regardless of SF,
    * the same justification as ts_daily_revenue_growth. */
  val winRollingBand: Q = (s, d) => {
    val daily = table(s, d, "events")
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(dec2(col("value"))).as("rev"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, Window.currentRow)
    val sums = daily.select(col("day"), col("rev"),
      count(lit(1)).over(w).as("n"),
      sum(col("rev")).over(w).as("sx"),
      sum((col("rev") * col("rev")).cast(DecimalType(38, 4))).over(w).as("sxx"))
    val nD = col("n").cast(DoubleType)
    val mean = col("sx").cast(DoubleType) / nD
    val sd = sqrt((nD * col("sxx").cast(DoubleType) -
      col("sx").cast(DoubleType) * col("sx").cast(DoubleType)) / (nD * (nD - 1)))
    sums.select(col("day"),
      round(col("rev").cast(DoubleType), 2).as("revenue"),
      asLong(col("n")).as("n_days"),
      round(mean, 2).as("mean7"),
      when(col("n") > 1, round(sd, 4)).as("sd7"),
      when(col("n") > 1, col("rev").cast(DoubleType) > mean + sd * 2)
        .as("breakout_hi"))
      .orderBy("day")
  }

  /** Daily-revenue drawdown from the running peak (§2.18c): how far
    * each day sits below the best day seen so far — the
    * regression-from-peak monitor (win_rolling_band is the
    * band-breakout twin). Peak and gap are exact DECIMAL window
    * arithmetic; doubles appear only at the rounded output. Runs over
    * the calendar-bounded day relation (same precedent as
    * win_rolling_band — bounded rows, not fact-sized). */
  val winDrawdown: Q = (s, d) => {
    val daily = table(s, d, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(dec2(col("o_totalprice"))).as("rev"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("peak", max(col("rev")).over(w))
      .select(col("day"),
        round(col("rev").cast(DoubleType), 2).as("rev"),
        round(col("peak").cast(DoubleType), 2).as("peak"),
        round((col("peak") - col("rev")).cast(DoubleType), 2).as("drawdown"))
      .orderBy("day")
  }

  /** Top-3 per group WITH TIES (§2.18c): rank() ≤ 3 keeps every row
    * tied at the boundary — the ANSI FETCH FIRST … WITH TIES
    * semantics that row_number-based top-k silently breaks. Ranked on
    * price bucketed to the nearest 1,000 so ties genuinely occur;
    * rank over ties is deterministic by definition, and the output
    * totalizes by orderkey. Scale: one o_orderstatus shuffle. */
  val winTopWithTies: Q = (s, d) => {
    val kprice = round(dec2(col("o_totalprice")).cast(DoubleType) / 1000, 0)
      .cast(LongType)
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("kp").desc)
    table(s, d, "orders")
      .select(col("o_orderstatus"), col("o_orderkey"),
        dec2(col("o_totalprice")).as("price"), kprice.as("kp"))
      .withColumn("rnk", rank().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_orderstatus"), asLong(col("rnk")).as("rnk"),
        col("o_orderkey"), round(col("price").cast(DoubleType), 2).as("price"))
      .orderBy("o_orderstatus", "rnk", "o_orderkey")
  }

  /** Per-user journey string: one char per event (the event types'
    * first letters are distinct: c/e/p/s/v), in total (ts, event_id)
    * order. Deterministic collect: array_sort over (ts, event_id,
    * code) structs — the struct sort IS the total order, so the
    * concatenation cannot vary run to run. One user_id shuffle; the
    * per-user string is bounded by events-per-user (a production
    * deployment bounds it by sessionizing first — win_session_path_topk
    * is exactly that shape). */
  private def journeys(s: org.apache.spark.sql.SparkSession, d: String) =
    table(s, d, "events")
      .select(col("user_id"), struct(col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c")).as("ev"))
      .groupBy(col("user_id"))
      .agg(array_join(transform(array_sort(collect_list(col("ev"))),
        x => x.getField("c")), "").as("j"))

  /** MATCH_RECOGNIZE-lite sequence pattern matching (§2.20): count
    * STRICTLY CONSECUTIVE event-type patterns per user — `vcp` is a
    * view immediately followed by a click immediately followed by a
    * purchase, something funnel_* (which allows arbitrary gaps within
    * a time bound) cannot express. Occurrence counting is pure string
    * arithmetic — (len(j) − len(replace(j, pat))) / len(pat) — i.e.
    * non-overlapping left-to-right matches, identical semantics in
    * both engines with no regex engine in the loop. Scale: one
    * user_id shuffle to build journeys, then a map-combined aggregate
    * per pattern over the per-user relation (patterns explode ×4 on
    * the already-aggregated rows, not on raw events). */
  val winPatternMatch: Q = (s, d) => {
    val pats = Seq("vcp", "cp", "ee", "sv")
    val perPat = journeys(s, d).select(explode(array(pats.map { p =>
      struct(lit(p).as("pattern"),
        ((length(col("j")) - length(replace(col("j"), lit(p), lit("")))) /
          lit(p.length)).cast(LongType).as("matches"))
    }: _*)).as("x")).select(col("x.pattern").as("pattern"), col("x.matches").as("matches"))
    perPat.groupBy(col("pattern"))
      .agg(asLong(sum(when(col("matches") > 0, 1L).otherwise(0L)))
          .as("n_users_matched"),
        asLong(sum(col("matches"))).as("total_matches"),
        asLong(max(col("matches"))).as("max_per_user"))
      .orderBy("pattern")
  }

  /** Top session journeys (§2.20): 30-min-gap sessionization (the
    * stream_sessionize recipe), each session rendered as its first-8
    * event-type codes in event-time order, then the 10 most common
    * paths with popularity share and average (capped) length — the
    * clickstream path-analysis shape, whose group key is a SEQUENCE,
    * not a scalar. Everything integer-exact until the two final
    * divisions. Scale: two user_id-keyed window passes + one
    * path-keyed aggregate; per-session state is capped at 8 codes by
    * the rank filter before any string is built. */
  val winSessionPathTopk: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevTs = lag(col("ts"), 1).over(w)
    val flagged = table(s, d, "events").select(
      col("user_id"), col("ts"), col("event_id"),
      substring(col("event_type"), 1, 1).as("c"),
      when(prevTs.isNull ||
        (col("ts").cast(DoubleType) - prevTs.cast(DoubleType)) > 1800, 1)
        .otherwise(0).as("new_sess"))
    val sess = flagged.withColumn("sid",
      sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // round 16: the 8-event cap moves INTO the aggregate (slice of the
    // sorted collected array + least(count, 8)) — the old row_number
    // window pass over (user_id, sid) paid a full extra sort of the
    // event relation just to drop rows the collect could drop itself
    val paths = sess.groupBy(col("user_id"), col("sid"))
      .agg(array_join(transform(slice(array_sort(collect_list(
          struct(col("ts"), col("event_id"), col("c")))), 1, 8),
          x => x.getField("c")), "").as("path"),
        least(count(lit(1)), lit(8L)).as("plen"))
    val tot = paths.agg(count(lit(1)).as("nt"), sum(col("plen")).as("lt"))
    paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("plen")).as("lens"))
      .crossJoin(broadcast(tot))
      .select(col("path"), asLong(col("n_sessions")).as("n_sessions"),
        round(col("lens").cast(DoubleType) / col("n_sessions").cast(DoubleType), 4)
          .as("avg_len"),
        round(col("n_sessions").cast(DoubleType) / col("nt").cast(DoubleType), 6)
          .as("share"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(10)
  }

  /** Interval merge / coverage (§2.22): give every order a 30-day
    * service window, merge each customer's overlapping windows into
    * maximal episodes (the interval-union operator: an episode starts
    * where a window opens STRICTLY after the running max close of all
    * earlier windows), and report the episode-count histogram with
    * covered-day totals — the coverage/uptime shape (entitlement
    * windows, on-call rotations, subscription stacking) that plain
    * gaps-islands on single days cannot express. The episode flag
    * needs the EXCLUSIVE prefix max, so the frame ends at 1 PRECEDING;
    * ordering is totalized with o_orderkey so both engines see the
    * identical frame. All day arithmetic is exact integers; the one
    * average divides at output. Scale: both windows partition by
    * customer (per-partition streaming, no global sort); the
    * histogram map-combines. */
  val winIntervalMerge: Q = (s, d) => {
    val wPrev = Window.partitionBy(col("c"))
      .orderBy(col("s"), col("e"), col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("c"))
      .orderBy(col("s"), col("e"), col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(s, d, "orders")
      .select(col("o_custkey").as("c"), col("o_orderkey").as("k"),
        to_date(col("o_orderdate")).as("s"),
        date_add(to_date(col("o_orderdate")), 29).as("e"))
      .withColumn("pmax", max(col("e")).over(wPrev))
      .withColumn("ep", sum(when(col("pmax").isNull || col("s") > col("pmax"), 1L)
        .otherwise(0L)).over(wRun))
      .groupBy(col("c"), col("ep"))
      .agg(min(col("s")).as("es"), max(col("e")).as("ee"))
      .groupBy(col("c"))
      .agg(count(lit(1)).as("n_episodes"),
        sum(datediff(col("ee"), col("es")) + 1).as("covered"))
      .groupBy(col("n_episodes"))
      .agg(count(lit(1)).as("n_customers"), sum(col("covered")).as("tot"))
      .select(asLong(col("n_episodes")).as("n_episodes"),
        asLong(col("n_customers")).as("n_customers"),
        asLong(col("tot")).as("covered_days"),
        round(col("tot").cast(DoubleType) / col("n_customers"), 2)
          .as("avg_covered_days"))
      .orderBy("n_episodes")
  }

  /** Time-weighted average price per part (§2.24, TWAP): ship events
    * are irregular, so the plain mean over-weights busy periods —
    * each event's price is held until the NEXT event and weighted by
    * that duration in days (same-day runs and the final event weigh
    * 1). Exact: prices become BIGINT cents, weights BIGINT days, so
    * both averages are integer rationals rounded half-up to 4dp IN
    * INTEGER ARITHMETIC ((200·num + den) div (2·den)) — no
    * round(double) anywhere, because round-at-4dp of a decimal/count
    * quotient is exactly the cross-engine knife edge the SURVEY §5.3
    * discipline bans (this query's simple_avg hit it at sf0.1 on the
    * first cut). Event order is the total (shipdate, orderkey,
    * linenumber). Scale: one lead window + one aggregate, both
    * partitioned by partkey — never a global sort; the %25 subset
    * bounds only the TEST panel, the per-part plan is unchanged at
    * any SF. */
  val winTimeWeightedAvg: Q = (s, d) => {
    val li = table(s, d, "lineitem").filter(col("l_partkey") % 25 === 0)
      .select(col("l_partkey"), to_date(col("l_shipdate")).as("sd"),
        col("l_orderkey"), col("l_linenumber"),
        (dec2(col("l_extendedprice")) * 100).cast(LongType).as("pc"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("sd"), col("l_orderkey"), col("l_linenumber"))
    li.withColumn("nxt", lead(col("sd"), 1).over(w))
      .withColumn("wdays", when(col("nxt").isNull, lit(1L))
        .otherwise(greatest(datediff(col("nxt"), col("sd")).cast(LongType), lit(1L))))
      .groupBy(col("l_partkey").as("partkey"))
      .agg(count(lit(1)).as("ne"), sum(col("wdays")).as("den"),
        sum(col("pc") * col("wdays")).as("numc"), sum(col("pc")).as("spc"))
      .select(col("partkey"), asLong(col("ne")).as("n_events"),
        asLong(col("den")).as("total_days"),
        (expr("(200*numc + den) div (2*den)").cast(DoubleType) / 1e4).as("twap"),
        (expr("(200*spc + ne) div (2*ne)").cast(DoubleType) / 1e4).as("simple_avg"))
      .orderBy("partkey")
  }

  /** Reorder-gap outliers (§2.33): customers whose LATEST inter-order
    * gap exceeds 3× their own median gap — the churn-risk /
    * reactivation list (agg_inter_purchase_gap is the population
    * cadence; this is the per-customer deviation from it). Exactness:
    * gaps are integer days off the customer-bounded lead window; the
    * per-customer LOWER median indexes the sorted in-row gap array at
    * (n+1) div 2 (orders-per-customer bounded, so the array is tiny);
    * the latest gap rides max_by(gap, day); flag and excess are
    * BIGINT compares. Top-20 by (excess, customer) via TakeOrdered. */
  val winOrderGapOutliers: Q = (s, d) => {
    val w = Window.partitionBy(col("ck")).orderBy(col("dy"), col("ok"))
    val gaps = table(s, d, "orders")
      .select(col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
        to_date(col("o_orderdate")).as("dy"))
      .withColumn("nxt", lead(col("dy"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("ck"), col("dy"), col("ok"),
        datediff(col("nxt"), col("dy")).cast(LongType).as("gap"))
    gaps.groupBy(col("ck"))
      .agg(count(lit(1)).as("n_gaps"),
        expr("element_at(array_sort(collect_list(gap)), " +
          "cast((count(1) + 1) div 2 AS INT))").as("median_gap"),
        // total key: same-day order pairs tie on dy alone (found at
        // sf0.1), so the "latest" pick rides max over (dy, ok, gap)
        max(struct(col("dy"), col("ok"), col("gap")))
          .getField("gap").as("latest_gap"))
      .filter(col("n_gaps") >= 4 && col("latest_gap") > col("median_gap") * 3)
      .select(col("ck").as("custkey"), asLong(col("n_gaps")).as("n_gaps"),
        asLong(col("median_gap")).as("median_gap_days"),
        asLong(col("latest_gap")).as("latest_gap_days"),
        asLong(col("latest_gap") - col("median_gap") * 3).as("excess_days"))
      .orderBy(col("excess_days").desc, col("custkey"))
      .limit(20)
  }

  /** Current active-day streak (§2.32): the length of each user's
    * LAST consecutive-day island — the "don't break the chain" metric
    * ts_streak_longest's historical max doesn't answer (a user whose
    * longest streak was months ago has current = their latest run).
    * Same gaps-islands anchor (day − row_number = island id) over the
    * user-bounded window; "current" island = the one holding the
    * user's max day, picked by an integer max over island anchors —
    * no second window pass. Top-20 by (streak, last_day, user), all
    * total-order BIGINT/date keys, via TakeOrdered. */
  val winStreakCurrent: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val islands = table(s, d, "events")
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), max(col("day")).as("last_day"))
    islands.groupBy(col("user_id"))
      .agg(max(struct(col("last_day"), col("len"))).as("cur"))
      .select(col("user_id"),
        asLong(col("cur.len")).as("current_streak"),
        col("cur.last_day").as("last_active_day"))
      .orderBy(col("current_streak").desc, col("last_active_day").desc,
        col("user_id"))
      .limit(20)
  }

  /** Per-segment revenue dominance (§2.38): within each customer
    * segment (custkey%10), the gap between the top and second
    * customer's lifetime revenue and the top's share of the top-2 mass
    * — the key-account concentration read a per-segment Gini blurs
    * (two equal whales vs one dominant account Gini alike; the
    * dominance ratio separates them). All BIGINT cents; top-2 via a
    * rank window filtered to rk <= 2 (the sample_k_per_group shape —
    * Spark's WindowGroupLimit keeps only k rows of state per
    * partition). Scale: one customer-grain aggregate + one segment
    * shuffle; 10 rows. */
  val winRevenueDominance: graft.ops.Q = (s, d) => {
    val perCust = table(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((dec2(col("o_totalprice")) * 100).cast(LongType)).as("rev"))
      .withColumn("seg", (col("o_custkey") % 10).cast(LongType))
    val w = Window.partitionBy(col("seg"))
      .orderBy(col("rev").desc, col("o_custkey"))
    perCust.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .groupBy(col("seg"))
      .agg(max(when(col("rk") === 1, col("o_custkey"))).as("top_cust"),
        max(when(col("rk") === 1, col("rev"))).as("top_rev_cents"),
        max(when(col("rk") === 2, col("rev"))).as("second_rev_cents"))
      .select(col("seg"), asLong(col("top_cust")).as("top_cust"),
        col("top_rev_cents"), col("second_rev_cents"),
        (col("top_rev_cents") - col("second_rev_cents")).as("gap_cents"),
        expr("(top_rev_cents * 1000000) div (top_rev_cents + second_rev_cents)")
          .as("dominance_q6"))
      .orderBy("seg")
  }

  /** Leaderboard churn (§2.44): month-over-month turnover of the
    * top-10 supplier revenue leaderboard — overlap with last month's
    * set, churn = k − overlap; a stable board means concentration
    * (win_revenue_dominance's temporal face), a churning one means
    * the "top supplier" readout is noise. Exactness: monthly ranks
    * are integer windows with supplier ties; overlap is an exact
    * set-intersection count; k = min(10, suppliers that month).
    * Scale: ONE (month, supplier) map-combined fact aggregate; the
    * rank window is month-keyed (parallel across months,
    * WindowGroupLimit keeps 10 rows of state); consecutive-month
    * overlap joins the ≤10·|months| bounded top relation. */
  val winLeaderboardChurn: Q = (s, d) => {
    val monthly = table(s, d, "lineitem")
      .groupBy(trunc(col("l_shipdate").cast(DateType), "month").as("mo"),
        col("l_suppkey"))
      .agg(sum((dec2(col("l_extendedprice")) * 100).cast(LongType)).as("rev"))
    val wM = Window.partitionBy(col("mo"))
      .orderBy(col("rev").desc, col("l_suppkey"))
    val top = monthly.withColumn("rk", row_number().over(wM))
      .filter(col("rk") <= 10)
      .select(col("mo"), col("l_suppkey"))
      .localCheckpoint(true)
    val kPer = top.groupBy(col("mo")).agg(count(lit(1)).as("k"))
    val ov = top.toDF("m1", "sk1")
      .join(top.toDF("m2", "sk2"),
        col("m2") === add_months(col("m1"), 1) && col("sk1") === col("sk2"))
      .groupBy(col("m2").as("mo")).agg(count(lit(1)).as("overlap"))
    kPer.toDF("mo", "k_cur")
      .join(broadcast(kPer.toDF("mp", "k_prev")),
        col("mp") === add_months(col("mo"), -1))
      .join(broadcast(ov), Seq("mo"), "left")
      .select(col("mo").as("month"), asLong(col("k_prev")).as("k_prev"),
        asLong(col("k_cur")).as("k_cur"),
        asLong(coalesce(col("overlap"), lit(0L))).as("overlap"),
        asLong(col("k_cur") - coalesce(col("overlap"), lit(0L))).as("churn"))
      .orderBy("month")
  }

}
