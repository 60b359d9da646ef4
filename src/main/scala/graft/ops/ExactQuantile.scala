package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed EXACT interpolated percentiles — the scale-safe
  * replacement for Spark's `percentile()` aggregate at fact grain.
  *
  * Spark's exact `percentile()`/`median()` buffers EVERY value into a
  * single final aggregation buffer per group (an OpenHashMap merged on
  * one task): at 100 TB that is an executor-OOM/serialization wall —
  * the round-13 100×-tier measurement caught `agg_winsorized_mean` at
  * 113.6 s wall ≈ 134.5 CPU-s, i.e. effectively serialized. This
  * helper computes the SAME bits with the two-pass bucketed recipe
  * already proven by [[Relational.aggWeightedMedian]]:
  *
  *  - pass 1: a map-side-combinable bucket histogram
  *    (`floor(v / bucketWidth)` per group) whose bounded result —
  *    (value range / bucketWidth) × |groups| rows, NOT data-sized —
  *    is prefix-scanned on the driver to locate, for each requested
  *    percentile, the bucket(s) holding the two order statistics the
  *    interpolation needs;
  *  - pass 2: a distinct-value count restricted (broadcast semi-join)
  *    to those crossing buckets only — ~1/|buckets| of the data, with
  *    at most `bucketWidth × value-quantum` distinct values per bucket
  *    — from which the driver reads the exact order statistics.
  *
  * The interpolation then replays Spark's `Percentile.getPercentile`
  * FORMULA bit-for-bit (position = p·(n−1); lower/higher =
  * floor/ceil; result = (higher−position)·lo + (position−lower)·hi,
  * with the two degenerate early-outs) so callers that previously
  * wrapped `percentile()` keep byte-identical results —
  * ExactQuantileSpec pins `quantiles == percentile()` on real data
  * across grouped/ungrouped shapes and knife-edge percentiles.
  *
  * Both passes are hash aggregates (map-combined, shuffle bounded by
  * the histogram/distinct-value width, never by row count); the only
  * driver-side work is over those bounded relations — the
  * aggWeightedMedian discipline, shared instead of re-derived.
  *
  * Contract: `bucketWidth` must keep (max−min)/bucketWidth modest
  * (10³–10⁵ buckets per group) — callers pass a width sized to the
  * column's domain (price-like domains here: width 64 ⇒ ≤ ~10⁴
  * buckets regardless of row count).
  *
  * Eager + non-empty: both passes run collect() jobs WHEN CALLED (a Q
  * that builds on this executes two bounded jobs at DataFrame-
  * construction time — by design: the thresholds enter the plan as
  * literals so the final fold stays one map-combined pass). An input
  * with zero non-null values yields an EMPTY map (no synthetic NULL
  * row like the percentile() aggregate) — callers indexing a group
  * key must either guarantee non-empty input (every Relational caller
  * does: the TPC-H tables) or handle the missing key themselves.
  */
object ExactQuantile {

  /** Per-group exact ORDER STATISTICS of `value` (cast to double,
    * nulls ignored): for each group of non-null count n, returns the
    * exact value at every 0-indexed rank `ranksOf(n)` asks for — the
    * primitive both [[quantiles]] (interpolated percentile ranks) and
    * rank-convention callers (lower median, trimmed bounds at exact
    * cut ranks) build on. Same two-pass bucketed shape; see the
    * object Scaladoc.
    *
    * @param group  optional grouping column; None = one global group
    *               (returned under key "")
    * @return group key (as string) → (non-null count, rank → value)
    */
  def valueAtRanks(df: DataFrame, value: Column, group: Option[Column],
      ranksOf: Long => Seq[Long], bucketWidth: Double)
      : Map[String, (Long, Map[Long, Double])] = {
    val spark = df.sparkSession
    val base = df
      .select(group.getOrElse(lit("")).cast(StringType).as("g"),
        value.cast(DoubleType).as("v"))
      .filter(col("v").isNotNull)
      .select(col("g"), col("v"),
        floor(col("v") / bucketWidth).cast(LongType).as("b"))

    // pass 1: bounded histogram, exact BIGINT counts
    val hist = base.groupBy(col("g"), col("b"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (g, rows) =>
        val sorted = rows.sortBy(_._2).map(r => (r._2, r._3)).toIndexedSeq
        (g, sorted, sorted.map(_._2).sum)
      }

    // rank -> owning bucket + cumulative count below that bucket
    def bucketOf(buckets: IndexedSeq[(Long, Long)], rank: Long): (Long, Long) = {
      var cum = 0L
      buckets.foreach { case (b, c) =>
        if (rank < cum + c) return (b, cum)
        cum += c
      }
      throw new IllegalStateException(s"rank $rank out of range (n=$cum)")
    }

    val needed: Seq[(String, Long)] = hist.toSeq.flatMap { case (g, buckets, n) =>
      ranksOf(n).distinct.map(r => (g, bucketOf(buckets, r)._1))
    }.distinct

    // pass 2: distinct-value counts inside crossing buckets only
    import spark.implicits._
    val needDf = needed.toDF("g", "b")
    val inBucket = base
      .join(broadcast(needDf), Seq("g", "b"), "left_semi")
      .groupBy(col("g"), col("b"), col("v"))
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .groupBy(t => (t._1, t._2))
      .map { case (k, rows) =>
        (k, rows.sortBy(_._3)(Ordering.fromLessThan[Double](
          (a, b) => java.lang.Double.compare(a, b) < 0))
          .map(t => (t._3, t._4)).toIndexedSeq)
      }

    hist.map { case (g, buckets, n) =>
      def valueAt(rank: Long): Double = {
        val (b, below) = bucketOf(buckets, rank)
        var local = rank - below
        val vals = inBucket((g, b))
        vals.foreach { case (v, c) =>
          if (local < c) return v
          local -= c
        }
        throw new IllegalStateException(s"local rank exhausted in bucket $b")
      }
      (g, (n, ranksOf(n).distinct.map(r => (r, valueAt(r))).toMap))
    }.toMap.withDefault(missing)
  }

  /** Self-explaining failure for a group lookup with no rows (round-16
    * advice): ungrouped callers do `(...)("")` eagerly, so an empty
    * input relation used to surface as a bare NoSuchElementException.
    * The replaced `percentile()` would return NULL there; this exact
    * face documents n > 0 as a precondition instead — the error says
    * so. */
  private def missing(g: String): Nothing = throw new IllegalStateException(
    s"ExactQuantile: no rows for group '$g' — empty input relation " +
      "(percentile() would return NULL here; this exact face requires " +
      "n > 0, see the object Scaladoc)")

  /** The two 0-indexed order statistics Spark's percentile
    * interpolation reads for probability p at count n. */
  private def percentileRanks(n: Long, p: Double): Seq[Long] = {
    val position = p * (n - 1)
    val lower = math.floor(position).toLong
    val higher = math.ceil(position).toLong
    if (higher == lower) Seq(lower) else Seq(lower, higher)
  }

  /** Per-group exact interpolated percentiles of `value` (cast to
    * double, nulls ignored — `percentile()` semantics).
    *
    * @param group  optional grouping column; None = one global group
    *               (returned under key "")
    * @return group key (as string) → (non-null count, p → quantile)
    */
  def quantiles(df: DataFrame, value: Column, group: Option[Column],
      ps: Seq[Double], bucketWidth: Double): Map[String, (Long, Map[Double, Double])] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1]: $ps")
    val stats = valueAtRanks(df, value, group,
      n => ps.flatMap(p => percentileRanks(n, p)), bucketWidth)
    stats.map { case (g, (n, atRank)) =>
      // Spark Percentile.getPercentile, replayed verbatim: the exact
      // double expression ORDER matters for bit-equality
      def interp(p: Double): Double = {
        val position = p * (n - 1)
        val lower = math.floor(position).toLong
        val higher = math.ceil(position).toLong
        val lo = atRank(lower)
        if (higher == lower) lo
        else {
          val hi = atRank(higher)
          if (hi == lo) lo
          else (higher - position) * lo + (position - lower) * hi
        }
      }
      (g, (n, ps.map(p => (p, interp(p))).toMap))
    }.withDefault(missing) // mapping stats drops valueAtRanks' default
  }
}
