package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate aggregates (SURVEY.md §2 "declared but non-oracle"):
  * sketch outputs are engine-specific so they cannot hash-match DuckDB;
  * the test suite bounds them against exact results instead. These are
  * the sub-linear-memory paths for 100 TB cardinality/quantile work.
  */
object Approx {

  /** HLL++ distinct parts/suppliers per return flag vs exact. */
  def approxDistinct(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag")

  /** Heavy hitters: frequent part keys among high-quantity lines via
    * the stat-functions frequent-items sketch (Karp et al.) vs the
    * exact top by count — the sub-linear-memory "top sellers" path. */
  def frequentItems(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val hot = table(spark, sfDir, "lineitem").filter(col("l_quantity") > 45)
    val approx = hot.stat.freqItems(Array("l_suppkey"), 0.01)
    val exact = hot.groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("l_suppkey"))
    (approx, exact)
  }

  /** Mergeable-sketch rollup — THE 100 TB cardinality pattern: build
    * one datasketches HLL per partition-sized slice (here per source),
    * persist the binary sketches, then answer any union of slices by
    * MERGING sketches (`hll_union_agg`) without touching the raw data
    * again. A 100 TB corpus pre-aggregates daily/per-partition
    * sketches once; every dashboard query after that is a merge over
    * kilobytes. Returns (per-slice sketches, merged whole-corpus
    * estimate). */
  def sketchRollup(spark: SparkSession, sfDir: String): (DataFrame, DataFrame) = {
    val perSource = table(spark, sfDir, "documents")
      .groupBy(col("source"))
      .agg(hll_sketch_agg(col("text"), lit(12)).as("sketch"),
        countDistinct(col("text")).as("exact_distinct"))
    val merged = perSource
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("approx_distinct_total"))
    (perSource, merged)
  }

  /** Approximate quantiles of order totals vs exact percentiles.
    * Round 16: the exact side rides [[ExactQuantile.quantiles]]
    * (bit-identical to `percentile()` by the replayed interpolation
    * formula) — o_totalprice has ~1 distinct value per row, so the
    * old single-buffer `percentile()` was the last data-sized
    * counts-map merge in `src/main`; comparison semantics unchanged
    * (same doubles, same array shape). */
  def approxQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = table(spark, sfDir, "orders")
    val (_, ex) = ExactQuantile.quantiles(orders, col("o_totalprice"),
      None, Seq(0.5, 0.95), bucketWidth = 64.0)("")
    orders.agg(
      percentile_approx(col("o_totalprice"), array(lit(0.5), lit(0.95)), lit(10000))
        .as("approx_p"),
      array(lit(ex(0.5)), lit(ex(0.95))).as("exact_p"))
  }
}
