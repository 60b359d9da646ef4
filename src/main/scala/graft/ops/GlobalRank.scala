package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Range-partitioned two-pass global ordering (SURVEY.md §4; round-8).
  *
  * `Window.orderBy(...)` with no partition spec moves EVERY row to a
  * single task ("WindowExec: No Partition Defined") — correct at bench
  * scale, hopeless at 100 TB. This utility computes the same global
  * row_number / ntile / running-sum with the plan you'd want on a
  * 1000-executor cluster:
  *
  *   1. `repartitionByRange(order)` + `sortWithinPartitions(order)` —
  *      ONE range shuffle, each task holds a contiguous, locally
  *      sorted slice of the global order;
  *   2. `monotonically_increasing_id()` stamps
  *      `(partitionId << 33) | localRow` per row — local row position
  *      in sorted order, no window needed. The stamped slice is
  *      persisted so pass 2 sees the exact ids pass 1 counted
  *      (recomputation could legally resample range boundaries);
  *   3. per-partition row counts (≤ numParts rows) are collected —
  *      the same bounded-driver-scalar convention as the suite's other
  *      broadcast thresholds — and turned into exclusive prefix
  *      offsets, broadcast back;
  *   4. global position = offset(partition) + localRow + 1. ntile /
  *      percent_rank / cume_dist are then pure per-row arithmetic in
  *      the global N (driver-known); a running sum adds a
  *      partition-LOCAL window (partitionBy the slice id — parallel,
  *      never single-task) on top of per-partition sum offsets.
  *
  * Requirements: `order` must be a TOTAL order (include a unique
  * tiebreak) — ties may straddle range-partition boundaries, so
  * without a tiebreak local positions of tied rows are
  * nondeterministic. All three call sites (agg_decile_table,
  * win_ntile_dist, ts_peak_concurrency) totalize their order; the
  * peak-concurrency sweep additionally tolerates tie splits by
  * construction (all deltas in a tie group share a sign, so the
  * group's running extremum is order-free).
  *
  * The stamped slice is persisted per call and registered for the
  * bench's between-run RDD sweep (Bench.scala clears all persistent
  * RDDs between runs); within a run each query builds it once.
  */
object GlobalRank {

  private val LocalMask = (1L << 33) - 1

  /** (df + `rnCol` BIGINT global 1-based row number in `order`, plus a
    * retained `__grpid` slice-id column for optional local windows;
    * total row count). Caller drops `__grpid` when done.
    */
  def ranked(df: DataFrame, order: Seq[Column], rnCol: String,
             numParts: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val np =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val m = df
      .repartitionByRange(np, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pid = shiftright(col("__mid"), 33).cast(LongType)
    val counts = m.groupBy(pid.as("__grpid"))
      .agg(count(lit(1)).as("__cnt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    val total = counts.iterator.map(_._2).sum
    var acc = 0L
    val offsets = counts.map { case (p, n) =>
      val o = (p, acc); acc += n; o
    }.toSeq
    val offs = offsets.toDF("__grpid", "__off")
    val out = m
      .withColumn("__grpid", pid)
      .join(broadcast(offs), "__grpid")
      .withColumn(rnCol,
        (col("__off") + col("__mid").bitwiseAND(lit(LocalMask)) + 1L)
          .cast(LongType))
      .drop("__mid", "__off")
    (out, total)
  }

  /** Standard SQL ntile bucket (1-based BIGINT) from a global 1-based
    * row number `rn` over `total` rows: the first `total % k` buckets
    * get `total/k + 1` rows, the rest `total/k` — exactly Spark's and
    * DuckDB's NTILE. Pure per-row arithmetic (constants are
    * driver-side literals); the q=0 branch (total < k) never divides
    * by zero because the `when` arm covers all rows then.
    */
  def ntileOf(rn: Column, total: Long, k: Int): Column = {
    val q = total / k
    val r = total % k
    when(rn <= lit((q + 1) * r),
      ((rn - 1) - pmod(rn - 1, lit(q + 1))) / lit(q + 1) + 1L)
      .otherwise(
        lit(r) + ((rn - lit((q + 1) * r)) - 1 -
          pmod((rn - lit((q + 1) * r)) - 1, lit(q))) / lit(q) + 1L)
      .cast(LongType)
  }

  /** percent_rank over a TOTAL order: (rn-1)/(N-1) in IEEE double —
    * identical to the window function when the order has no ties
    * (rank == row_number). 0.0 for N <= 1.
    */
  def percentRankOf(rn: Column, total: Long): Column =
    if (total <= 1L) lit(0.0)
    else (rn - 1).cast(DoubleType) / lit((total - 1).toDouble)

  /** cume_dist over a TOTAL order: rn/N in IEEE double. */
  def cumeDistOf(rn: Column, total: Long): Column =
    rn.cast(DoubleType) / lit(total.toDouble)

  /** df + `out` = global running sum (ROWS UNBOUNDED PRECEDING..CURRENT
    * ROW) of BIGINT column `valueCol` in `order`: per-partition value
    * sums become broadcast prefix offsets, the local running sum is a
    * partition-LOCAL window (partitionBy slice — parallel), and the
    * global sum is offset + local. Same total-order requirement as
    * `ranked` (tie groups may split across slices; see class doc).
    */
  def withRunningSum(df: DataFrame, order: Seq[Column], valueCol: String,
                     out: String, numParts: Int = 0): DataFrame =
    withRunningSums(df, order, Seq(valueCol -> out), numParts)

  /** Multi-column generalization of `withRunningSum`: ONE range shuffle
    * and ONE bounded offsets collect produce a global running sum per
    * (valueCol -> outCol) pair — the two-sample cumulative-count shape
    * (KS / Mann–Whitney ECDFs) without paying the shuffle twice. Same
    * total-order requirement as `ranked`.
    */
  def withRunningSums(df: DataFrame, order: Seq[Column],
                      cols: Seq[(String, String)],
                      numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val np =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val m = df
      .repartitionByRange(np, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pid = shiftright(col("__mid"), 33).cast(LongType)
    val sums = m.groupBy(pid.as("__grpid"))
      .agg(cols.map { case (v, _) => sum(col(v)).as(s"__s_$v") }.head,
        cols.map { case (v, _) => sum(col(v)).as(s"__s_$v") }.tail: _*)
      .collect()
      .map(r => (r.getLong(0), cols.indices.map(i => r.getLong(i + 1))))
      .sortBy(_._1)
    val accs = Array.fill(cols.size)(0L)
    val offsets = sums.map { case (p, ss) =>
      val o = (p, accs.toSeq)
      ss.indices.foreach(i => accs(i) += ss(i))
      o
    }.toSeq
    val offs = offsets
      .map { case (p, os) => Row.fromSeq(p +: os) }
    val offSchema = StructType(
      StructField("__grpid", LongType) +:
        cols.map { case (v, _) => StructField(s"__off_$v", LongType) })
    val offsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offs, 1), offSchema)
    val wLocal = Window.partitionBy(col("__grpid")).orderBy(col("__mid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = cols.foldLeft(
      m.withColumn("__grpid", pid).join(broadcast(offsDf), "__grpid")) {
      case (acc, (v, out)) =>
        acc.withColumn(out,
          (col(s"__off_$v") + sum(col(v)).over(wLocal)).cast(LongType))
    }
    withLocal.drop("__mid" +: "__grpid" +: cols.map { case (v, _) => s"__off_$v" }: _*)
  }

  /** Global EXCLUSIVE-prefix running max of BIGINT `valueCol` in
    * `order` (the skyline/frontier primitive: "best value among rows
    * STRICTLY before me"). Same range-partitioned two-pass shape as
    * `withRunningSum`: per-slice maxima become broadcast
    * exclusive-prefix offsets (max is associative, so the prefix
    * reduce is the same fold with max for +), the local exclusive
    * prefix max is a partition-LOCAL window ending at -1 PRECEDING,
    * and the global value is greatest(offset, local). The first row
    * of the global order gets NULL (no predecessor). Total-order
    * requirement as `ranked`. */
  def withRunningMaxExclusive(df: DataFrame, order: Seq[Column],
                              valueCol: String, out: String,
                              numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val np =
      if (numParts > 0) numParts
      else spark.sessionState.conf.numShufflePartitions
    val m = df
      .repartitionByRange(np, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pid = shiftright(col("__mid"), 33).cast(LongType)
    val maxes = m.groupBy(pid.as("__grpid"))
      .agg(max(col(valueCol)).as("__mx"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    // exclusive prefix max over slices: offset(p) = max of all earlier
    // slices' maxima, null for the first slice
    var acc: Option[Long] = None
    val offsets = maxes.map { case (p, mx) =>
      val o = (p, acc)
      acc = Some(acc.fold(mx)(math.max(_, mx)))
      o
    }.toSeq
    val offs = offsets
      .map { case (p, ov) => Row(p, ov.map(Long.box).orNull) }
    val offSchema = StructType(Seq(
      StructField("__grpid", LongType),
      StructField("__moff", LongType, nullable = true)))
    val offsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offs, 1), offSchema)
    val wLocal = Window.partitionBy(col("__grpid")).orderBy(col("__mid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    m.withColumn("__grpid", pid)
      .join(broadcast(offsDf), "__grpid")
      .withColumn(out,
        greatest(col("__moff"), max(col(valueCol)).over(wLocal)).cast(LongType))
      .drop("__mid", "__moff", "__grpid")
  }
}
