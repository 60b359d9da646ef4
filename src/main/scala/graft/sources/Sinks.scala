package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Write-side layout control (build brief: "repartition/bucketing for
  * co-located joins"): the two physical-layout levers that matter at
  * 100 TB.
  *
  * - `writePartitioned`: hive-style directory partitioning; reads with
  *   a predicate on the partition column scan only matching
  *   directories (PartitionFilters in the plan — verified in
  *   SinksSpec).
  * - `writeBucketed`: pre-shuffled bucket layout via saveAsTable; an
  *   equi-join of two tables bucketed on the join key by the same
  *   bucket count runs with NO Exchange on either side (verified in
  *   SinksSpec) — the standing co-location that makes repeated
  *   fact-fact joins affordable at scale.
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  def writeBucketed(df: DataFrame, tableName: String, buckets: Int,
      bucketCol: String, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(tableName)
  }
}
