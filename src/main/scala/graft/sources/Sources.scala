package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-enforced ingestion for the formats a pipeline meets besides
  * parquet. Schemas are always supplied explicitly (never inferred) —
  * at 100 TB an inference pass is a full extra scan, and inferred
  * types drift between days of data; explicit schemas fail fast
  * instead (FAILFAST mode surfaces malformed rows immediately rather
  * than nulling them silently).
  */
object Sources {

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "FAILFAST")
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    graft.Tables.read(spark, path) // ns-timestamp tolerant

  /** ORC: the other columnar warehouse format (predicate pushdown and
    * column pruning work the same as parquet — Spark ships the reader).
    * Schema supplied for uniformity with the other readers; ORC files
    * carry their own types, so this acts as a fail-fast contract check
    * rather than inference avoidance. */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Line-oriented text (one string column `value`) — the raw-corpus
    * entry point before any parsing. */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
}
