package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table maintenance for raw-parquet directories — the operational
  * layer a long-lived 100 TB dataset needs between full table-format
  * adoption (Delta/Iceberg) and nothing:
  *
  *  - `compact`: bin-pack a directory of small files into
  *    ~targetBytes outputs. Streaming sinks and fine-grained appends
  *    produce thousands of KB-scale files; at scale every query then
  *    pays one task + one footer-read per file. Compaction rewrites to
  *    sized files and swaps the directory. NOT transactional — a
  *    concurrent reader can observe the swap window; that isolation
  *    (plus schema enforcement on write and time travel) is exactly
  *    what a table format adds (SCALING.md §Table formats), and this
  *    API is the migration seam.
  *  - `readEvolved`: schema-evolution read across appended
  *    generations (mergeSchema) — older files surface added columns
  *    as nulls.
  */
object Maintenance {

  /** Rewrite `dir` (a parquet directory) into ~ceil(totalBytes /
    * targetBytes) files. Returns (filesBefore, filesAfter), counted on
    * disk. A streaming sink's `_spark_metadata` log is DELETED by the
    * rewrite: it enumerates the pre-compaction files (readers prefer
    * it over a directory listing, so leaving it would break every
    * read), and deleting it converts the sink directory into a plain
    * parquet table — which is what a compacted history is. */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): (Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    def dataFiles = fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val before = dataFiles
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.option("mergeSchema", "true").parquet(dir)
    val tmp = new Path(dir + "__compacting")
    fs.delete(tmp, true)
    // coalesce when shrinking below the scan's partitioning (pure
    // bin-packing, no shuffle); repartition when the target needs MORE
    // files than the scan plans (coalesce cannot split partitions and
    // would silently blow past targetBytes)
    val scanParts = df.rdd.getNumPartitions
    val sized = if (nOut <= scanParts) df.coalesce(nOut) else df.repartition(nOut)
    sized.write.mode("overwrite").parquet(tmp.toString)
    swapInto(fs, path, tmp)
    (before.length, dataFiles.length)
  }

  /** Directory swap shared by compact/merge: drop old data files +
    * marker files + a streaming sink's (now stale) `_spark_metadata`
    * log, move the rewritten files in, remove the tmp dir. Not
    * transactional — a table format is; see the class scaladoc. */
  private def swapInto(fs: org.apache.hadoop.fs.FileSystem,
      path: Path, tmp: Path): Unit = {
    fs.listStatus(path)
      .filter { s =>
        val n = s.getPath.getName
        (s.isFile && (n.endsWith(".parquet") || n.startsWith("_"))) ||
          (s.isDirectory && n == "_spark_metadata")
      }
      .foreach(s => fs.delete(s.getPath, s.isDirectory))
    fs.listStatus(tmp)
      .filter(_.isFile)
      .foreach(s => fs.rename(s.getPath, new Path(path, s.getPath.getName)))
    fs.delete(tmp, true)
  }

  /** Read a parquet directory whose files span schema generations:
    * union of all fields, missing columns null. */
  def readEvolved(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(dir)

  /** Upsert (MERGE): rows in `updates` replace same-key rows in the
    * table at `dir`; unmatched update rows are inserted. One anti-join
    * + union + directory swap — the Delta MERGE shape on raw parquet,
    * with the same non-transactionality caveat as `compact` (a table
    * format makes the swap atomic; this is the migration seam).
    * Returns the post-merge row count. */
  def merge(spark: SparkSession, dir: String, updates: DataFrame,
      keyCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "merge requires at least one key column")
    val current = spark.read.parquet(dir)
    require(current.columns.sameElements(updates.columns),
      s"merge schema mismatch: table ${current.columns.mkString(",")} vs " +
        s"updates ${updates.columns.mkString(",")}")
    // Delta MERGE fails on multiple source matches; mirror that —
    // duplicate update keys would otherwise corrupt the key invariant
    val dupKeys = updates.groupBy(keyCols.map(updates(_)): _*)
      .count().filter(org.apache.spark.sql.functions.col("count") > 1).count()
    require(dupKeys == 0, s"updates contain $dupKeys duplicate key(s) — " +
      "dedupe (e.g. keep latest) before merging")
    val kept = current.join(updates.select(keyCols.map(
      c => updates(c)): _*), keyCols, "left_anti")
    val merged = kept.unionByName(updates)
    val tmp = new Path(dir + "__merging")
    val conf = spark.sessionState.newHadoopConf()
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    fs.delete(tmp, true)
    merged.write.mode("overwrite").parquet(tmp.toString)
    val n = spark.read.parquet(tmp.toString).count()
    swapInto(fs, path, tmp)
    n
  }
}
