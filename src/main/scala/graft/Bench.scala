package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: sum of per-query seconds on SPARK_GRAFT_SF_DIR
  * (default sf0.1), one fresh JVM, session startup excluded — matching
  * BASELINE.md's warm-process methodology. Budget: <= 52 s at sf0.1.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shuffle parallelism is decoupled from executor threads: at sf0.1
    // every shuffle is KB-scale, so 32 tasks/stage is pure scheduling
    // overhead (measured ~15% of suite total); 8 keeps sorts/joins
    // parallel enough while map-side outputs stay contiguous. On a real
    // cluster this knob is workload-sized (SCALING.md) — AQE coalesces
    // from a high initial value instead.
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // At local KB-scale shuffles AQE only adds per-stage re-planning
      // latency (~0.1 s/query over 82 queries); on a real cluster leave
      // it on — it is the runtime skew/coalesce lever (SCALING.md).
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed JIT/codegen warmup: run the whole suite once on sf0.001
    // (BASELINE.md measures a warm process: DuckDB numbers are from a
    // warm session and Spark's 10 s startup is excluded by design).
    // This JIT-compiles every query's generated code without touching
    // the benchmarked sfDir's data or caches.
    val warm = "/root/testdata/sf0.001"
    SparkEntry.queries.values
      .foreach(fn => try fn(spark, warm).count() catch { case _: Throwable => () })
    // drop warmup caches (sf0.001 tables/EDGES/shingles/rankings) so the
    // timed run starts with a clean heap — the sf0.1 caches it builds
    // are part of the measured work, exactly as before
    Tables.clear()
    ops.Pipelines.clearCache()
    ops.TextSim.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(
      rdd => try rdd.unpersist(blocking = false) catch { case _: Throwable => () })
    System.gc()

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }.toSeq
    val failed = results.collect { case (n, _, false) => n }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + (math.round(v * 1000) / 1000.0) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Detail line first, short total-only line LAST: the driver
    // tail-captures stdout, so the parseable summary must be the final
    // line (round 1's total was lost to truncation of one giant line).
    println(s"""{"metric":"detail","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"failed":${failed.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
