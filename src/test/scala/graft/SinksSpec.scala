package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sinks

/** Physical-layout levers: partition pruning and shuffle-free bucketed
  * joins, asserted on the executed plans. */
class SinksSpec extends AnyFunSuite {
  import SharedSpark._

  test("partitioned write enables partition pruning on read") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    Sinks.writePartitioned(
      Tables(spark, sf0001, "events").select("event_id", "event_type", "value"),
      out, "event_type")
    val q = spark.read.parquet(out).filter(col("event_type") === "purchase")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(q.count() ==
      Tables(spark, sf0001, "events").filter(col("event_type") === "purchase").count())
  }

  test("declared src_partitioned_roundtrip actually prunes to one directory") {
    // the declared query's own plan (not just the Sinks mechanism):
    // the event_type predicate must resolve to PartitionFilters on the
    // written layout — i.e. only the purchase/ directory is scanned
    val q = graft.sources.Sources.via(spark, sf0001, "events", "parquet_partitioned")
      .filter(col("event_type") === "purchase")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(!plan.toLowerCase.contains("pushedfilters: [isnotnull(event_type"),
      "event_type should be a partition filter, not a data filter")
  }

  test("csv and json round-trip with enforced schemas") {
    val docs = Tables(spark, sf0001, "documents")
    val out = java.nio.file.Files.createTempDirectory("graft_src").toString
    docs.write.mode("overwrite").option("header", "true").csv(s"$out/csv")
    docs.write.mode("overwrite").json(s"$out/json")
    val viaCsv = graft.sources.Sources.readCsv(spark, s"$out/csv", docs.schema)
    val viaJson = graft.sources.Sources.readJson(spark, s"$out/json", docs.schema)
    assert(viaCsv.count() == docs.count() && viaJson.count() == docs.count())
    assert(viaCsv.exceptAll(docs).count() == 0)
    assert(viaJson.exceptAll(docs).count() == 0)
    assert(viaCsv.schema == docs.schema)
    docs.write.mode("overwrite").orc(s"$out/orc")
    val viaOrc = graft.sources.Sources.readOrc(spark, s"$out/orc", docs.schema)
    assert(viaOrc.exceptAll(docs).count() == 0)
    docs.select("text").write.mode("overwrite").text(s"$out/txt")
    val viaText = graft.sources.Sources.readText(spark, s"$out/txt")
    assert(viaText.columns.toSeq == Seq("value"))
    assert(viaText.count() == docs.filter(col("text").isNotNull).count())
  }

  test("compaction bin-packs small files without changing the data") {
    val docs = Tables(spark, sf0001, "documents")
    val out = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate a fine-grained append history: 20 tiny files
    docs.repartition(20).write.mode("overwrite").parquet(out)
    val before = docs.orderBy("doc_id").collect().toSeq
    val (nBefore, nAfter) = sources.Maintenance.compact(spark, out, targetBytes = 64L * 1024 * 1024)
    assert(nBefore == 20 && nAfter == 1, s"$nBefore -> $nAfter")
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files == 1)
    assert(spark.read.parquet(out).orderBy("doc_id").collect().toSeq == before)
  }

  test("compaction converts a streaming-sink directory into a plain table") {
    // a real streaming sink: rate source -> parquet files + _spark_metadata
    val out = java.nio.file.Files.createTempDirectory("graft_sinkcompact").toString
    val q = graft.streaming.Streams.rateEvents(spark, rowsPerBatch = 50)
      .writeStream.format("parquet")
      .option("path", s"$out/t")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
      .start()
    try {
      val deadline = System.nanoTime() + 60L * 1000000000L
      while (q.recentProgress.length < 4 && System.nanoTime() < deadline)
        Thread.sleep(100)
    } finally { q.stop(); q.awaitTermination() }
    val committed = spark.read.parquet(s"$out/t").collect().sortBy(_.getLong(0)).toSeq
    assert(committed.nonEmpty)
    assert(new java.io.File(s"$out/t/_spark_metadata").isDirectory)
    val (nBefore, nAfter) = sources.Maintenance.compact(spark, s"$out/t", 64L * 1024 * 1024)
    assert(nBefore > nAfter)
    // stale streaming log removed; the plain-table read sees the data
    assert(!new java.io.File(s"$out/t/_spark_metadata").exists())
    assert(spark.read.parquet(s"$out/t").collect().sortBy(_.getLong(0)).toSeq == committed)
  }

  test("schema-evolution read spans appended generations") {
    val out = java.nio.file.Files.createTempDirectory("graft_evolve").toString + "/t"
    val s = spark
    import s.implicits._
    Seq((1L, "a")).toDF("id", "v").write.mode("overwrite").parquet(out)
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.mode("append").parquet(out)
    val evolved = sources.Maintenance.readEvolved(spark, out)
    assert(evolved.columns.sorted.toSeq == Seq("id", "score", "v"))
    assert(evolved.count() == 2)
    assert(evolved.filter(col("id") === 1L).select("score").collect()(0).isNullAt(0))
    assert(evolved.filter(col("id") === 2L).select("score").collect()(0).getDouble(0) == 9.5)
  }

  test("merge upserts by key: updates replace, inserts append") {
    val s = spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft_merge").toString + "/t"
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "v").write.mode("overwrite").parquet(out)
    val updates = Seq((2L, "b2", 20.0), (4L, "d", 4.0)).toDF("id", "name", "v")
    val n = sources.Maintenance.merge(spark, out, updates, Seq("id"))
    assert(n == 4)
    val back = spark.read.parquet(out).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(back == Seq((1L, "a", 1.0), (2L, "b2", 20.0), (3L, "c", 3.0), (4L, "d", 4.0)))
  }

  test("bucketed tables join without any Exchange (co-located join)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    // a previous JVM's managed-table location survives the (fresh,
    // in-memory) catalog — clear it so saveAsTable can create
    Seq("orders_b", "customer_b").foreach { t =>
      s2.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val o = s2.read.parquet(s"$sf0001/orders.parquet")
    val c = s2.read.parquet(s"$sf0001/customer.parquet")
    Sinks.writeBucketed(o, "orders_b", 4, "o_custkey", Some("o_custkey"))
    Sinks.writeBucketed(c, "customer_b", 4, "c_custkey", Some("c_custkey"))
    val j = s2.table("orders_b")
      .join(s2.table("customer_b"), col("o_custkey") === col("c_custkey"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in bucketed join:\n$plan")
    assert(j.count() ==
      o.join(c, col("o_custkey") === col("c_custkey")).count())
  }
}
