package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Export

/** Deterministic training-shard export (§2.55): determinism, full
  * coverage, budget compliance, manifest verifiability, the write
  * face, and the Naqed `$action -> export` surface. */
class ExportSpec extends AnyFunSuite {
  import SharedSpark._

  private val Budget = 2048L
  private lazy val docs = Tables(spark, sf0001, "documents")
  private lazy val sharded = Export.assignShards(docs, Budget)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  test("pack covers the corpus exactly: sum of shards == curated input") {
    val man = Export.manifest(sharded).collect()
    assert(man.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val totTok = docs
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    assert(man.map(_.getAs[Long]("n_tokens")).sum == totTok)
    // shard ids are dense 0..n-1 (the floor-divide rule can't skip a
    // budget window because every window some doc's cumBefore falls in
    // is occupied)
    val ids = man.map(_.getAs[Long]("shard")).sorted
    assert(ids.head == 0L && ids.last == ids.length - 1L)
  }

  test("budget compliance: every shard within one max-doc of the budget") {
    val maxTok = sharded.agg(max(col("tok"))).head.getLong(0)
    val man = Export.manifest(sharded).collect()
    val last = man.map(_.getAs[Long]("shard")).max
    man.foreach { r =>
      val (s, t) = (r.getAs[Long]("shard"), r.getAs[Long]("n_tokens"))
      assert(t < Budget + maxTok,
        s"shard $s over-packed: $t tokens vs budget $Budget (maxTok $maxTok)")
      if (s != last)
        assert(t > Budget - maxTok,
          s"non-final shard $s under-packed: $t tokens")
    }
  }

  test("deterministic: a re-run and a re-partitioned input give the identical pack") {
    def packOf(df: org.apache.spark.sql.DataFrame) =
      Export.assignShards(df, Budget)
        .select("doc_id", "shard").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    val p1 = packOf(docs)
    val p2 = packOf(docs.repartition(7))
    assert(p1 == p2, "shard assignment depends on physical partitioning")
    // manifest fingerprints identical too (order inside shards pinned)
    val m1 = Export.manifest(Export.assignShards(docs, Budget))
      .collect().map(_.toSeq).toSeq
    val m2 = Export.manifest(Export.assignShards(docs.repartition(3), Budget))
      .collect().map(_.toSeq).toSeq
    assert(m1 == m2)
  }

  test("the manifest is consumer-verifiable against the written shards") {
    val out = java.nio.file.Files.createTempDirectory("graft_export").toString
    val man = Export.exportShards(docs, out + "/shards", Budget).collect()
    val back = spark.read.parquet(out + "/shards")
    assert(back.count() == docs.count())
    // recompute each shard's content md5 from the WRITTEN rows only
    val recomputed = back
      .select(col("shard").cast("long").as("shard"), col("_k"),
        md5(col("text")).as("_m"))
      .groupBy("shard")
      .agg(md5(concat_ws("", transform(
        array_sort(collect_list(struct(col("_k"), col("_m")))),
        x => x.getField("_m")))).as("content_md5"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    man.foreach { r =>
      assert(recomputed(r.getAs[Long]("shard")) == r.getAs[String]("content_md5"),
        s"shard ${r.getAs[Long]("shard")} content drifted from its manifest")
    }
    // second export into a fresh dir: byte-identical manifest
    val man2 = Export.exportShards(docs, out + "/shards2", Budget).collect()
    assert(man.map(_.toSeq).toSeq == man2.map(_.toSeq).toSeq)
  }

  test("tokenized pack (§2.59): deterministic, budget measured in subword tokens") {
    val tokc = size(regexp_extract_all(col("text"),
      lit(graft.ops.Pipelines.subwordPattern), lit(0)))
    def packOf(df: org.apache.spark.sql.DataFrame) =
      Export.assignShards(df, Budget, tokCount = Some(tokc))
        .select("doc_id", "shard").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(packOf(docs) == packOf(docs.repartition(5)),
      "tokenized shard assignment depends on physical partitioning")
    // the tok column IS the subword count (not whitespace words)
    val st = Export.assignShards(docs, Budget, tokCount = Some(tokc))
      .select(col("tok"), tokc.cast("long").as("expect"),
        size(split(col("text"), " ")).cast("long").as("ws"))
      .collect()
    st.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(st.exists(r => r.getLong(0) != r.getLong(2)),
      "fixture fertility is 1 everywhere — the tokenized pack would be untestable")
    // budget compliance in SUBWORD tokens
    val man = Export.manifest(
      Export.assignShards(docs, Budget, tokCount = Some(tokc))).collect()
    val maxTok = Export.assignShards(docs, Budget, tokCount = Some(tokc))
      .agg(max(col("tok"))).head.getLong(0)
    man.foreach { r =>
      assert(r.getAs[Long]("n_tokens") < Budget + maxTok)
    }
  }

  test("advance (round 16): frozen shards byte-identical, |entering|-only pack, extended manifest") {
    val out = java.nio.file.Files.createTempDirectory("graft_adv").toString + "/pack"
    val half = docs.filter(col("doc_id") % 2 === 0)
    Export.exportShards(half, out, Budget)
    // snapshot every shipped shard file's bytes
    def shardFiles(dir: String): Map[String, Seq[Byte]] = {
      val root = java.nio.file.Paths.get(dir)
      val it = java.nio.file.Files.walk(root).iterator()
      val m = scala.collection.mutable.Map[String, Seq[Byte]]()
      while (it.hasNext) {
        val p = it.next()
        if (java.nio.file.Files.isRegularFile(p) &&
          p.toString.contains("shard="))
          m(root.relativize(p).toString) =
            java.nio.file.Files.readAllBytes(p).toSeq
      }
      m.toMap
    }
    val before = shardFiles(out)
    val oldMan = spark.read.parquet(out + "_manifest")
      .collect().map(_.toSeq).toSet
    val maxOld = oldMan.map(_.head.asInstanceOf[Long]).max
    val man = Export.advanceShards(spark, out, docs, Budget).collect()
    // frozen: every pre-advance shard file byte-identical
    val after = shardFiles(out)
    before.foreach { case (f, bytes) =>
      assert(after.get(f).contains(bytes), s"shipped shard file $f changed")
    }
    // old manifest rows survive verbatim; new rows start past maxOld
    val manSet = man.map(_.toSeq).toSet
    assert(oldMan.subsetOf(manSet), "shipped manifest rows were rewritten")
    (manSet -- oldMan).foreach(r =>
      assert(r.head.asInstanceOf[Long] > maxOld))
    // coverage: the tree now holds the whole corpus exactly once
    val back = spark.read.parquet(out)
    assert(back.count() == docs.count())
    assert(back.select("doc_id").distinct().count() == docs.count())
    assert(man.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // the new shards equal a standalone pack of the entering docs
    // shifted by the offset — advance == rebuild on the entering slice
    val entering = docs.filter(col("doc_id") % 2 =!= 0)
    val expect = Export.manifest(Export.assignShards(entering, Budget))
      .collect().map { r =>
        (r.getAs[Long]("shard") + maxOld + 1) +: r.toSeq.tail
      }.toSet
    assert((manSet -- oldMan) == expect,
      "advance pack diverged from the standalone pack of entering docs")
    // idempotent no-op: advancing again with the same feed changes nothing
    val man2 = Export.advanceShards(spark, out, docs, Budget).collect()
    assert(man2.map(_.toSeq).toSet == manSet)
    assert(shardFiles(out).keySet == after.keySet)
  }

  test("advance refuses a deleted or mutated shipped doc") {
    val out = java.nio.file.Files.createTempDirectory("graft_adv2").toString + "/pack"
    Export.exportShards(docs, out, Budget)
    val someId = docs.select(min(col("doc_id"))).head.getLong(0)
    val delEx = intercept[IllegalStateException] {
      Export.advanceShards(spark, out, docs.filter(col("doc_id") =!= someId), Budget)
    }
    assert(delEx.getMessage.contains("deleted=1"))
    val mutated = docs.withColumn("text",
      when(col("doc_id") === someId, concat(col("text"), lit(" tampered")))
        .otherwise(col("text")))
    val mutEx = intercept[IllegalStateException] {
      Export.advanceShards(spark, out, mutated, Budget)
    }
    assert(mutEx.getMessage.contains("mutated=1"))
  }

  test("naqed crawl $action -> export: manifest face + arg validation") {
    val api = new graft.api.Naqed(spark, sf0001)
    val man = api.crawl(Map("$action" -> "export", "$budget" -> 512))
    assert(man.columns.toSeq ==
      Seq("shard", "n_docs", "n_tokens", "k_min", "k_max", "content_md5"))
    val rows = man.collect()
    assert(rows.length > 1, "512-token budget should yield several shards")
    // the export packs the CLEANED corpus, not the raw one
    val cleaned = graft.ops.Curation.crawl(
      Tables(spark, sf0001, "documents"), withReport = false)._1
    assert(rows.map(_.getAs[Long]("n_docs")).sum == cleaned.count())
    intercept[IllegalArgumentException] {
      api.crawl(Map("$action" -> "export", "$budget" -> -5))
    }
    intercept[IllegalArgumentException] {
      api.crawl(Map("$action" -> "clean", "$budget" -> 512))
    }
    intercept[IllegalArgumentException] {
      api.crawl(Map("$action" -> "export", "$shards" -> 3))
    }
  }
}
