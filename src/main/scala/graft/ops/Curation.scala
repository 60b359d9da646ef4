package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end training-data curation: the §2.11 operators composed the
  * way a real corpus pipeline runs them, each stage a declarative
  * DataFrame transform so the whole pipeline is ONE Catalyst plan per
  * output (quality scoring and language ID fuse into the scan; the
  * dedup stages reuse the engine's persisted shingle/pair
  * materializations).
  *
  * Stage order is the cost-aware one: cheap row-local filters first
  * (quality — pure expressions, no shuffle), then exact dedup (one
  * hash shuffle), then near-dedup (MinHash-LSH candidates + verified
  * pairs -> keep canonical doc per cluster), then stratified
  * rebalancing and the reproducible train/test split (md5-bucketed,
  * repartition-stable). At 100 TB every stage is linear except
  * near-dedup, which is linear in near-duplicate candidates by the
  * LSH banding argument (SCALING.md).
  */
object Curation {

  case class CurationReport(
      input: Long,
      afterQuality: Long,
      afterExactDedup: Long,
      afterNearDedup: Long,
      train: Long,
      test: Long)

  /** Quality gate: token-count and stopword-ratio thresholds — the
    * pipeline_quality_score heuristics as a filter. Row-local, fuses
    * into the scan. */
  def qualityFilter(docs: DataFrame, minTokens: Int, maxStopRatio: Double): DataFrame = {
    val toks = split(col("text"), " ")
    val stop = (w: org.apache.spark.sql.Column) =>
      w.isin("the", "a", "table", "value", "query")
    val nTok = size(toks)
    val stopRatio = size(filter(toks, stop)).cast(DoubleType) / nTok
    docs.filter(nTok >= minTokens && stopRatio <= maxStopRatio)
  }

  /** Exact dedup: keep the minimum doc_id per normalized-content hash
    * (one hash shuffle; the dedup_exact shape as a keep-list join). */
  def exactDedup(docs: DataFrame): DataFrame = {
    val keep = docs
      .groupBy(md5(lower(trim(col("text")))).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id"))
    docs.join(keep, col("doc_id") === col("keep_id"), "left_semi")
  }

  /** Near-dedup: drop every non-canonical member of a MinHash-LSH
    * near-dup cluster (reuses the engine's persisted pair set; the
    * dedup_clusters keep-list applied as an anti-join). */
  def nearDedup(spark: SparkSession, sfDir: String, docs: DataFrame): DataFrame = {
    val pairs = Pipelines.dedupMinhashLsh(spark, sfDir)
    // a doc is dropped iff it appears as the GREATER side of a verified
    // near-dup pair whose lesser side survives transitively — for the
    // keep-list we use the simple, standard rule: keep d iff d is not
    // the greater element of any pair (canonical = min of its cluster
    // under the pair relation's transitive closure, conservatively
    // approximated by the direct-pair rule; exact cluster canonicals
    // come from dedup_clusters when label-prop rounds are budgeted)
    docs.join(pairs.select(col("d2")), col("doc_id") === col("d2"), "left_anti")
  }

  /** Full pipeline: quality -> exact dedup -> near dedup -> stratified
    * rebalance -> reproducible split. Returns (train, test, report). */
  def curate(spark: SparkSession, sfDir: String,
      minTokens: Int = 5, maxStopRatio: Double = 0.9,
      fractions: Map[String, Double] = Map.empty,
      testFraction: Double = 0.1): (DataFrame, DataFrame, CurationReport) = {
    val docs = table(spark, sfDir, "documents")
    val q = qualityFilter(docs, minTokens, maxStopRatio)
    val e = exactDedup(q)
    val n = nearDedup(spark, sfDir, e)
    val balanced =
      if (fractions.isEmpty) n
      else Sampling.stratifiedSample(n, "lang", "doc_id", fractions)
    val (train, test) = Sampling.hashSplit(balanced, "doc_id", testFraction)
    val report = CurationReport(
      input = docs.count(),
      afterQuality = q.count(),
      afterExactDedup = e.count(),
      afterNearDedup = n.count(),
      train = train.count(),
      test = test.count())
    (train, test, report)
  }
}
