package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic training-shard export — the corpus last mile (§2.55):
  * the curated corpus globally shuffled into a reproducible order and
  * packed into fixed token-budget shards with a verifiable manifest.
  * This is the operator every training-data user runs last and checks
  * first: the same curated input must produce byte-identical shards on
  * every run, on any cluster layout, or training runs are not
  * reproducible.
  *
  *  - ORDER: md5("shard|" + doc_id) — the engine's seeded-order
  *    precedent (sampling family): deterministic, engine-portable
  *    (DuckDB computes the identical hex), uniform (so consecutive
  *    docs are an unbiased shuffle of the corpus — the reason training
  *    export shuffles at all), and a TOTAL order (md5 of distinct ids).
  *  - PACK: shard = floor(tokensBefore / budget) over the global
  *    running token sum in that order — a pure function of the corpus
  *    content, independent of partitioning. A shard's token mass lands
  *    in [budget − maxDocTok + 1, budget + maxDocTok − 1]: the greedy
  *    sequential rule every shard packer uses, made deterministic.
  *  - MANIFEST: per shard, doc/token counts, the order-key range, and
  *    md5 of the concatenated per-doc content md5s IN ORDER — so a
  *    consumer can verify any shard without re-reading the corpus.
  *
  * Scale: the running token sum is [[GlobalRank.withRunningSum]] —
  * ONE range shuffle + a |partitions|-row offsets collect, never a
  * single-task window; the manifest groups |docs| rows into |shards|
  * whose per-shard sorted-md5 fold is budget-bounded (≤ budget/minTok
  * docs per shard). The shard write is one `partitionBy(shard)` pass.
  */
object Export {

  /** docs + (`_k` order key, `tok` token count, `shard` BIGINT id):
    * the deterministic pack assignment, as a pure transform (no
    * writes — the oracle face and the writer share it).
    *
    * @param tokCount optional tokenizer-true token counter (round 16):
    *        any engine-portable Column over the doc row — e.g. the
    *        frozen subword vocab's greedy longest-match
    *        `regexp_extract_all` count ([[pipelineExportTokenized]]),
    *        so shard budgets are measured in the tokens the training
    *        run actually consumes, not whitespace words. Defaults to
    *        the suite's whitespace convention. Must be deterministic
    *        and row-local (the count feeds the global running sum —
    *        a row-local expression keeps the encode fused into the
    *        scan, zero extra shuffles).
    */
  def assignShards(docs: DataFrame, budget: Long,
      idCol: String = "doc_id", textCol: String = "text",
      tokCount: Option[Column] = None): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    val keyed = docs
      .withColumn("_k", md5(concat(lit("shard|"), col(idCol).cast(StringType))))
      .withColumn("tok", tokCount
        .getOrElse(size(split(col(textCol), " "))).cast(LongType))
    GlobalRank.withRunningSum(keyed, Seq(col("_k")), "tok", "_cum")
      .withColumn("shard",
        floor((col("_cum") - col("tok")) / budget).cast(LongType))
      .drop("_cum")
  }

  /** The shard manifest of an [[assignShards]] output: per shard, doc
    * and token counts, the md5-order key range, and the content
    * fingerprint (md5 of per-doc text md5s concatenated in shard
    * order). */
  def manifest(sharded: DataFrame, textCol: String = "text"): DataFrame =
    sharded
      .select(col("shard"), col("_k"), col("tok"),
        md5(col(textCol)).as("_m"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"),
        min(col("_k")).as("k_min"), max(col("_k")).as("k_max"),
        md5(concat_ws("", transform(
          array_sort(collect_list(struct(col("_k"), col("_m")))),
          x => x.getField("_m")))).as("content_md5"))
      .select(col("shard"), asLong(col("n_docs")).as("n_docs"),
        asLong(col("n_tokens")).as("n_tokens"),
        col("k_min"), col("k_max"), col("content_md5"))
      .orderBy("shard")

  /** Write the packed corpus: one hive-partitioned parquet tree
    * (`shard=N/`, rows sorted by the order key within each shard) plus
    * `_manifest` parquet beside it. Returns the manifest. */
  def exportShards(docs: DataFrame, outDir: String, budget: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sharded = assignShards(docs, budget, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val man = manifest(sharded, textCol)
    sharded
      .repartition(col("shard"))
      .sortWithinPartitions(col("_k"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard").parquet(outDir)
    man.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(outDir + "_manifest")
    sharded.unpersist(false)
    man
  }

  /** Shard-manifest census (§2.55 oracle face): the deterministic pack
    * of the documents table at a 2048-token budget, manifest-grain.
    * Exactness: the order key and per-doc md5s are engine-identical
    * hex strings; token counts are the suite's whitespace convention;
    * the running sum and the integer floor-divide shard rule are exact
    * BIGINT arithmetic; content_md5 pins the PACK ORDER itself (DuckDB
    * folds with string_agg ORDER BY k — same sequence). Scale: one
    * range shuffle + |partitions| offsets collect (GlobalRank), one
    * |shards| aggregate. */
  val pipelineExportManifest: Q = (s, d) =>
    manifest(assignShards(table(s, d, "documents"), 2048L))

  /** Incremental export advance (round 16, VERDICT item 3): freeze
    * every shipped shard, pack ONLY the docs that entered since the
    * last export into NEW shards, and extend the manifest — the
    * append-only training-feed loop (a nightly crawl adds documents;
    * re-exporting the whole corpus re-uploads terabytes of unchanged
    * shards and breaks their byte-identity for consumers that already
    * pulled them).
    *
    * Contract:
    *  - shipped shards and their manifest rows are FROZEN — this call
    *    never rewrites an existing `shard=N/` directory (new shards
    *    append at maxShard+1 with the same md5-order/running-sum rule
    *    applied among the entering docs);
    *  - a shipped doc that was DELETED or MUTATED in the feed makes
    *    the frozen shards unrepresentative of the corpus — the advance
    *    REFUSES with IllegalStateException (the torn-state fencing
    *    convention); rebuild with [[exportShards]] instead;
    *  - an advance with no entering docs is a no-op returning the
    *    stored manifest.
    *
    * Scale: the fence + entering split are two hash joins keyed on the
    * id (the shipped side reads only id/text-md5/shard columns from
    * the columnar tree); the pack is [[assignShards]] over |entering|
    * rows only — the advance costs |entering| + one shipped scan,
    * never a corpus re-shuffle. The manifest extension is
    * |shards|-bounded. Returns the extended manifest.
    */
  def advanceShards(spark: SparkSession, outDir: String, docs: DataFrame,
      budget: Long, idCol: String = "doc_id", textCol: String = "text",
      tokCount: Option[Column] = None): DataFrame = {
    val shipped = spark.read.parquet(outDir)
      .select(col(idCol), md5(col(textCol)).as("_sm"),
        col("shard").cast(LongType).as("_ss"))
    val cur = docs.select(col(idCol), md5(col(textCol)).as("_cm"))
    val probe = shipped.join(cur, Seq(idCol), "left")
      .agg(sum(when(col("_cm").isNull, 1L).otherwise(0L)).as("deleted"),
        sum(when(col("_cm").isNotNull && col("_cm") =!= col("_sm"), 1L)
          .otherwise(0L)).as("mutated"),
        max(col("_ss")).as("maxShard"))
      .first()
    val (nDel, nMut) = (probe.getLong(0), probe.getLong(1))
    if (nDel > 0 || nMut > 0) throw new IllegalStateException(
      s"shipped docs changed under the export: deleted=$nDel " +
        s"mutated=$nMut — frozen shards would no longer represent the " +
        "corpus; re-export from scratch (exportShards) or restore the feed")
    val manifestPath = outDir + "_manifest"
    val old = spark.read.parquet(manifestPath)
      .localCheckpoint(true) // materialize before overwriting its files
    val entering = docs.join(shipped.select(col(idCol)), Seq(idCol), "left_anti")
    if (entering.isEmpty) return old.orderBy("shard")
    val offset = probe.getLong(2) + 1
    // EAGER checkpoint, not persist: the pack's lineage reads outDir
    // (entering ← left_anti ← shipped scan), so any recompute AFTER
    // the append below would re-list the tree, see the just-appended
    // docs as shipped, and resolve entering to EMPTY. Truncating the
    // lineage pins the pre-append file listing.
    val packed = assignShards(entering, budget, idCol, textCol, tokCount)
      .withColumn("shard", col("shard") + offset)
      .localCheckpoint(true)
    val newMan = manifest(packed, textCol).localCheckpoint(true)
    packed
      .repartition(col("shard"))
      .sortWithinPartitions(col("_k"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .partitionBy("shard").parquet(outDir)
    val man = old.unionByName(newMan).orderBy("shard")
      .localCheckpoint(true)
    man.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(manifestPath)
    man
  }

  /** Tokenizer-true shard manifest (§2.59): the same deterministic
    * pack, but budgets measured in SUBWORD tokens — the frozen
    * committed vocab's greedy longest-match `regexp_extract_all`
    * count (the pipeline_subword_count contract: alternatives sorted
    * (length desc, lex) make Java's leftmost-first and DuckDB/RE2's
    * matching both greedy longest-match, so the token stream is
    * engine-identical). This is the budget a training run actually
    * consumes: whitespace words under-count fertility>1 text, so a
    * whitespace-budgeted shard overruns the context-window math.
    * Exactness: identical integer token counts feed the same exact
    * BIGINT running sum / floor-divide rule as pipeline_export_
    * manifest. Scale: the encode is ONE codegen'd row-local regexp in
    * the scan projection — the pack adds zero work over the
    * whitespace path (same single range shuffle). */
  val pipelineExportTokenized: Q = (s, d) =>
    manifest(assignShards(table(s, d, "documents"), 2048L,
      tokCount = Some(size(regexp_extract_all(col("text"),
        lit(Pipelines.subwordPattern), lit(0))))))

  /** Shard-balance summary (§2.58): the one-row skew readout a
    * training run checks before consuming the pack — shard count,
    * token-load extrema, doc-count extrema, the max-minus-min spread
    * as a share of the budget, and the coefficient of variation of
    * shard token loads (exact Σ/Σ² over the \|shards\| relation, one
    * double tree q6). The deterministic md5 order makes loads
    * near-uniform BY CONSTRUCTION — this census is what proves it.
    * Scale: a fold over the bounded manifest. */
  val pipelineExportBalance: Q = (s, d) => {
    val man = manifest(assignShards(table(s, d, "documents"), 2048L))
    val t = man.agg(count(lit(1)).as("n_shards"),
      min(col("n_tokens")).as("tok_min"), max(col("n_tokens")).as("tok_max"),
      min(col("n_docs")).as("doc_min"), max(col("n_docs")).as("doc_max"),
      sum(col("n_tokens")).as("st"),
      sum(col("n_tokens") * col("n_tokens")).as("qt"))
    val nd = col("n_shards").cast(DoubleType)
    val cv = sqrt((col("qt").cast(DoubleType) -
      col("st").cast(DoubleType) * col("st").cast(DoubleType) / nd) / nd) /
      (col("st").cast(DoubleType) / nd)
    t.select(asLong(col("n_shards")).as("n_shards"),
      asLong(col("tok_min")).as("tok_min"),
      asLong(col("tok_max")).as("tok_max"),
      asLong(col("doc_min")).as("doc_min"),
      asLong(col("doc_max")).as("doc_max"),
      expr("((tok_max - tok_min) * 1000000) div 2048").as("spread_q6"),
      asLong(floor(cv * 1e6)).as("cv_q6"))
  }
}
