package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * pairs -> keep canonical doc per cluster), then benchmark
  * decontamination (the eval slice AND everything overlapping it
  * leave the training corpus), then stratified rebalancing and the
  * reproducible train/test split (md5-bucketed, repartition-stable).
  * At 100 TB every stage is linear except near-dedup, which is linear
  * in near-duplicate candidates by the LSH banding argument
  * (SCALING.md).
  */
object Curation {

  case class CurationReport(
      input: Long,
      afterQuality: Long,
      afterExactDedup: Long,
      afterNearDedup: Long,
      afterDecontam: Long,
      train: Long,
      test: Long)

  /** Quality gate: token-count and stopword-ratio thresholds — the
    * SAME expressions as the oracle-checked pipeline_quality_score
    * (shared via Pipelines, so the score and the gate can't drift).
    * Row-local, fuses into the scan. */
  def qualityFilter(docs: DataFrame, minTokens: Int, maxStopRatio: Double): DataFrame =
    docs.filter(Pipelines.tokenCount >= minTokens && Pipelines.stopRatio <= maxStopRatio)

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
    // a doc is dropped iff it is the GREATER side of a verified
    // near-dup pair whose LESSER side is still in the input — the
    // semi-join guard matters: if upstream stages (quality, exact
    // dedup) already removed the canonical, its near-dups must
    // survive, or the content would vanish from the corpus entirely.
    // (Direct-pair rule; exact transitive cluster canonicals come from
    // dedup_clusters when label-prop rounds are budgeted.)
    val activePairs = pairs
      .join(docs.select(col("doc_id").as("d1")), Seq("d1"), "left_semi")
    docs.join(activePairs.select(col("d2")), col("doc_id") === col("d2"), "left_anti")
  }

  /** Measured cost crossover between the exact block-grid and the IVF
    * ANN near-dup pair paths (SCALING.md, docs-family curves: exact
    * fits α 2.03 on the 5k→50k leg vs ANN's 1.33, with exact already
    * 58.2 s at 50k vectors and the gap widening with n — but BELOW
    * ~50k the exact path is both cheaper and recall-1.0, because the
    * IVF train/assign setup dominates tiny corpora). `path = "auto"`
    * probes the corpus size once and picks the side of this line. */
  val AnnCrossoverItems = 50000L

  /** The auto rule as a pure function (unit-testable without building
    * a 50k-vector corpus): exact below the measured crossover — where
    * it is BOTH cheaper and recall-1.0 — ANN at and above it. */
  def chooseNearDedupPath(nItems: Long): String =
    if (nItems < AnnCrossoverItems) "exact" else "ann"

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Embedding-space near-dedup — the curation stage for corpora whose
    * items carry embeddings (the embeddings table here; at scale, any
    * corpus joined to its embedding column). `path` selects the pair
    * source:
    *
    *  - `"ann"`: the FIXED-nprobe IVF pipeline
    *    (`Pipelines.simCosineNeardupAnn`, nprobe=8 — the measured
    *    SCALE path: CPU α 1.33 across the 10×→100× docs legs, recall
    *    1.0 at nprobe=8 in AnnNeardupSpec's probe table);
    *  - `"ann_adaptive"`: the density-adaptive IVFADC variant
    *    (`simCosineNeardupAnnAdaptive` — mass-driven probing + PQ-code
    *    prefilter). EXPLICIT OPT-IN ONLY: its mass target scales with
    *    the average cell size, so candidates grow n^1.5 by
    *    construction — measured α 2.08, 9.4× the fixed-nprobe CPU at
    *    200k vectors (SCALING.md round-9 finding 2). It is the
    *    recall-knob for corpora where a missed near-dup costs more
    *    than CPU, never the default above the crossover;
    *  - `"exact"`: the all-pairs block-grid (`simCosineNeardup`) —
    *    recall 1.0, affordable below the measured crossover;
    *  - `"auto"` (default): one count() size probe against
    *    `AnnCrossoverItems`, choice logged — exact below, FIXED-nprobe
    *    ann above (round 11: auto previously routed large corpora
    *    onto the adaptive α-2.08 path, the one variant that scales
    *    WORSE than exact's constant — the measured hierarchy now is
    *    the routed one).
    *
    * Precision is 1.0 on EVERY path (all pair sources exact-rescore
    * at the same threshold), so path switching can only trade recall,
    * never introduce false drops. Same keep-the-lesser-id semantics
    * and removed-canonical guard as the text `nearDedup` stage: an
    * item is dropped iff it is the GREATER side of a pair whose
    * LESSER side is still in the input. */
  def annNearDedup(spark: SparkSession, sfDir: String, items: DataFrame,
      idCol: String = "vec_id", nCells: Int = 16, massFactor: Double = 8.0,
      margin: Double = 0.05, path: String = "auto"): DataFrame = {
    val resolved = path match {
      case "auto" =>
        val n = items.count()
        val chosen = chooseNearDedupPath(n)
        log.info(s"annNearDedup auto path: $n items -> $chosen " +
          s"(crossover $AnnCrossoverItems, SCALING.md docs-family curves)")
        chosen
      case p @ ("exact" | "ann" | "ann_adaptive") => p
      case other => throw new IllegalArgumentException(
        s"unknown near-dedup path '$other'; valid: auto, exact, ann, ann_adaptive")
    }
    val pairs = resolved match {
      case "exact" => Pipelines.simCosineNeardup(spark, sfDir)
      case "ann" =>
        Pipelines.simCosineNeardupAnn(spark, sfDir, nCells, nprobe = 8)
      case _ => Pipelines.simCosineNeardupAnnAdaptive(spark, sfDir, nCells,
        massFactor, margin)
    }
    val activePairs = pairs
      .join(items.select(col(idCol).as("v1")), Seq("v1"), "left_semi")
    items.join(activePairs.select(col("v2")), col(idCol) === col("v2"), "left_anti")
  }

  /** Decontamination: the held-out eval slice itself (doc_id%10 == 0
    * — verbatim benchmark content must never train) AND every training
    * doc sharing >= 3 distinct shingles with it (pipeline_contamination's
    * flag set) leave the corpus, as anti-joins over the shared shingle
    * materialization. At 100 TB the eval shingles broadcast, so this
    * stage adds no corpus shuffle. */
  def decontaminate(spark: SparkSession, sfDir: String, docs: DataFrame): DataFrame = {
    val flagged = Pipelines.pipelineContamination(spark, sfDir).select(col("doc_id"))
    docs.filter(col("doc_id") % 10 =!= 0)
      .join(flagged, Seq("doc_id"), "left_anti")
  }

  /** PII redaction (§2.46): every match of the shared detector
    * patterns (Pipelines.piiPatterns — email, NANP phone, SSN-shaped
    * id, IPv4) replaced by its type mask, in declared order. Row-local
    * regexp chain, fuses into the scan — at 100 TB this is a zero-
    * shuffle rewrite pass. Idempotent: the masks contain no digits,
    * `@`, or dots adjacent to digits, so a second pass is a no-op
    * (CurationSpec pins this). Runs between quality filtering and
    * dedup in a real corpus pass: masked text still dedups correctly
    * (two docs differing only in their PII collapse to one). */
  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val masked = Pipelines.piiPatterns.foldLeft(col(textCol)) {
      case (c, (_, p, m)) => regexp_replace(c, lit(p), lit(m))
    }
    docs.withColumn(textCol, masked)
  }

  /** Per-source PII rate over an arbitrary corpus (the profiling face
    * of redactPii — same patterns, so profile and redaction can't
    * drift). Returns (source, n_docs, docs_with_pii, pii_total). */
  def piiProfile(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val counts = Pipelines.piiPatterns.map { case (_, p, _) =>
      size(regexp_extract_all(col(textCol), lit(p), lit(0))).cast(LongType)
    }.reduce(_ + _)
    docs.select(col("source"), counts.as("hits"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("hits") > 0, 1L).otherwise(0L)).as("docs_with_pii"),
        sum(col("hits")).as("pii_total"))
      .orderBy("source")
  }

  /** Duplicate-span excision (§2.46): the find→FIX closure of
    * dedup_substring_spans — rewrite the corpus with every position
    * covered by a ≥ minTok-token cross-doc verbatim span REMOVED on
    * the greater-doc (d2) side, keeping the canonical occurrence (the
    * smallest doc_id always survives because spans are built with
    * d1 < d2). Lee-et-al substring dedup rewrites the corpus exactly
    * this way: duplicated token mass leaves, one copy stays. Docs
    * untouched by any span pass through unchanged (no re-tokenize);
    * only |affected| docs are rebuilt, an output-sized cost. A fully-
    * excised doc survives as an empty string (the caller's quality
    * gate drops it if unwanted). */
  def exciseSpans(spark: SparkSession, sfDir: String, minTok: Int = 12): DataFrame = {
    val docs = table(spark, sfDir, "documents")
    val exc = Pipelines.dupSpans(spark, sfDir, minTok)
      .select(col("d2").as("doc_id"),
        explode(sequence(col("s2"), col("s2") + col("tok") - 1)).as("pos"))
      .distinct()
      .localCheckpoint(true) // consumed by the semi-join AND the anti-join
    val affected = exc.select(col("doc_id")).distinct()
    val rebuilt = docs
      .join(affected, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("p0", "w")))
      .select(col("doc_id"), (col("p0") + 1).as("pos"), col("w"))
      .join(exc, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("w")))),
        x => x.getField("w")), " ").as("new_text"))
    // precedence: rebuilt text if any tokens survived; empty string for
    // a fully-excised doc (affected but no rebuilt row); else verbatim
    docs.join(rebuilt, Seq("doc_id"), "left")
      .join(affected.withColumnRenamed("doc_id", "aff_id"),
        col("doc_id") === col("aff_id"), "left")
      .withColumn("text", coalesce(col("new_text"),
        when(col("aff_id").isNotNull, lit("")).otherwise(col("text"))))
      .drop("new_text", "aff_id")
  }

  /** LM-perplexity gate (round 15, VERDICT item 5): drop docs whose
    * per-doc Kneser–Ney NLL ([[Pipelines.kneserNeyDocNll]] — the SAME
    * formula/split as the oracle-checked pipeline_kneser_ney_nll, so
    * gate and readout cannot drift) exceeds `maxNll`. Docs too short
    * to carry a bigram pass (no evidence either way — the token-count
    * heuristic owns that call). The LM relations broadcast
    * (vocab-bounded), so the gate is one linear scan + doc-grain agg. */
  def lmFilter(docs: DataFrame, lm: Pipelines.KnLm,
      maxNll: Double): DataFrame = {
    val bad = Pipelines.kneserNeyDocNll(docs, lm)
      .filter(col("kn_nll") > maxNll).select(col("doc_id"))
    docs.join(bad, Seq("doc_id"), "left_anti")
  }

  /** Full pipeline: quality -> exact dedup -> near dedup ->
    * decontaminate -> stratified rebalance -> reproducible split.
    * Returns (train, test, report). */
  def curate(spark: SparkSession, sfDir: String,
      minTokens: Int = 5, maxStopRatio: Double = 0.9,
      fractions: Map[String, Double] = Map.empty,
      testFraction: Double = 0.1,
      qualityModel: Option[QualityModel.Model] = None,
      modelThreshold: Double = 0.5,
      lmMaxNll: Option[Double] = None,
      lmSampleDocs: Int = 0): (DataFrame, DataFrame, CurationReport) = {
    val docs = table(spark, sfDir, "documents")
    // heuristic gate first (cheap row-local thresholds), then the
    // trained classifier when one is supplied — both fuse into the
    // same scan (the model is pure column arithmetic), so the stage
    // order costs nothing and the report's afterQuality reflects the
    // full quality stack; the optional LM-perplexity gate last (it is
    // the only quality stage that needs an aggregate per doc)
    val qh = qualityFilter(docs, minTokens, maxStopRatio)
    val qm = qualityModel
      .map(m => QualityModel.filterByModel(qh, m, modelThreshold))
      .getOrElse(qh)
    val q = lmMaxNll
      .map(t => lmFilter(qm, Pipelines.knTrainOn(docs, lmSampleDocs), t))
      .getOrElse(qm)
    val e = exactDedup(q)
    // persist BOTH checkpoints: afterNearDedup's count re-reads n, and
    // the splits + remaining counts re-read dc — without the n persist
    // the whole quality->dedup lineage would execute twice
    val n = nearDedup(spark, sfDir, e)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dc = decontaminate(spark, sfDir, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val balanced =
      if (fractions.isEmpty) dc
      else Sampling.stratifiedSample(dc, "lang", "doc_id", fractions)
    val (train, test) = Sampling.hashSplit(balanced, "doc_id", testFraction)
    val report = CurationReport(
      input = docs.count(),
      afterQuality = q.count(),
      afterExactDedup = e.count(),
      afterNearDedup = n.count(),
      afterDecontam = dc.count(),
      train = train.count(),
      test = test.count())
    (train, test, report)
  }

  // -----------------------------------------------------------------
  // crawl-hygiene stages (§2.51–§2.52) — the SAME Crawl.* expression
  // chains the oracle queries hash-pin, applied as corpus transforms
  // -----------------------------------------------------------------

  /** HTML/markup extraction stage: tag/script/style/comment strip +
    * entity decode + whitespace collapse (Crawl.extractHtmlText).
    * Row-local, fuses into the scan; idempotent on already-clean text
    * (no tags ⇒ only the whitespace collapse applies — CurationSpec
    * pins a second pass is a no-op). */
  def extractHtml(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol, Crawl.extractHtmlText(col(textCol)))

  /** Unicode normalization stage (codegen'd NfcNormalize). Run BEFORE
    * any hashing/shingling stage so normalization twins collapse
    * (CurationSpec pins planted NFD twins exact-dedup together; with
    * form="NFKC", planted fullwidth/ligature COMPATIBILITY twins
    * collapse too — the multilingual-crawl requirement NFC alone
    * misses). Idempotent for both forms: f(f(s)) == f(s). */
  def normalizeText(docs: DataFrame, textCol: String = "text",
      form: String = "NFC"): DataFrame = form match {
    case "NFC" =>
      docs.withColumn(textCol, Crawl.nfcText(docs.sparkSession, col(textCol)))
    case "NFKC" =>
      docs.withColumn(textCol, Crawl.nfkcText(docs.sparkSession, col(textCol)))
    case other => throw new IllegalArgumentException(
      s"unsupported normalization form '$other'; valid: NFC, NFKC")
  }

  /** Encoding (mojibake) repair stage: the ordered literal replace
    * chain of pipeline_encoding_repair. Row-local. */
  def repairEncoding(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn(textCol, Crawl.repairEncoding(col(textCol)))

  /** URL-keyed exact dedup: a doc's key is its MINIMUM canonicalized
    * URL (Crawl.canonicalizeUrl — case-folded, tracking-stripped,
    * param-sorted); docs sharing a key collapse to the smallest
    * doc_id; URL-less docs pass through untouched. The crawl-side
    * twin of exactDedup (same keep-min-id discipline, URL key instead
    * of content hash). One hash shuffle on the bounded key relation.
    */
  def urlDedup(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val keyed = docs.withColumn("_ukey", Crawl.urlKeyOf(col(textCol)))
    val keep = keyed.filter(col("_ukey").isNotNull)
      .groupBy(col("_ukey")).agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id"))
    keyed.filter(col("_ukey").isNull).drop("_ukey")
      .unionByName(keyed.filter(col("_ukey").isNotNull)
        .join(keep, col("doc_id") === col("keep_id"), "left_semi")
        .drop("_ukey"))
  }

  /** Boilerplate-line removal: drop every ' | '-separated line whose
    * in-source document frequency reaches 30% with df ≥ 2 (the exact
    * integer rule of pipeline_boilerplate_lines), rebuilding each
    * doc's text in line order. Only the |distinct lines| df relation shuffles; the
    * rebuild groups |docs| rows. A fully-boilerplate doc survives as
    * an empty string (the quality gate downstream drops it). */
  def stripBoilerplate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val ln = docs
      .select(col("source"), col("doc_id"),
        posexplode(split(col(textCol), " \\| ")).as(Seq("p", "line0")))
      .select(col("source"), col("doc_id"), col("p"),
        trim(col("line0")).as("line"))
    val df = ln.groupBy(col("source"), col("line"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
    val nd = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val rebuilt = ln.join(df, Seq("source", "line"))
      .join(broadcast(nd), Seq("source"))
      .filter(!(col("ndocs") >= 2 && col("ndocs") * 10 >= col("n_docs") * 3))
      .groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("p"), col("line")))),
        x => x.getField("line")), " | ").as("_nt"))
    docs.join(rebuilt, Seq("doc_id"), "left")
      .withColumn(textCol, coalesce(col("_nt"), lit("")))
      .drop("_nt")
  }

  case class CrawlReport(
      input: Long,
      urlDeduped: Long,
      nonEmptyAfterBoilerplate: Long,
      afterQuality: Long,
      piiMaskedDocs: Long)

  /** The crawl-to-corpus hygiene pipeline, stages in crawl order:
    * extract (HTML → text) → repair (mojibake) → normalize (NFC) →
    * url-dedup → boilerplate strip → quality gate → PII redaction.
    * The three text rewrites are ONE fused row-local projection (they
    * compose into a single Catalyst expression chain — zero shuffle);
    * url-dedup and boilerplate are the only shuffling stages and both
    * shuffle bounded relations (canonical keys / distinct lines).
    * Returns (cleaned corpus, stage-count report — None when
    * `withReport = false`, which also skips the intermediate persists
    * and the five counting jobs: the pure-transform path a production
    * caller chains into [[curate]] pays zero extra actions). */
  def crawl(docs: DataFrame, textCol: String = "text",
      minTokens: Int = 5, maxStopRatio: Double = 0.9,
      withReport: Boolean = true)
      : (DataFrame, Option[CrawlReport]) = {
    val extracted = normalizeText(
      repairEncoding(extractHtml(docs, textCol), textCol), textCol)
    if (!withReport) {
      val out = redactPii(qualityFilter(
        stripBoilerplate(urlDedup(extracted, textCol), textCol),
        minTokens, maxStopRatio), textCol)
      return (out, None)
    }
    val u = urlDedup(extracted, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bp = stripBoilerplate(u, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = qualityFilter(bp, minTokens, maxStopRatio)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = redactPii(q, textCol)
    val masked = Pipelines.piiPatterns.map { case (_, p, _) =>
      size(regexp_extract_all(col(textCol), lit(p), lit(0)))
    }.reduce(_ + _)
    val report = CrawlReport(
      input = docs.count(),
      urlDeduped = u.count(),
      nonEmptyAfterBoilerplate = bp.filter(length(col(textCol)) > 0).count(),
      afterQuality = q.count(),
      piiMaskedDocs = q.filter(masked > 0).count())
    // the intermediate persists exist only for the five counting jobs
    // above — release them so repeated report calls don't accumulate
    // session-lifetime caches; q stays cached because the returned
    // frame reads it (the caller owns its lifecycle via out.unpersist
    // lineage — recompute falls back to the full chain if evicted)
    u.unpersist(false)
    bp.unpersist(false)
    (out, Some(report))
  }

  /** Token-budgeted source-mixture composer (§2.59): the decision an
    * LLM pre-training run makes before a single shard is written —
    * given per-source WEIGHTS and a global token budget, take from
    * each source a deterministic token slice proportional to its
    * weight. Mechanics (the Export pack recipe, per source):
    *
    *  - per-source target = (budget · w_s) div Σw — exact BIGINT;
    *  - docs ordered by md5("mix|" + doc_id) within each source (the
    *    sampling-family seeded order: deterministic, engine-portable,
    *    an unbiased shuffle of each source);
    *  - greedy cutoff: a doc is taken iff the source-local running
    *    token sum BEFORE it is < target, so achieved mass lands in
    *    [target − maxDocTok + 1, target + maxDocTok − 1] (or the whole
    *    source when it is smaller than its target);
    *  - returns (selected corpus with `_mk`/`_tok` columns retained,
    *    per-source manifest: weight, availability, target vs achieved
    *    tokens, fill ppm).
    *
    * Scale: the per-source running sum is the GLOBAL
    * [[GlobalRank.withRunningSum]] over (source, _mk) minus a
    * per-source base offset (min running-sum-before within source) —
    * ONE range shuffle + a \|sources\|-bounded broadcast, never a
    * per-source single-task window; everything after is row-local.
    *
    * @param weight  per-source weight as a Column over `srcCol` (≥ 1;
    *                evaluated at source grain). Target of 0 tokens
    *                (budget·w < Σw) yields fill_ppm 0.
    * @param tokCount optional tokenizer-true token counter — the
    *                [[Export.assignShards]] contract (row-local,
    *                engine-portable); defaults to whitespace tokens.
    */
  def mixByTokens(docs: DataFrame, budgetTokens: Long, weight: Column,
      srcCol: String = "source", idCol: String = "doc_id",
      textCol: String = "text", tokCount: Option[Column] = None)
      : (DataFrame, DataFrame) = {
    require(budgetTokens > 0, s"token budget must be positive: $budgetTokens")
    val keyed = docs
      .withColumn("_tok", tokCount
        .getOrElse(size(split(col(textCol), " "))).cast(LongType))
      .withColumn("_mk", md5(concat(lit("mix|"), col(idCol).cast(StringType))))
    val cum = GlobalRank.withRunningSum(keyed,
      Seq(col(srcCol), col("_mk")), "_tok", "_cum")
    val srcStats = cum.groupBy(col(srcCol))
      .agg(min(col("_cum") - col("_tok")).as("_base"),
        count(lit(1)).as("n_docs"), sum(col("_tok")).as("avail_tokens"))
      .withColumn("w", weight.cast(LongType))
    val tot = srcStats.agg(sum(col("w")).as("_tw"))
    val targets = srcStats.crossJoin(broadcast(tot))
      .withColumn("target_tokens",
        expr(s"(${budgetTokens}L * w) div _tw"))
      .drop("_tw")
    val flagged = cum.join(
      broadcast(targets.select(col(srcCol), col("_base"),
        col("target_tokens"))), Seq(srcCol))
      .withColumn("_take",
        col("_cum") - col("_tok") - col("_base") < col("target_tokens"))
    val selected = flagged.filter(col("_take"))
      .drop("_base", "target_tokens", "_take", "_cum")
    val man = flagged.groupBy(col(srcCol))
      .agg(sum(when(col("_take"), 1L).otherwise(0L)).as("docs_taken"),
        sum(when(col("_take"), col("_tok")).otherwise(0L)).as("achieved_tokens"))
      .join(broadcast(targets.drop("_base")), Seq(srcCol))
      .select(col(srcCol), col("w"), asLong(col("n_docs")).as("n_docs"),
        col("avail_tokens"), col("target_tokens"),
        asLong(col("docs_taken")).as("docs_taken"), col("achieved_tokens"),
        when(col("target_tokens") > 0,
          expr("(achieved_tokens * 1000000) div target_tokens"))
          .otherwise(lit(0L)).as("fill_ppm"))
      .orderBy(srcCol)
    (selected, man)
  }

  /** The census weights/budget shared by the two §2.59 mixture faces:
    * weight = (length(source) % 3) + 1 — deterministic, engine-
    * portable, non-uniform across the fixture's sources; budget = 30%
    * of corpus whitespace-token mass, computed as ONE linear scan at
    * construction (exact BIGINT floor in both engines). */
  private def mixFixture(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val docs = table(s, d, "documents")
    val mass = docs
      .agg(sum(size(split(col("text"), " ")).cast(LongType)))
      .first().getLong(0)
    mixByTokens(docs, mass * 3 / 10, length(col("source")) % 3 + 1)
  }

  /** Source-mixture manifest (§2.59 oracle face): per source — weight,
    * availability, target vs achieved tokens, docs taken, fill ppm.
    * Exactness: every column is exact BIGINT arithmetic (targets by
    * integer div, the greedy cutoff on exact running sums, fill by
    * integer ppm div); the oracle replays the per-source running sum
    * as a partitioned window over the identical md5 order. */
  val pipelineMixManifest: Q = (s, d) => mixFixture(s, d)._2

  /** Selected-corpus census (§2.59 oracle face): per source over the
    * docs the mixture TOOK — doc/token counts plus the md5 range of
    * selected texts and the order-key range, pinning MEMBERSHIP and
    * the cutoff position themselves (the manifest pins the totals;
    * this pins which docs). */
  val pipelineMixCensus: Q = (s, d) =>
    mixFixture(s, d)._1
      .groupBy(col("source"))
      .agg(asLong(count(lit(1))).as("n_docs"),
        sum(col("_tok")).as("n_tokens"),
        min(md5(col("text"))).as("fp_min"),
        max(md5(col("text"))).as("fp_max"),
        min(col("_mk")).as("k_min"), max(col("_mk")).as("k_max"))
      .orderBy("source")
}
