package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Incremental URL-keyed exact-dedup maintenance over a versioned
  * corpus (round 15, VERDICT item 4): the cheapest, most-used crawl
  * dedup key — a doc's minimum canonicalized URL
  * ([[Crawl.urlKeyOf]], the EXACT expression [[Curation.urlDedup]]
  * keys on, shared so stage and state cannot drift) — advanced
  * O(delta) as new crawl snapshots land, instead of re-canonicalizing
  * the whole corpus per ingest.
  *
  * State is ONE relation: (doc_id, ukey) for every doc that carries a
  * URL (URL-less docs are never in the state — they always survive
  * URL dedup). The keep decision is a pure view over it
  * ([[keepers]]: min doc_id per key), so the advance only has to keep
  * the key relation right:
  *
  *  - changed doc_ids leave (update = leave then re-enter with the
  *    postimage text's key — a doc whose text LOST its URL correctly
  *    drops out of the state);
  *  - entering docs' keys are computed row-locally on the |delta|
  *    feed rows only.
  *
  * Everything is |delta|-bounded: the anti-join side broadcasts, the
  * only corpus-proportional touch is the stored table's file-pruned
  * DELETE (range-clustered on doc_id, untouched files asserted in
  * spec). Invariant (IncrementalUrlDedupSpec, the IncrementalDedup
  * precedent): `advance(...).keys == build(snapshot(toV)).keys` across
  * inserts, updates, deletes and multi-version ranges — and applying
  * the advanced state's keepers to the snapshot equals running
  * [[Curation.urlDedup]] on it from scratch.
  */
object IncrementalUrlDedup {

  /** (doc_id, ukey) for every URL-carrying doc. */
  case class State(keys: DataFrame)

  /** Full build — the bootstrap, and the equality oracle for
    * [[advance]]. `docs` must carry (doc_id, text). */
  def build(docs: DataFrame, textCol: String = "text"): State =
    State(stabilize(docs
      .select(col("doc_id"), Crawl.urlKeyOf(col(textCol)).as("ukey"))
      .filter(col("ukey").isNotNull)))

  /** The keep-list view: the smallest doc_id per canonical key — the
    * same keep-min-id discipline as every exact-dedup stage here. */
  def keepers(state: State): DataFrame =
    state.keys.groupBy(col("ukey")).agg(min(col("doc_id")).as("keep_id"))

  /** URL dedup of `docs` via the maintained state instead of a fresh
    * key scan: keeps URL-less docs (not in the state) and each key's
    * minimum doc_id. Equals [[Curation.urlDedup]] on the state's
    * snapshot (spec-pinned). */
  def apply(docs: DataFrame, state: State): DataFrame = {
    val drop = state.keys
      .join(keepers(state), col("doc_id") === col("keep_id"), "left_anti")
      .select(col("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Advance across one committed version range of a corpus
    * [[VersionedTable]] carrying (doc_id, text, ...). */
  def advance(spark: SparkSession, root: String, fromV: Long, toV: Long,
      state: State, textCol: String = "text"): State =
    advanceWithFeed(
      VersionedTable.changeFeed(spark, root, fromV, toV, Seq("doc_id")),
      state, textCol)

  /** The core increment, decoupled from where the feed comes from:
    * `feed` must be one version range's row-level changes (insert /
    * delete / update_pre/postimage over doc_id). No snapshot needed —
    * the key is a pure function of the feed row's text. */
  def advanceWithFeed(feed: DataFrame, state: State,
      textCol: String = "text"): State = {
    val (changedIds, entering) = patchOf(feed, textCol)
    val st = State(stabilize(state.keys
      .join(broadcast(changedIds), Seq("doc_id"), "left_anti")
      .unionByName(entering)))
    changedIds.unpersist(false)
    st
  }

  /** (ids leaving the state [persisted — caller unpersists], key rows
    * entering): the patch both the in-memory and stored paths apply. */
  private def patchOf(feed: DataFrame, textCol: String)
      : (DataFrame, DataFrame) = {
    val changedIds = feed.select(col("doc_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val entering = feed
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select(col("doc_id"), Crawl.urlKeyOf(col(textCol)).as("ukey"))
      .filter(col("ukey").isNotNull)
    (changedIds, entering)
  }

  /** State persisted as one [[VersionedTable]], range-clustered on
    * doc_id so each delta's predicate DELETE file-prunes to the
    * touched id ranges (spec-asserted: untouched files > 0). */
  case class StoredState(keysRoot: String)

  def bootstrapStored(spark: SparkSession, docs: DataFrame,
      keysRoot: String, textCol: String = "text",
      files: Int = 8): StoredState = {
    VersionedTable.create(spark, keysRoot,
      build(docs, textCol).keys.repartitionByRange(files, col("doc_id")))
    val st = StoredState(keysRoot)
    writeSync(spark, st)
    st
  }

  private val InChunk = 10000

  /** Advance the STORED state: chunked file-pruned DELETE of the
    * changed ids + one append of the entering key rows. Returns
    * (filesRewritten, filesKept) so callers/specs observe the pruning.
    * The DELETE and append are separate commits; the sync marker
    * (written only after a complete patch) makes a torn state
    * detectable — [[readStored]] refuses a head-version mismatch. */
  def advanceStored(spark: SparkSession, corpusRoot: String, fromV: Long,
      toV: Long, st: StoredState, textCol: String = "text"): (Int, Int) = {
    val feed =
      VersionedTable.changeFeed(spark, corpusRoot, fromV, toV, Seq("doc_id"))
    if (feed.isEmpty) {
      val kept = VersionedTable.history(spark, st.keysRoot)
        .orderBy(col("version").desc).select("n_files")
        .head().getLong(0).toInt
      writeSync(spark, st)
      return (0, kept)
    }
    val (changedIds, entering) = patchOf(feed, textCol)
    val ids = changedIds.collect().map(_.getLong(0))
    var touched = 0
    var kept = Int.MaxValue
    ids.grouped(InChunk).foreach { chunk =>
      val (_, t, k) = VersionedTable.deleteWhere(spark, st.keysRoot,
        s"doc_id IN (${chunk.mkString(",")})")
      touched += t; kept = math.min(kept, k)
    }
    if (entering.take(1).nonEmpty)
      VersionedTable.append(spark, st.keysRoot, entering)
    writeSync(spark, st)
    changedIds.unpersist(false)
    (touched, if (kept == Int.MaxValue) 0 else kept)
  }

  /** Read back, refusing a TORN state (sync marker's recorded head !=
    * the table's actual head means an advanceStored crashed between
    * its DELETE and append commits). */
  def readStored(spark: SparkSession, st: StoredState): State = {
    readSync(spark, st).foreach { v =>
      val head = VersionedTable.versions(spark, st.keysRoot).last
      // IllegalStateException, matching the IncrementalSpans torn-state
      // fence (round-16 advice): this is corrupted STATE, not a bad
      // argument
      if (head != v) throw new IllegalStateException(
        s"torn url-dedup state: sync marker records version $v but head " +
          s"is $head — an advanceStored was interrupted mid-patch; re-run " +
          "it or restore to the marker")
    }
    State(VersionedTable.read(spark, st.keysRoot))
  }

  private def syncPath(st: StoredState) =
    new org.apache.hadoop.fs.Path(st.keysRoot, "_urldedup_sync.json")

  private def writeSync(spark: SparkSession, st: StoredState): Unit = {
    val v = VersionedTable.versions(spark, st.keysRoot).last
    val path = syncPath(st)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      st.keysRoot, s"_urldedup_sync.json.tmp-$v")
    val out = fs.create(tmp, true)
    try out.write(s"""{"keys_version":$v}""".getBytes("UTF-8"))
    finally out.close()
    fs.delete(path, false)
    fs.rename(tmp, path)
  }

  private def readSync(spark: SparkSession, st: StoredState): Option[Long] = {
    val path = syncPath(st)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      """"keys_version":(\d+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toLong)
    }
  }

  private def stabilize(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** The zero state ([[advanceWithFeed]] of v1's all-insert feed over
    * it equals `build(v1 snapshot)` by construction). */
  def emptyState(spark: SparkSession): State = {
    import org.apache.spark.sql.types._
    State(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("ukey", StringType)))))
  }
}
