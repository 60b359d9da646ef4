package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable

/** Incremental substring-span dedup maintenance over a versioned
  * corpus (round 13, verdict item 3): [[IncrementalDedup]]'s pattern
  * applied to the positioned-shingle span relation behind
  * `dedup_substring_spans` / span excision. Instead of re-shingling
  * the whole corpus per ingest, [[advance]] consumes the row-level
  * change feed and patches three state relations:
  *
  *  - `shingles` (doc_id, pos, h): positioned 8-gram md5 shingles —
  *    only changed docs are re-shingled;
  *  - `dfCounts` (h, c): per-hash occurrence counts, patched
  *    arithmetically (c ← c − old occurrences of changed docs + new
  *    occurrences) — the [2,20] keep-set needs NO corpus recount;
  *  - `spans` (d1, d2, s1, s2, tok): recomputed ONLY for affected
  *    pairs.
  *
  * Affected pairs are exactly the pairs whose gram-match set can have
  * changed: every hash an old or new shingle of a changed doc carries
  * is an AFFECTED HASH (this covers df-cap transitions too — a hash
  * entering/leaving [2,20] because the delta added/removed occurrences
  * creates/destroys pairs between two UNCHANGED docs, which a naive
  * "pairs touching changed docs" patch would miss); the affected pair
  * set is the union of pairs those hashes form under the OLD keep-set
  * (spans to retire) and under the NEW one (spans to rebuild). The
  * [2,20] cap pigeonhole-bounds this at ≤ 190 pairs per affected hash,
  * so the increment is |delta|-bounded at ANY corpus size.
  *
  * Invariant (spec-pinned, the IncrementalDedup precedent): for every
  * version v, `advance(...) == build(snapshot(v))` on all three
  * relations, across inserts, updates and deletes. Both paths share
  * the exact shingle/pair/island formulas
  * ([[Pipelines.spanShingleDocs]], [[Pipelines.spanGramPairs]],
  * [[Pipelines.spansFromPairRows]]), so they cannot drift.
  *
  * Scale shape: re-shingling touches |delta| docs; the df patch and
  * the span patch are |delta|-bounded joins against the state; the
  * only corpus-proportional costs are the columnar state scans that
  * the anti-join rewrite (here) or a keyed, file-pruned MERGE (stored
  * deployment, the advanceStored recipe) absorbs. Nothing rebuilds
  * the gram join over unchanged docs.
  */
object IncrementalSpans {

  /** Persistent span-dedup state between corpus versions. */
  case class State(shingles: DataFrame, dfCounts: DataFrame, spans: DataFrame)

  private def stabilize(df: DataFrame): DataFrame = df.localCheckpoint(true)

  private val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

  private def keepOf(dfCounts: DataFrame): DataFrame =
    dfCounts.filter(col("c").between(2L, 20L)).select(col("h"))

  /** Full build — the bootstrap, and the equality oracle for
    * [[advance]]. `docs` must carry (doc_id, text) with doc_id a
    * unique key. */
  def build(docs: DataFrame, minTok: Int = 12): State = {
    val sh = Pipelines.spanShingleDocs(docs).persist(lvl)
    val dfc = sh.groupBy(col("h")).agg(count(lit(1)).as("c"))
    val dfcS = stabilize(dfc)
    val fk = sh.join(keepOf(dfcS), Seq("h"))
    val spans = Pipelines.spansFromPairRows(Pipelines.spanGramPairs(fk), minTok)
    val st = State(stabilize(sh), dfcS, stabilize(spans))
    sh.unpersist(false)
    st
  }

  /** Advance across one committed version range of a [[VersionedTable]]
    * whose schema contains (doc_id, text). */
  def advance(spark: SparkSession, root: String, fromV: Long, toV: Long,
      state: State, minTok: Int = 12): State =
    advanceWithFeed(spark,
      VersionedTable.changeFeed(spark, root, fromV, toV, Seq("doc_id")),
      state, minTok)

  /** The core increment, decoupled from where the feed comes from —
    * note NO corpus snapshot parameter: unlike MinHash verification
    * (which re-shingles candidate partners), every relation the span
    * patch needs lives in the state itself. */
  def advanceWithFeed(spark: SparkSession, feed: DataFrame, state: State,
      minTok: Int = 12): State = {
    // a version range CAN carry zero row changes (compaction/cluster
    // commits) — no-op instead of rewriting three checkpoints (the
    // IncrementalDedup empty-feed precedent)
    if (feed.isEmpty) return state
    val cf = feed.select(col("doc_id"), col("text"), col("_change_type"))
      .persist(lvl)
    val changedIds = cf.select(col("doc_id")).distinct()
    val entering = cf
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select(col("doc_id"), col("text"))

    val newSh = Pipelines.spanShingleDocs(entering).persist(lvl)
    val oldShChanged = state.shingles
      .join(broadcast(changedIds), Seq("doc_id"), "left_semi")
      .persist(lvl)

    // arithmetic df patch: c ← c − |old changed-doc occurrences| +
    // |new occurrences|; hashes reaching 0 leave the relation
    val oldCnt = oldShChanged.groupBy(col("h")).agg(count(lit(1)).as("c_old"))
    val newCnt = newSh.groupBy(col("h")).agg(count(lit(1)).as("c_new"))
    val deltaCnt = oldCnt.join(newCnt, Seq("h"), "full_outer")
      .select(col("h"),
        (coalesce(col("c_new"), lit(0L)) - coalesce(col("c_old"), lit(0L)))
          .as("dc"))
    val dfc2 = state.dfCounts
      .join(broadcast(deltaCnt), Seq("h"), "full_outer")
      .select(col("h"),
        (coalesce(col("c"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("c"))
      .filter(col("c") > 0L)

    // patched shingle state
    val sh2 = state.shingles
      .join(broadcast(changedIds), Seq("doc_id"), "left_anti")
      .unionByName(newSh)

    // every hash the delta touches (old OR new side) — the full set
    // of places where a pair's gram-match evidence can have moved
    val affH = oldShChanged.select(col("h"))
      .unionAll(newSh.select(col("h"))).distinct()

    // affected pairs: formable via an affected hash under the OLD
    // keep-set (state side — spans to retire) or the NEW one (spans
    // to rebuild). ≤190 pairs/hash by the [2,20] pigeonhole.
    def pairsVia(sh: DataFrame, keep: DataFrame): DataFrame = {
      val occ = sh
        .join(broadcast(affH.join(keep, Seq("h"), "left_semi")), Seq("h"),
          "left_semi")
      Pipelines.spanGramPairs(occ).select(col("d1"), col("d2")).distinct()
    }
    val pAff = pairsVia(state.shingles, keepOf(state.dfCounts))
      .unionAll(pairsVia(sh2, keepOf(dfc2)))
      .distinct()
      .persist(lvl)

    // recompute spans for exactly the affected pairs, from the patched
    // state: restrict the keep-filtered gram relation to the affected
    // docs, regenerate pair rows, keep only affected pairs
    val pAffDocs = pAff.select(col("d1").as("doc_id"))
      .unionAll(pAff.select(col("d2").as("doc_id"))).distinct()
    val fkR = sh2
      .join(broadcast(pAffDocs), Seq("doc_id"), "left_semi")
      .join(keepOf(dfc2), Seq("h"), "left_semi")
    val pairRowsR = Pipelines.spanGramPairs(fkR)
      .join(pAff, Seq("d1", "d2"), "left_semi")
    val spansR = Pipelines.spansFromPairRows(pairRowsR, minTok)

    // patch: retire every affected pair's spans, add the rebuilt ones
    val spans2 = state.spans
      .join(pAff, Seq("d1", "d2"), "left_anti")
      .unionByName(spansR)

    val st = State(stabilize(sh2), stabilize(dfc2), stabilize(spans2))
    Seq(cf, newSh, oldShChanged, pAff).foreach(_.unpersist(false))
    st
  }
}
