package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Run-to-convergence iteration as a first-class API (SURVEY §2.8's
  * arbitrary-depth traversal, generalized). Two modes:
  *
  *  - `fixed`: exactly `rounds` applications of `step`, each round's
  *    output persisted so within-plan re-references (self-loop unions,
  *    final aggregations) compute it once. Stays one lazy plan — no
  *    driver actions — so it composes into oracle queries unchanged.
  *
  *  - `converge`: iterate until a round changes nothing (row-delta
  *    stop: `next exceptAll prev` empty) or `maxRounds` is hit. Each
  *    round is `localCheckpoint`ed — lineage is truncated to the
  *    materialized blocks, which is what keeps 100+-round jobs from
  *    re-shuffling the whole history every round (the classic iterative
  *    DataFrame trap). A superseded round's checkpoint blocks belong to
  *    its checkpoint RDD, not the plan cache (`unpersist` would be a
  *    no-op) — dropping the reference here lets Spark's ContextCleaner
  *    reclaim them asynchronously once the RDD is collected.
  *
  * graph_cc_labelprop and dedup_clusters run their oracle-fixed 4
  * rounds through `fixed`; the test suite runs `converge` label-prop to
  * the true fixpoint and asserts it matches GraphX connectedComponents.
  */
object Iterate {

  /** Exactly `rounds` applications of `step`, lazily, each round
    * persisted at MEMORY_AND_DISK. */
  def fixed(init: DataFrame, rounds: Int)(step: DataFrame => DataFrame): DataFrame = {
    var cur = init
    for (_ <- 1 to rounds)
      cur = step(cur).persist(StorageLevel.MEMORY_AND_DISK)
    cur
  }

  /** Iterate `step` until a fixpoint (no row added or removed vs the
    * previous round, multiset semantics) or `maxRounds`. Eager: each
    * round materializes via localCheckpoint (lineage truncation).
    * Returns the converged round (checkpointed). */
  def converge(init: DataFrame, maxRounds: Int)(step: DataFrame => DataFrame): DataFrame = {
    var prev = init.localCheckpoint(true)
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      val next = step(prev).localCheckpoint(true)
      rounds += 1
      // row-delta stop: a label-prop/frontier round that produced the
      // identical multiset is the fixpoint (both directions covered —
      // equal cardinality is not assumed)
      done = next.exceptAll(prev).isEmpty && prev.exceptAll(next).isEmpty
      // superseded round: blocks are freed by ContextCleaner once the
      // checkpoint RDD is unreferenced (see scaladoc)
      prev = next
    }
    prev
  }
}
