package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (build brief: "salting for skew,
  * AQE for runtime re-plan"). AQE's skew-join split handles most cases
  * automatically; explicit salting is the lever when one side must be
  * replicated deterministically — e.g. a dimension joined by a key
  * where a handful of values carry most of the fact rows.
  *
  * `saltedJoin(fact, dim, key, salts)`:
  *  - fact side gets a uniform deterministic salt in [0, salts) derived
  *    by hashing the full row's join key + a spread column — here a
  *    pmod of xxhash64 over all fact columns, so no RNG and results
  *    are reproducible;
  *  - dim side is exploded `salts` times;
  *  - the join key becomes (key, salt), splitting each hot key's rows
  *    across `salts` shuffle partitions instead of one.
  * Result equals the plain equi-join (asserted in SkewSpec).
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    // right/full outer would surface each unmatched dim row once per
    // salt replica (`salts` duplicates) — only fact-preserving types
    // (inner/left/semi/anti: a fact row's single salt always finds its
    // dim replica iff the key exists) are equivalent to the plain join
    require(Set("inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")(
        joinType.toLowerCase),
      s"saltedJoin supports fact-preserving joins only (dim side is replicated $salts×); got '$joinType'")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"),
        joinType)
      .drop("__salt")
  }
}
