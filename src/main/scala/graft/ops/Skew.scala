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

  /** Hot-key-TARGETED salting — the two-phase skew join (round 11).
    * [[saltedJoin]] replicates the ENTIRE dim `salts`×, which SkewBench
    * measured as a wash when the dim is within ~2 decades of the fact
    * (the replication sort cost eats the straggler saving). The
    * production pattern salts only the keys that are actually hot:
    *
    *  1. detect: one map-combined count over the fact keys, keep keys
    *     carrying > `hotFraction` of rows (bounded by 1/hotFraction
    *     keys — a driver-safe collect by construction);
    *  2. fact side: salt ONLY hot-key rows (others salt 0);
    *  3. dim side: replicate ONLY hot-key rows `salts`× (one tiny
    *     union of a broadcast-filtered slice — the cold dim is
    *     untouched).
    *
    * Equality with the plain join: every fact row still meets exactly
    * one replica of its dim row (hot rows the salted one, cold rows
    * replica 0). Fact-preserving join types only, like [[saltedJoin]].
    * The detect pass is one extra scan of the fact's key column —
    * amortized or precomputed in a real pipeline (hot keys are stable
    * day to day). */
  def saltedJoinHot(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int, hotFraction: Double = 0.01,
      joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")(
        joinType.toLowerCase),
      s"saltedJoinHot supports fact-preserving joins only; got '$joinType'")
    require(hotFraction > 0 && hotFraction <= 1,
      s"hotFraction in (0,1]: $hotFraction")
    val total = fact.count()
    val thr = math.max(1L, (total * hotFraction).toLong)
    // ≤ 1/hotFraction rows by pigeonhole — driver-safe
    val hotKeys = fact.groupBy(col(factKey)).count()
      .filter(col("count") >= thr)
      .select(col(factKey)).collect().map(_.get(0)).toSeq
    if (hotKeys.isEmpty)
      return fact.join(dim, fact(factKey) === dim(dimKey), joinType)
    val isHotF = col(factKey).isin(hotKeys: _*)
    val saltedFact = fact.withColumn("__salt",
      when(isHotF,
        pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
        .otherwise(lit(0)))
    val isHotD = col(dimKey).isin(hotKeys: _*)
    val saltedDim = dim.withColumn("__salt",
      when(isHotD, sequence(lit(0), lit(salts - 1)))
        .otherwise(array(lit(0))))
      .withColumn("__salt", explode(col("__salt")))
    saltedFact
      .join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("__salt") === saltedDim("__salt"),
        joinType)
      .drop("__salt")
  }
}
