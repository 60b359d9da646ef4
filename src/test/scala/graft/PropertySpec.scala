package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic-law checks over the engine (SURVEY §5.4). Pure-function
  * properties run under ScalaCheck in CosineProps; the DataFrame-level
  * laws here use the fixed sf0.001 corpus (deterministic by §5.3). */
class PropertySpec extends AnyFunSuite {
  import SharedSpark._

  test("filter conjunction is order-independent (pushdown invariance)") {
    val li = Tables(spark, sf0001, "lineitem")
    val a = li.filter(col("l_quantity") > 20).filter(col("l_discount") < 0.05).count()
    val b = li.filter(col("l_discount") < 0.05).filter(col("l_quantity") > 20).count()
    val c = li.filter(col("l_quantity") > 20 && col("l_discount") < 0.05).count()
    assert(a == b && b == c)
  }

  test("inner join is commutative on row count") {
    val o = Tables(spark, sf0001, "orders")
    val c = Tables(spark, sf0001, "customer")
    val ab = o.join(c, o("o_custkey") === c("c_custkey")).count()
    val ba = c.join(o, o("o_custkey") === c("c_custkey")).count()
    assert(ab == ba)
  }

  test("union-distinct is idempotent") {
    val k = Tables(spark, sf0001, "customer").select("c_custkey")
    assert(k.union(k).distinct().count() == k.distinct().count())
  }

  test("jaccard outputs are within [0, 1]") {
    val j = ops.TextSim.dedupNearJaccard(spark, sf0001)
    assert(j.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0)
  }

  test("PageRank top-30 mass is positive and bounded by total mass 1") {
    val topSum = ops.GraphOps.graphPagerank3(spark, sf0001)
      .agg(sum(col("pagerank"))).collect()(0).getDouble(0)
    assert(topSum > 0 && topSum <= 1.0 + 1e-6)
  }

  test("sessionization: session count bounded by event count per user") {
    val s = ops.StreamOps.streamSessionize(spark, sf0001)
    val ev = Tables(spark, sf0001, "events").groupBy("user_id").count()
    assert(s.join(ev, "user_id").filter(col("n_sessions") > col("count")).count() == 0)
  }

  test("round-7 telemetry invariants: bounded indices, consistent censuses") {
    val d = sf0001
    // HHI of k segments lies in [1/k, 1]; sums reconcile
    ops.Relational.aggHhi(spark, d).collect().foreach { r =>
      val k = r.getAs[Long]("n_segments").toDouble
      val h = r.getAs[Double]("hhi")
      assert(h >= 1.0 / k - 1e-9 && h <= 1.0 + 1e-9, s"hhi $h outside [1/$k, 1]")
    }
    // char entropy is within [0, ln(distinct chars)]
    ops.TextSim.textCharEntropy(spark, d).collect().foreach { r =>
      val h = r.getAs[Double]("char_entropy")
      val kk = r.getAs[Long]("n_distinct_chars").toDouble
      assert(h >= -1e-9 && h <= math.log(kk) + 1e-4, s"entropy $h vs ln($kk)")
    }
    // vocab jaccard in [0,1]; stickiness in (0,1]; shares sum to 1
    ops.Pipelines.pipelineVocabOverlap(spark, d).collect().foreach { r =>
      val j = r.getAs[Double]("vocab_jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
    ops.TimeSeries.tsActiveUsersRolling(spark, d).collect().foreach { r =>
      val st = r.getAs[Double]("stickiness")
      assert(st > 0.0 && st <= 1.0 + 1e-9)
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("wau"))
    }
    val shares = ops.Relational.aggBenfordFirstDigit(spark, d)
      .agg(sum(col("share"))).collect()(0).getDouble(0)
    assert(math.abs(shares - 1.0) < 1e-3, s"benford shares sum $shares")
    // degree octaves: bucket bounds consistent, node total = node count
    val oct = ops.GraphOps.graphDegreeDistribution(spark, d).collect()
    oct.foreach { r =>
      val o = r.getAs[Int]("octave")
      val lo = r.getAs[Long]("min_deg"); val hi = r.getAs[Long]("max_deg")
      assert(lo >= (1L << o) || o == 0, s"octave $o min $lo")
      assert(hi < (1L << (o + 1)), s"octave $o max $hi")
    }
    val nNodes = Tables.ud(spark, d).select("s").distinct().count()
    assert(oct.map(_.getAs[Long]("n_nodes")).sum == nNodes)
    // sweep-line concurrency: per-day peak cannot exceed that day's
    // started sessions plus everything carried in (bounded by users)
    val users = Tables(spark, d, "events")
      .filter(col("user_id").isNotNull).select("user_id").distinct().count()
    ops.TimeSeries.tsPeakConcurrency(spark, d).collect().foreach { r =>
      val pk = r.getAs[Long]("peak_concurrency")
      assert(pk >= 1 && pk <= users, s"peak $pk vs $users users")
    }
  }

  test("simhash hamming distances are within [0, 32]") {
    val d = ops.Pipelines.dedupSimhash(spark, sf0001)
    assert(d.filter(col("hamming") < 0 || col("hamming") > 32).count() == 0)
  }

  test("pigeonhole banding is recall-complete on random fingerprints") {
    // property behind the dedup_simhash candidate join: ANY pair with
    // hamming <= 4 over 32 bits shares at least one of the 5 chunks
    // (7+7+6+6+6) verbatim — checked on seeded random fingerprints +
    // adversarial <=4-bit corruptions
    val rnd = new scala.util.Random(42)
    val chunks = Seq((0, 127L), (7, 127L), (14, 63L), (20, 63L), (26, 63L))
    def shareChunk(a: Long, b: Long): Boolean =
      chunks.exists { case (off, mask) => ((a >> off) & mask) == ((b >> off) & mask) }
    (1 to 2000).foreach { _ =>
      val fp = rnd.nextLong() & 0xffffffffL
      val nFlips = rnd.nextInt(5) // 0..4
      val flipped = (1 to nFlips).foldLeft(fp)((v, _) => v ^ (1L << rnd.nextInt(32)))
      assert(java.lang.Long.bitCount(fp ^ flipped) <= 4)
      assert(shareChunk(fp, flipped), f"missed pair $fp%08x / $flipped%08x")
    }
  }

  test("prefix filtering is recall-complete on random token sets") {
    // property behind the dedup_near_jaccard candidates: under any
    // shared global token order, sets with J >= 0.8 intersect within
    // their floor(0.2|d|)+1 smallest-ranked tokens
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 60).map(i => s"w$i")
    val order = rnd.shuffle(vocab).zipWithIndex.toMap // global rank
    def prefix(s: Set[String]): Set[String] =
      s.toSeq.sortBy(order).take((0.2 * s.size).toInt + 1).toSet
    var tested = 0
    (1 to 3000).foreach { _ =>
      val base = rnd.shuffle(vocab).take(10 + rnd.nextInt(20)).toSet
      // derive a near-duplicate by small edits
      val b = base -- rnd.shuffle(base.toSeq).take(rnd.nextInt(3)) ++
        rnd.shuffle(vocab).take(rnd.nextInt(3))
      val j = base.intersect(b).size.toDouble / base.union(b).size
      if (j >= 0.8) {
        tested += 1
        assert(prefix(base).intersect(prefix(b)).nonEmpty,
          s"missed pair with J=$j:\n$base\n$b")
      }
    }
    assert(tested > 100) // the generator actually produced near-dups
  }

  test("as-of window form equals naive groupBy-max on random event streams") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    // random interleavings incl. equal-ts click/purchase collisions
    val rows = (1 to 400).map { i =>
      (i.toLong, rnd.nextInt(12).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(500) * 1000L),
        if (rnd.nextBoolean()) "click" else "purchase")
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type")
    val out = java.nio.file.Files.createTempDirectory("graft_asof_prop").toString
    ev.write.mode("overwrite").parquet(s"$out/events.parquet")
    val got = ops.Relational.joinAsof(spark, out)
    // independent naive recomputation (the oracle's shape)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("ts").as("cts"))
    val want = p.join(c, col("cu") === col("user_id") && col("cts") <= col("ts"))
      .groupBy(col("event_id"), col("user_id"))
      .agg(max(col("cts")).as("last_click_ts"))
    assert(got.count() == want.count())
    assert(got.exceptAll(want.select("event_id", "user_id", "last_click_ts")).count() == 0)
  }

  test("3-step funnel: stage times strictly ordered, stage matches nulls") {
    val rows = ops.Relational.funnelThreeStep(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (t1, t2, t3) = (r.getAs[java.sql.Timestamp]("t_view"),
        r.getAs[java.sql.Timestamp]("t_click"), r.getAs[java.sql.Timestamp]("t_purchase"))
      assert(t1 != null)
      if (t2 != null) assert(t1.before(t2))
      if (t3 != null) { assert(t2 != null); assert(t2.before(t3)) }
      val stage = r.getAs[Int]("stage")
      assert(stage == (if (t3 != null) 3 else if (t2 != null) 2 else 1))
    }
  }

  test("interval overlap: bounds, key order, uniqueness") {
    val rows = ops.Relational.joinIntervalOverlap(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("e1") < r.getAs[Long]("e2"))
      // o rounds to 3 decimals: a pair 299.9996 s apart legitimately
      // rounds to 0.0, so the lower bound is inclusive
      val o = r.getAs[Double]("overlap_sec")
      assert(o >= 0 && o <= 300.0)
    }
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).distinct.length == rows.length)
  }

  test("weighted median: bounded by group extremes, covers half the weight") {
    val li = Tables(spark, sf0001, "lineitem")
    val got = ops.Relational.aggWeightedMedian(spark, sf0001).collect()
    got.foreach { r =>
      val flag = r.getString(0)
      val m = r.getAs[Double]("weighted_median")
      val g = li.filter(col("l_returnflag") === flag)
      val Array(lo, hi) = g.agg(min("l_extendedprice"), max("l_extendedprice"))
        .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
      assert(m >= lo && m <= hi)
      // the defining property: weight at or below the median >= half
      val (below, total) = (
        g.filter(col("l_extendedprice") <= m).agg(sum("l_quantity")).collect()(0).getDouble(0),
        g.agg(sum("l_quantity")).collect()(0).getDouble(0))
      assert(below * 2 >= total)
    }
  }

  test("k-per-group sample: at most k rows per stratum, drawn from the stratum") {
    val got = ops.Sampling.sampleKPerGroup(spark, sf0001)
    val sizes = got.groupBy("lang").count().collect()
    assert(sizes.forall(_.getLong(1) <= 5))
    val docs = Tables(spark, sf0001, "documents").select("doc_id", "lang")
    assert(got.select("doc_id", "lang").exceptAll(docs).count() == 0)
  }

  test("3-core pruning actually deletes (sf0.01 — the golden SF is a no-op there)") {
    // at sf0.001 every node has degree >= 6, so the sf0.001 golden pin
    // cannot distinguish the pruning loop from the identity; sf0.01 is
    // the scale where deletion semantics are actually exercised
    val sf001 = "/root/testdata/sf0.01"
    val before = Tables.ud(spark, sf001).select("s").distinct().count()
    val core = ops.GraphOps.graphKcore3(spark, sf001)
    val after = core.count()
    assert(after == 1104, s"3-core node count moved: $after")
    assert(after < before, s"pruning removed nothing ($before -> $after)")
    // a 3-round PARTIAL fixpoint legitimately leaves sub-3 degrees
    // (the last deletion lowers survivors' degrees — convergence would
    // take more rounds); pin the observed floor so a silent extra or
    // missing round shows up
    assert(core.agg(min(col("degree"))).collect()(0).getLong(0) == 2L)
  }

  test("fuzzy match: blocked pairs share the noun and respect the distance bound") {
    val rows = ops.Funcs.fnFuzzyMatch(spark, sf0001).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("p1") < r.getAs[Long]("p2"))
      assert(r.getAs[Long]("dist") <= 2)
    }
  }

  test("round-8 batch-3/4 invariants: bounded statistics, monotone curves") {
    // chi-squared: non-negative statistic, Cramér's V in [0, 1]
    val chi = ops.Relational.aggChi2Dow(spark, sf0001).collect()(0)
    assert(chi.getAs[Long]("chi2_q6") >= 0L)
    val v = chi.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)

    // JSD: all C(20,2) pairs present, each within [0, ln 2]
    val jsd = ops.Pipelines.pipelineJsDivergence(spark, sf0001).collect()
    assert(jsd.length == 190)
    jsd.foreach { r =>
      val x = r.getAs[Double]("jsd")
      assert(x >= 0.0 && x <= math.log(2) + 1e-9, s"jsd out of range: $x")
    }

    // Lorenz: 10 deciles, cum_share strictly increasing to 1.0
    val lor = ops.Relational.aggLorenzPoints(spark, sf0001).collect()
    assert(lor.length == 10)
    val shares = lor.map(_.getAs[Double]("cum_share"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a < b })
    assert(math.abs(shares.last - 1.0) < 1e-9)

    // RFM: quintiles in 1..5, segment sizes sum to the customer count
    val rfm = ops.Relational.aggRfmSegments(spark, sf0001).collect()
    rfm.foreach { r =>
      Seq("r_q", "f_q", "m_q").foreach { c =>
        val q = r.getAs[Long](c); assert(q >= 1L && q <= 5L)
      }
    }
    val nCust = Tables(spark, sf0001, "orders")
      .select("o_custkey").distinct().count()
    assert(rfm.map(_.getAs[Long]("n_customers")).sum == nCust)

    // runs test: partition sums to n_days, runs within [1, n_days]
    val rt = ops.TimeSeries.tsRunsTest(spark, sf0001).collect()(0)
    assert(rt.getAs[Long]("n_above") + rt.getAs[Long]("n_below") ==
      rt.getAs[Long]("n_days"))
    val runs = rt.getAs[Long]("n_runs")
    assert(runs >= 1L && runs <= rt.getAs[Long]("n_days"))

    // winsorized mean: clamped location stays inside the clamp band
    val wm = ops.Relational.aggWinsorizedMean(spark, sf0001).collect()(0)
    val (p05, p95) = (wm.getAs[Double]("p05"), wm.getAs[Double]("p95"))
    val wmean = wm.getAs[Double]("winsorized_mean")
    assert(p05 <= wmean && wmean <= p95)

    // streaks: longest <= active days; at least one streak per user
    ops.TimeSeries.tsStreakLongest(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("longest_streak") <= r.getAs[Long]("active_days"))
      assert(r.getAs[Long]("n_streaks") >= 1L)
    }

    // coverage curve: nondecreasing in k, bounded by 1
    val cov = ops.Pipelines.pipelineTopTokenCoverage(spark, sf0001).collect()
      .map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
    assert(cov.forall(c => c > 0.0 && c <= 1.0))

    // group quantiles: ordered within every group
    ops.Relational.aggGroupQuantiles(spark, sf0001).collect().foreach { r =>
      val qs = Seq("p10", "p25", "p50", "p75", "p90").map(r.getAs[Double])
      assert(qs.zip(qs.tail).forall { case (a, b) => a <= b })
    }

    // activity entropy: within [0, ln 24]
    ops.TimeSeries.tsActivityEntropy(spark, sf0001).collect().foreach { r =>
      val h = r.getAs[Double]("hour_entropy")
      assert(h >= -1e-9 && h <= math.log(24) + 1e-6)
    }

    // nearest as-of: non-negative gaps, null gap iff no purchase found
    ops.Relational.joinAsofNearest(spark, sf0001).collect().foreach { r =>
      val gapNull = r.isNullAt(r.fieldIndex("gap_us"))
      assert(gapNull == r.isNullAt(r.fieldIndex("nearest_purchase")))
      if (!gapNull) assert(r.getAs[Long]("gap_us") >= 0L)
    }

    // drawdown: peak dominates revenue, drawdown non-negative
    ops.Windows.winDrawdown(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Double]("peak") >= r.getAs[Double]("rev"))
      assert(r.getAs[Double]("drawdown") >= 0.0)
    }

    // Theil–Sen: the pair set is exactly the day-pair triangle
    val ts = ops.TimeSeries.tsTheilSen(spark, sf0001).collect()(0)
    val nd = ts.getAs[Long]("n_days")
    assert(ts.getAs[Long]("n_pairs") == nd * (nd - 1) / 2)

    // neighbor-degree curve: every class non-empty with mean degree >= 1
    ops.GraphOps.graphAvgNeighborDegree(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("n_nodes") >= 1L)
      assert(r.getAs[Double]("avg_nbr_deg") >= 1.0)
    }
  }

  test("round-8 batch-5 invariants: test statistics, curves, generators") {
    // KS: statistic in [0, 1], samples partition the filtered rows
    val ks = ops.Relational.aggKsTest(spark, sf0001).collect()(0)
    assert(ks.getAs[Double]("ks") >= 0.0 && ks.getAs[Double]("ks") <= 1.0)
    val nCp = Tables(spark, sf0001, "events")
      .filter(col("value").isNotNull &&
        col("event_type").isin("click", "purchase")).count()
    assert(ks.getAs[Long]("n1") + ks.getAs[Long]("n2") == nCp)

    // Mann–Whitney: U in [0, n1*n2], finite z
    val mw = ops.Relational.aggMannWhitney(spark, sf0001).collect()(0)
    val (n1, n2) = (mw.getAs[Long]("n1"), mw.getAs[Long]("n2"))
    val u = mw.getAs[Double]("u")
    assert(u >= 0.0 && u <= n1.toDouble * n2)
    assert(!mw.getAs[Double]("z").isNaN)

    // MI: non-negative, normalized MI in [0, 1]
    val mi = ops.Relational.aggMutualInformation(spark, sf0001).collect()(0)
    assert(mi.getAs[Double]("mi") >= -1e-9)
    val nmi = mi.getAs[Double]("nmi")
    assert(nmi >= -1e-9 && nmi <= 1.0)

    // covariance matrix: 6 pairs, diagonal corr 1, |corr| <= 1,
    // diagonal cov (variance) non-negative
    val cm = ops.Relational.aggCovMatrix(spark, sf0001).collect()
    assert(cm.length == 6)
    cm.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      if (r.getAs[String]("var_x") == r.getAs[String]("var_y")) {
        assert(math.abs(c - 1.0) < 1e-6)
        assert(r.getAs[Double]("cov") >= 0.0)
      }
    }

    // ANOVA: both sums of squares and F non-negative
    val an = ops.Relational.aggAnovaF(spark, sf0001).collect()(0)
    assert(an.getAs[Double]("ssb") >= 0.0)
    assert(an.getAs[Double]("ssw") >= 0.0)
    assert(an.getAs[Double]("f") >= 0.0)

    // CUSUM: final point returns to exactly zero by construction
    // ((nd·Σrev − nd·Σrev)/nd); |cusum| bounded by nd·max|rev|
    val cu = ops.TimeSeries.tsCusum(spark, sf0001).collect()
    assert(math.abs(cu.last.getAs[Double]("cusum")) == 0.0)

    // ship-lag histogram: buckets are week floors, shares sum to 1
    val lag = ops.TimeSeries.tsOrderToShipLag(spark, sf0001).collect()
    assert(lag.forall(_.getAs[Long]("bucket_lo") % 7 == 0))
    assert(math.abs(lag.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)

    // dormancy: known bucket floors, users partitioned
    val dm = ops.TimeSeries.tsDormancyBuckets(spark, sf0001).collect()
    assert(dm.map(_.getAs[Long]("bucket_lo")).toSet.subsetOf(Set(0L, 6L, 24L, 72L)))
    assert(math.abs(dm.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)

    // minhash calibration: buckets cover the verified pair set exactly,
    // estimates in [0, 1], errors non-negative
    val cal = ops.Pipelines.pipelineMinhashCalibration(spark, sf0001).collect()
    val nPairs = ops.Pipelines.dedupMinhashLsh(spark, sf0001).count()
    assert(cal.map(_.getAs[Long]("n_pairs")).sum == nPairs)
    cal.foreach { r =>
      val m = r.getAs[Long]("matches")
      assert(m >= 0L && m <= 16L)
      val est = r.getAs[Double]("est_jaccard")
      assert(est >= 0.0 && est <= 1.0)
      assert(r.getAs[Double]("mean_abs_err") >= 0.0)
    }

    // burstiness: exactly top-20, df bounded by corpus, Fano > 0
    val bu = ops.Pipelines.pipelineBurstiness(spark, sf0001).collect()
    assert(bu.length == 20)
    val nDocs = Tables(spark, sf0001, "documents").count()
    bu.foreach { r =>
      assert(r.getAs[Long]("df") <= nDocs)
      assert(r.getAs[Double]("fano") > 0.0)
    }

    // rich club: node and edge counts nonincreasing in k, phi in [0, 1]
    val rc = ops.GraphOps.graphRichClub(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("k"))
    val nn = rc.map(_.getAs[Long]("n_nodes"))
    val ne = rc.map(_.getAs[Long]("n_edges"))
    assert(nn.zip(nn.tail).forall { case (a, b) => a >= b })
    assert(ne.zip(ne.tail).forall { case (a, b) => a >= b })
    rc.foreach { r =>
      val phi = r.getAs[Double]("phi")
      assert(phi >= 0.0 && phi <= 1.0)
    }

    // sequence generators: closed forms hold on every row
    ops.Funcs.fnSequence(spark, sf0001).collect().foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("seq_sz") == n)
      assert(r.getAs[Long]("seq_sum") == n * (n + 1) / 2)
      assert(r.getAs[Long]("n_even") == n / 2)
      assert(r.getAs[Long]("dseq_sz") == n + 1)
    }
  }

  test("round-8 batch-6 invariants: map semantics, sweeps, decomposition") {
    // map family: lookup/concat/keys behave per spec on every row
    ops.Funcs.fnMap(spark, sf0001).collect().foreach { r =>
      assert(r.isNullAt(r.fieldIndex("missing_v")))
      assert(r.getAs[Long]("n_keys") == 2L)
      assert(r.getAs[String]("keys_csv") == "status,pri")
      assert(r.getAs[String]("concat_v") ==
        r.getAs[String]("status_v").toUpperCase)
    }

    // elasticity: the discount grid is the 2dp domain; the OLS slope
    // and intercept are global constants repeated on every band row
    val el = ops.Relational.aggDiscountElasticity(spark, sf0001).collect()
    assert(el.map(_.getAs[Double]("slope")).distinct.length == 1)
    assert(el.map(_.getAs[Double]("intercept")).distinct.length == 1)
    el.foreach(r => assert(r.getAs[Double]("avg_qty") > 0.0))

    // backlog sweep: never negative, and every order eventually
    // closes, so the final running value is exactly zero
    val bl = ops.TimeSeries.tsOrderBacklog(spark, sf0001).collect()
    assert(bl.forall(_.getAs[Long]("open_orders") >= 0L))
    assert(bl.last.getAs[Long]("open_orders") == 0L)

    // weekday ANOVA: 7 groups, non-negative decomposition
    val wa = ops.TimeSeries.tsWeekdayAnova(spark, sf0001).collect()(0)
    assert(wa.getAs[Long]("k") == 7L)
    assert(wa.getAs[Double]("ssb") >= 0.0)
    assert(wa.getAs[Double]("ssw") >= 0.0)
    assert(wa.getAs[Double]("f") >= 0.0)

    // token positions: relpos statistics live in (0, 1] x [0, 0.5]
    val tp = ops.Pipelines.pipelineTokenPositions(spark, sf0001).collect()
    assert(tp.length == 10)
    tp.foreach { r =>
      val m = r.getAs[Double]("mean_relpos")
      assert(m > 0.0 && m <= 1.0)
      val sd = r.getAs[Double]("std_relpos")
      assert(sd >= 0.0 && sd <= 0.5 + 1e-9)
    }

    // cosine histogram: buckets inside [-10, 10], pairs partition the
    // sampled triangle, shares sum to 1
    val ch = ops.TextSim.simCosineHistogram(spark, sf0001).collect()
    val m = Tables(spark, sf0001, "embeddings")
      .filter(col("vec_id") % 4 === 0).count()
    assert(ch.map(_.getAs[Long]("n_pairs")).sum == m * (m - 1) / 2)
    assert(ch.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= -10L && b <= 10L
    })
    assert(math.abs(ch.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)

    // core decomposition: shells nest (nonincreasing in k), and the
    // k=3 shell is exactly the kcore3 node set
    val cd = ops.GraphOps.graphCoreDecomposition(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("k"))
    val nn = cd.map(_.getAs[Long]("n_nodes"))
    val ne = cd.map(_.getAs[Long]("n_edges"))
    assert(nn.zip(nn.tail).forall { case (a, b) => a >= b })
    assert(ne.zip(ne.tail).forall { case (a, b) => a >= b })
    val k3 = cd.find(_.getAs[Long]("k") == 3L).get.getAs[Long]("n_nodes")
    assert(k3 == ops.GraphOps.graphKcore3(spark, sf0001).count())
  }

  test("round-8 batch-7 invariants: rank selection, shares, transitivity") {
    // discrete quantiles: nondecreasing in p, every value attained
    // (exists in the column), ranks within [1, N]
    val qd = ops.Relational.aggQuantilesDisc(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("p"))
    val vals = qd.map(_.getAs[Double]("value"))
    assert(vals.zip(vals.tail).forall { case (a, b) => a <= b })
    val nOrders = Tables(spark, sf0001, "orders").count()
    qd.foreach { r =>
      val rk = r.getAs[Long]("rank_sel")
      assert(rk >= 1L && rk <= nOrders)
    }

    // magnitude histogram: shares sum to 1; min/max consistent with
    // the digit count of the floored value
    val mh = ops.Relational.aggMagnitudeHistogram(spark, sf0001).collect()
    assert(math.abs(mh.map(_.getAs[Double]("share")).sum - 1.0) < 1e-3)
    mh.foreach { r =>
      val dgs = r.getAs[Long]("digits")
      assert(r.getAs[Double]("min_value").toLong.toString.length == dgs)
      assert(r.getAs[Double]("max_value").toLong.toString.length == dgs)
    }

    // transitivity: in [0, 1], and wedges dominate 3*triangles
    val tr = ops.GraphOps.graphTransitivity(spark, sf0001).collect()(0)
    val t = tr.getAs[Double]("transitivity")
    assert(t >= 0.0 && t <= 1.0)
    assert(3L * tr.getAs[Long]("triangles") <= tr.getAs[Long]("wedges"))

    // rebalance: kept <= docs, rate in (0, 1], achieved tracks target
    // within binomial noise at the fixture's per-source doc counts
    val rb = ops.Sampling.sampleRebalance(spark, sf0001).collect()
    rb.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
      val rate = r.getAs[Double]("target_rate")
      assert(rate > 0.0 && rate <= 1.0)
      if (rate == 1.0)
        assert(r.getAs[Long]("n_kept") == r.getAs[Long]("n_docs"))
    }

    // char trigrams: top-15, every gram 3 chars, shares <= 1 and
    // ordered nonincreasing
    val ct = ops.Pipelines.pipelineCharTrigrams(spark, sf0001).collect()
    assert(ct.length == 15)
    assert(ct.forall(_.getAs[String]("g").length == 3))
    val ns = ct.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })

    // weekend effect: two sides partitioning the day relation, ratio
    // consistent with the two reported means
    val we = ops.TimeSeries.tsWeekendEffect(spark, sf0001).collect()
    assert(we.length == 2)
    val byS = we.map(r => r.getAs[Boolean]("is_weekend") ->
      r.getAs[Double]("avg_daily_rev")).toMap
    val ratio = we.head.getAs[Double]("wknd_over_wkday")
    assert(math.abs(ratio - byS(true) / byS(false)) < 1e-3)
  }

  test("round-8 batch-8 invariants: drift, homophily, correlation") {
    // mix shift: chi2 non-negative, max_share in [1/|pri|, 1]
    val ms = ops.TimeSeries.tsPriorityMixShift(spark, sf0001).collect()
    ms.foreach { r =>
      assert(r.getAs[Double]("chi2") >= 0.0)
      val sh = r.getAs[Double]("max_share")
      assert(sh >= 0.2 - 1e-9 && sh <= 1.0)
    }

    // homophily: shares in [0,1], Q in [-1,1], same <= edges
    val bh = ops.GraphOps.graphBrandHomophily(spark, sf0001).collect()(0)
    assert(bh.getAs[Long]("same_brand_edges") <= bh.getAs[Long]("n_edges"))
    Seq("observed_share", "expected_share").foreach { c =>
      val v = bh.getAs[Double](c); assert(v >= 0.0 && v <= 1.0)
    }
    val q = bh.getAs[Double]("assortativity_q")
    assert(q >= -1.0 - 1e-9 && q <= 1.0 + 1e-9)

    // length-vocab: r in [-1,1], vocab mean cannot exceed token mean
    val lv = ops.Pipelines.pipelineLenVocabCorr(spark, sf0001).collect()(0)
    val r = lv.getAs[Double]("pearson_r")
    assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9)
    assert(lv.getAs[Double]("mean_vocab") <= lv.getAs[Double]("mean_tokens"))

    // anchor separation: the full label-pair triangle, cosines in [-1,1]
    val as = ops.TextSim.simAnchorSeparation(spark, sf0001).collect()
    val nLabels = Tables(spark, sf0001, "embeddings")
      .select("label").distinct().count()
    assert(as.length == nLabels * (nLabels - 1) / 2)
    as.foreach { r2 =>
      val c = r2.getAs[Double]("anchor_cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("round-8 batch-9 invariants: skyline domination, prefilter exactness") {
    // skyline: no returned point dominates another (pairwise check on
    // the small front), and no point in the table dominates any of them
    val front = ops.Relational.joinSkyline(spark, sf0001).collect()
      .map(r => (r.getAs[Double]("price"),
        r.getAs[java.sql.Date]("order_date").toLocalDate.toEpochDay))
    for (a <- front; b <- front if a != b)
      assert(!(a._1 >= b._1 && a._2 >= b._2 && (a._1 > b._1 || a._2 > b._2)),
        s"front point $b dominated by $a")
    val all = Tables(spark, sf0001, "orders")
      .select(col("o_totalprice").cast("decimal(18,2)").cast("double").as("p"),
        to_date(col("o_orderdate")).as("dt")).collect()
      .map(r => (r.getDouble(0), r.getAs[java.sql.Date]("dt").toLocalDate.toEpochDay))
    for (b <- front)
      assert(!all.exists(a => a._1 >= b._1 && a._2 >= b._2 &&
        (a._1 > b._1 || a._2 > b._2)), s"table dominates front point $b")

    // prefiltered semi join: identical row set to the plain semi join
    val pre = ops.Relational.joinSemiPrefilter(spark, sf0001)
      .select("o_orderkey")
    val plain = Tables(spark, sf0001, "orders")
      .join(Tables(spark, sf0001, "lineitem")
        .filter(col("l_quantity").cast("decimal(18,2)") >= 45)
        .select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey")
    assert(pre.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(pre).count() == 0)

    // cohort LTV: cumulative revenue nondecreasing within a cohort,
    // active users never exceed the cohort size
    val ltv = ops.TimeSeries.tsCohortLtv(spark, sf0001).collect()
    ltv.groupBy(_.getAs[java.sql.Date]("cohort")).foreach { case (_, rows) =>
      val byAge = rows.sortBy(_.getAs[Long]("age_weeks"))
      val cums = byAge.map(_.getAs[Double]("cum_rev"))
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
      byAge.foreach { r =>
        assert(r.getAs[Long]("active_users") <= r.getAs[Long]("cohort_size"))
      }
    }

    // revenue bridge: deltas reconcile, abs shares sum to 1
    val br = ops.TimeSeries.tsRevenueBridge(spark, sf0001).collect()
    br.foreach { r =>
      assert(math.abs(r.getAs[Double]("rev_1998") - r.getAs[Double]("rev_1997") -
        r.getAs[Double]("delta")) < 0.02)
    }
    assert(math.abs(br.map(r => math.abs(r.getAs[Double]("share_of_abs_delta"))).sum
      - 1.0) < 1e-3)

    // Kaplan-Meier: at-risk counts strictly account for prior
    // events+censors, hazards in [0,1], log-survival nonincreasing
    val km = ops.TimeSeries.tsSurvivalKm(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("t"))
    val total = km.map(r => r.getAs[Long]("d") + r.getAs[Long]("c")).sum
    assert(km.head.getAs[Long]("n_risk") == total)
    km.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_risk") ==
          a.getAs[Long]("n_risk") - a.getAs[Long]("d") - a.getAs[Long]("c"))
      case _ =>
    }
    km.foreach { r =>
      val h = r.getAs[Double]("hazard")
      assert(h >= 0.0 && h <= 1.0)
    }
    val ls = km.flatMap(r => Option(r.getAs[java.lang.Double]("log_survival")))
      .map(_.doubleValue)
    assert(ls.zip(ls.tail).forall { case (a, b) => b <= a + 1e-12 })
    assert(ls.forall(_ <= 1e-12))
  }

  test("round-13 invariants: PII accounting, excision arithmetic, ordinal census, bipartite mass") {
    // PII profile: type counts sum to the total, censuses bounded
    val prof = ops.Pipelines.pipelinePiiProfile(spark, sf0001).collect()
    assert(prof.nonEmpty)
    prof.foreach { r =>
      val parts = Seq("emails", "phones", "ssns", "ipv4s").map(r.getAs[Long])
      assert(parts.sum == r.getAs[Long]("pii_total"))
      assert(r.getAs[Long]("docs_with_pii") <= r.getAs[Long]("n_docs"))
    }
    // redaction: masks are strictly shorter than what they replace, so
    // chars_delta > 0 exactly when something was detected
    ops.Pipelines.pipelinePiiRedact(spark, sf0001).collect().foreach { r =>
      val hits = Seq("n_email", "n_phone", "n_ssn", "n_ipv4")
        .map(r.getAs[Long]).sum
      val delta = r.getAs[Long]("chars_delta")
      assert(if (hits > 0) delta > 0 else delta == 0,
        s"doc ${r.getAs[Long]("doc_id")}: hits=$hits delta=$delta")
    }
    // excision: after = before − excised, shares bounded, doc census
    ops.Pipelines.pipelineSpanExcisedTokens(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("tokens_after") ==
        r.getAs[Long]("tokens_before") - r.getAs[Long]("tokens_excised"))
      assert(r.getAs[Long]("docs_excised") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("excised_share_q6") <= 1000000L)
    }
    // ordinal census: 6 stable-rank patterns cover n−2 triples, shares
    // sum to 1e6 within floor slack, every −p·ln p term non-negative
    val pe = ops.TimeSeries.tsPermutationEntropy(spark, sf0001).collect()
    assert(pe.map(_.getAs[Long]("n")).sum > 0)
    val shareSum = pe.map(_.getAs[Long]("share_q6")).sum
    assert(shareSum <= 1000000L && shareSum >= 1000000L - pe.length)
    assert(pe.forall(_.getAs[Long]("plogp_q6") >= 0L))
    // ljung-box: Q non-decreasing in lag, |r| ≤ 1
    val lb = ops.TimeSeries.tsLjungBox(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("lag"))
    assert(lb.length == 7)
    assert(lb.forall(r => math.abs(r.getAs[Long]("r_q6")) <= 1000000L))
    assert(lb.map(_.getAs[Long]("lb_q_q4")).sliding(2)
      .forall { case Array(a, b) => b >= a; case _ => true })
    // bipartite degree profile: both sides' degree mass equals the
    // shared edge count
    val dp = ops.GraphOps.graphBipartiteDegreeProfile(spark, sf0001).collect()
    val mass = dp.groupBy(_.getString(0)).view.mapValues(
      _.map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_nodes")).sum).toMap
    assert(mass("customer") == mass("supplier"))
    assert(mass("customer") == Tables.bipartite(spark, sf0001).count())
    // assortativity: a correlation, so |r| ≤ 1
    val as = ops.GraphOps.graphBipartiteAssortativity(spark, sf0001)
      .collect().head
    assert(math.abs(as.getAs[Long]("assortativity_q6")) <= 1000000L)
    // co-supply: co-occurrence bounded by both margins, cosine ≤ 1
    ops.GraphOps.graphCosupplySupplierSim(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("co_orders") <=
        math.min(r.getAs[Long]("n_orders1"), r.getAs[Long]("n_orders2")))
      assert(r.getAs[Long]("cosine_q6") <= 1000000L)
    }
    // mood: 2×2 margins reconstruct the pooled n, χ² non-negative
    val md = ops.Relational.aggMoodMedianTest(spark, sf0001).collect().head
    assert(md.getAs[Long]("chi2_q6") >= 0L)
    // yule: vocab ≤ tokens ≤ Σf², K ≥ 0
    ops.TextSim.textYuleK(spark, sf0001).collect().foreach { r =>
      assert(r.getAs[Long]("vocab") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("s2") >= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("yule_k_q4") >= 0L)
    }
    // chunk windows: distinct ≤ total, dup share consistent
    ops.Pipelines.pipelineChunkWindows(spark, sf0001).collect().foreach { r =>
      val (nc, dc) = (r.getAs[Long]("n_chunks"), r.getAs[Long]("distinct_chunks"))
      assert(dc <= nc && dc > 0)
      assert(r.getAs[Long]("dup_chunk_share_q6") == (nc - dc) * 1000000L / nc)
    }
  }
}
