package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Sampling

/** Deterministic sampling / splitting / profiling operators. */
class SamplingSpec extends AnyFunSuite {
  import SharedSpark._

  lazy val docs = Tables(spark, sf0001, "documents")

  test("deterministicSample is stable and close to the target fraction") {
    val a = Sampling.deterministicSample(docs, "doc_id", 0.3)
    val b = Sampling.deterministicSample(docs, "doc_id", 0.3)
    assert(a.collect().toSeq == b.collect().toSeq) // identical, not just same size
    val frac = a.count().toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"got $frac")
    // stable under repartitioning (rand()-based sampling is not)
    assert(Sampling.deterministicSample(docs.repartition(13), "doc_id", 0.3).count() == a.count())
  }

  test("stratifiedSample balances per-stratum fractions") {
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val langs = perLang.keys.toSeq.sorted
    val fr = Map(langs.head -> 1.0, langs.last -> 0.25)
    val sampled = Sampling.stratifiedSample(docs, "lang", "doc_id", fr)
    val got = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet.subsetOf(fr.keySet)) // unlisted strata dropped
    assert(got(langs.head) == perLang(langs.head)) // fraction 1.0 keeps all
    val tailFrac = got.getOrElse(langs.last, 0L).toDouble / perLang(langs.last)
    assert(tailFrac > 0.1 && tailFrac < 0.45, s"got $tailFrac")
  }

  test("hashSplit partitions every row exactly once, deterministically") {
    val (train, test) = Sampling.hashSplit(docs, "doc_id", 0.2)
    assert(train.count() + test.count() == docs.count())
    assert(train.join(test, Seq("doc_id"), "inner").count() == 0)
    val frac = test.count().toDouble / docs.count()
    assert(frac > 0.1 && frac < 0.3, s"got $frac")
    val (_, test2) = Sampling.hashSplit(docs, "doc_id", 0.2)
    assert(test.select("doc_id").collect().toSeq == test2.select("doc_id").collect().toSeq)
  }

  test("null keys are split deterministically, never dropped") {
    val s = spark
    import s.implicits._
    val df = Seq(Option(1L), Option(2L), None, None).toDF("k")
    val (train, test) = Sampling.hashSplit(df, "k", 0.5)
    assert(train.count() + test.count() == 4) // nulls land on exactly one side
    assert(Sampling.deterministicSample(df, "k", 1.0).count() == 4)
  }

  test("profile handles an empty frame and stratifiedSample validates fractions") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("id", "v")
    val p = Sampling.profile(empty).collect().map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(2) == 0 && p("id").getLong(3) == 0)
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(docs, "lang", "doc_id", Map("en" -> 1.5))
    }
  }

  test("profile reports nulls/distinct/min/max per column in one pass") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("a"), 1.5), (2L, None, -0.5), (3L, Some("c"), 9.0))
      .toDF("id", "v", "x")
    val p = Sampling.profile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p("id").getLong(2) == 3 && p("id").getLong(3) == 0)
    assert(p("v").getLong(3) == 1) // one null
    assert(p("x").getString(5) == "-0.5" && p("x").getString(6) == "9.0")
    assert(p("id").getLong(4) == 3) // approx distinct exact at this size
  }
}
