package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.sources.VersionedTable
import java.nio.file.Files

/** The pruning soundness law: for EVERY predicate, `scan` (file-level
  * stats refutation + row filter) returns exactly `read` + the same
  * filter. The three-valued mayMatch logic is where data-skipping
  * implementations historically break (null stats, all-null files,
  * reversed literal comparisons, OR short-circuits) — so the predicate
  * space is generated, not hand-picked. */
class VersionedTableProps extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  // one z-ordered snapshot of documents, shared across all properties
  private lazy val root: String = {
    val r = Files.createTempDirectory("vtprops").toString + "/tbl"
    VersionedTable.create(spark, r,
      Tables(spark, SharedSpark.sf0001, "documents"))
    VersionedTable.cluster(spark, r, Seq("doc_id", "n_chars"), numFiles = 8)
    r
  }

  private val numCol = Gen.oneOf("doc_id", "n_chars")
  private val cmpOp = Gen.oneOf("<", "<=", "=", ">", ">=")

  private val numAtom: Gen[String] = for {
    c <- numCol
    op <- cmpOp
    // integer AND decimal literals against the long columns — the
    // analyzer coerces these, so pruning must too (not crash)
    v <- Gen.oneOf(
      Gen.chooseNum(-10L, 1200L).map(_.toString),
      Gen.chooseNum(-10.0, 1200.0).map(d => f"$d%.2f"))
    flip <- Gen.oneOf(true, false) // literal-on-the-left shapes too
  } yield if (flip) s"$v $op $c" else s"$c $op $v"

  private val strAtom: Gen[String] = for {
    vs <- Gen.nonEmptyListOf(Gen.oneOf("en", "de", "zh", "xx"))
    shape <- Gen.oneOf(0, 1, 2)
  } yield shape match {
    case 0 => s"lang = '${vs.head}'"
    case 1 => s"lang IN (${vs.distinct.map(v => s"'$v'").mkString(", ")})"
    case 2 => "lang IS NOT NULL"
  }

  private val nullAtom: Gen[String] =
    Gen.oneOf("text IS NULL", "text IS NOT NULL", "NOT (text IS NULL)")

  private val atom: Gen[String] = Gen.frequency(
    5 -> numAtom, 3 -> strAtom, 1 -> nullAtom)

  private val predicate: Gen[String] = for {
    a <- atom
    b <- atom
    c <- atom
    shape <- Gen.oneOf(0, 1, 2, 3)
  } yield shape match {
    case 0 => a
    case 1 => s"($a) AND ($b)"
    case 2 => s"($a) OR ($b)"
    case 3 => s"(($a) AND ($b)) OR ($c)"
  }

  test("scan(pred) == read().where(pred) for generated predicates") {
    val full = VersionedTable.read(spark, root)
    // deterministic sample of the predicate space (fixed seed — the
    // suite must be reproducible run to run)
    val preds = Gen.listOfN(60, predicate)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator exhausted"))
    preds.foreach { pred =>
      val (pruned, scanned, total) = VersionedTable.scan(spark, root, pred)
      val expected = full.where(pred).count()
      assert(pruned.count() == expected,
        s"pruning changed the result for: $pred (scanned $scanned/$total)")
    }
  }

  test("type-mixed literals neither crash nor misprune") {
    val full = VersionedTable.read(spark, root)
    Seq("doc_id < 10.5", "n_chars >= 100.0", "10.5 > doc_id", "doc_id = 3.0",
        "doc_id <=> 3", "lang = 'en' AND n_chars > 49.9",
        "doc_id IN (1, 2.5, 3)").foreach { pred =>
      val (pruned, _, _) = VersionedTable.scan(spark, root, pred)
      assert(pruned.count() == full.where(pred).count(), s"for: $pred")
    }
  }

  test("narrow range predicates actually skip files on both z-columns") {
    val (_, s1, t1) = VersionedTable.scan(spark, root, "doc_id < 20")
    val (_, s2, t2) = VersionedTable.scan(spark, root, "n_chars < 60")
    assert(s1 < t1 && s2 < t2)
  }

  // ---- temporal + floating domains (round-4 ADVICE regressions) ----

  // events-derived table: LTZ timestamp, date, NTZ timestamp, and a
  // float column, range-laid-out by time so pruning is observable
  private lazy val troot: String = {
    val r = Files.createTempDirectory("vtprops-t").toString + "/tbl"
    val ev = Tables(spark, SharedSpark.sf0001, "events")
      .select(col("event_id"), col("ts"),
        col("ts").cast("date").as("d"),
        col("ts").cast("timestamp_ntz").as("tntz"),
        col("value"), col("value").cast("float").as("fv"))
      .repartitionByRange(6, col("ts"))
      .sortWithinPartitions("ts")
    VersionedTable.create(spark, r, ev)
    r
  }

  private val tempAtom: Gen[String] = for {
    c <- Gen.oneOf("d", "ts", "tntz")
    op <- cmpOp
    day <- Gen.chooseNum(1, 30)
    lit <- Gen.oneOf(
      f"date'2024-01-$day%02d'",
      f"timestamp'2024-01-$day%02d 11:30:00'",
      f"timestamp_ntz'2024-01-$day%02d 11:30:00'")
    flip <- Gen.oneOf(true, false)
  } yield if (flip) s"$lit $op $c" else s"$c $op $lit"

  private val floatAtom: Gen[String] = for {
    c <- Gen.oneOf("fv", "value")
    op <- cmpOp
    // plain decimals, high-precision decimals (>15 sig digits — the
    // double-rounding trap), and double-typed literals
    v <- Gen.oneOf(
      Gen.chooseNum(-1.0, 1.0).map(d => f"$d%.3f"),
      Gen.chooseNum(-1.0, 1.0).map(d => f"$d%.17f"),
      Gen.chooseNum(-1.0, 1.0).map(d => f"${d}e0"))
  } yield s"$c $op $v"

  private val tfAtom: Gen[String] = Gen.frequency(3 -> tempAtom, 2 -> floatAtom)

  private val tfPredicate: Gen[String] = for {
    a <- tfAtom
    b <- tfAtom
    shape <- Gen.oneOf(0, 0, 1, 2)
  } yield shape match {
    case 0 => a
    case 1 => s"($a) AND ($b)"
    case 2 => s"($a) OR ($b)"
  }

  test("temporal/floating predicates: scan == read.where (generated)") {
    val full = VersionedTable.read(spark, troot)
    val preds = Gen.listOfN(60, tfPredicate)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(fail("generator exhausted"))
    preds.foreach { pred =>
      val (pruned, scanned, total) = VersionedTable.scan(spark, troot, pred)
      val expected = full.where(pred).count()
      assert(pruned.count() == expected,
        s"pruning changed the result for: $pred (scanned $scanned/$total)")
    }
  }

  test("date col vs timestamp literal: no false refutation, still prunes") {
    val full = VersionedTable.read(spark, troot)
    // the ADVICE repro shape: a timestamp literal BELOW the whole date
    // range must keep every row (pre-fix: epoch-days stats vs
    // epoch-micros literal pruned everything)
    val (all, _, _) = VersionedTable.scan(spark, troot,
      "d > timestamp'2020-01-01 00:00:00'")
    assert(all.count() == full.count())
    // and a mid-range timestamp literal must both prune files AND
    // agree with the row-level filter
    val pred = "ts < timestamp'2024-01-06 00:00:00'"
    val (pruned, scanned, total) = VersionedTable.scan(spark, troot, pred)
    assert(pruned.count() == full.where(pred).count())
    assert(scanned < total, s"expected file skipping ($scanned/$total)")
    // date literal against the LTZ timestamp column: same law
    val p2 = "ts >= date'2024-01-20'"
    val (pr2, _, _) = VersionedTable.scan(spark, troot, p2)
    assert(pr2.count() == full.where(p2).count())
    // NTZ column with NTZ/date literals prunes; NTZ vs LTZ stays
    // conservative but correct
    Seq("tntz < timestamp_ntz'2024-01-10 00:00:00'",
        "tntz >= date'2024-01-10'",
        "tntz < timestamp'2024-01-10 00:00:00'").foreach { p =>
      val (pr, _, _) = VersionedTable.scan(spark, troot, p)
      assert(pr.count() == full.where(p).count(), s"for: $p")
    }
  }

  test("deleteWhere honors temporal straddle predicates") {
    val r = Files.createTempDirectory("vtdel-t").toString + "/tbl"
    import spark.implicits._
    VersionedTable.create(spark, r,
      Seq(java.sql.Date.valueOf("2024-03-01"), java.sql.Date.valueOf("2024-03-09"))
        .toDF("d"))
    // pre-fix this deleted nothing (rewritten=0: days-vs-micros stats
    // comparison refuted the file)
    val (_, rewritten, _) = VersionedTable.deleteWhere(spark, r,
      "d > timestamp'2024-03-05 00:00:00'")
    assert(rewritten == 1)
    assert(VersionedTable.read(spark, r).collect().map(_.getDate(0).toString)
      .toSeq == Seq("2024-03-01"))
  }

  test("restore commits an old snapshot as a new version") {
    val r = Files.createTempDirectory("vtrestore").toString + "/tbl"
    import spark.implicits._
    VersionedTable.create(spark, r, Seq((1L, "a")).toDF("id", "v"))
    VersionedTable.overwrite(spark, r, Seq((2L, "b")).toDF("id", "v"))
    val v = VersionedTable.restore(spark, r, 1L)
    assert(v == 3L)
    assert(VersionedTable.read(spark, r).collect().map(_.getLong(0)).toSeq == Seq(1L))
    // history keeps all three ops
    assert(VersionedTable.history(spark, r).orderBy("version")
      .collect().map(_.getString(1)).toSeq == Seq("create", "overwrite", "restore"))
  }
}
