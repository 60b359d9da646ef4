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
