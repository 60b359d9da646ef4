package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bpe

/** Trained BPE tokenizer: deterministic merges, lossless segmentation,
  * fertility that actually improves with merges, distributed encode. */
class BpeSpec extends AnyFunSuite {
  import SharedSpark._

  private lazy val docs = Tables(spark, sf0001, "documents")
  private lazy val model = Bpe.train(docs, "text", "doc_id", numMerges = 64)

  test("training is deterministic and merges are well-formed") {
    val m2 = Bpe.train(docs, "text", "doc_id", numMerges = 64)
    assert(model.merges == m2.merges)
    assert(model.merges.size == 64)
    // every merge's parts are either single chars(+marker) or products
    // of EARLIER merges — the defining property of a merge table
    val known = scala.collection.mutable.Set.empty[String]
    model.merges.foreach { case (a, b) =>
      def atomic(s: String) = s.length == 1 || (s.endsWith("</w>") && s.length == 5)
      assert(atomic(a) || known.contains(a), s"left part '$a' unknown")
      assert(atomic(b) || known.contains(b), s"right part '$b' unknown")
      known += (a + b)
    }
  }

  test("encoding is lossless: tokens concatenate back to the word") {
    val words = Seq("spark", "window", "customer", "the", "unseenword", "x")
    words.foreach { w =>
      val toks = Bpe.encodeWord(w, model)
      assert(toks.mkString("").replace("</w>", "") == w,
        s"'$w' -> $toks does not round-trip")
      assert(toks.last.endsWith("</w>"), s"'$w' missing end marker")
    }
    assert(Bpe.encodeWord("", model).isEmpty)
  }

  test("more merges strictly help: fertility falls, frequent words become single tokens") {
    val m8 = Bpe.BpeModel(model.merges.take(8))
    val sample = docs.orderBy("doc_id").limit(100)
      .select("text").collect().map(_.getString(0))
    def totalTokens(m: Bpe.BpeModel): Long =
      sample.map(_.split(" ").filter(_.nonEmpty)
        .map(w => Bpe.encodeWord(w, m).length.toLong).sum).sum
    val t8 = totalTokens(m8)
    val t64 = totalTokens(model)
    assert(t64 < t8, s"64 merges ($t64 tokens) not better than 8 ($t8)")
    // the corpus's most frequent word must compress to ONE token
    val top = sample.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).maxBy { case (w, o) => (o.length, w) }._1
    assert(Bpe.encodeWord(top, model).length == 1,
      s"most frequent word '$top' not a single token")
  }

  test("distributed encode matches the driver-side loop and is linear") {
    val enc = Bpe.encode(docs, "text", "doc_id", model)
    assert(enc.count() == docs.count())
    val row = enc.filter(col("doc_id") === 0).collect()(0)
    val text0 = docs.filter(col("doc_id") === 0)
      .select("text").collect()(0).getString(0)
    val expect = text0.split(" ").filter(_.nonEmpty)
      .flatMap(w => Bpe.encodeWord(w, model)).toSeq
    assert(row.getSeq[String](1) == expect)
    assert(row.getLong(2) == expect.length.toLong)
    // sanity: learned-vocab fertility beats character tokenization by a
    // wide margin on this corpus
    val meanFert = enc.agg(avg(col("fertility"))).collect()(0).getDouble(0)
    assert(meanFert < 3.0, s"mean fertility $meanFert suspiciously high")
  }
}
