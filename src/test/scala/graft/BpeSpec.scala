package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.BpeTokenizer

/** The committed BPE artifact and its encoder slot (L59). */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("artifact loads and the vocab table IS the encoder on trained words") {
    val (merges, vocab) = BpeTokenizer.loadArtifact()
    assert(merges.size == 25 && vocab.size == 31)
    // the oracle-parity contract: every stored count equals a live
    // encode with the artifact's own merges
    vocab.foreach { case (w, n) =>
      assert(BpeTokenizer.encodeWith(merges, w).length == n,
        s"stored count for '$w' diverges from the live encoder")
    }
  }

  test("encode reconstructs the word and handles OOV deterministically") {
    val (merges, _) = BpeTokenizer.loadArtifact()
    def joined(w: String): String =
      BpeTokenizer.encodeWith(merges, w).mkString.stripSuffix("</w>")
    for (w <- Seq("spark", "customer", "sparkle", "zzz", "a"))
      assert(joined(w) == w, s"'$w' does not reconstruct")
    // frequent words fully merged, rare/OOV words split
    assert(BpeTokenizer.encodeWith(merges, "spark") == Vector("spark</w>"))
    assert(BpeTokenizer.encodeWith(merges, "sparkle").length > 1)
    // determinism across calls
    assert(BpeTokenizer.encodeWith(merges, "sparkle") ==
      BpeTokenizer.encodeWith(merges, "sparkle"))
  }

  test("property: any word reconstructs from its subtokens, with sane bounds") {
    val (merges, _) = BpeTokenizer.loadArtifact()
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val w = (1 to (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val toks = BpeTokenizer.encodeWith(merges, w)
      assert(toks.mkString.stripSuffix("</w>") == w, s"'$w' broke")
      assert(toks.nonEmpty && toks.length <= w.length,
        s"'$w' -> ${toks.length} subtokens")
      assert(toks.last.endsWith("</w>"), s"'$w' lost the end marker")
    }
  }

  test("tokenCounts slot: known sums + OOV tally per document") {
    import spark.implicits._
    val (merges, vocab) = BpeTokenizer.loadArtifact()
    val df = Seq((1L, "spark customer spark"), (2L, "unseenword spark"),
      (3L, "")).toDF("doc_id", "text")
    val got = BpeTokenizer.tokenCounts(spark, df, "doc_id", "text")
      .collect().map(d => d.docId -> d).toMap
    val expected1 = 2 * vocab("spark") + vocab("customer")
    assert(got(1L).nWords == 3 && got(1L).nBpeKnown == expected1 &&
      got(1L).nOov == 0)
    assert(got(2L).nWords == 2 && got(2L).nBpeKnown == vocab("spark") &&
      got(2L).nOov == 1)
    assert(got(3L).nWords == 0 && got(3L).nBpeKnown == 0 && got(3L).nOov == 0)
    assert(merges.nonEmpty)
  }
}
