package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.{BpeTokenizer, UnigramTokenizer}

/** The committed Unigram-LM artifact and its Viterbi encoder (L59b —
  * the BpeSpec pattern for the SentencePiece-style alternative).
  */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("artifact loads and the vocab table IS the encoder on trained words") {
    val (pieces, vocab) = UnigramTokenizer.loadArtifact()
    assert(pieces.nonEmpty && vocab.size == 31)
    vocab.foreach { case (w, n) =>
      assert(UnigramTokenizer.encodeWith(pieces, w).length == n,
        s"stored count for '$w' diverges from the live Viterbi")
    }
    // every trained piece respects the Viterbi window bound
    assert(pieces.keys.forall(_.length <= UnigramTokenizer.MaxPieceLen))
  }

  test("Viterbi picks the max-log-prob segmentation, deterministically, and is total on OOV text") {
    // hand model: "ab" is cheap, "a"+"b" dearer; "abc" absent
    val lp = Map("a" -> -3000000L, "b" -> -3000000L, "ab" -> -4000000L,
      "c" -> -5000000L)
    assert(UnigramTokenizer.encodeWith(lp, "ab") == Vector("ab"))
    assert(UnigramTokenizer.encodeWith(lp, "abc") == Vector("ab", "c"))
    // tie: "a"+"b" = -6M vs a hypothetical equal single piece → the
    // single piece wins (fewer pieces)
    val tie = Map("a" -> -3000000L, "b" -> -3000000L, "ab" -> -6000000L)
    assert(UnigramTokenizer.encodeWith(tie, "ab") == Vector("ab"))
    // unknown characters are charged UnkLp but never break encoding
    val got = UnigramTokenizer.encodeWith(lp, "axb")
    assert(got.mkString == "axb" && got.contains("x"))
    assert(UnigramTokenizer.encodeWith(lp, "") == Vector.empty)
    // determinism across calls
    val (pieces, _) = UnigramTokenizer.loadArtifact()
    assert(UnigramTokenizer.encodeWith(pieces, "streaming") ==
      UnigramTokenizer.encodeWith(pieces, "streaming"))
  }

  test("property: any word reconstructs from its pieces, with sane bounds") {
    val (pieces, _) = UnigramTokenizer.loadArtifact()
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 500) {
      val w = (1 to (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val segs = UnigramTokenizer.encodeWith(pieces, w)
      assert(segs.mkString == w, s"'$w' broke")
      assert(segs.nonEmpty && segs.length <= w.length,
        s"'$w' -> ${segs.length} pieces")
    }
  }

  test("tokenCounts slot mirrors BPE's: known sums + OOV tally; the two tokenizers agree on OOV (shared train vocab)") {
    import spark.implicits._
    val (pieces, vocab) = UnigramTokenizer.loadArtifact()
    val df = Seq((1L, "spark customer spark"), (2L, "unseenword spark"),
      (3L, "")).toDF("doc_id", "text")
    val got = UnigramTokenizer.tokenCounts(spark, df, "doc_id", "text")
      .collect().map(d => d.docId -> d).toMap
    val expected1 = 2 * vocab("spark") + vocab("customer")
    assert(got(1L).nWords == 3 && got(1L).nUniKnown == expected1 &&
      got(1L).nOov == 0)
    assert(got(2L).nWords == 2 && got(2L).nUniKnown == vocab("spark") &&
      got(2L).nOov == 1)
    assert(got(3L).nWords == 0 && got(3L).nUniKnown == 0 && got(3L).nOov == 0)
    // both artifacts are trained on the SAME corpus types: identical
    // vocab key sets, so the fertility comparison's shared-oov rollup
    // is sound
    val (_, bpeVocab) = BpeTokenizer.loadArtifact()
    assert(bpeVocab.keySet == vocab.keySet)
    assert(pieces.nonEmpty)
  }
}
