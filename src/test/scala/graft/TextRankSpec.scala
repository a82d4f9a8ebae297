package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextRank

class TextRankSpec extends AnyFunSuite {

  test("hub token outranks spokes; ties order by token") {
    // x is adjacent to a, b, c — the graph's hub
    val got = TextRank.keywordsOf(Seq("x", "a", "x", "b", "x", "c"),
      k = 4, iters = 4)
    assert(got.head._1 == "x", s"hub should rank first: $got")
    assert(got.map(_._3) == Seq(1, 2, 3, 4))
    // two-token doc is symmetric: equal scores, rank by token ASC
    val tie = TextRank.keywordsOf(Seq("q", "p"), k = 2, iters = 4)
    assert(tie.map(_._1) == Seq("p", "q"))
    assert(tie(0)._2 == tie(1)._2)
  }

  test("isolated tokens settle at 1 - d; empty docs emit nothing") {
    assert(TextRank.keywordsOf(Seq("solo"), k = 3, iters = 4) ==
      Seq(("solo", 0.15, 1)))
    // repeated single token: self-loops are dropped, still isolated
    assert(TextRank.keywordsOf(Seq("solo", "solo"), k = 3, iters = 4) ==
      Seq(("solo", 0.15, 1)))
    assert(TextRank.keywordsOf(Seq.empty, k = 3, iters = 4).isEmpty)
  }

  test("summary: the chunk overlapping every other chunk ranks first") {
    // 3 chunks of 4: chunk 0 shares a token with BOTH others; chunks
    // 1 and 2 share nothing with each other — 0 is the graph's hub
    val toks = Seq("a", "b", "c", "d", // chunk 0
      "a", "e", "f", "g", // chunk 1: overlaps 0 via a
      "d", "h", "i", "j") // chunk 2: overlaps 0 via d
    val got = TextRank.summarizeOf(toks, chunkSize = 4, k = 3, iters = 4)
    assert(got.head._1 == 0, s"hub chunk should rank first: $got")
    assert(got.head._2 == "a b c d")
    assert(got.map(_._4) == Seq(1, 2, 3))
    // chunks 1 and 2 are symmetric: equal scores, tie to earlier idx
    assert(got(1)._3 == got(2)._3 && got(1)._1 == 1)
  }

  test("summary: disjoint chunks are isolated (1 - d); short docs emit their one chunk") {
    val disjoint = TextRank.summarizeOf(
      Seq("a", "b", "c", "d", "e", "f", "g", "h"), chunkSize = 4,
      k = 2, iters = 4)
    assert(disjoint.forall(_._3 == 0.15))
    val short = TextRank.summarizeOf(Seq("x", "y"), chunkSize = 8,
      k = 2, iters = 4)
    assert(short == Seq((0, "x y", 0.15, 1)))
    assert(TextRank.summarizeOf(Seq.empty, 8, 2, 4).isEmpty)
  }

  test("scores are invariant to token-order reversal of a symmetric chain") {
    // an undirected graph: reversing the document flips no edge
    val fwd = TextRank.keywordsOf(Seq("a", "b", "c", "d"), k = 4, iters = 4)
    val rev = TextRank.keywordsOf(Seq("d", "c", "b", "a"), k = 4, iters = 4)
    assert(fwd == rev)
    // endpoints (degree 1) score below the interior (degree 2)
    val byTok = fwd.map(kw => kw._1 -> kw._2).toMap
    assert(byTok("b") > byTok("a") && byTok("c") > byTok("d"))
  }
}
