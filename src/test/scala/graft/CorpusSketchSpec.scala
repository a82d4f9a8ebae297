package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.CorpusSketch

class CorpusSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mergeSketches is the bottom-k semilattice join, incl. one-sided sources") {
    val s = spark
    import s.implicits._
    val k = 4
    val a = Seq(("s1", Seq(1L, 3L, 5L, 7L)), ("only_a", Seq(2L, 4L)))
      .toDF("source", "sketch")
    val b = Seq(("s1", Seq(2L, 3L, 6L, 9L)), ("only_b", Seq(8L)))
      .toDF("source", "sketch")
    val got = CorpusSketch.mergeSketches(a, b, k).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    // union {1,2,3,5,6,7,9} → bottom-4; one-sided sources pass through
    assert(got == Map(
      "s1" -> Seq(1L, 2L, 3L, 5L),
      "only_a" -> Seq(2L, 4L),
      "only_b" -> Seq(8L)))
  }

  test("BottomK reduce/merge equal sorted-distinct-take-k, any split") {
    val rnd = new Random(7)
    val k = 16
    val agg = new CorpusSketch.BottomK(k)
    val values = Array.fill(500)(rnd.nextLong() % 100) // dense → duplicates
    val expect = values.distinct.sorted.take(k)

    // reduce-only, in arrival order
    val viaReduce = values.foldLeft(agg.zero)(agg.reduce)
    assert(viaReduce.toSeq == expect.toSeq)

    // arbitrary partition splits, merged in shuffled order
    (1 to 10).foreach { _ =>
      val parts = values.grouped(1 + rnd.nextInt(80)).toSeq
      val bufs = rnd.shuffle(parts.map(_.foldLeft(agg.zero)(agg.reduce)))
      val merged = bufs.foldLeft(agg.zero)(agg.merge)
      assert(merged.toSeq == expect.toSeq)
    }
  }

  test("KMV estimate tracks exact Jaccard on planted-overlap sources") {
    val sq = spark
    import sq.implicits._
    val k = 512
    // two sources, 2000 grams each, 500 shared → J = 500/3500 ≈ 0.1429
    val shared = (0 until 500).map(i => s"shared gram $i")
    val aOnly = (0 until 1500).map(i => s"alpha gram $i")
    val bOnly = (0 until 1500).map(i => s"beta gram $i")
    val rows =
      (shared ++ aOnly).map(("srcA", _)) ++ (shared ++ bOnly).map(("srcB", _))
    val grams = rows.toDF("source", "g")
    val bk = udaf(new CorpusSketch.BottomK(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val sketches = grams.repartition(8)
      .select(col("source"), xxhash64(col("g")).as("h"))
      .groupBy("source").agg(bk(col("h")).as("sketch"))
    val est = CorpusSketch.pairEstimates(sketches, k)
      .select("est_jaccard").head().getDouble(0)
    val exact = 500.0 / 3500.0
    val band = 4.0 * math.sqrt(exact * (1 - exact) / k)
    assert(math.abs(est - exact) <= band,
      s"est $est vs exact $exact outside 4-sigma $band")
  }

  test("containment detects a small dump inside a big mix (Jaccard can't)") {
    val sq = spark
    import sq.implicits._
    val k = 512
    // B (300 grams) fully inside A (6000 grams): J = 0.05, C(B⊆A) = 1
    val aGrams = (0 until 6000).map(i => s"mix gram $i")
    val bGrams = (0 until 300).map(i => s"mix gram $i")
    val grams = (aGrams.map(("mixA", _)) ++ bGrams.map(("dumpB", _)))
      .toDF("source", "g")
    val bk = udaf(new CorpusSketch.BottomK(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val sketches = grams.repartition(8)
      .select(col("source"), xxhash64(col("g")).as("h"))
      .groupBy("source").agg(bk(col("h")).as("sketch"))
    val row = CorpusSketch.pairEstimates(sketches, k)
      .select("sa", "est_jaccard", "est_cont_a_in_b", "est_cont_b_in_a")
      .head()
    // source order is lexicographic: sa = dumpB, sb = mixA
    assert(row.getString(0) == "dumpB")
    val (estJ, contDumpInMix) = (row.getDouble(1), row.getDouble(2))
    assert(contDumpInMix == 1.0,
      s"fully-contained dump should estimate containment 1.0, got $contDumpInMix")
    assert(math.abs(estJ - 0.05) <= 4.0 * math.sqrt(0.05 * 0.95 / k))
  }

  test("sketch of <k universe is exhaustive, estimate exact") {
    val sq = spark
    import sq.implicits._
    val grams = ((0 until 40).map(i => ("x", s"g$i")) ++
      (20 until 60).map(i => ("y", s"g$i"))).toDF("source", "g")
    val bk = udaf(new CorpusSketch.BottomK(512),
      org.apache.spark.sql.Encoders.scalaLong)
    val sketches = grams
      .select(col("source"), xxhash64(col("g")).as("h"))
      .groupBy("source").agg(bk(col("h")).as("sketch"))
    val est = CorpusSketch.pairEstimates(sketches, 512)
      .select("est_jaccard").head().getDouble(0)
    // below k the sketch IS the set: 20 shared / 60 union exactly
    assert(math.abs(est - 20.0 / 60.0) < 1e-9)
  }

  test("corpus-overlap gate: all band margins positive, headroom printed") {
    // the diagnosability contract (round-9 verdict item 4): a future
    // testdata regen that erodes a 4σ band fails HERE as a named
    // margin, not as an opaque gate hash mismatch
    val rows = graft.queries.CurationQueries
      .corpusOverlapFull(spark, TestSpark.Sf)
      .select("sa", "sb", "margin_jaccard", "margin_cont_ab",
        "margin_cont_ba")
      .collect()
    assert(rows.nonEmpty)
    val margins = rows.flatMap(r => Seq(
      (s"${r.getString(0)}/${r.getString(1)} jaccard", r.getDouble(2)),
      (s"${r.getString(0)}/${r.getString(1)} cont_ab", r.getDouble(3)),
      (s"${r.getString(0)}/${r.getString(1)} cont_ba", r.getDouble(4))))
    margins.foreach { case (name, m) =>
      assert(m > 0.0, s"band margin non-positive for $name: $m")
    }
    val (minName, minM) = margins.minBy(_._2)
    info(f"minimum band margin: $minM%.4f ($minName)")
  }
}
