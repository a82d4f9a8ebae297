package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.aggregates.{Evidence, EvidenceMerge}

class EvidenceMergeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val items = Seq(
    Evidence("x", 2000L, Map("tweet_id" -> "42", "url" -> ""), "short", 0.5),
    Evidence("x", 1000L, Map("tweet_id" -> "42", "url" -> "https://x.com/a/status/42"),
      "a longer summary", 0.9),
    Evidence("x", 1500L, Map("url" -> "https://x.com/a/status/42"), "mid", 0.7),
    Evidence("dex", 3000L, Map("tx" -> "0xdead"), "dex evt", 1.0),
    Evidence("dex", 3100L, Map("tx" -> "0xdead"), "dex evt longer", 0.2),
    Evidence("goplus", 4000L, Map("endpoint" -> "sec", "chain" -> "1",
      "address" -> "0xabc"), "g", 0.1),
    Evidence("other", 5000L, Map("k" -> "v"), "o", 0.3))

  private def runAgg(xs: Seq[Evidence]): Seq[Evidence] = {
    val agg = EvidenceMerge.aggregator
    xs.foldLeft(agg.zero)((b, e) => agg.reduce(b, e)) match {
      case buf => agg.finish(buf)
    }
  }

  test("dedup keys unify tweet_id and /status/ url forms") {
    val ks = items.take(3).map(EvidenceMerge.dedupKey)
    assert(ks.distinct.size == 1, s"expected one key, got $ks")
  }

  test("merge keeps earliest ts, max weight, longest summary, unioned refs") {
    val merged = runAgg(items).find(_.source == "x").get
    assert(merged.ts == 1000L)
    assert(merged.weight == 0.9)
    assert(merged.summary == "a longer summary")
    assert(merged.ref("tweet_id") == "42")
    assert(merged.ref("url") == "https://x.com/a/status/42")
  }

  test("aggregation is order-insensitive (shuffle-safe)") {
    val base = runAgg(items)
    (1 to 10).foreach { seed =>
      val shuffled = new Random(seed).shuffle(items)
      assert(runAgg(shuffled) == base, s"order dependence at seed $seed")
    }
  }

  test("partial-buffer merge equals single-pass reduce") {
    val agg = EvidenceMerge.aggregator
    val (l, r) = items.splitAt(3)
    val bufL = l.foldLeft(agg.zero)(agg.reduce)
    val bufR = r.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(bufL, bufR)) == runAgg(items))
    assert(agg.finish(agg.merge(bufR, bufL)) == runAgg(items))
  }

  test("aggregator works distributed via Dataset.groupByKey") {
    val s = spark
    import s.implicits._
    val withKeys = items.zipWithIndex.map { case (e, i) => (s"evt${i % 2}", e) }
    val ds = s.createDataset(withKeys).repartition(8)
    val out = ds.groupByKey(_._1)
      .mapValues(_._2)
      .agg(EvidenceMerge.aggregator.toColumn.name("evidence"))
      .collect()
    assert(out.length == 2)
    assert(out.map(_._2.size).sum < items.size + 2) // some merging happened
  }
}
