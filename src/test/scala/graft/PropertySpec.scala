package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.aggregates.{Evidence, EvidenceMerge}
import graft.expressions.{Blake2s, CanonicalUrl}
import graft.schema.OutboxEntry
import graft.state.OutboxRetry

/** Property tests over the algebraic invariants the engine's
  * correctness arguments rest on (SURVEY §7.4): merge commutativity /
  * associativity, canonicalization idempotence, retry monotonicity.
  * Deterministic: generators are driven from fixed seeds.
  */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val genRef: Gen[Map[String, String]] = for {
    keys <- Gen.someOf(Seq("tweet_id", "url", "tx", "chain", "pool",
      "endpoint", "address", "k1", "k2"))
    vals <- Gen.listOfN(keys.size, Gen.alphaNumStr.map(_.take(12)))
  } yield keys.zip(vals).toMap

  private val genEvidence: Gen[Evidence] = for {
    source <- Gen.oneOf("x", "twitter", "dex", "goplus", "web", "other")
    ts <- Gen.chooseNum(1L, 1000000L)
    ref <- genRef
    summary <- Gen.alphaNumStr.map(_.take(30))
    weight <- Gen.chooseNum(0.0, 1.0)
  } yield Evidence(source, ts, ref, summary, weight)

  test("evidence merge is shuffle-invariant for arbitrary inputs") {
    val agg = EvidenceMerge.aggregator
    def run(xs: Seq[Evidence]) = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    samples(Gen.listOfN(12, genEvidence), 50).zipWithIndex.foreach {
      case (xs, i) =>
        val base = run(xs)
        val shuffled = new scala.util.Random(i).shuffle(xs)
        assert(run(shuffled) == base, s"sample $i order-dependent")
    }
  }

  test("evidence merge: split-merge equals single pass at any split point") {
    val agg = EvidenceMerge.aggregator
    samples(Gen.listOfN(10, genEvidence), 30).foreach { xs =>
      val whole = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      (0 to xs.size by 3).foreach { cut =>
        val (l, r) = xs.splitAt(cut)
        val merged = agg.merge(
          l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
        assert(agg.finish(merged) == whole, s"split at $cut differs")
      }
    }
  }

  test("A1 evidence cap: grouping-invariant, bounded, earliest-ts keeps") {
    import graft.state.StatefulOps
    val K = 8
    // unique dedupKeys (unique tweet_ids) — the regime the invariance
    // guarantee covers (see upsertEvent scaladoc for the evicted-key
    // re-arrival approximation)
    def mkEv(i: Int, ts: Long) =
      (Evidence("x", ts, Map("tweet_id" -> s"t$i"), s"s$i", 0.5), 0.1 * (i % 7))
    (0 until 20).foreach { trial =>
      val rnd = new scala.util.Random(1000 + trial)
      val items = (0 until 30).map(i => mkEv(i, rnd.nextInt(100000).toLong))
      // apply in several random batch groupings
      def applyGrouped(xs: Seq[(Evidence, Double)], seed: Int) = {
        val shuffled = new scala.util.Random(seed).shuffle(xs)
        val cuts = Iterator.iterate(0)(_ + 1 + new scala.util.Random(seed * 7).nextInt(9))
          .takeWhile(_ < xs.size).toSeq :+ xs.size
        val batches = cuts.sliding(2).map { case Seq(a, b) => shuffled.slice(a, b) }
          .filter(_.nonEmpty).toSeq
        batches.foldLeft(Option.empty[graft.schema.EventRow]) { (st, b) =>
          Some(StatefulOps.upsertEvent("k", "social", b, st, maxEvidence = K))
        }.get
      }
      val a = applyGrouped(items, 1)
      val b = applyGrouped(items, 2)
      def sig(r: graft.schema.EventRow) =
        (r.startUs, r.lastUs, r.evidenceCount, r.evidenceOverflow,
          r.evidence.map(e => (e.ts, e.ref("tweet_id"))))
      assert(sig(a) == sig(b), s"trial $trial grouping-dependent")
      // bounded + exact logical count + correct overflow
      assert(a.evidence.size <= K)
      assert(a.evidenceCount == 30)
      assert(a.evidenceOverflow == 30 - a.evidence.size)
      // kept set == the K smallest under (ts, dedupKey)
      val expect = items.map(_._1)
        .sortBy(e => (e.ts, EvidenceMerge.dedupKey(e))).take(K)
        .map(e => e.ref("tweet_id")).toSet
      assert(a.evidence.map(_.ref("tweet_id")).toSet == expect)
    }
  }

  test("canonical url is idempotent") {
    val genUrl = for {
      scheme <- Gen.oneOf("", "http://", "https://", "HTTP://")
      host <- Gen.oneOf("Example.COM", "a-b.example.org", "münchen.de", "x.io")
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/p/q", "/x%20y")
      query <- Gen.oneOf("", "?b=2&a=1", "?utm_s=1&z=9&ref=x", "?only_utm=&utm_a=1")
      frag <- Gen.oneOf("", "#f")
    } yield s"$scheme$host$port$path$query$frag"
    samples(genUrl, 200).foreach { u =>
      val once = CanonicalUrl.canonicalize(u)
      if (once != null) {
        assert(CanonicalUrl.canonicalize(once) == once, s"not idempotent: $u -> $once")
      }
    }
  }

  test("blake2s handles all block-boundary lengths and key sizes") {
    val lengths = Seq(0, 1, 54, 55, 56, 63, 64, 65, 127, 128, 129, 1000)
    val digests = lengths.map { n =>
      Blake2s.toHex(Blake2s.digest(Array.fill(n)('a'.toByte), Array.empty, 32))
    }
    assert(digests.distinct.size == digests.size, "length collision")
    (0 to 32).foreach { kn =>
      val d = Blake2s.digest("msg".getBytes, Array.fill(kn)(7.toByte), 20)
      assert(d.length == 20)
    }
    intercept[IllegalArgumentException](
      Blake2s.digest("x".getBytes, Array.fill(33)(1.toByte), 32))
    intercept[IllegalArgumentException](
      Blake2s.digest("x".getBytes, Array.empty, 0))
  }

  test("outbox retry: attempts bounded, backoff monotone then capped, done absorbs") {
    samples(Gen.chooseNum(0L, 100000L), 20).foreach { start =>
      var e = OutboxEntry(1L, "k", "{}", "pending", 0, 0L, "", start, start)
      var now = math.max(start, e.nextTryUs)
      var prevBackoff = 0L
      while (e.status != "dlq") {
        val before = e.attempt
        e = OutboxRetry.step(e, success = false, now, "err")
        assert(e.attempt == before + 1)
        assert(e.attempt <= OutboxRetry.MaxAttempts)
        if (e.status == "retry") {
          val backoff = e.nextTryUs - now
          assert(backoff >= prevBackoff || backoff == 600L * 1000000L)
          assert(backoff <= 600L * 1000000L)
          prevBackoff = math.min(backoff, 600L * 1000000L)
        }
        now = math.max(e.nextTryUs, now + 1)
      }
      assert(e.attempt == OutboxRetry.MaxAttempts)
      // done absorbs further steps
      val done = e.copy(status = "done")
      assert(OutboxRetry.step(done, success = false, now + 10) == done)
    }
  }

  test("pii scrub is idempotent and leaves no matchable pii behind") {
    // Same engine Spark's regexp_replace uses (java.util.regex), same
    // pattern data — the Column form is a fold of these replaceAll's.
    def scrub(s: String): String =
      graft.text.Pii.Rules.foldLeft(s) { case (t, (p, r)) => t.replaceAll(p, r) }
    val genPiece: Gen[String] = Gen.oneOf(
      Gen.alphaNumStr.map(_.take(10)),
      Gen.chooseNum(0, 999999).map(n => s"user$n@host$n.example.org"),
      Gen.chooseNum(0, 9999).map(n => f"+1-415-555-$n%04d"),
      Gen.chooseNum(0, 255).map(n => s"10.$n.$n.$n"),
      Gen.chooseNum(0, 15).map(n => "0x" + (n.toHexString * 40).take(40)))
    val genText: Gen[String] =
      Gen.listOfN(8, genPiece).map(_.mkString(" "))
    samples(genText, 300).foreach { s =>
      val once = scrub(s)
      assert(scrub(once) == once, s"not idempotent on: $s")
      // with the type tokens cut out, nothing PII-shaped may remain
      val residue = Seq("<EMAIL>", "<PHONE>", "<IP>", "<ADDR>")
        .foldLeft(once)(_.replace(_, " "))
      graft.text.Pii.Rules.foreach { case (p, _) =>
        assert(p.r.findFirstIn(residue).isEmpty,
          s"residual $p match in: $residue")
      }
    }
  }

  test("Parity.roundHalfUp stays within half an ulp-of-digit of the input") {
    val p = math.pow(10, 6)
    samples(Gen.chooseNum(-1000.0, 1000.0), 500).foreach { x =>
      val r = math.floor(x * p + 0.5) / p
      assert(math.abs(r - x) <= 0.5 / p + 1e-9, s"x=$x r=$r")
    }
  }

  test("mojibake fix is idempotent and leaves zero countable sequences") {
    // adversarial generator: raw pattern fragments, their first/second
    // halves, and replacement outputs interleaved — the shapes most
    // likely to form NEW sequences across a replace boundary
    val pieces = graft.text.Mojibake.Fixes.flatMap { case (bad, good) =>
      Seq(bad, bad.take(1), bad.drop(1), good) } ++ Seq("Ã", "â€", "x", " ")
    def fixS(s: String): String =
      graft.text.Mojibake.Fixes.foldLeft(s) { case (t, (b, g)) =>
        t.replace(b, g) }
    def countS(s: String): Long =
      graft.text.Mojibake.Fixes.map { case (b, _) =>
        ((s.length - s.replace(b, "").length) / b.length).toLong }.sum
    samples(Gen.listOfN(12, Gen.oneOf(pieces)).map(_.mkString), 400)
      .foreach { s =>
        val once = fixS(s)
        assert(fixS(once) == once, s"not idempotent on: $s")
        assert(countS(once) == 0L, s"residual sequences in: $once")
      }
  }

  test("splitByGroup: deterministic cut matches the md5 reference; fractions partition") {
    val s = TestSpark.spark
    import s.implicits._
    val fracs = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val ids = samples(Gen.chooseNum(0L, 1000000L), 300).distinct
    val got = graft.operators.Sampling.splitByGroup(
        ids.toDF("cluster_id"), "cluster_id", fracs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // reference: first 8 md5 hex chars of "<id>|split" as unsigned int
    def ref(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id|split".getBytes("UTF-8"))
      val u = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (u < math.floor(0.8 * 4294967296.0).toLong) "train"
      else if (u < math.floor(0.9 * 4294967296.0).toLong) "val"
      else "test"
    }
    ids.foreach(id => assert(got(id) == ref(id), s"id $id"))
  }

  test("shardAppend == union assignment for random splits, budgets and bucket widths") {
    val s = TestSpark.spark
    import s.implicits._
    import graft.operators.Sampling
    for (trial <- 0 until 6) {
      val rnd = new scala.util.Random(100 + trial)
      val n = 80 + rnd.nextInt(220)
      val rows = (0L until n.toLong).map(i => (i, 1L + rnd.nextInt(60).toLong))
      val split = 1 + rnd.nextInt(n - 1)
      val budget = 40L + rnd.nextInt(300)
      val width = 1L + rnd.nextInt(50)
      val all = rows.toDF("doc_id", "n_tokens")
      val manifest = Sampling.shardManifest(
        Sampling.shardByTokens(rows.take(split).toDF("doc_id", "n_tokens"),
          "doc_id", "n_tokens", budget, width), "doc_id", "n_tokens")
      val got = Sampling.shardAppend(
          rows.drop(split).toDF("doc_id", "n_tokens").repartition(5),
          "doc_id", "n_tokens", budget, width, manifest)
        .select("doc_id", "shard_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = Sampling.shardByTokens(all, "doc_id", "n_tokens",
          budget, width)
        .filter(col("doc_id") >= split.toLong)
        .select("doc_id", "shard_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want,
        s"trial=$trial n=$n split=$split budget=$budget width=$width")
    }
  }

  test("epochShuffle: every seed is a bijection onto 0..n-1 for random corpora") {
    val s = TestSpark.spark
    import s.implicits._
    import graft.operators.Sampling
    for (trial <- 0 until 4) {
      val rnd = new scala.util.Random(300 + trial)
      // sparse, non-dense ids — the permutation contract must not
      // assume contiguity
      val ids = (0 until 150).map(_ => rnd.nextLong().abs % 1000000L)
        .distinct.map(i => Tuple1(i))
      val df = ids.toDF("doc_id").repartition(1 + trial)
      val pos = Sampling.epochShuffle(df, "doc_id", seed = trial.toLong)
        .select("pos").collect().map(_.getLong(0)).sorted
      assert(pos.toSeq == (0L until ids.size.toLong), s"trial=$trial")
    }
  }

  test("domainCap: per-domain counts = min(k, size) and salts never change the result") {
    val s = TestSpark.spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i =>
      (i.toLong, s"d${rnd.nextInt(5)}")) // skewed random domains
    val df = rows.toDF("doc_id", "dom")
    val sizes = rows.groupBy(_._2).map { case (d, xs) => d -> xs.size }
    def run(salts: Int) = graft.operators.Sampling
      .domainCap(df, "doc_id", "dom", k = 17, salts = salts)
      .select("doc_id", "dom", "cap_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val base = run(1)
    Seq(2, 7, 32).foreach(sl => assert(run(sl) == base, s"salts=$sl"))
    base.groupBy(_._2).foreach { case (d, kept) =>
      assert(kept.size == math.min(17, sizes(d)), s"domain $d")
    }
  }
}
