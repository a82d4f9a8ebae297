package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.similarity.Similarity

class DataOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Sf = TestSpark.Sf

  private lazy val docs = Tables.load(spark, Sf, "documents")
  private lazy val embs = Tables.load(spark, Sf, "embeddings")

  test("minhash LSH finds exactly the exact-jaccard pairs on this corpus") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5,
      numHashes = 16, rowsPerBand = 2)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh == exact)
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("ida", "idb").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("TextTiling: planted topic shift yields exactly the seam gap") {
    import spark.implicits._
    val a = (0 until 20).map(i => s"alpha${i % 5}")
    val b = (0 until 20).map(i => s"beta${i % 5}")
    val one = (0 until 15).map(i => s"solo${i % 4}")
    val corpus = Seq(
      (1L, (a ++ b).mkString(" ")), // blocks A,A,B,B → seam at gap 2
      (2L, one.mkString(" ")), // 2 blocks, 1 gap, no neighbors → none
      (3L, "tiny doc")) // 1 block → no gaps, one segment
      .toDF("doc_id", "text")
    val got = graft.text.TextTiling
      .segments(spark, corpus, "doc_id", "text", blockTokens = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4)))).toMap
    // sims 1.0, 0.0, 1.0 → depths 0, 2e6, 0 → only gap 2 beats the mean
    assert(got(1L) == ((4, 3, "2", 2)))
    assert(got(2L) == ((2, 1, "", 1)))
    assert(got(3L) == ((1, 0, "", 1)))
  }

  test("seam-aware chunking: windows restart at the boundary, tail clamps, no chunk crosses the seam") {
    import spark.implicits._
    val a = (0 until 20).map(i => s"alpha${i % 5}")
    val b = (0 until 20).map(i => s"beta${i % 5}")
    val corpus = Seq((1L, (a ++ b).mkString(" "))).toDF("doc_id", "text")
    val rows = graft.text.TextTiling
      .segmentedChunks(spark, corpus, "doc_id", "text",
        blockTokens = 10, width = 16, stride = 12)
      .orderBy("seg_idx", "chunk_idx").collect()
    // boundary at gap 2 → segments [0,20) and [20,40); each yields
    // windows [st, st+16) and the clamped tail [st+12, st+20)
    assert(rows.map(r => (r.getInt(1), r.getInt(2), r.getInt(3),
      r.getInt(4))).toSeq ==
      Seq((0, 0, 0, 16), (0, 1, 12, 8), (1, 0, 20, 16), (1, 1, 32, 8)))
    // no chunk mixes alpha and beta tokens
    rows.foreach { r =>
      val words = r.getString(5).split(" ").toSet
      assert(words.forall(_.startsWith("alpha")) ||
        words.forall(_.startsWith("beta")), s"seam crossed: $r")
    }
  }

  test("cluster entropy: counts conserve, entropy bounded by ln(lists), fixed-point recompute matches") {
    val rows = Similarity
      .clusterEntropy(embs, "vec_id", "embedding", nlist = 16, iters = 2)
      .collect()
    assert(rows.nonEmpty && rows.length <= 16)
    assert(rows.map(_.getAs[Long]("n")).sum == embs.count())
    val nLists = rows.length
    val entropy = rows.head.getAs[Double]("entropy")
    rows.foreach { r =>
      assert(r.getAs[Double]("entropy") == entropy) // summary repeats
    }
    assert(entropy >= 0.0 && entropy <= math.log(nLists.toDouble) + 1e-6)
    val eff = rows.head.getAs[Double]("eff_lists")
    assert(eff >= 1.0 && eff <= nLists + 1e-6)
    assert(rows.head.getAs[Double]("occ_ratio") >= 1.0)
    // independent fixed-point recompute from the collected counts
    val counts = rows.map(_.getAs[Long]("n"))
    val nt = counts.sum
    val hU = counts.map { n =>
      val p = n.toDouble / nt.toDouble
      val lnU = math.floor(math.log(p) * 1e6 + 0.5).toLong
      math.floor(-p * lnU.toDouble + 0.5).toLong
    }.sum
    assert(entropy == hU.toDouble / 1e6)
    assert(eff == math.floor(math.exp(hU.toDouble / 1e6) * 1e6 + 0.5) / 1e6)
  }

  test("LSH S-curve audit: curve endpoints, sequential-chain values, high-sim capture, bounded output") {
    import spark.implicits._
    // 8 planted pairs (40 words, an end token swapped → one shingle
    // differs → j = 37/39 ≈ 0.949; the pairs also near-dup each
    // other at j ∈ {0.9, 0.949}, all bin 18) + unrelated noise docs
    // that share no shingles with anything
    val baseWords = (0 until 20).flatMap(i =>
      Seq(s"tok${i}a", s"tok${i}b")).toVector
    val nearDups = (0 until 8).flatMap { p =>
      val a = baseWords.updated(0, s"salt$p")
      val b = a.updated(a.size - 1, s"odd$p")
      Seq((p * 2L, a.mkString(" ")), (p * 2L + 1, b.mkString(" ")))
    }
    // 3 pairs sharing exactly one 3-shingle (j = 1/35 → bin 0)
    val lowSim = (0 until 3).flatMap { p =>
      val shared = Seq(s"sh${p}x", s"sh${p}y", s"sh${p}z")
      val x = shared ++ (0 until 17).map(i => s"x$p-$i")
      val y = shared ++ (0 until 17).map(i => s"y$p-$i")
      Seq((200 + p * 2L, x.mkString(" ")), (201 + p * 2L, y.mkString(" ")))
    }
    val noise = (100 until 130).map(i =>
      (i.toLong, (0 until 20).map(j => s"n${i}w$j").mkString(" ")))
    val corpus = (nearDups ++ lowSim ++ noise).toDF("doc_id", "text")
    val rows = Dedup.lshCurveAudit(corpus, "doc_id", "text")
      .orderBy("bin").collect()
    assert(rows.length <= 20)
    val byBin = rows.map(r => r.getLong(0) -> r).toMap
    assert(byBin.contains(0L), s"low-sim pairs missing: ${rows.mkString(", ")}")
    // curve columns: bin 0 lower edge is s=0 → 0; a top bin's upper
    // edge is s=1 → 1; and the chain value at s=0.05 is the
    // hand-folded 1−(1−0.0025)^8
    rows.foreach { r =>
      val lo = r.getAs[Double]("curve_lo"); val hi = r.getAs[Double]("curve_hi")
      assert(lo >= 0.0 && hi <= 1.0 && lo <= hi)
    }
    byBin.get(0L).foreach { r =>
      assert(r.getAs[Double]("curve_lo") == 0.0)
      val s = 0.05; val q = 1.0 - s * s
      val q8 = (1 until 8).foldLeft(q)((a, _) => a * q)
      assert(r.getAs[Double]("curve_hi") ==
        math.floor((1.0 - q8) * 1e6 + 0.5) / 1e6)
    }
    // the planted ~0.9-Jaccard pairs live in high bins where the
    // curve says capture is near-certain: the banding must have
    // surfaced every one of them
    val high = rows.filter(_.getLong(0) >= 16)
    assert(high.map(_.getAs[Long]("n_pairs")).sum >= 8,
      s"planted pairs missing from high bins: ${rows.mkString(", ")}")
    high.foreach { r =>
      assert(r.getAs[Long]("n_cand") == r.getAs[Long]("n_pairs"),
        s"high-sim pair not banded: $r")
      assert(r.getAs[Double]("cand_rate") == 1.0)
    }
  }

  // A cap must exceed the size of the largest LEGITIMATE near-dup
  // clique (a clique of c identical docs gives every shared shingle
  // df = c and every LSH band bucket size = c); what it defends
  // against is corpus-boilerplate that is orders of magnitude hotter.
  // Three guarantees pinned below: correctly-sized caps are no-ops,
  // hot boilerplate is dropped without losing near-dup pairs, and an
  // undersized cap loses ONLY pairs inside over-cap cliques.
  test("caps sized above the corpus max are exact no-ops") {
    val uncapped = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5))
    assert(uncapped.nonEmpty)
    // observed max shingle df on this corpus is 7; max clique is 4
    assert(pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5,
      maxShingleDf = 8)) == uncapped)
    assert(pairSet(Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5,
      numHashes = 16, rowsPerBand = 2, maxBandBucket = 8)) == uncapped)
  }

  test("hot-shingle cap drops global boilerplate without losing near-dups") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val boiler = "terms of service apply to all content here"
    def words(n: Int) = Seq.fill(n)("w" + rnd.nextInt(50000)).mkString(" ")
    // 40 unique docs + 10 near-dup copies, ALL sharing the boilerplate
    // tail (df = 50 for boilerplate shingles, df <= 2 for the rest)
    val base = (0 until 40).map(i => (i.toLong, s"${words(20)} $boiler"))
    val dups = (0 until 10).map { i =>
      val (bid, text) = base(i)
      (100L + bid, text.replaceFirst("\\w+", "changed"))
    }
    val corpus = (base ++ dups).toDF("doc_id", "text")
    val uncapped = pairSet(Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.5))
    val capped = pairSet(Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.5,
      maxShingleDf = 16))
    assert(uncapped.size >= 10)
    assert(capped == uncapped,
      s"cap lost ${(uncapped -- capped).size} / gained ${(capped -- uncapped).size}")
  }

  test("undersized band cap loses pairs ONLY through over-cap buckets") {
    import spark.implicits._
    val exact = pairSet(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5))
    val capped = pairSet(Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5,
      numHashes = 16, rowsPerBand = 2, maxBandBucket = 2))
    assert(capped.subsetOf(exact))
    // mechanism check: every lost pair was lost because EVERY band
    // bucket holding both endpoints exceeded the cap — recompute the
    // banding over the collapsed reps and inspect the shared buckets
    val lost = exact -- capped
    if (lost.nonEmpty) {
      val repOf = docs.select(col("doc_id"), col("text")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSeq
        .groupBy(_._2).values
        .flatMap { g => val rep = g.map(_._1).min; g.map(_._1 -> rep) }
        .toMap
      val reps = docs.groupBy("text").agg(min("doc_id").as("doc_id"))
      val sh = Dedup.withShingles(reps, "doc_id", "text")
        .filter(size(col("sh")) > 0)
      val bandRows = Dedup.minhashSignatures(sh, 16)
        .select(col("doc_id"),
          posexplode(Dedup.bandKeys(col("sig"), 16, 2))
            .as(Seq("band_id", "band_key")))
        .collect().map(r => (r.getLong(0), (r.getInt(1), r.getString(2))))
      val bucketSize = bandRows.groupBy(_._2).view.mapValues(_.size).toMap
      val docBuckets = bandRows.groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap
      lost.foreach { case (a, b) =>
        val shared = docBuckets(repOf(a)) intersect docBuckets(repOf(b))
        assert(shared.nonEmpty,
          s"lost pair ($a,$b) shares no bucket — a banding miss, not the cap")
        assert(shared.forall(bucketSize(_) > 2),
          s"lost pair ($a,$b) had an under-cap shared bucket — wrongly dropped")
      }
    }
  }

  test("exact dedup keeps every doc exactly once across groups") {
    val d = Dedup.exactDuplicates(docs, "doc_id", "text")
    val total = d.agg(sum("n_copies")).head.getLong(0)
    assert(total == docs.count())
  }

  test("incremental dedup: history hits, batch dups, and fresh content") {
    import spark.implicits._
    val history = Seq("old one", "old two").toDF("text")
      .select(md5(col("text")).as("fp"))
    val batch = Seq(
      (1L, "old one"), // in history → drop
      (2L, "fresh"), // first seen → keep
      (3L, "fresh"), // batch dup of 2 → drop
      (4L, "old two"), // in history → drop
      (5L, "also new")) // keep
      .toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(batch, history, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (
        r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))).toMap
    // (in_history, batch_dup, keep)
    assert(got(1L) == ((true, false, false)))
    assert(got(2L) == ((false, false, true)))
    assert(got(3L) == ((false, true, false)))
    assert(got(4L) == ((true, false, false)))
    assert(got(5L) == ((false, false, true)))
  }

  test("bloom incremental dedup matches the exact form bit for bit") {
    val d = docs
    val batch = d.filter(col("doc_id") % 3 === 0)
    val hist = d.filter(col("doc_id") % 3 =!= 0)
      .select(md5(col("text")).as("fp")).distinct()
    val bloom = Dedup.fpBloom(hist, expectedItems = 4096, fpp = 0.03)
    assert(bloom != null)
    val exact = Dedup.incrementalDedup(batch, hist, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))).toMap
    val bloomed = Dedup.incrementalDedupBloom(batch, hist, "doc_id", "text", bloom)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))).toMap
    assert(bloomed == exact)
  }

  test("bloom incremental dedup: empty history and definite-miss probes") {
    import spark.implicits._
    val emptyHist = Seq.empty[String].toDF("fp")
    assert(Dedup.fpBloom(emptyHist, 16) == null)
    val batch = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val got = Dedup.incrementalDedupBloom(batch, emptyHist, "doc_id", "text", null)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getBoolean(4))).toMap
    assert(got == Map(1L -> ((false, true)), 2L -> ((false, false)),
      3L -> ((false, true))))
    // a definite miss never reaches the index: every present fp probes
    // true (no false negatives), absent fps probe overwhelmingly false
    val hist = (0 until 1000).map(i => s"h$i").toDF("text")
      .select(md5(col("text")).as("fp"))
    val bloom = Dedup.fpBloom(hist, 1000, fpp = 0.01)
    val probes = hist.select(Dedup.mightContainFp(bloom, col("fp")).as("p"))
      .collect().map(_.getBoolean(0))
    assert(probes.forall(identity), "bloom false negative")
    val absent = (0 until 1000).map(i => s"x$i").toDF("text")
      .select(md5(col("text")).as("fp"))
      .select(Dedup.mightContainFp(bloom, col("fp")).as("p"))
      .collect().count(_.getBoolean(0))
    assert(absent < 50, s"false-positive rate way over fpp: $absent/1000")
  }

  test("heavy hitters: exact counts at support, sketch forced to decrement") {
    import spark.implicits._
    // zipf-ish skew: item i appears ~ 3000/i times — 600 distinct
    // items against the default k = ⌈1/s⌉+2 = 52 counters, so
    // decrement rounds fire in every partition that sees >52 distinct
    // items; expected output = plain exact computation at 2% support
    val rows = (1 to 600).flatMap(i => Seq.fill(3000 / i)(s"item_$i"))
    val n = rows.size.toLong
    val expect = rows.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * 1000000L >= 20000L * n }.toMap
    assert(expect.nonEmpty && expect.size < 20)
    // partitioning must not change the answer (superset guarantee)
    for (parts <- Seq(3, 16)) {
      val items = spark.sparkContext.parallelize(rows, parts).toDF("item")
      val got = graft.operators.HeavyHitters
        .frequentItems(items, supportPpm = 20000L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect, s"parts=$parts")
    }
  }

  test("frequent phrases count occurrences with multiplicity") {
    import spark.implicits._
    val d = Seq((1L, "a b a b a b"), (2L, "a b c d"), (3L, "x y"))
      .toDF("doc_id", "text")
    // bigrams: "a b"×4, "b a"×2, "b c", "c d", "x y" — N=9
    val got = graft.operators.HeavyHitters
      .frequentPhrases(d, "text", n = 2, supportPpm = 220000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a b" -> 4L, "b a" -> 2L))
  }

  test("simhash near-dup pairs include the jaccard near-dups") {
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 32-bit simhash over a tiny shared vocabulary is a weak signal;
    // the oracle gate proves the implementation exact — this only
    // sanity-checks that it separates planted dups from noise.
    val recall = jac.count(sim.contains).toDouble / jac.size.max(1)
    assert(recall >= 0.7, s"simhash recall $recall over ${jac.size} planted pairs")
  }

  // Planted-near-dup corpus for LSH recall gates: 200 unit-ish gaussian
  // bases (id = i) + a perturbed copy of each (id = 1000 + i,
  // cos(base, dup) ≈ 0.99) + 100 random distractors (id = 5000 + i).
  // Deterministic seed → recall is a fixed number, not a flaky sample.
  private lazy val planted = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(64)(rnd.nextGaussian().toFloat)
    def unit(v: Array[Float]) = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val bases = (0 until 200).map(i => (i.toLong, unit(vec())))
    val dups = bases.map { case (i, b) =>
      val noise = unit(vec())
      (1000L + i, unit(b.zip(noise).map { case (x, e) => x + 0.15f * e }))
    }
    val distractors = (0 until 100).map(i => (5000L + i, unit(vec())))
    (bases ++ dups ++ distractors).toDF("vec_id", "embedding")
  }

  test("multi-probe LSH top-k recall >= 0.9 on planted near-dups") {
    val got = Similarity.lshTopK(planted, "vec_id", "embedding",
      id => id >= 1000 && id < 5000, k = 1, dim = 64, planes = 8, tables = 4)
      .select("qid", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = (0 until 200).count(i => got.get(1000L + i).contains(i.toLong))
    val recall = hits / 200.0
    assert(recall >= 0.9, s"multi-probe LSH top-1 recall was $recall")
  }

  test("IVF top-k recall >= 0.9 on planted near-dups") {
    val got = Similarity.ivfTopK(planted, "vec_id", "embedding",
      id => id >= 1000 && id < 5000, k = 1, nlist = 16, nprobe = 4)
      .select("qid", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = (0 until 200).count(i => got.get(1000L + i).contains(i.toLong))
    val recall = hits / 200.0
    assert(recall >= 0.9, s"IVF top-1 recall was $recall")
  }

  test("incremental IVF: empty batch reduces exactly to ivfTopK; batch near-dups retrieved") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val pred = (id: org.apache.spark.sql.Column) => id >= 1000 && id < 5000
    val full = Similarity.ivfTopK(planted, "vec_id", "embedding",
      pred, k = 3, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val inc = Similarity.ivfTopKIncremental(planted, empty, "vec_id", "embedding",
      pred, k = 3, nlist = 16, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(inc == full)
    // ingest the near-dup queries as the BATCH against a base-only
    // history: centroids frozen on the bases, queries still find their
    // planted partners through the appended lists
    val hist = planted.filter(col("vec_id") < 1000 || col("vec_id") >= 5000)
    val batch = planted.filter(col("vec_id") >= 1000 && col("vec_id") < 5000)
    val got = Similarity.ivfTopKIncremental(hist, batch, "vec_id", "embedding",
      pred, k = 1, nlist = 16, nprobe = 4)
      .select("qid", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val recall = (0 until 200).count(i => got.get(1000L + i).contains(i.toLong)) / 200.0
    assert(recall >= 0.9, s"incremental IVF top-1 recall was $recall")
  }

  test("ivfMaintain: no drift == frozen-quantizer incremental search; drift fires the re-init") {
    val e = Tables.load(spark, TestSpark.Sf, "embeddings")
    val hist = e.filter(col("vec_id") % 10 =!= 0)
    val batch = e.filter(col("vec_id") % 10 === 0)
    val pred = (id: org.apache.spark.sql.Column) => id % 50 === 0
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("qid", "nn_id", "cos_sim", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    // the no-drift identity contract: same centroids, same probe
    // search, row-for-row — ivfMaintain degenerates to
    // ivfTopKIncremental when the trigger does not fire
    val inc = rows(Similarity.ivfTopKIncremental(hist, batch,
      "vec_id", "embedding", pred, k = 5, nlist = 16, nprobe = 4))
    val mnt = Similarity.ivfMaintain(hist, batch,
      "vec_id", "embedding", pred, k = 5, nlist = 16, nprobe = 4)
    assert(mnt.select("retrained").distinct().collect()
      .map(_.getBoolean(0)).toSeq == Seq(false))
    assert(rows(mnt) == inc)
    // a concentrated half-corpus batch fires the 2× trigger
    val driftBatch = e.filter(col("vec_id") % 2 === 0)
      .withColumn("embedding",
        transform(col("embedding"), x => abs(x) + lit(1.0)))
    val fired = Similarity.ivfMaintain(e.filter(col("vec_id") % 2 =!= 0),
        driftBatch, "vec_id", "embedding", pred, k = 5)
      .select("retrained", "occ_ratio_trained", "occ_ratio_after").head()
    assert(fired.getBoolean(0),
      s"drifted batch must fire: r0=${fired.getDouble(1)} r1=${fired.getDouble(2)}")
    assert(fired.getDouble(2) > 2.0 * fired.getDouble(1))
  }

  test("IVF-SQ8 top-k recall >= 0.9 on planted near-dups") {
    val got = Similarity.ivfSq8TopK(planted, "vec_id", "embedding",
      id => id >= 1000 && id < 5000, k = 1, nlist = 16, nprobe = 4)
      .select("qid", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = (0 until 200).count(i => got.get(1000L + i).contains(i.toLong))
    val recall = hits / 200.0
    assert(recall >= 0.9, s"IVF-SQ8 top-1 recall was $recall")
  }

  test("IVF-PQ top-k recall >= 0.9 on planted near-dups") {
    val got = Similarity.ivfPqTopK(planted, "vec_id", "embedding",
      id => id >= 1000 && id < 5000, k = 1, nlist = 16, nprobe = 4,
      m = 8, codesPerSub = 16)
      .select("qid", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = (0 until 200).count(i => got.get(1000L + i).contains(i.toLong))
    val recall = hits / 200.0
    assert(recall >= 0.9, s"IVF-PQ top-1 recall was $recall")
  }

  test("SemDeDup drops planted semantic dups, keeps bases and distractors") {
    val out = Similarity.semDedup(planted, "vec_id", "embedding",
      nlist = 8, iters = 2, tau = 0.9)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(out.size == 500)
    // a dup is pruned when it co-clusters with its base (cos ≈ 0.99);
    // k-means can split a pair across a list boundary, hence recall-
    // style: >= 90 % of planted dups must be dropped
    val dropped = (0 until 200).count(i => !out(1000L + i)._2)
    assert(dropped >= 180, s"only $dropped/200 planted dups pruned")
    // bases hold the lower id of every planted pair and random 64-dim
    // unit vectors stay far below tau, so every base and distractor
    // survives
    (0 until 200).foreach(i => assert(out(i.toLong)._2, s"base $i dropped"))
    (0 until 100).foreach(i =>
      assert(out(5000L + i)._2, s"distractor ${5000 + i} dropped"))
  }

  test("line dedup keeps first global occurrence and reassembles in order") {
    import spark.implicits._
    val pages = Seq(
      (1L, "intro\nboilerplate footer\nbody one"),
      (2L, "boilerplate footer\nbody two"), // footer dup'd → dropped
      (3L, "body one\nintro\nfresh"), // both lines seen in page 1
      (4L, "")).toDF("page_id", "text")
    val got = Dedup.lineDedup(pages, "page_id", "text")
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got(1L) == (3L, 3L, "intro\nboilerplate footer\nbody one"))
    assert(got(2L) == (2L, 1L, "body two"))
    assert(got(3L) == (3L, 1L, "fresh"))
    assert(got(4L) == (0L, 0L, "")) // fully empty page survives
  }

  test("k-means training recovers planted clusters and lifts quantization quality") {
    import spark.implicits._
    // 3 well-separated clusters around orthogonal-ish anchors
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Float]) = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val anchors = Array.fill(3)(unit(Array.fill(64)(rnd.nextGaussian().toFloat)))
    val pts = (0 until 300).map { i =>
      val a = anchors(i % 3)
      val noise = unit(Array.fill(64)(rnd.nextGaussian().toFloat))
      (i.toLong, unit(a.zip(noise).map { case (x, e) => x + 0.2f * e }))
    }
    val df = pts.toDF("vec_id", "embedding")
    val trained = Similarity.ivfTrainAssignments(df, "vec_id", "embedding",
      nlist = 3, iters = 3).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(3))).toMap
    // assignments form exactly the planted partition (i % 3)
    val byPlanted = trained.groupBy { case (id, _) => id % 3 }
      .map { case (g, m) => g -> m.values.map(_._1).toSet }
    assert(byPlanted.values.forall(_.size == 1),
      s"planted clusters split across lists: $byPlanted")
    assert(byPlanted.values.flatten.toSet.size == 3,
      "planted clusters collapsed into a shared list")
    // training strictly improves quantization vs the seeded init
    val init = Similarity.ivfTrainAssignments(df, "vec_id", "embedding",
      nlist = 3, iters = 0).collect().map(_.getDouble(3))
    assert(trained.values.map(_._2).sum / 300.0 > init.sum / 300.0 + 0.05,
      "mean cosine-to-centroid did not improve over the init")
  }

  test("nearDupLsh recall >= 0.9 and matches exact NN on planted pairs") {
    val got = Similarity.nearDupLsh(planted, "vec_id", "embedding",
      dupThreshold = 0.9, dim = 64, planes = 8, tables = 4)
      .filter(col("vec_id") >= 1000 && col("vec_id") < 5000)
      .select("vec_id", "nn_id", "is_dup").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getBoolean(2)))).toMap
    val hits = (0 until 200).count { i =>
      got.get(1000L + i).exists { case (nn, dup) => nn == i.toLong && dup }
    }
    val recall = hits / 200.0
    assert(recall >= 0.9, s"nearDupLsh recall was $recall")
    // and the exact ground truth agrees: every found partner IS the
    // cross-join top-1 (bucketing may only lose pairs, never invent
    // better-than-exact ones)
    val exact = Similarity.nearestNeighborAll(planted, "vec_id", "embedding", 0.9)
      .filter(col("vec_id") >= 1000 && col("vec_id") < 5000)
      .select("vec_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    got.foreach { case (v, (nn, dup)) =>
      if (dup) assert(exact(v) == nn, s"vec $v: lsh=$nn exact=${exact(v)}")
    }
  }

  test("sq8 quantization: bounded per-dim error, high top-k recall") {
    val (mn, mx) = Similarity.sq8Stats(embs, "vec_id", "embedding")
    // per-dim reconstruction error is at most half a quantization step
    val base = Similarity.prepared(embs, "vec_id", "embedding")
    val dq = base.select(col("vec_id"), col("e"),
      Similarity.sq8Dequantize(col("e"), mn, mx).as("dq"))
    val steps = typedLit(mx.zip(mn).map(p => (p._1 - p._2) / 255.0))
    val maxRelErr = dq
      .select(max(array_max(transform(col("e"), (x, i) =>
        abs(x - element_at(col("dq"), i + 1)) /
          greatest(lit(1e-12), element_at(steps, i + 1))))))
      .head().getDouble(0)
    assert(maxRelErr <= 0.5 + 1e-9,
      s"reconstruction error $maxRelErr quantization steps, expected <= 0.5")

    // top-5 recall vs full precision over the gate's query set
    val exact = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      id => id % 50 === 0, k = 5)
      .select("qid", "nn_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val sq = Similarity.sq8TopK(embs, "vec_id", "embedding",
      id => id % 50 === 0, k = 5)
      .select("qid", "nn_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recall = exact.map { case (q, ids) =>
      (ids intersect sq.getOrElse(q, Set.empty)).size.toDouble / ids.size
    }.sum / exact.size
    assert(recall >= 0.9, s"sq8 top-5 recall was $recall")
  }

  test("jl rerank recall >= 0.9 on planted near-dups; exact cos on hits") {
    // JL's contract is MARGIN-dependent: it preserves LARGE
    // similarities (near-dups at cos >= 0.9, far above the bulk), not
    // the margin-less generic top-5 of i.i.d. random vectors — the
    // same contract the sign-LSH recall spec pins. Measured on this
    // corpus's random embeddings: generic top-5 recall is ~0.5-0.8
    // and climbs only with cand → N, exactly the JL distortion bound's
    // prediction; on the planted fixture the true partner survives.
    val got = Similarity.jlRerankTopK(planted, "vec_id", "embedding",
      id => id >= 1000 && id < 5000, k = 1, dim = 64, r = 16, cand = 32)
      .filter(col("rank") === 1)
      .select("qid", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val hits = (0 until 200).count(i => got.get(1000L + i).contains(i.toLong))
    val recall = hits / 200.0
    assert(recall >= 0.9, s"jl top-1 recall on planted dups was $recall")
    // re-rank runs EXACT cosine, so every reported hit carries the
    // brute-force cos_sim bit-for-bit
    val bf = Similarity.bruteForceTopK(planted, "vec_id", "embedding",
      id => id >= 1000 && id < 5000, k = 1)
      .select("qid", "nn_id", "cos_sim").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    Similarity.jlRerankTopK(planted, "vec_id", "embedding",
      id => id >= 1000 && id < 5000, k = 1, dim = 64, r = 16, cand = 32)
      .select("qid", "nn_id", "cos_sim").collect()
      .foreach { r =>
        bf.get((r.getLong(0), r.getLong(1))).foreach { c =>
          assert(c == r.getDouble(2), s"cos mismatch at ${r.getLong(0)}")
        }
      }
  }

  test("firstSeen keeps exactly one row per key") {
    val e = Tables.load(spark, Sf, "events")
    val d = Dedup.firstSeen(e, Seq("user_id"), "ts_ns")
    assert(d.count() == e.select("user_id").distinct().count())
  }

  test("exact-dup cliques expand to the full pair list with exact jaccard") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    def words(n: Int) = Seq.fill(n)("w" + rnd.nextInt(500)).mkString(" ")
    val uniq = (0 until 8).map(i => (i.toLong, words(30)))
    // planted exact-dup cliques: {0,100,101} and {1,200,201,202}
    val dups = Seq((100L, uniq(0)._2), (101L, uniq(0)._2),
      (200L, uniq(1)._2), (201L, uniq(1)._2), (202L, uniq(1)._2))
    val all = uniq ++ dups
    val corpus = all.toDF("doc_id", "text")
    // plain-Scala ground truth over every pair (matches the operator
    // contract: distinct 3-shingles, empty under 3 tokens, round-6)
    def sh(t: String) = {
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty[String]
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val expected = (for {
      (ia, ta) <- all; (ib, tb) <- all if ia < ib
      sa = sh(ta); sb = sh(tb) if sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / (sa ++ sb).size
      jr = math.floor(j * 1e6 + 0.5) / 1e6 if jr >= 0.5
    } yield (ia, ib, jr)).toSet
    assert(expected.count(_._3 == 1.0) == 3 + 6, "planted clique pairs")
    val ngram = Dedup.ngramJaccardPairs(corpus, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(ngram == expected)
    val lsh = Dedup.minhashLshPairs(corpus, "doc_id", "text", 0.5,
      numHashes = 16, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh == expected)
    // simhash: dup copies share fingerprints — every clique pair at
    // hamming 0, exactly once
    val sp = Dedup.simhashPairs(corpus, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(sp.length == sp.map(p => (p._1, p._2)).distinct.length)
    val cliquePairs = for {
      c <- Seq(Seq(0L, 100L, 101L), Seq(1L, 200L, 201L, 202L))
      a <- c; b <- c if a < b
    } yield (a, b)
    cliquePairs.foreach { case (a, b) =>
      assert(sp.contains((a, b, 0)), s"missing clique pair ($a,$b)")
    }
  }
}
