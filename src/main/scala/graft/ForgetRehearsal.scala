package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.IngestStream

/** Forget rehearsal (round 13, L81 at 20×): drives the REAL
  * [[IngestStream.forget]] against a 20×-documents state whose
  * cluster topology is planted as 4-member PATH graphs (member i's
  * fingerprint = group base XOR first-2i-bits mask → adjacent members
  * sit at hamming 2, skip-one at 4, ends at 6), so a forgotten middle
  * member genuinely SPLITS its cluster — the relabel's hard case —
  * hundreds of thousands of times in one run. Everything is asserted
  * via `require` (pass/fail, not a demo):
  *
  *   1. after each forget, the label store reads IDENTICAL to the
  *      closed-form expectation (per group, maximal consecutive
  *      survivor runs; cluster_id = run-min doc id) — the at-scale
  *      twin of IngestStreamSpec's bridge fixture;
  *   2. the snapshot and fp index hold exactly the survivors;
  *   3. shard files hold no forgotten pub id, and the partitions
  *      rewritten are exactly the partitions that held one — measured
  *      for BOTH request shapes: a SCATTERED forget (every 100th id —
  *      hits every shard: the honest worst case) and a LOCAL one (one
  *      shard's id range — rewrites exactly that shard).
  *
  * 100 TB shape measured here: the forget pays one narrow label-store
  * scan (find-touched-members), a relabel ∝ affected members, one
  * consolidating rewrite per append log (amortized over the forget
  * cadence — batch requests), and a shard rewrite ∝ partitions hit.
  * The scattered/local split is the sizing rule: takedown sets with
  * id locality rewrite O(1) partitions; scattered sets rewrite every
  * partition they touch, so BATCH scattered requests on a cadence.
  */
object ForgetRehearsal {

  /** Closed-form expected labeling over the surviving member set:
    * per group, maximal runs of consecutive member indices (edges
    * exist only between adjacent members at hamming 2).
    */
  private def expected(survivors: DataFrame): DataFrame = {
    val w = Window.partitionBy("g").orderBy("m")
    val runs = survivors
      .withColumn("brk",
        when(col("m") - lag("m", 1).over(w) <= 1, lit(0L)).otherwise(lit(1L)))
      .withColumn("run", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wr = Window.partitionBy("g", "run")
    runs.select(col("doc_id"),
      min("doc_id").over(wr).as("cluster_id"),
      count(lit(1)).over(wr).as("cluster_size"))
  }

  private def requireIdentical(name: String, got: DataFrame,
      want: DataFrame): Unit = {
    val g = got.select("doc_id", "cluster_id", "cluster_size")
    val w = want.select("doc_id", "cluster_id", "cluster_size")
    val extra = g.exceptAll(w).count()
    val missing = w.exceptAll(g).count()
    require(extra == 0 && missing == 0,
      s"[$name] labels diverged from the closed form: " +
        s"$extra extra, $missing missing")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_REP", "20").toInt
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files
      .createTempDirectory("forget_rehearsal").toString
    val state = s"$root/state"
    val dest = s"$root/shards"

    // 20× id universe: contiguous ids, 4-member path groups
    val nBase = Tables.load(spark, dir, "documents").count()
    val n = nBase * rep
    val all = spark.range(n).select(col("id").as("doc_id"),
        (col("id") / 4).cast("long").as("g"), (col("id") % 4).as("m"))
      .localCheckpoint()
    println(s"[forget] universe: $n docs, ${n / 4} path groups")

    // planted state: fps = group base XOR first-2m-bits mask (path
    // topology); snapshot fp is just a digest; labels = whole groups
    val fps = all.select(col("doc_id"),
      (xxhash64(col("g")).bitwiseXOR(expr(
        "shiftleft(cast(1 as bigint), cast(m * 2 as int)) - 1")))
        .as("simhash"))
    val snap = all.select(col("doc_id"),
      md5(col("doc_id").cast("string")).as("fp"))
    val labels0 = expected(all)
    val t0 = System.nanoTime()
    IngestStream.fpsTable(spark, state).append(fps, 0L)
    IngestStream.snapTable(spark, state).append(snap, 0L)
    val labelsT = IngestStream.labelsTable(spark, state)
    labelsT.merge(labels0, 0L)
    // production-faithful bucket count (exercises forget on a
    // rebucketed layout, not the bootstrap 16): target ~n/64 rows per
    // bucket so the growth rule lands on 64 buckets at any rep
    labelsT.growIfOversized(math.max(1L, n / 64))
    // published shards: ~3000 docs per partition directory, plus the
    // assignment-ledger manifest the forget's zone pruning reads
    val perShard = 3000L
    val assigned = all.select(
      (lit(1000000000000L) + col("doc_id")).as("pub_id"),
      lit(1L).as("n_tok"),
      (col("doc_id") / perShard).cast("long").as("shard_id"))
    assigned.repartition(col("shard_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(dest)
    IngestStream.publishManifest(spark, state).commit(
      graft.operators.Sampling.shardManifest(assigned, "pub_id", "n_tok"),
      0L)
    val nShards = (n + perShard - 1) / perShard
    println(f"[forget] state built in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"(${labelsT.currentBuckets} label buckets, $nShards shards)")

    def shardMtimes(): Map[String, Long] =
      Option(new java.io.File(dest).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
        .map(f => f.getName -> f.listFiles().map(_.lastModified()).max)
        .toMap

    // ---- forget 1: SCATTERED (every 100th id) — splits everywhere
    val gone1 = all.filter(col("doc_id") % 100 === 1)
    val nGone1 = gone1.count()
    val before1 = shardMtimes()
    val t1 = System.nanoTime()
    IngestStream.forget(spark, state, gone1.select("doc_id"), 1L,
      maxDist = 3, publishDest = Some(dest))
    val dt1 = (System.nanoTime() - t1) / 1e9
    val surv1 = all.filter(col("doc_id") % 100 =!= 1).localCheckpoint()
    requireIdentical("scattered", labelsT.read().get, expected(surv1))
    val splits = expected(surv1)
      .filter(col("cluster_size") < 4 && col("cluster_size") > 0)
      .select((col("cluster_id") / 4).cast("long").as("g")).distinct().count()
    val rewritten1 = shardMtimes().count { case (k, t) => before1(k) != t }
    val expectedHit1 = gone1
      .select((col("doc_id") / perShard).cast("long")).distinct().count()
    println(f"[forget] scattered: $nGone1 ids in $dt1%.1f s; " +
      s"$splits groups split/shrunk; $rewritten1/$nShards shard dirs " +
      s"rewritten (expected hits: $expectedHit1)")
    require(rewritten1 == expectedHit1,
      "scattered forget must rewrite exactly the shards that held a hit")

    // snapshot/index hold exactly the survivors
    require(IngestStream.snapTable(spark, state).read().get.count() ==
      n - nGone1, "snapshot row count diverged")
    require(IngestStream.fpsTable(spark, state).read().get.count() ==
      n - nGone1, "fp index row count diverged")

    // ---- forget 2: LOCAL (one shard's id range) — pruned rewrite
    val lo = 7L * perShard
    val gone2 = surv1.filter(col("doc_id") >= lo &&
      col("doc_id") < lo + perShard)
    val nGone2 = gone2.count()
    // the manifest's (min_id, max_id) zones isolate the candidate
    // partitions BEFORE any pub_id column is scanned: exactly one
    // shard for this id-local request
    val manRanges = IngestStream.publishManifest(spark, state).read().get
      .select(col("shard_id").cast("long"), col("min_id").cast("long"),
        col("max_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cand2 = IngestStream.candidateShards(manRanges,
      gone2.select("doc_id").collect().map(_.getLong(0)).sorted)
    require(cand2 == Seq(7L),
      s"manifest zone pruning must isolate shard 7, got $cand2")
    val before2 = shardMtimes()
    val t2 = System.nanoTime()
    IngestStream.forget(spark, state, gone2.select("doc_id"), 2L,
      maxDist = 3, publishDest = Some(dest))
    val dt2 = (System.nanoTime() - t2) / 1e9
    val surv2 = surv1.filter(col("doc_id") < lo ||
      col("doc_id") >= lo + perShard).localCheckpoint()
    requireIdentical("local", labelsT.read().get, expected(surv2))
    val after2 = shardMtimes()
    val rewritten2 = after2.count { case (k, t) => before2.get(k).exists(_ != t) }
    val removed2 = before2.keySet -- after2.keySet
    println(f"[forget] local: $nGone2 ids in $dt2%.1f s; " +
      s"$rewritten2 shard dirs rewritten, ${removed2.size} removed " +
      s"(${removed2.mkString(",")})")
    require(rewritten2 <= 2 && removed2.size == 1,
      "local forget must touch only its own shard range")

    // forgotten pub ids are gone from disk; ledger holds both batches
    val live = spark.read.parquet(dest)
      .selectExpr("pub_id % 1000000000000 AS doc_id")
    require(live.count() == surv2.count(), "live shard rows diverged")
    val ledger = IngestStream.forgetLedger(spark, state).read().get.count()
    require(ledger == nGone1 + nGone2, "ledger rows diverged")

    // ---- forget 3: VECTORED (L83) — the log side takes deletion
    // vectors; same end-state identity, and the maintenance compact
    // is the physical-erasure moment
    val gone3 = surv2.filter(col("doc_id") % 97 === 3).localCheckpoint()
    val nGone3 = gone3.count()
    def logDirs(t: String) =
      Option(new java.io.File(s"$state/$t").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && !f.getName.startsWith("t_"))
        .map(_.getName).toSet
    val fpsDirsBefore = logDirs("fps")
    val t3 = System.nanoTime()
    IngestStream.forget(spark, state, gone3.select("doc_id"), 3L,
      maxDist = 3, publishDest = Some(dest), vectored = true)
    val dt3 = (System.nanoTime() - t3) / 1e9
    val surv3 = surv2.filter(col("doc_id") % 97 =!= 3).localCheckpoint()
    requireIdentical("vectored", labelsT.read().get, expected(surv3))
    require(IngestStream.snapTable(spark, state).read().get.count() ==
      surv3.count(), "vectored: snapshot view diverged")
    require(logDirs("fps") == fpsDirsBefore,
      "vectored: no fp-index data dir may be rewritten")
    val tF = System.nanoTime()
    IngestStream.fpsTable(spark, state).compact()
    IngestStream.snapTable(spark, state).compact()
    val dtFold = (System.nanoTime() - tF) / 1e9
    require(IngestStream.fpsTable(spark, state).read().get.count() ==
      surv3.count(), "fold: fp index diverged")
    println(f"[forget] vectored: $nGone3 ids in $dt3%.1f s whole-op " +
      f"(log dirs untouched); physical fold at compact $dtFold%.1f s")

    // log-side A/B on identical copies of the snap log: the
    // ∝-forgotten tombstone write vs the ∝-corpus consolidating rewrite
    val probeIds = surv3.limit(500).select(col("doc_id")).localCheckpoint()
    for (mode <- Seq("full", "vec")) {
      org.apache.commons.io.FileUtils.copyDirectory(
        new java.io.File(s"$state/snap"),
        new java.io.File(s"$root/snap_$mode"))
    }
    val pFull = new graft.streaming.AppendTable(spark, s"$root/snap_full")
    val pVec = new graft.streaming.AppendTable(spark, s"$root/snap_vec")
    val ta = System.nanoTime()
    pFull.deleteKeys(probeIds, "doc_id")
    val dtFull = (System.nanoTime() - ta) / 1e9
    val tb = System.nanoTime()
    pVec.deleteKeysVectored(probeIds, "doc_id")
    val dtVec = (System.nanoTime() - tb) / 1e9
    require(pFull.read().get.count() == pVec.read().get.count(),
      "A/B: the two delete modes must serve the same view")
    println(f"[forget] log-side A/B (500 ids over ${surv3.count()} rows): " +
      f"full rewrite $dtFull%.2f s vs vectored $dtVec%.2f s")

    println(f"[forget] done: total ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"over $n docs (${nGone1 + nGone2 + nGone3} forgotten)")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
