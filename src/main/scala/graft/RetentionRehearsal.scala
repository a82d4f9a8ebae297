package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.BucketedTable

/** Retention/feed rehearsal for the versioned state tables (round 13,
  * L76/L78 at 20×): drives TWO identical BucketedTables — one with
  * the vacuum cadence wired, one never collected — through a long
  * upsert run over a 20×-documents key universe, and measures the
  * thing vacuum exists for: the superseded-directory leak of the
  * by-reference manifest. Along the way it proves, via `require`
  * (pass/fail, not a demo):
  *
  *   1. the GC'd table reads IDENTICAL to the never-collected one at
  *      every checkpoint (vacuum changes what is retained, never what
  *      is live) — checksummed, not row-counted;
  *   2. the change feed serves each batch's true delta, and its
  *      changed-bucket pruning reads a strict subset of the manifest;
  *   3. a mid-run migration's default surfaces over history through
  *      `readAt`, and time travel inside the horizon works while a
  *      collected version fails NAMED;
  *   4. a poisoned batch reverts by RESTORE to checksum-identity with
  *      the pre-poison state, with the reverts riding the feed;
  *   5. the leak is real and the horizon is flat: the uncollected
  *      table's directory count grows with the batch count while the
  *      GC'd table's stays bounded by the horizon.
  *
  * 100 TB shape: every per-batch operation here (merge, feed, vacuum
  * tick) costs ∝ batch / ∝ touched buckets; only the deliberate
  * restore is a full rewrite. The measured dir-count ratio is the
  * sizing rule for the vacuum cadence: uncollected, a store at B
  * batches holds O(B) superseded directories regardless of corpus
  * size — the leak scales with COMMIT COUNT, which is why the GC
  * rides the maintenance cadence rather than a size trigger.
  */
object RetentionRehearsal {

  private def dirCount(path: String): Int =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("c_"))
      .flatMap(cd => Option(cd.listFiles()).getOrElse(Array.empty))
      .count(b => b.isDirectory && b.getName.startsWith("__bucket="))

  private def checksum(df: DataFrame): Long =
    // hashes reduced mod 2^31 before the sum so the ANSI-mode long
    // aggregate cannot overflow at any row count that fits a box
    df.select(pmod(xxhash64(col("k"), col("v")), lit(1L << 31)).as("h"))
      .agg(sum("h")).head().getLong(0)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_REP", "20").toInt
    val nBatches = 24
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = java.nio.file.Files
      .createTempDirectory("retention_rehearsal").toString
    val t0 = System.nanoTime()

    // 20× key universe off the documents ids; each key lands in
    // exactly one batch (hash residue), value = its batch id
    // batch assignment by key RESIDUE, deliberately decorrelated from
    // the table's xxhash64 bucketing: a bulk batch's keys then land in
    // every bucket (the production shape — new doc ids hash uniformly)
    val base = Tables.load(spark, dir, "documents").select(col("doc_id"))
    val keys = base.select(explode(sequence(lit(0), lit(rep - 1))).as("r"),
      col("doc_id"))
      .select((col("doc_id") + col("r") * 10000000L).as("k"))
      .withColumn("b", pmod(col("k"), lit(nBatches.toLong)))
      .localCheckpoint()
    val nKeys = keys.count()
    println(s"[retention] key universe: $nKeys keys, $nBatches batches")

    val gc = new BucketedTable(spark, s"$root/gc", "k", 64)
    val leak = new BucketedTable(spark, s"$root/leak", "k", 64)
    val vacuumEvery = 4
    val keep = 2

    for (b <- 0 until nBatches) {
      val updates = keys.filter(col("b") === b.toLong)
        .select(col("k"), lit(b.toLong).as("v"))
      gc.merge(updates, b.toLong)
      leak.merge(updates, b.toLong)
      // the feed serves the batch's true delta (all inserts here)
      val v = gc.latest.get._1
      if (v > 0) {
        val feed = gc.changesBetween(v - 1, v)
        val inserts = feed.filter(col("change_type") === "insert").count()
        val total = feed.count()
        val want = updates.count()
        require(inserts == want && total == want,
          s"batch $b feed: $inserts inserts/$total rows, want $want")
      }
      // mid-run ADDITIVE migration: history must read the default
      if (b == nBatches / 2) {
        gc.addColumn("rev", "bigint", "-1")
        leak.addColumn("rev", "bigint", "-1")
        require(gc.readAt(gc.latest.get._1)
          .get.filter(col("rev") =!= -1L).count() == 0L,
          "migration default did not surface over history")
      }
      if ((b + 1) % vacuumEvery == 0) gc.vacuum(keep)
    }

    // phase 2 — POINT updates (a relabel touching few keys): the
    // change feed's pruning case, where the changed-bucket diff reads
    // a small fraction of the live directories
    var feedDirsRead = 0L
    var feedDirsTotal = 0L
    val nPoint = 6
    for (i <- 0 until nPoint) {
      val upd = keys.filter(pmod(col("k"), lit(12500L)) === i.toLong)
        .select(col("k"), lit(1000L + i).as("v"), lit(0L).as("rev"))
      val bid = (nBatches + i).toLong
      gc.merge(upd, bid)
      leak.merge(upd, bid)
      val v = gc.latest.get._1
      val (fromRels, toRels) = gc.changedRelDirs(v - 1, v)
      feedDirsRead += fromRels.size + toRels.size
      feedDirsTotal += 2L * dirCount(s"$root/gc")
      val feed = gc.changesBetween(v - 1, v)
      require(feed.filter(col("change_type") === "update").count() ==
        upd.count() && feed.count() == upd.count(),
        s"point batch $i feed wrong")
    }
    require(feedDirsRead * 2 < feedDirsTotal,
      s"feed pruning not demonstrated: read $feedDirsRead of $feedDirsTotal")

    // identity: GC never changed what is live
    def liveChecksum(t: BucketedTable) =
      checksum(t.read().get.select(col("k"), col("v")))
    require(liveChecksum(gc) == liveChecksum(leak),
      "vacuumed table diverged from the uncollected one")

    // the leak, quantified
    val gcDirs = dirCount(s"$root/gc")
    val leakDirs = dirCount(s"$root/leak")
    println(f"[retention] dirs: gc=$gcDirs leak=$leakDirs " +
      f"ratio=${leakDirs.toDouble / gcDirs}%.1f")
    require(leakDirs >= gcDirs * 3,
      s"leak not demonstrated: gc=$gcDirs leak=$leakDirs")
    require(gc.versions.size <= keep + nPoint,
      s"horizon not flat: ${gc.versions.size} versions retained")

    // time travel: inside the horizon works, collected fails NAMED
    val live = gc.latest.get._1
    require(gc.readAt(live).get.count() == nKeys)
    val namedFail =
      try { gc.readAt(0L); false }
      catch { case e: IllegalStateException =>
        e.getMessage.contains("vacuumed") }
    require(namedFail, "a collected version did not fail NAMED")

    // poison → RESTORE: checksum identity with the pre-poison state,
    // reverts riding the feed
    val preChecksum = liveChecksum(gc)
    val preVersion = gc.latest.get._1
    val poison = keys.filter(col("b") === 0L)
      .select(col("k"), lit(-999L).as("v"), lit(-1L).as("rev"))
    gc.merge(poison, (nBatches + nPoint).toLong)
    require(liveChecksum(gc) != preChecksum, "poison did not land")
    gc.restore(preVersion)
    require(liveChecksum(gc) == preChecksum,
      "restore did not recover the pre-poison state")
    val reverts = gc.changesBetween(preVersion + 1, preVersion + 2)
    require(reverts.filter(col("change_type") === "update").count() ==
      poison.count(), "restore reverts did not ride the feed")

    val wallS = (System.nanoTime() - t0) / 1e9
    println(f"[retention] feed pruning: $feedDirsRead dirs read of " +
      f"$feedDirsTotal live-side candidates across $nPoint point feeds " +
      f"(${100.0 * feedDirsRead / feedDirsTotal}%.1f%%)")
    println(f"[retention] PASS in $wallS%.1f s " +
      f"(keys=$nKeys, batches=$nBatches, vacuumEvery=$vacuumEvery, " +
      f"keep=$keep, gcDirs=$gcDirs, leakDirs=$leakDirs)")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
