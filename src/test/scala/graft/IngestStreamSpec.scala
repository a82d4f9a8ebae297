package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Clusters
import graft.streaming.IngestStream

/** The streaming ingest loop's end-state contract: streaming a corpus
  * through in micro-batches — any partitioning — yields the IDENTICAL
  * label table to one from-scratch clustering run, and a restarted
  * stream over the same feed replays as a no-op.
  */
class IngestStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def labelMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("streamed batches converge to the from-scratch labeling; restart is a no-op") {
    val root = Files.createTempDirectory("ingest_stream").toString
    val d = Tables.load(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").localCheckpoint()

    // feed: three parquet files = three micro-batches (file source,
    // maxFilesPerTrigger=1), slicing the corpus arbitrarily; slice 2
    // re-delivers part of slice 1 (the at-least-once-source case the
    // L49 gate must drop)
    val feed = s"$root/feed"
    d.filter(col("doc_id") % 3 === 0).coalesce(1)
      .write.parquet(s"$feed/b0.parquet")
    d.filter(col("doc_id") % 3 === 1 ||
        (col("doc_id") % 3 === 0 && col("doc_id") % 5 === 0)).coalesce(1)
      .write.parquet(s"$feed/b1.parquet")
    d.filter(col("doc_id") % 3 === 2).coalesce(1)
      .write.parquet(s"$feed/b2.parquet")

    val stream = spark.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/*.parquet")
    val state = s"$root/state"
    val chk = s"$root/chk"
    val q = IngestStream.start(stream, state, chk, maxDist = 3)
    try q.processAllAvailable() finally q.stop()

    val want = labelMap(
      Clusters.simhashClusters(d, "doc_id", "text", maxDist = 3))
    val labelsT = IngestStream.labelsTable(spark, state)
    assert(labelMap(labelsT.read().get) == want)
    val v1 = labelsT.latest.get

    // restart over the same feed + checkpoint: nothing new → state
    // version unchanged
    val q2 = IngestStream.start(spark.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/*.parquet"),
      state, chk, maxDist = 3)
    try q2.processAllAvailable() finally q2.stop()
    assert(IngestStream.labelsTable(spark, state).latest.get == v1)
    assert(labelMap(labelsT.read().get) == want)

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("quality admission composes ahead of the loop: rejects never enter any state table") {
    import graft.text.QualityClassifier
    import graft.text.QualityClassifier.Degradation
    val root = Files.createTempDirectory("ingest_admit").toString
    // planted corpus: every doc_id % 3 == 0 carries the boilerplate
    // degradation the committed artifact was trained to reject
    val d = Tables.load(spark, TestSpark.Sf, "documents")
      .select(col("doc_id"), Degradation.plant(col("doc_id"), col("text")).as("text"))
      .localCheckpoint()
    val feed = s"$root/feed"
    d.filter(col("doc_id") % 2 === 0).coalesce(1)
      .write.parquet(s"$feed/b0.parquet")
    d.filter(col("doc_id") % 2 === 1).coalesce(1)
      .write.parquet(s"$feed/b1.parquet")

    val stream = QualityClassifier.admit(
      spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$feed/*.parquet"),
      "text", minScore = 0.5)
    val state = s"$root/state"
    val q = IngestStream.start(stream, state, s"$root/chk", maxDist = 3)
    try q.processAllAvailable() finally q.stop()

    // the batch-side truth: who passes the same admission rule
    val admitted = QualityClassifier.admit(d, "text", 0.5).localCheckpoint()
    val admittedIds = admitted.select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val rejectedIds = d.select("doc_id").collect().map(_.getLong(0))
      .toSet -- admittedIds
    assert(rejectedIds.nonEmpty && admittedIds.nonEmpty,
      "degenerate fixture: admission did not split the corpus")

    // rejects are in NO state table; the label table is exactly the
    // from-scratch clustering of the admitted subset
    val labels = IngestStream.labelsTable(spark, state).read().get
    val want = labelMap(
      Clusters.simhashClusters(admitted, "doc_id", "text", maxDist = 3))
    assert(labelMap(labels) == want)
    val fpsIds = IngestStream.fpsTable(spark, state).read().get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val snapIds = IngestStream.snapTable(spark, state).read().get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((fpsIds intersect rejectedIds).isEmpty)
    assert((snapIds intersect rejectedIds).isEmpty)
    assert(fpsIds == admittedIds && snapIds == admittedIds)

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("streaming shard publish: admitted docs land exactly once, replay is a no-op, touches stay ∝ batch") {
    import graft.streaming.IngestStream.PublishConfig
    val root = Files.createTempDirectory("ingest_publish").toString
    val d = Tables.load(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").localCheckpoint()
    val feed = s"$root/feed"
    d.filter(col("doc_id") % 3 === 0).coalesce(1)
      .write.parquet(s"$feed/b0.parquet")
    d.filter(col("doc_id") % 3 === 1 ||
        (col("doc_id") % 3 === 0 && col("doc_id") % 5 === 0)).coalesce(1)
      .write.parquet(s"$feed/b1.parquet")
    d.filter(col("doc_id") % 3 === 2).coalesce(1)
      .write.parquet(s"$feed/b2.parquet")

    val state = s"$root/state"
    val chk = s"$root/chk"
    val dest = s"$root/shards"
    val cfg = Some(PublishConfig(dest, budget = 512L))
    def run(): Unit = {
      val q = IngestStream.start(spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$feed/*.parquet"),
        state, chk, maxDist = 3, publish = cfg)
      try q.processAllAvailable() finally q.stop()
    }
    run()

    // every doc published exactly once (re-delivered slice included
    // once), under its batch-epoch publish id
    def published() = spark.read.parquet(dest)
      .select((col("pub_id") % 1000000000000L).as("doc_id"),
        col("pub_id"), col("n_tok"), col("shard_id").cast("long"))
    val rows = published().collect()
    val allIds = d.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == allIds)
    assert(rows.length == allIds.size, "duplicate publishes")
    // shard budget: ≤ budget + one straddling doc
    val maxTok = rows.map(_.getLong(2)).max
    rows.groupBy(_.getLong(3)).foreach { case (sid, rs) =>
      assert(rs.map(_.getLong(2)).sum < 512L + maxTok, s"shard $sid over")
    }
    // the bounded manifest equals the manifest of the files on disk
    val mT = IngestStream.publishManifest(spark, state)
    val manifest = mT.read().get.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val fromDisk = rows.groupBy(_.getLong(3)).map { case (sid, rs) =>
      sid -> (rs.length.toLong, rs.map(_.getLong(2)).sum) }
    assert(manifest == fromDisk)
    val v1 = mT.latest.get

    // restart over the same feed: no state version moves, no file
    // bytes change
    def files(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dest)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
    }
    val before = files()
    run()
    assert(mT.latest.get == v1)
    assert(files() == before, "replay rewrote published files")

    // one more small batch through the loop: only the straddler and
    // new shard directories are touched
    import spark.implicits._
    val extra = Seq((900001L, "fresh doc about spark shards"),
      (900002L, "another fresh doc entirely")).toDF("doc_id", "text")
    IngestStream.processBatch(extra, 99L, state, 3, cfg)
    val after = files()
    def shardOf(p: String): Long =
      "shard_id=(\\d+)".r.findFirstMatchIn(p).get.group(1).toLong
    val lastShard = before.keys.map(shardOf).max
    before.filter { case (p, _) => shardOf(p) < lastShard }.foreach {
      case (p, meta) => assert(after.get(p).contains(meta),
        s"published file rewritten by a later batch: $p")
    }
    val pubAfter = published().collect()
    assert(pubAfter.map(_.getLong(0)).toSet == allIds ++ Set(900001L, 900002L))
    assert(pubAfter.length == allIds.size + 2)

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  /** Every parquet data file under `dir`, as relative paths. */
  private def dataFiles(dir: String): Set[String] = {
    val base = java.nio.file.Paths.get(dir)
    val out = scala.collection.mutable.Set.empty[String]
    if (java.nio.file.Files.exists(base)) {
      val st = java.nio.file.Files.walk(base)
      try st.forEach { p =>
        if (p.toString.endsWith(".parquet") &&
            java.nio.file.Files.isRegularFile(p))
          out += base.relativize(p).toString
      } finally st.close()
    }
    out.toSet
  }

  test("state writes are ∝ batch: appends carry only the batch, label MERGE touches a strict bucket subset") {
    val root = Files.createTempDirectory("ingest_prop").toString
    val d = Tables.load(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").localCheckpoint()
    val state = s"$root/state"

    // the batch: three docs that are SINGLETONS in the from-scratch
    // clustering (picked dynamically so a testdata regen keeps the
    // test honest) — their change-set is exactly themselves, the
    // ∝-batch case this test pins. A batch that near-dups into the
    // corpus's 400-doc mega-cluster would LEGITIMATELY rewrite that
    // cluster's rows (cluster_size changes for every member); that is
    // ∝ affected-clusters, not ∝ corpus, and is covered by the
    // convergence test above.
    val singletons = Clusters
      .simhashClusters(d, "doc_id", "text", maxDist = 3)
      .filter(col("cluster_size") === 1)
      .orderBy("doc_id").limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(singletons.size == 3, "testdata must contain ≥3 singleton docs")

    // batch 0: everything else (bootstrap — writes everything)
    IngestStream.processBatch(
      d.filter(!col("doc_id").isin(singletons: _*)), 0L, state, maxDist = 3)
    val after0 = dataFiles(state)

    // batch 1: the singleton slice
    val slice = d.filter(col("doc_id").isin(singletons: _*))
    val sliceN = slice.count()
    IngestStream.processBatch(slice, 1L, state, maxDist = 3)
    val after1 = dataFiles(state)

    // nothing from commit 0 is rewritten, ever
    assert(after0.subsetOf(after1), "batch 1 must not rewrite batch 0's files")
    val newFiles = after1 -- after0

    // the appends carry exactly the batch's rows
    val fpsNew = spark.read.parquet(s"$state/fps/b_1").count()
    val snapNew = spark.read.parquet(s"$state/snap/b_1").count()
    assert(fpsNew == sliceN && snapNew == sliceN,
      s"appends must be batch-sized: fps=$fpsNew snap=$snapNew batch=$sliceN")

    // the label MERGE rewrote a strict subset of the buckets — the
    // ∝-batch write bound (a full rewrite would touch all of them)
    val labelBuckets = newFiles
      .filter(f => f.startsWith("labels/c_1/"))
      .map(_.split("/")(2)) // "__bucket=k"
    assert(labelBuckets.nonEmpty && labelBuckets.size <= sliceN &&
        labelBuckets.size < IngestStream.LabelBuckets,
      s"label MERGE touched ${labelBuckets.size} of " +
        s"${IngestStream.LabelBuckets} buckets for a $sliceN-row " +
        "change-set — expected ≤ one bucket per changed row")

    // and the merged store still reads as the from-scratch labeling
    val want = labelMap(
      Clusters.simhashClusters(d, "doc_id", "text", maxDist = 3))
    assert(labelMap(
      IngestStream.labelsTable(spark, state).read().get) == want)

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("wired maintenance: compaction cadence bounds read fan-in, bucket growth keeps labels identical") {
    import graft.streaming.IngestStream.MaintainConfig
    val root = Files.createTempDirectory("ingest_maint").toString
    val d = Tables.load(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").localCheckpoint()
    val state = s"$root/state"
    // cadence 2; rows-per-bucket target small enough that the 500-doc
    // corpus must outgrow the 16-bucket bootstrap at least once; GC to
    // a one-version horizon on the same cadence
    val maintain = MaintainConfig(compactEvery = 2, maxRowsPerBucket = 8L,
      vacuumKeepVersions = 1)
    val fpsT = IngestStream.fpsTable(spark, state)
    val labelsT = IngestStream.labelsTable(spark, state)

    for (b <- 0L until 4L) {
      IngestStream.processBatch(d.filter(col("doc_id") % 4 === b), b,
        state, maxDist = 3, publish = None, maintain = maintain)
      // the wired cadence bound: an append table never unions more
      // than compactEvery + 1 directories
      assert(fpsT.readFanIn <= maintain.compactEvery + 1,
        s"after batch $b: fan-in ${fpsT.readFanIn}")
    }
    assert(fpsT.readFanIn == 1, "final cadence tick should have folded")
    assert(IngestStream.snapTable(spark, state).readFanIn == 1)

    // the store outgrew its bootstrap bucket count...
    assert(labelsT.currentBuckets > IngestStream.LabelBuckets,
      s"rebucket never fired: ${labelsT.currentBuckets} buckets for " +
        s"${labelsT.read().get.count()} rows")
    // ...and the grown store still reads as the from-scratch labeling
    val want = labelMap(
      Clusters.simhashClusters(d, "doc_id", "text", maxDist = 3))
    assert(labelMap(labelsT.read().get) == want)

    // the wired vacuum collected every superseded version: only the
    // live manifest is retained, and the disk holds EXACTLY what it
    // references — the loop no longer leaks superseded bucket dirs
    assert(labelsT.versions == Seq(labelsT.latest.get._1),
      s"vacuum cadence left versions ${labelsT.versions}")
    val (referenced, onDisk) = StateTestUtil.manifestRefsAndDisk(
      s"$state/labels", labelsT.latest.get._1)
    assert(onDisk == referenced,
      s"loop leaked garbage:\n disk=$onDisk\n ref=$referenced")

    // a fifth batch merges correctly under the grown hashing
    val s = spark
    import s.implicits._
    val extra = Seq((910001L, "a genuinely fresh maintenance doc"),
      (910002L, "a second fresh maintenance doc")).toDF("doc_id", "text")
    IngestStream.processBatch(extra, 4L, state, 3, None, maintain)
    val after = labelMap(labelsT.read().get)
    assert(after.keySet == want.keySet ++ Set(910001L, 910002L))

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("drift gate routes an alarmed batch to quarantine; redelivery after requalification publishes") {
    import graft.streaming.DriftMonitor
    import graft.streaming.IngestStream.{MaintainConfig, PublishConfig}
    import graft.text.QualityClassifier.Degradation
    val root = Files.createTempDirectory("ingest_drift").toString
    val d = Tables.load(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").localCheckpoint()
    val ref = d.filter(col("doc_id") % 2 === 0).select(col("doc_id"),
      Degradation.plant(col("doc_id"), col("text")).as("text"))
    val quiet = d.filter(col("doc_id") % 4 === 1).select(col("doc_id"),
      Degradation.plant(col("doc_id"), col("text")).as("text"))
      .localCheckpoint()
    val drifted = d.filter(col("doc_id") % 4 === 3).select(col("doc_id"),
      concat(col("text"), lit(Degradation.TailB)).as("text"))
      .localCheckpoint()
    val gate = DriftMonitor.GateConfig(
      DriftMonitor.referenceBins(ref, "doc_id", "text", nBins = 10),
      nBins = 10, alertAtPsiU = 200000L, alertAtUnseenU = 100000L)
    val state = s"$root/state"
    val dest = s"$root/shards"
    val cfg = Some(PublishConfig(dest, budget = 2048L))

    // the REAL streaming loop with the gate wired
    val feed = s"$root/feed"
    quiet.coalesce(1).write.parquet(s"$feed/b0.parquet")
    drifted.coalesce(1).write.parquet(s"$feed/b1.parquet")
    val q = IngestStream.start(spark.readStream.schema(quiet.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/*.parquet"),
      state, s"$root/chk", maxDist = 3, publish = cfg,
      maintain = MaintainConfig(compactEvery = 1), drift = Some(gate))
    try q.processAllAvailable() finally q.stop()

    // the cadence folds the gate's OWN logs too — monitor and
    // quarantine would otherwise grow one directory per batch, the
    // small-files problem the cadence exists to bound
    assert(IngestStream.gateMonitorTable(spark, state).readFanIn == 1)
    assert(IngestStream.quarantineTable(spark, state).readFanIn == 1)

    val quietIds = quiet.select("doc_id").collect().map(_.getLong(0)).toSet
    val driftIds = drifted.select("doc_id").collect().map(_.getLong(0)).toSet

    // margin guard: the planted split must clear the threshold with
    // ≥2x headroom on both sides, so a testdata regen that erodes it
    // fails HERE by name, not as an opaque oracle mismatch
    val mon = IngestStream.gateMonitorTable(spark, state).read().get
      .collect().map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(5)))
      .toMap
    assert(!mon(0L)._2 && mon(0L)._1 < 100000L,
      s"quiet batch psi_u ${mon(0L)._1} too close to the 200000 line")
    assert(mon(1L)._2 && mon(1L)._1 > 400000L,
      s"drifted batch psi_u ${mon(1L)._1} too close to the 200000 line")

    // routing: drifted ids whole in quarantine and NOWHERE downstream;
    // quiet ids published and absent from quarantine
    val quarIds = IngestStream.quarantineTable(spark, state).read().get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(quarIds == driftIds)
    val snapIds = IngestStream.snapTable(spark, state).read().get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val labelIds = IngestStream.labelsTable(spark, state).read().get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val pubIds = spark.read.parquet(dest)
      .select((col("pub_id") % 1000000000000L).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(snapIds == quietIds && labelIds == quietIds && pubIds == quietIds)

    // monitor → action → RECOVERY: redeliver the quarantined docs
    // (post-requalification, so no gate) — they were never in the
    // snapshot, so the loop treats them as ordinary new docs
    IngestStream.processBatch(
      IngestStream.quarantineTable(spark, state).read().get
        .select("doc_id", "text"),
      2L, state, 3, cfg, MaintainConfig(), None)
    val pubIds2 = spark.read.parquet(dest)
      .select((col("pub_id") % 1000000000000L).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(pubIds2 == quietIds ++ driftIds,
      "redelivered quarantined docs did not publish")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("drainQuarantine: pending re-enters the loop, retires idempotently, equals never-quarantined") {
    import graft.streaming.DriftMonitor
    import graft.streaming.IngestStream.{MaintainConfig, PublishConfig}
    import graft.text.QualityClassifier.Degradation
    val d = Tables.load(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").localCheckpoint()
    val ref = d.filter(col("doc_id") % 2 === 0).select(col("doc_id"),
      Degradation.plant(col("doc_id"), col("text")).as("text"))
      .localCheckpoint()
    val quiet = d.filter(col("doc_id") % 4 === 1).select(col("doc_id"),
      Degradation.plant(col("doc_id"), col("text")).as("text"))
      .localCheckpoint()
    val drifted = d.filter(col("doc_id") % 4 === 3).select(col("doc_id"),
      concat(col("text"), lit(Degradation.TailB)).as("text"))
      .localCheckpoint()
    val gate = DriftMonitor.GateConfig(
      DriftMonitor.referenceBins(ref, "doc_id", "text", nBins = 10),
      nBins = 10, alertAtPsiU = 200000L, alertAtUnseenU = 100000L)
    val root = Files.createTempDirectory("drain").toString
    def pub(p: String) = Some(PublishConfig(s"$p/shards", budget = 2048L))

    // A: the gate quarantines batch 1; the reference then refreshes
    // from the quarantined slice itself and the drain re-enters it
    val stateA = s"$root/a"
    IngestStream.processBatch(quiet, 0L, stateA, 3, pub(stateA),
      MaintainConfig(), Some(gate))
    IngestStream.processBatch(drifted, 1L, stateA, 3, pub(stateA),
      MaintainConfig(), Some(gate))
    val gate2 = DriftMonitor.GateConfig(
      DriftMonitor.referenceBins(
        IngestStream.quarantineTable(spark, stateA).read().get
          .select("doc_id", "text"), "doc_id", "text", nBins = 10),
      nBins = 10, alertAtPsiU = 200000L, alertAtUnseenU = 100000L)
    IngestStream.drainQuarantine(spark, stateA, drainBatchId = 2L,
      maxDist = 3, publish = pub(stateA), drift = Some(gate2))

    // B: never quarantined — the same docs as ordinary batches under
    // the SAME data-commit ids A used (0, then the drain's 2)
    val stateB = s"$root/b"
    IngestStream.processBatch(quiet, 0L, stateB, 3, pub(stateB))
    IngestStream.processBatch(drifted, 2L, stateB, 3, pub(stateB))

    def labels(p: String) = IngestStream.labelsTable(spark, p).read().get
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def snap(p: String) = IngestStream.snapTable(spark, p).read().get
      .select("doc_id", "fp")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    def shards(p: String) = spark.read.parquet(s"$p/shards")
      .select(col("pub_id"), col("n_tok"),
        col("shard_id").cast("long").as("shard_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(labels(stateA) == labels(stateB), "labels differ from never-quarantined")
    assert(snap(stateA) == snap(stateB), "snapshot differs from never-quarantined")
    assert(shards(stateA) == shards(stateB), "shards differ from never-quarantined")

    // retirement: the marker records the drained-through id and the
    // pending set is empty
    val qT = IngestStream.quarantineTable(spark, stateA)
    val drained = IngestStream.drainMarker(spark, stateA).read().get
      .agg(max("drained_through")).head.getLong(0)
    assert(drained == 1L)
    assert(qT.read().get.filter(col("batch_id") > drained).isEmpty)

    // replayed drain is a no-op end to end
    val verBefore = IngestStream.labelsTable(spark, stateA).latest
    val monBefore = IngestStream.gateMonitorTable(spark, stateA)
      .read().get.count()
    IngestStream.drainQuarantine(spark, stateA, drainBatchId = 2L,
      maxDist = 3, publish = pub(stateA), drift = Some(gate2))
    assert(IngestStream.labelsTable(spark, stateA).latest == verBefore)
    assert(IngestStream.gateMonitorTable(spark, stateA).read().get.count()
      == monBefore)

    // crash between the drain's data re-entry and its marker commit:
    // C replays A up to the quarantine, runs ONLY the re-entry half
    // (the kill point), then the replayed drain converges — data
    // no-ops, marker commits, final state equals A's
    val stateC = s"$root/c"
    IngestStream.processBatch(quiet, 0L, stateC, 3, pub(stateC),
      MaintainConfig(), Some(gate))
    IngestStream.processBatch(drifted, 1L, stateC, 3, pub(stateC),
      MaintainConfig(), Some(gate))
    IngestStream.processBatch(
      IngestStream.quarantineTable(spark, stateC).read().get
        .select("doc_id", "text"),
      2L, stateC, 3, pub(stateC), MaintainConfig(), Some(gate2))
    assert(IngestStream.drainMarker(spark, stateC).read().isEmpty)
    IngestStream.drainQuarantine(spark, stateC, drainBatchId = 2L,
      maxDist = 3, publish = pub(stateC), drift = Some(gate2))
    assert(labels(stateC) == labels(stateA))
    assert(shards(stateC) == shards(stateA))
    assert(IngestStream.drainMarker(spark, stateC).read().get
      .agg(max("drained_through")).head.getLong(0) == 1L)

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("conflicting texts for one doc_id in a batch resolve deterministically (smallest digest wins)") {
    val s = spark
    import s.implicits._
    val rootA = Files.createTempDirectory("ingest_tieA").toString
    val rootB = Files.createTempDirectory("ingest_tieB").toString
    val tA = "alpha text variant"
    val tB = "beta text variant"
    val winner = Seq(tA, tB).minBy(t => java.security.MessageDigest
      .getInstance("MD5").digest(t.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
    // same conflicting batch, both row orders → identical stored fp
    for ((root, rows) <- Seq(rootA -> Seq(7L -> tA, 7L -> tB),
                             rootB -> Seq(7L -> tB, 7L -> tA))) {
      val batch = rows.toDF("doc_id", "text").repartition(2)
      IngestStream.processBatch(batch, 0L, s"$root/state", maxDist = 3)
      val snap = IngestStream.snapTable(spark, s"$root/state").read().get
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val wantFp = java.security.MessageDigest.getInstance("MD5")
        .digest(winner.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(snap == Map(7L -> wantFp),
        s"snapshot fp must be the smallest-digest text's, got $snap")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(rootA))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(rootB))
  }

  test("forget: surviving labels equal from-scratch over survivors; snapshot/index/shards redacted; manifest is the untouched assignment ledger; replay no-op; re-ingest re-admits") {
    import graft.streaming.IngestStream.PublishConfig
    val root = Files.createTempDirectory("ingest_forget").toString
    val d = Tables.load(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").filter(col("doc_id") % 2 === 0)
      .localCheckpoint()
    val state = s"$root/state"
    val dest = s"$root/shards"
    val pub = Some(PublishConfig(dest, budget = 2048L))
    IngestStream.processBatch(d.filter(col("doc_id") % 3 === 0), 0L,
      state, 3, pub)
    IngestStream.processBatch(d.filter(col("doc_id") % 3 =!= 0), 1L,
      state, 3, pub)
    def manifest() = IngestStream.publishManifest(spark, state).read().get
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val manBefore = manifest()

    val gone = d.filter(col("doc_id") % 5 === 0).select("doc_id")
    val goneIds = gone.collect().map(_.getLong(0)).toSet
    val survIds = d.select("doc_id").collect().map(_.getLong(0))
      .toSet -- goneIds
    assert(goneIds.nonEmpty && survIds.nonEmpty, "degenerate fixture")
    IngestStream.forget(spark, state, gone, 2L, 3, Some(dest))

    // labels are the from-scratch clustering of the survivor corpus
    val surv = d.filter(col("doc_id") % 5 =!= 0)
    val want = labelMap(
      Clusters.simhashClusters(surv, "doc_id", "text", maxDist = 3))
    assert(labelMap(
      IngestStream.labelsTable(spark, state).read().get) == want)
    // snapshot + fp index hold exactly the survivors
    def idsOf(t: graft.streaming.AppendTable) =
      t.read().get.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(idsOf(IngestStream.snapTable(spark, state)) == survIds)
    assert(idsOf(IngestStream.fpsTable(spark, state)) == survIds)
    // shard files hold no forgotten pub id; the manifest (assignment
    // ledger) is byte-for-byte what it was
    def pubDocIds() = spark.read.parquet(dest)
      .select((col("pub_id") % 1000000000000L).as("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(pubDocIds() == survIds)
    assert(manifest() == manBefore,
      "forget must not rewrite the assignment manifest")
    // the ledger records exactly the forgotten ids under the forget id
    val ledger = IngestStream.forgetLedger(spark, state).read().get
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(ledger == goneIds.map(_ -> 2L))

    // a replayed COMPLETED forget is a no-op (the ledger gate)
    val vLabels = IngestStream.labelsTable(spark, state).latest.get
    val ctSnap = IngestStream.snapTable(spark, state).compactedThrough
    IngestStream.forget(spark, state, gone, 2L, 3, Some(dest))
    assert(IngestStream.labelsTable(spark, state).latest.get == vLabels)
    assert(IngestStream.snapTable(spark, state).compactedThrough == ctSnap)

    // forget ≠ ban: a later legitimate re-delivery re-ingests as
    // ordinary new docs and the labeling converges to the full corpus
    IngestStream.processBatch(
      d.filter(col("doc_id") % 5 === 0).select("doc_id", "text"), 3L,
      state, 3, pub)
    val wantAll = labelMap(
      Clusters.simhashClusters(d, "doc_id", "text", maxDist = 3))
    assert(labelMap(
      IngestStream.labelsTable(spark, state).read().get) == wantAll)
    assert(pubDocIds() == survIds ++ goneIds)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("withoutForgotten is the ban composition: forgotten ids are dropped ahead of the loop, everything else admits") {
    import graft.streaming.IngestStream.PublishConfig
    val root = Files.createTempDirectory("ingest_ban").toString
    val d = Tables.load(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").filter(col("doc_id") % 4 === 3)
      .localCheckpoint()
    val state = s"$root/state"
    IngestStream.processBatch(d, 0L, state, 3)
    val gone = d.filter(col("doc_id") % 7 === 0).select("doc_id")
    val goneIds = gone.collect().map(_.getLong(0)).toSet
    assert(goneIds.nonEmpty, "degenerate fixture")
    IngestStream.forget(spark, state, gone, 1L)
    // redeliver the WHOLE corpus through the ban filter: forgotten
    // ids never re-enter, the rest (already snapshotted) no-op —
    // final state is exactly the survivor clustering
    IngestStream.processBatch(
      IngestStream.withoutForgotten(d, state), 2L, state, 3)
    val surv = d.filter(col("doc_id") % 7 =!= 0)
    val want = labelMap(
      Clusters.simhashClusters(surv, "doc_id", "text", maxDist = 3))
    assert(labelMap(
      IngestStream.labelsTable(spark, state).read().get) == want)
    val snapIds = IngestStream.snapTable(spark, state).read().get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((snapIds intersect goneIds).isEmpty && snapIds.nonEmpty)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("candidateShards: manifest zone pruning is epoch-aware and conservative") {
    // shard 0: epoch-1 pubs of docs 0..999; shard 1: docs 1000..1999;
    // shard 2 STRADDLES the epoch-1→2 boundary (its residue window
    // under epoch 1 is huge — conservatism, not a bug)
    val E = 1000000000000L
    val ranges = Array((0L, E, E + 999L), (1L, E + 1000L, E + 1999L),
      (2L, E + 2000L, 2 * E + 50L))
    def cand(ids: Long*) =
      IngestStream.candidateShards(ranges, ids.toArray.sorted)
    // doc 5 fits shard 0 under epoch 1 AND the straddler under
    // epoch 2 (pub 2E+5 ≤ 2E+50) — both kept, the exact semi-join
    // decides; doc 1500 fits only shard 1 (the straddler's epoch-2
    // window ends at residue 50, its epoch-1 window starts at 2000)
    assert(cand(5L) == Seq(0L, 2L))
    assert(cand(1500L) == Seq(1L))
    assert(cand(60L) == Seq(0L))
    assert(cand(2500L) == Seq(2L))
    assert(cand(5L, 1500L, 30L) == Seq(0L, 1L, 2L))
    assert(IngestStream.candidateShards(ranges, Array.empty[Long]).isEmpty)
  }

  test("forget splits a cluster whose connectivity ran through the forgotten bridge doc") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("ingest_bridge").toString
    val (p, q, r) = IngestStreamSpec.bridgeTokens()
    // A={p}, C={q}: hamming 6 apart — NOT near-dups; B={p,q,r}: the
    // majority fingerprint sits exactly 3 from each — the bridge
    val batch = Seq(1L -> p, 2L -> q, 3L -> s"$p $q $r")
      .toDF("doc_id", "text")
    val state = s"$root/state"
    IngestStream.processBatch(batch, 0L, state, maxDist = 3)
    val before = labelMap(
      IngestStream.labelsTable(spark, state).read().get)
    assert(before == Map(1L -> (1L, 3L), 2L -> (1L, 3L), 3L -> (1L, 3L)),
      s"bridge fixture must form one 3-cluster, got $before")
    IngestStream.forget(spark, state, Seq(3L).toDF("doc_id"), 1L)
    val after = labelMap(
      IngestStream.labelsTable(spark, state).read().get)
    assert(after == Map(1L -> (1L, 1L), 2L -> (2L, 1L)),
      s"forgetting the bridge must split the cluster, got $after")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}

object IngestStreamSpec {
  /** Deterministic search for a BRIDGE fixture in the engine's own
    * fingerprint space: single-token docs fingerprint to the token's
    * 32-bit md5 value, a 3-distinct-token doc to the bitwise majority
    * — so tokens (p, q) at hamming exactly 6 plus an r whose tie-break
    * puts the majority exactly 3 from each give a connectivity chain
    * A–B–C with no A–C edge, the topology only a bridge doc holds
    * together.
    */
  private[graft] def bridgeTokens(): (String, String, String) = {
    def h32(t: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 8), 16)
    val toks = (0 until 3000).map(i => s"w$i")
    val hs = toks.map(h32)
    for (i <- toks.indices; j <- (i + 1) until toks.size) {
      if (java.lang.Long.bitCount(hs(i) ^ hs(j)) == 6) {
        for (k <- toks.indices if k != i && k != j) {
          // majority of {hi, hj, hk}: agreeing bits of hi,hj win; the
          // 6 disagreeing bits go to hk's side
          val agree = ~(hs(i) ^ hs(j)) & 0xffffffffL
          val maj = (agree & hs(i)) | (~agree & 0xffffffffL & hs(k))
          if (java.lang.Long.bitCount(maj ^ hs(i)) == 3 &&
              java.lang.Long.bitCount(maj ^ hs(j)) == 3)
            return (toks(i), toks(j), toks(k))
        }
      }
    }
    sys.error("no bridge triple in the first 3000 tokens — widen the search")
  }
}
