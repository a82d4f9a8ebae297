package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.schema.{EventRow, OutboxEntry, RawPost}
import graft.state.OutboxRetry

/** Minimal Delta-style table: versioned parquet snapshots + an
  * atomically-replaced pointer file recording (version, batchId).
  * `commit` is IDEMPOTENT per streaming batch — replaying a batch whose
  * id is already committed is a no-op, which together with Structured
  * Streaming's checkpointed offsets gives exactly-once table contents
  * over restarts (the same txn-log idea Delta/Iceberg implement; at
  * cluster scale swap this class for a real lakehouse MERGE, the sink
  * code above it is unchanged).
  */
final class SnapshotTable(spark: SparkSession, path: String) {

  private val ptrPath = Paths.get(path, "_LATEST")

  /** (snapshot version, last committed streaming batch id). */
  def latest: Option[(Long, Long)] = pointer().map(p => (p._1, p._2))

  /** Adds the live schema version (third field; 0 in pre-evolution
    * pointers — see [[TableSchema]]).
    */
  private def pointer(): Option[(Long, Long, Long)] =
    if (!Files.exists(ptrPath)) None
    else {
      val f = new String(Files.readAllBytes(ptrPath),
        StandardCharsets.UTF_8).trim.split(",")
      Some((f(0).toLong, f(1).toLong,
        if (f.length >= 3) f(2).toLong else 0L))
    }

  def read(): Option[DataFrame] = pointer().map { case (v, _, m) =>
    val base = spark.read.parquet(s"$path/v_$v")
    TableSchema.applyTo(base, TableSchema.read(path, m))
  }

  def lastBatchId: Long = latest.map(_._2).getOrElse(-1L)

  /** Live schema version — 0 until an [[addColumn]] commits one. */
  def schemaVersion: Long = pointer().map(_._3).getOrElse(0L)

  /** ADDITIVE migration, the [[BucketedTable.addColumn]] contract on
    * the snapshot layout: the current snapshot FILE is not rewritten —
    * it reads through the declared default until the next `commit`
    * lands a fresh snapshot carrying the column. Side file first
    * (orphan), one atomic pointer move, idempotent per column name.
    */
  def addColumn(name: String, dataType: String, defaultSql: String): Unit = {
    val entry = pointer()
    val (v, batchId, m) = entry.getOrElse(throw new
      IllegalStateException(s"SnapshotTable.addColumn($name): migrate " +
        s"after the first commit — $path has none"))
    val cols = TableSchema.read(path, m)
    if (cols.exists(_.name == name)) return // idempotent
    TableSchema.validate(spark, name, dataType, defaultSql)
    TableSchema.write(path, m + 1,
      cols :+ TableSchema.AddedColumn(name, dataType, defaultSql),
      "migrate")
    guardUnmoved(entry, "migrate")(_._3 >= m + 1) {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$path/columns_v${m + 1}"))
    }
    writePointer(v, batchId, m + 1, "migrate")
  }

  /** Lost-update detection, the [[BucketedTable]] contract on the
    * snapshot layout ([[ConcurrentWriteException]]): fail NAMED when
    * the pointer moved since op entry — `torn` when the competing
    * writer claimed the same version/file name this op was writing,
    * clean abort (orphans removed, retry) otherwise.
    */
  private def guardUnmoved(expected: Option[(Long, Long, Long)],
      op: String)(torn: ((Long, Long, Long)) => Boolean)(
      cleanup: => Unit): Unit = {
    val now = pointer()
    if (now == expected) return
    if (now.exists(torn))
      throw new ConcurrentWriteException(
        s"SnapshotTable.$op: another writer claimed the version this " +
          s"operation was writing at $path (pointer $expected → $now) — " +
          "its contents are undefined; the tables are single-writer by " +
          "contract, restore from a retained version")
    cleanup
    throw new ConcurrentWriteException(
      s"SnapshotTable.$op: the pointer at $path moved $expected → $now " +
        "while the operation was in flight — another writer is active; " +
        "this operation aborted cleanly (its orphans removed), retry " +
        "it; the tables are single-writer by contract")
  }

  private def writePointer(v: Long, batchId: Long, schemaV: Long,
      op: String): Unit = {
    val tmp = Paths.get(path, s"_LATEST.tmp.$batchId")
    Files.createDirectories(Paths.get(path))
    Failpoints.step(s"$op.pointer.tmp")
    Files.write(tmp,
      s"$v,$batchId,$schemaV".getBytes(StandardCharsets.UTF_8))
    Failpoints.step(s"$op.pointer.move")
    Files.move(tmp, ptrPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Write a full new snapshot unless `batchId` already committed. */
  def commit(df: DataFrame, batchId: Long): Unit = {
    if (lastBatchId >= batchId) return // replayed batch → no-op
    val p = pointer()
    val v = p.map(_._1 + 1).getOrElse(0L)
    val m = p.map(_._3).getOrElse(0L)
    Failpoints.step("snapshot.data")
    // pre-write check avoids clobbering a competing claim of v_<v>;
    // the post-write check closes the window the write itself opens
    guardUnmoved(p, "commit")(_._1 >= v)(())
    df.write.mode(SaveMode.Overwrite).parquet(s"$path/v_$v")
    guardUnmoved(p, "commit")(_._1 >= v) {
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$path/v_$v"))
    }
    writePointer(v, batchId, m, "snapshot")
  }

  /** Snapshot versions still on disk — every commit IS a full
    * snapshot, so each retained version is independently readable;
    * [[vacuum]] trims the horizon (without it a per-batch committer
    * like the outbox leaks one snapshot directory per batch forever).
    */
  def versions: Seq[Long] = pointer() match {
    case None => Seq.empty
    case Some((v, _, _)) =>
      // list once, O(live snapshots) — a per-batch committer's id
      // space grows forever, so never probe per historical id
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("v_"))
        .map(_.getName.stripPrefix("v_").toLong)
        .filter(_ <= v).sorted.toSeq
  }

  /** Time travel, the [[BucketedTable.readAt]] contract on the
    * snapshot layout: the snapshot AS OF `version`, read through the
    * LIVE schema; fails NAMED when out of range or vacuumed.
    */
  /** The named totality check behind [[readAt]] and [[restore]]. */
  private def retainedDir(version: Long, op: String): String = {
    val v = pointer().map(_._1).getOrElse(throw new IllegalStateException(
      s"SnapshotTable.$op($version): $path has no committed version"))
    require(version >= 0 && version <= v,
      s"SnapshotTable.$op($version): version out of range [0, $v]")
    if (!new java.io.File(s"$path/v_$version").isDirectory)
      throw new IllegalStateException(
        s"SnapshotTable.$op($version): v_$version is gone — the " +
          "version was vacuumed; raise the keepVersions horizon to " +
          "read further back")
    s"$path/v_$version"
  }

  def readAt(version: Long): Option[DataFrame] = {
    val dir = retainedDir(version, "readAt")
    Some(TableSchema.applyTo(spark.read.parquet(dir),
      TableSchema.read(path, pointer().map(_._3).getOrElse(0L))))
  }

  /** RESTORE, the [[BucketedTable.restore]] contract on the snapshot
    * layout: copy the retained snapshot forward as a NEW version (the
    * bad version stays readable evidence; the batch gate does not
    * move). The raw files are copied — [[read]] applies the live
    * schema's defaults at read time exactly as it does for any
    * pre-migration snapshot.
    */
  def restore(version: Long): Unit = {
    val entry = pointer()
    entry.foreach { case (v, batchId, m) =>
      if (version == v) return
      val dir = retainedDir(version, "restore")
      Failpoints.step("restore.data")
      guardUnmoved(entry, "restore")(_._1 >= v + 1)(())
      spark.read.parquet(dir)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/v_${v + 1}")
      guardUnmoved(entry, "restore")(_._1 >= v + 1) {
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$path/v_${v + 1}"))
      }
      writePointer(v + 1, batchId, m, "restore")
    }
  }

  /** Change feed between two retained snapshots, keyed by `keyCol`
    * (a parameter — the snapshot layout is schema-agnostic): the
    * shared [[StateDiff]] classification over both snapshots read
    * WHOLE. The layout rewrites every commit, so there is nothing to
    * prune — cost is both snapshots; use the bucketed store when
    * feed cost must be ∝ delta.
    */
  def changesBetween(vFrom: Long, vTo: Long, keyCol: String): DataFrame = {
    require(vFrom <= vTo,
      s"SnapshotTable.changesBetween($vFrom, $vTo): vFrom must be ≤ vTo")
    val f = readAt(vFrom)
    val t = readAt(vTo)
    StateDiff.classify(f, t, keyCol, t.orElse(f).get)
  }

  /** Named tag pinning a snapshot against [[vacuum]] — the
    * [[BucketedTable.tag]] contract on the snapshot layout.
    */
  def tag(name: String, version: Long): Unit = {
    retainedDir(version, "tag")
    TagFiles.write(path, name, version)
  }

  /** Every tag → pinned snapshot version. */
  def tags: Map[String, Long] = TagFiles.all(path)

  /** Release a tag; the next [[vacuum]] may collect the snapshot. */
  def untag(name: String): Unit = TagFiles.remove(path, name)

  /** Delete every snapshot older than the last `keepVersions` (tagged
    * snapshots retained regardless) — no pointer write, retained
    * reads total at every kill boundary, a vacuumed version fails
    * [[readAt]] NAMED. The GC the per-batch outbox committer needs
    * to not leak one directory per batch.
    */
  def vacuum(keepVersions: Int): Unit = {
    require(keepVersions >= 1, s"keepVersions must be ≥ 1: $keepVersions")
    pointer().foreach { case (v, _, _) =>
      val retainFrom = math.max(0L, v - keepVersions + 1)
      val tagged = tags.values.toSet
      // list once: the delete set is O(what exists), not O(lifetime
      // batch count) — this runs on the sink's maintenance tick
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("v_"))
        .map(f => (f.getName.stripPrefix("v_").toLong, f))
        .filter { case (u, _) => u < retainFrom && !tagged.contains(u) }
        .sortBy(_._1)
        .foreach { case (u, f) =>
          Failpoints.step(s"vacuum.dir.v_$u")
          org.apache.commons.io.FileUtils.deleteQuietly(f)
        }
    }
  }
}

/** S7/S8/A10 — the real sink wiring: the streaming event upsert lands
  * in a versioned events table via an idempotent `foreachBatch` MERGE,
  * every upsert enqueues an outbox entry, and each batch runs one
  * delivery pass (OutboxRetry.step) plus DLQ recovery
  * (OutboxRetry.recover) against the outbox table — the reference's
  * worker/jobs/outbox_retry.py:17-244 / outbox_dlq_recover.py:31-96
  * loop expressed as per-batch set transformations.
  */
object EventSink {

  /** The events table is an id-bucketed [[BucketedTable]] since round
    * 11: a micro-batch's MERGE reads only the buckets its keys hash
    * into ([[BucketedTable.readKeys]]) and rewrites only those — both
    * sides ∝ batch, the same write-shape contract as the ingest
    * loop's label store (IngestStreamSpec's files-touched bound; the
    * events analogue is pinned in StreamingSpec). The OUTBOX stays a
    * full snapshot deliberately: its per-batch step is a pass over
    * every due row (the reference's retry-loop semantics), so its
    * state is ∝ undelivered backlog, not ∝ corpus — at scale the done
    * rows would be partition-pruned by status, which the snapshot
    * stand-in does not model.
    */
  def eventsTable(spark: SparkSession, path: String): BucketedTable =
    new BucketedTable(spark, path, "eventKey", 16)

  /** Bucket-growth maintenance for the events store — the sink-side
    * analogue of [[IngestStream.MaintainConfig]]: every `every`
    * committed batches, if the table holds more than
    * maxRowsPerBucket·currentBuckets rows, [[BucketedTable.rebucket]]
    * doubles the bucket count, keeping the per-commit MERGE rewrite
    * ∝ batch as the event corpus grows (16 is only the bootstrap
    * count; the live count rides in the table's pointer). The trigger
    * probe is one count(), amortized over the cadence, never on the
    * per-batch path. `vacuumKeepVersions > 0` additionally
    * [[BucketedTable.vacuum]]s the store to its last k versions on
    * the same cadence — the GC of superseded bucket directories, with
    * k the sink's time-travel/change-feed retention horizon.
    */
  final case class EventsMaintain(every: Int = 0,
      maxRowsPerBucket: Long = 0L,
      vacuumKeepVersions: Int = 0) {
    // same loud rejection as IngestStream.MaintainConfig: a target
    // without a cadence would silently never fire
    require(maxRowsPerBucket == 0L || every > 0,
      "maxRowsPerBucket needs a cadence: set every > 0")
    require(vacuumKeepVersions == 0 || every > 0,
      "vacuumKeepVersions needs a cadence: set every > 0")
    def due(batchId: Long): Boolean =
      every > 0 && (maxRowsPerBucket > 0 || vacuumKeepVersions > 0) &&
        (batchId + 1) % every == 0
  }

  /** MERGE semantics for the events table (A10 versioned upsert):
    * keep the row with the HIGHEST version per key — a replayed or
    * out-of-order update can never clobber newer state (reference
    * guards its UPDATE with `version = :expected` CAS; highest-wins is
    * the idempotent batch equivalent).
    */
  def mergeEvents(current: Option[DataFrame], updates: DataFrame): DataFrame = {
    val all = current.map(_.unionByName(updates)).getOrElse(updates)
    val w = Window.partitionBy("eventKey")
      .orderBy(col("version").desc, col("lastUs").desc)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** One outbox entry per upserted (key, version): deterministic id so
    * replays collide instead of duplicating (D6 idempotency keys).
    */
  def outboxEntriesFor(updates: DataFrame): DataFrame =
    updates.select(
      xxhash64(col("eventKey"), col("version")).as("id"),
      col("eventKey"),
      to_json(struct(col("eventKey"), col("version"),
        col("evidenceCount"))).as("payloadJson"),
      lit("pending").as("status"),
      lit(0).as("attempt"),
      col("lastUs").as("nextTryUs"),
      lit("").as("lastError"),
      col("lastUs").as("createdUs"),
      col("lastUs").as("updatedUs"))

  /** Apply one delivery attempt + DLQ recovery to the outbox table.
    * `deliver` decides an attempt's outcome (the network call in the
    * reference); runs as a typed map over the due rows.
    */
  def stepOutbox(spark: SparkSession, outbox: DataFrame, nowUs: Long,
      deliver: OutboxEntry => Boolean, dlqMinAgeUs: Long): DataFrame = {
    import spark.implicits._
    outbox.as[OutboxEntry].map { e =>
      val afterStep =
        if (OutboxRetry.isDue(e, nowUs)) OutboxRetry.step(e, deliver(e), nowUs)
        else e
      OutboxRetry.recover(afterStep, nowUs, dlqMinAgeUs)
    }.toDF()
  }

  /** Start the full pipeline: posts stream → dedup → keyed upsert →
    * foreachBatch MERGE into `eventsPath` + outbox enqueue/step into
    * `outboxPath`, checkpointed at `checkpoint`.
    */
  /** One micro-batch of the sink, idempotent PER TABLE: a crash
    * between the events commit and the outbox commit leaves the two
    * tables at different batch ids, and the replayed batch must then
    * skip the already-committed events MERGE while still applying the
    * outbox step — a single shared guard would silently drop the
    * outbox's batch forever (exercised in StreamingSpec).
    */
  def processBatch(batch: Dataset[EventRow], batchId: Long,
      eventsPath: String, outboxPath: String,
      deliver: OutboxEntry => Boolean, dlqMinAgeUs: Long): Unit =
    processBatch(batch, batchId, eventsPath, outboxPath, deliver,
      dlqMinAgeUs, EventsMaintain())

  def processBatch(batch: Dataset[EventRow], batchId: Long,
      eventsPath: String, outboxPath: String,
      deliver: OutboxEntry => Boolean, dlqMinAgeUs: Long,
      maintain: EventsMaintain): Unit = {
    val spark = batch.sparkSession
    val eventsT = eventsTable(spark, eventsPath)
    val outboxTable = new SnapshotTable(spark, outboxPath)
    def runMaintenance(): Unit = if (maintain.due(batchId)) {
      if (maintain.maxRowsPerBucket > 0)
        eventsT.growIfOversized(maintain.maxRowsPerBucket)
      // GC last — a rebucket already collected everything this tick.
      // The outbox snapshots on the same horizon: it commits EVERY
      // batch, so unvacuumed it leaks one directory per batch.
      if (maintain.vacuumKeepVersions > 0) {
        eventsT.vacuum(maintain.vacuumKeepVersions)
        outboxTable.vacuum(maintain.vacuumKeepVersions)
      }
    }
    val replayEvents = eventsT.lastBatchId >= batchId
    val replayOutbox = outboxTable.lastBatchId >= batchId
    if ((replayEvents && replayOutbox) || batch.isEmpty) {
      runMaintenance() // idempotent; honors the cadence on replay too
      return
    }

    // one update row per key: the stream emits one EventRow per key
    // per trigger, but a replayed+reprocessed batch could carry
    // several — keep the newest
    val updates = mergeEvents(None, batch.toDF()).localCheckpoint()
    if (!replayEvents)
      // ∝-batch MERGE: highest-version-wins runs over ONLY the prior
      // rows of the buckets the batch's keys hash into, and only
      // those buckets are rewritten — mergeEvents IS the resolve
      // function, so the commit costs one pruned read + one write
      eventsT.mergeResolve(updates, batchId)(mergeEvents)

    if (!replayOutbox) {
      // outbox: enqueue new entries (id collision = already enqueued →
      // existing row wins), then run one delivery + recovery pass over
      // everything due
      val enqueued = outboxEntriesFor(updates)
      val all = outboxTable.read() match {
        case Some(cur) =>
          val w = Window.partitionBy("id").orderBy(col("__new").asc)
          cur.withColumn("__new", lit(0))
            .unionByName(enqueued.withColumn("__new", lit(1)))
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__new", "__rn")
        case None => enqueued
      }
      val nowUs = updates.agg(max("lastUs")).head().getLong(0)
      outboxTable.commit(
        stepOutbox(spark, all, nowUs, deliver, dlqMinAgeUs), batchId)
    }
    runMaintenance()
  }

  def start(posts: Dataset[RawPost], eventsPath: String, outboxPath: String,
      checkpoint: String, trigger: Trigger = Trigger.AvailableNow(),
      deliver: OutboxEntry => Boolean = _ => true,
      dlqMinAgeUs: Long = 3600L * 1000000L,
      // measurement hook (StreamBench per-event latency): invoked with
      // (batchId, wall-clock µs) AFTER both table commits are durable
      onBatchCommit: (Long, Long) => Unit = (_, _) => (),
      maintain: EventsMaintain = EventsMaintain()): StreamingQuery =
    PostPipeline.eventStream(posts).writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[EventRow], batchId: Long) =>
        processBatch(batch, batchId, eventsPath, outboxPath, deliver,
          dlqMinAgeUs, maintain)
        onBatchCommit(batchId, System.currentTimeMillis() * 1000L)
      }
      .start()
}
