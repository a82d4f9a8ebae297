package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** ∝-batch state tables for the streaming ingest loop (round-10
  * verdict item 1): [[SnapshotTable]]'s full-snapshot rewrite made the
  * per-commit WRITE cost proportional to the corpus; these two layouts
  * make it proportional to the batch while keeping the same
  * batch-id-idempotent, crash-replayable pointer contract
  * (atomically-replaced `_LATEST`, deterministic replay).
  *
  * Both are the sandbox stand-in for a lakehouse table — what they
  * prove is the WRITE SHAPE (files touched per commit ∝ batch,
  * asserted by IngestStreamSpec), which is exactly the property a
  * Delta/Iceberg `MERGE`/append gives at cluster scale. Swapping them
  * for a real table format changes no caller code.
  */

/** Append-only table: each commit lands ONE new directory `b_<batchId>`
  * holding only that batch's rows; a read unions every committed
  * directory. Crash between the data write and the pointer move leaves
  * an orphan directory that the replay OVERWRITES (deterministic
  * layout), and a replayed batch id is a no-op — the
  * [[SnapshotTable.commit]] contract with ∝-batch bytes.
  *
  * Requires monotonically increasing batch ids (Structured Streaming's
  * foreachBatch guarantee): `read()` only surfaces directories with
  * id ≤ the committed pointer, so the orphan of a crashed future batch
  * is invisible until its own commit.
  *
  * Read amplification is bounded by [[compact]] — the lakehouse's
  * background job, here as a crash-safe method: all committed batch
  * directories fold into one consolidated directory `k_<through>`
  * referenced from the pointer's second line, after which `read()`
  * unions the consolidated dir with only the batches appended since.
  * Compaction never changes the per-commit write bound; it trades one
  * deliberate full rewrite for O(1) read fan-in, on whatever cadence
  * the operator chooses.
  */
final class AppendTable(spark: SparkSession, path: String) {

  private val ptrPath = Paths.get(path, "_LATEST")

  /** (last committed batch id, compacted-through id or −1). */
  private def pointer(): (Long, Long) =
    if (!Files.exists(ptrPath)) (-1L, -1L)
    else {
      val lines = new String(Files.readAllBytes(ptrPath),
        StandardCharsets.UTF_8).trim.linesIterator.toSeq
      val last = lines.head.toLong
      val ct = lines.collectFirst {
        case l if l.startsWith("compact=") => l.stripPrefix("compact=").toLong
      }.getOrElse(-1L)
      (last, ct)
    }

  private def writePointer(last: Long, compactedThrough: Long): Unit = {
    val body =
      if (compactedThrough < 0) last.toString
      else s"$last\ncompact=$compactedThrough"
    val tmp = Paths.get(path, s"_LATEST.tmp.$last")
    Files.createDirectories(Paths.get(path))
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, ptrPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def lastBatchId: Long = pointer()._1

  /** Committed data dirs: the consolidated dir (if any) + batch dirs
    * appended after it, up to the pointer. Stale pre-compaction batch
    * dirs (a crash between the pointer move and their deletion) are
    * EXCLUDED by the `> ct` filter — their rows live in `k_<ct>`.
    */
  private def committedDirs(): Seq[String] = {
    val (last, ct) = pointer()
    val d = new java.io.File(path)
    val batches = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("b_"))
      .map(f => (f.getName.stripPrefix("b_").toLong, f.getAbsolutePath))
      .filter { case (id, _) => id > ct && id <= last }
      .sortBy(_._1)
      .map(_._2)
      .toSeq
    val compacted =
      if (ct >= 0 && new java.io.File(s"$path/k_$ct").isDirectory)
        Seq(s"$path/k_$ct")
      else Seq.empty
    compacted ++ batches
  }

  def read(): Option[DataFrame] = {
    val dirs = committedDirs()
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** Append `df` as batch `batchId`; replayed ids are a no-op. */
  def append(df: DataFrame, batchId: Long): Unit = {
    val (last, ct) = pointer()
    if (last >= batchId) return
    df.write.mode(SaveMode.Overwrite).parquet(s"$path/b_$batchId")
    writePointer(batchId, ct)
  }

  /** Fold every committed directory into ONE consolidated dir.
    * Crash-safe: the consolidated data lands under `k_<last>` first
    * (an orphan until the pointer names it), the pointer move is
    * atomic, and old directories are deleted only afterwards — a
    * crash at any point leaves `read()` correct (stale dirs are
    * filtered by the compacted-through id, orphan `k_` dirs are
    * never referenced). Idempotent when already compacted to `last`.
    */
  def compact(): Unit = {
    val (last, ct) = pointer()
    if (last < 0 || ct == last) return
    val dirs = committedDirs()
    if (dirs.isEmpty) return
    spark.read.parquet(dirs: _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/k_$last")
    writePointer(last, last)
    // cleanup AFTER the pointer is durable; best-effort — leftovers
    // are invisible and re-collected by the next compact
    val d = new java.io.File(path)
    Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
      val n = f.getName
      val stale =
        (n.startsWith("b_") && n.stripPrefix("b_").toLong <= last) ||
          (n.startsWith("k_") && n != s"k_$last")
      if (f.isDirectory && stale)
        org.apache.commons.io.FileUtils.deleteQuietly(f)
    }
  }
}

/** Id-bucketed MERGE table: rows live in `nBuckets` hash buckets of
  * `keyCol`; a commit takes only the CHANGED rows (new or updated),
  * rewrites only the buckets they land in, and carries every untouched
  * bucket forward BY REFERENCE in a versioned manifest — so the bytes
  * written per commit are ∝ (changed rows + the prior contents of
  * their buckets), never ∝ corpus. With bucket count scaled to the
  * corpus (the standard lakehouse bucketing knob) the prior-contents
  * term is itself ∝ batch in expectation.
  *
  * Layout:
  * {{{
  *   path/c_<v>/__bucket=<k>/   rewritten buckets of commit v
  *   path/manifest_v<v>         lines "<bucket>,<relative dir>"
  *   path/_LATEST               "<v>,<batchId>"   (atomic move)
  * }}}
  *
  * Determinism/crash contract: the next version number and the set of
  * rewritten buckets are pure functions of (prior pointer, batch), so
  * a crash after the data write but before the pointer move is healed
  * by the replay overwriting the same `c_<v>` directory and manifest;
  * a replayed batch id is a no-op. Rows are upserted by `keyCol`
  * (changed rows replace same-key rows; deletes are out of scope — the
  * label store only ever adds or relabels).
  */
final class BucketedTable(spark: SparkSession, path: String,
    keyCol: String, nBuckets: Int) {
  require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")

  private val ptrPath = Paths.get(path, "_LATEST")

  /** (manifest version, last committed streaming batch id). */
  def latest: Option[(Long, Long)] =
    if (!Files.exists(ptrPath)) None
    else {
      val Array(v, b) =
        new String(Files.readAllBytes(ptrPath), StandardCharsets.UTF_8)
          .trim.split(",")
      Some((v.toLong, b.toLong))
    }

  def lastBatchId: Long = latest.map(_._2).getOrElse(-1L)

  private def bucketOf(c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c), lit(nBuckets.toLong))

  /** bucket → relative data dir, from manifest version `v`. */
  private def manifest(v: Long): Map[Long, String] =
    new String(Files.readAllBytes(Paths.get(path, s"manifest_v$v")),
      StandardCharsets.UTF_8)
      .linesIterator.filter(_.nonEmpty).map { line =>
        val i = line.indexOf(',')
        line.substring(0, i).toLong -> line.substring(i + 1)
      }.toMap

  def read(): Option[DataFrame] = latest.flatMap { case (v, _) =>
    val dirs = manifest(v).values.toSeq.distinct.map(rel => s"$path/$rel")
    if (dirs.isEmpty) None // every bucket emptied by resolves
    else Some(spark.read.parquet(dirs: _*))
  }

  /** The stored rows whose key is in `keys` (one column, `keyCol`),
    * reading ONLY the buckets those keys hash into — the ∝-batch
    * point-lookup side of a MERGE (a lakehouse's dynamic partition
    * pruning). `keys` must be bounded (a batch's key set): it is
    * collected to prune the bucket list and broadcast for the
    * semi-join.
    */
  def readKeys(keys: DataFrame): Option[DataFrame] = latest.flatMap {
    case (v, _) =>
      val m = manifest(v)
      val touched = keys.select(bucketOf(col(keyCol)).as("__bucket"))
        .distinct().collect().map(_.getLong(0)).toSet
      val dirs = touched.toSeq.sorted.flatMap(m.get).distinct
        .map(rel => s"$path/$rel")
      if (dirs.isEmpty) None
      else Some(spark.read.parquet(dirs: _*)
        .join(broadcast(keys.select(col(keyCol)).distinct()),
          Seq(keyCol), "left_semi"))
  }

  /** Upsert `changed` (full new contents of every changed row) as
    * batch `batchId`, rewriting only the buckets they hash into:
    * prior rows of the touched buckets minus replaced keys (broadcast
    * anti-join), plus the changed rows.
    */
  def merge(changed: DataFrame, batchId: Long): Unit =
    mergeResolve(changed, batchId) { (prior, chg) =>
      prior match {
        case Some(p) => p
          .join(broadcast(chg.select(col(keyCol)).distinct()),
            Seq(keyCol), "left_anti")
          .unionByName(chg)
        case None => chg
      }
    }

  /** The general ∝-batch MERGE: `resolve` receives (prior rows of the
    * buckets touched by `updates`, updates) and returns the FULL new
    * contents of those buckets in ONE plan — so a caller whose merge
    * semantics are already a set transformation (e.g. the event
    * sink's highest-version-wins window) pays exactly one pruned
    * read and one write per commit, with no extra point-lookup pass.
    * Rows resolving into untouched buckets are dropped (they would
    * orphan outside the manifest); the touched-bucket list itself is
    * the one bounded driver collect (≤ nBuckets ids).
    */
  def mergeResolve(updates: DataFrame, batchId: Long)(
      resolve: (Option[DataFrame], DataFrame) => DataFrame): Unit = {
    if (lastBatchId >= batchId) return
    val prior = latest
    val v = prior.map(_._1 + 1).getOrElse(0L)
    val priorManifest = prior.map(p => manifest(p._1)).getOrElse(Map.empty)

    // touched bucket ids: bounded at nBuckets rows — a model-sized
    // driver artifact, same class as the manifest itself
    val touched = updates.select(bucketOf(col(keyCol)).as("__bucket"))
      .distinct().collect().map(_.getLong(0)).toSet
    val priorTouchedDirs = touched.toSeq.sorted.flatMap(priorManifest.get)
      .distinct.map(rel => s"$path/$rel")
    val priorRows =
      if (priorTouchedDirs.isEmpty) None
      else Some(spark.read.parquet(priorTouchedDirs: _*))
    val newData = resolve(priorRows, updates)
      .withColumn("__bucket", bucketOf(col(keyCol)))
      .filter(col("__bucket").isin(touched.toSeq: _*))
    if (touched.nonEmpty)
      newData.repartition(col("__bucket"))
        .write.mode(SaveMode.Overwrite)
        .partitionBy("__bucket").parquet(s"$path/c_$v")

    // the manifest records the buckets partitionBy ACTUALLY wrote: a
    // touched bucket whose resolved contents came out empty (a
    // filtering/compacting resolve) gets no directory, and an entry
    // pointing at a nonexistent path would brick every later read —
    // such a bucket is now EMPTY, so its prior entry is dropped
    val written: Set[Long] =
      if (touched.isEmpty) Set.empty
      else Option(new java.io.File(s"$path/c_$v").listFiles())
        .getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
        .map(_.getName.stripPrefix("__bucket=").toLong)
        .toSet
    val newManifest = (priorManifest -- (touched -- written)) ++
      written.map(k => k -> s"c_$v/__bucket=$k").toMap
    val mTmp = Paths.get(path, s"manifest_v$v.tmp")
    Files.createDirectories(Paths.get(path))
    Files.write(mTmp, newManifest.toSeq.sortBy(_._1)
      .map { case (k, rel) => s"$k,$rel" }.mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    Files.move(mTmp, Paths.get(path, s"manifest_v$v"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val tmp = Paths.get(path, s"_LATEST.tmp.$batchId")
    Files.write(tmp, s"$v,$batchId".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, ptrPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}
