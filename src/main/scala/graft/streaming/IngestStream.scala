package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.dedup.{ClusterMaintain, Dedup}

/** The PRODUCTION ingest loop for the duplicate-cluster label store:
  * a STREAM of document batches drives the L49→L40→L52 chain, with
  * the three state tables (labels, banded fp index, content snapshot)
  * living in the same versioned, batch-id-idempotent [[SnapshotTable]]
  * the event sink uses — so a crash between commits replays safely
  * and a replayed micro-batch is a no-op per table.
  *
  * Per micro-batch:
  *   1. L49 — diff the batch against the stored snapshot (anti-join
  *      on id + content fingerprint): only genuinely NEW docs proceed
  *      (a re-delivered doc is dropped, the at-least-once-source
  *      case);
  *   2. L40 — fingerprint the new docs and band-probe them against
  *      the STORED index (cost ∝ batch; the index never re-shuffles
  *      under the bucketed layout, BucketingSpec);
  *   3. L52 — [[ClusterMaintain.mergeBatch]] folds the batch into the
  *      stored labeling (contracted-graph CC, ∝ batch). An EMPTY
  *      state bootstraps correctly: with no existing clusters the
  *      merge IS a from-scratch CC of the first batch.
  *
  * The end-state contract — streaming over any batch partitioning of
  * a corpus produces the IDENTICAL label table to one from-scratch
  * run — is pinned by IngestStreamSpec, including a restart replay.
  *
  * This is the streaming twin of [[graft.dedup.ClusterLabels]]'
  * batch-refresh path; both call the same merge operator against the
  * same three-table state shape.
  *
  * Scale note on the STATE WRITES: [[SnapshotTable.commit]] rewrites
  * a full snapshot — that is the sandbox stand-in's cost, not the
  * operator's (its own scaladoc: swap for a lakehouse table at
  * cluster scale). The fp index and content snapshot are APPEND-ONLY
  * (this loop only ever unions new rows in), so at 100 TB they are
  * partition appends ∝ batch; the label table changes only in the
  * affected clusters, an id-keyed MERGE touching ∝-batch partitions
  * under the bucketed-by-doc_id layout. The COMPUTE side is ∝ batch
  * end to end (the r9-rehearsed mergeBatch bound); nothing in the
  * loop's dataflow scans the corpus after the state exists.
  */
object IngestStream {

  /** Start the loop over a streaming (doc_id, text) frame; state under
    * `statePath/{labels,fps,snap}`.
    */
  def start(docs: DataFrame, statePath: String, checkpoint: String,
      maxDist: Int = 3,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, statePath, maxDist)
      }
      .start()

  def processBatch(batch: DataFrame, batchId: Long, statePath: String,
      maxDist: Int): Unit = {
    val spark = batch.sparkSession
    val labelsT = new SnapshotTable(spark, s"$statePath/labels")
    val fpsT = new SnapshotTable(spark, s"$statePath/fps")
    val snapT = new SnapshotTable(spark, s"$statePath/snap")
    if (labelsT.lastBatchId >= batchId && fpsT.lastBatchId >= batchId &&
        snapT.lastBatchId >= batchId) return // full replay → no-op

    // within-batch dedup by id (first occurrence), then the L49 gate:
    // only ids absent from the stored snapshot are new work
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("doc_id")
    val distinctBatch = batch.select(col("doc_id"), col("text"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val added = (snapT.read() match {
      case Some(snap) => distinctBatch
        .join(snap.select("doc_id"), Seq("doc_id"), "left_anti")
      case None => distinctBatch
    }).localCheckpoint()

    val priorLabels = labelsT.read()
    val priorFps = fpsT.read()
    val bFp = Dedup.withSimhash(added, "doc_id", "text").localCheckpoint()
    val emptyEdges = spark.range(0)
      .select(col("id").as("a"), col("id").as("b"))
    val edges = (priorFps match {
      case Some(idx) => Dedup.crossNearPairsOf(bFp, idx, maxDist)
        .select(col("a"), col("b"))
      case None => emptyEdges
    }).union(Dedup.simhashPairsOf(bFp, maxDist)
      .select(col("ida").as("a"), col("idb").as("b")))

    val emptyLabels = spark.range(0).select(col("id").as("doc_id"),
      col("id").as("cluster_id"), col("id").as("cluster_size"))
    val merged = ClusterMaintain.mergeBatch(
      priorLabels.getOrElse(emptyLabels),
      added.select(col("doc_id").as("id")), edges)
      .localCheckpoint()

    // per-table idempotent commits (the EventSink crash contract:
    // a partial commit replays only the missing tables)
    if (labelsT.lastBatchId < batchId) labelsT.commit(merged, batchId)
    if (fpsT.lastBatchId < batchId) {
      val allFps = priorFps match {
        case Some(idx) => idx.unionByName(bFp.select("doc_id", "simhash"))
        case None => bFp.select("doc_id", "simhash")
      }
      fpsT.commit(allFps, batchId)
    }
    if (snapT.lastBatchId < batchId) {
      val addedSnap = added.select(col("doc_id"), md5(col("text")).as("fp"))
      val allSnap = snapT.read() match {
        case Some(snap) => snap.unionByName(addedSnap)
        case None => addedSnap
      }
      snapT.commit(allSnap, batchId)
    }
  }
}
