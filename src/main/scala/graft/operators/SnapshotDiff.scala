package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L49 — corpus snapshot diff: the daily-ops primitive that tells a
  * pipeline what yesterday→today actually changed, per document:
  *
  *   - `added`     — id only in the new snapshot
  *   - `removed`   — id only in the old snapshot
  *   - `changed`   — id in both, content fingerprint differs
  *   - `unchanged` — id in both, fingerprint equal
  *
  * Downstream stages re-run on `added ∪ changed` only (the
  * incremental-dedup ingest contract, L40/L42) and retire state for
  * `removed` — without this diff every snapshot reprocesses 100 TB.
  *
  * Scale shape: ONE full-outer equi-join on the id. Fingerprints are
  * md5(content) computed map-side before the join, so the shuffle
  * carries (id, 32-hex) not the documents; with both snapshots stored
  * bucketed by id (the L40 layout) the join is co-partitioned and
  * even that shuffle disappears (proven: BucketingSpec "snapshot diff
  * over bucketed-by-id snapshots joins with no exchange"). No skew
  * risk — ids are unique per side by construction (`firstSeen`
  * upstream guarantees it).
  */
object SnapshotDiff {

  def diff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame =
    diffFingerprints(
      oldSnap.select(col(idCol).as("id"), md5(col(textCol)).as("fp")),
      newSnap.select(col(idCol).as("id"), md5(col(textCol)).as("fp")),
      "id", "fp")

  /** [[diff]] over PRECOMPUTED content fingerprints (`idCol`, `fpCol`)
    * — for callers whose old side is a STORED fingerprint table (the
    * production shape: yesterday's snapshot exists only as its
    * artifact, e.g. [[graft.dedup.ClusterLabels]]' refresh) rather
    * than re-hashable documents. Same join shape and status contract.
    */
  def diffFingerprints(oldFps: DataFrame, newFps: DataFrame,
      idCol: String, fpCol: String): DataFrame = {
    // presence is carried as an EXPLICIT per-side flag, not inferred
    // from fingerprint nullness: a doc with NULL text has md5=NULL but
    // is still PRESENT, so nullness-as-presence would misread it as
    // added (and NULL-vs-NULL text as added instead of unchanged)
    val o = oldFps.select(col(idCol).as("id"),
      col(fpCol).as("old_fp"), lit(true).as("in_old"))
    val n = newFps.select(col(idCol).as("id"),
      col(fpCol).as("new_fp"), lit(true).as("in_new"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"), col("old_fp"), col("new_fp"),
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          // null-safe: one-sided NULL text reads changed, NULL-vs-NULL
          // reads unchanged
          .when(!(col("old_fp") <=> col("new_fp")), "changed")
          .otherwise("unchanged").as("status"))
  }
}
