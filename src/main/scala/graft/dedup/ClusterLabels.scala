package graft.dedup

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Sessions, Tables}
import graft.operators.SnapshotDiff

/** Materialized duplicate-cluster labels — the production shape for
  * every cluster CONSUMER (keep-best selection, leakage-free splits,
  * semantic merges): clustering runs ONCE per corpus snapshot and the
  * (doc_id, cluster_id, cluster_size) table is stored; consumers JOIN
  * it instead of re-running connected components per query (round-8
  * verdict: three independent recomputes cost ~17 s of a 110 s sweep —
  * at 100 TB the same mistake is three full CC runs a day).
  *
  * The stored STATE is three tables plus a build-mode marker:
  * `labels` (doc_id, cluster_id, cluster_size), `fps` (doc_id,
  * simhash — the banded probe index), and `snap` (doc_id, md5(text) —
  * the L49 diff side). A refresh against a corpus that differs from
  * the stored snapshot by a PURE INGEST BATCH (SnapshotDiff reports
  * only `added`/`unchanged`) goes through
  * [[ClusterMaintain.mergeBatch]] — batch fps probed against the
  * stored index, contracted-graph merge, cost ∝ batch — instead of a
  * from-scratch CC; any `changed`/`removed` row falls back to the
  * full rebuild (cluster splits are not expressible as a merge).
  * ClusterLabelsSpec pins both paths: the incremental refresh is
  * row-identical to a from-scratch run on the union corpus, and a
  * mutated doc forces the full path.
  *
  * Cache identity: parquet on the scratch root, keyed by the corpus
  * file's identity (path + mtime + size — the stream-stage convention,
  * so regenerated testdata can never serve stale labels), the banding
  * distance, and a logic version. At 100 TB this state is stored
  * bucketed by doc_id (the L40 layout — consumers' joins co-partition,
  * BucketingSpec proves the pattern).
  *
  * The CC gate queries (q_d_cc_clusters/star/adaptive) deliberately do
  * NOT read this cache: each exists to exercise its clustering scheme
  * against the oracle, and a cache read would make the two alternate-
  * scheme gates vacuous copies of the first.
  *
  * Relationship to [[graft.streaming.IngestStream]]: same three-table
  * state SHAPE, same merge operator, two deliberate lifecycles. This
  * object is a corpus-identity-keyed CACHE on the scratch root —
  * rebuildable at will, keyed so regenerated testdata can never serve
  * stale labels, owned by batch consumers. IngestStream's state is a
  * DURABLE versioned store coupled to a streaming checkpoint
  * (batch-id-idempotent commits, crash-replay contract) — owned by
  * the ingest loop. Collapsing them would couple every batch
  * consumer's cache key to a stream's checkpoint lineage.
  */
object ClusterLabels {

  /** Logic version — bump when the labeling or state layout changes. */
  private val Version = "v2"

  private def rootFor(sfDir: String, maxDist: Int): String = {
    val src = new File(Tables.path(sfDir, "documents"))
    s"${Sessions.scratchRoot}/cluster_labels/" +
      s"${src.getParentFile.getName}_d${maxDist}_$Version"
  }

  private def corpusFp(sfDir: String): String = {
    val src = new File(Tables.path(sfDir, "documents"))
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"${src.getAbsolutePath}:${src.lastModified}:${src.length}"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
  }

  /** How the current state was built — `Some("full" | "incremental")`
    * once [[table]] has run for this corpus, `None` before. Test hook.
    */
  def lastBuildMode(sfDir: String, maxDist: Int = 3): Option[String] = {
    val marker =
      Paths.get(s"${rootFor(sfDir, maxDist)}/state_${corpusFp(sfDir)}/_STATE")
    if (Files.exists(marker))
      Some(new String(Files.readAllBytes(marker), StandardCharsets.UTF_8).trim)
    else None
  }

  /** The labels table for `sfDir`'s documents corpus — read from the
    * stored state, refreshing it first (incrementally when the corpus
    * grew by a pure ingest batch, from scratch otherwise). Returns
    * (doc_id, cluster_id, cluster_size).
    */
  def table(spark: SparkSession, sfDir: String, maxDist: Int = 3): DataFrame = {
    val state = ensured(spark, sfDir, maxDist)
    spark.read.parquet(s"$state/labels")
  }

  /** The maintained fingerprint index (doc_id, simhash) of the same
    * state — the banded-probe side of the incremental-ingest chain
    * (L40): consumers probe batch fps against THIS stored table
    * instead of re-fingerprinting the history corpus.
    */
  def fps(spark: SparkSession, sfDir: String, maxDist: Int = 3): DataFrame = {
    val state = ensured(spark, sfDir, maxDist)
    spark.read.parquet(s"$state/fps")
  }

  private def ensured(spark: SparkSession, sfDir: String, maxDist: Int): String = {
    val root = rootFor(sfDir, maxDist)
    val state = s"$root/state_${corpusFp(sfDir)}"
    if (!Files.exists(Paths.get(s"$state/_STATE"))) refresh(spark, sfDir, maxDist, state, root)
    state
  }

  private def refresh(spark: SparkSession, sfDir: String, maxDist: Int,
      state: String, root: String): Unit = {
    val docs = Tables.load(spark, sfDir, "documents")
    val curSnap = docs.select(col("doc_id"), md5(col("text")).as("fp"))
    // prior state = the newest other state under this root (at most
    // one exists: stale states are pruned after every refresh)
    val prior = Option(new File(root).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("state_") &&
        d.getAbsolutePath != new File(state).getAbsolutePath &&
        new File(d, "_STATE").exists())
      .sortBy(d => new File(d, "_STATE").lastModified).lastOption

    val incremental = prior.flatMap { p =>
      val priorSnap = spark.read.parquet(s"$p/snap")
      val statuses = SnapshotDiff
        .diffFingerprints(priorSnap, curSnap, "doc_id", "fp")
        .groupBy("status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // a pure ingest batch merges; a changed/removed doc can SPLIT a
      // cluster, which no merge expresses — full rebuild
      if (statuses.getOrElse("removed", 0L) == 0L &&
          statuses.getOrElse("changed", 0L) == 0L) Some(p) else None
    }

    val (labels, fps, mode) = incremental match {
      case Some(p) =>
        val priorLabels = spark.read.parquet(s"$p/labels")
        val priorFps = spark.read.parquet(s"$p/fps")
        val priorSnap = spark.read.parquet(s"$p/snap")
        val batch = docs.join(
          priorSnap.select(col("doc_id")), Seq("doc_id"), "left_anti")
        val bFp = Dedup.withSimhash(batch, "doc_id", "text").localCheckpoint()
        // rep-level cross edges: connectivity-equivalent (see
        // Dedup.crossNearEdgesOf) without re-materializing the
        // stored index per refresh
        val edges = Dedup.crossNearEdgesOf(bFp, priorFps, maxDist)
          .union(Dedup.simhashConnectivityEdgesOf(bFp, maxDist))
        val merged = ClusterMaintain.mergeBatch(
          priorLabels, batch.select(col("doc_id").as("id")), edges)
        (merged, priorFps.unionByName(bFp), "incremental")
      case None =>
        val fp = Dedup.withSimhash(docs, "doc_id", "text")
          .localCheckpoint(eager = false)
        (Clusters.simhashClustersOf(fp, maxDist), fp, "full")
    }
    labels.write.mode("overwrite").parquet(s"$state/labels")
    fps.select("doc_id", "simhash").write.mode("overwrite")
      .parquet(s"$state/fps")
    curSnap.write.mode("overwrite").parquet(s"$state/snap")
    Files.createDirectories(Paths.get(state))
    Files.write(Paths.get(s"$state/_STATE"),
      mode.getBytes(StandardCharsets.UTF_8))
    // prune superseded states so discovery stays one-candidate
    prior.foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(p))
    Option(new File(root).listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("state_") &&
        d.getAbsolutePath != new File(state).getAbsolutePath)
      .foreach(d => org.apache.commons.io.FileUtils.deleteQuietly(d))
  }
}
