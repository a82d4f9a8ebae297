package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{Sessions, Tables}

/** Materialized duplicate-cluster labels — the production shape for
  * every cluster CONSUMER (keep-best selection, leakage-free splits,
  * semantic merges): clustering runs ONCE per corpus snapshot and the
  * (doc_id, cluster_id, cluster_size) table is stored; consumers JOIN
  * it instead of re-running connected components per query (round-8
  * verdict: three independent recomputes cost ~17 s of a 110 s sweep —
  * at 100 TB the same mistake is three full CC runs a day).
  *
  * Cache contract: parquet on the scratch root, keyed by the corpus
  * file's identity (path + mtime + size — the stream-stage convention,
  * so regenerated testdata can never serve stale labels), the banding
  * distance, and a logic version. At 100 TB this table is stored
  * bucketed by doc_id (the L40 layout — consumers' joins co-partition,
  * BucketingSpec proves the pattern) and maintained INCREMENTALLY per
  * ingest batch by [[ClusterMaintain.mergeBatch]] instead of being
  * recomputed from scratch.
  *
  * The CC gate queries (q_d_cc_clusters/star/adaptive) deliberately do
  * NOT read this cache: each exists to exercise its clustering scheme
  * against the oracle, and a cache read would make the two alternate-
  * scheme gates vacuous copies of the first.
  */
object ClusterLabels {

  /** Logic version — bump when simhashClusters' labeling changes. */
  private val Version = "v1"

  /** The labels table for `sfDir`'s documents corpus, computing and
    * caching it on first demand. Returns (doc_id, cluster_id,
    * cluster_size).
    */
  def table(spark: SparkSession, sfDir: String, maxDist: Int = 3): DataFrame = {
    val src = new java.io.File(Tables.path(sfDir, "documents"))
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${src.getAbsolutePath}:${src.lastModified}:${src.length}"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val dest = s"${Sessions.scratchRoot}/cluster_labels/" +
      s"${src.getParentFile.getName}_${fp}_d${maxDist}_$Version"
    if (!new java.io.File(s"$dest/_SUCCESS").exists()) {
      Clusters.simhashClusters(
          Tables.load(spark, sfDir, "documents"), "doc_id", "text", maxDist)
        .write.mode("overwrite").parquet(dest)
    }
    spark.read.parquet(dest)
  }
}
