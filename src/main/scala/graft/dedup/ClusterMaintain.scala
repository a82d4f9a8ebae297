package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L52 — incremental cluster maintenance: merge an ingest batch's
  * near-dup edges into an EXISTING cluster labeling without re-running
  * connected components over the full corpus. This is what makes the
  * incremental-ingest family (L40 fingerprint dedup, L42 Bloom
  * prefilter, L49 snapshot diff) real for the cluster CONSUMERS (L36
  * leakage-split stability, L38 keep-best) at 100 TB: per-batch cost
  * tracks the BATCH, while a from-scratch CC pays the corpus every
  * snapshot.
  *
  * Identity used: an existing labeling (cluster_id = min member id) is
  * connectivity-equivalent to its label-induced STAR graph (every
  * member → its cluster min). The union corpus' components are
  * therefore the components of star(existing) ∪ batchEdges — and since
  * every new edge touches a batch doc, only clusters containing a
  * batch-edge endpoint can change. The merge:
  *
  *   1. affected = clusters owning any batch-edge endpoint (∝ batch;
  *      broadcast);
  *   2. star edges restricted to affected clusters — ONE broadcast-
  *      filtered scan of the label table, which is never shuffled (at
  *      100 TB the table is additionally bucketed/partition-pruned by
  *      cluster_id, making the scan itself ∝ affected);
  *   3. frontier CC over the affected ∪ batch subgraph only (∝ batch:
  *      dup cliques are bounded, so affected membership is a constant
  *      factor of the batch size);
  *   4. unaffected labels pass through untouched (anti broadcast
  *      semi-join — no shuffle of the big table).
  *
  * The result is IDENTICAL to a from-scratch run on the union corpus
  * (gate: q_d_cc_incremental shares the CC oracle verbatim); star
  * graphs preserve component minima, so merged cluster ids are again
  * the component min — the invariant the next batch's merge relies on.
  *
  * `batchEdges` must contain every near-dup pair with ≥ 1 batch
  * endpoint (batch↔history and batch↔batch, hamming ≤ maxDist,
  * including identical fingerprints). Production builds it ∝ batch by
  * band-probing batch fingerprints against the stored fp index — the
  * L40 probe shape (BucketingSpec: history side never shuffles).
  */
object ClusterMaintain {

  /** @param existing   (doc_id, cluster_id, cluster_size) — prior
    *                   labeling, cluster_id = min member id
    * @param batchNodes one column `id` — the new docs (edge-less new
    *                   docs become singletons)
    * @param batchEdges (a, b) undirected near-dup pairs, each touching
    *                   ≥ 1 batch doc
    * @return (doc_id, cluster_id, cluster_size) for the UNION corpus
    */
  def mergeBatch(existing: DataFrame, batchNodes: DataFrame,
      batchEdges: DataFrame): DataFrame = {
    val edges = batchEdges.select(col("a"), col("b"))
    val endpoints = edges.select(col("a").as("doc_id"))
      .union(edges.select(col("b").as("doc_id"))).distinct()
    // clusters that can change: any owning a batch-edge endpoint
    val affected = existing.join(endpoints, "doc_id")
      .select("cluster_id").distinct()
    // members of affected clusters: one broadcast-filtered scan of the
    // label table — the table itself is never shuffled
    val affectedMembers = existing
      .join(broadcast(affected), Seq("cluster_id"))
      .select("doc_id", "cluster_id")
      .localCheckpoint()
    // connectivity of the affected slice = its label-induced star
    val starEdges = affectedMembers
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("a"), col("cluster_id").as("b"))
    val nodes = affectedMembers.select(col("doc_id").as("id"))
      .union(batchNodes.select(col("id"))).distinct()
    val relabeled = Clusters.connectedComponents(
      nodes, starEdges.union(edges))
    val sizes = relabeled.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    val changed = relabeled.join(sizes, "cluster_id")
      .select(col("id").as("doc_id"), col("cluster_id"), col("cluster_size"))
    // unaffected clusters keep their labels AND sizes (no new member
    // can have joined them — every new edge lands in an affected one)
    val untouched = existing
      .join(broadcast(affected.withColumnRenamed("cluster_id", "cid")),
        col("cluster_id") === col("cid"), "left_anti")
      .select("doc_id", "cluster_id", "cluster_size")
    untouched.union(changed)
  }
}
