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
  * Identity used: each existing cluster is internally connected, so
  * for CONNECTIVITY it can be CONTRACTED to a single node named by its
  * cluster_id; the union corpus' components are the components of the
  * contracted graph (affected-cluster nodes ∪ batch-doc nodes, edges =
  * batchEdges with each endpoint mapped to its cluster node). And
  * since cluster_id = min member id, the contracted component's min
  * NODE id equals the merged component's min MEMBER id — contraction
  * preserves the labeling contract, not just connectivity. Only
  * clusters containing a batch-edge endpoint can change. The merge:
  *
  *   1. affected = clusters owning any batch-edge endpoint (∝ batch;
  *      broadcast);
  *   2. contract: map each batch-edge endpoint to its cluster node
  *      (itself if a batch doc) and drop now-internal self-loops —
  *      the CC input shrinks from member-level star+pair edges to the
  *      DISTINCT cluster-pair/doc-pair edges (duplicate clique
  *      expansions collapse);
  *   3. frontier CC over that contracted graph (nodes ∝ affected
  *      clusters + batch — never members);
  *   4. members of affected clusters inherit their cluster node's new
  *      label with ONE broadcast-filtered scan of the label table
  *      (never shuffled; at 100 TB additionally bucketed/partition-
  *      pruned by cluster_id); unaffected labels pass through via an
  *      anti broadcast semi-join.
  *
  * The result is IDENTICAL to a from-scratch run on the union corpus
  * (gate: q_d_cc_incremental shares the CC oracle verbatim), and the
  * merged cluster ids are again component minima — the invariant the
  * next batch's merge relies on.
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
    val (changed, affected) = mergeBatchDelta(existing, batchNodes, batchEdges)
    // unaffected clusters keep their labels AND sizes (no new member
    // can have joined them — every new edge lands in an affected one)
    val untouched = existing
      .join(broadcast(affected.withColumnRenamed("cluster_id", "cid")),
        col("cluster_id") === col("cid"), "left_anti")
      .select("doc_id", "cluster_id", "cluster_size")
    untouched.union(changed)
  }

  /** The DELTA view of [[mergeBatch]]: only the rows whose label row
    * can have changed — members of affected clusters (relabeled
    * and/or resized) plus the batch docs — and the affected prior
    * cluster ids. This is what a ∝-batch label-store MERGE writes
    * ([[graft.streaming.BucketedTable]]): `changed` replaces same-key
    * rows, every other row of the store is untouched by construction.
    * `mergeBatch` == untouched-prior ∪ `changed` (shared code path).
    *
    * @return (changed rows `(doc_id, cluster_id, cluster_size)`,
    *          affected prior cluster ids `(cluster_id)`)
    */
  def mergeBatchDelta(existing: DataFrame, batchNodes: DataFrame,
      batchEdges: DataFrame): (DataFrame, DataFrame) = {
    val edges = batchEdges.select(col("a"), col("b"))
    val endpoints = edges.select(col("a").as("doc_id"))
      .union(edges.select(col("b").as("doc_id"))).distinct()
      .localCheckpoint()
    // clusters that can change: any owning a batch-edge endpoint; the
    // endpoint→cluster map is ∝ batch and broadcasts
    val endpointCluster = existing.join(endpoints, "doc_id")
      .select(col("doc_id"), col("cluster_id")).localCheckpoint()
    val affected = endpointCluster.select("cluster_id").distinct()
    // contract: each endpoint becomes its cluster node (itself if a
    // batch doc); internal edges become self-loops and drop; clique
    // expansions collapse onto the same cluster pair
    val cEdges = edges
      .join(broadcast(endpointCluster
        .select(col("doc_id").as("a"), col("cluster_id").as("ca"))),
        Seq("a"), "left")
      .join(broadcast(endpointCluster
        .select(col("doc_id").as("b"), col("cluster_id").as("cb"))),
        Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("a"),
        coalesce(col("cb"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val cNodes = affected.select(col("cluster_id").as("id"))
      .union(batchNodes.select(col("id"))).distinct()
    // CC over the contracted graph: nodes ∝ affected clusters + batch;
    // min node id of a component == min member id of the merged
    // component because cluster_id is already its cluster's min member
    val relabeled = Clusters.connectedComponents(cNodes, cEdges)
      .select(col("id").as("cnode"), col("cluster_id").as("ncid"))
      .localCheckpoint()
    // members of affected clusters inherit their cluster node's label:
    // one broadcast-filtered scan of the label table (never shuffled)
    val memberLabels = existing
      .join(broadcast(relabeled.withColumnRenamed("cnode", "cluster_id")),
        Seq("cluster_id"))
      .select(col("doc_id"), col("ncid"))
    val batchLabels = batchNodes
      .join(broadcast(relabeled), col("id") === col("cnode"))
      .select(col("id").as("doc_id"), col("ncid"))
    val relabeledMembers = memberLabels.union(batchLabels)
    val sizes = relabeledMembers.groupBy("ncid")
      .agg(count(lit(1)).as("cluster_size"))
    val changed = relabeledMembers.join(sizes, "ncid")
      .select(col("doc_id"), col("ncid").as("cluster_id"),
        col("cluster_size"))
    (changed, affected)
  }
}
