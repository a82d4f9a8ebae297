package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{ClusterMaintain, Clusters}

/** Randomized contract check for the L52 batch merge: for ANY prior
  * graph and ANY batch (nodes + edges touching ≥ 1 batch node), the
  * merged labeling must equal from-scratch connected components over
  * the union graph — the contraction identity, pinned beyond the
  * single real-data slicing the oracle gate exercises.
  */
class ClusterMaintainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("mergeBatch == from-scratch CC on random graphs and batches") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 5) {
      val nHist = 40 + rnd.nextInt(40)
      val nBatch = 1 + rnd.nextInt(15)
      val histIds = (0L until nHist.toLong)
      val batchIds = (1000L until 1000L + nBatch)
      // prior graph: random sparse edges among history nodes
      val histEdges = Seq.fill(nHist / 2)(
        (histIds(rnd.nextInt(nHist)), histIds(rnd.nextInt(nHist))))
        .filter { case (a, b) => a != b }
      val existing = Clusters.connectedComponents(
          histIds.toDF("id"), histEdges.toDF("a", "b"))
        .groupBy("cluster_id").agg(collect_list("id").as("ids"))
        .select(explode(col("ids")).as("doc_id"), col("cluster_id"),
          size(col("ids")).as("cluster_size"))
      // batch edges: each touches >= 1 batch node (batch-batch and
      // batch-history mixes, including duplicates both ways)
      val batchEdges = Seq.fill(nBatch * 2) {
        val a = batchIds(rnd.nextInt(nBatch))
        val b = if (rnd.nextBoolean()) histIds(rnd.nextInt(nHist))
        else batchIds(rnd.nextInt(nBatch))
        (a, b)
      }.filter { case (a, b) => a != b }
      val merged = ClusterMaintain.mergeBatch(existing,
          batchIds.toDF("id"), batchEdges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // ground truth: CC over the union graph
      val unionLabels = Clusters.connectedComponents(
          (histIds ++ batchIds).toDF("id"),
          (histEdges ++ batchEdges).toDF("a", "b"))
        .groupBy("cluster_id").agg(collect_list("id").as("ids"))
        .select(explode(col("ids")).as("doc_id"), col("cluster_id"),
          size(col("ids")).as("cluster_size"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2).toLong)).toMap
      assert(merged == unionLabels, s"trial $trial diverged")
    }
  }

  test("mergeBatchDelta reconstructs mergeBatch: changed covers exactly the rows that can differ") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val nHist = 30 + rnd.nextInt(30)
      val nBatch = 1 + rnd.nextInt(10)
      val histIds = (0L until nHist.toLong)
      val batchIds = (1000L until 1000L + nBatch)
      val histEdges = Seq.fill(nHist / 2)(
        (histIds(rnd.nextInt(nHist)), histIds(rnd.nextInt(nHist))))
        .filter { case (a, b) => a != b }
      val existing = Clusters.connectedComponents(
          histIds.toDF("id"), histEdges.toDF("a", "b"))
        .groupBy("cluster_id").agg(collect_list("id").as("ids"))
        .select(explode(col("ids")).as("doc_id"), col("cluster_id"),
          size(col("ids")).cast("long").as("cluster_size"))
        .localCheckpoint()
      val batchEdges = Seq.fill(nBatch * 2) {
        val a = batchIds(rnd.nextInt(nBatch))
        val b = if (rnd.nextBoolean()) histIds(rnd.nextInt(nHist))
        else batchIds(rnd.nextInt(nBatch))
        (a, b)
      }.filter { case (a, b) => a != b }
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
      val full = rows(ClusterMaintain.mergeBatch(existing,
        batchIds.toDF("id"), batchEdges.toDF("a", "b")))
      val (changedDf, affectedDf) = ClusterMaintain.mergeBatchDelta(
        existing, batchIds.toDF("id"), batchEdges.toDF("a", "b"))
      val changed = rows(changedDf)
      val affected = affectedDf.collect().map(_.getLong(0)).toSet
      val prior = rows(existing)
      // the ∝-batch MERGE contract: prior rows of unaffected clusters
      // plus the changed rows reproduce the full merge exactly
      val reconstructed =
        prior.filter { case (_, (cid, _)) => !affected(cid) } ++ changed
      assert(reconstructed == full, s"trial $trial: delta reconstruction diverged")
      // and every row whose label differs from its prior IS in changed
      val diffing = full.filter { case (id, v) => prior.get(id).exists(_ != v) }
        .keySet ++ full.keySet.diff(prior.keySet)
      assert(diffing.subsetOf(changed.keySet),
        s"trial $trial: a differing row escaped the delta")
    }
  }

  test("local fast path == distributed contracted CC, row for row") {
    // round 15: mergeBatchDelta takes a driver-local union-find path
    // below LocalMergeMax; this pins its (changed, affected) output to
    // the distributed path's on random graphs, including duplicate
    // batch edges, batch-only components, and edge-less singletons
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 5) {
      val nHist = 30 + rnd.nextInt(40)
      val nBatch = 1 + rnd.nextInt(12)
      val histIds = (0L until nHist.toLong)
      val batchIds = (1000L until 1000L + nBatch)
      val histEdges = Seq.fill(nHist / 2)(
        (histIds(rnd.nextInt(nHist)), histIds(rnd.nextInt(nHist))))
        .filter { case (a, b) => a != b }
      val existing = Clusters.connectedComponents(
          histIds.toDF("id"), histEdges.toDF("a", "b"))
        .groupBy("cluster_id").agg(collect_list("id").as("ids"))
        .select(explode(col("ids")).as("doc_id"), col("cluster_id"),
          size(col("ids")).cast("long").as("cluster_size"))
        .localCheckpoint()
      val batchEdges = Seq.fill(nBatch * 2) {
        val a = batchIds(rnd.nextInt(nBatch))
        val b = if (rnd.nextBoolean()) histIds(rnd.nextInt(nHist))
        else batchIds(rnd.nextInt(nBatch))
        (a, b)
      }.filter { case (a, b) => a != b }
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
      val (lc, la) = ClusterMaintain.mergeBatchDelta(
        existing, batchIds.toDF("id"), batchEdges.toDF("a", "b"))
      val (dc, da) = ClusterMaintain.mergeBatchDeltaDistributed(
        existing, batchIds.toDF("id"),
        batchEdges.toDF("a", "b").localCheckpoint())
      assert(rows(lc) == rows(dc), s"trial $trial: changed diverged")
      assert(la.collect().map(_.getLong(0)).toSet ==
        da.collect().map(_.getLong(0)).toSet,
        s"trial $trial: affected diverged")
    }
  }

  test("connectivity edge set yields the same CC labels as the full pair list") {
    // round 15: the ingest loops feed simhashConnectivityEdgesOf
    // (star + rep pairs, linear in members) instead of the
    // clique-quadratic member pair list — components must not change.
    // Real text corpus with planted dup cliques and near-dups.
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val docs = (0L until 120L).map { i =>
      val base = s"the quick brown fox ${i % 7} jumps over the lazy dog " +
        s"lorem ipsum dolor sit amet ${i % 5}"
      val text = if (i % 3 == 0) base // exact-dup cliques
      else if (i % 3 == 1) base + s" tail${rnd.nextInt(3)}" // near
      else s"completely unrelated document number $i with its own words"
      (i, text)
    }.toDF("doc_id", "text")
    val fp = graft.dedup.Dedup.withSimhash(docs, "doc_id", "text")
      .localCheckpoint()
    def labelsOf(edges: org.apache.spark.sql.DataFrame) =
      Clusters.connectedComponents(
          fp.select(col("doc_id").as("id")), edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = labelsOf(graft.dedup.Dedup.simhashPairsOf(fp, 3)
      .select(col("ida").as("a"), col("idb").as("b")))
    val conn = labelsOf(
      graft.dedup.Dedup.simhashConnectivityEdgesOf(fp, 3))
    assert(conn == full)
  }

  test("empty batch is the identity") {
    import spark.implicits._
    val existing = Seq((1L, 1L, 2L), (2L, 1L, 2L), (5L, 5L, 1L))
      .toDF("doc_id", "cluster_id", "cluster_size")
    val merged = ClusterMaintain.mergeBatch(existing,
        Seq.empty[Long].toDF("id"),
        Seq.empty[(Long, Long)].toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == Set((1L, 1L, 2L), (2L, 1L, 2L), (5L, 5L, 1L)))
  }
}
