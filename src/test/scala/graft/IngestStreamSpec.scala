package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Clusters
import graft.streaming.IngestStream

/** The streaming ingest loop's end-state contract: streaming a corpus
  * through in micro-batches — any partitioning — yields the IDENTICAL
  * label table to one from-scratch clustering run, and a restarted
  * stream over the same feed replays as a no-op.
  */
class IngestStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def labelMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("streamed batches converge to the from-scratch labeling; restart is a no-op") {
    val root = Files.createTempDirectory("ingest_stream").toString
    val d = Tables.load(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").localCheckpoint()

    // feed: three parquet files = three micro-batches (file source,
    // maxFilesPerTrigger=1), slicing the corpus arbitrarily; slice 2
    // re-delivers part of slice 1 (the at-least-once-source case the
    // L49 gate must drop)
    val feed = s"$root/feed"
    d.filter(col("doc_id") % 3 === 0).coalesce(1)
      .write.parquet(s"$feed/b0.parquet")
    d.filter(col("doc_id") % 3 === 1 ||
        (col("doc_id") % 3 === 0 && col("doc_id") % 5 === 0)).coalesce(1)
      .write.parquet(s"$feed/b1.parquet")
    d.filter(col("doc_id") % 3 === 2).coalesce(1)
      .write.parquet(s"$feed/b2.parquet")

    val stream = spark.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/*.parquet")
    val state = s"$root/state"
    val chk = s"$root/chk"
    val q = IngestStream.start(stream, state, chk, maxDist = 3)
    try q.processAllAvailable() finally q.stop()

    val want = labelMap(
      Clusters.simhashClusters(d, "doc_id", "text", maxDist = 3))
    val labelsT = new graft.streaming.SnapshotTable(spark, s"$state/labels")
    assert(labelMap(labelsT.read().get) == want)
    val v1 = labelsT.latest.get

    // restart over the same feed + checkpoint: nothing new → state
    // version unchanged
    val q2 = IngestStream.start(spark.readStream.schema(d.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/*.parquet"),
      state, chk, maxDist = 3)
    try q2.processAllAvailable() finally q2.stop()
    assert(new graft.streaming.SnapshotTable(spark, s"$state/labels")
      .latest.get == v1)
    assert(labelMap(labelsT.read().get) == want)

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
