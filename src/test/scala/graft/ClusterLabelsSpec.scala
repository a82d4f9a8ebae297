package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{ClusterLabels, Clusters}

/** The materialized label table's REFRESH lifecycle (round-9 verdict
  * item 2): a corpus that grew by a pure ingest batch refreshes
  * through ClusterMaintain.mergeBatch (cost ∝ batch) and the stored
  * table is row-identical to a from-scratch run on the union corpus;
  * a changed document forces the full-rebuild fallback.
  */
class ClusterLabelsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def labelMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("refresh: pure ingest batch goes incremental and matches from-scratch; a changed doc forces full") {
    val corpus = Files.createTempDirectory("cl_corpus").toString
    val d = Tables.load(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").localCheckpoint()
    val history = d.filter(col("doc_id") % 10 =!= 0)

    // 1. first build: no prior state -> full
    history.write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    val first = labelMap(ClusterLabels.table(spark, corpus, maxDist = 3))
    assert(ClusterLabels.lastBuildMode(corpus) == Some("full"))
    assert(first == labelMap(
      Clusters.simhashClusters(history, "doc_id", "text", maxDist = 3)))

    // 2. corpus grows by a pure ingest batch -> incremental merge,
    //    identical to a from-scratch run on the union
    d.write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    val second = labelMap(ClusterLabels.table(spark, corpus, maxDist = 3))
    assert(ClusterLabels.lastBuildMode(corpus) == Some("incremental"))
    assert(second == labelMap(
      Clusters.simhashClusters(d, "doc_id", "text", maxDist = 3)))

    // 3. a changed document (text mutated) -> full-rebuild fallback
    val mutated = d.withColumn("text",
      when(col("doc_id") === 3L, concat(col("text"), lit(" [rev2]")))
        .otherwise(col("text")))
    mutated.write.mode("overwrite").parquet(s"$corpus/documents.parquet")
    val third = labelMap(ClusterLabels.table(spark, corpus, maxDist = 3))
    assert(ClusterLabels.lastBuildMode(corpus) == Some("full"))
    assert(third == labelMap(
      Clusters.simhashClusters(mutated, "doc_id", "text", maxDist = 3)))

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(corpus))
  }
}
