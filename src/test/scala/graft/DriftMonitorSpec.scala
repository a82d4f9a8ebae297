package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DriftMonitor
import graft.text.{ClassifierEval, QualityClassifier}

/** The streaming drift monitor's contract: a clean micro-batch scores
  * a small PSI against the deployment-time reference histogram, a
  * degraded one alerts, the driver-side fixed-point fold equals the
  * batch gate's in-plan PSI bit-for-bit, and a restart replays as a
  * no-op on the monitor log.
  */
class DriftMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("clean batch stays quiet, degraded batch alerts, replay is a no-op, psi == in-plan gate") {
    import spark.implicits._
    val root = Files.createTempDirectory("drift_monitor").toString
    val d = Tables.load(spark, TestSpark.Sf, "documents")
      .select("doc_id", "text").localCheckpoint()

    // reference: the even-id slice, unplanted — "what scores looked
    // like when the filter was validated"
    val refDf = d.filter(col("doc_id") % 2 === 0)
    val ref = DriftMonitor.referenceBins(refDf, "doc_id", "text", nBins = 10)
    assert(ref.map(_._2).sum > 0)

    // feed: batch 0 = clean odd ids (same distribution as ref);
    // batch 1 = the SAME docs fully degraded (boilerplate tail on
    // every doc — a spam-campaign morning)
    val clean = d.filter(col("doc_id") % 2 === 1)
    val degraded = clean.select(col("doc_id") + 1000000L as "doc_id",
      concat(col("text"), lit(QualityClassifier.Degradation.TailA))
        .as("text"))
    val feed = s"$root/feed"
    clean.coalesce(1).write.parquet(s"$feed/b0.parquet")
    degraded.coalesce(1).write.parquet(s"$feed/b1.parquet")

    val stream = spark.readStream.schema(clean.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/*.parquet")
    val state = s"$root/state"
    val q = DriftMonitor.start(stream, state, s"$root/chk", ref)
    try q.processAllAvailable() finally q.stop()

    val mT = DriftMonitor.monitorTable(spark, state)
    val rows = mT.read().get.orderBy("batch_id").collect()
    assert(rows.length == 2)
    val clean0 = rows(0); val bad1 = rows(1)
    assert(!clean0.getAs[Boolean]("alert"),
      s"clean batch alerted: $clean0")
    assert(clean0.getAs[Long]("psi_u") < 200000L &&
      clean0.getAs[Long]("unseen_u") < 100000L)
    // total drift: the degraded docs score where NO reference doc
    // ever did — invisible to skip-empty PSI by construction, caught
    // by the unseen-mass alarm (the reason that column exists)
    assert(bad1.getAs[Boolean]("alert"),
      s"degraded batch did not alert: $bad1; ref=$ref")
    assert(bad1.getAs[Long]("unseen_u") >= 500000L,
      s"unseen mass too small: $bad1")
    val psiBad = bad1.getAs[Long]("psi_u")

    // the driver-side fixed-point fold == the batch gate's in-plan
    // total on the same two corpora
    val inPlan = ClassifierEval.scorePsi(
      QualityClassifier.classifyTrained(refDf, "doc_id", "text"),
      QualityClassifier.classifyTrained(degraded, "doc_id", "text"),
      "score", nBins = 10)
      .select("psi_total").head.getDouble(0)
    assert(psiBad == math.round(inPlan * 1e6),
      s"monitor $psiBad != in-plan ${math.round(inPlan * 1e6)}")

    // restart over the same feed + checkpoint: monitor log unchanged
    val q2 = DriftMonitor.start(spark.readStream.schema(clean.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$feed/*.parquet"),
      state, s"$root/chk", ref)
    try q2.processAllAvailable() finally q2.stop()
    assert(DriftMonitor.monitorTable(spark, state).read().get.count() == 2)
    assert(mT.lastBatchId == 1L)
  }
}
