package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{DriftMonitor, IngestStream}
import graft.text.QualityClassifier
import graft.text.QualityClassifier.Degradation

/** RETRAIN-ON-DRIFT rehearsal (round-12 verdict stretch item 8 — the
  * L58b measure→retrain pattern applied to the L30 quality scorer):
  * drives the full remedy loop the requalification CONVENTION in
  * COVERAGE.md documents, with the one deliberately human-shaped step
  * (label adjudication) played by the fixture rule:
  *
  *   1. DRIFT: a new regime arrives — every batch doc carries the
  *      commerce tail (TailB). The committed scorer, trained with
  *      TailB as spam, collapses the batch's scores: the monitor's
  *      PSI alarms AND the admission filter would reject the entire
  *      stream (the admission-collapse failure retraining exists to
  *      fix — a histogram refresh alone cannot restore admission).
  *   2. QUARANTINE: the real gated loop routes the batch whole into
  *      the quarantine table (nothing downstream touched).
  *   3. ADJUDICATE + RETRAIN: the quarantined slice is adjudicated
  *      keep (the regime is legitimate — a commerce domain joined the
  *      corpus); [[TrainQuality.fit]] retrains from the reference
  *      slice (fixture labels: clean keep, TailA spam drop) ∪ the
  *      quarantined slice (keep) — the same one-pass-per-iteration
  *      fixed-point protocol that trained the committed artifact.
  *   4. RELOAD + DRAIN: the retrained weights serve through
  *      [[QualityClassifier.classifyWith]] WITHOUT touching the
  *      committed artifact — [[DriftMonitor.GateConfig.model]] carries
  *      them into the loop — the reference histogram refreshes from
  *      the quarantined slice under the new scorer, and the REAL
  *      [[IngestStream.drainQuarantine]] re-enters the batch: monitor
  *      row quiet, batch published, pending retired.
  *
  * Success criteria asserted in-run (numbers land in
  * SCALE_REHEARSAL.md):
  *   - committed scorer: PSI ≥ the 0.2 alarm line on the new regime
  *     AND admission keep-rate ≈ 0 (the collapse premise);
  *   - retrained scorer: keep-rate ≈ 1 on the adjudicated batch
  *     (admission restored), agreement on the ORIGINAL reference
  *     fixture labels stays high (TailA detection NOT forgotten);
  *   - the drain publishes the batch under the reloaded gate.
  *
  * Artifact PROMOTION stays a human-gated commit by design — a scorer
  * that silently retrains itself on the very slice it just alarmed on
  * erases the alarm's meaning (self-licensing drift). This rehearsal
  * is the executable remedy an operator runs BEFORE promoting.
  */
object RetrainRehearsal {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_RETRAIN_ITERS", "300").toInt
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val d = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val ref = d.filter(col("doc_id") % 2 === 0).select(col("doc_id"),
      Degradation.plant(col("doc_id"), col("text")).as("text"))
      .localCheckpoint()
    val quiet = d.filter(col("doc_id") % 4 === 1).select(col("doc_id"),
      Degradation.plant(col("doc_id"), col("text")).as("text"))
      .localCheckpoint()
    val drifted = d.filter(col("doc_id") % 4 === 3).select(col("doc_id"),
      concat(col("text"), lit(Degradation.TailB)).as("text"))
      .localCheckpoint()
    val nDrift = drifted.count()

    // 1. the committed scorer on the new regime: monitor alarm AND
    //    admission collapse (scores below the 0.5 keep line)
    val refBins = DriftMonitor.referenceBins(ref, "doc_id", "text", 10)
    val (_, _, psi0, un0) = DriftMonitor.batchStats(drifted, refBins, 10)
    val keep0 = QualityClassifier
      .classifyTrained(drifted, "doc_id", "text")
      .filter(col("score") >= 0.5).count()
    println(f"[rehearse] committed scorer on the new regime: " +
      f"psi_u=$psi0 unseen_u=$un0 keep ${keep0}/$nDrift")
    require(psi0 >= 200000L || un0 >= 100000L,
      "premise: the committed scorer must alarm on the new regime")
    require(keep0 * 10 < nDrift,
      "premise: admission collapse (keep-rate < 10%) — otherwise a " +
        "histogram refresh alone suffices and no retrain is warranted")

    // 2. the REAL gated loop quarantines the batch
    val root = java.nio.file.Files
      .createTempDirectory("retrain_rehearsal").toString
    val state = s"$root/state"
    val pub = Some(IngestStream.PublishConfig(s"$state/shards", 2048L))
    val gate = DriftMonitor.GateConfig(refBins)
    IngestStream.processBatch(quiet, 0L, state, 3, pub,
      IngestStream.MaintainConfig(), Some(gate))
    IngestStream.processBatch(drifted, 1L, state, 3, pub,
      IngestStream.MaintainConfig(), Some(gate))
    val qT = IngestStream.quarantineTable(spark, state)
    val qDocs = qT.read().get.select("doc_id", "text").localCheckpoint()
    require(qDocs.count() == nDrift, "the drifted batch must quarantine whole")

    // 3. adjudicate + retrain: reference fixture labels ∪ quarantined
    //    slice adjudicated keep
    val trainSet = ref.select(col("text"),
        Degradation.label(col("doc_id")).as("y"))
      .unionByName(qDocs.select(col("text"), lit(1).as("y")))
    val labeled = TrainQuality.featurize(spark, trainSet).cache()
    val t0 = System.nanoTime()
    val wRaw = TrainQuality.fit(spark, labeled, iters)
    val fitSec = (System.nanoTime() - t0) / 1e9
    val (bias2, w2) = TrainQuality.quantize(wRaw)

    // admission restored on the adjudicated regime; TailA not forgotten
    val keep2 = QualityClassifier
      .classifyWith(drifted, "doc_id", "text", bias2, w2)
      .filter(col("score") >= 0.5).count()
    val refN = ref.count()
    val refAgree = QualityClassifier
      .classifyWith(ref, "doc_id", "text", bias2, w2)
      .join(ref.select(col("doc_id"),
        Degradation.label(col("doc_id")).as("y")), "doc_id")
      .filter((col("score") >= 0.5) === (col("y") === 1)).count()
    println(f"[rehearse] retrained (${iters} iters, $fitSec%.1f s): " +
      f"keep ${keep2}/$nDrift on the regime, " +
      f"reference-label agreement ${refAgree}/$refN")
    require(keep2 * 10 >= nDrift * 9, "retrain must restore admission (>=90%)")
    require(refAgree * 100 >= refN * 95,
      "retrain must NOT forget the original spam labels (>=95%)")

    // 4. reload into the loop + requalified drain: histogram from the
    //    quarantined slice under the RETRAINED scorer; psi is
    //    structurally 0 (batch vs its own histogram, same scorer)
    val model2 = Some((bias2, w2))
    val gate2 = DriftMonitor.GateConfig(
      DriftMonitor.referenceBins(qDocs, "doc_id", "text", 10, model2),
      model = model2)
    IngestStream.drainQuarantine(spark, state, 2L, 3, pub,
      IngestStream.MaintainConfig(), Some(gate2))
    val monitor = IngestStream.gateMonitorTable(spark, state).read().get
      .filter(col("batch_id") === 2L).head()
    val pubDrift = spark.read.parquet(s"$state/shards")
      .filter(col("pub_id") >= 3000000000000L).count()
    println(s"[rehearse] drain under the reloaded scorer: " +
      s"monitor(batch=2) psi_u=${monitor.getLong(3)} " +
      s"alert=${monitor.getBoolean(5)}; published $pubDrift/$nDrift")
    require(!monitor.getBoolean(5) && pubDrift == nDrift,
      "the requalified drain must admit and publish the whole batch")
    println("[rehearse] PASS: alarm -> quarantine -> retrain -> reload -> drain")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
