package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** Threshold-sweep evaluation for a score-producing document filter —
  * the step a real pipeline runs BETWEEN training a quality classifier
  * and deploying it: pick the admission threshold from the
  * precision/recall trade-off, and check the scores are CALIBRATED
  * (a 0.9 bucket should be ~90% clean) before anyone treats them as
  * probabilities.
  *
  * One output row per score bin `b` (score ∈ [b/nBins, (b+1)/nBins),
  * top bin closed at 1.0), carrying both grains the two diagnostics
  * need:
  *   - reliability-diagram columns for THAT bin: `n`, `n_pos`,
  *     `conf` (mean score), `acc` (positive rate), `cal_gap`
  *     (|acc − conf| — the summand of expected calibration error);
  *   - threshold-sweep columns for "predict positive at score ≥
  *     b/nBins": cumulative `tp`/`fp`/`fn` and single-division
  *     `prec`/`rec`/`f1`.
  *
  * Scale shape: scores quantize to 1e-6 fixed point map-side (they are
  * 6-dp-rounded already, so the long is exact), ONE map-side-combining
  * shuffle collapses the corpus to ≤ nBins summary rows, and the
  * cumulative sweep is an ordered window over those BOUNDED rows only
  * (the L56 bucket-offsets precedent — never a window over data rows).
  * Totals ride in as a 1-row broadcast. Every ratio is a single
  * IEEE division of exact longs rounded at 6 dp (f1 computed as
  * 2·tp/(2·tp+fp+fn), not from the rounded prec/rec), so the DuckDB
  * oracle mirrors bit-for-bit.
  */
object ClassifierEval {

  /** @param scored one row per document with `scoreCol` (a 6-dp-rounded
    *               double in [0, 1]) and `labelCol` (1 = positive).
    * @param nBins  must divide 1e6 so bin thresholds are exact micros.
    */
  def sweep(scored: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int): DataFrame = {
    require(nBins > 0 && 1000000 % nBins == 0,
      s"nBins must divide 1e6 for exact thresholds: $nBins")
    val widthMicros = 1000000L / nBins
    val micros = round(col(scoreCol) * lit(1000000.0)).cast("long")
    val bins = scored
      .select(
        least(floor(micros / lit(widthMicros)), lit(nBins - 1).cast("long"))
          .cast("long").as("bin"),
        col(labelCol).cast("long").as("pos"),
        micros.as("m"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("pos").as("n_pos"),
        sum("m").as("score_sum_u"))
    val totals = bins.agg(sum("n_pos").as("total_pos"))
    // cumulative from the top: predicted-positive mass at each cut —
    // an ordered window over ≤ nBins SUMMARY rows (PlanAudit-whitelisted)
    val w = Window.orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins.crossJoin(broadcast(totals))
      .withColumn("tp", sum("n_pos").over(w))
      .withColumn("pp", sum("n").over(w))
      .select(
        col("bin"),
        (col("bin") * widthMicros).as("threshold_micros"),
        col("n"), col("n_pos"),
        Parity.roundHalfUp(col("score_sum_u").cast("double") /
          (col("n").cast("double") * 1000000.0), 6).as("conf"),
        Parity.roundHalfUp(col("n_pos").cast("double") /
          col("n").cast("double"), 6).as("acc"),
        Parity.roundHalfUp(abs(col("n_pos").cast("double") /
            col("n").cast("double") -
            col("score_sum_u").cast("double") /
              (col("n").cast("double") * 1000000.0)), 6)
          .as("cal_gap"),
        col("tp"),
        (col("pp") - col("tp")).as("fp"),
        (col("total_pos") - col("tp")).as("fn"),
        Parity.roundHalfUp(col("tp").cast("double") /
          col("pp").cast("double"), 6).as("prec"),
        when(col("total_pos") > 0, Parity.roundHalfUp(
          col("tp").cast("double") / col("total_pos").cast("double"), 6))
          .as("rec"),
        // 2tp + fp + fn = (tp + fp) + (tp + fn) = pp + total positives
        when(col("pp") + col("total_pos") > 0,
          Parity.roundHalfUp((lit(2.0) * col("tp").cast("double")) /
            (col("pp") + col("total_pos")).cast("double"), 6))
          .as("f1"))
  }
}
