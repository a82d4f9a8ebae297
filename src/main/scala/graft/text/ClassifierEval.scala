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

  /** Agreement audit between two document filters — "do my cheap
    * rule gate and my trained model gate agree, and is the agreement
    * better than chance?": the 2×2 confusion counts, raw agreement,
    * and Cohen's κ = (p_o − p_e)/(1 − p_e) with the chance term from
    * the marginals. One row out of one aggregation — the counts are
    * map-side-combining conditional sums, every ratio a fixed-order
    * chain over exact longs (n² stays well inside the exact-double
    * range at any corpus the κ statistic is meaningful for).
    *
    * @param flags one row per doc with two boolean columns.
    */
  def filterAgreement(flags: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val a = col(aCol); val b = col(bCol)
    val counted = flags.agg(
      count(lit(1)).as("n"),
      sum(when(a && b, 1L).otherwise(0L)).as("both_keep"),
      sum(when(a && !b, 1L).otherwise(0L)).as("a_only"),
      sum(when(!a && b, 1L).otherwise(0L)).as("b_only"),
      sum(when(!a && !b, 1L).otherwise(0L)).as("both_drop"))
    val po = (col("both_keep") + col("both_drop")).cast("double") /
      col("n").cast("double")
    val pe = ((col("both_keep") + col("a_only")) *
      (col("both_keep") + col("b_only")) +
      (col("b_only") + col("both_drop")) *
        (col("a_only") + col("both_drop"))).cast("double") /
      (col("n") * col("n")).cast("double")
    counted.select(col("n"), col("both_keep"), col("a_only"),
      col("b_only"), col("both_drop"),
      Parity.roundHalfUp(po, 6).as("agreement"),
      when(lit(1.0) - pe =!= 0.0,
        Parity.roundHalfUp((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }

  /** Population-stability-index drift between two score
    * distributions — the monitor a production filter runs between
    * snapshots ("did my quality scores shift since the reference
    * corpus?"): per score bin, both sides' shares and the PSI
    * summand (p − q)·ln(p/q), plus the total.
    *
    * Scale shape: ONE combining shuffle tags each doc's bin and side
    * and collapses both corpora to ≤ nBins summary rows; totals ride
    * in as a 1-row broadcast. Parity: ln quantizes to 1e-6 fixed
    * point (the perplexity/tf-idf convention) and the summand
    * quantizes to an integer psi_u = ⌊(p−q)·ln_u + 0.5⌋, so the
    * total is an EXACT integer sum — order-free — and every emitted
    * double is k/1e6. Bins where either side is empty carry a NULL
    * psi (the standard merge-or-floor caveat, surfaced rather than
    * fudged) and are excluded from the total.
    */
  /** Score → bin index: the shared left-closed centile/decile rule
    * (6-dp scores recover their exact 1e-6 integer; the top bin is
    * closed at 1.0). Used by the sweep, the PSI table, and the
    * streaming drift monitor, so every consumer bins identically.
    */
  def scoreBin(score: org.apache.spark.sql.Column,
      nBins: Int): org.apache.spark.sql.Column = {
    require(nBins > 0 && 1000000 % nBins == 0,
      s"nBins must divide 1e6 for exact bin edges: $nBins")
    least(floor(round(score * lit(1000000.0)).cast("long") /
      lit(1000000L / nBins)), lit(nBins - 1).cast("long")).cast("long")
  }

  /** The PSI summand in the repo's fixed-point convention, driver-side
    * (for BOUNDED per-bin counts — ≤ nBins rows): ln quantized to
    * 1e-6, the summand quantized to an integer, identical operation
    * order to [[scorePsi]]'s in-plan arithmetic — so a monitor
    * computing this on collected bin counts lands on the SAME psi_u
    * the batch gate computes in-plan (DriftMonitorSpec pins it).
    * Bins missing on either side contribute nothing (the scorePsi
    * NULL convention).
    */
  def psiFixedPoint(ref: Seq[(Long, Long)], cur: Seq[(Long, Long)]): Long = {
    val n = ref.map(_._2).sum
    val m = cur.map(_._2).sum
    val curMap = cur.toMap
    ref.collect {
      case (bin, nRef) if nRef > 0 && curMap.getOrElse(bin, 0L) > 0 =>
        val nCur = curMap(bin)
        val pRef = nRef.toDouble / n.toDouble
        val pCur = nCur.toDouble / m.toDouble
        val lnU = math.floor(math.log((nRef * m).toDouble /
          (nCur * n).toDouble) * 1000000.0 + 0.5).toLong
        math.floor((pRef - pCur) * lnU.toDouble + 0.5).toLong
    }.sum
  }

  def scorePsi(ref: DataFrame, cur: DataFrame, scoreCol: String,
      nBins: Int): DataFrame = {
    require(nBins > 0 && 1000000 % nBins == 0,
      s"nBins must divide 1e6 for exact bin edges: $nBins")
    def binned(df: DataFrame, side: String) = df.select(
      scoreBin(col(scoreCol), nBins).as("bin"),
      lit(side).as("side"))
    val bins = binned(ref, "ref").union(binned(cur, "cur"))
      .groupBy("bin")
      .agg(sum(when(col("side") === "ref", 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("side") === "cur", 1L).otherwise(0L)).as("n_cur"))
    val totals = bins.agg(sum("n_ref").as("nt_ref"), sum("n_cur").as("nt_cur"))
    val withPsi = bins.crossJoin(broadcast(totals))
      .withColumn("p_ref_raw",
        col("n_ref").cast("double") / col("nt_ref").cast("double"))
      .withColumn("p_cur_raw",
        col("n_cur").cast("double") / col("nt_cur").cast("double"))
      .withColumn("ln_u",
        when(col("n_ref") > 0 && col("n_cur") > 0,
          floor(log((col("n_ref") * col("nt_cur")).cast("double") /
            (col("n_cur") * col("nt_ref")).cast("double")) *
            lit(1000000.0) + lit(0.5)).cast("long")))
      .withColumn("psi_u",
        when(col("ln_u").isNotNull,
          floor((col("p_ref_raw") - col("p_cur_raw")) *
            col("ln_u").cast("double") + lit(0.5)).cast("long")))
    val psiTotal = withPsi.agg(
      coalesce(sum("psi_u"), lit(0L)).as("psi_total_u"))
    withPsi.crossJoin(broadcast(psiTotal))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        Parity.roundHalfUp(col("p_ref_raw"), 6).as("p_ref"),
        Parity.roundHalfUp(col("p_cur_raw"), 6).as("p_cur"),
        (col("psi_u").cast("double") / 1000000.0).as("psi"),
        (col("psi_total_u").cast("double") / 1000000.0).as("psi_total"))
  }
}
