package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.ClassifierEval

/** Hand-computed threshold sweep: a tiny scored frame whose PR curve
  * and calibration columns are derived on paper, so the cumulative
  * direction (≥ threshold), the bin edges (left-closed, top bin
  * closed at 1.0), and the single-division ratio conventions are all
  * pinned independently of the DuckDB oracle.
  */
class ClassifierEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("hand-computed 4-bin sweep: cumulative tp/fp, calibration, edges") {
    import spark.implicits._
    // nBins = 4 → bins [0,.25) [.25,.5) [.5,.75) [.75,1]
    // bin 0: scores .10(pos) .20(neg)      → n=2 pos=1 conf=.15
    // bin 1: score  .25(neg)  (left edge!) → n=1 pos=0 conf=.25
    // bin 3: scores .80(pos) 1.0(pos)      → n=2 pos=2 conf=.90
    val scored = Seq(
      (0.10, 1), (0.20, 0), (0.25, 0), (0.80, 1), (1.00, 1))
      .toDF("score", "truth")
    val rows = ClassifierEval.sweep(scored, "score", "truth", nBins = 4)
      .orderBy("bin").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 3L)) // bin 2 empty
    val byBin = rows.map(r => r.getLong(0) -> r).toMap

    // bin 3 (threshold .75): tp=2 fp=0 fn=1; prec 1, rec 2/3, f1 4/5
    val b3 = byBin(3L)
    assert(b3.getLong(1) == 750000L) // threshold_micros
    assert(b3.getLong(2) == 2 && b3.getLong(3) == 2)
    assert(b3.getAs[Double]("conf") == 0.9 && b3.getAs[Double]("acc") == 1.0)
    assert(b3.getAs[Double]("cal_gap") == 0.1)
    assert(b3.getAs[Long]("tp") == 2 && b3.getAs[Long]("fp") == 0 &&
      b3.getAs[Long]("fn") == 1)
    assert(b3.getAs[Double]("prec") == 1.0)
    assert(b3.getAs[Double]("rec") == 0.666667) // 2/3 HALF_UP 6dp
    assert(b3.getAs[Double]("f1") == 0.8)

    // bin 1 (threshold .25): the .25 score lands HERE (left-closed);
    // cumulative includes bin 3: tp=2 fp=1 fn=1
    val b1 = byBin(1L)
    assert(b1.getLong(2) == 1 && b1.getLong(3) == 0)
    assert(b1.getAs[Double]("acc") == 0.0 && b1.getAs[Double]("conf") == 0.25)
    assert(b1.getAs[Long]("tp") == 2 && b1.getAs[Long]("fp") == 1 &&
      b1.getAs[Long]("fn") == 1)
    assert(b1.getAs[Double]("prec") == 0.666667)
    assert(b1.getAs[Double]("f1") == 0.666667) // 4/6

    // bin 0 (threshold 0): everything predicted positive
    val b0 = byBin(0L)
    assert(b0.getAs[Long]("tp") == 3 && b0.getAs[Long]("fp") == 2 &&
      b0.getAs[Long]("fn") == 0)
    assert(b0.getAs[Double]("rec") == 1.0)
    assert(b0.getAs[Double]("conf") == 0.15 && b0.getAs[Double]("acc") == 0.5)
    assert(b0.getAs[Double]("cal_gap") == 0.35)
  }

  test("filter agreement: hand-computed 2x2, Cohen's kappa") {
    import spark.implicits._
    // a=2 (TT), b=1 (TF), c=1 (FT), d=2 (FF): po = 2/3, pe = 1/2,
    // kappa = (2/3 − 1/2)/(1/2) = 1/3
    val flags = Seq((true, true), (true, true), (true, false),
      (false, true), (false, false), (false, false))
      .toDF("rule_keep", "model_keep")
    val r = ClassifierEval.filterAgreement(flags, "rule_keep", "model_keep")
      .collect().head
    assert(r.getAs[Long]("n") == 6)
    assert(r.getAs[Long]("both_keep") == 2 && r.getAs[Long]("a_only") == 1 &&
      r.getAs[Long]("b_only") == 1 && r.getAs[Long]("both_drop") == 2)
    assert(r.getAs[Double]("agreement") == 0.666667)
    assert(r.getAs[Double]("kappa") == 0.333333)
  }

  test("score PSI: hand-computed two-bin drift, integer-sum total, one-sided bins go NULL") {
    import spark.implicits._
    val ref = Seq(0.05, 0.05, 0.95, 0.95).toDF("score")
    val cur = Seq(0.05, 0.95, 0.95, 0.95).toDF("score")
    val rows = ClassifierEval.scorePsi(ref, cur, "score", nBins = 2)
      .orderBy("bin").collect()
    assert(rows.length == 2)
    // bin 0: p=0.5 q=0.25, ln_u = ⌊ln 2·1e6 + .5⌋ = 693147,
    // psi_u = ⌊0.25·693147 + .5⌋ = 173287
    assert(rows(0).getAs[Double]("psi") == 0.173287)
    // bin 1: p=0.5 q=0.75, ln_u = ⌊ln(2/3)·1e6 + .5⌋ = −405465,
    // psi_u = ⌊(−0.25)·(−405465) + .5⌋ = 101366
    assert(rows(1).getAs[Double]("psi") == 0.101366)
    rows.foreach(r =>
      assert(r.getAs[Double]("psi_total") == 0.274653))

    // disjoint supports: psi NULL per bin, total 0 (surfaced, not fudged)
    val d = ClassifierEval.scorePsi(
      Seq(0.1).toDF("score"), Seq(0.9).toDF("score"), "score", nBins = 2)
      .orderBy("bin").collect()
    assert(d.forall(_.isNullAt(d.head.fieldIndex("psi"))))
    assert(d.forall(_.getAs[Double]("psi_total") == 0.0))
  }

  test("score 1.0 folds into the top bin; all-negative truth leaves rec/f1 defined-or-null") {
    import spark.implicits._
    val scored = Seq((1.00, 0), (0.99, 0)).toDF("score", "truth")
    val rows = ClassifierEval.sweep(scored, "score", "truth", nBins = 100)
      .collect()
    assert(rows.length == 1 && rows.head.getLong(0) == 99L)
    assert(rows.head.getAs[Long]("tp") == 0)
    // no positives anywhere: rec is NULL, f1 is NULL (0 denominator
    // only when fp also 0 — here fp=2, so f1 = 0)
    assert(rows.head.isNullAt(rows.head.fieldIndex("rec")))
    assert(rows.head.getAs[Double]("f1") == 0.0)
  }
}
