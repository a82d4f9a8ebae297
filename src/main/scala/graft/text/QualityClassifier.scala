package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** fastText-style linear quality classifier — the model-based document
  * filter every modern pretraining pipeline runs after the rule-based
  * gates (LLaMA's "wiki-reference" classifier, GPT-3's quality LR):
  * word unigram + bigram features, feature hashing into a bounded
  * bucket space, mean pooling, a linear layer, sigmoid.
  *
  * The sandbox has no trained artifact, so the bucket weights are a
  * DETERMINISTIC pseudo-model derived from the feature hash itself
  * (uniform in [-2³¹, 2³¹), the same honest-stub treatment as
  * ModelSentiment/Multimodal): swapping in a real fastText .bin means
  * replacing [[hashWeight]] with a broadcast lookup — every other part
  * of the plan (tokenize, hash, pool, squash, threshold) is the real
  * production shape.
  *
  * Scale shape: pure map-side projection, zero shuffles, no UDF — the
  * per-row chain is split/transform/aggregate over built-ins. Pooling
  * sums INTEGER weights (a fixed-order array fold on both engines), so
  * cross-engine parity holds without float-rounding tricks; a single
  * double chain (mean → sigmoid) runs once per row at the end.
  */
object QualityClassifier {

  /** Word-bigram feature strings ("w1 w2"), matching the LM bigram
    * construction.
    */
  private def bigramFeats(toks: Column): Column =
    transform(sequence(lit(0), size(toks) - 2),
      i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2)))

  /** Pseudo-model weight for a feature: md5-prefix hash recentred to
    * [-2³¹, 2³¹) — what a trained bucket array would return.
    */
  private def hashWeight(feat: Column): Column =
    conv(substring(md5(feat), 1, 8), 16, 10).cast("long") - 2147483648L

  /** Per-doc classifier score + label.
    *
    * @return (id, n_features, w_sum, score, label) — w_sum is the
    *         integer pooled weight (the order-independent gate
    *         column); score = sigmoid(4 · mean) rounded at 6 dp.
    */
  def classify(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val feats = when(size(toks) >= 2, concat(toks, bigramFeats(toks)))
      .otherwise(toks)
    val wsum = aggregate(transform(feats, f => hashWeight(f)),
      lit(0L), (acc, x) => acc + x)
    val score = Parity.roundHalfUp(
      lit(1.0) / (lit(1.0) +
        exp(lit(-4.0) * (col("w_sum").cast("double") /
          col("n_features").cast("double") / lit(2147483648.0)))), 6)
    df.select(col(idCol), size(feats).cast("long").as("n_features"),
        wsum.as("w_sum"))
      .filter(col("n_features") > 0L)
      .select(col(idCol), col("n_features"), col("w_sum"),
        score.as("score"),
        when(score >= 0.5, lit("__label__keep"))
          .otherwise(lit("__label__drop")).as("label"))
  }
}
