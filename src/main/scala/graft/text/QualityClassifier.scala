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
  * Scale shape: pure map-side projection, zero shuffles — tokenize,
  * hash and pool run in ONE pass inside the codegen'd
  * [[graft.expressions.FastTextPool]] kernel (the HOF composition
  * re-tokenized per lambda element: O(n²) per row, 44 s at sf0.1 vs
  * <1 s for the kernel). Pooling sums INTEGER weights, so cross-engine
  * parity holds without float-rounding tricks; a single double chain
  * (mean → sigmoid) runs once per row at the end.
  */
object QualityClassifier {

  /** Per-doc classifier score + label.
    *
    * @return (id, n_features, w_sum, score, label) — w_sum is the
    *         integer pooled weight (the order-independent gate
    *         column); score = sigmoid(4 · mean) rounded at 6 dp.
    */
  def classify(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val score = Parity.roundHalfUp(
      lit(1.0) / (lit(1.0) +
        exp(lit(-4.0) * (col("w_sum").cast("double") /
          col("n_features").cast("double") / lit(2147483648.0)))), 6)
    df.select(col(idCol),
        graft.expressions.ShingleFunctions.fastTextPool(col(textCol)).as("p"))
      .select(col(idCol), col("p.n_features").as("n_features"),
        col("p.w_sum").as("w_sum"))
      .filter(col("n_features") > 0L)
      .select(col(idCol), col("n_features"), col("w_sum"),
        score.as("score"),
        when(score >= 0.5, lit("__label__keep"))
          .otherwise(lit("__label__drop")).as("label"))
  }
}
