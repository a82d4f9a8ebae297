package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** N-gram language-model perplexity filtering — the CCNet-style
  * quality gate: score every document by its perplexity under a
  * reference LM and keep the low-perplexity (fluent) side. The
  * published pipelines use a KenLM 5-gram trained on Wikipedia; the
  * engine's deterministic analog is an add-one-smoothed BIGRAM model
  * trained on a reference slice of the corpus itself:
  *
  *   p(w2 | w1) = (c(w1,w2) + 1) / (hist(w1) + V)
  *
  * with hist(w1) = occurrences of w1 as a bigram history in the
  * training slice and V = training vocabulary size. A document's score
  * is the mean negative log-prob over its bigram transitions;
  * perplexity = exp(mean NLL).
  *
  * Scale shape (the part that must survive 100 TB):
  *   - the model tables (bigram counts, history counts) are built with
  *     ONE map-side-combinable aggregation over the training slice and
  *     joined to the corpus on their natural keys — two shuffle joins,
  *     never a collect. In production the reference model is a fixed
  *     artifact, so both joins typically become broadcasts;
  *   - V and the token total are scalar aggregates attached via the
  *     repo's broadcast-scalar cross join (1 row, no driver round-trip);
  *   - cross-engine determinism: per-token NLL is fixed-point-rounded
  *     to 1e-6 and summed as LONGS — integer addition commutes, so the
  *     distributed sum is order-independent and the DuckDB oracle
  *     matches exactly (the repo rule for order-dependent double sums).
  */
object LangModel {

  /** Bigram transitions of a token array as (w1, w2) structs. */
  private def bigrams(toks: Column): Column =
    transform(sequence(lit(0), size(toks) - 2),
      i => struct(element_at(toks, i + 1).as("w1"),
        element_at(toks, i + 2).as("w2")))

  /** Per-doc bigram perplexity under the slice-trained LM.
    *
    * @param trainPred selects the reference-model slice by id
    * @param threshold keep = perplexity (rounded) <= threshold
    * @return (doc_id, n_bigrams, nll_sum_u, ppl, keep) — nll_sum_u is
    *         the scaled-integer NLL sum (1e-6 units), the
    *         order-independent gate column.
    */
  def perplexity(df: DataFrame, idCol: String, textCol: String,
      trainPred: Column => Column, threshold: Double): DataFrame = {
    val tk = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)

    val train = tk.filter(trainPred(col(idCol)))
    val trainPairs = train
      .select(explode(bigrams(col("toks"))).as("p"))
      .select(col("p.w1"), col("p.w2"))
    val bigramCounts = trainPairs.groupBy("w1", "w2")
      .agg(count(lit(1)).as("c12"))
    val histCounts = trainPairs.groupBy("w1")
      .agg(count(lit(1)).as("c1"))
    val vocab = train
      .select(explode(col("toks")).as("w"))
      .agg(count_distinct(col("w")).as("v"))

    // corpus side: one scan, join counts on their natural keys
    val cp = tk
      .select(col(idCol), explode(bigrams(col("toks"))).as("p"))
      .select(col(idCol), col("p.w1"), col("p.w2"))
      .join(bigramCounts, Seq("w1", "w2"), "left")
      .join(histCounts, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))

    // add-one NLL in 1e-6 fixed point: ln(hist + V) - ln(c12 + 1) >= 0
    val nll = log(coalesce(col("c1"), lit(0L)).cast("double") +
        col("v").cast("double")) -
      log(coalesce(col("c12"), lit(0L)).cast("double") + lit(1.0))
    val scored = cp.select(col(idCol),
      floor(nll * lit(1e6) + lit(0.5)).cast("long").as("nll_u"))

    val ppl = Parity.roundHalfUp(
      exp((col("nll_sum_u").cast("double") / lit(1e6)) /
        col("n_bigrams").cast("double")), 6)
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("nll_u")).as("nll_sum_u"))
      .select(col(idCol), col("n_bigrams"), col("nll_sum_u"),
        ppl.as("ppl"), (ppl <= lit(threshold)).as("keep"))
  }
}
