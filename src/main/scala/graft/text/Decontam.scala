package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Eval-set decontamination — the n-gram-overlap scrub run before
  * training (the GPT-3 13-gram rule): a training document is
  * contaminated when it shares ANY word n-gram with a held-out
  * benchmark/eval document.
  *
  * Scale shape: the eval set is SMALL by construction (benchmarks are
  * thousands of docs, the corpus is billions), so its distinct n-gram
  * set is collected into a broadcast hash join — the training corpus
  * is scanned exactly once, map-side, and only matching (doc, ngram)
  * rows reach the per-doc count shuffle (≈ contamination volume, not
  * corpus volume). No corpus self-join anywhere.
  */
object Decontam {

  /** Per-doc distinct word n-grams via the codegen'd
    * [[graft.expressions.WordShingles]] kernel (lowercase, `\s+`
    * split, first-occurrence dedup).
    */
  private def ngrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol),
      explode(TextAnalysis.shingles(col(textCol), n)).as("ng"))

  /** Label every NON-eval doc with its eval-overlap count.
    *
    * @param evalPred selects the held-out eval docs by id; everything
    *                 else is the training side.
    * @param n        shingle width (8 here ≈ the published 13-gram /
    *                 8-gram decontamination range).
    */
  def flagOverlap(df: DataFrame, idCol: String, textCol: String,
      evalPred: Column => Column, n: Int): DataFrame = {
    val ng = ngrams(df, idCol, textCol, n)
    val evalNg = ng.filter(evalPred(col(idCol))).select("ng").distinct()
    val hits = ng.filter(!evalPred(col(idCol)))
      .join(broadcast(evalNg), Seq("ng"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap")) // shingles are per-doc distinct
    df.filter(!evalPred(col(idCol)))
      .select(col(idCol))
      // hits' row count tracks the contamination volume — data-dependent
      // and unbounded (boilerplate-heavy corpora contaminate millions of
      // docs), so unlike the eval-set broadcast above this join must
      // shuffle on the id key; AQE still downgrades it to broadcast at
      // runtime when the measured size is actually small.
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0L).as("contaminated"))
  }
}
