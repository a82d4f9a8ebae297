package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** Mixed-language detection: language-ID over fixed token WINDOWS
  * instead of whole documents, rolled up to a per-doc language
  * profile. Whole-doc langid (q_t_langid) mislabels concatenation
  * artifacts — a crawl page that is 70 % English boilerplate around a
  * 30 % Spanish body reads "en" and the Spanish mass silently enters
  * the en bucket; window-level voting surfaces exactly that mixing
  * (the CCNet/fastText pipelines run the same doc-vs-segment split).
  *
  * Output per doc (only docs with ≥ 1 token appear, like chunking):
  * primary_lang (most window votes; ties → lexicographic), n_windows,
  * n_langs (distinct non-'und' window langs), mix_ratio (fraction of
  * windows voting ≠ primary, 6 dp), is_mixed (n_langs > 1).
  *
  * Scale shape: reuses [[graft.operators.Chunking]]'s map-side explode
  * (no shuffle, fan-out = tokens/window) and the codegen'd
  * [[graft.expressions.LangIdExpr]] kernel per window; then ONE
  * groupBy((doc, lang)) shuffle whose output is ≤ |langs|+1 rows per
  * doc, a per-doc window over those few rows (skew-free — the
  * partition key is the doc id), and the final per-doc fold. The
  * whole-doc langid's zero-shuffle shape is not achievable here:
  * window votes ARE the operator's output size.
  */
object LanguageMix {

  def profile(df: DataFrame, idCol: String, textCol: String,
      window: Int = 50): DataFrame = {
    val chunks = graft.operators.Chunking.chunkByTokens(df, idCol, textCol,
      width = window, stride = window)
    val perLang = chunks
      .select(col(idCol),
        TextAnalysis.langId(col("chunk_text")).getField("lang").as("wl"))
      .groupBy(col(idCol), col("wl")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("c").desc, col("wl").asc)
    perLang
      .withColumn("rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(
        max(when(col("rn") === 1, col("wl"))).as("primary_lang"),
        sum("c").as("n_windows"),
        count(when(col("wl") =!= "und", lit(1))).as("n_langs"),
        Parity.roundHalfUp(
          lit(1.0) - max(when(col("rn") === 1, col("c"))).cast("double") /
            sum("c").cast("double"), 6).as("mix_ratio"),
        (count(when(col("wl") =!= "und", lit(1))) > 1L).as("is_mixed"))
  }
}
