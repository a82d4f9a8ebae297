package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Fixed-width token chunking with stride — the sequence-prep step
  * between curation and tokenization: every document is cut into
  * `width`-token windows starting every `stride` tokens (overlap =
  * width − stride, the BERT/striding-window convention), each chunk
  * keeping full provenance (doc id, chunk index, start offset).
  *
  * Scale shape: one map-side explode per document — no shuffle, no
  * window, chunk count ≈ n_tokens / stride per doc. The explode fans
  * rows out ~(corpus tokens / stride)×, which is the output's actual
  * size — there is no smaller correct answer.
  */
object Chunking {

  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      width: Int, stride: Int): DataFrame = {
    require(stride >= 1 && width >= stride,
      s"need width >= stride >= 1, got width=$width stride=$stride")
    val toks = TextAnalysis.tokens(col(textCol))
    val starts = sequence(lit(0), size(col("toks")) - 1, lit(stride))
    df.select(col(idCol), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol), explode(starts).as("start_tok"), col("toks"))
      .select(col(idCol),
        (col("start_tok") / stride).cast("long").as("chunk_idx"),
        col("start_tok").cast("long"),
        size(slice(col("toks"), col("start_tok") + 1, lit(width)))
          .cast("long").as("n_tok"),
        array_join(slice(col("toks"), col("start_tok") + 1, lit(width)), " ")
          .as("chunk_text"))
  }
}
