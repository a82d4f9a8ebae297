package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** Corpus-statistics relevance scoring for training-data curation:
  * TF-IDF and BM25 top-k terms per document (salient-term extraction /
  * keyword indexing over the `documents` table).
  *
  * Scale design (100 TB):
  *   - term frequencies: explode → ONE map-side-combinable groupBy on
  *     (doc, term) — the shuffle carries (doc, term, count) rows, not
  *     token streams;
  *   - document frequencies: a second partial-agg groupBy on term
  *     (vocabulary-sized output, far smaller than the corpus);
  *   - corpus scalars (N, avgdl) are single-row aggregates attached
  *     via broadcast — the same broadcast-scalar pattern as the
  *     top-holders share query, never a driver collect;
  *   - the tf⋈df join shuffles on term; AQE broadcast-upgrades it
  *     whenever the vocabulary fits, and the per-doc top-k window
  *     re-shuffles on doc_id only the surviving scored rows.
  *
  * Float parity with the DuckDB oracle: idf/score chains are written
  * in ONE fixed operation order on both sides (see CurationQueries
  * oracle SQL), `ln` is the single transcendental (both engines
  * correctly-rounded libm doubles), and results round via
  * Parity.roundHalfUp before comparison.
  */
object Relevance {

  /** (doc_id, term, tf) term frequencies over whitespace tokens —
    * public since round 11: the incremental path needs a batch's
    * doc-local tf frame to score against stored corpus statistics.
    */
  def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Document frequencies are ADDITIVE over disjoint doc sets, so the
    * stored df table absorbs an ingest batch's df counts with one
    * vocabulary-keyed outer join (∝ batch vocab at 100 TB under a
    * term-bucketed layout) — the corpus-statistics family's L52
    * moment; `q_t_tfidf_incremental` pins the identity against
    * from-scratch union statistics.
    */
  def mergeDocFreqs(stored: DataFrame, batch: DataFrame): DataFrame =
    stored.select(col("term"), col("df").as("__a"))
      .join(batch.select(col("term"), col("df").as("__b")),
        Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("__a"), lit(0L)) + coalesce(col("__b"), lit(0L)))
          .as("df"))

  /** Additive merge of the 1-row corpus doc-count frames. */
  def mergeCorpusCount(stored: DataFrame, batch: DataFrame): DataFrame =
    stored.unionByName(batch).agg(sum("n_docs").as("n_docs"))

  /** Smooth-idf TF-IDF (sklearn convention:
    * idf = ln((1+N)/(1+df)) + 1, score = tf·idf), top-k terms per doc
    * by (score desc, term asc). Returns
    * (doc_id, term, rank, tfidf).
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tfidfTopKWith(tf, dfreq, nDocs, k)
  }

  /** The TF-IDF scoring stage against PRECOMPUTED corpus statistics
    * (`dfreq` = (term, df), `nDocs` = 1-row doc count): [[tfidfTopK]]
    * delegates its from-scratch statistics here; the incremental path
    * feeds [[mergeDocFreqs]]/[[mergeCorpusCount]] of stored + batch
    * stats instead. Scoring itself only ever touches the docs in
    * `tf`, so scoring an ingest batch costs ∝ batch.
    */
  def tfidfTopKWith(tf: DataFrame, dfreq: DataFrame, nDocs: DataFrame,
      k: Int): DataFrame = {
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        col("tf").cast("double") *
          (log((lit(1.0) + col("n_docs")) / (lit(1.0) + col("df"))) + lit(1.0)))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("rank"),
        Parity.roundHalfUp(col("tfidf"), 6).as("tfidf"))
  }

  /** BM25 top-k terms per doc (k1 = 1.2, b = 0.75, Robertson-Sparck
    * Jones idf with the +1 smoothing:
    * idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    * score = idf · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))).
    * avgdl is computed as sum(dl)/N in EXPLICIT order so the oracle's
    * float path is identical. Returns (doc_id, term, rank, bm25).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = termFreqs(docs, idCol, textCol)
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val scored = tf.join(dl, "doc_id").join(dfreq, "term")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("bm25",
        col("idf") * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / col("avgdl")))))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("bm25").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("rank"),
        Parity.roundHalfUp(col("bm25"), 6).as("bm25"))
  }
}
