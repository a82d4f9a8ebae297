package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** L62 — TextRank keyword extraction (Mihalcea & Tarau 2004, the
  * word-graph half): per document, build the co-occurrence graph of
  * its tokens (undirected edge per ADJACENT token pair, weight =
  * co-occurrence count), run weighted PageRank
  * `WS(v) = (1−d) + d·Σ_u (w_uv / wdeg(u))·WS(u)` with d = 0.85 for a
  * FIXED number of iterations from the paper's uniform init, and emit
  * the top-k tokens by centrality — a graph-global salience ranking
  * that complements the frequency family (F7 priority, F13 rules,
  * TF-IDF/BM25) with one that rewards tokens hubbing many distinct
  * contexts.
  *
  * Scale shape: the graph never leaves the row. Each document's
  * entire PageRank runs inside a per-partition map over its own
  * token array (graphs are doc-local and bounded by doc length), so
  * the operator is ONE map-side pass — no edge table, no
  * per-iteration join, no shuffle of any kind; it fuses behind
  * whatever scan produced the tokens, the BpeTokenizer kernel
  * convention. Cost ∝ Σ doc_len per iteration, embarrassingly
  * parallel at 100 TB.
  *
  * Determinism/oracle parity: the one order-sensitive step is the
  * per-node sum of neighbor contributions, so each contribution is
  * quantized to a 1e-9 fixed-point long and summed as integers
  * (associative — identical under any neighbor order), then the next
  * score is the fixed double chain `0.15 + 0.85·(S/1e9)` — the house
  * Lloyd/nll convention. The DuckDB oracle unrolls the same
  * iterations over the exploded pair table and matches bit-for-bit.
  */
object TextRank {

  final case class Keyword(docId: Long, keyword: String, score: Double,
      rank: Int)

  /** Per-document kernel: tokens → top-k (keyword, 6-dp score, rank).
    * Ties rank by (score DESC, token ASC); tokens of a one-token doc
    * are isolated nodes and settle at 1−d.
    */
  def keywordsOf(toks: Seq[String], k: Int, iters: Int): Seq[(String, Double, Int)] = {
    val vocab = toks.distinct.sorted.toArray
    if (vocab.isEmpty) return Seq.empty
    val idx = vocab.zipWithIndex.toMap
    // undirected adjacency with multiplicity: consecutive pairs a≠b
    val w = scala.collection.mutable.Map.empty[(Int, Int), Long]
    toks.iterator.zip(toks.iterator.drop(1)).foreach { case (a, b) =>
      if (a != b) {
        val (ia, ib) = (idx(a), idx(b))
        w((ia, ib)) = w.getOrElse((ia, ib), 0L) + 1L
        w((ib, ia)) = w.getOrElse((ib, ia), 0L) + 1L
      }
    }
    val wdeg = new Array[Long](vocab.length)
    w.foreach { case ((u, _), c) => wdeg(u) += c }
    var ws = Array.fill(vocab.length)(1.0)
    for (_ <- 0 until iters) {
      val q = new Array[Long](vocab.length)
      w.foreach { case ((u, v), c) =>
        q(v) += math.floor(((c.toDouble / wdeg(u)) * ws(u))
          * 1000000000.0 + 0.5).toLong
      }
      ws = q.map(s => 0.15 + 0.85 * (s / 1000000000.0))
    }
    vocab.indices
      .sortBy(i => (-ws(i), vocab(i)))
      .take(k)
      .zipWithIndex
      .map { case (i, r) =>
        (vocab(i), graft.functions.Parity.roundHalfUpScalar(ws(i), 6), r + 1)
      }
  }

  final case class Summary(docId: Long, chunkIdx: Int, summary: String,
      score: Double, rank: Int)

  /** L63 — the SENTENCE half of the paper, over PSEUDO-sentences:
    * this corpus carries unpunctuated token streams, so "sentences"
    * are fixed `chunkSize`-token windows (the standard recourse for
    * boundary-less text; a punctuated corpus would swap the chunker
    * and nothing else). Chunk similarity is the paper's
    * `|overlap| / (ln|s_i| + ln|s_j|)` (ln is bit-identical across
    * JVM/DuckDB on the bounded chunk-length range — probed before
    * this was adopted), quantized to a 1e-9 fixed-point long per
    * edge so degrees and neighbor sums stay order-free integers;
    * PageRank then runs exactly as [[keywordsOf]] and the top-k
    * chunks are the extractive summary. Same shuffle-free per-doc
    * kernel shape.
    */
  def summarizeOf(toks: Seq[String], chunkSize: Int, k: Int,
      iters: Int): Seq[(Int, String, Double, Int)] = {
    val chunks = toks.grouped(chunkSize).toArray
    if (chunks.isEmpty) return Seq.empty
    val dts = chunks.map(_.distinct.toSet)
    val w = scala.collection.mutable.Map.empty[(Int, Int), Long]
    for (i <- chunks.indices; j <- chunks.indices if i != j) {
      val (ni, nj) = (chunks(i).length, chunks(j).length)
      if (ni > 1 && nj > 1) {
        val ov = dts(i).count(dts(j))
        if (ov > 0) {
          val wq = math.floor((ov.toDouble /
            (math.log(ni.toDouble) + math.log(nj.toDouble)))
            * 1000000000.0 + 0.5).toLong
          if (wq > 0L) w((i, j)) = wq
        }
      }
    }
    val wdeg = new Array[Long](chunks.length)
    w.foreach { case ((u, _), c) => wdeg(u) += c }
    var ws = Array.fill(chunks.length)(1.0)
    for (_ <- 0 until iters) {
      val q = new Array[Long](chunks.length)
      w.foreach { case ((u, v), c) =>
        q(v) += math.floor(((c.toDouble / wdeg(u)) * ws(u))
          * 1000000000.0 + 0.5).toLong
      }
      ws = q.map(s => 0.15 + 0.85 * (s / 1000000000.0))
    }
    chunks.indices
      .sortBy(i => (-ws(i), i))
      .take(k)
      .zipWithIndex
      .map { case (i, r) =>
        (i, chunks(i).mkString(" "),
          graft.functions.Parity.roundHalfUpScalar(ws(i), 6), r + 1)
      }
  }

  /** Extractive-summary operator: top-k pseudo-sentence chunks per
    * doc as (doc_id, chunk_idx, summary, score, rank).
    */
  def summarize(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, chunkSize: Int = 8, k: Int = 2,
      iters: Int = 4): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), TextAnalysis.tokens(col(textCol)))
      .as[(Long, Seq[String])]
      .mapPartitions(_.flatMap { case (id, toks) =>
        summarizeOf(toks, chunkSize, k, iters).map { case (ci, t, s, r) =>
          Summary(id, ci, t, s, r)
        }
      })
      .toDF()
      .select(col("docId").as("doc_id"), col("chunkIdx").as("chunk_idx"),
        col("summary"), col("score"), col("rank"))
  }

  /** The operator: one exploded row per (doc, keyword) with score and
    * rank. Tokenization happens in the ENGINE (the F12 convention) so
    * the oracle mirrors the exact token sequence.
    */
  def keywords(spark: SparkSession, df: DataFrame, idCol: String,
      textCol: String, k: Int = 3, iters: Int = 4): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), TextAnalysis.tokens(col(textCol)))
      .as[(Long, Seq[String])]
      .mapPartitions(_.flatMap { case (id, toks) =>
        keywordsOf(toks, k, iters).map { case (t, s, r) => Keyword(id, t, s, r) }
      })
      .toDF()
      .select(col("docId").as("doc_id"), col("keyword"),
        col("score"), col("rank"))
  }
}
