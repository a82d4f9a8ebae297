package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** L59b — Unigram-LM (SentencePiece-style, Kudo 2018) tokenization as
  * the alternative to the BPE artifact behind the SAME
  * committed-artifact slot: pieces carry integer-scaled log-probs
  * learned by [[graft.TrainUnigram]] (Viterbi-EM over the bounded
  * word-TYPE table), and encoding is a deterministic Viterbi
  * segmentation — max total log-prob, ties to fewer pieces, then to
  * the longer final piece. Where BPE greedily applies ranked merges,
  * the unigram model picks the globally best segmentation under the
  * learned piece distribution — the tokenizer family most modern LLM
  * vocabularies use.
  *
  * Scale shape: identical to [[BpeTokenizer]] — the artifact is a
  * bounded broadcastable table, application is per-word map-side with
  * a per-partition memo, no shuffle, no driver data path.
  *
  * Oracle contract: SQL cannot run Viterbi, so the artifact carries
  * the piece count of every TRAINING word type (`vocab` section); the
  * gate joins that table while the engine runs the real decoder, and
  * UnigramSpec asserts the live encoder reproduces every stored count.
  * All runtime arithmetic is on the artifact's SCALED LONG log-probs
  * — no floating point leaves the trainer, so segmentation is
  * bit-deterministic everywhere.
  */
object UnigramTokenizer {

  val Resource = "/graft/unigram-pieces-v1.tsv"

  /** Longest candidate piece the Viterbi window considers — must
    * match the trainer's seeding bound.
    */
  val MaxPieceLen = 6

  /** Scaled log-prob charged per UNKNOWN single character (no piece
    * covers it): well below any trained piece, so known pieces always
    * win, but finite — the encoder is total on any input (the
    * SentencePiece unk-score convention).
    */
  val UnkLp: Long = -25000000L

  final case class DocTokens(docId: Long, nWords: Int, nUniKnown: Long,
      nOov: Int)

  /** (piece → scaled log-prob, train-vocab word → stored piece count). */
  def loadArtifact(): (Map[String, Long], Map[String, Int]) = {
    val in = getClass.getResourceAsStream(Resource)
    require(in != null, s"missing unigram artifact $Resource")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filterNot(l => l.startsWith("#") || l.isEmpty).toVector
    in.close()
    val pieces = lines.filter(_.startsWith("piece\t")).map { l =>
      val f = l.split("\t")
      f(1) -> f(2).toLong
    }.toMap
    val vocab = lines.filter(_.startsWith("vocab\t")).map { l =>
      val f = l.split("\t")
      f(1) -> f(2).toInt
    }.toMap
    (pieces, vocab)
  }

  /** Viterbi segmentation under scaled-long log-probs: best total
    * score over all segmentations into pieces of length ≤
    * [[MaxPieceLen]] (an unknown character stands in as a single-char
    * UNK piece at [[UnkLp]]). Deterministic tie order: higher score,
    * then fewer pieces, then the longer last piece.
    */
  def encodeWith(lp: Map[String, Long], word: String): Vector[String] = {
    val n = word.length
    if (n == 0) return Vector.empty
    val score = Array.fill(n + 1)(Long.MinValue)
    val pieces = Array.fill(n + 1)(Int.MaxValue)
    val back = Array.fill(n + 1)(-1)
    score(0) = 0L
    pieces(0) = 0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - MaxPieceLen)
      while (i < j) {
        if (score(i) != Long.MinValue) {
          val piece = word.substring(i, j)
          val plp = lp.get(piece) match {
            case s @ Some(_) => s
            case None => if (j - i == 1) Some(UnkLp) else None
          }
          plp.foreach { p =>
            val s = score(i) + p
            val np = pieces(i) + 1
            val better = s > score(j) ||
              (s == score(j) && (np < pieces(j) ||
                (np == pieces(j) && (back(j) < 0 || i < back(j)))))
            if (better) {
              score(j) = s
              pieces(j) = np
              back(j) = i
            }
          }
        }
        i += 1
      }
      j += 1
    }
    var at = n
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    while (at > 0) {
      val i = back(at)
      rev += word.substring(i, at)
      at = i
    }
    rev.reverseIterator.toVector
  }

  /** Per-partition encoder slot (the BPE shape): artifact parsed once,
    * piece counts memoized per word.
    */
  def load(): Seq[String] => (Int, Long, Int) = {
    val (pieces, vocab) = loadArtifact()
    val memo = scala.collection.mutable.HashMap.empty[String, Int]
    toks => {
      var known = 0L
      var oov = 0
      toks.foreach { t =>
        if (vocab.contains(t))
          known += memo.getOrElseUpdate(t, encodeWith(pieces, t).length)
        else oov += 1
      }
      (toks.length, known, oov)
    }
  }

  /** Unigram piece counts per document — mirrors
    * [[BpeTokenizer.tokenCounts]] so the two tokenizers are
    * drop-in comparable (the L72 fertility audit joins both).
    */
  def tokenCounts(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String): Dataset[DocTokens] = {
    import spark.implicits._
    val rows = docs.select(col(idCol).cast("long"),
        TextAnalysis.tokens(col(textCol)))
      .as[(Long, Seq[String])]
    rows.mapPartitions { it =>
      val enc = load()
      it.map { case (id, toks) =>
        val (nw, known, oov) = enc(toks)
        DocTokens(id, nw, known, oov)
      }
    }
  }

  /** The vocab-count section as a DuckDB VALUES list `(term, n_sub)`. */
  def sqlValues(): String = {
    val (_, vocab) = loadArtifact()
    vocab.toSeq.sortBy(_._1).map { case (t, n) =>
      s"('${t.replace("'", "''")}', $n)"
    }.mkString(", ")
  }
}
