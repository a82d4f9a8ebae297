package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** L59 — learned BPE tokenization behind the committed-artifact slot
  * (the F12 pattern): real byte-pair-encoding merges trained by
  * [[graft.TrainBpe]] and shipped as a classpath resource
  * (bpe-merges-v1.tsv), applied by the standard lowest-rank-first
  * merge loop. This replaces "token counting ≈ a BPE-ish regex" with
  * an actual learned subword vocabulary — the tokenizer a training
  * pipeline's token budgets, shard cuts, and packing really run on.
  *
  * Scale shape: the artifact is a bounded broadcastable table (ranked
  * merges); application is per-word, map-side, with a per-partition
  * word→encoding memo (Zipf makes the memo hit rate ~1), streamed
  * through one `mapPartitions` — no shuffle, no driver data path.
  *
  * Oracle contract: SQL cannot run the merge loop, so the artifact
  * carries the encoded subtoken count of every TRAINING word type
  * (`vocab` section) — the gate joins that table (VALUES-interpolated,
  * the F12 convention) while the engine runs the real encoder;
  * BpeSpec asserts the live encoder reproduces every stored count, so
  * the table is provably the encoder restricted to the trained
  * vocabulary. Out-of-vocabulary words are still encoded live (BPE
  * applies to any string) and surface in the gate as a separate
  * `n_oov` count rather than an unverifiable token total.
  */
object BpeTokenizer {

  val Resource = "/graft/bpe-merges-v1.tsv"

  final case class DocTokens(docId: Long, nWords: Int, nBpeKnown: Long,
      nOov: Int)

  /** (ranked merges, train-vocab word → stored subtoken count). */
  def loadArtifact(): (Vector[(String, String)], Map[String, Int]) = {
    val in = getClass.getResourceAsStream(Resource)
    require(in != null, s"missing BPE artifact $Resource")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filterNot(l => l.startsWith("#") || l.isEmpty).toVector
    in.close()
    val merges = lines.filter(_.startsWith("merge\t")).map { l =>
      val f = l.split("\t")
      (f(1).toInt, (f(2), f(3)))
    }.sortBy(_._1).map(_._2)
    val vocab = lines.filter(_.startsWith("vocab\t")).map { l =>
      val f = l.split("\t")
      f(1) -> f(2).toInt
    }.toMap
    (merges, vocab)
  }

  /** Standard BPE apply: start from the character symbols (end-of-word
    * marked) and repeatedly merge the LOWEST-RANK adjacent pair until
    * none applies. Deterministic for any input string.
    */
  def encodeWith(merges: Vector[(String, String)], word: String): Vector[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = graft.TrainBpe.symbols(word)
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i + 1 < syms.length) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
          syms.drop(bestAt + 2)
        done = syms.length < 2
      }
    }
    syms
  }

  /** Per-partition encoder: artifact parsed once, word encodings
    * memoized (token → subtoken count + known flag).
    */
  def load(): Seq[String] => (Int, Long, Int) = {
    val (merges, vocab) = loadArtifact()
    val memo = scala.collection.mutable.HashMap.empty[String, Int]
    toks => {
      var known = 0L
      var oov = 0
      toks.foreach { t =>
        if (vocab.contains(t))
          known += memo.getOrElseUpdate(t, encodeWith(merges, t).length)
        else oov += 1
      }
      (toks.length, known, oov)
    }
  }

  /** Learned-BPE token counts per document: engine-side tokenization
    * ([[TextAnalysis.tokens]], the oracle-mirrored split), then the
    * per-partition encoder slot.
    */
  def tokenCounts(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String): Dataset[DocTokens] = {
    import spark.implicits._
    val rows = docs.select(col(idCol).cast("long"),
        TextAnalysis.tokens(col(textCol)))
      .as[(Long, Seq[String])]
    rows.mapPartitions { it =>
      val enc = load() // per-partition artifact load + memo
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
