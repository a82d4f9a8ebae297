package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The committed word-embedding artifact behind the encoder slot —
  * the KBIR/encoder stand-in retired the F12 way (round-9 verdict
  * stretch): a REAL trained model (PPMI + truncated SVD over the
  * corpus co-occurrence matrix, [[graft.TrainEmbedding]]), shipped as
  * a classpath resource (embedding-svd-v1.tsv, 1e-6 fixed-point
  * longs), loaded once per PARTITION inside a `mapPartitions` slot —
  * swapping in a KBIR/ONNX encoder session changes only the inside of
  * the loop, exactly as with [[ModelSentiment]].
  *
  * Document vectors are per-dimension fixed-point SUMS over the text's
  * in-vocabulary token occurrences. A sum (not a mean) is emitted
  * deliberately: cosine is scale-invariant, so sum-pooled and
  * mean-pooled vectors rank identically, while the sum stays an EXACT
  * integer (longs; |v| ≤ 5e6 per token, ≤ thousands of tokens — far
  * inside 2⁶³) — the engine/oracle parity convention, with the oracle
  * re-deriving the same sums from the artifact interpolated into SQL
  * as a VALUES list.
  *
  * Tokenization happens in the ENGINE ([[TextAnalysis.tokens]])
  * before rows enter the slot, so the closure does no regex/locale
  * work and the oracle mirrors the exact token sequence.
  */
object WordEmbedding {

  val Resource = "/graft/embedding-svd-v1.tsv"

  /** One pooled document vector: fixed-point sums + vocabulary hits. */
  final case class DocVec(docId: Long, emb: Seq[Long], nHit: Int)

  /** (dim, term → fixed-point vector), parsed from the resource. */
  def loadArtifact(): (Int, Map[String, Array[Long]]) = {
    val in = getClass.getResourceAsStream(Resource)
    require(in != null, s"missing embedding artifact $Resource")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filterNot(l => l.startsWith("#") || l.isEmpty).toVector
    in.close()
    val vecs = lines.map { l =>
      val f = l.split("\t")
      (f.head, f.tail.map(_.toLong))
    }
    require(vecs.nonEmpty && vecs.map(_._2.length).distinct.size == 1,
      s"$Resource is empty or ragged")
    (vecs.head._2.length, vecs.toMap)
  }

  /** Per-partition "model load": parse the artifact once, return the
    * pooling closure (token sequence → (summed vector, hit count)).
    */
  def load(): Seq[String] => (Array[Long], Int) = {
    val (dim, w) = loadArtifact()
    toks => {
      val acc = new Array[Long](dim)
      var hits = 0
      toks.foreach { t =>
        w.get(t) match {
          case Some(v) =>
            var i = 0
            while (i < dim) { acc(i) += v(i); i += 1 }
            hits += 1
          case None =>
        }
      }
      (acc, hits)
    }
  }

  /** Pooled document vectors for a corpus: one model context per
    * partition, rows streamed through it.
    */
  def embed(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String): Dataset[DocVec] = {
    import spark.implicits._
    val rows = docs.select(col(idCol).cast("long"),
        TextAnalysis.tokens(col(textCol)))
      .as[(Long, Seq[String])]
    rows.mapPartitions { it =>
      val model = load() // per-partition artifact load
      it.map { case (id, toks) =>
        val (v, hits) = model(toks)
        DocVec(id, v.toSeq, hits)
      }
    }
  }

  /** The artifact as a DuckDB VALUES list `(term, d1, …, dN)` — the
    * F12 convention: oracle SQL scores with the SAME committed file.
    */
  def sqlValues(): String = {
    val (_, w) = loadArtifact()
    w.toSeq.sortBy(_._1).map { case (t, v) =>
      s"('${t.replace("'", "''")}', ${v.map(x => s"${x}::BIGINT").mkString(", ")})"
    }.mkString(", ")
  }
}
