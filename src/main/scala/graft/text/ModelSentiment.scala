package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** F12 — model-backed sentiment with rules fallback (reference
  * api/hf_sentiment.py:29-148 HF path + env fallback to
  * api/rules_sentiment.py).
  *
  * The model is a REAL committed artifact (since round 9): a logistic
  * regression over bag-of-words presence features, trained by
  * [[graft.TrainSentiment]] under lexicon weak supervision and shipped
  * as a classpath resource (sentiment-lr-v1.tsv, 1e-6 fixed-point
  * weights). The Spark-side plumbing keeps the production inference
  * shape: one model context loaded per PARTITION, rows streamed
  * through it, a per-row availability outcome feeding the F11
  * fallback — swapping in an ONNX/FFI session changes only the inside
  * of the `mapPartitions` loop.
  *
  * Tokenization happens in the ENGINE (TextAnalysis.tokens +
  * array_distinct) before rows enter the slot, so the closure does no
  * regex/locale work and the DuckDB oracle mirrors the exact same
  * token set; scoring is an integer weight sum (order-free) followed
  * by one fixed double chain 2σ(z/10⁶)−1 ∈ (−1, 1) — the engine/
  * oracle parity convention.
  */
object ModelSentiment {

  final case class Scored(
      docId: Long,
      modelScore: Double,
      modelAvailable: Boolean)

  /** The committed linear model. Weights are 1e-6 fixed-point longs;
    * the logit accumulates as a long (associative, exact) and only
    * the final squash runs in floating point.
    */
  object LinearModel {
    val Resource = "/graft/sentiment-lr-v1.tsv"

    def loadArtifact(): (Long, Map[String, Long]) = {
      val in = getClass.getResourceAsStream(Resource)
      require(in != null, s"missing model artifact $Resource")
      val lines = scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filterNot(l => l.startsWith("#") || l.isEmpty).toVector
      in.close()
      val kv = lines.map { l =>
        val Array(t, v) = l.split("\t", 2); (t, v.toLong)
      }
      val bias = kv.collectFirst { case ("__bias__", v) => v }
        .getOrElse(sys.error(s"$Resource has no __bias__ row"))
      (bias, kv.filterNot(_._1 == "__bias__").toMap)
    }

    /** Per-partition "model load": parse the artifact once, return the
      * scoring closure (distinct token set → score in (−1, 1)).
      */
    def load(): Seq[String] => Double = {
      val (bias, w) = loadArtifact()
      toks => {
        var z = bias
        toks.foreach(t => z += w.getOrElse(t, 0L))
        2.0 / (1.0 + math.exp(-(z / 1000000.0))) - 1.0
      }
    }
  }

  /** One model context per partition, rows streamed through it;
    * "unavailable" (the reference's timeout/5xx degrade path) is
    * simulated for one row in ten.
    */
  def score(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String): Dataset[Scored] = {
    import spark.implicits._
    val rows = docs.select(col(idCol).cast("long"),
        array_distinct(TextAnalysis.tokens(col(textCol))))
      .as[(Long, Seq[String])]
    rows.mapPartitions { it =>
      val model = LinearModel.load() // per-partition model load
      it.map { case (id, toks) =>
        Scored(id, model(toks), modelAvailable = id % 10 != 0)
      }
    }
  }
}
