package graft.text

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** F17 — the refiner's MODEL path as a real committed artifact
  * (round-10 carry-over #5, retired by the F12/F14/L59 pattern): the
  * reference refines a post with an LLM that classifies the event
  * type and emits a confidence, degrading to the deterministic rules
  * path on failure (api/refiner.py:64-231). Here the model slot
  * carries a trained logistic regression over bag-of-words presence
  * features of the post ([[graft.TrainRefiner]], artifact
  * refiner-lr-v1.tsv, weak-supervised by the rules path), so the
  * model branch produces a LEARNED type decision with a per-post
  * confidence where the rules branch is a constant 0.35.
  *
  * Plumbing is [[ModelSentiment]]'s verbatim: one model context per
  * partition, tokenization in the ENGINE (whitespace tokens +
  * array_distinct — the oracle mirrors the same token set), logit
  * accumulated as an exact integer sum, the type decided on the
  * INTEGER logit sign (z ≥ 0 — no float-boundary ambiguity), one
  * fixed double chain σ(z/10⁶) for the confidence, per-row
  * availability (id % 10 == 0 → rules fallback) simulating the
  * reference's timeout/5xx degrade.
  */
object ModelRefiner {

  final case class Refined(
      docId: Long,
      refinedType: String,
      confidence: Double,
      backend: String)

  object Model {
    val Resource = "/graft/refiner-lr-v1.tsv"

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

    /** Per-partition "model load": the integer logit closure. */
    def load(): Seq[String] => Long = {
      val (bias, w) = loadArtifact()
      toks => {
        var z = bias
        toks.foreach(t => z += w.getOrElse(t, 0L))
        z
      }
    }
  }


  /** Refine posts (`idCol`, `postCol`): model branch when available,
    * rules branch (launch keyword, constant 0.35) otherwise.
    */
  def refine(spark: SparkSession, posts: DataFrame, idCol: String,
      postCol: String): Dataset[Refined] = {
    import spark.implicits._
    val rows = posts.select(col(idCol).cast("long"),
        array_distinct(TextAnalysis.tokens(col(postCol))),
        lower(col(postCol)).contains("launch"))
      .as[(Long, Seq[String], Boolean)]
    rows.mapPartitions { it =>
      val logit = Model.load() // per-partition model load
      it.map { case (id, toks, rulesLaunch) =>
        if (id % 10 != 0) {
          val z = logit(toks)
          // confidence IN THE EMITTED LABEL: σ(|z|) = max(p, 1−p)
          Refined(id,
            if (z >= 0L) "token_launch" else "market_update",
            graft.functions.Parity.roundHalfUpScalar(
              1.0 / (1.0 + math.exp(-(math.abs(z) / 1000000.0))), 4),
            "model")
        } else Refined(id,
          if (rulesLaunch) "token_launch" else "market_update",
          0.35, "rules")
      }
    }
  }
}
