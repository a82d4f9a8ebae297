package graft.text

import org.apache.spark.sql.{Dataset, SparkSession}

/** F12 — model-backed sentiment with rules fallback (reference
  * api/sentiment.py HF path + env fallback to api/rules_sentiment.py).
  *
  * Same contract as the multimodal codec slot: the Spark-side plumbing
  * — one model context per partition, rows streamed through it, a
  * per-row availability outcome feeding the fallback — is real and
  * gate-tested; the model INFERENCE is stubbed deterministically (this
  * container ships no inference runtime). A real deployment swaps
  * [[ModelSentiment.FakeModel]] for an FFI/ONNX session inside the
  * same `mapPartitions` loop.
  */
object ModelSentiment {

  final case class Scored(
      docId: Long,
      modelScore: Double,
      modelAvailable: Boolean)

  /** STUB model — deterministic fake inference: score derives from the
    * first 8 hex chars of md5(text), mapped onto [-1, 1] at 3
    * decimals; "unavailable" (the reference's timeout/5xx degrade
    * path) is simulated for one row in ten.
    */
  object FakeModel {
    def load(): String => Double = { text =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8"))
      val x = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      ((x % 2001L) - 1000L) / 1000.0
    }
  }

  /** One model context per partition, rows streamed through it. */
  def score(spark: SparkSession, rows: Dataset[(Long, String)]): Dataset[Scored] = {
    import spark.implicits._
    rows.mapPartitions { it =>
      val model = FakeModel.load() // per-partition "model load"
      it.map { case (id, text) =>
        Scored(id, model(text), modelAvailable = id % 10 != 0)
      }
    }
  }
}
