package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.ModelSentiment

/** F12's committed LR artifact: load contract, fixed-point scoring,
  * and the mapPartitions slot semantics (engine-side tokenization,
  * per-row availability simulation).
  */
class ModelSentimentSpec extends AnyFunSuite {

  test("artifact loads and scoring follows the fixed-point contract") {
    val (bias, w) = ModelSentiment.LinearModel.loadArtifact()
    assert(w.nonEmpty)
    // the weak-label lexicon must have survived training with its
    // polarity intact — that is what makes the artifact a sentiment
    // model rather than noise
    val score = ModelSentiment.LinearModel.load()
    assert(score(Seq("fast")) > 0.1)
    assert(score(Seq("slow")) < -0.1)
    // logit = bias + sum of present weights, exactly
    val z = bias + w("fast") + w("slow")
    assert(score(Seq("fast", "slow")) ==
      2.0 / (1.0 + math.exp(-(z / 1e6))) - 1.0)
    // unknown tokens contribute nothing
    assert(score(Seq("zzzunknown")) ==
      2.0 / (1.0 + math.exp(-(bias / 1e6))) - 1.0)
    // score range contract
    assert(score(Seq("fast", "big", "spark")) < 1.0)
    assert(score(Seq("slow", "small", "dup")) > -1.0)
  }

  test("slot: engine tokenization, availability simulation") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, "Fast   FAST join"), (10L, "slow scan"))
      .toDF("doc_id", "text")
    val got = ModelSentiment.score(spark, df, "doc_id", "text")
      .collect().map(s => s.docId -> s).toMap
    // id % 10 == 0 simulates the degrade path
    assert(got(1L).modelAvailable && !got(10L).modelAvailable)
    // engine tokenization: lowercased, whitespace-split, DISTINCT —
    // "fast" counts once despite appearing twice
    val (bias, w) = ModelSentiment.LinearModel.loadArtifact()
    val z = bias + w("fast") + w("join")
    assert(got(1L).modelScore == 2.0 / (1.0 + math.exp(-(z / 1e6))) - 1.0)
  }
}
