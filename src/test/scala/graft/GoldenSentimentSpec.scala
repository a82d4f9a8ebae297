package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Reference semantic fixtures (FIXTURES.md §1.3): the golden labeled
  * sentiment corpus drives F11 with a crypto lexicon, pinning the
  * reference's scoring semantics — score = clamp((pos-neg)/n_tokens·3),
  * labels at ±0.1 (api/rules_sentiment.py:11-84).
  */
class GoldenSentimentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Pos = Seq("launching", "launch", "moon", "bullish", "discovered",
    "breaking", "pump", "gem")
  private val Neg = Seq("rug", "scam", "dump", "honeypot", "crash", "bearish")

  private val Golden = Seq(
    ("just discovered $pepe launching on mainnet!", "pos"),
    ("this project looks like a rug pull", "neg"),
    ("the market sentiment is neutral right now", "neu"),
    ("bullish gem about to moon", "pos"),
    ("total scam, devs dump on holders, avoid the rug", "neg"),
    ("volume is flat and nothing is happening today", "neu"))

  test("golden corpus labels reproduce under the lexicon scorer") {
    val got = Golden.map(_._1).toDF("text")
      .select(col("text"),
        TextFunctions.sentimentLabel(
          TextFunctions.sentimentScore(col("text"), Pos, Neg)).as("label"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    Golden.foreach { case (text, want) =>
      assert(got(text) == want, s"'$text' => ${got(text)}, want $want")
    }
  }

  test("score formula matches the reference arithmetic") {
    // "bullish gem about to moon": 3 pos hits of 5 tokens → 3/5*3 = 1.8 → clamp 1.0
    val s1 = Seq("bullish gem about to moon").toDF("t")
      .select(TextFunctions.sentimentScore(col("t"), Pos, Neg)).head.getDouble(0)
    assert(s1 == 1.0)
    // one neg of 8 tokens → -1/8*3 = -0.375
    val s2 = Seq("this project looks like a rug pull today").toDF("t")
      .select(TextFunctions.sentimentScore(col("t"), Pos, Neg)).head.getDouble(0)
    assert(math.abs(s2 - (-0.375)) < 1e-12)
    // empty text → 0 / neu
    val s3 = Seq("").toDF("t")
      .select(TextFunctions.sentimentScore(col("t"), Pos, Neg)).head.getDouble(0)
    assert(s3 == 0.0)
    // \b\w+\b tokenization: punctuation-adjacent lexicon words still hit
    // ("scam," → scam) and punctuation is not a token
    // (api/rules_sentiment.py:5-8)
    val s4 = Seq("scam, rug!").toDF("t")
      .select(TextFunctions.sentimentScore(col("t"), Pos, Neg)).head.getDouble(0)
    assert(s4 == -1.0, s"punctuated lexicon hits must count, got $s4")
  }
}
