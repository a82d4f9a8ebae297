package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.LangIdTrainedOps
import graft.text.{LangIdModel, TextAnalysis}

/** The committed langid artifact's contracts: it loads and is
  * non-degenerate, the serving kernel separates all five languages
  * on the gate's held-out sentence stream, the feature rule is the
  * engine-portable md5-bucket form, and the trained path beats the
  * rules argmax exactly where it should — content-only sentences
  * with no stopword hits.
  */
class LangIdTrainedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("artifact loads: five biases, non-degenerate per-language weights") {
    val (biases, w) = LangIdModel.loadArtifact()
    assert(biases.length == 5 && w.length == 5)
    w.foreach(wl => assert(wl.exists(_ != 0L), "a language has no weights"))
    // languages must be distinguishable: weight vectors pairwise differ
    for (a <- 0 until 5; b <- a + 1 until 5)
      assert(!java.util.Arrays.equals(w(a), w(b)))
  }

  test("kernel separates all five languages on held-out sentences; ties break low") {
    val (biases, w) = LangIdModel.loadArtifact()
    (0L until 500L).foreach { d =>
      val (lang, s) = LangIdModel.plantedSentence(d)
      val r = LangIdTrainedOps.score(UTF8String.fromString(s), w, biases)
      assert(r.getLong(0) == lang.toLong, s"doc $d: got ${r.getLong(0)}")
      assert(r.getLong(2) > 0L, s"doc $d: zero margin")
    }
    // <3 code points → biases alone, argmax with the low-index rule
    val tiny = LangIdTrainedOps.score(UTF8String.fromString("ab"), w, biases)
    assert(tiny.getLong(3) == 0L)
    val expect = biases.zipWithIndex.maxBy { case (v, i) => (v, -i) }._2
    assert(tiny.getLong(0) == expect.toLong)
  }

  test("feature rule is the portable md5-bucket form over code-point trigrams") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(g: String): Int =
      (graft.expressions.FeatureHashOps.u32(md, g) % 256).toInt
    val bs = LangIdTrainedOps.gramBuckets(
      UTF8String.fromString("Ab 水x"), 256)
    // lowercase first; trigrams over CODE POINTS (水 is one position)
    assert(bs.toSeq == Seq(bucket("ab "), bucket("b 水"), bucket(" 水x")))
  }

  test("trained path reads morphology where the stopword argmax goes und") {
    val s = spark
    import s.implicits._
    // content-only sentences: ten non-stopword words per language
    val rows = LangIdModel.Langs.zipWithIndex.map { case (lang, li) =>
      (li.toLong, LangIdModel.Vocab(li).drop(10).mkString(" "), lang)
    }.toDF("doc_id", "text", "lang_planted")
    val out = LangIdModel.classifyTrained(rows, "text")
      .withColumn("lang_rules",
        TextAnalysis.langId(col("text")).getField("lang"))
      .select("lang_planted", "lang_trained", "lang_rules").collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(0),
        s"trained missed ${r.getString(0)}")
      assert(r.getString(2) == "und",
        s"fixture not content-only for ${r.getString(0)}")
    }
  }
}
