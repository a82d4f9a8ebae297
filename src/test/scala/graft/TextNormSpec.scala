package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Differential test: the fused NormalizeTextExpr kernel must be
  * byte-identical to the composed built-in chain it replaced
  * (lower → nfc_normalize → 4× regexp_replace → trim) — the composed
  * form is the oracle-validated original (q_f2_normalize).
  */
class TextNormSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val adversarial = Seq(
    "",
    "   ",
    "plain text",
    "UPPER Case MiXeD",
    "visit https://example.com/a?b=c now",
    "https://x.co",
    "multi https://a.b https://c.d urls",
    "www.chunk.example trailing",
    "wwww.not-a-www-strip",
    "domain.com, punctuated",
    "domain.com", // no trailing punct → kept (pattern needs the tail class)
    "sub-domain.io! and more",
    "a.finance: yes",
    "ties.eth; ok",
    "@handle gone #hashtag stays",
    "email not@stripped.fully?", // @handle strip applies mid-token
    "tab\tand\nnewline\r\nandvertical",
    "  leading and trailing   ",
    "café composed vs café decomposed", // NFC must merge e + U+0301
    "Å ring above", // A + combining ring → Å
    "ＦＵＬＬＷＩＤＴＨ and ŉ special lower",
    "İstanbul dotted capital I", // lowercases to i̇ (i + combining dot)
    "ẞ capital sharp s",
    "Σ final sigma ΑΣ",
    "mixed $BTC @user www.site.com https://t.co/xyz domain.io. end",
    " nbsp is not \\s whitespace ",
    "ℌ𝔢𝔩𝔩𝔬 𝕎𝕠𝕣𝕝𝕕 math letters",
    "한국어 中文 عربى",
    "@@double at", "@", "@_underscore_handle ok"
  )

  test("fused NormalizeTextExpr == composed built-in chain, byte for byte") {
    val df = adversarial.toDF("t").select(
      col("t"),
      TextFunctions.normalizeText(col("t")).as("fused"),
      TextFunctions.normalizeTextComposed(col("t")).as("composed"))
    val bad = df.filter(not(col("fused") <=> col("composed"))).collect()
    assert(bad.isEmpty, bad.map(r =>
      s"input=${r.getString(0)} fused=${r.getString(1)} composed=${r.getString(2)}")
      .mkString("\n"))
  }

  test("fused kernel random differential fuzz") {
    val rnd = new scala.util.Random(42)
    val alphabet =
      "aA zZ09$@#.!?,:;-_èé́̊ \t\n漢ح https://www.domain.com/x www.io .com .eth "
    val cases = (1 to 400).map { _ =>
      val n = rnd.nextInt(60)
      (1 to n).map(_ => alphabet.charAt(rnd.nextInt(alphabet.length))).mkString
    }
    val df = cases.toDF("t").select(
      TextFunctions.normalizeText(col("t")).as("fused"),
      TextFunctions.normalizeTextComposed(col("t")).as("composed"))
    val bad = df.filter(not(col("fused") <=> col("composed"))).collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  private implicit def toDFHelper(s: Seq[String]): org.apache.spark.sql.Dataset[String] = {
    import spark.implicits._
    spark.createDataset(s)
  }
}
