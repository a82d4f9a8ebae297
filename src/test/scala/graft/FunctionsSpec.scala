package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{KeyFunctions, TextFunctions}
import graft.operators.Enrichment
import graft.text.TextAnalysis

/** Truth-table specs for the scalar functions not already pinned by an
  * oracle query: F4 symbol normalization, F13 keyphrases, F15 memeable
  * confidence, D1 fingerprints, F8 blake2s topic hash, cache buckets.
  */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).head.getAs[T]("r")

  test("F4 normalizeSymbol: trim, lowercase, single $ prefix, null-safe") {
    val rows = Seq("PEPE", " $Doge ", "$$wif", "", null)
      .toDF("s").select(TextFunctions.normalizeSymbol(col("s")).as("n"))
      .collect().map(r => Option(r.getString(0)))
    assert(rows.toSeq == Seq(Some("$pepe"), Some("$doge"), Some("$wif"),
      None, None))
  }

  test("F13 keyphrases: regex tokens, stopword filter, ordered dedup, top-k") {
    val got = Seq("Launch the $PEPE token now launch pepe the a x")
      .toDF("t")
      .select(TextFunctions.keyphrases(col("t"),
        stopwords = Seq("the", "a", "now"), topK = 3).as("k"))
      .head.getSeq[String](0)
    // '$pepe' ranks by first occurrence; 1-char 'x' fails the regex
    assert(got == Seq("launch", "$pepe", "token"))
  }

  test("F15 memeableConfidence: 0.3 per entity capped at 1") {
    assert(one[Double](TextFunctions.memeableConfidence(lit(0))) == 0.0)
    assert(math.abs(one[Double](
      TextFunctions.memeableConfidence(lit(2))) - 0.6) < 1e-12)
    assert(one[Double](TextFunctions.memeableConfidence(lit(5))) == 1.0)
  }

  test("D1 postFingerprint: stable sha1 over source|author|ts|text[:30]") {
    def fp(text: String) = Seq(1).toDF("x").select(
      KeyFunctions.postFingerprint(lit("x"), lit("kol"),
        lit("2025-01-15T12:30:00Z"), lit(text)).as("f")).head.getString(0)
    val long = "a" * 30
    assert(fp(long) == fp(long + "tail ignored beyond 30 chars"))
    assert(fp(long) != fp("b" * 30))
    assert(fp(long).matches("[0-9a-f]{40}"))
  }

  test("F8 topicHashBlake: 12-hex digest, sort-insensitive") {
    def th(kw: Seq[String]) = Seq(1).toDF("x").select(
      KeyFunctions.topicHashBlake(
        array(kw.map(lit): _*)).as("h")).head.getString(0)
    assert(th(Seq("b", "a")) == th(Seq("a", "b")))
    assert(th(Seq("a", "b")).matches("[0-9a-f]{12}"))
    assert(th(Seq("a", "b")) != th(Seq("a", "c")))
  }

  test("F6 tsBucket: integer floor to the bucket") {
    assert(one[Long](KeyFunctions.tsBucket(lit(1700000599L))) == 1700000400L)
    assert(one[Long](KeyFunctions.tsBucket(lit(1700000600L))) == 1700000400L)
    // exact boundary maps to itself
    assert(one[Long](KeyFunctions.tsBucket(lit(1700001000L), 600L)) == 1700001000L)
  }

  test("S4 cacheBucket: 5-minute buckets on fetch timestamps") {
    val us = 1700000000000000L + 299L * 1000000L
    assert(one[Long](Enrichment.cacheBucket(lit(us))) ==
      (us / Enrichment.FreshTtlUs) * Enrichment.FreshTtlUs)
  }

  test("F2 normalizeText strips urls and handles, keeps hashtags") {
    val got = Seq("BIG News  https://t.co/x @bob  #moon   soon")
      .toDF("t").select(TextFunctions.normalizeText(col("t")).as("n"))
      .head.getString(0)
    assert(got == "big news #moon soon")
  }

  test("langId prefers en on this corpus and flags empty as und") {
    val r = Seq("the fast of to in table", "zzz qqq", "")
      .toDF("t").select(TextAnalysis.langId(col("t")).as("l"))
      .select(col("l.lang")).collect().map(_.getString(0))
    assert(r.toSeq == Seq("en", "und", "und"))
  }

  test("F18 templateSummary: squeeze, trailing-punct strip, max-1+… cut") {
    import graft.operators.Cards
    def render(sym: String, level: String): String =
      Seq((sym, level)).toDF("sym", "lvl")
        .select(Cards.templateSummary(col("sym"),
          lit(null).cast("double"), lit(null).cast("double"),
          col("lvl")).as("s")).head.getString(0)
    // CPython expected values (summarizer.py _render_template +
    // _strip_trailing_punct + _truncate), computed with the stdlib:
    assert(render("  A \t B  ", "none") == "A B | 规则判定none")
    assert(render("PEPE", "watch；；,, ") == "PEPE | 规则判定watch")
    val cut = render("X" * 300, "none")
    assert(cut.length == 280 && cut == "X" * 279 + "…")
    val kept = render("Y" * 268, "none") // 268+3+8 = 279 ≤ 280 → kept
    assert(kept.length == 279 && kept.endsWith("规则判定none"))
  }

  test("missing_map: unknown bare-string source dropped, dict default reason") {
    import graft.rules.RulesConfig
    val doc = RulesConfig.parse(
      """version: t
        |groups: []
        |scoring: {thresholds: {opportunity: 15, caution: -5}}
        |missing_map:
        |  dex: "dex data missing"
        |  mystery_source: "never loads"
        |  hf:
        |    condition: ""
        |  goplus:
        |    condition: "goplus_risk is null"
        |""".stripMargin, env = Map.empty)
    // unknown bare-string source → reference `continue`; empty dict
    // condition can never fire → both dropped (no expr("") at plan time)
    assert(doc.missing.map(_.source) == Seq("dex", "goplus"))
    // dict form without a reason gets the reference default string
    assert(doc.missing.find(_.source == "goplus").get.reason ==
      "goplus 数据缺失")
  }
}
