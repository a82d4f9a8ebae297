package graft

import scala.io.Source

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CardRender, CardRenderUi}

/** Pins [[CardRenderUi]] byte-for-byte to the REFERENCE Jinja ui
  * templates rendered under the AUTOESCAPING `_env_ui` environment
  * (reference api/cards/render_pipeline.py:45):
  * src/test/resources/card_render_ui_golden.jsonl holds strings
  * rendered by the actual templates/cards .ui.j2 files through jinja2
  * (tools/render_goldens.py `render_ui` — same context rules as
  * CardRender.deriveContext + CardRenderUi.uiWrinkle), so HTML
  * escaping (`&amp; &lt; &gt; &#34; &#39;`), the degraded-render
  * fallback on a template exception, Jinja dict truthiness of
  * token_info, and every untrimmed-tag whitespace run are asserted,
  * not approximated.
  */
class CardRenderUiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private case class Golden(e: Long, u: Long, k: Long, cardType: String,
      rendered: String)

  private lazy val goldens: Seq[Golden] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/card_render_ui_golden.jsonl"), "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      val m = com.fasterxml.jackson.databind.json.JsonMapper.builder()
        .build().readTree(line)
      Golden(m.get("e").asLong, m.get("u").asLong, m.get("k").asLong,
        m.get("card_type").asText, m.get("rendered").asText)
    }.toList
    finally src.close()
  }

  test("segment resources parse with no unbound or stray tokens") {
    for (name <- Seq("primary_card", "topic_card", "market_risk_card")) {
      val segs = CardRenderUi.segments(name)
      assert(segs.nonEmpty, s"$name: empty segment file")
      val statics = segs.collect { case Left(s) => s }.mkString
      assert(!statics.contains("⟦") && !statics.contains("{%") &&
        !statics.contains("{{"), s"$name: unconsumed markup in statics")
      assert(segs.collect { case Right(t) => t }.nonEmpty)
    }
  }

  test("htmlEscape matches markupsafe byte-for-byte") {
    val s = spark
    import s.implicits._
    val got = Seq("a&b<c>d\"e'f", "&&", "plain")
      .toDF("x").select(CardRenderUi.htmlEscape(col("x"))).as[String]
      .collect()
    assert(got(0) == "a&amp;b&lt;c&gt;d&#34;e&#39;f")
    assert(got(1) == "&amp;&amp;")
    assert(got(2) == "plain")
  }

  test("renderUi reproduces the reference ui templates byte-for-byte on all golden tuples") {
    val s = spark
    import s.implicits._
    val in = goldens.map(g => (g.e, g.u, g.k, "click", "2024-01-15T10:30:00Z"))
      .toDF("E", "U", "K", "event_type", "data_as_of")
    val out = CardRenderUi.renderUi(CardRenderUi.uiWrinkle(
      CardRender.applyGuardrail(CardRender.deriveContext(in))))
      .select(col("E"), col("U"), col("K"), col("card_type"),
        col("render_ui"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getString(3), r.getString(4))).toMap
    assert(out.size == goldens.size)
    goldens.foreach { g =>
      val (ct, got) = out((g.e, g.u, g.k))
      assert(ct == g.cardType, s"card_type diverged for (${g.e},${g.u},${g.k})")
      if (got != g.rendered) {
        val i = got.zip(g.rendered).indexWhere { case (a, b) => a != b }
        val at = if (i < 0) math.min(got.length, g.rendered.length) else i
        fail(s"ui render diverged for (${g.e},${g.u},${g.k}) [$ct] at char " +
          s"$at:\n got…${got.slice(math.max(0, at - 60), at + 60)}…\n " +
          s"want…${g.rendered.slice(math.max(0, at - 60), at + 60)}…")
      }
    }
    // the suite only means something if the channel's distinctive
    // branches are actually exercised
    val all = goldens.map(g => out((g.e, g.u, g.k))._2)
    assert(goldens.map(_.cardType).toSet ==
      Set("primary", "secondary", "topic", "market_risk"))
    assert(all.exists(_.contains("Card (Degraded)")),
      "no golden exercised the degraded-render fallback")
    assert(all.exists(_.contains("&amp;")) && all.exists(_.contains("&#34;")),
      "no golden exercised HTML autoescaping")
    assert(all.exists(_.contains(" (缓存)")),
      "no golden exercised the cache footer suffix")
    assert(all.exists(_.contains("dex&lt;screener&gt;&amp;v1")),
      "no golden exercised the dex_source footer")
    assert(all.exists(_.contains("degraded-warning")),
      "no golden exercised the degrade banner block")
  }
}
