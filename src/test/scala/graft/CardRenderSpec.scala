package graft

import scala.io.Source

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.PyFixedFormat
import graft.operators.CardRender

/** Pins [[CardRender]] byte-for-byte to the REFERENCE Jinja templates:
  * src/test/resources/card_render_golden.jsonl holds strings rendered
  * by the actual reference templates/cards .tg.j2 files through jinja2
  * (tools/render_goldens.py — same context rules as
  * CardRender.deriveContext), so every whitespace quirk the Jinja
  * `{%-`/`-#}` trimming produces is asserted, not approximated:
  * glued blocks (`…Z_legal_<!-- Debug`), trailing two-space Markdown
  * line breaks in candidate entries, the `(SOL)📌` join on topic
  * cards.
  */
class CardRenderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private case class Golden(e: Long, u: Long, k: Long, cardType: String,
      rendered: String)

  private lazy val goldens: Seq[Golden] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/card_render_golden.jsonl"), "UTF-8")
    try src.getLines().filter(_.nonEmpty).map { line =>
      // tiny field extraction without a JSON dep: the jsonl is
      // machine-written with fixed key order e,u,k,card_type,rendered
      val m = com.fasterxml.jackson.databind.json.JsonMapper.builder()
        .build().readTree(line)
      Golden(m.get("e").asLong, m.get("u").asLong, m.get("k").asLong,
        m.get("card_type").asText, m.get("rendered").asText)
    }.toList
    finally src.close()
  }

  test("PyFixedFormat matches C/Python printf semantics (half-even on the exact binary value, grouping)") {
    def f(x: Double, d: Int, g: Boolean = false) =
      PyFixedFormat.fmt(x, d, g)
    assert(f(123.45, 6) == "123.450000")
    assert(f(1.5625, 2) == "1.56") // exact tie → even (Java %f says 1.57)
    assert(f(1.375, 2) == "1.38") // exact tie → even
    assert(f(0.0625, 2) == "0.06")
    assert(f(0.0, 2) == "0.00")
    assert(f(-8.2191780821917835, 2) == "-8.22")
    assert(f(12345678.25, 0, g = true) == "12,345,678")
    assert(f(0.25, 0, g = true) == "0")
    assert(f(1644.25, 0, g = true) == "1,644")
    assert(f(999.5, 0, g = true) == "1,000") // carry across grouping
    assert(f(2.5, 1) == "2.5")
    assert(f(-0.0, 2) == "-0.00") // C prints the sign bit
  }

  test("renderTg reproduces the reference Jinja templates byte-for-byte on all golden tuples") {
    val s = spark
    import s.implicits._
    val in = goldens.map(g => (g.e, g.u, g.k, "click", "2024-01-15T10:30:00Z"))
      .toDF("E", "U", "K", "event_type", "data_as_of")
    val out = CardRender.renderTg(
      CardRender.applyGuardrail(CardRender.deriveContext(in)))
      .select(col("E"), col("U"), col("K"), col("card_type"),
        col("render_tg"))
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
        fail(s"render diverged for (${g.e},${g.u},${g.k}) [$ct] at char " +
          s"$at:\n got…${got.slice(math.max(0, at - 40), at + 40)}…\n " +
          s"want…${g.rendered.slice(math.max(0, at - 40), at + 40)}…")
      }
    }
    // the suite only means something if every template and major
    // branch is actually exercised
    val types = goldens.map(_.cardType).toSet
    assert(types == Set("primary", "secondary", "topic", "market_risk"))
    assert(goldens.exists(g => out((g.e, g.u, g.k))._2.contains("歧义候选")),
      "no golden exercised the ambiguous-candidates block")
    assert(goldens.exists(g => out((g.e, g.u, g.k))._2.contains("服务降级提示")),
      "no golden exercised the degrade banner")
  }
}
