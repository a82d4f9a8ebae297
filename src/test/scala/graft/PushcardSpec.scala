package graft

import com.fasterxml.jackson.databind.json.JsonMapper

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.JsonSchema
import graft.operators.{CardRender, Pushcard}
import org.apache.spark.unsafe.types.UTF8String

/** Pins the pushcard envelope (reference api/cards/transformers.py
  * `to_pushcard` + render_pipeline.py:272-296 validate-then-continue):
  * JSON well-formedness and key order, the exact analytic violation
  * fingerprint of the legacy shape (every real envelope fails
  * pushcard.schema.json — extra event_key/rendered keys, ohlc {}),
  * and — so the check is not trivially unsatisfiable — that a
  * minimal by-the-book envelope DOES validate cleanly.
  */
class PushcardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val mapper = JsonMapper.builder().build()

  private def run(rows: Seq[(Long, Long, Long)]) = {
    val s = spark
    import s.implicits._
    val in = rows.map { case (e, u, k) =>
      (e, u, k, "click", "2024-01-15T10:30:00Z") }
      .toDF("E", "U", "K", "event_type", "data_as_of")
      .withColumn("event_key",
        concat(lit("EV:"), lpad(col("E").cast("string"), 8, "0")))
    Pushcard.envelope(CardRender.renderTg(
      CardRender.applyGuardrail(CardRender.deriveContext(in))))
      .select("E", "card_type", "pushcard_json", "schema_ok",
        "violations_str", "degrade_final")
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getBoolean(3), r.getString(4), r.getBoolean(5))).toMap
  }

  test("a minimal conforming envelope validates cleanly — the schema is satisfiable") {
    val good = """{"type":"primary","risk_level":"red",""" +
      """"token_info":{"symbol":"PEPE","chain":"eth"},""" +
      """"metrics":{"price_usd":1.5,"liquidity_usd":null,"fdv":null,""" +
      """"ohlc":{"m5":{"o":1,"h":2,"l":0.5,"c":1.5},""" +
      """"h1":{"o":null,"h":null,"l":null,"c":null},""" +
      """"h24":{"o":1,"h":3,"l":1,"c":2}}},""" +
      """"sources":{"security_source":"goplus","dex_source":"dex"},""" +
      """"states":{"cache":false,"degrade":false,"stale":false,"reason":""},""" +
      """"risk_note":"","verify_path":"/x","data_as_of":"2024-01-15T10:30:00Z"}"""
    val v = JsonSchema.validate(UTF8String.fromString(good),
      UTF8String.fromString(Pushcard.pushcardSchema))
    assert(v.numElements() == 0, s"expected clean, got ${v}")
  }

  test("envelope JSON is well-formed, key-ordered, and carries the legacy quirks") {
    val out = run(Seq((0L, 0L, 0L), (1L, 0L, 0L), (2L, 0L, 0L), (3L, 0L, 0L)))
    for ((_, (_, json, ok, _, degrade)) <- out) {
      val node = mapper.readTree(json)
      assert(node.isObject, "envelope must parse as a JSON object")
      // the legacy top-level metric reads never hit the nested block
      assert(node.get("metrics").get("price_usd").isNull)
      assert(node.get("metrics").get("ohlc").isEmpty)
      assert(node.has("event_key") && node.has("rendered"))
      assert(!ok && degrade, "every real envelope fails the legacy schema")
    }
    // insertion order matches to_pushcard (Python dict order)
    val keys = {
      val it = mapper.readTree(out(0L)._2).fieldNames()
      Iterator.continually(it).takeWhile(_.hasNext).map(_.next()).toList
    }
    assert(keys.take(12) == List("type", "event_key", "risk_level",
      "token_info", "metrics", "sources", "states", "evidence",
      "risk_note", "verify_path", "data_as_of", "rendered"))
    // the rendered.tg payload is the REAL tg render
    assert(mapper.readTree(out(3L)._2).get("rendered").get("tg").asText
      .contains("安全评估"))
  }

  test("violation fingerprint matches the validator walk order exactly") {
    val out = run(Seq((0L, 0L, 0L), (4L, 1L, 0L), (1L, 0L, 0L), (2L, 4L, 1L)))
    // primary (4,1): symbol present (U%11!=0) but chain absent (E%3==1)
    // — extra keys + the chain required + ohlc required
    assert(out(4L)._4 == "$.event_key: additionalProperties; " +
      "$.rendered: additionalProperties; " +
      "$.token_info.chain: required; " +
      "$.metrics.ohlc.m5: required; $.metrics.ohlc.h1: required; " +
      "$.metrics.ohlc.h24: required")
    // primary (0,0): U%11==0 drops symbol — its required fires too
    assert(out(0L)._4 == "$.event_key: additionalProperties; " +
      "$.rendered: additionalProperties; " +
      "$.token_info.symbol: required; " +
      "$.metrics.ohlc.m5: required; $.metrics.ohlc.h1: required; " +
      "$.metrics.ohlc.h24: required")
    // secondary (1,0): + features_snapshot required tail
    assert(out(1L)._4.endsWith("$.metrics.ohlc.h24: required; " +
      "$.features_snapshot.active_addrs: required; " +
      "$.features_snapshot.top10_share: required; " +
      "$.features_snapshot.growth_30m: required; " +
      "$.features_snapshot.stale: required"))
    // topic without token_info (U%3==1): topic extras in doc order,
    // type enum, then the empty-dict required pair
    assert(out(2L)._4 == "$.event_key: additionalProperties; " +
      "$.rendered: additionalProperties; " +
      "$.topic_id: additionalProperties; " +
      "$.topic_entities: additionalProperties; " +
      "$.topic_mention_count: additionalProperties; " +
      "$.type: enum; " +
      "$.token_info.symbol: required; $.token_info.chain: required; " +
      "$.metrics.ohlc.m5: required; $.metrics.ohlc.h1: required; " +
      "$.metrics.ohlc.h24: required")
  }
}
