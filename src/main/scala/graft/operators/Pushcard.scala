package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** The legacy pushcard ENVELOPE — the wire shape a push consumer
  * actually receives: card context + rendered channel text re-nested
  * into the pushcard contract, then schema-checked before enqueue
  * (reference api/cards/transformers.py:10-77 `to_pushcard`,
  * api/cards/render_pipeline.py:272-296 validate-then-continue,
  * schemas/pushcard.schema.json).
  *
  * Faithfulness notes — the envelope mirrors the reference's REAL
  * behavior, quirks included:
  *  - `to_pushcard` reads `ctx.get("price_usd")` etc. at the context
  *    TOP level, but card contexts nest them under `metrics` — so the
  *    envelope's metrics are always `null` with `ohlc: {}`
  *    (transformers.py:34-39);
  *  - `sources.security_source` copies ctx `risk_source` (NOT the
  *    context's security_source — transformers.py:41);
  *  - the envelope carries `event_key` and `rendered`, and `ohlc: {}`
  *    misses its required sub-keys, so EVERY envelope fails
  *    pushcard.schema.json validation; the reference logs
  *    `cards.schema_error`, sets `states.degrade = true` and pushes
  *    anyway (render_pipeline.py:282-296). [[envelope]] surfaces that
  *    as `schema_ok` / `violations_str` / `degrade_final` instead of
  *    a log line.
  *
  * The JSON text is assembled with explicit-null / conditional-key
  * semantics exactly matching Python dict insertion order, so the
  * `q_j6_pushcard` DuckDB oracle can re-build the identical bytes;
  * validation runs the REAL [[graft.expressions.JsonSchemaValidate]]
  * walk over the committed pushcard.schema.json resource (statesFlags
  * $ref inlined). Map-side, zero shuffles, codegen'd end to end.
  */
object Pushcard {

  /** The pushcard-envelope schema, shipped as a library resource. */
  lazy val pushcardSchema: String = {
    val in = getClass.getResourceAsStream("/pushcard.schema.json")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** JSON string-value escaping (both engines apply the same three
    * rules; the card surface contains no other control characters).
    */
  def jsonEsc(c: Column): Column =
    replace(replace(replace(c,
      lit("\\"), lit("\\\\")),
      lit("\""), lit("\\\"")),
      lit("\n"), lit("\\n"))

  private def jstr(c: Column): Column =
    concat(lit("\""), jsonEsc(c), lit("\""))

  private def field(name: String, value: Column): Column =
    concat(lit("\"" + name + "\":"), value)

  /** Optional key: contributes nothing when `cond` is false (Python
    * conditional insertion; concat_ws skips the null).
    */
  private def optField(cond: Column, name: String, value: Column): Column =
    when(cond, field(name, value))

  /** Build the envelope over a tg-rendered context frame (the
    * [[CardRender.deriveContext]] columns + `render_tg`): adds
    * `pushcard_json`, `schema_ok`, `violations_str`, `degrade_final`.
    */
  def envelope(df: DataFrame): DataFrame = {
    // token_info: the ctx dict as inserted by the generators (symbol,
    // chain, ca_norm); absent dict (no-token topic/market_risk) → {}
    val tokenInfo = when(!col("has_token"), lit("{}")).otherwise(concat(
      lit("{"),
      concat_ws(",",
        optField(col("symbol").isNotNull, "symbol", jstr(col("symbol"))),
        optField(col("chain").isNotNull, "chain", jstr(col("chain"))),
        optField(col("ca_norm").isNotNull, "ca_norm", jstr(col("ca_norm")))),
      lit("}")))

    // transformers.py:34-47 — top-level ctx reads that never hit the
    // nested metrics, and the constant states/evidence blocks
    // (meta.degrade is False on the tg path: the tg templates guard
    // every access, so render_template never degrades)
    val metrics =
      "{\"price_usd\":null,\"liquidity_usd\":null,\"fdv\":null,\"ohlc\":{}}"
    val sources = concat(lit("{\"security_source\":"),
      jstr(coalesce(col("risk_source"), lit(""))),
      lit(",\"dex_source\":\"\"}"))
    val states =
      "{\"cache\":false,\"degrade\":false,\"stale\":false,\"reason\":\"\"}"
    val evidence = "{\"goplus_raw\":{\"summary\":\"\"}}"

    val isTopic = col("card_type") === "topic"
    val topicEntities = concat(lit("["), concat_ws(",",
      transform(coalesce(col("topic_entities"),
        array().cast("array<string>")), jstr(_))), lit("]"))

    val doc = concat_ws("",
      lit("{"),
      concat_ws(",",
        field("type", jstr(col("card_type"))),
        field("event_key", jstr(col("event_key"))),
        field("risk_level", jstr(col("risk_level"))),
        field("token_info", tokenInfo),
        field("metrics", lit(metrics)),
        field("sources", sources),
        field("states", lit(states)),
        field("evidence", lit(evidence)),
        field("risk_note", jstr(coalesce(col("risk_note"), lit("")))),
        field("verify_path", jstr(col("verify_path"))),
        field("data_as_of", jstr(col("data_as_of"))),
        field("rendered", concat(lit("{\"tg\":"), jstr(col("render_tg")),
          lit("}"))),
        optField(col("rules_fired").isNotNull, "rules_fired",
          concat(lit("["), concat_ws(",",
            transform(coalesce(col("rules_fired"),
              array().cast("array<string>")), jstr(_))), lit("]"))),
        optField(col("legal_note").isNotNull, "legal_note",
          jstr(col("legal_note"))),
        // type-specific tails (transformers.py:71-77)
        optField(col("card_type") === "secondary", "source_level",
          lit("\"rumor\"")),
        optField(col("card_type") === "secondary", "features_snapshot",
          lit("{}")),
        optField(isTopic, "topic_id",
          coalesce(jstr(col("topic_id")), lit("null"))),
        optField(isTopic, "topic_entities", topicEntities),
        optField(isTopic, "topic_mention_count",
          coalesce(col("topic_mention_count").cast("string"), lit("null")))),
      lit("}"))

    df.withColumn("pushcard_json", doc)
      .withColumn("violations",
        GraftFunctions.jsonSchemaValidate(col("pushcard_json"),
          pushcardSchema))
      .withColumn("schema_ok", size(col("violations")) === 0)
      .withColumn("violations_str", array_join(col("violations"), "; "))
      // render_pipeline.py:282-296: a schema error marks the envelope
      // degraded but the push continues — the envelope's final
      // states.degrade is meta.degrade (false on the tg path) OR the
      // validation verdict; ctx states.degrade never reaches it
      .withColumn("degrade_final", !col("schema_ok"))
      .drop("violations")
  }
}
