package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** J6/F18/R5 — card assembly (reference api/cards/build.py:462-602,
  * summarizer.py:27-224, registry.py:19-87).
  *
  * A card joins the event row with its enrichment sources (security,
  * dex, onchain, rules), tracks WHICH sources were missing as degrade
  * flags, takes `data_as_of` as the OLDEST source timestamp
  * (build.py:174-191), renders a template summary with truncation, and
  * validates shape (P6 guards, cards.schema.json limits).
  */
object Cards {

  val SummaryMax = 280
  val RiskNoteMax = 160

  /** Template summary (F18): "SYMBOL level=LEVEL liq=... risk=...";
    * truncated to the schema's 280-char bound.
    */
  def summary(symbol: Column, level: Column, liquidity: Column,
      risk: Column): Column =
    substring(concat_ws(" ",
      coalesce(symbol, lit("?")),
      concat(lit("level="), coalesce(level, lit("none"))),
      concat(lit("liq="), coalesce(
        liquidity.cast("decimal(18,2)").cast("string"), lit("na"))),
      concat(lit("risk="), coalesce(risk, lit("gray")))), 1, SummaryMax)

  def riskNote(risk: Column, degrade: Column): Column =
    substring(when(degrade, concat(lit("degraded sources; risk="),
        coalesce(risk, lit("gray"))))
      .otherwise(concat(lit("risk="), coalesce(risk, lit("gray")))),
      1, RiskNoteMax)

  /** Card type routing (R5): market_risk if risky, topic for
    * topic-flavored rows, else primary/secondary by source level.
    */
  def cardType(risk: Column, hasTopic: Column, sourceLevel: Column): Column =
    when(risk === "red", "market_risk")
      .when(hasTopic, "topic")
      .when(sourceLevel === "strong", "primary")
      .otherwise("secondary")

  /** Assemble cards from an event frame + enrichment lookups.
    * All enrichments are LEFT joins (missing source → degrade flag, not
    * a dropped row) and the small lookup sides are broadcast.
    */
  def build(events: DataFrame, goplus: DataFrame, dex: DataFrame,
      rules: DataFrame): DataFrame = {
    val e = events
    val j = e
      .join(broadcast(goplus), Seq("event_key"), "left")
      .join(broadcast(dex), Seq("event_key"), "left")
      .join(broadcast(rules), Seq("event_key"), "left")
    val degrade = col("goplus_risk").isNull || col("dex_liquidity").isNull ||
      col("rules_level").isNull
    j.select(
      col("event_key"),
      cardType(coalesce(col("goplus_risk"), lit("gray")),
        col("topic_hash").isNotNull, col("source_level")).as("card_type"),
      summary(col("symbol"), col("rules_level"), col("dex_liquidity"),
        col("goplus_risk")).as("summary"),
      riskNote(col("goplus_risk"), degrade).as("risk_note"),
      degrade.as("degrade"),
      // oldest contributing source timestamp (µs)
      least(col("event_us"),
        coalesce(col("goplus_us"), col("event_us")),
        coalesce(col("dex_us"), col("event_us"))).as("data_as_of_us"))
  }

  /** P6-style shape validation predicate. */
  def isValid(eventKey: Column, summaryCol: Column, riskNoteCol: Column): Column =
    eventKey.rlike("^[a-zA-Z0-9:_\\-\\.]{8,128}$") &&
      length(summaryCol).between(4, SummaryMax) &&
      length(riskNoteCol).between(4, RiskNoteMax)
}
