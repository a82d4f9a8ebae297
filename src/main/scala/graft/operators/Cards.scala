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

  // -----------------------------------------------------------------
  // Full nested card document (reference api/cards/build.py:462-602,
  // schemas/cards.schema.json)
  // -----------------------------------------------------------------

  val GoplusRiskEnum = Seq("green", "yellow", "red", "gray")
  val RulesLevelEnum = Seq("none", "watch", "caution", "risk")

  /** Reference `_truncate` (summarizer.py:107-112): ALWAYS squeeze
    * whitespace runs (`\s+`, Unicode classes — hence `(?U)`; Java's
    * default `\s` is ASCII-only) to a single space and strip the ends,
    * then — only when still over the limit — cut to `max-1` chars and
    * append `…`, so an over-limit result is exactly `max` chars.
    * Spark `length`/`substring` count code points, matching Python
    * `len`/slicing.
    */
  def pyTruncate(s: Column, max: Int): Column =
    pyCut(pySqueeze(s), max)

  /** The squeeze half of `_truncate`: collapse runs of (unicode)
    * whitespace and trim. Split out so callers can materialize it once
    * per row before [[pyCut]] references it three times (condition +
    * both branches). */
  def pySqueeze(s: Column): Column =
    trim(regexp_replace(s, "(?U)\\s+", " "))

  /** The cut half of `_truncate`: `squeezed` should be a plain column
    * reference — it is evaluated up to three times. */
  def pyCut(squeezed: Column, max: Int): Column =
    when(length(squeezed) <= max, squeezed)
      .otherwise(concat(substring(squeezed, 1, max - 1), lit("…")))

  /** Reference `_strip_trailing_punct` (summarizer.py:96-98):
    * `rstrip(" ,;，；")`.
    */
  def stripTrailingPunct(s: Column): Column =
    regexp_replace(s, "[ ,;，；]+$", "")

  /** Template summary exactly as the reference renders it
    * (summarizer.py:115-138): `" | "`-joined [symbol, 价格≈$<%.6g>?,
    * 流动性≈$<%.6g>?, 规则判定<level>], where a 0/absent price or
    * liquidity is OMITTED (walrus truthiness, summarizer.py:46,58),
    * then `_strip_trailing_punct` and `_truncate(280)` (squeeze +
    * `max-1`+`…` cut). Numbers use the [[graft.expressions
    * .PyG6Format]] kernel — Java `%g` does not match C/Python.
    *
    * Deviation (documented): the reference summarizer re-derives the
    * symbol from the card payload via `_extract_symbol` (payload
    * symbol, else a chain prefix parsed off `event_key`, else the
    * literal "Token" — summarizer.py:27-38); here callers pass the
    * symbol column from the events frame directly, which IS that
    * payload symbol whenever it is non-null.
    */
  def templateSummary(symbol: Column, price: Column, liq: Column,
      level: Column): Column =
    pyCut(templateSummaryRaw(symbol, price, liq, level), SummaryMax)

  /** Everything up to (not including) the final length cut — the
    * %.6g renders and regex squeeze. Callers that consume the summary
    * more than once materialize THIS once and [[pyCut]] the column. */
  def templateSummaryRaw(symbol: Column, price: Column, liq: Column,
      level: Column): Column = {
    val g = graft.expressions.GraftFunctions.py6g _
    pySqueeze(stripTrailingPunct(concat_ws(" | ",
      symbol,
      when(price.isNotNull && price =!= 0.0,
        concat(lit("价格≈$"), g(price.cast("double")))),
      when(liq.isNotNull && liq =!= 0.0,
        concat(lit("流动性≈$"), g(liq.cast("double")))),
      concat(lit("规则判定"), level))))
  }

  /** `合约体检<risk>；关注税率/LP/交易限制` (summarizer.py:136-138),
    * through the same `_truncate(160)` as the reference (:288).
    */
  def templateRiskNote(risk: Column): Column =
    pyCut(templateRiskNoteRaw(risk), RiskNoteMax)

  /** Pre-cut half of [[templateRiskNote]] (same split rationale as
    * [[templateSummaryRaw]]). */
  def templateRiskNoteRaw(risk: Column): Column =
    pySqueeze(concat(lit("合约体检"), coalesce(risk, lit("unknown")),
      lit("；关注税率/LP/交易限制")))

  /** Assemble the full nested card document and render it with
    * `to_json` (null fields omitted — Spark's default — mirrors the
    * reference's conditional key insertion).
    *
    * Expected input frames (all joined on `event_key`, lookups
    * broadcast):
    *   - events:  event_key, symbol, event_us
    *   - goplus:  risk, risk_source, tax_buy, tax_sell, lp_locked,
    *              honeypot, goplus_us
    *   - dex:     price_usd, liquidity_usd, fdv, ohlc_m5 struct,
    *              dex_us
    *   - onchain: features_snapshot struct, source_level, onchain_us
    *   - rules:   level, score, reasons array, all_reasons array,
    *              rules_us
    *   - evidence: evidence array<struct<type,desc,url>>
    *
    * Rows with NEITHER goplus nor dex data are dropped — the reference
    * raises `ValueError("no usable sources")` for them
    * (build.py:516-518).
    *
    * Monetary fields ride as DECIMAL inside the JSON so both engines
    * print identical digit strings (see F21 serialization notes);
    * `data_as_of` is the OLDEST contributing source timestamp
    * (build.py:174-191), ISO-formatted.
    */
  def buildDocument(events: DataFrame, goplus: DataFrame, dex: DataFrame,
      onchain: DataFrame, rules: DataFrame, evidence: DataFrame): DataFrame = {
    // plain equi-joins: source frames can be event-sized (1:1 with the
    // event table), so forcing broadcast would collect the whole
    // pipeline to the driver at scale — AQE upgrades any genuinely
    // small side to a broadcast join at runtime instead
    val j = events
      .join(goplus, Seq("event_key"), "left")
      .join(dex, Seq("event_key"), "left")
      .join(onchain, Seq("event_key"), "left")
      .join(rules, Seq("event_key"), "left")
      .join(evidence, Seq("event_key"), "left")
      // reference: no goplus AND no dex → ValueError("no usable sources")
      .filter(col("risk").isNotNull || col("dex_us").isNotNull)

    val hasGoplus = col("risk").isNotNull
    val hasDex = col("dex_us").isNotNull
    val hasRules = col("level").isNotNull
    val hasOnchain = col("onchain_us").isNotNull

    // enum guards (build.py:207-210, 355-358)
    val riskGuard = when(col("risk").isInCollection(GoplusRiskEnum), col("risk"))
      .otherwise(lit("gray"))
    val riskOut = when(hasGoplus, riskGuard).otherwise(lit("gray"))
    val levelGuard = when(col("level").isInCollection(RulesLevelEnum), col("level"))
      .otherwise(lit("none"))
    val levelOut = when(hasRules, levelGuard).otherwise(lit("none"))

    // degrade reasons accumulate in build order (build.py:497-530)
    val degradeReasons = array_compact(array(
      when(!hasGoplus, lit("missing goplus")),
      when(!hasDex, lit("missing dex")),
      when(!hasRules, lit("missing rules"))))
    val degrade = !hasGoplus || !hasDex || !hasRules

    val goplusSection = when(hasGoplus, struct(
        riskGuard.as("risk"),
        coalesce(col("risk_source"), lit("GoPlus@v1.0")).as("risk_source"),
        col("tax_buy"), col("tax_sell"), col("lp_locked"), col("honeypot")))
      .otherwise(struct(lit("gray").as("risk"),
        lit("unavailable").as("risk_source"),
        lit(null).cast("decimal(6,4)").as("tax_buy"),
        lit(null).cast("decimal(6,4)").as("tax_sell"),
        lit(null).cast("boolean").as("lp_locked"),
        lit(null).cast("boolean").as("honeypot")))

    val dexSection = struct(
      when(hasDex, col("price_usd")).as("price_usd"),
      when(hasDex, col("liquidity_usd")).as("liquidity_usd"),
      when(hasDex, col("fdv")).as("fdv"),
      when(hasDex && col("ohlc_m5").isNotNull,
        struct(col("ohlc_m5").as("m5"))).as("ohlc"))

    // rules.reasons: own reasons first (max 3), degrade reasons fill
    // the remaining slots (build.py:364-372); missing rules → the
    // degrade reasons themselves (build.py:341-346). `reasonsOut` is
    // referenced from both the document and the validity predicate and
    // its tree re-expands degradeReasons three times, so it gets
    // materialized as a column below (same rationale as summary_str).
    val ownReasons = when(hasRules, slice(coalesce(col("reasons"),
      array().cast("array<string>")), 1, 3)).otherwise(degradeReasons)
    val reasonsOutExpr = when(hasRules,
        slice(concat(ownReasons, degradeReasons), 1, 3))
      .otherwise(slice(degradeReasons, 1, 3))
    val reasonsOut = col("reasons_out")
    val rulesSection = struct(
      levelOut.as("level"),
      when(hasRules, col("score")).as("score"),
      when(size(reasonsOut) > 0, reasonsOut).as("reasons"),
      // key present only when the source had it (build.py:374-376)
      when(hasRules && col("all_reasons").isNotNull,
        slice(col("all_reasons"), 1, 20)).as("all_reasons"))

    val onchainSection = when(hasOnchain, struct(
      col("features_snapshot"), col("source_level")))

    // evidence items: type[:32], desc[:240], url (build.py:389-425)
    val evidenceOut = when(col("evidence").isNotNull && size(col("evidence")) > 0,
      transform(col("evidence"), e => struct(
        substring(coalesce(e.getField("type"), lit("unknown")), 1, 32).as("type"),
        substring(coalesce(e.getField("desc"), lit("No description")), 1, 240).as("desc"),
        e.getField("url").as("url"))))

    // oldest contributing source timestamp, ISO (build.py:174-191)
    val dataAsOfUs = least(col("goplus_us"), col("dex_us"),
      col("onchain_us"), col("rules_us"))
    val dataAsOf = date_format(timestamp_micros(dataAsOfUs),
      "yyyy-MM-dd'T'HH:mm:ss'Z'")

    // card_type routing (build.py:544-550)
    val cardType = when(hasOnchain && levelOut.isInCollection(Seq("caution", "risk")),
        "primary")
      .when(levelOut === "watch", "secondary")
      .otherwise("topic")

    // Render summary/risk_note ONCE per row: both strings feed the JSON
    // document AND the schema-validity predicate, and the %.6g +
    // regex-squeeze chain is the most expensive scalar work in the card
    // path. Materializing them as a dedicated projection keeps
    // CollapseProject from inlining (= double-evaluating) the kernels
    // into the two consumers.
    // two projection layers: the expensive raw render (regex squeeze +
    // %.6g kernels) lands in its own project, and the cut references it
    // as a plain column (pyCut evaluates its argument up to 3×)
    val jr = j
      .withColumn("summary_sq", templateSummaryRaw(col("symbol"),
        col("price_usd"), col("liquidity_usd"), levelOut))
      .withColumn("risk_note_sq", templateRiskNoteRaw(riskOut))
      .withColumn("reasons_out", reasonsOutExpr)
      .withColumn("summary_str", pyCut(col("summary_sq"), SummaryMax))
      .withColumn("risk_note_str", pyCut(col("risk_note_sq"), RiskNoteMax))
    val summaryCol = col("summary_str")
    val riskNoteCol = col("risk_note_str")

    val doc = struct(
      col("event_key"),
      cardType.as("card_type"),
      struct(
        goplusSection.as("goplus"),
        dexSection.as("dex"),
        onchainSection.as("onchain"),
        rulesSection.as("rules")).as("data"),
      evidenceOut.as("evidence"),
      summaryCol.as("summary"),
      riskNoteCol.as("risk_note"),
      struct(
        lit("cards@19.0").as("version"),
        dataAsOf.as("data_as_of"),
        lit("template").as("summary_backend"),
        when(degrade, lit(true)).as("degrade")).as("meta"))

    jr.select(
      col("event_key"),
      cardType.as("card_type"),
      to_json(doc).as("card_json"),
      degrade.as("degrade"),
      // schema bounds (cards.schema.json): uppercase key pattern,
      // enums, summary/risk_note lengths, reason caps, tax range
      (col("event_key").rlike("^[A-Z0-9:_\\-\\.]{8,128}$") &&
        length(summaryCol).between(1, SummaryMax) &&
        length(riskNoteCol).between(1, RiskNoteMax) &&
        riskOut.isInCollection(GoplusRiskEnum) &&
        levelOut.isInCollection(RulesLevelEnum) &&
        size(reasonsOut) <= 3 &&
        coalesce(col("tax_buy").cast("double").between(0, 1), lit(true)) &&
        coalesce(col("tax_sell").cast("double").between(0, 1), lit(true)))
        .as("valid"))
  }
}
