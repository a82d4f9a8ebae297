package graft.operators

import scala.io.Source

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions.pyFixed

/** Card UI-channel rendering — the HTML string a card consumer sees in
  * the second render channel (reference api/cards/render_pipeline.py:
  * 45,49-66 `_env_ui`, an AUTOESCAPING Jinja environment over
  * templates/cards/primary_card.ui.j2 + the three siblings; primary
  * and secondary are byte-identical in the reference), as pure
  * `concat_ws`/`when` chains — zero UDFs, whole-stage-codegen'd.
  *
  * The static HTML between interpolation points is NOT transcribed
  * into code: it lives once in the `.ui.seg` resources under
  * src/main/resources/ui
  * (derived from the reference templates by tools/make_ui_segments.py
  * with the Jinja `{%-`/`-%}`/`{#- -#}` whitespace-control semantics
  * baked in), with `⟦token⟧` placeholders where the dynamic pieces
  * go. [[render]] folds a segment file with a token→Column map into
  * one concat chain; the DuckDB oracle folds the SAME file with a
  * token→SQL map ([[oracleExpr]]), so both engines carry the contract
  * text verbatim from a single copy.
  *
  * Channel semantics pinned byte-for-byte by CardRenderUiSpec against
  * goldens rendered through the REAL templates (tools/render_goldens
  * .py `render_ui`):
  *  - HTML autoescaping of every interpolation (`&amp; &lt; &gt;
  *    &#34; &#39;`, markupsafe order: `&` first);
  *  - the degradation contract (render_pipeline.py:124-132,135-154):
  *    a template exception — concretely `ca_norm[:8]` on a Jinja
  *    Undefined when a primary card has no contract address — falls
  *    back to the plain-text ui degraded form;
  *  - Jinja truthiness: an EMPTY `token_info` dict is falsy, so the
  *    token block is skipped even when the context carries the key;
  *  - `default()` replacing only Undefined (absent key), while
  *    `topic_confidence: None` renders the 待计算 fallback via its
  *    explicit `is not none` guard.
  */
object CardRenderUi {

  private val Token = "⟦([a-z0-9_]+)⟧".r

  /** Parse a segment resource into Left(static) / Right(token) runs. */
  def segments(name: String): Seq[Either[String, String]] = {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream(s"/ui/$name.ui.seg"), "UTF-8")
    val text = try src.mkString finally src.close()
    val out = Seq.newBuilder[Either[String, String]]
    var pos = 0
    for (m <- Token.findAllMatchIn(text)) {
      if (m.start > pos) out += Left(text.substring(pos, m.start))
      out += Right(m.group(1))
      pos = m.end
    }
    if (pos < text.length) out += Left(text.substring(pos))
    out.result()
  }

  /** Fold a segment file over a token→Column map into one string. */
  def render(name: String, tokens: Map[String, Column]): Column =
    concat_ws("", segments(name).map {
      case Left(s) => lit(s)
      case Right(t) => tokens.getOrElse(t,
        sys.error(s"segment $name: no binding for token ⟦$t⟧"))
    }: _*)

  /** Fold a segment file over a token→SQL-expression map into one
    * DuckDB `||` chain (NULL-safe via coalesce, matching concat_ws's
    * null-skipping) — the oracle side of the single-copy contract.
    */
  def oracleExpr(name: String, tokens: Map[String, String]): String =
    segments(name).map {
      case Left(s) => "'" + s.replace("'", "''") + "'"
      case Right(t) => "coalesce(" + tokens.getOrElse(t,
        sys.error(s"segment $name: no oracle binding for ⟦$t⟧")) + ", '')"
    }.mkString("(", " || ", ")")

  /** markupsafe/Jinja autoescape: `&` first, then the four brackets
    * and quotes — numeric entities for the quotes, exactly as
    * markupsafe.escape emits them.
    */
  def htmlEscape(c: Column): Column =
    replace(replace(replace(replace(replace(c,
      lit("&"), lit("&amp;")),
      lit("<"), lit("&lt;")),
      lit(">"), lit("&gt;")),
      lit("\""), lit("&#34;")),
      lit("'"), lit("&#39;"))

  /** UI-channel fixture wrinkles over the shared
    * [[CardRender.deriveContext]] frame (post-guardrail): plant
    * HTML-escapable characters and the cache/dex footer keys the tg
    * templates never read, mirroring tools/render_goldens.py
    * `ui_context` and the `q_j6_card_render_ui` oracle rule-for-rule.
    * Adds `dex_source`, `cache_state` and `token_present` (Jinja
    * truthiness of the token_info dict: present AND non-empty).
    */
  def uiWrinkle(df: DataFrame): DataFrame = {
    val E = col("E"); val U = col("U")
    df
      .withColumn("symbol",
        when(U % 13 === 5 && col("symbol").isNotNull,
          concat(col("symbol"), lit(" <A&B>\"q'"))).otherwise(col("symbol")))
      .withColumn("risk_note",
        when(E % 11 === 7 && col("risk_note").isNotNull,
          concat(col("risk_note"), lit(" <b>&\"x\"'")))
          .otherwise(col("risk_note")))
      .withColumn("verify_path",
        when(E % 12 === 5, concat(col("verify_path"), lit("?a=1&b=<2>")))
          .otherwise(col("verify_path")))
      .withColumn("legal_note",
        when(U % 14 === 7 && col("legal_note").isNotNull,
          concat(col("legal_note"), lit(" <i>&注</i>")))
          .otherwise(col("legal_note")))
      .withColumn("dex_source", when(U % 4 === 2, lit("dex<screener>&v1")))
      .withColumn("cache_state", U % 9 === 4)
      .withColumn("token_present", col("has_token") &&
        (col("symbol").isNotNull || col("chain").isNotNull ||
          col("ca_norm").isNotNull))
  }

  private def esc(c: Column): Column = htmlEscape(c)

  private def truthy(x: Column): Column = x.isNotNull && x =!= 0.0

  /** `${:,.0f}`-or-待获取 metric cell (both `{%- if -%}` arms glue). */
  private def moneyCell(x: Column): Column =
    when(truthy(x), concat(lit("$"), pyFixed(x, 0, grouping = true)))
      .otherwise("待获取")

  private val RiskColors = Seq(
    "red" -> "#ff4444", "yellow" -> "#ffaa00", "gray" -> "#808080")

  private def primaryTokens: Map[String, Column] = Map(
    "color" -> RiskColors.foldRight(lit("#44ff44"): Column) {
      case ((lvl, hex), acc) => when(col("risk_level") === lvl, hex)
        .otherwise(acc)
    },
    "warnbg" -> when(col("risk_level") === "red", "#fee")
      .when(col("risk_level") === "yellow", "#fff3cd")
      .when(col("risk_level") === "gray", "#f0f0f0")
      .otherwise("#d4edda"),
    "badge" -> when(col("risk_level") === "red", "高风险\n            ")
      .when(col("risk_level") === "yellow", "中风险\n            ")
      .when(col("risk_level") === "gray", "服务降级\n            ")
      .otherwise("低风险"),
    "symbol_e" -> esc(col("symbol")),
    "chain_up_e" -> esc(upper(col("chain"))),
    "ca8" -> esc(substring(col("ca_norm"), 1, 8)),
    "ca_6" -> esc(substring(col("ca_norm"), -6, 6)),
    "risk_warn" -> when(col("risk_level").isin("red", "yellow", "gray"),
      concat_ws("",
        lit("\n        <div class=\"risk-warning\">\n            " +
          "<strong>⚠️ 风险提示:</strong> "),
        esc(col("risk_note")),
        lit("\n        </div>"))),
    "price_cell" -> when(truthy(col("price_usd")),
      concat(lit("$"), pyFixed(col("price_usd"), 6))).otherwise("待获取"),
    "liq_cell" -> moneyCell(col("liquidity_usd")),
    "fdv_cell" -> moneyCell(col("fdv")),
    "h24_block" -> when(truthy(col("h24_o")) && truthy(col("h24_c")),
      concat(
        lit("\n            <div class=\"metric-item\">\n                " +
          "<div class=\"metric-label\">24h 变化</div>\n                " +
          "<div class=\"metric-value\">"),
        pyFixed((col("h24_c") - col("h24_o")) / col("h24_o") * 100.0, 2),
        lit("%</div>\n            </div>"))),
    "degrade_block" -> when(col("degrade"),
      "\n        <div class=\"degraded-warning\">\n            " +
        "⚠️ <strong>服务降级提示:</strong> " +
        "部分数据服务暂时不可用，显示结果基于缓存或降级策略\n        </div>"),
    "verify_e" -> esc(col("verify_path")),
    "asof_e" -> esc(col("data_as_of")),
    "legal_e" -> coalesce(esc(col("legal_note")),
      lit("本信息仅为风险线索与技术判断，不构成投资建议。")),
    "secsrc_e" -> esc(col("security_source")),
    "dexsrc_e" -> esc(col("dex_source")),
    "cache_sfx" -> when(col("cache_state"), " (缓存)"),
    "rules_json" -> coalesce(
      when(size(col("rules_fired")) > 0, to_json(col("rules_fired"))),
      lit("[]")),
    "secsrc_raw" -> esc(coalesce(col("security_source"), lit(""))))

  /** Shared token block (topic + market_risk templates): Jinja skips
    * it when the token_info dict is absent OR empty.
    */
  private def tokenBlock: Column = when(col("token_present"), concat_ws("",
    lit("\n  <div class=\"token-info\">\n    <strong>候选代币:</strong> "),
    esc(coalesce(col("symbol"), lit("UNKNOWN"))),
    lit(" ("), esc(upper(coalesce(col("chain"), lit("eth")))), lit(")\n    "),
    when(col("ca_norm").isNotNull, concat(
      lit("\n    <br><strong>合约地址:</strong> <code>"),
      esc(substring(col("ca_norm"), 1, 6)), lit("..."),
      esc(substring(col("ca_norm"), -4, 4)),
      lit("</code>\n    "))),
    lit("\n  </div>\n  ")))

  private def degradeAlert: Column = when(col("degrade"),
    "\n  <div class=\"alert alert-warning\">\n    " +
      "⚠️ <strong>服务降级提示:</strong> " +
      "部分数据服务暂时不可用，显示结果基于缓存或降级策略\n  </div>\n  ")

  private def liItem(cond: Column, label: String, body: Column): Column =
    when(cond, concat(
      lit(s"\n      <li><strong>$label:</strong> "), body,
      lit("</li>\n      ")))

  private def footerTokens: Map[String, Column] = Map(
    "degrade_alert" -> degradeAlert,
    "verify_def" -> esc(col("verify_path")),
    "asof_def" -> esc(col("data_as_of")),
    "legal_def" -> coalesce(esc(col("legal_note")),
      lit("本信息仅为风险线索与技术判断，不构成投资建议。")),
    "token_block" -> tokenBlock)

  private def topicTokens: Map[String, Column] = footerTokens ++ Map(
    "topic_id_item" -> liItem(
      col("topic_id").isNotNull && col("topic_id") =!= "",
      "话题ID", esc(col("topic_id"))),
    "entities_item" -> liItem(size(col("topic_entities")) > 0, "相关实体",
      array_join(transform(slice(col("topic_entities"), 1, 5), esc(_)), ", ")),
    "keywords_item" -> liItem(size(col("topic_keywords")) > 0, "关键词",
      array_join(transform(slice(col("topic_keywords"), 1, 5), esc(_)), ", ")),
    "mention" -> coalesce(col("topic_mention_count").cast("string"),
      lit("N/A")),
    "confidence" -> when(col("topic_confidence").isNotNull,
      concat(pyFixed(col("topic_confidence") * 100.0, 1), lit("%")))
      .otherwise("待计算"),
    "sources_item" -> liItem(size(col("topic_sources")) > 0, "来源",
      array_join(transform(slice(col("topic_sources"), 1, 5), esc(_)), ", ")),
    "links_item" -> {
      val links = slice(col("topic_evidence_links"), 1, 5)
      val n = size(links)
      val items = transform(links, (l, i) => concat_ws("",
        lit("\n        <a href=\""), esc(l), lit("\">证据"),
        (i + 1).cast("string"), lit("</a>"),
        when(i < n - 1, ", "),
        lit("\n        ")))
      when(size(col("topic_evidence_links")) > 0, concat(
        lit("\n      <li><strong>证据:</strong>\n        "),
        array_join(items, ""),
        lit("\n      </li>\n      ")))
    })

  private def marketRiskTokens: Map[String, Column] = {
    // set risk = goplus_risk | default(risk_level) | default('gray'):
    // goplus_risk carries the PRE-guardrail level (deriveContext runs
    // first), risk_level the post-guardrail one — same as the tg card.
    val risk = coalesce(col("goplus_risk"), col("risk_level"), lit("gray"))
    def span(cls: String, txt: String): String =
      "\n    <span class=\"badge badge-" + cls + "\">" + txt +
        "</span>\n    "
    footerTokens ++ Map(
      "mr_badge" -> when(risk === "red", span("danger", "🔴 高风险警报"))
        .when(risk === "yellow", span("warning", "🟡 中风险提示"))
        .when(risk === "gray", span("secondary", "⚫ 服务降级"))
        .otherwise(span("success", "🟢 低风险信号")),
      "mr_risk_note" -> when(
        col("risk_note").isNotNull && col("risk_note") =!= "",
        concat(
          lit("\n  <div class=\"alert alert-warning\">\n    " +
            "⚠️ <strong>风险提示:</strong> "),
          esc(col("risk_note")), lit("\n  </div>\n  "))),
      "mr_goplus" -> when(risk === "red", "🔴 高风险")
        .when(risk === "yellow", "🟡 中风险")
        .when(risk === "green", "🟢 低风险")
        .otherwise("⚫ 未知"),
      "buy_tax" -> when(col("buy_tax").isNotNull,
        concat(pyFixed(col("buy_tax"), 1), lit("%"))).otherwise("-"),
      "sell_tax" -> when(col("sell_tax").isNotNull,
        concat(pyFixed(col("sell_tax"), 1), lit("%"))).otherwise("-"),
      "lp_lock" -> when(
        col("lp_lock_days").isNotNull && col("lp_lock_days") > 0,
        concat(col("lp_lock_days").cast("string"), lit(" 天")))
        .otherwise("未锁定"),
      "honeypot" -> when(col("honeypot").isNotNull,
        when(col("honeypot"), "是").otherwise("否")).otherwise("未知"),
      "mr_sec_src" -> esc(coalesce(col("security_source"),
        col("risk_source"), lit("-"))))
  }

  /** The _render_degraded ui form (render_pipeline.py:135-154): plain
    * text, UNescaped — it is an f-string over the raw context.
    */
  private def degradedUi: Column = concat(
    col("card_type"), lit(" Card (Degraded)\nSymbol: "),
    coalesce(col("symbol"), lit("UNKNOWN")),
    lit("\nRisk: "), col("risk_level"))

  /** Add `render_ui` — the exact per-type HTML (or degraded-fallback)
    * string — to a [[uiWrinkle]]'d context frame. Map-side, codegen'd.
    */
  def renderUi(df: DataFrame): DataFrame = {
    val primarySeg = render("primary_card", primaryTokens)
    df.withColumn("render_ui",
      when(col("card_type").isin("primary", "secondary") &&
        col("ca_norm").isNull, degradedUi)
        .when(col("card_type").isin("primary", "secondary"), primarySeg)
        .when(col("card_type") === "topic", render("topic_card", topicTokens))
        .otherwise(render("market_risk_card", marketRiskTokens)))
  }
}
