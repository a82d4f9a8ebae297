package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** R1 — scoring rules engine (reference api/rules/eval_event.py:263-557,
  * rules/rules.yml).
  *
  * The reference hot-loads YAML rules whose `condition` strings are
  * Python-ish boolean expressions over a whitelisted field set, sums the
  * scores of the rules that hit, and maps the total to a level. Here a
  * rule's condition is a Spark SQL boolean expression compiled ONCE via
  * `expr()` into the plan — Catalyst folds all rule branches into a
  * single codegen'd projection, so evaluating 25 rules over a row is one
  * pass, no interpretation. Hot reload == rebuild the plan with a new
  * rule set (cheap, driver-side).
  */
final case class ScoreRule(name: String, condition: String, score: Double,
    reason: String)

final case class RuleThresholds(opportunity: Double = 15.0,
    caution: Double = -5.0)

object RuleEngine {

  /** Total score: Σ score over rules whose condition holds. */
  def scoreColumn(rules: Seq[ScoreRule]): Column =
    rules.map(r => when(expr(r.condition), lit(r.score)).otherwise(lit(0.0)))
      .reduceOption(_ + _).getOrElse(lit(0.0))

  /** Names of the rules that hit, in declaration order. */
  def hitsColumn(rules: Seq[ScoreRule]): Column =
    filter(
      array(rules.map(r => when(expr(r.condition), lit(r.name))): _*),
      c => c.isNotNull)

  /** Top reasons: reasons of hit rules, first `topK` in declaration
    * order (reference sorts by priority/|score| then takes 3;
    * declaration order IS our priority order).
    */
  def reasonsColumn(rules: Seq[ScoreRule], topK: Int = 3): Column =
    slice(filter(
      array(rules.map(r => when(expr(r.condition), lit(r.reason))): _*),
      c => c.isNotNull), 1, topK)

  /** Level from total score: opportunity / caution / observe
    * (reference api/rules/eval_event.py:550-557).
    */
  def levelColumn(score: Column, t: RuleThresholds = RuleThresholds()): Column =
    when(score >= t.opportunity, "opportunity")
      .when(score <= t.caution, "caution")
      .otherwise("observe")

  /** Apply the full engine: adds score, hits, reasons, level. */
  def evaluate(df: DataFrame, rules: Seq[ScoreRule],
      t: RuleThresholds = RuleThresholds()): DataFrame = {
    val sc = scoreColumn(rules)
    df.withColumn("rules_score", sc)
      .withColumn("rules_hits", hitsColumn(rules))
      .withColumn("rules_reasons", reasonsColumn(rules))
      .withColumn("rules_level", levelColumn(col("rules_score"), t))
  }

  // -----------------------------------------------------------------
  // YAML-doc evaluator (reference api/rules/eval_event.py:263-557)
  // -----------------------------------------------------------------

  import RulesConfig.RulesDoc

  /** Total score for a loaded document: Σ in declaration order (the
    * reference accumulates in the same order — float addition order
    * matters for bit parity).
    */
  def docScore(doc: RulesDoc): Column =
    doc.rules.map(r => when(expr(r.conditionSql), lit(r.score)).otherwise(lit(0.0)))
      .reduceOption(_ + _).getOrElse(lit(0.0))

  /** Hit rule ids, declaration order (eval_event.py:338-341). */
  def docHits(doc: RulesDoc): Column =
    filter(array(doc.rules.map(r =>
      when(expr(r.conditionSql), lit(r.id))): _*), c => c.isNotNull)

  /** `market_risk` tag — deduped — when any MR* rule hits
    * (eval_event.py:343-358).
    */
  def docTags(doc: RulesDoc): Column = {
    val mr = doc.rules.filter(_.id.startsWith("MR"))
    if (mr.isEmpty) array().cast("array<string>")
    else array_compact(array(
      when(mr.map(r => expr(r.conditionSql)).reduce(_ || _), lit("market_risk"))))
  }

  /** Reason selection exactly as `_select_top_reasons`
    * (eval_event.py:521-548): entries = hit rules (group priority,
    * |score|) + missing-map hits at priority 100 / score 0; sorted by
    * (priority DESC, |score| DESC) with DECLARATION order as the
    * stable tie-break (Python's sort is stable); deduped by reason
    * keeping first. Encoded for `sort_array` as ascending
    * (-priority, -|score|, seq).
    *
    * Returns (top3, all) — both arrays.
    */
  def docReasons(doc: RulesDoc): (Column, Column) = {
    val n = doc.rules.size
    val hitEntries = doc.rules.zipWithIndex.map { case (r, i) =>
      when(expr(r.conditionSql), struct(
        lit(-r.priority).as("np"),
        lit(-math.abs(r.score)).as("ns"),
        lit(i).as("seq"),
        lit(r.reason).as("reason")))
    }
    val missingEntries = doc.missing.zipWithIndex.map { case (m, j) =>
      when(expr(m.conditionSql), struct(
        lit(-100).as("np"),
        lit(-0.0).as("ns"),
        lit(n + j).as("seq"),
        lit(m.reason).as("reason")))
    }
    // sort + dedup + cap run in the codegen'd TopReasons kernel — the
    // sort_array + transform + positional-dedup-filter formulation is
    // interpreted per element and was ~9 s over 100 k rows at sf0.1
    val selected = graft.expressions.ReasonFunctions.topReasons(
      array_compact(array(hitEntries ++ missingEntries: _*)), 3)
    (selected.getField("top"), selected.getField("all"))
  }

  /** Apply a loaded YAML document: score, level, hits, tags, top-3 +
    * all reasons — one codegen'd projection, no per-row interpretation.
    */
  def evaluateDoc(df: DataFrame, doc: RulesDoc): DataFrame = {
    val (top3, all) = docReasons(doc)
    df.withColumn("rules_score", docScore(doc))
      .withColumn("rules_level", levelColumn(col("rules_score"), doc.thresholds))
      .withColumn("rules_hits", docHits(doc))
      .withColumn("rules_tags", docTags(doc))
      .withColumn("rules_reasons", top3)
      .withColumn("rules_all_reasons", all)
  }

  /** The demo rule set used by queries/specs — semantics mirror the
    * reference's market rule groups (liquidity / tax / honeypot /
    * sentiment / heat; rules/rules.yml:1-129) over the whitelisted
    * field names (api/rules/eval_event.py:267-276).
    */
  val DemoRules: Seq[ScoreRule] = Seq(
    ScoreRule("honeypot_red", "goplus_risk = 'red'", -10,
      "security risk flagged red"),
    ScoreRule("tax_high", "buy_tax >= 10 or sell_tax >= 10", -6,
      "trading tax above 10%"),
    ScoreRule("liquidity_deep", "dex_liquidity is not null and dex_liquidity >= 150", 8,
      "deep DEX liquidity"),
    ScoreRule("liquidity_thin", "dex_liquidity is not null and dex_liquidity < 30", -4,
      "thin DEX liquidity"),
    ScoreRule("volume_active", "dex_volume_1h >= 100", 6,
      "active 1h volume"),
    ScoreRule("heat_rising", "heat_slope is not null and heat_slope > 0.2", 7,
      "heat slope rising"),
    ScoreRule("heat_falling", "heat_slope is not null and heat_slope < -0.2", -3,
      "heat slope falling"),
    ScoreRule("sentiment_positive", "last_sentiment_score >= 0.25", 4,
      "positive sentiment"),
    ScoreRule("sentiment_negative", "last_sentiment_score <= -0.25", -4,
      "negative sentiment"),
    ScoreRule("lp_unlocked", "lp_lock_days is not null and lp_lock_days < 30", -5,
      "LP lock under 30 days"))
}

/** R2 — on-chain verdict DSL (reference api/onchain/rules_engine.py:
  * 106-265, rules/onchain.yml): named thresholds + upgrade_if /
  * downgrade_if comparisons; downgrade wins on conflict; confidence
  * `min(1, 0.6 + 0.4 * fraction_of_upgrade_conditions_met)`;
  * out-of-range features → insufficient.
  */
object OnchainVerdict {

  final case class Cmp(field: String, op: String, threshold: Double) {
    def column: Column = op match {
      case ">=" => col(field) >= threshold
      case "<=" => col(field) <= threshold
      case ">"  => col(field) > threshold
      case "<"  => col(field) < threshold
      case _    => throw new IllegalArgumentException(s"bad op $op")
    }
    def sql: String = s"$field $op $threshold"
  }

  final case class VerdictConfig(
      upgradeIf: Seq[Cmp], downgradeIf: Seq[Cmp],
      ranges: Map[String, (Double, Double)])

  /** Demo config mirroring rules/onchain.yml:1-23 semantics. */
  val Demo: VerdictConfig = VerdictConfig(
    upgradeIf = Seq(
      Cmp("addr_active", ">=", 50), Cmp("growth_ratio", ">=", 0.10)),
    downgradeIf = Seq(
      Cmp("top10_share", ">=", 0.80), Cmp("self_loop_ratio", ">=", 0.30)),
    ranges = Map(
      "growth_ratio" -> (-1.0, 100.0),
      "top10_share" -> (0.0, 1.0),
      "self_loop_ratio" -> (0.0, 1.0)))

  def verdictColumns(cfg: VerdictConfig): (Column, Column) = {
    val inRange = cfg.ranges.toSeq.sortBy(_._1).map { case (f, (lo, hi)) =>
      col(f).isNull || (col(f) >= lo && col(f) <= hi)
    }.reduce(_ && _)
    val upgradeHits = cfg.upgradeIf.map(c =>
      when(c.column, 1).otherwise(0)).reduce(_ + _)
    val downgrade = cfg.downgradeIf.map(_.column).reduce(_ || _)
    val verdict = when(!inRange, "insufficient")
      .when(downgrade, "downgrade")
      .when(upgradeHits === cfg.upgradeIf.size, "upgrade")
      .otherwise("hold")
    val confidence = when(!inRange, 0.0).otherwise(
      least(lit(1.0), lit(0.6) + lit(0.4) *
        upgradeHits.cast("double") / cfg.upgradeIf.size))
    (verdict, confidence)
  }
}
