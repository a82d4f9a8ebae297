package graft.rules

import scala.jdk.CollectionConverters._

/** Rules-YAML front-end (reference api/rules/eval_event.py:24-260,
  * rules/rules.yml): loads the `version / groups / rules / scoring /
  * missing_map` document, substitutes `${ENV:default}` placeholders
  * from a WHITELISTED environment set with numeric normalization, AST-
  * validates conditions against the field whitelist, and compiles each
  * condition to a Spark-SQL boolean expression string.
  *
  * Null semantics line up for free: Python's `None > 10` raises →
  * condition False; SQL's `NULL > 10` is NULL → `CASE WHEN` falls
  * through. (The reference's heat_slope-defaults-to-0 shim only fires
  * when the KEY is absent from the context dict, which has no
  * DataFrame analog — a null heat_slope behaves identically in both
  * engines: no heat rule hits.)
  */
object RulesConfig {

  /** Reference eval_event.py:24-31 — only these substitute. */
  val AllowedEnvs: Set[String] = Set(
    "THETA_LIQ", "THETA_VOL", "THETA_SENT",
    "MARKET_RISK_VOLUME_THRESHOLD", "MARKET_RISK_LIQ_MIN",
    "MARKET_RISK_LIQ_RISK")

  /** Reference eval_event.py:267-276 — expression field whitelist. */
  val AllowedFields: Set[String] = Set(
    "goplus_risk", "buy_tax", "sell_tax", "lp_lock_days",
    "dex_liquidity", "dex_volume_1h", "heat_slope",
    "last_sentiment_score")

  private val Keywords = Set("and", "or", "not", "is", "null")

  final case class LoadedRule(id: String, group: String, priority: Int,
      conditionSql: String, score: Double, reason: String)
  final case class MissingRule(source: String, conditionSql: String,
      reason: String)
  final case class RulesDoc(version: String, rules: Seq[LoadedRule],
      thresholds: RuleThresholds, missing: Seq[MissingRule])

  private val EnvPattern = "\\$\\{([A-Z_]+):([^}]*)\\}".r

  /** `${ENV_KEY:default}` → env value (whitelisted keys only, original
    * text kept otherwise), numerically normalized the way the
    * reference does (`"50000"` → int repr, `"0.30"` → float repr
    * `"0.3"`). Reference eval_event.py:102-125.
    */
  def substituteEnv(content: String,
      env: Map[String, String] = sys.env): String =
    EnvPattern.replaceAllIn(content, m => {
      val key = m.group(1)
      val default = m.group(2)
      if (!AllowedEnvs.contains(key))
        scala.util.matching.Regex.quoteReplacement(m.matched)
      else {
        val v = env.getOrElse(key, default)
        val normalized =
          try {
            if (v.contains(".")) v.toDouble.toString else v.toLong.toString
          } catch { case _: NumberFormatException => v }
        scala.util.matching.Regex.quoteReplacement(normalized)
      }
    })

  /** Python-ish condition → Spark/ANSI SQL: `==` → `=`, `!=` → `<>`;
    * `and`/`or`/`is [not] null`/quoted strings pass through. Throws on
    * non-whitelisted identifiers (reference validation rejects the
    * whole document).
    */
  def conditionToSql(cond: String): String = {
    val sql = cond.replace("==", "=").replace("!=", "<>")
    val noStrings = sql.replaceAll("'[^']*'", " ")
    val idents = "[A-Za-z_][A-Za-z0-9_]*".r.findAllIn(noStrings)
      .map(_.toLowerCase).toSet
    val bad = idents -- Keywords -- AllowedFields
    require(bad.isEmpty,
      s"condition '$cond' references non-whitelisted identifiers: $bad")
    sql
  }

  /** Parse + substitute + validate a YAML document. */
  def parse(yamlText: String,
      env: Map[String, String] = sys.env): RulesDoc = {
    val yaml = new org.yaml.snakeyaml.Yaml()
    val root = yaml.load[java.util.Map[String, Object]](yamlText).asScala

    def str(v: Object): String = String.valueOf(v)
    def num(v: Object): Double = v match {
      case n: Number => n.doubleValue()
      case s => str(s).toDouble
    }

    val version = root.get("version").map(str).getOrElse("unknown")

    val groups = root("groups").asInstanceOf[java.util.List[Object]].asScala
    val rules = groups.flatMap { g0 =>
      val g = g0.asInstanceOf[java.util.Map[String, Object]].asScala
      val name = g.get("name").map(str).getOrElse("unknown")
      val priority = g.get("priority").map(num(_).toInt).getOrElse(0)
      g("rules").asInstanceOf[java.util.List[Object]].asScala.zipWithIndex
        .map { case (r0, idx) =>
          val r = r0.asInstanceOf[java.util.Map[String, Object]].asScala
          // id field or auto `<group>_<idx>` (eval_event.py:328-330)
          val id = r.get("id").map(str).getOrElse(s"${name}_$idx")
          val cond = r.get("condition").orElse(r.get("when")).map(str)
            .getOrElse("")
          LoadedRule(id, name, priority,
            conditionToSql(substituteEnv(cond, env)),
            r.get("score").map(num).getOrElse(0.0),
            r.get("reason").map(str).getOrElse(""))
        }
    }.toSeq

    val thresholds = root.get("scoring")
      .map(_.asInstanceOf[java.util.Map[String, Object]].asScala)
      .flatMap(_.get("thresholds"))
      .map(_.asInstanceOf[java.util.Map[String, Object]].asScala)
      .map(t => RuleThresholds(
        t.get("opportunity").map(num).getOrElse(15.0),
        t.get("caution").map(num).getOrElse(-5.0)))
      .getOrElse(RuleThresholds())

    // entries without a usable condition are DROPPED, mirroring the
    // reference: unknown bare-string sources `continue`, and a dict
    // condition of "" never fires `if condition and evaluate(...)`
    // (eval_event.py:427-445) — keeping them here would feed `expr("")`
    // a ParseException at plan time
    val missing = root.get("missing_map")
      .map(_.asInstanceOf[java.util.Map[String, Object]].asScala)
      .map(_.map { case (source, info0) =>
        info0 match {
          case m: java.util.Map[_, _] =>
            val info = m.asInstanceOf[java.util.Map[String, Object]].asScala
            MissingRule(source,
              conditionToSql(substituteEnv(
                info.get("condition").map(str).getOrElse(""), env)),
              // default reason string as the reference emits it
              // (eval_event.py:375-377)
              info.get("reason").map(str).getOrElse(s"$source 数据缺失"))
          case s => // bare-string form: default condition per source
            val cond = source match {
              case "dex" => "dex_liquidity is null and dex_volume_1h is null"
              case "hf" => "last_sentiment_score is null"
              case "goplus" => "goplus_risk is null"
              case _ => ""
            }
            MissingRule(source, cond, str(s))
        }
      }.toSeq.filter(_.conditionSql.trim.nonEmpty))
      .getOrElse(Seq.empty)

    RulesDoc(version, rules, thresholds, missing)
  }

  /** Load the bundled graft-rules.yml from the classpath. */
  def loadDefault(env: Map[String, String] = sys.env): RulesDoc = {
    val in = getClass.getResourceAsStream("/graft-rules.yml")
    require(in != null, "graft-rules.yml not on classpath")
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    parse(text, env)
  }
}
