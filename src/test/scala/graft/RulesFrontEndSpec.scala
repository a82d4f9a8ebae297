package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rules.{RuleEngine, RulesConfig}

/** Ports the reference rules-engine truth tables
  * (tests/test_market_risk.py:17-160, tests/test_rules_eval.py) onto
  * the YAML front-end: MR* tagging, single-tag dedup, env threshold
  * override, missing-field safety, missing_map priority-100 reasons,
  * and the (priority desc, |score| desc, declaration order) reason
  * sort. Thresholds are the graft-rules.yml defaults (volume 250,
  * liq-min 10, liq-risk 50 — scaled to the synthesized signal ranges).
  */
class RulesFrontEndSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val doc = RulesConfig.loadDefault(env = Map.empty)

  private def row(goplus: Option[String] = Some("green"),
      buyTax: Option[Double] = Some(2.0), sellTax: Option[Double] = Some(2.0),
      lp: Option[Int] = Some(80), liq: Option[Double] = Some(100.0),
      vol: Option[Double] = Some(50.0), heat: Option[Double] = Some(0.3),
      sent: Option[Double] = Some(0.3)) =
    Seq((goplus, buyTax, sellTax, lp, liq, vol, heat, sent))
      .toDF("goplus_risk", "buy_tax", "sell_tax", "lp_lock_days",
        "dex_liquidity", "dex_volume_1h", "heat_slope",
        "last_sentiment_score")

  private def eval(df: org.apache.spark.sql.DataFrame,
      d: RulesConfig.RulesDoc = doc): Row =
    RuleEngine.evaluateDoc(df, d)
      .select("rules_score", "rules_level", "rules_hits", "rules_tags",
        "rules_reasons", "rules_all_reasons").head

  private def hits(r: Row) = r.getSeq[String](2)
  private def tags(r: Row) = r.getSeq[String](3)
  private def reasons(r: Row) = r.getSeq[String](4)
  private def allReasons(r: Row) = r.getSeq[String](5)

  test("MR volume rule triggers market_risk tag (test_mr_rules_trigger_tags)") {
    val r = eval(row(vol = Some(300.0))) // >= 250 default threshold
    assert(tags(r) == Seq("market_risk"))
    assert(hits(r).contains("MR01"))
    assert(Set("observe", "caution", "opportunity")(r.getString(1)))
    assert(r.getString(1) != "market_risk") // level stays in the 3 enums
  }

  test("MR02 low liquidity (test_mr_rules_with_low_liquidity)") {
    val r = eval(row(goplus = Some("yellow"), liq = Some(5.0)))
    assert(tags(r) == Seq("market_risk"))
    assert(hits(r).contains("MR02"))
  }

  test("multiple MR hits still one tag (test_multiple_mr_rules_single_tag)") {
    val r = eval(row(liq = Some(40.0), vol = Some(300.0))) // MR01 + MR03
    assert(hits(r).contains("MR01") && hits(r).contains("MR03"))
    assert(tags(r).count(_ == "market_risk") == 1)
  }

  test("env override lowers MR threshold (test_env_threshold_override)") {
    val lowered = RulesConfig.loadDefault(
      env = Map("MARKET_RISK_VOLUME_THRESHOLD" -> "100"))
    val r = eval(row(vol = Some(150.0)), lowered) // below default 250
    assert(hits(r).contains("MR01"))
    assert(tags(r) == Seq("market_risk"))
    // and with defaults the same row does NOT trigger
    assert(!hits(eval(row(vol = Some(150.0)))).contains("MR01"))
  }

  test("missing heat_slope is safe (test_missing_field_safe_handling)") {
    val r = eval(row(heat = None))
    assert(Set("observe", "caution", "opportunity")(r.getString(1)))
    assert(!hits(r).exists(_.startsWith("heat")))
  }

  test("missing_map entries surface at priority 100, first in reasons") {
    val r = eval(row(liq = None, vol = None, sent = None, goplus = None))
    // all three missing reasons outrank every rule reason
    assert(reasons(r) == Seq("dex data missing", "sentiment unavailable",
      "security scan pending"))
  }

  test("reason sort: priority desc, |score| desc, declaration order") {
    // MR05 (p12, -20) and MR01 (p12, -15) outrank goplus red (p10, -10)
    val r = eval(row(goplus = Some("red"), vol = Some(300.0)))
    val rs = allReasons(r)
    assert(rs.indexOf("high volume on red token") == 0) // |score| 20
    assert(rs.indexOf("volume anomaly 1h") == 1)        // |score| 15
    assert(rs.indexOf("goplus red risk") > 1)           // priority 10
    assert(reasons(r) == rs.take(3))
  }

  test("score sums hit rules; thresholds map to levels") {
    // green(+3) + lp>=60(+5) + liq moderate(+2) + vol active(+3)
    // + sentiment elevated(+6) + heat rising slowly(+2) = 21
    val r = eval(row())
    assert(r.getDouble(0) == 21.0)
    assert(r.getString(1) == "opportunity")
    val rBad = eval(row(goplus = Some("red"), buyTax = Some(15.0),
      sellTax = Some(15.0), lp = Some(10), liq = Some(5.0),
      vol = Some(10.0), heat = Some(-0.9), sent = Some(-0.4)))
    assert(r.getDouble(0) > 0 && rBad.getDouble(0) < -5)
    assert(rBad.getString(1) == "caution")
  }

  test("${ENV:default} substitution: whitelist + numeric normalization") {
    assert(RulesConfig.substituteEnv("x >= ${THETA_LIQ:50}", Map.empty) ==
      "x >= 50")
    assert(RulesConfig.substituteEnv("x >= ${THETA_SENT:0.30}", Map.empty) ==
      "x >= 0.3") // float normalization like str(float("0.30"))
    assert(RulesConfig.substituteEnv("x >= ${THETA_LIQ:50}",
      Map("THETA_LIQ" -> "75")) == "x >= 75")
    // non-whitelisted keys keep the original placeholder text
    assert(RulesConfig.substituteEnv("x >= ${EVIL_KEY:50}", Map.empty) ==
      "x >= ${EVIL_KEY:50}")
    // non-numeric values pass through as text
    assert(RulesConfig.substituteEnv("y == ${THETA_LIQ:abc}", Map.empty) ==
      "y == abc")
  }

  test("condition validation rejects non-whitelisted identifiers") {
    intercept[IllegalArgumentException] {
      RulesConfig.conditionToSql("secret_field > 10")
    }
    assert(RulesConfig.conditionToSql("goplus_risk == 'red' and buy_tax > 10")
      == "goplus_risk = 'red' and buy_tax > 10")
    // quoted strings are not scanned for identifiers
    assert(RulesConfig.conditionToSql("goplus_risk == 'not_a_field'")
      == "goplus_risk = 'not_a_field'")
  }

  test("null comparisons behave like the reference's TypeError->False") {
    val r = eval(row(liq = None))
    // no liquidity rule may hit, including MR02 (None < 10 is False)
    assert(!hits(r).contains("MR02"))
    assert(!allReasons(r).exists(_.contains("liquidity")))
  }

  test("HotRules: touch-not-changed no-op, size/count caps reject to last-good") {
    import java.nio.file.{Files => F}
    import java.nio.file.attribute.FileTime
    val yml = F.createTempDirectory("graft_hotrules_unit_").resolve("r.yml")
    def oneRule(version: String) =
      s"""version: "$version"
         |groups:
         |  - name: "g"
         |    priority: 1
         |    rules:
         |      - condition: "buy_tax > 10"
         |        score: -1
         |        reason: "r"
         |""".stripMargin
    F.write(yml, oneRule("a").getBytes("UTF-8"))
    F.setLastModifiedTime(yml, FileTime.fromMillis(1000L))
    val hot = new graft.rules.HotRules(yml, ttlMillis = 0L, env = Map.empty)
    assert(hot.version() == "a")

    // same bytes, new mtime: sha short-circuit, no swap
    F.setLastModifiedTime(yml, FileTime.fromMillis(2000L))
    assert(!hot.reloadIfStale(force = true) && hot.version() == "a")

    // over the 200-rule cap: rejected, last-good serves
    val many = (0 until 201).map(i =>
      s"""      - condition: "buy_tax > $i"
         |        score: -1
         |        reason: "r$i"""".stripMargin).mkString("\n")
    F.write(yml,
      s"version: \"b\"\ngroups:\n  - name: \"g\"\n    priority: 1\n    rules:\n$many\n"
        .getBytes("UTF-8"))
    F.setLastModifiedTime(yml, FileTime.fromMillis(3000L))
    assert(!hot.reloadIfStale(force = true))
    assert(hot.version() == "a" && hot.rejected == 1L)

    // over the 256 KB cap: rejected before reading
    val pad = "# " + ("x" * 300000) + "\n"
    F.write(yml, (oneRule("c") + pad).getBytes("UTF-8"))
    F.setLastModifiedTime(yml, FileTime.fromMillis(4000L))
    assert(!hot.reloadIfStale(force = true))
    assert(hot.version() == "a" && hot.rejected == 2L)

    // a rejected version is counted ONCE: re-checking the same bad
    // file (same mtime+size) must not re-read or re-count it
    assert(!hot.reloadIfStale(force = true) && hot.rejected == 2L)
    assert(!hot.reloadIfStale(force = true) && hot.rejected == 2L)

    // a good swap still lands after rejections
    F.write(yml, oneRule("d").getBytes("UTF-8"))
    F.setLastModifiedTime(yml, FileTime.fromMillis(5000L))
    assert(hot.reloadIfStale(force = true) && hot.version() == "d")

    // same-millisecond rewrite with a DIFFERENT size still swaps:
    // (mtime, size) is a hint, not the change detector
    F.write(yml, oneRule("e2").getBytes("UTF-8")) // "e2" ≠ "d" length
    F.setLastModifiedTime(yml, FileTime.fromMillis(5000L))
    assert(hot.reloadIfStale(force = true) && hot.version() == "e2")
  }
}
