package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.aggregates.{Evidence, EvidenceMerge}
import graft.functions.{KeyFunctions, TextFunctions}

/** Ports of the reference's own event-layer truth tables
  * (tests/test_events_phase_a.py) onto the graft primitives.
  */
class ReferenceTruthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("v2 key is invariant under symbol casing/cashtag variants " +
      "(test_make_event_key_v2_symbol_normalization)") {
    // 2025-01-01T00:00:00Z, 600s bucket, salt 'testsalt'
    val bucket = 1735689600L / 600 * 600
    val keys = Seq("PEPE", "$pepe", "PePe", "  $PEPE ").toDF("raw")
      .select(KeyFunctions.eventKeyV2(
        lit("market-update"),
        TextFunctions.normalizeSymbol(col("raw")),
        lit(null).cast("string"), lit("na"),
        lit("t.hash123"),
        KeyFunctions.textSig(lit("listing rumor for $pepe")),
        lit(bucket), salt = "testsalt").as("k"))
      .collect().map(_.getString(0))
    assert(keys.forall(_.matches("[0-9a-f]{40}")))
    assert(keys.distinct.length == 1,
      s"symbol variants must normalize to one identity: ${keys.toSeq}")
  }

  test("state version with rules: suffix shape, order-insensitive, " +
      "absent without hits (test_market_risk.py:214-253)") {
    import graft.state.StatefulOps.versionSigWithRules
    val base = "candidate|yellow|degrade:0|v1"
    val v = versionSigWithRules(base, Seq("MR01", "MR03"))
    assert(v.startsWith(base + "_mr"))
    assert(v.split("_mr")(1).length == 8)
    // exact value pinned against CPython hashlib.md5('MR01,MR03')[:8]
    assert(v == base + "_mr52d5bc52")
    // rule order must not affect the hash
    assert(versionSigWithRules("base|v1", Seq("MR03", "MR01", "MR02")) ==
      versionSigWithRules("base|v1", Seq("MR01", "MR02", "MR03")))
    // no rules → bare base version
    assert(versionSigWithRules("base|v1", Nil) == "base|v1")
    assert(!versionSigWithRules("base|v1", Nil).contains("_mr"))
  }

  test("evidence identified by tweet_id merges with its /status/ URL " +
      "form and completes the ref (test_merge_evidence_completion)") {
    val ts = 1735689600000000L
    val byId = Evidence("x", ts, Map("tweet_id" -> "12345"), "", 1.0)
    val byUrl = Evidence("x", ts,
      Map("url" -> "https://twitter.com/user/status/12345?utm_source=foo"),
      "", 1.0)
    // same dedup identity → one merged item with BOTH ref fields
    assert(EvidenceMerge.dedupKey(byId) == EvidenceMerge.dedupKey(byUrl))
    val agg = EvidenceMerge.aggregator
    val merged = agg.finish(Seq(byId, byUrl).foldLeft(agg.zero)(agg.reduce))
    assert(merged.length == 1)
    assert(merged.head.ref.get("tweet_id").contains("12345"))
    assert(merged.head.ref.get("url").exists(_.contains("/status/12345")))
  }
}
