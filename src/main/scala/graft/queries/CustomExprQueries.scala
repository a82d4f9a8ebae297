package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.aggregates.{Evidence, EvidenceMerge}
import graft.expressions.GraftFunctions
import graft.functions.{KeyFunctions, Parity}

/** Queries exercising the custom Catalyst pieces through the driver's
  * gate: Blake2s expression (rows-only — DuckDB has no blake2s), URL
  * canonicalization (oracle via independently-synthesized expected
  * values), topic hash (sha256 variant — exact oracle), D1 fingerprint
  * dedup, and the Evidence merge Aggregator (oracle reconstructs the
  * merge semantics relationally for the controlled synthesis).
  */
object CustomExprQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // F3: canonical URL over synthesized messy URLs.
    "q_f3_canonical_url" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .withColumn("url",
          concat(lit("HTTP://Src"), col("doc_id") % 20,
            lit(".Example.COM:80/p/"), col("doc_id"),
            lit("?utm_source=x&b="), col("n_chars"), lit("&a=1&ref=y#frag")))
      d.select(col("doc_id"),
          GraftFunctions.canonicalUrl(col("url")).as("canon_url"))
        .orderBy("doc_id")
    }),

    // F5 v2: keyed blake2s event key — custom expression; rows-only.
    "q_f5_event_key_v2" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .withColumn("bucket", expr("ts_ns div 1000000000 div 600 * 600"))
      e.select(col("event_id"),
          KeyFunctions.eventKeyV2(col("event_type"),
            concat(lit("U"), col("user_id")), lit(null).cast("string"),
            lit("eth"), lit(""), lit(""), col("bucket"), salt = "graft")
            .as("event_key"))
        .orderBy("event_id")
    }),

    // F8: topic hash, sha256 variant — 12-hex digest of sorted
    // '||'-joined keywords.
    "q_f8_topic_hash" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy("user_id")
        .agg(array_sort(collect_set("event_type")).as("kw"))
        .select(col("user_id"), KeyFunctions.topicHash(col("kw")).as("topic_hash"))
        .orderBy("user_id")
    }),

    // D1: fingerprint-window dedup — first-seen-wins on a content
    // fingerprint (sha256 here; reference uses sha1, which DuckDB
    // lacks — same shape, different hash constant).
    "q_d1_fingerprint_dedup" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .withColumn("fp", sha2(concat_ws("|", col("event_type"),
          col("user_id"), substring(col("props"), 1, 30)), 256))
        .withColumn("us", expr("ts_ns div 1000"))
      // order on µs (DuckDB precision) + event_id tie-break for parity
      graft.dedup.Dedup.firstSeenBy(e, Seq("fp"),
          Seq(col("us").asc, col("event_id").asc))
        .select(col("fp"), col("event_id").as("first_event_id"))
        .orderBy("fp")
    }),

    // D3: Evidence merge Aggregator through the typed Dataset API.
    // Synthesis: each event row becomes an x-evidence whose tweet_id is
    // event_id/2 → consecutive pairs merge; the oracle reconstructs the
    // same merge relationally (min ts per pair, max weight per pair).
    "q_d3_evidence_merge" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select(col("user_id"),
          col("event_type").as("source_type"), col("event_id"),
          expr("ts_ns div 1000").as("us"), (col("value") / 200).as("w"))
        .as[(Long, String, Long, Long, Double)]
        .map { case (uid, _, eid, us, w) =>
          (uid, Evidence("x", us, Map("tweet_id" -> (eid / 2).toString), "", w))
        }
      val merged = ev.groupByKey(_._1).mapValues(_._2)
        .agg(EvidenceMerge.aggregator.toColumn.name("evidence"))
      merged.toDF("user_id", "evidence")
        .select(col("user_id"),
          size(col("evidence")).as("n_evidence"),
          expr("aggregate(evidence, cast(9223372036854775807 as bigint), (acc, e) -> least(acc, e.ts))")
            .as("earliest_us"),
          Parity.roundHalfUp(
            expr("aggregate(evidence, cast(0.0 as double), (acc, e) -> acc + e.weight)"), 6)
            .as("total_weight"))
        .orderBy("user_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_f3_canonical_url" ->
      """SELECT doc_id,
                'https://src' || (doc_id % 20) || '.example.com/p/' || doc_id
                  || '?a=1&b=' || n_chars AS canon_url
         FROM documents ORDER BY doc_id""",

    // q_f5_event_key_v2: no DuckDB blake2s — rows-only check.

    "q_f8_topic_hash" ->
      """SELECT user_id,
                substr(sha256(array_to_string(
                  list_sort(list(DISTINCT event_type)), '||')), 1, 12) AS topic_hash
         FROM events GROUP BY user_id ORDER BY user_id""",

    "q_d1_fingerprint_dedup" ->
      """WITH f AS (
           SELECT event_id, epoch_us(ts) AS us,
                  sha256(concat_ws('|', event_type, CAST(user_id AS VARCHAR),
                    substr(props, 1, 30))) AS fp
           FROM events),
         r AS (
           SELECT fp, event_id,
                  row_number() OVER (PARTITION BY fp ORDER BY us ASC, event_id ASC) AS rn
           FROM f)
         SELECT fp, event_id AS first_event_id
         FROM r WHERE rn = 1 ORDER BY fp""",

    "q_d3_evidence_merge" ->
      """WITH ev AS (
           SELECT user_id, event_id // 2 AS g, epoch_us(ts) AS us,
                  value / 200 AS w
           FROM events),
         m AS (
           SELECT user_id, g, min(us) AS mn, max(w) AS mw
           FROM ev GROUP BY 1, 2)
         SELECT user_id, count(*) AS n_evidence, min(mn) AS earliest_us,
                floor(sum(mw) * 1000000.0 + 0.5) / 1000000.0 AS total_weight
         FROM m GROUP BY user_id ORDER BY user_id"""
  )
}
