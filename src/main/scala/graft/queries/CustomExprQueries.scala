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

    // F3: canonical URL over synthesized messy URLs, exercising the
    // four reference behaviors the advisor pinned (events.py:123-173):
    // kept :80 after the https upgrade, ref_src/utm stripping + param
    // sort, trailing-slash collapse + non-http scheme preservation,
    // and invalid-port passthrough.
    "q_f3_canonical_url" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .withColumn("url",
          when(col("doc_id") % 4 === 0,
            concat(lit("HTTP://Src"), col("doc_id") % 20,
              lit(".Example.COM:80/p/"), col("doc_id"),
              lit("?utm_source=x&b="), col("n_chars"), lit("&a=1&ref=y#frag")))
          .when(col("doc_id") % 4 === 1,
            concat(lit("https://Host"), col("doc_id") % 20,
              lit(".example.com/a/"), col("doc_id"),
              lit("///?ref_src=tw&z="), col("n_chars")))
          .when(col("doc_id") % 4 === 2,
            concat(lit("FTP://Files"), col("doc_id") % 20,
              lit(".Example.com/d/"), col("doc_id"), lit("/")))
          .otherwise(
            concat(lit("http://bad"), col("doc_id") % 20,
              lit(".example.com:port/x/"), col("doc_id"))))
      d.select(col("doc_id"),
          GraftFunctions.canonicalUrl(col("url")).as("canon_url"))
        .orderBy("doc_id")
    }),

    // F2: full text normalization — the reference's exact chain
    // (lower → NFC → URL strip → www strip → bare-domain strip →
    // @handle strip → whitespace collapse; api/events.py:380-411). The
    // synthesized suffix plants an https URL, a www chunk, a bare
    // domain with trailing punctuation, a handle, and a DECOMPOSED é
    // (e + U+0301) so the oracle's nfc_normalize + regex mirror must
    // agree with the composed pipeline.
    "q_f2_normalize" -> ((s, dir) => {
      val raw = concat(col("text"),
        lit(" visit https://x.co/q?id="), col("doc_id"),
        lit(" www.Track"), col("doc_id"), lit(".example"),
        lit(" see pepe"), col("doc_id") % 10, lit(".io, later"),
        lit(" @user"), col("doc_id"), lit(" at café"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.TextFunctions.normalizeText(raw).as("text_norm"))
        .orderBy("doc_id")
    }),

    // F5 v2: keyed blake2s event key pinned by known-answer vectors.
    // Expected keys were computed with the PUBLIC hashlib.blake2s
    // semantics the reference uses (api/events.py:503-516:
    // blake2s(preimage, key=salt).hexdigest()[:40], text_sig =
    // blake2s(text_norm).hexdigest()[:16]) and embedded as the literal
    // DuckDB oracle, turning the previous rows-only check into a full
    // hash-compare of the v2 key format.
    // F8 default-algorithm variant: blake2s topic hash
    // (api/events.py:312-341, algo default `blake2s`) pinned by a
    // hashlib known-answer table — DuckDB has no blake2s, same pattern
    // as q_f5_event_key_v2. Covers sort determinism, the empty→"none"
    // rule, duplicate keywords, and non-ASCII UTF-8.
    "q_f8_topic_hash_blake" -> ((s, dir) => {
      import s.implicits._
      val kat = Seq(
        (1L, Seq("pepe", "launch")),
        (2L, Seq("launch", "pepe")),
        (3L, Seq.empty[String]),
        (4L, Seq("solo")),
        (5L, Seq("a", "b", "c", "b")),
        (6L, Seq("中文", "mixed")))
        .toDF("case_id", "keywords")
      kat.select(col("case_id"),
          KeyFunctions.topicHashBlake(col("keywords")).as("topic_hash"))
        .orderBy("case_id")
    }),

    "q_f5_event_key_v2" -> ((s, dir) => {
      import s.implicits._
      val kat = Seq(
        (1L, "LISTING", "$pepe", Option("0x" + "ab" * 20), "eth",
          "aabbccddeeff", "pepe is launching", 1699999800L, "v1"),
        (2L, "listing", "$pepe", Option.empty[String], "eth",
          "aabbccddeeff", "pepe is launching", 1699999800L, "v1"),
        (3L, "mention", "$doge", Option.empty[String], "bsc",
          "", "", 1700000400L, "v1"),
        (4L, "rug_alert", "$scamcoin", Option.empty[String], "na",
          "deadbeef0123", "total rug avoid", 1700001000L, "v1"),
        (5L, "listing", "$pepe", Option.empty[String], "eth",
          "aabbccddeeff", "pepe is launching", 1699999800L, "rotated"),
        (6L, "market_risk", "$wif", Option("0x" + "09" * 20), "sol",
          "cafef00dbeef", "mr tag case", 1700002200L, "v1"))
        .toDF("case_id", "typ", "symbol", "token_ca", "chain",
          "topic_hash", "text_norm", "bucket", "salt")
      def key(salt: String) = KeyFunctions.eventKeyV2(col("typ"),
        col("symbol"), col("token_ca"), col("chain"), col("topic_hash"),
        KeyFunctions.textSig(col("text_norm")), col("bucket"), salt = salt)
      kat.select(col("case_id"),
          when(col("salt") === "v1", key("v1"))
            .otherwise(key("rotated")).as("event_key"))
        .orderBy("case_id")
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

    // D5: push cooldown — at most one push per key per cooldown
    // window (reference notifier Redis SETNX+TTL, api/cards/dedup.py).
    // Batch analog: first-wins within tumbling cooldown buckets (the
    // sliding-TTL variant is the streaming FSM's cooldownUntilUs in
    // StatefulOps.transition; this is the replay/backfill shape).
    "q_d5_push_cooldown" -> ((s, dir) => {
      val cooldownUs = 1800L * 1000000L
      val e = Tables.load(s, dir, "events")
        .select(
          concat_ws(":", col("event_type"), (col("user_id") % 50).cast("string"))
            .as("push_key"),
          expr("ts_ns div 1000").as("us"), col("event_id"))
        .withColumn("cooldown_bucket", expr(s"us div $cooldownUs"))
      graft.dedup.Dedup.firstSeenBy(e, Seq("push_key", "cooldown_bucket"),
          Seq(col("us").asc, col("event_id").asc))
        .select(col("push_key"), col("cooldown_bucket"),
          col("event_id").as("pushed_event"), col("us"))
        .orderBy("push_key", "cooldown_bucket")
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
                CASE doc_id % 4
                  WHEN 0 THEN 'https://src' || (doc_id % 20) || '.example.com:80/p/'
                              || doc_id || '?a=1&b=' || n_chars
                  WHEN 1 THEN 'https://host' || (doc_id % 20) || '.example.com/a/'
                              || doc_id || '?z=' || n_chars
                  WHEN 2 THEN 'ftp://files' || (doc_id % 20) || '.example.com/d/' || doc_id
                  ELSE 'http://bad' || (doc_id % 20) || '.example.com:port/x/' || doc_id
                END AS canon_url
         FROM documents ORDER BY doc_id""",

    "q_f2_normalize" ->
      s"""SELECT doc_id,
                 trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                   nfc_normalize(lower(text || ' visit https://x.co/q?id=' || doc_id
                         || ' www.Track' || doc_id || '.example'
                         || ' see pepe' || (doc_id % 10) || '.io, later'
                         || ' @user' || doc_id || ' at caf' || chr(101) || chr(769))),
                   'https?://\\S+', '', 'g'),
                   'www\\.\\S+', '', 'g'),
                   '\\b[a-zA-Z0-9][a-zA-Z0-9-]*\\.(com|org|net|io|xyz|co|app|tech|ai|dev|finance|eth)[\\s,\\.!?;:]', ' ', 'g'),
                   '@\\w+', '', 'g'),
                   '\\s+', ' ', 'g')) AS text_norm
          FROM documents ORDER BY doc_id""",

    "q_f8_topic_hash_blake" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, topic_hash
         FROM (VALUES
           (1, '70d01e46c1c9'),
           (2, '70d01e46c1c9'),
           (3, '6bf01645a91a'),
           (4, '6008f86f95d3'),
           (5, '4b1635428e5a'),
           (6, '0fae80c7bf0d'))
           AS t(case_id, topic_hash)
         ORDER BY case_id""",

    // q_f5_event_key_v2: DuckDB has no blake2s, so the oracle is the
    // literal known-answer table (hashlib.blake2s ground truth).
    "q_f5_event_key_v2" ->
      """SELECT CAST(case_id AS BIGINT) AS case_id, event_key
         FROM (VALUES
           (1, '9aefefd9dd223692df5e71fedb07b5a60627ce0d'),
           (2, '228570a0b56b3310febfa962fba294d4b463aa86'),
           (3, '74a0805bd9ca0a9310449ac45a0768118de53aa7'),
           (4, 'a68cd053488cc97b1c8ebb03b11c6727d607a92e'),
           (5, '8349a4ec358e07c2fb80d0c411af9f8c56be5dd0'),
           (6, 'b94ae5eddd702eefea5ce845ada026c02c77595c'))
           AS t(case_id, event_key)
         ORDER BY case_id""",

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

    "q_d5_push_cooldown" ->
      """WITH p AS (
           SELECT event_type || ':' || CAST(user_id % 50 AS VARCHAR) AS push_key,
                  epoch_us(ts) AS us, event_id,
                  epoch_us(ts) // 1800000000 AS cooldown_bucket
           FROM events),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY push_key, cooldown_bucket
                       ORDER BY us ASC, event_id ASC) AS rn
           FROM p)
         SELECT push_key, cooldown_bucket, event_id AS pushed_event, us
         FROM r WHERE rn = 1 ORDER BY push_key, cooldown_bucket""",

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
