package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Parity
import graft.multimodal.Multimodal
import graft.operators.Cards
import graft.text.TextAnalysis

/** Remaining SURVEY §2 coverage: card assembly (J6/F18/R5), multimodal
  * plumbing, keyword priority ordering (F7), entity normalization
  * (F16), serialization contracts (F21), filter gates (P1/P2),
  * windowed mention counts (A5), transfer windows (A7), concentration
  * ratios (A11).
  *
  * Order-preserving dedup note: DuckDB's `list_distinct` does NOT keep
  * first-occurrence order, so both engines dedup positionally —
  * keep x at index i iff the first occurrence of x is at i.
  */
object CoverageQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Order-preserving dedup: Spark side. */
  private def dedupOrdered(arr: org.apache.spark.sql.Column) =
    filter(arr, (x, i) => array_position(arr, x) === (i + 1).cast("long"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // J6/F18/R5: card assembly from event base + enrichment lookups.
    "q_j6_card_build" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .select(
          concat(lit("EV:"), lpad(col("event_id").cast("string"), 8, "0"))
            .as("event_key"),
          upper(col("event_type")).as("symbol"),
          when(col("k") % 3 === 0, concat(lit("T"), col("k"))).as("topic_hash"),
          when(col("user_id") % 2 === 0, "strong").otherwise("weak")
            .as("source_level"),
          expr("ts_ns div 1000").as("event_us"),
          col("event_id"), col("user_id"), col("value"))
      val goplus = e.filter(col("event_id") % 4 =!= 1).select(col("event_key"),
        when(col("user_id") % 5 === 0, "red")
          .when(col("user_id") % 5 === 1, "yellow")
          .otherwise("green").as("goplus_risk"),
        (col("event_us") - 1000).as("goplus_us"))
      val dex = e.filter(col("event_id") % 5 =!= 2).select(col("event_key"),
        col("value").as("dex_liquidity"), (col("event_us") - 2000).as("dex_us"))
      val rules = e.filter(col("event_id") % 6 =!= 3).select(col("event_key"),
        when(col("value") >= 150, "opportunity")
          .when(col("value") < 30, "caution")
          .otherwise("observe").as("rules_level"))
      Cards.build(e, goplus, dex, rules)
        .withColumn("valid",
          Cards.isValid(col("event_key"), col("summary"), col("risk_note")))
        .orderBy("event_key")
    }),

    // Multimodal: stubbed decode over binary columns via mapPartitions.
    "q_m_media_features" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.synthesize(docs(s, dir))
        .as[Multimodal.MediaRow]
      Multimodal.extractFeatures(media).toDF()
        .select(col("mediaId").as("media_id"), col("kind"),
          col("nBytes").cast("long").as("n_bytes"),
          col("contentSha").as("content_sha"),
          Parity.roundHalfUp(col("meanLuma"), 6).as("mean_luma"),
          col("frameCount").cast("long").as("frame_count"))
        .orderBy("media_id")
    }),

    // Multimodal: frame-sampling plumbing (video rows, 5s cadence).
    "q_m_frame_sample" -> ((s, dir) => {
      import s.implicits._
      val media = Multimodal.synthesize(docs(s, dir)).as[Multimodal.MediaRow]
      Multimodal.sampleFrames(media, everyMs = 5000)
        .select(col("mediaId").as("media_id"), col("frame_ms"),
          col("frame_idx"))
        .orderBy("media_id", "frame_ms")
    }),

    // F7: keyword priority ordering — $tokens first, then 2-3 char
    // words, then the rest; order-preserving dedup; top-5
    // (reference api/events.py:244-310).
    "q_f7_keywords_priority" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("post",
        concat(lit("$"), upper(col("source")), lit(" "), col("text")))
      val toks = TextAnalysis.tokens(col("post"))
      val cashtags = filter(toks, t => t.startsWith("$"))
      val shorts = filter(toks, t =>
        !t.startsWith("$") && length(t).between(2, 3))
      val rest = filter(toks, t =>
        !t.startsWith("$") && !length(t).between(2, 3))
      val combined = concat(cashtags, shorts, rest)
      d.select(col("doc_id"),
          array_join(slice(dedupOrdered(combined), 1, 5), ",").as("keywords"))
        .orderBy("doc_id")
    }),

    // F16: entity normalization — synonym map, stop-term removal,
    // order-preserving dedup (reference api/services/topic_analyzer
    // .py:17-69).
    "q_f16_entity_norm" -> ((s, dir) => {
      val syn = map(
        lit("spark"), lit("apache"), lit("join"), lit("merge"),
        lit("dup"), lit("duplicate"))
      val ents = slice(TextAnalysis.tokens(col("text")), 1, 8)
      val mapped = transform(ents, t => coalesce(element_at(syn, t), t))
      val stopped = filter(mapped, t => !t.isInCollection(Seq("the", "a")))
      docs(s, dir).select(col("doc_id"),
          array_join(dedupOrdered(stopped), ",").as("entities"))
        .orderBy("doc_id")
    }),

    // F21: serialization contracts — DECIMAL 3dp HALF_UP via exact
    // decimal arithmetic, UTC ISO-8601 Z timestamps (reference
    // api/routes/signals_summary.py:42-57).
    "q_f21_serialization" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          // serialized as string: a DECIMAL output column reaches the
          // compare as Decimal-vs-float and can never hash-match
          (col("o_orderkey").cast("decimal(14,4)") / 16)
            .cast("decimal(14,3)").cast("string").as("amount_3dp"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
            .as("iso_ts"))
        .orderBy("o_orderkey")
    }),

    // P1/P2: crypto-keyword gate, negation filter, candidate pass
    // (reference api/filter.py:35-117).
    "q_p1_filter_gates" -> ((s, dir) => {
      val d = docs(s, dir).withColumn("post",
        concat(lit("$"), upper(col("source")), lit(" "), col("text"),
          when(col("doc_id") % 5 === 0, " launch")
            .when(col("doc_id") % 5 === 1, " rug pull")
            .otherwise("")))
      val kwHit = Seq("launch", "mint", "airdrop")
        .map(k => lower(col("post")).contains(k)).reduce(_ || _)
      val symHit = col("post").rlike("\\$[A-Z]{2,10}")
      val negHit = Seq("rug", "scam")
        .map(k => lower(col("post")).contains(k)).reduce(_ || _)
      d.select(col("doc_id"), kwHit.as("kw_hit"), symHit.as("sym_hit"),
          negHit.as("neg_hit"),
          ((kwHit || symHit) && !negHit).as("passes"))
        .orderBy("doc_id")
    }),

    // A5: mention count within 24h of the corpus max event time.
    // The scalar max travels via broadcast cross join — an
    // unpartitioned window would funnel the whole table through ONE
    // task just to compute one number.
    "q_a5_mention_24h" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .withColumn("us", expr("ts_ns div 1000"))
      val mx = e.agg(max("us").as("mx"))
      e.crossJoin(broadcast(mx))
        .filter(col("us") >= col("mx") - lit(86400L * 1000000L))
        .groupBy("event_type").agg(count(lit(1)).as("mentions"))
        .orderBy("event_type")
    }),

    // A7: token-transfers window — two exact distincts per key
    // (reference templates/sql/eth/token_transfers_window.sql:6-15).
    "q_a7_transfers_window" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .groupBy("l_partkey")
        .agg(count(lit(1)).as("transfers"),
          countDistinct("l_suppkey").as("uniq_from"),
          countDistinct("l_orderkey").as("uniq_to"),
          date_format(max("l_shipdate"), "yyyy-MM-dd").as("max_day"))
        .orderBy("l_partkey")
    }),

    // A11: concentration + self-loop ratios (reference
    // bq_provider.py:838-852 semantics).
    "q_a11_concentration" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val bySupp = li.groupBy("l_partkey", "l_suppkey")
        .agg(sum("l_quantity").as("sq"))
      val conc = bySupp.groupBy("l_partkey")
        .agg(Parity.roundHalfUp(max("sq") / sum("sq"), 6).as("top1_share"))
      val loops = li.groupBy("l_partkey")
        .agg(Parity.roundHalfUp(
          avg(when(col("l_suppkey") % 7 === col("l_linenumber") % 7, 1.0)
            .otherwise(0.0)), 6).as("self_loop_ratio"))
      conc.join(loops, "l_partkey").orderBy("l_partkey")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_j6_card_build" ->
      """WITH e AS (
           SELECT 'EV:' || lpad(CAST(event_id AS VARCHAR), 8, '0') AS event_key,
                  upper(event_type) AS symbol,
                  CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) % 3 = 0
                       THEN 'T' || CAST(json_extract_string(props, '$.k') AS INT) END AS topic_hash,
                  CASE WHEN user_id % 2 = 0 THEN 'strong' ELSE 'weak' END AS source_level,
                  epoch_us(ts) AS event_us, event_id, user_id, value
           FROM events),
         g AS (
           SELECT event_key,
                  CASE WHEN user_id % 5 = 0 THEN 'red'
                       WHEN user_id % 5 = 1 THEN 'yellow'
                       ELSE 'green' END AS goplus_risk,
                  event_us - 1000 AS goplus_us
           FROM e WHERE event_id % 4 <> 1),
         d AS (
           SELECT event_key, value AS dex_liquidity, event_us - 2000 AS dex_us
           FROM e WHERE event_id % 5 <> 2),
         r AS (
           SELECT event_key,
                  CASE WHEN value >= 150 THEN 'opportunity'
                       WHEN value < 30 THEN 'caution'
                       ELSE 'observe' END AS rules_level
           FROM e WHERE event_id % 6 <> 3),
         j AS (
           SELECT e.*, g.goplus_risk, g.goplus_us, d.dex_liquidity, d.dex_us,
                  r.rules_level,
                  (g.goplus_risk IS NULL OR d.dex_liquidity IS NULL
                    OR r.rules_level IS NULL) AS degrade
           FROM e LEFT JOIN g USING (event_key) LEFT JOIN d USING (event_key)
                  LEFT JOIN r USING (event_key)),
         c AS (
           SELECT event_key,
                  CASE WHEN coalesce(goplus_risk, 'gray') = 'red' THEN 'market_risk'
                       WHEN topic_hash IS NOT NULL THEN 'topic'
                       WHEN source_level = 'strong' THEN 'primary'
                       ELSE 'secondary' END AS card_type,
                  substr(concat_ws(' ', coalesce(symbol, '?'),
                    'level=' || coalesce(rules_level, 'none'),
                    'liq=' || coalesce(CAST(CAST(dex_liquidity AS DECIMAL(18,2)) AS VARCHAR), 'na'),
                    'risk=' || coalesce(goplus_risk, 'gray')), 1, 280) AS summary,
                  substr(CASE WHEN degrade
                    THEN 'degraded sources; risk=' || coalesce(goplus_risk, 'gray')
                    ELSE 'risk=' || coalesce(goplus_risk, 'gray') END, 1, 160) AS risk_note,
                  degrade,
                  least(event_us, coalesce(goplus_us, event_us),
                        coalesce(dex_us, event_us)) AS data_as_of_us
           FROM j)
         SELECT *,
                (regexp_full_match(event_key, '[a-zA-Z0-9:_\-\.]{8,128}')
                 AND length(summary) BETWEEN 4 AND 280
                 AND length(risk_note) BETWEEN 4 AND 160) AS valid
         FROM c ORDER BY event_key""",

    "q_m_media_features" ->
      """SELECT doc_id AS media_id,
                ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
                CAST(strlen(text) AS BIGINT) AS n_bytes,
                sha256(text) AS content_sha,
                floor((CAST(list_sum(list_transform(range(1, length(text) + 1),
                    i -> unicode(text[i]))) AS DOUBLE) / length(text))
                  * 1000000.0 + 0.5) / 1000000.0 AS mean_luma,
                CAST(greatest(1, (n_chars * 10) // 1000) AS BIGINT) AS frame_count
         FROM documents ORDER BY media_id""",

    "q_m_frame_sample" ->
      """SELECT doc_id AS media_id, unnest(range(0, n_chars * 10, 5000)) AS frame_ms,
                CAST(unnest(range(0, n_chars * 10, 5000)) // 5000 AS INT) AS frame_idx
         FROM documents
         WHERE doc_id % 3 = 2 AND n_chars * 10 > 0
         ORDER BY media_id, frame_ms""",

    "q_f7_keywords_priority" ->
      """WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower('$' || upper(source) || ' ' || text), '\s+'),
                    x -> x <> '') AS toks
           FROM documents),
         p AS (
           SELECT doc_id,
                  list_filter(toks, t -> starts_with(t, '$'))
                  || list_filter(toks, t -> NOT starts_with(t, '$')
                       AND length(t) BETWEEN 2 AND 3)
                  || list_filter(toks, t -> NOT starts_with(t, '$')
                       AND NOT length(t) BETWEEN 2 AND 3) AS combined
           FROM t)
         SELECT doc_id,
                array_to_string(
                  list_filter(combined, (x, i) -> list_position(combined, x) = i)[1:5],
                  ',') AS keywords
         FROM p ORDER BY doc_id""",

    "q_f16_entity_norm" ->
      """WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')[1:8] AS ents
           FROM documents),
         m AS (
           SELECT doc_id,
                  list_filter(
                    list_transform(ents, t -> CASE t
                      WHEN 'spark' THEN 'apache'
                      WHEN 'join' THEN 'merge'
                      WHEN 'dup' THEN 'duplicate'
                      ELSE t END),
                    t -> t NOT IN ('the', 'a')) AS l
           FROM t)
         SELECT doc_id,
                array_to_string(
                  list_filter(l, (x, i) -> list_position(l, x) = i), ',') AS entities
         FROM m ORDER BY doc_id""",

    "q_f21_serialization" ->
      """SELECT o_orderkey,
                CAST(CAST(CAST(o_orderkey AS DECIMAL(14,4)) / 16 AS DECIMAL(14,3)) AS VARCHAR) AS amount_3dp,
                strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts
         FROM orders ORDER BY o_orderkey""",

    "q_p1_filter_gates" ->
      """WITH p AS (
           SELECT doc_id,
                  '$' || upper(source) || ' ' || text ||
                  CASE WHEN doc_id % 5 = 0 THEN ' launch'
                       WHEN doc_id % 5 = 1 THEN ' rug pull'
                       ELSE '' END AS post
           FROM documents),
         f AS (
           SELECT doc_id,
                  (contains(lower(post), 'launch') OR contains(lower(post), 'mint')
                    OR contains(lower(post), 'airdrop')) AS kw_hit,
                  regexp_matches(post, '\$[A-Z]{2,10}') AS sym_hit,
                  (contains(lower(post), 'rug') OR contains(lower(post), 'scam')) AS neg_hit
           FROM p)
         SELECT doc_id, kw_hit, sym_hit, neg_hit,
                ((kw_hit OR sym_hit) AND NOT neg_hit) AS passes
         FROM f ORDER BY doc_id""",

    "q_a5_mention_24h" ->
      """WITH e AS (SELECT event_type, epoch_us(ts) AS us,
                    max(epoch_us(ts)) OVER () AS mx FROM events)
         SELECT event_type, count(*) AS mentions
         FROM e WHERE us >= mx - 86400000000
         GROUP BY event_type ORDER BY event_type""",

    "q_a7_transfers_window" ->
      """SELECT l_partkey, count(*) AS transfers,
                count(DISTINCT l_suppkey) AS uniq_from,
                count(DISTINCT l_orderkey) AS uniq_to,
                strftime(max(l_shipdate), '%Y-%m-%d') AS max_day
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY l_partkey ORDER BY l_partkey""",

    "q_a11_concentration" ->
      """WITH bs AS (
           SELECT l_partkey, l_suppkey, sum(l_quantity) AS sq
           FROM lineitem GROUP BY 1, 2),
         conc AS (
           SELECT l_partkey,
                  floor(max(sq) / sum(sq) * 1000000.0 + 0.5) / 1000000.0 AS top1_share
           FROM bs GROUP BY l_partkey),
         loops AS (
           SELECT l_partkey,
                  floor(avg(CASE WHEN l_suppkey % 7 = l_linenumber % 7
                    THEN 1.0 ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0 AS self_loop_ratio
           FROM lineitem GROUP BY l_partkey)
         SELECT conc.l_partkey, top1_share, self_loop_ratio
         FROM conc JOIN loops USING (l_partkey) ORDER BY l_partkey"""
  )
}
