package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{KeyFunctions, Parity, TextFunctions}

/** Core relational / analytic operators (SURVEY §2.5-§2.7) expressed
  * over the TPC-H-ish testdata, each paired with an ANSI-SQL oracle for
  * the DuckDB correctness gate.
  *
  * Determinism rules used throughout (shared with every other query
  * pack):
  *   - time buckets computed with INTEGER division on nanosecond epochs
  *     (`ts_ns div ...`), never through doubles;
  *   - every window has a TOTAL order (unique tie-break column);
  *   - doubles that pass through accumulation use Parity.roundHalfUp
  *     (floor-based; `round` itself is not engine-portable);
  *   - outputs avoid raw TimestampType — formatted strings or epoch
  *     longs travel to the oracle compare instead.
  */
object CoreQueries {

  private val Pos = Seq("fast", "big", "spark", "join", "merge")
  private val Neg = Seq("slow", "small", "dup", "error", "scan")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A13: status rollup — groupBy + count/sum (map-side partial agg).
    "q_a13_status_rollup" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), Parity.roundHalfUp(sum("value"), 4).as("sum_value"))
        .orderBy("event_type")
    }),

    // A6: active-addrs-style window agg: count / exact distinct / max
    // per key within a time range (reference
    // templates/sql/eth/active_addrs_window.sql:6-14).
    "q_a6_active_window" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .groupBy("l_partkey")
        .agg(
          count(lit(1)).as("tx_count"),
          countDistinct(col("l_suppkey")).as("uniq_suppliers"),
          date_format(max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("max_ship"))
        .orderBy("l_partkey")
    }),

    // A6 through the APPROX-distinct path (ScaleOps.activeWindow with
    // exact=false): the 100 TB variant swaps countDistinct's per-key
    // value shuffle for a mergeable HLL++ sketch at a declared rsd.
    // HLL values can't hash-match an oracle, so the gate contract is a
    // TOLERANCE row: the query outputs the EXACT count (oracle-checked)
    // plus `within_rsd` = |approx − exact| ≤ max(4·rsd·exact, 8) — a
    // 4-sigma band with an absolute floor for small groups — and the
    // oracle asserts TRUE. Spark's HLL++ is deterministic for fixed
    // data, so the row is stable, and a sketch regression (wrong rsd,
    // broken merge) flips the boolean and fails the gate.
    "q_a6_active_window_approx" -> ((s, dir) => {
      import graft.operators.ScaleOps
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        // 16 coarse groups so each carries thousands of distinct orders
        // — the regime where the HLL sketch actually estimates (per-key
        // tiny cardinalities sit in its exact range and test nothing)
        .select(pmod(col("l_partkey"), lit(16)).as("grp"), col("l_orderkey"))
      val exact = ScaleOps.activeWindow(li, "grp", "l_orderkey",
        exact = true)
        .select(col("grp"), col("tx_count"), col("uniq").as("uniq_orders"))
      val approx = ScaleOps.activeWindow(li, "grp", "l_orderkey",
        exact = false, rsd = 0.05)
        .select(col("grp"), col("uniq").as("__approx"))
      exact.join(approx, Seq("grp"))
        // the band itself travels as a VALUE column the oracle
        // re-derives and hash-checks (round-11 verdict item 4); only
        // |approx − exact| ≤ band stays engine-asserted
        .select(col("grp"), col("tx_count"), col("uniq_orders"),
          Parity.roundHalfUp(
            greatest(lit(4 * 0.05) * col("uniq_orders").cast("double"),
              lit(8.0)), 6).as("band"),
          (abs(col("__approx") - col("uniq_orders")).cast("double") <=
            greatest(lit(4 * 0.05) * col("uniq_orders").cast("double"),
              lit(8.0))).as("within_rsd"))
        .orderBy("grp")
    }),

    // A8: top-holders snapshot: global share + top-N (reference
    // templates/sql/eth/top_holders_snapshot.sql:7-44).
    // Plan shape matters at scale: orderBy().limit(N) compiles to
    // TakeOrderedAndProject (per-partition top-N + driver merge of
    // N·partitions rows) and the global total is a scalar aggregate
    // broadcast back — NOT the round-1 global-window formulation,
    // which funneled the whole table through one task's sort.
    "q_a8_top_holders" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val total = c.agg(sum("c_acctbal").as("total"))
      val top = c.select("c_custkey", "c_acctbal")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc).limit(20)
      // the rank window only ever sees the 20 surviving rows
      val wRank = Window.orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      top.crossJoin(broadcast(total))
        .withColumn("rn", row_number().over(wRank))
        .select(col("c_custkey"), col("c_acctbal"),
          Parity.roundHalfUp(col("c_acctbal") / col("total"), 6).as("share"), col("rn"))
        .orderBy("rn")
    }),

    // A9: growth_ratio via lag over ordered per-key time series
    // (reference api/jobs/onchain/enrich_features.py:60-106).
    "q_a9_growth_ratio" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"),
          date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("o_orderpriority").orderBy("month")
      o.withColumn("prev_cnt", lag("cnt", 1).over(w))
        .withColumn("growth_ratio",
          Parity.roundHalfUp((col("cnt") - col("prev_cnt")).cast("double") /
            col("prev_cnt").cast("double"), 6))
        .orderBy("o_orderpriority", "month")
    }),

    // J4: latest-row-per-key (as-of resolution) — row_number desc = 1
    // (reference api/signals/heat.py:409-425).
    "q_j4_latest_per_key" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.load(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("latest_date"),
          col("o_totalprice"))
        .orderBy("o_custkey")
    }),

    // J1: anti-join — keys with no matching row on the other side
    // within a time window (reference worker/jobs/topic_signal_scan.py:56-74:
    // events with no existing topic signal).
    "q_j1_anti_join" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // A3: heat buckets + slope vs previous bucket (reference
    // api/signals/heat.py:98-370): tumbling 10-min counts per type,
    // slope = (cnt - prev)/10 per minute.
    "q_a3_heat_buckets" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .withColumn("bucket",
          expr("ts_ns div 1000000000 div 600 * 600"))
      val counts = e.groupBy("event_type", "bucket").agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("event_type").orderBy("bucket")
      counts.withColumn("prev_cnt", lag("cnt", 1).over(w))
        .withColumn("slope",
          Parity.roundHalfUp((col("cnt") - col("prev_cnt")).cast("double") / 10.0, 6))
        .orderBy("event_type", "bucket")
    }),

    // A4: least-squares slope of per-minute counts, closed form over
    // integer sums (reference api/services/topic_analyzer.py:202-252:
    // slope of count vs time). Integer Σ keeps both engines bit-exact;
    // x is minutes-since-first-minute per group.
    "q_a4_topic_slope" -> ((s, dir) => {
      val perMin = Tables.load(s, dir, "events")
        .withColumn("minute", expr("ts_ns div 60000000000"))
        .groupBy("event_type", "minute").agg(count(lit(1)).as("cnt"))
      val wMin = Window.partitionBy("event_type")
      val xy = perMin
        .withColumn("x", col("minute") - min("minute").over(wMin))
        .withColumn("y", col("cnt"))
      xy.groupBy("event_type").agg(
          count(lit(1)).as("n"),
          sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("slope", Parity.roundHalfUp(
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6))
        .select("event_type", "n", "slope")
        .orderBy("event_type")
    }),

    // A3 full heat contract (reference api/signals/heat.py:98-370):
    // gap-filled 10-min buckets (the reference counts time RANGES, so
    // an empty bucket is 0, not a missing row), noise-floor and
    // min-sample branches (cnt<1 → flat/no-degrade; cnt_30m<3 →
    // flat/DEGRADE; else slope=(cnt-prev)/10), trend at ±THETA_RISE
    // (0.2) on the UNROUNDED slope, and the batch EMA closed form
    // (α=0.3, seeded with the first computed slope, advancing only on
    // buckets where a slope was computed — exactly the reference's
    // cache behavior). The EMA folds sequentially over each entity's
    // collected series; per-entity series fit comfortably in memory at
    // any scale (1 row per 10 min), and the STREAMING analog is
    // StatefulOps.emaStream.
    "q_a3_heat_contract" -> ((s, dir) => {
      val theta = 0.2
      val e = Tables.load(s, dir, "events")
        .withColumn("bucket", expr("ts_ns div 1000000000 div 600 * 600"))
      val counts = e.groupBy("event_type", "bucket").agg(count(lit(1)).as("cnt"))
      val span = counts.groupBy("event_type")
        .agg(min("bucket").as("lo"), max("bucket").as("hi"))
      val filled = span
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"), lit(600L))).as("bucket"))
        .join(counts, Seq("event_type", "bucket"), "left")
        .na.fill(0L, Seq("cnt"))
      val w = Window.partitionBy("event_type").orderBy("bucket")
      val base = filled
        .withColumn("prev_cnt", coalesce(lag("cnt", 1).over(w), lit(0L)))
        .withColumn("cnt_30m", col("cnt") +
          coalesce(lag("cnt", 1).over(w), lit(0L)) +
          coalesce(lag("cnt", 2).over(w), lit(0L)))
        .withColumn("slope_raw",
          when(col("cnt") >= 1 && col("cnt_30m") >= 3,
            (col("cnt") - col("prev_cnt")).cast("double") / 10.0))
        .withColumn("degrade", col("cnt") >= 1 && col("cnt_30m") < 3)
        .withColumn("trend",
          when(col("slope_raw").isNull, "flat")
            .when(col("slope_raw") >= theta, "up")
            .when(col("slope_raw") <= -theta, "down")
            .otherwise("flat"))
      // one-pass typed fold per entity: the HOF `aggregate` formulation
      // (array-append accumulator) is interpreted AND O(n²) in copies —
      // it was 31 s at sf0.1; this is one sorted pass
      val ema = {
        import s.implicits._
        base.filter(col("slope_raw").isNotNull)
          .select(col("event_type"), col("bucket"), col("slope_raw"))
          .as[(String, Long, Double)]
          .groupByKey(_._1)
          .flatMapGroups { (k, it) =>
            val rows = it.toArray.sortBy(_._2)
            var prev = 0.0
            var first = true
            rows.iterator.map { case (_, b, x) =>
              val e = if (first) { first = false; x } else 0.3 * x + 0.7 * prev
              prev = e
              (k, b, e)
            }
          }.toDF("event_type", "bucket", "ema")
      }
      base.join(ema, Seq("event_type", "bucket"), "left")
        .select(col("event_type"), col("bucket"), col("cnt"),
          col("prev_cnt"), col("cnt_30m"),
          Parity.roundHalfUp(col("slope_raw"), 2).as("slope"),
          col("trend"), col("degrade"),
          Parity.roundHalfUp(col("ema"), 2).as("slope_ema"),
          when(col("ema").isNull, lit(null).cast("string"))
            .when(col("ema") >= theta, "up")
            .when(col("ema") <= -theta, "down")
            .otherwise("flat").as("trend_ema"))
        .orderBy("event_type", "bucket")
    }),

    // F11: lexicon sentiment over documents (reference
    // api/rules_sentiment.py:11-84).
    "q_f11_sentiment" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val score = TextFunctions.sentimentScore(col("text"), Pos, Neg)
      d.select(col("doc_id"), Parity.roundHalfUp(score, 4).as("score"),
          TextFunctions.sentimentLabel(score).as("label"))
        .orderBy("doc_id")
    }),

    // F12: model sentiment with rules fallback — REAL mapPartitions
    // plumbing (per-partition model context, streamed rows, per-row
    // availability) around the COMMITTED LR artifact (trained by
    // graft.TrainSentiment, shipped as a classpath resource);
    // unavailable rows (the reference's HF timeout/degrade path) fall
    // back to the F11 rules scorer and are tagged with their backend.
    "q_f12_sentiment_fallback" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
      val scored = graft.text.ModelSentiment.score(s, d, "doc_id", "text")
        .toDF()
      val rules = TextFunctions.sentimentScore(col("text"), Pos, Neg)
      d.join(scored, col("doc_id") === col("docId"))
        .select(col("doc_id"),
          when(col("modelAvailable"), Parity.roundHalfUp(col("modelScore"), 4))
            .otherwise(Parity.roundHalfUp(rules, 4)).as("score"),
          when(col("modelAvailable"), "hf").otherwise("rules").as("backend"))
        .withColumn("label", TextFunctions.sentimentLabel(col("score")))
        .orderBy("doc_id")
    }),

    // F5/F6: deterministic event key v1 — sha256 over '|'-joined parts
    // + 600s time bucket (reference api/events.py:414-470,175-184).
    "q_f5_event_key" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .withColumn("bucket", expr("ts_ns div 1000000000 div 600 * 600"))
      e.select(col("event_id"),
          KeyFunctions.eventKeyV1(col("event_type"),
            col("user_id").cast("string"), lit(null).cast("string"),
            lit(null).cast("string"), col("bucket")).as("event_key"))
        .orderBy("event_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_a13_status_rollup" ->
      """SELECT event_type, count(*) AS n, floor(sum(value) * 10000.0 + 0.5) / 10000.0 AS sum_value
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q_a6_active_window" ->
      """SELECT l_partkey,
                count(*) AS tx_count,
                count(DISTINCT l_suppkey) AS uniq_suppliers,
                strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_ship
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1994-01-01'
           AND l_shipdate <  TIMESTAMP '1996-01-01'
         GROUP BY l_partkey ORDER BY l_partkey""",

    // the oracle checks the exact values AND re-derives the tolerance
    // band itself (hash-checked); only the sketch-value comparison
    // stays an engine-asserted boolean — see the query comment
    "q_a6_active_window_approx" ->
      """SELECT l_partkey % 16 AS grp,
                count(*) AS tx_count,
                count(DISTINCT l_orderkey) AS uniq_orders,
                floor(greatest(0.2 * CAST(count(DISTINCT l_orderkey) AS DOUBLE),
                  8.0) * 1000000.0 + 0.5) / 1000000.0 AS band,
                TRUE AS within_rsd
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1994-01-01'
           AND l_shipdate <  TIMESTAMP '1996-01-01'
         GROUP BY 1 ORDER BY grp""",

    "q_a8_top_holders" ->
      """SELECT c_custkey, c_acctbal,
                floor(c_acctbal / sum(c_acctbal) OVER () * 1000000.0 + 0.5) / 1000000.0 AS share,
                row_number() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
         FROM customer
         QUALIFY rn <= 20 ORDER BY rn""",

    "q_a9_growth_ratio" ->
      """WITH m AS (
           SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
                  count(*) AS cnt
           FROM orders GROUP BY 1, 2)
         SELECT o_orderpriority, month, cnt,
                lag(cnt) OVER (PARTITION BY o_orderpriority ORDER BY month) AS prev_cnt,
                floor((cnt - lag(cnt) OVER (PARTITION BY o_orderpriority ORDER BY month))
                      / CAST(lag(cnt) OVER (PARTITION BY o_orderpriority ORDER BY month) AS DOUBLE)
                      * 1000000.0 + 0.5) / 1000000.0 AS growth_ratio
         FROM m ORDER BY o_orderpriority, month""",

    "q_j4_latest_per_key" ->
      """SELECT o_custkey, o_orderkey,
                strftime(o_orderdate, '%Y-%m-%d') AS latest_date,
                o_totalprice
         FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
               FROM orders)
         WHERE rn = 1 ORDER BY o_custkey""",

    "q_j1_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                             AND o.o_orderdate >= TIMESTAMP '2000-01-01')
         ORDER BY c_custkey""",

    "q_a3_heat_buckets" ->
      """WITH b AS (
           SELECT event_type, epoch_ns(ts) // 1000000000 // 600 * 600 AS bucket,
                  count(*) AS cnt
           FROM events GROUP BY 1, 2)
         SELECT event_type, bucket, cnt,
                lag(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS prev_cnt,
                floor((cnt - lag(cnt) OVER (PARTITION BY event_type ORDER BY bucket))
                      / 10.0 * 1000000.0 + 0.5) / 1000000.0 AS slope
         FROM b ORDER BY event_type, bucket""",

    "q_a4_topic_slope" ->
      """WITH m AS (
           SELECT event_type, epoch_ns(ts) // 60000000000 AS minute,
                  count(*) AS cnt
           FROM events GROUP BY 1, 2),
         x AS (
           SELECT event_type,
                  minute - min(minute) OVER (PARTITION BY event_type) AS x,
                  cnt AS y
           FROM m),
         agg AS (
           SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
                  sum(x*y) AS sxy, sum(x*x) AS sxx
           FROM x GROUP BY event_type)
         SELECT event_type, n,
                floor(CAST(n*sxy - sx*sy AS DOUBLE) /
                      CAST(n*sxx - sx*sx AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS slope
         FROM agg ORDER BY event_type""",

    "q_a3_heat_contract" ->
      """WITH b AS (
           SELECT event_type, epoch_ns(ts) // 1000000000 // 600 * 600 AS bucket,
                  count(*) AS cnt
           FROM events GROUP BY 1, 2),
         span AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
                  FROM b GROUP BY 1),
         filled0 AS (SELECT event_type,
                            unnest(generate_series(lo, hi, 600)) AS bucket
                     FROM span),
         filled AS (SELECT f.event_type, f.bucket, coalesce(b.cnt, 0) AS cnt
                    FROM filled0 f LEFT JOIN b USING (event_type, bucket)),
         base AS (
           SELECT *,
                  coalesce(lag(cnt, 1) OVER w, 0) AS prev_cnt,
                  cnt + coalesce(lag(cnt, 1) OVER w, 0)
                      + coalesce(lag(cnt, 2) OVER w, 0) AS cnt_30m
           FROM filled
           WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
         sl AS (
           SELECT *,
                  CASE WHEN cnt >= 1 AND cnt_30m >= 3
                       THEN (cnt - prev_cnt) / 10.0 END AS slope_raw,
                  (cnt >= 1 AND cnt_30m < 3) AS degrade
           FROM base),
         tr AS (
           SELECT *,
                  CASE WHEN slope_raw IS NULL THEN 'flat'
                       WHEN slope_raw >= 0.2 THEN 'up'
                       WHEN slope_raw <= -0.2 THEN 'down'
                       ELSE 'flat' END AS trend
           FROM sl),
         ex AS (
           SELECT event_type,
                  list(slope_raw ORDER BY bucket) AS xs,
                  list(bucket ORDER BY bucket) AS bks
           FROM tr WHERE slope_raw IS NOT NULL GROUP BY event_type),
         em AS (
           SELECT event_type, unnest(bks) AS bucket,
                  unnest(list_transform(range(1, len(xs) + 1),
                    i -> list_reduce(xs[1:i], (acc, x) -> 0.3 * x + 0.7 * acc))) AS ema
           FROM ex)
         SELECT t.event_type, t.bucket, t.cnt, t.prev_cnt, t.cnt_30m,
                floor(t.slope_raw * 100.0 + 0.5) / 100.0 AS slope,
                t.trend, t.degrade,
                floor(em.ema * 100.0 + 0.5) / 100.0 AS slope_ema,
                CASE WHEN em.ema IS NULL THEN NULL
                     WHEN em.ema >= 0.2 THEN 'up'
                     WHEN em.ema <= -0.2 THEN 'down'
                     ELSE 'flat' END AS trend_ema
         FROM tr t LEFT JOIN em ON em.event_type = t.event_type AND em.bucket = t.bucket
         ORDER BY t.event_type, t.bucket""",

    "q_f11_sentiment" ->
      s"""WITH t AS (
           SELECT doc_id,
                  regexp_extract_all(lower(text), '\\w+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id,
                  len(list_filter(toks, x -> list_contains(${sqlList(Pos)}, x))) AS pos_n,
                  len(list_filter(toks, x -> list_contains(${sqlList(Neg)}, x))) AS neg_n,
                  len(toks) AS n
           FROM t),
         sc AS (
           SELECT doc_id,
                  greatest(-1.0, least(1.0,
                    CASE WHEN n > 0
                         THEN CAST(pos_n - neg_n AS DOUBLE) / CAST(n AS DOUBLE) * 3.0
                         ELSE 0.0 END)) AS raw
           FROM c)
         SELECT doc_id, floor(raw * 10000.0 + 0.5) / 10000.0 AS score,
                CASE WHEN raw > 0.1 THEN 'pos'
                     WHEN raw < -0.1 THEN 'neg'
                     ELSE 'neu' END AS label
         FROM sc ORDER BY doc_id""",

    // mirror of the committed LR artifact (sentiment-lr-v1.tsv): the
    // 1e-6 fixed-point weights are interpolated into a VALUES list at
    // oracle-build time, so SQL and engine score with the SAME
    // artifact; logit sums as BIGINT (order-free), squash is the one
    // fixed double chain 2σ(z/10⁶)−1; rules branch == the F11 oracle.
    "q_f12_sentiment_fallback" -> {
      val (bias, w) = graft.text.ModelSentiment.LinearModel.loadArtifact()
      val values = w.toSeq.sortBy(_._1)
        .map { case (t, v) => s"('${t.replace("'", "''")}', ${v}::BIGINT)" }
        .mkString(", ")
      s"""WITH w(term, wi) AS (VALUES $values),
         mt AS (
           SELECT doc_id,
                  list_distinct(list_filter(
                    string_split_regex(lower(text), '\\s+'),
                    x -> x <> '')) AS mtoks
           FROM documents),
         lg AS (
           SELECT mt.doc_id,
                  ${bias}::BIGINT + coalesce(sum(w.wi), 0) AS zmu
           FROM mt LEFT JOIN w ON list_contains(mt.mtoks, w.term)
           GROUP BY mt.doc_id),
         t AS (
           SELECT d.doc_id,
                  2.0 / (1.0 + exp(-(lg.zmu / 1000000.0))) - 1.0 AS model_score,
                  d.doc_id % 10 <> 0 AS avail,
                  regexp_extract_all(lower(d.text), '\\w+') AS toks
           FROM documents d JOIN lg ON d.doc_id = lg.doc_id),
         c AS (
           SELECT doc_id, model_score, avail,
                  len(list_filter(toks, x -> list_contains(${sqlList(Pos)}, x))) AS pos_n,
                  len(list_filter(toks, x -> list_contains(${sqlList(Neg)}, x))) AS neg_n,
                  len(toks) AS n
           FROM t),
         sc AS (
           SELECT doc_id,
                  CASE WHEN avail
                       THEN floor(model_score * 10000.0 + 0.5) / 10000.0
                       ELSE floor(greatest(-1.0, least(1.0,
                              CASE WHEN n > 0
                                   THEN CAST(pos_n - neg_n AS DOUBLE) / n * 3.0
                                   ELSE 0.0 END)) * 10000.0 + 0.5) / 10000.0
                  END AS score,
                  CASE WHEN avail THEN 'hf' ELSE 'rules' END AS backend
           FROM c)
         SELECT doc_id, score, backend,
                CASE WHEN score > 0.1 THEN 'pos'
                     WHEN score < -0.1 THEN 'neg'
                     ELSE 'neu' END AS label
         FROM sc ORDER BY doc_id"""
    },

    "q_f5_event_key" ->
      """SELECT event_id,
                substr(sha256(concat_ws('|', lower(event_type), upper(CAST(user_id AS VARCHAR)),
                  '', '', CAST(epoch_ns(ts) // 1000000000 // 600 * 600 AS VARCHAR), 'v1')), 1, 40)
                  AS event_key
         FROM events ORDER BY event_id"""
  )

  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")
}
