package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** F17 refiner (rules fallback path) and R3 secondary-proxy trigger.
  *
  * The reference's refiner degrades from LLM to a deterministic rules
  * path (api/refiner.py:166-231): regex asset extraction (≤5), keyword
  * reasons (1-4), fixed confidence 0.35 — that deterministic path is
  * `q_f17_refine_rules`; since round 11 the MODEL path is the
  * committed trained LR artifact behind the same mapPartitions slot
  * ([[graft.text.ModelRefiner]], `q_f17_refine_model` — the F12
  * sentiment pattern). R3
  * (worker/jobs/secondary_proxy_scan.py:32-146): window thresholds on
  * txns/liquidity/volume emit a degraded secondary signal.
  */
object RefineQueries {

  private val ReasonKeywords = Seq(
    "launch" -> "launch signal",
    "merge" -> "merge activity",
    "spark" -> "platform mention",
    "error" -> "error burst")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // F17: rules-path refine over synthesized posts.
    "q_f17_refine_rules" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .withColumn("post",
          concat(lit("$"), upper(col("source")), lit(" "), col("text"),
            when(col("doc_id") % 4 === 0, " launch now").otherwise(""),
            lit(" ca 0x"), md5(col("text")),
            substring(md5(col("source")), 1, 8)))
      val assets = slice(array_distinct(concat(
        regexp_extract_all(col("post"), lit(TextFunctions.SymbolPattern), lit(0)),
        regexp_extract_all(col("post"), lit(TextFunctions.CaPattern), lit(0)))),
        1, 5)
      val reasons = filter(
        array(ReasonKeywords.map { case (k, r) =>
          when(lower(col("post")).contains(k), r)
        }: _*), c => c.isNotNull)
      d.select(col("doc_id"),
          when(lower(col("post")).contains("launch"), "token_launch")
            .otherwise("market_update").as("refined_type"),
          array_join(assets, ",").as("impacted_assets"),
          array_join(slice(reasons, 1, 4), ";").as("reasons"),
          lit(0.35).as("confidence"))
        .orderBy("doc_id")
    }),

    // F17 MODEL path (round-10 carry-over #5 retired): the refiner's
    // LLM slot carries the committed trained LR artifact
    // (refiner-lr-v1.tsv) — learned type decision on the integer
    // logit sign + a per-post confidence σ(|z|), degrading to the
    // rules branch (constant 0.35) for the unavailable rows. The
    // oracle scores with the SAME artifact via a VALUES list.
    "q_f17_refine_model" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .withColumn("post",
          concat(lit("$"), upper(col("source")), lit(" "), col("text"),
            when(col("doc_id") % 4 === 0, " launch now").otherwise(""),
            lit(" ca 0x"), md5(col("text")),
            substring(md5(col("source")), 1, 8)))
      graft.text.ModelRefiner.refine(s, d, "doc_id", "post").toDF()
        .select(col("docId").as("doc_id"),
          col("refinedType").as("refined_type"),
          col("confidence"), col("backend"))
        .orderBy("doc_id")
    }),

    // R3: secondary proxy trigger — threshold gate emitting degraded
    // secondary signals (reference thresholds txns>=40/lp floors;
    // txns scaled to 15 for this data's ~10-25 orders per key).
    "q_r3_secondary_trigger" -> ((s, dir) => {
      val feats = Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("txns"),
          max("o_totalprice").as("lp_usd"),
          sum(when(col("o_orderstatus") === "O", col("o_totalprice"))
            .otherwise(0.0)).as("vol_window"))
        .withColumn("chain",
          when(col("o_custkey") % 5 === 0, "sol").otherwise("eth"))
      val lpFloor = when(col("chain") === "sol", 8000.0).otherwise(15000.0)
      feats.select(col("o_custkey"), col("chain"), col("txns"),
          (col("txns") >= 15 && col("lp_usd") >= lpFloor &&
            col("vol_window") >= 20000).as("triggered"))
        .filter(col("triggered"))
        .orderBy("o_custkey")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_f17_refine_rules" -> {
      val reasonCases = ReasonKeywords.map { case (k, r) =>
        s"CASE WHEN contains(lower(post), '$k') THEN '$r' END"
      }.mkString(", ")
      s"""WITH p AS (
            SELECT doc_id,
                   '$$' || upper(source) || ' ' || text ||
                   (CASE WHEN doc_id % 4 = 0 THEN ' launch now' ELSE '' END) ||
                   ' ca 0x' || md5(text) || substr(md5(source), 1, 8) AS post
            FROM documents),
          raw AS (
            SELECT doc_id, post,
                   regexp_extract_all(post, '\\$$[A-Za-z][A-Za-z0-9]{1,9}')
                     || regexp_extract_all(post, '0x[a-fA-F0-9]{40}') AS assets0,
                   list_filter([$reasonCases], x -> x IS NOT NULL) AS reasons
            FROM p),
          a AS (
            -- positional dedup: list_distinct does not preserve order
            SELECT doc_id, post, reasons,
                   list_filter(assets0, (x, i) -> list_position(assets0, x) = i)
                     AS assets
            FROM raw)
          SELECT doc_id,
                 CASE WHEN contains(lower(post), 'launch')
                      THEN 'token_launch' ELSE 'market_update' END AS refined_type,
                 coalesce(array_to_string(assets[1:5], ','), '') AS impacted_assets,
                 coalesce(array_to_string(reasons[1:4], ';'), '') AS reasons,
                 0.35 AS confidence
          FROM a ORDER BY doc_id"""
    },

    // mirror of the committed refiner artifact: integer logit over
    // the distinct whitespace tokens of the SAME synthesized post,
    // type on the logit sign, confidence σ(|z|/10⁶) at 4 dp; rules
    // branch for the unavailable rows
    "q_f17_refine_model" -> {
      val (bias, w) = graft.text.ModelRefiner.Model.loadArtifact()
      val values = w.toSeq.sortBy(_._1)
        .map { case (t, v) => s"('${t.replace("'", "''")}', ${v}::BIGINT)" }
        .mkString(", ")
      s"""WITH w(term, wi) AS (VALUES $values),
          p AS (
            SELECT doc_id,
                   '$$' || upper(source) || ' ' || text ||
                   (CASE WHEN doc_id % 4 = 0 THEN ' launch now' ELSE '' END) ||
                   ' ca 0x' || md5(text) || substr(md5(source), 1, 8) AS post
            FROM documents),
          mt AS (
            SELECT doc_id, post,
                   list_distinct(list_filter(
                     string_split_regex(lower(post), '\\s+'),
                     x -> x <> '')) AS mtoks
            FROM p),
          lg AS (
            SELECT mt.doc_id,
                   ${bias}::BIGINT + coalesce(sum(w.wi), 0) AS zmu
            FROM mt LEFT JOIN w ON list_contains(mt.mtoks, w.term)
            GROUP BY mt.doc_id)
          SELECT mt.doc_id,
                 CASE WHEN mt.doc_id % 10 <> 0
                      THEN CASE WHEN lg.zmu >= 0
                                THEN 'token_launch' ELSE 'market_update' END
                      ELSE CASE WHEN contains(lower(mt.post), 'launch')
                                THEN 'token_launch' ELSE 'market_update' END
                 END AS refined_type,
                 CASE WHEN mt.doc_id % 10 <> 0
                      THEN floor(1.0 / (1.0 + exp(-(abs(lg.zmu) / 1000000.0)))
                             * 10000.0 + 0.5) / 10000.0
                      ELSE 0.35
                 END AS confidence,
                 CASE WHEN mt.doc_id % 10 <> 0 THEN 'model' ELSE 'rules'
                 END AS backend
          FROM mt JOIN lg USING (doc_id)
          ORDER BY mt.doc_id"""
    },

    "q_r3_secondary_trigger" ->
      """WITH f AS (
           SELECT o_custkey, count(*) AS txns, max(o_totalprice) AS lp_usd,
                  sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice
                      ELSE 0.0 END) AS vol_window,
                  CASE WHEN o_custkey % 5 = 0 THEN 'sol' ELSE 'eth' END AS chain
           FROM orders GROUP BY o_custkey)
         SELECT o_custkey, chain, txns,
                (txns >= 15 AND lp_usd >= (CASE WHEN chain = 'sol'
                   THEN 8000.0 ELSE 15000.0 END)
                 AND vol_window >= 20000) AS triggered
         FROM f
         WHERE txns >= 15 AND lp_usd >= (CASE WHEN chain = 'sol'
                 THEN 8000.0 ELSE 15000.0 END)
               AND vol_window >= 20000
         ORDER BY o_custkey"""
  )
}
