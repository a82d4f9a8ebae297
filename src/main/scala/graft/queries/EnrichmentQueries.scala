package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Enrichment

/** S4/S5 enrichment-lookup semantics through the gate: primary →
  * fallback provider ladder with fresh/stale/miss status derived from
  * deterministic fetch ages.
  */
object EnrichmentQueries {

  private val NowUs = 1700000000000000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_s4_enrich_lookup" -> ((s, dir) => {
      val keys = Tables.load(s, dir, "events")
        .select(col("user_id")).distinct()
      val primary = keys.filter(col("user_id") % 3 =!= 0)
        .select(col("user_id"),
          (col("user_id") * 1.5).as("liquidity"),
          (lit(NowUs) - (col("user_id") % 30) * 3600L * 1000000L)
            .as("fetched_us"))
      val fallback = keys.filter(col("user_id") % 4 =!= 1)
        .select(col("user_id"),
          (col("user_id") * 2.0).as("liquidity"),
          (lit(NowUs) - (col("user_id") % 10) * 3600L * 1000000L)
            .as("fetched_us"))
      Enrichment.withLookup(keys, "user_id", primary, fallback,
          Seq("liquidity"), NowUs)
        .select("user_id", "liquidity", "enrich_source", "enrich_status")
        .orderBy("user_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_s4_enrich_lookup" ->
      s"""WITH k AS (SELECT DISTINCT user_id FROM events),
          pri AS (
            SELECT user_id, user_id * 1.5 AS liquidity,
                   $NowUs - (user_id % 30) * 3600000000 AS fetched_us
            FROM k WHERE user_id % 3 <> 0),
          fb AS (
            SELECT user_id, user_id * 2.0 AS liquidity,
                   $NowUs - (user_id % 10) * 3600000000 AS fetched_us
            FROM k WHERE user_id % 4 <> 1),
          j AS (
            SELECT k.user_id,
                   CASE WHEN pri.fetched_us IS NOT NULL
                             AND $NowUs - pri.fetched_us <= 86400000000 THEN pri.liquidity
                        WHEN fb.fetched_us IS NOT NULL
                             AND $NowUs - fb.fetched_us <= 86400000000 THEN fb.liquidity END AS liquidity,
                   CASE WHEN pri.fetched_us IS NOT NULL
                             AND $NowUs - pri.fetched_us <= 86400000000 THEN 'primary'
                        WHEN fb.fetched_us IS NOT NULL
                             AND $NowUs - fb.fetched_us <= 86400000000 THEN 'fallback'
                        ELSE 'none' END AS enrich_source,
                   CASE WHEN pri.fetched_us IS NOT NULL
                             AND $NowUs - pri.fetched_us <= 86400000000 THEN pri.fetched_us
                        WHEN fb.fetched_us IS NOT NULL
                             AND $NowUs - fb.fetched_us <= 86400000000 THEN fb.fetched_us END AS chosen
            FROM k LEFT JOIN pri USING (user_id) LEFT JOIN fb USING (user_id))
          SELECT user_id, liquidity, enrich_source,
                 CASE WHEN chosen IS NULL THEN 'miss'
                      WHEN $NowUs - chosen <= 300000000 THEN 'fresh'
                      WHEN $NowUs - chosen <= 86400000000 THEN 'stale'
                      ELSE 'miss' END AS enrich_status
          FROM j ORDER BY user_id"""
  )
}
