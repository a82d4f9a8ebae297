package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-time windowing semantics (SURVEY §2.10) through the gate:
  * true SLIDING windows via Spark's native `window()` (each event in
  * slide_count windows — the heat 10m/1m recompute, A3) and SESSION
  * windows via `session_window()` (cooldown/session-ish semantics).
  * The DuckDB oracles re-derive both: sliding = unnest of the 10
  * minute-aligned starts covering each event; sessions =
  * gaps-and-islands over per-key ordered events.
  */
object WindowQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A3 (true sliding form): 10-minute windows sliding by 1 minute.
    "q_a3_sliding_window" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(col("event_type"),
          window(col("ts"), "10 minutes", "1 minute").as("w"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("event_type"),
          unix_micros(col("w.start")).as("w_start_us"), col("cnt"))
        .orderBy("event_type", "w_start_us")
    }),

    // Session windows with a 30-minute inactivity gap per user.
    "q_w_session_window" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("session_start_us"),
          col("n_events"))
        .orderBy("user_id", "session_start_us")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_a3_sliding_window" ->
      """WITH e AS (
           SELECT event_type,
                  (epoch_us(ts) // 60000000) * 60000000 AS minute_us,
                  epoch_us(ts) AS us
           FROM events),
         x AS (
           SELECT event_type, minute_us - k * 60000000 AS w_start_us
           FROM e, unnest(range(0, 10)) AS u(k))
         SELECT event_type, w_start_us, count(*) AS cnt
         FROM x GROUP BY 1, 2 ORDER BY event_type, w_start_us""",

    "q_w_session_window" ->
      """WITH o AS (
           SELECT user_id, epoch_us(ts) AS us,
                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY epoch_us(ts)) AS prev_us
           FROM events),
         b AS (
           SELECT user_id, us,
                  CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                       THEN 1 ELSE 0 END AS brk
           FROM o),
         sid AS (
           SELECT user_id, us,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY us
                    ROWS UNBOUNDED PRECEDING) AS session_id
           FROM b)
         SELECT user_id, min(us) AS session_start_us, count(*) AS n_events
         FROM sid GROUP BY user_id, session_id
         ORDER BY user_id, session_start_us"""
  )
}
