package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Topic-push text assembly — the two Telegram strings the reference's
  * push worker builds (worker/jobs/push_topic_candidates.py):
  *
  *  - [[pushText]]: `format_topic_message` (push_topic_candidates.py:
  *    84-103) — the minimal per-topic card: top-5 entity list (or
  *    `(无)` when absent/empty), 24h mention count defaulting to 0,
  *    latest-timestamp line, and the fixed anti-impersonation footer.
  *  - [[digest]]: `push_topic_digest` (push_topic_candidates.py:
  *    122-160) — the per-day rollup of topics BEYOND the daily push
  *    cap: fixed header, the top-10 overflow topics as
  *    `{i}. {entities} ({count} mentions)` lines, total overflow
  *    count, fixed footer, joined with newlines.
  *
  * The reference formats a pre-ranked JSON list it finds in a cache
  * key; the ranking itself is owned here and made deterministic:
  * mention_count (null → 0) descending, topic_id ascending. At scale
  * the digest is one window pass partitioned by day followed by a
  * same-key groupBy (the exchange is reused), and the per-day
  * collect_list is bounded at `topN` rows because rows past the
  * cutoff contribute null — a day's digest can never pull more than
  * ten lines onto a reducer no matter how many topics overflow.
  */
object TopicDigest {

  private val emptyEnts = array().cast("array<string>")

  /** Per-topic Telegram message over (entities, mention_count,
    * latest_ts) — adds `push_text`. `entities` null/empty → `(无)`
    * (Python `c.get("entities") or []`); `mention_count` null → 0;
    * `latest_ts` null → "" (Python `str(c.get("latest_ts", ""))`).
    */
  def pushText(df: DataFrame): DataFrame = {
    val ents = coalesce(col("entities"), emptyEnts)
    val entsShow = when(size(ents) > 0, array_join(slice(ents, 1, 5), ", "))
      .otherwise(lit("(无)"))
    df.withColumn("push_text", concat(
      lit("🔥 热点话题："), entsShow,
      lit("\n📊 24h 提及："),
      coalesce(col("mention_count").cast("string"), lit("0")),
      lit("\n🏷️ 实体："), entsShow,
      lit("\n🕒 最新："), coalesce(col("latest_ts"), lit("")),
      lit("\n⚠️ 未落地为币，谨防仿冒")))
  }

  /** Per-day digest over (day, topic_id, entities, mention_count):
    * rank topics per day, drop the first `dailyCap` (those were
    * pushed individually), and roll the remainder into one message —
    * top `topN` as numbered lines, full overflow count in the footer.
    * Days with no overflow produce no row (the reference's
    * "No digest for today" path). Returns
    * (day, digest_text, total_overflow).
    */
  def digest(df: DataFrame, dailyCap: Int = 20, topN: Int = 10): DataFrame = {
    val w = Window.partitionBy("day")
      .orderBy(coalesce(col("mention_count"), lit(0L)).desc,
        col("topic_id").asc)
    val overflow = df
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") > dailyCap)
      .withColumn("orn", (col("rn") - dailyCap).cast("long"))
    val line = concat(
      col("orn").cast("string"), lit(". "),
      array_join(coalesce(col("entities"), emptyEnts), ", "),
      lit(" ("),
      coalesce(col("mention_count").cast("string"), lit("0")),
      lit(" mentions)"))
    overflow
      .groupBy("day")
      .agg(
        count(lit(1)).as("total_overflow"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("orn") <= topN,
                struct(col("orn"), line.as("line"))))),
            _.getField("line")),
          "\n").as("__lines"))
      .select(
        col("day"),
        concat(
          lit("📋 *Daily Topic Digest*\n📅 "), col("day"),
          lit("\n\nTop topics beyond daily cap:\n\n"),
          col("__lines"),
          lit("\n\nTotal overflow topics: "),
          col("total_overflow").cast("string"),
          lit("\n\n_Daily cap reached. These topics were aggregated._"))
          .as("digest_text"),
        col("total_overflow"))
  }
}
