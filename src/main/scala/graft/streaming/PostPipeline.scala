package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.aggregates.Evidence
import graft.schema.RawPost
import graft.state.StatefulOps

/** Streaming wiring for the ingestion pipeline (SURVEY §3.1):
  * posts → dedup-within-watermark → evidence → keyed event upsert.
  *
  * Source cursors (reference Redis `since_id`, x_kol_poll.py:120-131)
  * are Structured Streaming checkpointed offsets; the Redis TTL dedup
  * windows (14 d) become watermarked state. One code path serves batch
  * replays and streams (S3): the transforms are plain Dataset ops.
  */
object PostPipeline {

  /** S1 — typed post stream off the cursor-poll source
    * ([[graft.sources.CursorPollSource]]): per-handle since-cursors as
    * checkpointed offsets, per-batch page cap as admission control.
    */
  def pollPosts(spark: SparkSession, feedRoot: String,
      maxPagesPerBatch: Int = 16): Dataset[RawPost] = {
    import spark.implicits._
    spark.readStream.format("graft-poll")
      .option("path", feedRoot)
      .option("maxPagesPerHandlePerBatch", maxPagesPerBatch.toString)
      .load().as[RawPost]
  }

  /** D1/D2 — drop duplicate post ids (and fingerprints) within the
    * 14-day dedup window, keyed state bounded by the watermark.
    */
  def dedupPosts(posts: Dataset[RawPost]): DataFrame =
    posts.toDF()
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", "14 days")
      .dropDuplicatesWithinWatermark("id")

  /** Post → named (key, eventType, evidence, sentiment, __event_time)
    * for the upsert. Key derivation mirrors the batch path (F5 v1
    * flavor, built-ins). `__event_time` aliases the dedup-watermarked
    * `ts` attribute so the SAME watermark reaches the stateful upsert
    * (its metadata rides through the alias; a second `withWatermark`
    * downstream would be a disallowed redefinition).
    */
  def toEvidence(posts: DataFrame): DataFrame = {
    posts.select(
        // full v1 key contract (events.py:481-502): lower(type)|
        // UPPER(normalize_token_symbol(symbol))|ca|normalize_text(text)|
        // bucket_seconds|salt — the reference runs the symbol through
        // `_normalize_token_symbol` ('$'-prefixed lowercase) BEFORE
        // `.upper()`, and hashes the NORMALIZED text, so both must be
        // normalized here too or keys diverge per post. Bucket via
        // integer division (double `/` + cast can misbucket at edges).
        graft.functions.KeyFunctions.eventKeyV1(
          lit("post"),
          graft.functions.TextFunctions.normalizeSymbol(col("symbol")),
          col("tokenCa"),
          graft.functions.TextFunctions.normalizeText(col("text")),
          expr("tsUs div 600000000 * 600")).as("key"),
        lit("social").as("eventType"),
        struct(
          col("source"),
          col("tsUs").as("ts"),
          map(lit("tweet_id"), col("id")).as("ref"),
          substring(col("text"), 1, 64).as("summary"),
          lit(1.0).as("weight")).as("evidence"),
        col("sentimentScore").as("sentiment"),
        col("ts").as("__event_time"))
  }

  /** Full streaming slice: dedup → evidence → stateful upsert. */
  def eventStream(posts: Dataset[RawPost]) =
    StatefulOps.eventUpsertStreamNamed(toEvidence(dedupPosts(posts)))
}
