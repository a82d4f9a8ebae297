package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.schema.RawPost
import graft.streaming.PostPipeline

/** Streaming operators surfaced through the driver's batch gate: the
  * full ingestion slice (file stream → watermarked dedup → keyed
  * stateful upsert) runs as a real Structured Streaming query against
  * the sf parquet, then the FINAL keyed state is compared against a
  * relational DuckDB oracle. Batching cannot affect the outcome because
  * the upsert fold is associative (see StatefulOps.upsertEvent).
  */
object StreamingQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_event_upsert" -> ((s, dir) => {
      import s.implicits._
      val posts = Tables.load(s, dir, "events").select(
        col("event_id").cast("string").as("id"),
        lit("x").as("source"),
        lit("kol").as("author"),
        col("event_type").as("text"),
        expr("ts_ns div 1000").as("tsUs"),
        lit(null).cast("string").as("tokenCa"),
        col("event_type").as("symbol"),
        lit(true).as("isCandidate"),
        lit(0.0).as("sentimentScore")).as[RawPost]

      // stage the rows as a file-source stream (the production shape);
      // the staged copy is reused across runs, keyed by the SOURCE
      // file's identity (path + mtime + size) so regenerated or
      // differently-rooted testdata can never feed stale rows
      val src = new java.io.File(s"$dir/events.parquet")
      val fingerprint = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${src.getAbsolutePath}:${src.lastModified}:${src.length}"
          .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val stage = s"${graft.Sessions.scratchRoot}/stream_stage/${src.getParentFile.getName}_$fingerprint"
      if (!new java.io.File(s"$stage/_SUCCESS").exists())
        posts.write.mode("overwrite").parquet(stage)
      val stream = s.readStream.schema(posts.schema).parquet(stage).as[RawPost]

      val qn = "q_stream_event_upsert_sink"
      // fresh per-run checkpoint on the scratch root (tmpfs in local
      // mode): a resumed checkpoint would replay nothing into the
      // memory sink, and ext4 /tmp fsync per state commit is the
      // dominant jitter source
      val chk = s"${graft.Sessions.scratchRoot}/chk/${java.util.UUID.randomUUID()}"
      // project the gate's columns BEFORE the sink: Catalyst's
      // ObjectSerializerPruning then drops the evidence-array
      // serialization from the flatMapGroupsWithState output, and the
      // memory sink stores slim rows instead of 256-entry arrays
      val q = PostPipeline.eventStream(stream)
        .select("eventKey", "evidenceCount", "startUs", "lastUs", "version")
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", chk)
        .outputMode("update").start()
      try q.processAllAvailable() finally {
        q.stop()
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(chk))
      }

      // final state per key = highest version emitted
      val w = Window.partitionBy("eventKey").orderBy(col("version").desc)
      s.table(qn)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("eventKey").as("event_key"),
          col("evidenceCount").as("evidence_count"),
          col("startUs").as("start_us"), col("lastUs").as("last_us"))
        .orderBy("event_key")
    })
  )

  /** The DURABLE end of the pipeline under the same oracle: the staged
    * stream runs through EventSink's foreachBatch MERGE into a
    * versioned snapshot table, and the table READ BACK FROM DISK is
    * hash-compared against the relational oracle — checkpoint + table
    * dirs are keyed by the source fingerprint, so re-runs resume the
    * checkpoint (no new files → tables unchanged) instead of
    * double-applying.
    */
  def sinkQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_sink_table" -> ((s, dir) => {
      import s.implicits._
      val posts = Tables.load(s, dir, "events").select(
        col("event_id").cast("string").as("id"),
        lit("x").as("source"),
        lit("kol").as("author"),
        col("event_type").as("text"),
        expr("ts_ns div 1000").as("tsUs"),
        lit(null).cast("string").as("tokenCa"),
        col("event_type").as("symbol"),
        lit(true).as("isCandidate"),
        lit(0.0).as("sentimentScore")).as[RawPost]
      val src = new java.io.File(s"$dir/events.parquet")
      val fingerprint = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${src.getAbsolutePath}:${src.lastModified}:${src.length}"
          .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
      val stage = s"${graft.Sessions.scratchRoot}/stream_stage/${src.getParentFile.getName}_$fingerprint"
      if (!new java.io.File(s"$stage/_SUCCESS").exists())
        posts.write.mode("overwrite").parquet(stage)
      // the base dir is keyed by source identity AND a pipeline-logic
      // version: the checkpointed table holds derived event keys AND a
      // storage layout, so a key-derivation or table-format change
      // must start a fresh table (a resumed checkpoint would otherwise
      // replay nothing and serve stale keys; k3 = the bucketed events
      // MERGE layout)
      val base = s"${graft.Sessions.scratchRoot}/sink_gate/${src.getParentFile.getName}_${fingerprint}_k3"
      val q = graft.streaming.EventSink.start(
        s.readStream.schema(posts.schema).parquet(stage).as[RawPost],
        s"$base/events", s"$base/outbox", s"$base/chk")
      try q.processAllAvailable() finally q.stop()
      graft.streaming.EventSink.eventsTable(s, s"$base/events").read().get
        .select(col("eventKey").as("event_key"),
          col("evidenceCount").as("evidence_count"),
          col("startUs").as("start_us"), col("lastUs").as("last_us"))
        .orderBy("event_key")
    })
  )

  /** S2/D4 batch analogs — emit-on-change per key (the streaming
    * variants keep the last signature in keyed state; the
    * backfill/replay shape is a lag over event time).
    */
  def changeDetectQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S2: avatar change detection — one row per (author, ts) with the
    // avatar fingerprint; emit rows whose fingerprint differs from the
    // author's previous one (first sighting emits too, reference
    // avatar watcher semantics).
    "q_s2_avatar_change" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events").select(
        (col("user_id") % 200).as("author"),
        expr("ts_ns div 1000").as("us"), col("event_id"),
        // avatar rotates over time, deterministically
        md5(concat_ws(":", col("user_id") % 200,
          expr("ts_ns div 1000000000 div 86400"))).as("avatar_fp"))
      val w = Window.partitionBy("author").orderBy(col("us").asc, col("event_id").asc)
      e.withColumn("prev_fp", lag("avatar_fp", 1).over(w))
        .filter(col("prev_fp").isNull || col("avatar_fp") =!= col("prev_fp"))
        .select(col("author"), col("us"), col("avatar_fp"))
        .orderBy("author", "us")
    }),

    // D4: card state-version dedup — emit only when the version
    // signature (state|risk|degrade) changes per event key
    // (reference api/cards/dedup.py:10-131).
    "q_d4_state_version_dedup" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events").select(
        (col("user_id") % 300).as("card_key"),
        expr("ts_ns div 1000").as("us"), col("event_id"),
        concat_ws("|",
          when(col("value") >= 100, "candidate").otherwise("downgraded"),
          when(col("value") % 7 < 2, "red").otherwise("green"),
          concat(lit("degrade:"), (col("event_id") % 2).cast("string")))
          .as("sig"))
      val w = Window.partitionBy("card_key").orderBy(col("us").asc, col("event_id").asc)
      e.withColumn("prev_sig", lag("sig", 1).over(w))
        .filter(col("prev_sig").isNull || col("sig") =!= col("prev_sig"))
        .select(col("card_key"), col("us"), col("sig"))
        .orderBy("card_key", "us")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_s2_avatar_change" ->
      """WITH e AS (
           SELECT user_id % 200 AS author, epoch_us(ts) AS us, event_id,
                  md5(CAST(user_id % 200 AS VARCHAR) || ':' ||
                      CAST(epoch_ns(ts) // 1000000000 // 86400 AS VARCHAR)) AS avatar_fp
           FROM events),
         l AS (
           SELECT *, lag(avatar_fp) OVER (PARTITION BY author
                       ORDER BY us ASC, event_id ASC) AS prev_fp
           FROM e)
         SELECT author, us, avatar_fp
         FROM l WHERE prev_fp IS NULL OR avatar_fp <> prev_fp
         ORDER BY author, us""",

    "q_d4_state_version_dedup" ->
      """WITH e AS (
           SELECT user_id % 300 AS card_key, epoch_us(ts) AS us, event_id,
                  concat_ws('|',
                    CASE WHEN value >= 100 THEN 'candidate' ELSE 'downgraded' END,
                    CASE WHEN fmod(value, 7) < 2 THEN 'red' ELSE 'green' END,
                    'degrade:' || CAST(event_id % 2 AS VARCHAR)) AS sig
           FROM events),
         l AS (
           SELECT *, lag(sig) OVER (PARTITION BY card_key
                       ORDER BY us ASC, event_id ASC) AS prev_sig
           FROM e)
         SELECT card_key, us, sig
         FROM l WHERE prev_sig IS NULL OR sig <> prev_sig
         ORDER BY card_key, us""",
    // the durable sink table must agree with the same relational truth
    "q_stream_sink_table" ->
      """WITH p AS (
           SELECT CAST(event_id AS VARCHAR) AS id,
                  epoch_us(ts) AS us,
                  -- mirror PostPipeline.toEvidence: symbol runs through
                  -- normalize_token_symbol ('$'+lower) then UPPER, and the
                  -- hashed text is normalize_text(text); event_type values
                  -- here are clean lowercase tokens, so these reduce to
                  -- '$'||upper(..) and the raw value respectively
                  substr(sha256(concat_ws('|', 'post', '$' || upper(event_type), '', event_type,
                    CAST(epoch_us(ts) // 600000000 * 600 AS VARCHAR), 'v1')), 1, 40) AS event_key
           FROM events)
         SELECT event_key,
                count(DISTINCT id) AS evidence_count,
                min(us) AS start_us, max(us) AS last_us
         FROM p GROUP BY event_key ORDER BY event_key""",

    "q_stream_event_upsert" ->
      """WITH p AS (
           SELECT CAST(event_id AS VARCHAR) AS id,
                  epoch_us(ts) AS us,
                  -- mirror PostPipeline.toEvidence: symbol runs through
                  -- normalize_token_symbol ('$'+lower) then UPPER, and the
                  -- hashed text is normalize_text(text); event_type values
                  -- here are clean lowercase tokens, so these reduce to
                  -- '$'||upper(..) and the raw value respectively
                  substr(sha256(concat_ws('|', 'post', '$' || upper(event_type), '', event_type,
                    CAST(epoch_us(ts) // 600000000 * 600 AS VARCHAR), 'v1')), 1, 40) AS event_key
           FROM events)
         SELECT event_key,
                count(DISTINCT id) AS evidence_count,
                min(us) AS start_us, max(us) AS last_us
         FROM p GROUP BY event_key ORDER BY event_key"""
  )
}
