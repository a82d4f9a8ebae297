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
      val stage = s"/tmp/graft_stream_stage/${src.getParentFile.getName}_$fingerprint"
      if (!new java.io.File(s"$stage/_SUCCESS").exists())
        posts.write.mode("overwrite").parquet(stage)
      val stream = s.readStream.schema(posts.schema).parquet(stage).as[RawPost]

      val qn = "q_stream_event_upsert_sink"
      val q = PostPipeline.eventStream(stream)
        .writeStream.format("memory").queryName(qn)
        .outputMode("update").start()
      try q.processAllAvailable() finally q.stop()

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

  def oracleSql: Map[String, String] = Map(
    "q_stream_event_upsert" ->
      """WITH p AS (
           SELECT CAST(event_id AS VARCHAR) AS id,
                  epoch_us(ts) AS us,
                  substr(sha256(concat_ws('|', 'post', upper(event_type), '', '',
                    CAST(epoch_us(ts) // 600000000 * 600 AS VARCHAR), 'v1')), 1, 40) AS event_key
           FROM events)
         SELECT event_key,
                count(DISTINCT id) AS evidence_count,
                min(us) AS start_us, max(us) AS last_us
         FROM p GROUP BY event_key ORDER BY event_key"""
  )
}
