package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: decompose q_stream_event_upsert cost into stages. */
object DevProfileStream {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val posts = Tables.load(spark, dir, "events").select(
      col("event_id").cast("string").as("id"),
      lit("x").as("source"),
      lit("kol").as("author"),
      col("event_type").as("text"),
      expr("ts_ns div 1000").as("tsUs"),
      lit(null).cast("string").as("tokenCa"),
      col("event_type").as("symbol"),
      lit(true).as("isCandidate"),
      lit(0.0).as("sentimentScore")).as[graft.schema.RawPost]
    println(s"[profile] rows = ${posts.count()}")

    val src = new java.io.File(s"$dir/events.parquet")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${src.getAbsolutePath}:${src.lastModified}:${src.length}"
        .getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val stage = s"/tmp/graft_stream_stage/${src.getParentFile.getName}_$fp"
    if (!new java.io.File(s"$stage/_SUCCESS").exists())
      posts.write.mode("overwrite").parquet(stage)
    println(s"[profile] stage files = ${new java.io.File(stage).list().length}")

    (1 to 3).foreach { i =>
      println(s"--- iteration $i ---")
      // 1. batch evidence derivation only (normalize + key)
      time("batch toEvidence")(
        graft.streaming.PostPipeline.toEvidence(
          posts.toDF().withColumn("ts", timestamp_micros(col("tsUs"))))
          .queryExecution.toRdd.count())

      // 2. passthrough stream (no stateful op)
      time("stream passthrough") {
        val st = spark.readStream.schema(posts.schema).parquet(stage)
        val q = st.writeStream.format("noop").start()
        try q.processAllAvailable() finally q.stop()
      }

      // 3. stream with dedup only
      time("stream dedup-only") {
        val st = spark.readStream.schema(posts.schema).parquet(stage)
          .as[graft.schema.RawPost]
        val q = graft.streaming.PostPipeline.dedupPosts(st)
          .writeStream.format("noop").start()
        try q.processAllAvailable() finally q.stop()
      }

      // 4. full pipeline to noop sink
      time("stream full noop") {
        val st = spark.readStream.schema(posts.schema).parquet(stage)
          .as[graft.schema.RawPost]
        val q = graft.streaming.PostPipeline.eventStream(st)
          .writeStream.format("noop").outputMode("update").start()
        try q.processAllAvailable() finally q.stop()
      }

      // 5. full pipeline to memory sink + final window (the gate query)
      time("gate query full")(
        SparkEntry.queries("q_stream_event_upsert")(spark, dir)
          .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
