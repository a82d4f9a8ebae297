package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.schema.VerdictInput
import graft.state.StatefulOps

/** D5/R4 keyed-state rehearsal at 20× (round-11 verdict stretch
  * item 8): drives the signal FSM's `flatMapGroupsWithState` path —
  * the cooldown/state-TTL machinery — with a 20×-sf0.1 verdict feed
  * and reads the STATE STORE's own metrics from
  * StreamingQueryProgress, recording measured bytes/key and proving
  * the event-time TTL eviction engages: a second wave of keys
  * arriving 15 days later (past [[StatefulOps.SignalTtlUs]]) advances
  * the watermark past wave 1's timeouts, and the store's row count
  * must DROP to the new wave instead of accumulating forever. The
  * numbers and the sizing rule land in SCALE_REHEARSAL.md.
  *
  * Feed: every event row becomes its own signal key (the worst case —
  * no key reuse, maximal store population), two upgrade verdicts per
  * key (so the FSM emits and the cooldown field is exercised), three
  * waves: wave 0 at T0 (bulk, rep× events), wave 1 at T0+1h (small,
  * inside TTL — proves NON-eviction of live keys), wave 2 at
  * T0+15d (past TTL — proves eviction of waves 0–1).
  */
object CooldownRehearsal {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rep = sys.env.getOrElse("SPARK_GRAFT_REHEARSAL_REP", "20").toInt
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = java.nio.file.Files
      .createTempDirectory("cooldown_rehearsal").toString
    val t0Us = 1700000000000000L
    val hourUs = 3600L * 1000000L
    val dayUs = 24L * hourUs

    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"))
    def wave(tag: String, repN: Int, baseTs: Long) = {
      val one = (0 until repN).map { k =>
        ev.select(concat(lit(s"$tag-"), col("event_type"), lit("-"),
          (col("event_id") + lit(k * 10000000L)).cast("string"))
          .as("eventKey"))
      }.reduce(_ union _)
      // two verdicts per key, 1 s apart: candidate → verified emits,
      // the second lands inside the 45 s cooldown (the D5 branch)
      one.select(col("eventKey"), explode(typedlit(Seq(0L, 1L))).as("i"))
        .select(col("eventKey"), lit("upgrade").as("verdict"),
          lit(0.9).as("confidence"),
          (lit(baseTs) + col("i") * 1000000L).as("tsUs"))
    }
    // wave 3 exists to OBSERVE the eviction: event-time timeouts fire
    // in the batch AFTER the watermark passes them, so the +15d wave
    // advances the watermark past waves 0–1's TTL and the +16d wave's
    // batch is where the store actually removes them
    wave("w0", rep, t0Us).coalesce(1)
      .write.parquet(s"$root/feed/f0.parquet")
    wave("w1", 1, t0Us + hourUs).coalesce(1)
      .write.parquet(s"$root/feed/f1.parquet")
    wave("w2", 1, t0Us + 15 * dayUs).coalesce(1)
      .write.parquet(s"$root/feed/f2.parquet")
    wave("w3", 1, t0Us + 16 * dayUs).coalesce(1)
      .write.parquet(s"$root/feed/f3.parquet")

    // two retained versions only, so memoryUsedBytes tracks the live
    // map instead of the default 100-version retention cache
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "2")
    val feed = spark.readStream
      .schema("eventKey STRING, verdict STRING, confidence DOUBLE, tsUs LONG")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/feed/*.parquet")
      .as[VerdictInput]

    val q = StatefulOps.signalStream(feed)
      .writeStream.outputMode("append").format("noop")
      .option("checkpointLocation", s"$root/chk")
      .start()
    try q.processAllAvailable() finally q.stop()

    val rows = q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .filter(_.numInputRows > 0)
      .map { p =>
        val so = p.stateOperators.head
        (p.batchId, p.numInputRows, so.numRowsUpdated, so.numRowsRemoved,
          so.memoryUsedBytes)
      }
    // live keys derived from the update/remove ledger (every key in
    // this feed is wave-unique, so updated == new keys per batch);
    // numRowsTotal is not populated for flatMapGroupsWithState here
    var live = 0L
    println("batch | input rows | updated | removed | live keys | store mem bytes")
    rows.foreach { case (b, in, upd, rem, mem) =>
      live += upd - rem
      println(f"$b | $in | $upd | $rem | $live | $mem")
    }
    // durable bytes/key from the checkpoint's state dir — the number
    // that scales the store, independent of in-memory version caching
    def du(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
    val stateBytes = du(new java.io.File(s"$root/chk/state"))
    // SCALE_REHEARSAL records this figure — guard the division: live
    // can be 0 (full eviction) or off if a progress entry was missed,
    // which would land Infinity/NaN in the rehearsal number
    val perKey =
      if (live > 0) f"${stateBytes.toDouble / live}%.1f" else "n/a (live<=0)"
    println(f"checkpoint state dir: $stateBytes bytes; final live keys: $live; " +
      s"bytes/key (durable, latest+retained deltas): $perKey")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    spark.stop()
  }
}
