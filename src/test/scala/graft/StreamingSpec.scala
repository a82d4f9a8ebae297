package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.aggregates.Evidence
import graft.schema._
import graft.state.{OutboxRetry, StatefulOps}
import graft.streaming.PostPipeline

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def post(id: String, tsUs: Long, symbol: String = "PEPE",
      text: String = "launch!", sentiment: Double = 0.5): RawPost =
    RawPost(id, "x", "kol", text, tsUs, None, Some(symbol), isCandidate = true,
      sentiment)

  private def drain(q: StreamingQuery): Unit = { q.processAllAvailable() }

  test("streaming dedup + event upsert merges evidence across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[RawPost]
    val q = PostPipeline.eventStream(in.toDS())
      .writeStream.format("memory").queryName("events_out")
      .outputMode("update").start()
    try {
      val t0 = 1700000000L * 1000000L
      in.addData(post("p1", t0), post("p1", t0), post("p2", t0 + 1000000L))
      drain(q)
      in.addData(post("p3", t0 + 2000000L, sentiment = -0.5))
      drain(q)
      val rows = s.sql(
        "SELECT * FROM events_out WHERE version = (SELECT max(version) FROM events_out)")
        .as[EventRow].collect()
      assert(rows.length == 1)
      val ev = rows.head
      assert(ev.evidenceCount == 3, s"p1 dup must collapse: $ev")
      assert(ev.version == 2)
      assert(ev.startUs == t0 && ev.lastUs == t0 + 2000000L)
      assert(ev.lastSentimentScore == -0.5, "latest-wins must use event time")
    } finally q.stop()
  }

  test("signal FSM: delay gate, upgrade, terminal absorption") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[VerdictInput]
    val q = StatefulOps.signalStream(in.toDS())
      .writeStream.format("memory").queryName("sig_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L * 1000000L
      // first sight establishes candidate; immediate upgrade is gated
      in.addData(VerdictInput("k1", "upgrade", 0.9, t0))
      drain(q)
      assert(s.sql("SELECT * FROM sig_out").count() == 0, "delay gate")
      // after the 180s delay the upgrade lands
      in.addData(VerdictInput("k1", "upgrade", 0.9, t0 + 181L * 1000000L))
      drain(q)
      val tr = s.sql("SELECT * FROM sig_out").as[SignalTransition].collect()
      assert(tr.length == 1 && tr.head.toState == "verified")
      // terminal: further verdicts are absorbed
      in.addData(VerdictInput("k1", "downgrade", 0.1, t0 + 400L * 1000000L))
      drain(q)
      assert(s.sql("SELECT * FROM sig_out").count() == 1)
    } finally q.stop()
  }

  test("signal FSM: insufficient emits confidence-0 hold, cooldown blocks retry") {
    val t0 = 1700000000L * 1000000L
    val st0 = StatefulOps.SignalState("candidate", t0, 0L)
    val (st1, out1) = StatefulOps.transition(st0,
      VerdictInput("k", "insufficient", 0.3, t0 + 200L * 1000000L))
    assert(out1.exists(t => t.toState == "candidate" && t.confidence == 0.0))
    // within cooldown: upgrade blocked
    val (st2, out2) = StatefulOps.transition(st1,
      VerdictInput("k", "upgrade", 0.9, t0 + 210L * 1000000L))
    assert(out2.isEmpty && st2.state == "candidate")
    // after cooldown: upgrade lands
    val (st3, out3) = StatefulOps.transition(st2,
      VerdictInput("k", "upgrade", 0.9, t0 + 260L * 1000000L))
    assert(st3.state == "verified" && out3.nonEmpty)
  }

  test("card dedup emits only on version-signature change") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[CardVersion]
    val q = StatefulOps.cardDedupStream(in.toDS())
      .writeStream.format("memory").queryName("cards_out")
      .outputMode("append").start()
    try {
      val t0 = 1700000000L * 1000000L
      in.addData(
        CardVersion("k1", "candidate", "green", degrade = false, t0),
        CardVersion("k1", "candidate", "green", degrade = false, t0 + 1),
        CardVersion("k1", "verified", "green", degrade = false, t0 + 2))
      drain(q)
      in.addData(CardVersion("k1", "verified", "green", degrade = false, t0 + 3))
      drain(q)
      assert(s.sql("SELECT * FROM cards_out").count() == 2)
    } finally q.stop()
  }

  test("EMA stream matches closed form") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(String, Long, Double)]
    val q = StatefulOps.emaStream(in.toDS(), alpha = 0.3)
      .writeStream.format("memory").queryName("ema_out")
      .outputMode("append").start()
    try {
      in.addData(("k", 1L, 10.0), ("k", 2L, 20.0))
      drain(q)
      in.addData(("k", 3L, 30.0))
      drain(q)
      val got = s.sql("SELECT * FROM ema_out ORDER BY _2")
        .as[(String, Long, Double)].collect().map(_._3)
      val e1 = 10.0
      val e2 = 0.3 * 20 + 0.7 * e1
      val e3 = 0.3 * 30 + 0.7 * e2
      assert(got.toSeq == Seq(e1, e2, e3))
    } finally q.stop()
  }

  test("outbox retry: backoff, dlq at 20 attempts, recovery") {
    val t0 = 1000000L
    var e = OutboxEntry(1L, "k", "{}", "pending", 0, 0L, "", t0, t0)
    // failure path: attempts increment, backoff caps at 600s
    e = OutboxRetry.step(e, success = false, t0, "boom")
    assert(e.status == "retry" && e.attempt == 1)
    assert(e.nextTryUs == t0 + 2 * 1000000L)
    // not due yet -> step is a no-op
    val unchanged = OutboxRetry.step(e, success = false, t0 + 1, "x")
    assert(unchanged == e)
    // drive to DLQ
    var now = e.nextTryUs
    while (e.status == "retry") {
      e = OutboxRetry.step(e, success = false, now, "boom")
      now = math.max(e.nextTryUs, now + 1)
    }
    assert(e.status == "dlq" && e.attempt == OutboxRetry.MaxAttempts)
    assert(OutboxRetry.backoffSec(15) == 600L, "backoff cap")
    // recovery is age-gated
    val young = OutboxRetry.recover(e, e.updatedUs + 1, minAgeUs = 3600L * 1000000L)
    assert(young.status == "dlq")
    val old = OutboxRetry.recover(e, e.updatedUs + 7200L * 1000000L,
      minAgeUs = 3600L * 1000000L)
    assert(old.status == "retry" && old.attempt == 0)
    // success path
    val done = OutboxRetry.step(old, success = true, old.nextTryUs)
    assert(done.status == "done")
  }
}
