package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

import graft.schema.RawPost
import graft.sources.CursorPollSource

/** S1 — the cursor-poll DataSource V2: per-handle cursors as streaming
  * offsets, restart resume, and per-batch pacing (admission control).
  */
class CursorSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  /** Write one page file for a handle: seq-numbered, TSV, text last. */
  private def writePage(root: String, handle: String, seq: Int,
      posts: Seq[RawPost]): Unit = {
    val dir = new File(root, handle)
    dir.mkdirs()
    val body = posts.map { p =>
      Seq(p.id, p.source, p.author, p.tokenCa.getOrElse(""),
        p.symbol.getOrElse(""), p.isCandidate.toString,
        p.sentimentScore.toString, p.tsUs.toString, p.text).mkString("\t")
    }.mkString("", "\n", "\n")
    Files.write(new File(dir, f"page-$seq%06d.tsv").toPath,
      body.getBytes("UTF-8"))
  }

  private def post(id: String, tsUs: Long, handleText: String): RawPost =
    RawPost(id, "x", "kol", handleText, tsUs, None, Some("PEPE"),
      isCandidate = true, sentimentScore = 0.25)

  private def startQuery(root: String, ckpt: String, sink: String,
      maxPages: Int = 16): StreamingQuery =
    spark.readStream.format("graft-poll")
      .option("path", root)
      .option("maxPagesPerHandlePerBatch", maxPages.toString)
      .load()
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

  test("per-handle cursors advance incrementally; schema matches RawPost") {
    val s = spark
    import s.implicits._
    val root = tmpDir("feed")
    val t0 = 1700000000L * 1000000L
    writePage(root, "alice", 1, Seq(post("a1", t0, "hi"), post("a2", t0 + 1, "yo")))
    writePage(root, "bob", 1, Seq(post("b1", t0, "hey")))
    val q = startQuery(root, tmpDir("ckpt"), "poll_out")
    try {
      q.processAllAvailable()
      assert(s.table("poll_out").as[RawPost].collect().map(_.id).sorted
        .sameElements(Array("a1", "a2", "b1")))
      // new pages on one handle only → exactly that delta arrives
      writePage(root, "alice", 2, Seq(post("a3", t0 + 2, "again")))
      q.processAllAvailable()
      val ids = s.table("poll_out").as[RawPost].collect().map(_.id).sorted
      assert(ids.sameElements(Array("a1", "a2", "a3", "b1")), ids.mkString(","))
      // typed round-trip: nullable Option fields decode
      val a1 = s.table("poll_out").as[RawPost].filter(_.id == "a1").head()
      assert(a1.tokenCa.isEmpty && a1.symbol.contains("PEPE") && a1.isCandidate)
    } finally q.stop()
  }

  test("restart resumes every cursor from the checkpoint: no loss, no dup") {
    val s = spark
    import s.implicits._
    val root = tmpDir("feed")
    val ckpt = tmpDir("ckpt")
    val t0 = 1700000000L * 1000000L
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def run(): Unit = {
      // foreachBatch (not the memory sink — it refuses checkpoint
      // recovery): every id that arrives post-restart was re-planned
      val q = spark.readStream.format("graft-poll").option("path", root)
        .load().as[RawPost]
        .writeStream.foreachBatch { (b: org.apache.spark.sql.Dataset[RawPost], _: Long) =>
          b.collect().foreach(p => seen.add(p.id))
        }
        .option("checkpointLocation", ckpt).start() match {
        case q => try q.processAllAvailable() finally q.stop()
      }
    }
    writePage(root, "alice", 1, Seq(post("a1", t0, "one")))
    run()
    assert(seen.toArray.toSeq == Seq("a1"))
    // feed grows while the query is DOWN
    writePage(root, "alice", 2, Seq(post("a2", t0 + 1, "two")))
    writePage(root, "carol", 1, Seq(post("c1", t0 + 2, "new handle")))
    run()
    val ids = seen.toArray(Array.empty[String]).sorted.toSeq
    assert(ids == Seq("a1", "a2", "c1"), ids.mkString(","))
  }

  test("admission control paces a backlog across micro-batches") {
    val s = spark
    val root = tmpDir("feed")
    val t0 = 1700000000L * 1000000L
    (1 to 5).foreach(i => writePage(root, "alice", i,
      Seq(post(s"a$i", t0 + i, s"page $i"))))
    val q = startQuery(root, tmpDir("ckpt"), "poll_paced", maxPages = 2)
    try {
      q.processAllAvailable()
      assert(s.table("poll_paced").count() == 5)
      // 5 pages at ≤2 pages/batch → ≥3 non-empty micro-batches
      val batches = q.recentProgress.count(_.numInputRows > 0)
      assert(batches >= 3, s"expected ≥3 paced batches, saw $batches")
    } finally q.stop()
  }

  test("feeds the post pipeline end-to-end (dedup + keyed upsert)") {
    val s = spark
    import s.implicits._
    val root = tmpDir("feed")
    val t0 = 1700000000L * 1000000L
    // duplicate post id across two handles' pages → D1 dedup collapses
    writePage(root, "alice", 1, Seq(post("p1", t0, "launch!"), post("p2", t0 + 1000000L, "launch!")))
    writePage(root, "bob", 1, Seq(post("p1", t0, "launch!")))
    val posts = spark.readStream.format("graft-poll")
      .option("path", root).load().as[RawPost]
    val q = graft.streaming.PostPipeline.eventStream(posts)
      .writeStream.format("memory").queryName("poll_events")
      .option("checkpointLocation", tmpDir("ckpt"))
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT * FROM poll_events WHERE version = (SELECT max(version) FROM poll_events)")
        .as[graft.schema.EventRow].collect()
      assert(rows.length == 1)
      assert(rows.head.evidenceCount == 2, s"p1 dup must collapse: ${rows.head}")
    } finally q.stop()
  }

  test("offset round-trips deterministically") {
    val o = CursorPollSource.CursorOffset(Map("bob" -> 3, "alice" -> 10))
    val parsed = CursorPollSource.CursorOffset.parse(o.json())
    assert(parsed == o)
    assert(o.json() == "alice=10\nbob=3") // sorted, stable
  }
}
