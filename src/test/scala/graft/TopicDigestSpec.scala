package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TopicDigest

/** Pins the two push-worker string assemblies
  * (push_topic_candidates.py) to the Python formatter's semantics:
  * per-topic text (top-5 entity slice, `(无)` fallback for null AND
  * empty, mention default 0, str() of a missing latest_ts → ""), and
  * the digest rollup (exact header/footer bytes, full entity join in
  * lines, cap/topN boundaries, no row for a day without overflow).
  */
class TopicDigestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-topic message matches format_topic_message branch-for-branch") {
    val s = spark
    import s.implicits._
    val in = Seq(
      (Seq("a", "b", "c", "d", "e", "f"), Some(7L), Some("2024-01-01T00:00:00Z")),
      (Seq.empty[String], None, None),
      (null, Some(0L), Some(""))
    ).toDF("entities", "mention_count", "latest_ts")
    val out = TopicDigest.pushText(in).select("push_text")
      .collect().map(_.getString(0))
    assert(out(0) ==
      "🔥 热点话题：a, b, c, d, e\n📊 24h 提及：7\n🏷️ 实体：a, b, c, d, e\n" +
      "🕒 最新：2024-01-01T00:00:00Z\n⚠️ 未落地为币，谨防仿冒")
    assert(out(1) ==
      "🔥 热点话题：(无)\n📊 24h 提及：0\n🏷️ 实体：(无)\n🕒 最新：\n" +
      "⚠️ 未落地为币，谨防仿冒")
    assert(out(2).startsWith("🔥 热点话题：(无)\n📊 24h 提及：0\n"))
  }

  test("digest ranks count-desc/topic-asc, caps lines at topN, counts all overflow") {
    val s = spark
    import s.implicits._
    // 8 topics on one day, cap 3, topN 2 → overflow 5, lines for orn 1-2
    val in = (1L to 8L).map(t =>
      ("d1", t, Some(if (t % 2 == 0) 10L else 10L - t), Seq(s"e$t")))
      .toDF("day", "topic_id", "mention_count", "entities")
    val out = TopicDigest.digest(in, dailyCap = 3, topN = 2).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[Long]("total_overflow") == 5L)
    // ranking: 2,4,6,8 (10 each, id asc) then 1(9),3(7),5(5),7(3);
    // cap 3 drops 2,4,6 → overflow 8,1,3,5,7 → lines: "1. e8 (10...)",
    // "2. e1 (9...)"
    assert(r.getAs[String]("digest_text") ==
      "📋 *Daily Topic Digest*\n📅 d1\n\nTop topics beyond daily cap:\n\n" +
      "1. e8 (10 mentions)\n2. e1 (9 mentions)\n\n" +
      "Total overflow topics: 5\n\n" +
      "_Daily cap reached. These topics were aggregated._")
  }

  test("a day with no overflow produces no digest row; null counts rank as 0") {
    val s = spark
    import s.implicits._
    val in = Seq(
      ("d1", 1L, Some(5L), Seq("x")), ("d1", 2L, Some(4L), Seq("y")),
      ("d2", 1L, Some(9L), Seq("p", "q")), ("d2", 2L, None, Seq.empty[String]))
      .toDF("day", "topic_id", "mention_count", "entities")
    val out = TopicDigest.digest(in, dailyCap = 1, topN = 10)
      .orderBy("day").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("d1", "d2"))
    // d2: null count ranks last (as 0), line shows "0 mentions" and the
    // empty entity list joins to ""
    assert(out(1).getAs[String]("digest_text").contains("1.  (0 mentions)"))
  }
}
