package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Similarity

/** Pins the F14 MMR selection semantics (reference
  * api/keyphrases.py:166-188) on a hand-computed case — the gate
  * oracle proves Spark==DuckDB, this proves both equal the REFERENCE
  * algorithm: a diverse lower-relevance candidate must outrank a
  * near-duplicate of the first pick.
  */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def frame(rows: Seq[(Long, Int, Seq[Float])]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("label", IntegerType),
      StructField("embedding", ArrayType(FloatType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, l, e) =>
        Row(id, l, e) }), schema)
  }

  test("MMR prefers the diverse candidate over a near-duplicate") {
    // doc = (1,0,0). Candidate a=(0.8,0.6,0) rel .80; b≈a (sim .9998,
    // rel .79); c=(0.7,-0.714,0) rel .70 but near-orthogonal to a.
    // Greedy: rank1 = a (top rel); rank2 MUST be c —
    //   score(b) = .65*.79 - .35*.9998 ≈ 0.164
    //   score(c) = .65*.70 - .35*.132  ≈ 0.409
    // plain top-k by relevance would pick b.
    val df = frame(Seq(
      (0L, 7, Seq(1f, 0f, 0f)),
      (1L, 7, Seq(0.8f, 0.6f, 0f)),
      (2L, 7, Seq(0.79f, 0.61f, 0f)),
      (3L, 7, Seq(0.7f, -0.714f, 0f))))
    val got = Similarity.mmrKeyphrases(df, "vec_id", "embedding", "label",
        k = 3, alpha = 0.65, poolCap = 50)
      .orderBy("rank")
      .select("rank", "vec_id")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == Seq((1, 1L), (2, 3L), (3, 2L)),
      s"expected a, then diverse c, then near-dup b; got $got")
  }

  test("single-candidate group yields one rank-1 row; k caps output") {
    val df = frame(Seq(
      (10L, 1, Seq(1f, 0f)),
      (11L, 1, Seq(0.5f, 0.5f)),
      (20L, 2, Seq(0f, 1f)))) // label 2: doc only, no candidates
    val got = Similarity.mmrKeyphrases(df, "vec_id", "embedding", "label",
        k = 5).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("vec_id") == 11L &&
      got.head.getAs[Int]("rank") == 1)
  }
}
