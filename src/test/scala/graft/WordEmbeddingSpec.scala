package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.WordEmbedding

/** The committed PPMI+SVD embedding artifact and its pooling slot. */
class WordEmbeddingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("artifact loads: consistent dims, known vocabulary, nonzero vectors") {
    val (dim, w) = WordEmbedding.loadArtifact()
    assert(dim == 16)
    assert(w.nonEmpty)
    assert(w.values.forall(_.length == dim))
    // the corpus's dominant tokens must be in vocabulary with signal
    assert(w.contains("spark") && w("spark").exists(_ != 0L))
  }

  test("pooling: sum of known vectors, unknown tokens ignored, empty is zero") {
    val (dim, w) = WordEmbedding.loadArtifact()
    val model = WordEmbedding.load()
    val (v1, h1) = model(Seq("spark"))
    assert(h1 == 1 && v1.toSeq == w("spark").toSeq)
    val (v2, h2) = model(Seq("spark", "zzz-not-in-vocab", "spark"))
    assert(h2 == 2)
    assert(v2.toSeq == w("spark").zip(w("spark")).map { case (a, b) => a + b }.toSeq)
    val (v0, h0) = model(Seq.empty)
    assert(h0 == 0 && v0.forall(_ == 0L))
    assert(v0.length == dim)
  }

  test("embed() streams a corpus through the per-partition slot") {
    import spark.implicits._
    val df = Seq((1L, "spark spark"), (2L, "")).toDF("doc_id", "text")
    val got = WordEmbedding.embed(spark, df, "doc_id", "text")
      .collect().map(d => d.docId -> d).toMap
    assert(got(1L).nHit == 2 && got(1L).emb.exists(_ != 0L))
    assert(got(2L).nHit == 0 && got(2L).emb.forall(_ == 0L))
  }
}
