package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Dev harness: trains the committed word-embedding artifact
  * (src/main/resources/graft/embedding-svd-v1.tsv) — PPMI-weighted
  * co-occurrence factorized by truncated eigendecomposition (the
  * classic count-based embedding: Levy & Goldberg 2014, "Neural Word
  * Embedding as Implicit Matrix Factorization"), replacing the
  * embeddings-table stand-in for the KBIR/encoder slot the sandbox
  * can't run (the F12 retirement pattern, round-9 verdict stretch).
  *
  * Pipeline:
  *   1. vocabulary — top-`V` tokens by corpus occurrence count with
  *      (count DESC, token ASC) tie order: a total order, so the
  *      vocabulary is reproducible;
  *   2. co-occurrence — symmetric ±2 window over each document's
  *      VOCAB-FILTERED token sequence, counted DISTRIBUTED: position
  *      re-rank per doc, two equi-joins (offset +1, +2), one
  *      partial-agg shuffle; only the ≤ V² aggregated cells reach the
  *      driver — the bounded-model-artifact collect convention
  *      (kmeansCentroids / sq8Stats), so the same training runs at
  *      100 TB with the corpus never moving;
  *   3. PPMI — max(0, log(c_ij·T / (r_i·r_j))) on the driver (V×V
  *      doubles, ~0.5 MB at V = 256);
  *   4. truncated eigendecomposition — power iteration with deflation
  *      (fixed 300 rounds, deterministic init, sign fixed by making
  *      each vector's max-|component| positive), embedding =
  *      uₖ·√|λₖ| for the top `D` by |λ|;
  *   5. quantize to 1e-6 fixed point, write TSV sorted by term.
  *
  * Determinism: every data-dependent step is either an integer count,
  * a total-order selection, or a fixed-iteration double chain on
  * driver-collected cells — re-running over the same corpus
  * reproduces the artifact byte-for-byte. Engine/oracle parity then
  * hangs only on the COMMITTED file (interpolated into the oracle SQL
  * as a VALUES list, the F12 convention), never on training.
  */
object TrainEmbedding {

  val V = 256
  val D = 16

  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val docs = Tables.load(spark, dir, "documents")
    val toks = docs.select(col("doc_id"),
      posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "t")))

    // 1. vocabulary: top-V by occurrence count, (n DESC, t ASC)
    val vocab = toks.groupBy("t").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("t").asc).limit(V)
      .collect().map(_.getString(0))
    val vocabDf = vocab.toSeq.zipWithIndex.toDF("t", "i")

    // 2. distributed co-occurrence over the vocab-filtered sequence
    val seqd = toks.join(broadcast(vocabDf), "t")
      .withColumn("p", row_number().over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .select(col("doc_id"), col("p"), col("i"))
      .localCheckpoint()
    val pairs = Seq(1, 2).map { d =>
      seqd.as("a").join(seqd.as("b"),
          col("a.doc_id") === col("b.doc_id") &&
            col("b.p") === col("a.p") + d)
        .select(col("a.i").as("ia"), col("b.i").as("ib"))
    }.reduce(_ union _)
    val cells = pairs.groupBy("ia", "ib").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))

    // 3. PPMI on the driver (bounded V×V)
    val c = Array.ofDim[Double](V, V)
    cells.foreach { case (i, j, n) => c(i)(j) += n.toDouble; c(j)(i) += n.toDouble }
    val rowSum = c.map(_.sum)
    val total = rowSum.sum
    val m = Array.tabulate(V, V) { (i, j) =>
      if (c(i)(j) == 0.0 || rowSum(i) == 0.0 || rowSum(j) == 0.0) 0.0
      else math.max(0.0, math.log(c(i)(j) * total / (rowSum(i) * rowSum(j))))
    }

    // 4. top-D eigenpairs by |λ|: power iteration + deflation, fixed
    //    rounds, deterministic init (a fixed LCG over the index)
    def matVec(v: Array[Double], us: Seq[(Array[Double], Double)]): Array[Double] = {
      val out = new Array[Double](V)
      var i = 0
      while (i < V) {
        var s = 0.0
        var j = 0
        while (j < V) { s += m(i)(j) * v(j); j += 1 }
        out(i) = s
        i += 1
      }
      // deflation: subtract λₗ·uₗ·(uₗᵀv) for each found pair
      us.foreach { case (u, lam) =>
        var d = 0.0
        var k = 0
        while (k < V) { d += u(k) * v(k); k += 1 }
        k = 0
        while (k < V) { out(k) -= lam * u(k) * d; k += 1 }
      }
      out
    }
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    var found = Seq.empty[(Array[Double], Double)]
    for (k <- 0 until D) {
      var v = normalize(Array.tabulate(V)(i =>
        (((i + 1) * 2654435761L + k * 40503L) % 10007).toDouble / 10007.0 - 0.5))
      for (_ <- 1 to 300) v = normalize(matVec(v, found))
      val mv = matVec(v, found)
      val lam = v.zip(mv).map { case (a, b) => a * b }.sum
      // sign convention: the max-|component| entry is positive
      val piv = v.indices.maxBy(i => math.abs(v(i)))
      val u = if (v(piv) < 0) v.map(-_) else v
      found :+= ((u, lam))
    }

    // 5. embedding = uₖ·√|λₖ|, 1e-6 fixed point, TSV sorted by term
    val emb = Array.tabulate(V, D) { (i, k) =>
      val (u, lam) = found(k)
      math.floor(u(i) * math.sqrt(math.abs(lam)) * 1e6 + 0.5).toLong
    }
    val lines = vocab.zipWithIndex.sortBy(_._1).map { case (t, i) =>
      (t +: emb(i).map(_.toString).toSeq).mkString("\t")
    }
    val out = Paths.get("src/main/resources/graft/embedding-svd-v1.tsv")
    Files.write(out,
      (s"# PPMI+SVD word embedding, V=$V D=$D, trained by graft.TrainEmbedding on $dir\n" +
        lines.mkString("\n") + "\n").getBytes(StandardCharsets.UTF_8))

    val spectrum = found.map(_._2)
    println(s"wrote $out")
    println(f"corpus tokens total ${toks.count()}, vocab occurrence mass ${seqd.count()}")
    println("top-|lambda| spectrum: " +
      spectrum.map(l => f"$l%.2f").mkString(", "))
    // sanity: nearest neighbors of the 3 most frequent words
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    vocab.take(3).foreach { w =>
      val wi = vocab.indexOf(w)
      val nn = vocab.indices.filter(_ != wi)
        .map(i => vocab(i) -> cos(emb(wi), emb(i)))
        .sortBy(-_._2).take(3)
      println(s"nn($w): " + nn.map { case (t, s) => f"$t:$s%.3f" }.mkString(" "))
    }
    spark.stop()
  }
}
