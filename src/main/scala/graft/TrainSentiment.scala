package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Dev harness: trains the committed F12 sentiment artifact
  * (src/main/resources/graft/sentiment-lr-v1.tsv) — a logistic
  * regression over bag-of-words PRESENCE features, replacing the
  * round-≤8 md5 stub with a real learned model behind the same
  * mapPartitions slot (round-8 verdict stretch item).
  *
  * Supervision: the F11 lexicon scorer weak-labels the corpus (score
  * > 0.1 → 1, < −0.1 → 0, neutral dropped) — distant supervision in
  * the classic Snorkel/silver-label shape, since the sandbox ships no
  * labeled sentiment data. The model is genuinely TRAINED (the
  * lexicon terms get strong weights and co-occurring terms absorb
  * signal the lexicon alone misses); agreement metrics are printed
  * and recorded in FIXTURES.md.
  *
  * Training is the distributed-LR shape used at 100 TB: per iteration
  * ONE corpus pass computing the batch gradient as a bounded
  * (vocab+1)-cell partial aggregate — each doc's contribution is
  * quantized to 1e-9 fixed-point longs and summed associatively
  * (the repo's fixed-point convention), so the committed weights are
  * bit-reproducible under ANY partitioning. Only the gradient
  * (vocab+1 longs) ever reaches the driver; the corpus never moves.
  *
  * Determinism: vocabulary = lexicon ∪ top-df tokens with (df DESC,
  * token ASC) tie order; weights quantized to 1e-6 before writing.
  * Re-running over the same corpus reproduces the artifact exactly.
  */
object TrainSentiment {

  // the F11 lexicon (CoreQueries.Pos/Neg — the weak-label source)
  private val Pos = Seq("fast", "big", "spark", "join", "merge")
  private val Neg = Seq("slow", "small", "dup", "error", "scan")

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val docs = Tables.load(spark, dir, "documents")
    val base = docs.select(col("doc_id"),
      array_distinct(TextAnalysis.tokens(col("text"))).as("toks"),
      graft.functions.TextFunctions.sentimentScore(col("text"), Pos, Neg)
        .as("wl"))

    // deterministic vocabulary: lexicon ∪ top-200 tokens by document
    // frequency (df DESC, token ASC — a total order)
    val topDf = base.select(explode(col("toks")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("t").asc).limit(200)
      .select("t").as[String].collect()
    val vocab: Array[String] = (Pos ++ Neg ++ topDf).distinct.sorted.toArray
    val vIdx = vocab.zipWithIndex.toMap
    val dim = vocab.length + 1 // + bias at index vocab.length
    println(s"[train] vocab = ${vocab.length} terms")

    val labeled = base.filter(abs(col("wl")) > 0.1)
      .select(col("toks"), (col("wl") > 0.1).cast("int").as("y"))
      .as[(Seq[String], Int)]
      .map { case (toks, y) =>
        (toks.flatMap(vIdx.get).distinct.sorted.toArray, y) }
      .toDF("xs", "y").as[(Array[Int], Int)]
      .cache()
    val n = labeled.count()
    val nPos = labeled.filter(col("y") === 1).count()
    println(s"[train] weak-labeled docs: $n ($nPos pos / ${n - nPos} neg)")

    var w = Array.fill(dim)(0.0)
    val lr = 0.5
    val iters = 400
    val Q = 1e9
    for (it <- 0 until iters) {
      val bw = spark.sparkContext.broadcast(w)
      // fixed-point gradient: associative long sums — deterministic
      // under any partitioning (the house convention)
      val grad = labeled.rdd.treeAggregate(new Array[Long](dim))(
        seqOp = { (acc, row) =>
          val (xs, y) = row
          var z = bw.value(dim - 1)
          xs.foreach(j => z += bw.value(j))
          val g = y - sigmoid(z) // d(loglik)/dz
          val gq = math.floor(g * Q + 0.5).toLong
          xs.foreach(j => acc(j) += gq)
          acc(dim - 1) += gq
          acc
        },
        combOp = { (a, b) => var i = 0; while (i < dim) { a(i) += b(i); i += 1 }; a })
      bw.destroy()
      var i = 0
      while (i < dim) { w(i) += lr * (grad(i) / Q) / n; i += 1 }
      if ((it + 1) % 100 == 0) {
        val bw2 = spark.sparkContext.broadcast(w)
        val correct = labeled.rdd.map { case (xs, y) =>
          var z = bw2.value(dim - 1); xs.foreach(j => z += bw2.value(j))
          if ((z > 0) == (y == 1)) 1L else 0L
        }.sum().toLong
        bw2.destroy()
        println(f"[train] iter ${it + 1}: train acc = ${correct.toDouble / n}%.4f")
      }
    }

    // quantize to 1e-6 (the artifact precision) and report agreement
    // of the QUANTIZED model — what ships is what was measured
    val wq: Array[Long] = w.map(x => math.floor(x * 1e6 + 0.5).toLong)
    val bwq = spark.sparkContext.broadcast(wq)
    val agreeQ = labeled.rdd.map { case (xs, y) =>
      var z = bwq.value(dim - 1); xs.foreach(j => z += bwq.value(j))
      if ((z > 0) == (y == 1)) 1L else 0L
    }.sum().toLong
    println(f"[train] quantized train acc = ${agreeQ.toDouble / n}%.4f")

    val sb = new StringBuilder
    sb ++= "# graft F12 sentiment artifact v1 — logistic regression over\n"
    sb ++= "# bag-of-words presence features; weights in 1e-6 fixed point.\n"
    sb ++= s"# trained by graft.TrainSentiment on $dir documents\n"
    sb ++= s"# (${n} weak-labeled docs, vocab ${vocab.length}, $iters GD iters);\n"
    sb ++= f"# quantized train agreement vs weak labels: ${agreeQ.toDouble / n}%.4f\n"
    sb ++= s"__bias__\t${wq(dim - 1)}\n"
    vocab.zipWithIndex.foreach { case (t, j) =>
      if (wq(j) != 0L) sb ++= s"$t\t${wq(j)}\n"
    }
    val out = Paths.get("src/main/resources/graft/sentiment-lr-v1.tsv")
    Files.createDirectories(out.getParent)
    Files.write(out, sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[train] wrote $out (${sb.length} bytes)")
    spark.stop()
  }
}
