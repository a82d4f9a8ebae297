package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Dev harness: trains the committed F17 refiner artifact
  * (src/main/resources/graft/refiner-lr-v1.tsv) — a logistic
  * regression over bag-of-words PRESENCE features of the synthesized
  * post, predicting the refined event type (token_launch vs
  * market_update), so the refiner's MODEL slot carries a real learned
  * classifier with a real per-row confidence instead of the
  * deterministic stand-in (the fourth artifact retired by the
  * F12/F14/L59 pattern; the reference's LLM path classifies the post
  * and emits a confidence, api/refiner.py:64-165).
  *
  * Supervision: the reference's own RULES path weak-labels the corpus
  * (launch keyword → token_launch) — the same distant-supervision
  * shape as TrainSentiment. The learned model recovers the keyword
  * with a strong weight AND spreads signal onto co-occurring tokens,
  * so its confidence varies per post where the rules path is a
  * constant 0.35.
  *
  * Training protocol is TrainSentiment's verbatim: per iteration one
  * corpus pass, batch gradient as a bounded (vocab+1)-cell 1e-9
  * fixed-point partial aggregate (bit-reproducible under any
  * partitioning), weights quantized to 1e-6 on write.
  */
object TrainRefiner {

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // the q_f17 post synthesis, verbatim
    val posts = Tables.load(spark, dir, "documents")
      .withColumn("post",
        concat(lit("$"), upper(col("source")), lit(" "), col("text"),
          when(col("doc_id") % 4 === 0, " launch now").otherwise(""),
          lit(" ca 0x"), md5(col("text")),
          substring(md5(col("source")), 1, 8)))
    val base = posts.select(col("doc_id"),
      array_distinct(TextAnalysis.tokens(col("post"))).as("toks"),
      lower(col("post")).contains("launch").cast("int").as("y"))

    // deterministic vocabulary: top-256 tokens by document frequency
    // (df DESC, token ASC); per-doc hex blobs have df 1 and never rank
    val topDf = base.select(explode(col("toks")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("t").asc).limit(256)
      .select("t").as[String].collect()
    val vocab: Array[String] = topDf.distinct.sorted
    val vIdx = vocab.zipWithIndex.toMap
    val dim = vocab.length + 1
    println(s"[train] vocab = ${vocab.length} terms")

    val labeled = base
      .select(col("toks"), col("y"))
      .as[(Seq[String], Int)]
      .map { case (toks, y) =>
        (toks.flatMap(vIdx.get).distinct.sorted.toArray, y) }
      .toDF("xs", "y").as[(Array[Int], Int)]
      .cache()
    val n = labeled.count()
    val nPos = labeled.filter(col("y") === 1).count()
    println(s"[train] docs: $n ($nPos launch / ${n - nPos} update)")

    var w = Array.fill(dim)(0.0)
    val lr = 0.5
    val iters = 400
    val Q = 1e9
    for (it <- 0 until iters) {
      val bw = spark.sparkContext.broadcast(w)
      val grad = labeled.rdd.treeAggregate(new Array[Long](dim))(
        seqOp = { (acc, row) =>
          val (xs, y) = row
          var z = bw.value(dim - 1)
          xs.foreach(i => z += bw.value(i))
          val err = sigmoid(z) - y
          xs.foreach(i => acc(i) += math.round(err * Q))
          acc(dim - 1) += math.round(err * Q)
          acc
        },
        combOp = { (a, b) => var i = 0; while (i < dim) { a(i) += b(i); i += 1 }; a })
      var i = 0
      while (i < dim) { w(i) -= lr * (grad(i) / Q) / n; i += 1 }
      if ((it + 1) % 100 == 0) println(s"[train] iter ${it + 1}")
    }

    // agreement with the weak labels (the printed metric of record)
    val bw = spark.sparkContext.broadcast(w)
    val agree = labeled.map { case (xs, y) =>
      var z = bw.value(dim - 1)
      xs.foreach(i => z += bw.value(i))
      if ((z >= 0) == (y == 1)) 1 else 0
    }.reduce(_ + _)
    println(f"[train] agreement with rules labels: ${agree.toDouble / n}%.4f ($agree/$n)")

    val out = new StringBuilder
    out ++= "# F17 refiner LR v1: term\\t1e-6 fixed-point weight; __bias__ row\n"
    out ++= s"__bias__\t${math.round(w(dim - 1) * 1e6)}\n"
    vocab.zipWithIndex.foreach { case (t, i) =>
      val q = math.round(w(i) * 1e6)
      if (q != 0L) out ++= s"$t\t$q\n"
    }
    val dest = Paths.get("src/main/resources/graft/refiner-lr-v1.tsv")
    Files.write(dest, out.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[train] wrote $dest")
    spark.stop()
  }
}
