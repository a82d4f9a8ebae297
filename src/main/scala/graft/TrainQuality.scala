package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.DsirBucketOps

/** Dev harness: trains the committed quality-classifier artifact
  * (src/main/resources/graft/quality-lr-v1.tsv) — a logistic
  * regression over the hashed unigram+bigram bucket space (the
  * [[graft.expressions.DsirBucketOps]] rule: first-8-hex-of-md5 mod
  * 1024, counts with multiplicity, mean pooling), so the model-based
  * quality filter (L-family `q_t_quality_classifier`) carries a REAL
  * learned weight table instead of the hash-derived pseudo-model —
  * the fifth artifact retired by the F12/F14/L59/F17 pattern. This is
  * the fastText production recipe (Joulin et al. 2016): hashed n-gram
  * features, mean pooling, a linear layer.
  *
  * Supervision: a PLANTED boilerplate degradation, the repo's fixture
  * convention (plantedPii, the DSIR target-domain tokens, the Gopher
  * structural fixture): every doc_id % 3 == 0 document gets one of two
  * deterministic spam/boilerplate tails appended, and the model learns
  * keep = clean vs drop = degraded — the spam-detection face of the
  * production quality classifier (the part of GPT-3's quality LR that
  * fires on SEO/boilerplate token distributions). Two label sources
  * were tried and rejected first, and the reasons are load-bearing for
  * this model family: the rule battery (qualityScore ≥ 0.5) is
  * length-dominated and mean pooling normalizes length away
  * (agreement plateaued at 0.55); the corpus's lang metadata is
  * independent of the synthetic token soup, so "reference slice = en"
  * is unlearnable from text by construction (0.63 = hash
  * memorization). The planted signal lives entirely in the token
  * distribution, which is exactly what hashed mean-pooled features
  * can carry. Distant supervision — no hand labels anywhere.
  *
  * Training protocol is TrainRefiner's verbatim: per iteration one
  * corpus pass, batch gradient as a bounded (nBuckets+1)-cell 1e-9
  * fixed-point partial aggregate (bit-reproducible under any
  * partitioning), weights quantized to 1e-6 on write. The trainer
  * featurizes through DsirBucketOps.buckets and the serving kernel
  * (TrainedPoolOps.pool) through the same shared
  * [[graft.expressions.FeatureHashOps]] tokenize+hash rule, so
  * trainer and serving cannot drift.
  */
object TrainQuality {

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Featurize (text, y) rows through the runtime's OWN bucket kernel
    * ([[DsirBucketOps.buckets]] — the serving kernel's tokenize+hash
    * rule, so trainer and serving cannot drift). Input frame must
    * carry string `text` and int `y`.
    */
  def featurize(spark: SparkSession,
      rows: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.Dataset[(Array[Int], Array[Long], Int)] = {
    import spark.implicits._
    val nBuckets = graft.text.QualityClassifier.TrainedModel.NBuckets
    rows.select(col("text"), col("y"))
      .as[(String, Int)]
      .map { case (text, y) =>
        val arr = DsirBucketOps.buckets(UTF8String.fromString(text), nBuckets)
        val bs = new Array[Int](arr.numElements())
        val cs = new Array[Long](arr.numElements())
        var i = 0
        while (i < bs.length) {
          val r = arr.getStruct(i, 2)
          bs(i) = r.getLong(0).toInt; cs(i) = r.getLong(1); i += 1
        }
        (bs, cs, y)
      }
      .toDF("bs", "cs", "y").as[(Array[Int], Array[Long], Int)]
  }

  /** Sign-agreement of the (raw double) weight vector with the labels. */
  def agreement(spark: SparkSession,
      labeled: org.apache.spark.sql.Dataset[(Array[Int], Array[Long], Int)],
      w: Array[Double]): Double = {
    val dim = w.length
    val bw = spark.sparkContext.broadcast(w)
    val n = labeled.count()
    val agree = labeled.map { case (bs, cs, y) =>
      var nf = 0.0
      var i = 0
      while (i < cs.length) { nf += cs(i); i += 1 }
      var z = bw.value(dim - 1)
      i = 0
      while (i < bs.length) { z += bw.value(bs(i)) * cs(i) / nf; i += 1 }
      if ((z >= 0) == (y == 1)) 1 else 0
    }(org.apache.spark.sql.Encoders.scalaInt).reduce(_ + _)
    agree.toDouble / n
  }

  /** Quantize trained raw weights to the artifact/serving form:
    * (1e-6 fixed-point bias, dense 1e-6 fixed-point bucket weights).
    */
  def quantize(w: Array[Double]): (Long, Array[Long]) =
    (math.round(w(w.length - 1) * 1e6),
      w.dropRight(1).map(x => math.round(x * 1e6)))

  /** The training loop — TrainRefiner's protocol verbatim: per
    * iteration ONE corpus pass, batch gradient as a bounded
    * (NBuckets+1)-cell 1e-9 fixed-point partial aggregate
    * (bit-reproducible under any partitioning). Mean pooling makes
    * each active bucket's feature value ~1/n_feat, so the weight rate
    * scales by the feature-count order (lrW 300 vs lrB 1) — one
    * shared rate either stagnates the weights or explodes the bias.
    * Returns the RAW double weight vector (dim = NBuckets+1, bias
    * last); [[quantize]] converts to the artifact/serving form.
    */
  def fit(spark: SparkSession,
      labeled: org.apache.spark.sql.Dataset[(Array[Int], Array[Long], Int)],
      iters: Int, verbose: Boolean = false,
      lrW: Double = 300.0, lrB: Double = 1.0): Array[Double] = {
    val dim = graft.text.QualityClassifier.TrainedModel.NBuckets + 1
    val n = labeled.count()
    val w = Array.fill(dim)(0.0)
    val Q = 1e9
    for (it <- 0 until iters) {
      val bw = spark.sparkContext.broadcast(w)
      val grad = labeled.rdd.treeAggregate(new Array[Long](dim))(
        seqOp = { (acc, row) =>
          val (bs, cs, y) = row
          var nf = 0.0
          var i = 0
          while (i < cs.length) { nf += cs(i); i += 1 }
          if (nf > 0) {
            var z = bw.value(dim - 1)
            i = 0
            while (i < bs.length) { z += bw.value(bs(i)) * cs(i) / nf; i += 1 }
            val err = sigmoid(z) - y
            i = 0
            while (i < bs.length) {
              acc(bs(i)) += math.round(err * cs(i) / nf * Q); i += 1
            }
            acc(dim - 1) += math.round(err * Q)
          }
          acc
        },
        combOp = { (a, b) => var i = 0; while (i < dim) { a(i) += b(i); i += 1 }; a })
      var i = 0
      while (i < dim - 1) { w(i) -= lrW * (grad(i) / Q) / n; i += 1 }
      w(dim - 1) -= lrB * (grad(dim - 1) / Q) / n
      if (verbose && (it + 1) % 100 == 0)
        println(f"[train] iter ${it + 1}: agreement ${agreement(spark, labeled, w)}%.4f")
    }
    w
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBuckets = graft.text.QualityClassifier.TrainedModel.NBuckets

    // planted degradation + labels from the shared fixture; features
    // from the runtime's own bucket kernel
    import graft.text.QualityClassifier.Degradation
    val labeled = featurize(spark, Tables.load(spark, dir, "documents")
      .select(Degradation.plant(col("doc_id"), col("text")).as("text"),
        Degradation.label(col("doc_id")).as("y"))).cache()
    val n = labeled.count()
    val nPos = labeled.filter(col("y") === 1).count()
    println(s"[train] docs: $n ($nPos keep / ${n - nPos} drop)")
    require(nPos > 0 && nPos < n, "weak labels are degenerate")

    val w = fit(spark, labeled, iters = 600, verbose = true)
    // agreement with the weak labels (the printed metric of record)
    val agree = agreement(spark, labeled, w)
    println(f"[train] agreement with rules labels: $agree%.4f")

    val dim = w.length
    val out = new StringBuilder
    out ++= "# quality LR v1: bucket\\t1e-6 fixed-point weight (md5%1024 features); __bias__ row\n"
    out ++= s"__bias__\t${math.round(w(dim - 1) * 1e6)}\n"
    (0 until nBuckets).foreach { b =>
      val q = math.round(w(b) * 1e6)
      if (q != 0L) out ++= s"$b\t$q\n"
    }
    val dest = Paths.get("src/main/resources/graft/quality-lr-v1.tsv")
    Files.write(dest, out.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[train] wrote $dest")
    spark.stop()
  }
}
