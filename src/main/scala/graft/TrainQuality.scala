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

  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBuckets = graft.text.QualityClassifier.TrainedModel.NBuckets
    val dim = nBuckets + 1

    // planted degradation + labels from the shared fixture; features
    // from the runtime's own bucket kernel
    import graft.text.QualityClassifier.Degradation
    val labeled = Tables.load(spark, dir, "documents")
      .select(Degradation.plant(col("doc_id"), col("text")).as("text"),
        Degradation.label(col("doc_id")).as("y"))
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
      .cache()
    val n = labeled.count()
    val nPos = labeled.filter(col("y") === 1).count()
    println(s"[train] docs: $n ($nPos keep / ${n - nPos} drop)")
    require(nPos > 0 && nPos < n, "weak labels are degenerate")

    var w = Array.fill(dim)(0.0)
    // Mean pooling makes each active bucket's feature value ~1/n_feat
    // (n_feat ≈ 100 here), so the per-weight gradient is that much
    // smaller than the bias gradient — one shared rate either
    // stagnates the weights or explodes the bias (the all-majority
    // collapse this trainer's first cuts hit). Scale the weight rate
    // by the feature-count order instead.
    val lrW = 300.0
    val lrB = 1.0
    val iters = 600
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
      if ((it + 1) % 100 == 0) {
        val bwI = spark.sparkContext.broadcast(w)
        val agreeI = labeled.map { case (bs, cs, y) =>
          var nf = 0.0
          var i = 0
          while (i < cs.length) { nf += cs(i); i += 1 }
          var z = bwI.value(dim - 1)
          i = 0
          while (i < bs.length) { z += bwI.value(bs(i)) * cs(i) / nf; i += 1 }
          if ((z >= 0) == (y == 1)) 1 else 0
        }.reduce(_ + _)
        println(f"[train] iter ${it + 1}: agreement ${agreeI.toDouble / n}%.4f")
      }
    }

    // agreement with the weak labels (the printed metric of record)
    val bwF = spark.sparkContext.broadcast(w)
    val agree = labeled.map { case (bs, cs, y) =>
      var nf = 0.0
      var i = 0
      while (i < cs.length) { nf += cs(i); i += 1 }
      var z = bwF.value(dim - 1)
      i = 0
      while (i < bs.length) { z += bwF.value(bs(i)) * cs(i) / nf; i += 1 }
      if ((z >= 0) == (y == 1)) 1 else 0
    }.reduce(_ + _)
    println(f"[train] agreement with rules labels: ${agree.toDouble / n}%.4f ($agree/$n)")

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
