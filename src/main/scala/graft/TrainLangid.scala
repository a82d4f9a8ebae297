package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.LangIdTrainedOps
import graft.text.LangIdModel

/** Trainer for the committed langid artifact (langid-lr-v1.tsv —
  * the seventh model artifact, the TrainQuality convention): multiclass
  * one-vs-rest logistic regression over hashed char-trigram buckets,
  * featurized through the runtime's OWN kernel
  * ([[LangIdTrainedOps.gramBuckets]]) so trainer and serving cannot
  * drift. The training corpus is deterministic: 5000 synthetic
  * sentences drawn from [[LangIdModel.Vocab]] under a DIFFERENT
  * index stream (t·29 + i·11) than the gate fixture's (d·13 + i·7) —
  * the gate scores sentences the trainer never saw. Full-batch
  * gradient descent, fixed epochs/rate, driver-local (5 × 256
  * weights — model-sized by construction); weights land as 1e-6
  * fixed point.
  */
object TrainLangid {

  def trainingRows(n: Int): Seq[(Int, String)] =
    (0 until n).map { t =>
      val lang = t % 5
      val toks = (0 until (8 + t % 7)).map(i =>
        LangIdModel.Vocab(lang)((t * 29 + i * 11) % 20))
      (lang, toks.mkString(" "))
    }

  def fit(rows: Seq[(Int, String)], epochs: Int, lr: Double):
      (Array[Double], Array[Array[Double]]) = {
    val nb = LangIdModel.NBuckets
    val nl = LangIdModel.Langs.length
    val feats = rows.map { case (y, s) =>
      (y, LangIdTrainedOps.gramBuckets(UTF8String.fromString(s), nb))
    }
    val biases = new Array[Double](nl)
    val w = Array.fill(nl)(new Array[Double](nb))
    (0 until epochs).foreach { _ =>
      val gb = new Array[Double](nl)
      val gw = Array.fill(nl)(new Array[Double](nb))
      feats.foreach { case (y, bs) =>
        var l = 0
        while (l < nl) {
          var z = biases(l)
          var i = 0
          while (i < bs.length) { z += w(l)(bs(i)); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          val err = p - (if (y == l) 1.0 else 0.0)
          gb(l) += err
          i = 0
          while (i < bs.length) { gw(l)(bs(i)) += err; i += 1 }
          l += 1
        }
      }
      val scale = lr / feats.length
      var l = 0
      while (l < nl) {
        biases(l) -= scale * gb(l)
        var b = 0
        while (b < nb) { w(l)(b) -= scale * gw(l)(b); b += 1 }
        l += 1
      }
    }
    (biases, w)
  }

  /** Held-out argmax accuracy (ties → lowest index, the serving rule). */
  def accuracy(rows: Seq[(Int, String)], biases: Array[Double],
      w: Array[Array[Double]]): Double = {
    val nb = LangIdModel.NBuckets
    val ok = rows.count { case (y, s) =>
      val bs = LangIdTrainedOps.gramBuckets(UTF8String.fromString(s), nb)
      val z = biases.clone()
      bs.foreach(b => (0 until z.length).foreach(l => z(l) += w(l)(b)))
      z.indexOf(z.max) == y
    }
    ok.toDouble / rows.length
  }

  def main(args: Array[String]): Unit = {
    val train = trainingRows(5000)
    val (biases, w) = fit(train, epochs = 300, lr = 2.0)
    println(f"[train] train-set accuracy: ${accuracy(train, biases, w)}%.4f")
    // held-out check on the GATE's own index stream (the shared rule)
    val held = (0L until 1000L).map(LangIdModel.plantedSentence)
    val heldAcc = accuracy(held, biases, w)
    println(f"[train] held-out (gate-stream) accuracy: $heldAcc%.4f")
    require(heldAcc > 0.99, s"langid model failed to separate: $heldAcc")

    val out = new StringBuilder
    out ++= "# langid LR v1: lang\\tbucket\\t1e-6 fixed-point weight " +
      "(char-trigram md5%256 features); __bias__\\tlang rows\n"
    LangIdModel.Langs.zipWithIndex.foreach { case (lang, l) =>
      out ++= s"__bias__\t$lang\t${math.round(biases(l) * 1e6)}\n"
      (0 until LangIdModel.NBuckets).foreach { b =>
        val q = math.round(w(l)(b) * 1e6)
        if (q != 0L) out ++= s"$lang\t$b\t$q\n"
      }
    }
    val dest = Paths.get("src/main/resources/graft/langid-lr-v1.tsv")
    Files.write(dest, out.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[train] wrote $dest")
  }
}
