package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.{TextAnalysis, UnigramTokenizer}

/** Dev harness: trains the committed Unigram-LM tokenizer artifact
  * (src/main/resources/graft/unigram-pieces-v1.tsv) — the
  * SentencePiece-style alternative (Kudo 2018, Viterbi-EM variant) to
  * the BPE merges, behind the same committed-artifact pattern.
  *
  * Two-tier shape, exactly [[TrainBpe]]'s — and exactly how unigram
  * vocabularies train at 100 TB: ONE distributed pass computes the
  * word-TYPE frequency table (map-side-combining count shuffle), and
  * EM then runs over that BOUNDED type table on the driver. Seeding:
  * every substring of length ≤ MaxPieceLen of every type, weighted by
  * type frequency, capped at the most frequent [[SeedMax]] plus all
  * single characters (coverage). Each EM round Viterbi-segments every
  * type under the current piece log-probs (hard EM — deterministic,
  * the segmentation counts ARE the expected counts of the dominant
  * derivation), re-estimates probs from the weighted piece counts,
  * and after the first round prunes to the top [[VocabTarget]] pieces
  * (plus single chars — the encoder must stay total). Log-probs are
  * committed as INTEGER-SCALED longs (ln·10⁶, StrictMath, half-even),
  * so runtime segmentation is integer arithmetic, bit-deterministic
  * on any platform.
  *
  * Artifact sections: `piece <text> <scaled-lp>` (the model) and
  * `vocab <word> <n_pieces>` (oracle-parity — the gate joins it as a
  * VALUES list; UnigramSpec asserts the live Viterbi reproduces every
  * stored count).
  */
object TrainUnigram {

  val SeedMax = 200
  val VocabTarget = 60
  val EmIters = 5
  val Scale = 1000000L

  private def scaledLn(count: Long, total: Long): Long =
    java.math.BigDecimal.valueOf(
      StrictMath.log(count.toDouble / total.toDouble) * Scale)
      .setScale(0, java.math.RoundingMode.HALF_EVEN).longValueExact()

  /** One EM estimate: Viterbi-count every type under `lp`, return the
    * (piece → weighted count) table of the segmentations.
    */
  private def viterbiCounts(types: Seq[(String, Long)],
      lp: Map[String, Long]): Map[String, Long] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    types.foreach { case (w, n) =>
      UnigramTokenizer.encodeWith(lp, w).foreach { p =>
        counts(p) = counts.getOrElse(p, 0L) + n
      }
    }
    counts.toMap
  }

  private def toLogProbs(counts: Map[String, Long]): Map[String, Long] = {
    val total = counts.values.sum
    counts.map { case (p, c) => p -> scaledLn(c, total) }
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // tier 1 (distributed, the only corpus pass): word-type counts
    val types = Tables.load(spark, dir, "documents")
      .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (t, n) => (-n, t) }.toSeq

    // tier 2 (driver, bounded by #types): seed + Viterbi-EM + prune
    val chars = types.flatMap(_._1.map(_.toString)).distinct.sorted
    val seedCounts = scala.collection.mutable.Map.empty[String, Long]
    types.foreach { case (w, n) =>
      for {
        i <- 0 until w.length
        j <- (i + 1) to math.min(w.length, i + UnigramTokenizer.MaxPieceLen)
      } {
        val s = w.substring(i, j)
        seedCounts(s) = seedCounts.getOrElse(s, 0L) + n
      }
    }
    val seed = (seedCounts.toSeq
      .sortBy { case (p, c) => (-c, p) }.take(SeedMax).map(_._1) ++ chars)
      .distinct
    var lp = toLogProbs(seed.map(p => p -> seedCounts(p)).toMap)
    for (it <- 1 to EmIters) {
      var counts = viterbiCounts(types, lp)
      if (it > 1) {
        // prune to the target vocabulary; single chars always stay so
        // the encoder remains total on trained text
        val kept = (counts.toSeq.sortBy { case (p, c) => (-c, p) }
          .take(VocabTarget).map(_._1) ++ chars).toSet
        counts = counts.filter { case (p, _) => kept(p) } ++
          chars.filterNot(counts.contains).map(_ -> 1L)
      }
      lp = toLogProbs(counts)
    }

    // vocab section via the SAME apply path the runtime uses
    val vocab = types.map { case (t, _) =>
      t -> UnigramTokenizer.encodeWith(lp, t).length
    }

    val out = Paths.get("src/main/resources/graft/unigram-pieces-v1.tsv")
    val body =
      s"# Unigram-LM pieces (scaled ln-probs) + train-vocab counts, " +
        s"trained by graft.TrainUnigram on $dir\n" +
        lp.toSeq.sortBy(_._1).map { case (p, l) => s"piece\t$p\t$l" }
          .mkString("\n") + "\n" +
        vocab.sortBy(_._1).map { case (t, n) => s"vocab\t$t\t$n" }
          .mkString("\n") + "\n"
    Files.write(out, body.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $out (${lp.size} pieces, ${vocab.size} vocab types)")
    vocab.sortBy(_._1).foreach { case (t, n) =>
      val segs = UnigramTokenizer.encodeWith(lp, t)
      println(f"$t%-10s -> ${segs.mkString(" ")} ($n)")
    }
    spark.stop()
  }
}
