package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Dev harness: trains the committed BPE tokenizer artifact
  * (src/main/resources/graft/bpe-merges-v1.tsv) — real byte-pair-
  * encoding merges (Sennrich et al. 2016) learned from the corpus,
  * replacing the regex token-count approximation with a LEARNED
  * subword vocabulary behind the same committed-artifact pattern as
  * F12 (sentiment LR) and the SVD embeddings.
  *
  * Training is the standard two-tier shape — and exactly how BPE
  * trains at 100 TB: ONE distributed pass computes the word-TYPE
  * frequency table (a map-side-combining count shuffle; the corpus
  * itself is never collected), and the merge loop then runs over that
  * BOUNDED type table on the driver (pair counts are weighted by type
  * frequency, so the loop never needs the corpus again). At web scale
  * the type table gets the standard frequency floor before collection
  * (drop count < N types — singleton junk dominates raw web type
  * counts and contributes ~nothing to any pair statistic), keeping
  * the driver table at the 10⁵-10⁶ types real tokenizers train on;
  * this corpus has 31 types, so no floor is applied. Every selection
  * is deterministic: merge = max pair count with lexicographic
  * (left, right) tie order.
  *
  * The artifact has two sections:
  *   - `merges`: rank-ordered (left, right) pairs — the tokenizer
  *     itself, applicable to ANY string by [[graft.text.BpeTokenizer.encode]];
  *   - `vocab`: the training word types with their encoded subtoken
  *     counts — the ORACLE-PARITY table (interpolated into gate SQL as
  *     a VALUES list; SQL cannot run the merge loop, but it can join
  *     this table, and BpeSpec asserts the live encoder reproduces
  *     every stored count, so the table IS the encoder on the trained
  *     vocabulary).
  */
object TrainBpe {

  val NumMerges = 25

  /** Word → initial symbol sequence: characters, last one suffixed
    * with the end-of-word marker (the classic BPE convention, so a
    * word-final subword is distinct from the same prefix mid-word).
    */
  def symbols(word: String): Vector[String] = {
    val cs = word.toVector.map(_.toString)
    if (cs.isEmpty) Vector.empty
    else cs.init :+ (cs.last + "</w>")
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
      .sortBy { case (t, n) => (-n, t) }

    // tier 2 (driver, bounded by #types): the merge loop
    var words: Map[Vector[String], Long] =
      types.groupMapReduce(kv => symbols(kv._1))(_._2)(_ + _)
    val merges = Vector.newBuilder[(String, String)]
    for (_ <- 1 to NumMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Vector(a, b) =>
            pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + n
          case _ =>
        }
      }
      if (pairCounts.nonEmpty) {
        val best = pairCounts.toSeq
          .maxBy { case ((a, b), n) => (n, a, b) }(
            Ordering.Tuple3(Ordering.Long, Ordering.String.reverse,
              Ordering.String.reverse))._1
        merges += best
        words = words.map { case (syms, n) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += syms(i) + syms(i + 1); i += 2
            } else { out += syms(i); i += 1 }
          }
          out.result() -> n
        }
      }
    }
    val ranked = merges.result()

    // vocab section: encoded subtoken count per training word type,
    // via the SAME apply path the runtime uses
    val counts = types.map { case (t, _) =>
      t -> graft.text.BpeTokenizer.encodeWith(ranked, t).length
    }

    val out = Paths.get("src/main/resources/graft/bpe-merges-v1.tsv")
    val body =
      s"# BPE merges + train-vocab counts, trained by graft.TrainBpe on $dir\n" +
        ranked.zipWithIndex.map { case ((a, b), i) =>
          s"merge\t$i\t$a\t$b" }.mkString("\n") + "\n" +
        counts.sortBy(_._1).map { case (t, n) => s"vocab\t$t\t$n" }
          .mkString("\n") + "\n"
    Files.write(out, body.getBytes(StandardCharsets.UTF_8))
    println(s"wrote $out (${ranked.size} merges, ${counts.length} vocab types)")
    counts.sortBy(_._1).foreach { case (t, n) =>
      val toks = graft.text.BpeTokenizer.encodeWith(ranked, t)
      println(f"$t%-10s -> ${toks.mkString(" ")} ($n)")
    }
    spark.stop()
  }
}
