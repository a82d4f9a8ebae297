package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Corpus-level overlap estimation: how much do two SOURCES (datasets,
  * crawls, dumps) overlap, per pair, without ever shuffling the
  * n-gram universe — the dataset-contamination audit ("is dump B
  * already inside training mix A?") at 100 TB.
  *
  * The doc-level dedup family (L1-L5) answers "which documents are
  * dups"; this answers the corpus-level question with a bottom-k
  * (k-minimum-values) MinHash sketch per source:
  *
  *   - pass 1: per-source bottom-k sketch of hash(word n-gram) —
  *     a mergeable [[Aggregator]] (bounded sorted array, ≤ k longs),
  *     so it PARTIAL-aggregates: each map task reduces its slice to
  *     ≤ k values before the (source)-keyed shuffle moves anything.
  *     The n-gram universe never crosses the wire; per-source state
  *     is k·8 bytes regardless of corpus size.
  *   - pair stage: the sketch table has one row per source, so the
  *     sources² pair matrix is a tiny self-join (whitelisted BNLJ);
  *     the KMV estimate is pure built-in array math (codegen'd, no
  *     UDF): J ≈ |bottomK(A ∪ B) ∩ A ∩ B| / min(k, |A ∪ B|).
  *
  * Estimator variance is the standard KMV bound sd ≈ √(J(1−J)/k), so
  * the gate asserts |est − exact| ≤ max(4·sd, 8/k) — the same
  * 4-sigma-with-floor tolerance-row contract as the HLL and
  * percentile sketch gates (`q_a6_active_window_approx`).
  *
  * Hash choice (round-10 verdict item 5): the shingle hash is the
  * first 15 hex chars of md5 parsed as a 60-bit non-negative long —
  * ENGINE-NEUTRAL, so the DuckDB oracle re-derives the identical
  * sketch, estimates, bands, and `within_band` boolean instead of
  * asserting TRUE (`('0x' || substr(md5(g),1,15))::BIGINT` is the
  * mirror, the sampleKey32 convention at 60 bits). KMV only needs a
  * uniform total order, which a truncated cryptographic hash gives;
  * the swap from xxhash64 costs one md5 per distinct shingle — at
  * 100 TB still map-side, and the sketch pass is shared with the
  * md5-keyed sampling family anyway.
  */
object CorpusSketch {

  /** Mergeable bottom-k over Long hashes. Buffer = sorted distinct
    * Array[Long] of length ≤ k (value-encoded, no kryo — the output
    * must be a real ArrayType column for the array-function math).
    */
  final class BottomK(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0, "k must be positive")

    override def zero: Array[Long] = Array.emptyLongArray

    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      val i = java.util.Arrays.binarySearch(b, h)
      if (i >= 0) b // already present
      else {
        val ins = -i - 1
        if (b.length < k) {
          val out = new Array[Long](b.length + 1)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, b.length - ins)
          out
        } else if (ins >= k) b // beyond the kth smallest
        else {
          val out = new Array[Long](k)
          System.arraycopy(b, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
          out
        }
      }
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted-distinct two-pointer merge, first k survivors
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length) { val x = a(i); i += 1; x }
          else if (i >= a.length) { val x = b(j); j += 1; x }
          else if (a(i) < b(j)) { val x = a(i); i += 1; x }
          else if (b(j) < a(i)) { val x = b(j); j += 1; x }
          else { val x = a(i); i += 1; j += 1; x }
        out(o) = v; o += 1
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(r: Array[Long]): Array[Long] = r

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** One row per source: (source, sketch bottom-k array). This is the
    * scale path — one partial-aggregated pass, per-source state k·8
    * bytes; the exact distinct-gram counts live only in the gate
    * query's verification side.
    */
  def sourceSketches(docs: DataFrame, srcCol: String, textCol: String,
      n: Int = 3, k: Int = 512): DataFrame = {
    val bk = udaf(new BottomK(k), Encoders.scalaLong)
    docs
      .select(col(srcCol).as("source"),
        explode(TextAnalysis.shingles(col(textCol), n)).as("g"))
      .select(col("source"),
        conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long").as("h"))
      .groupBy("source")
      .agg(bk(col("h")).as("sketch"))
  }

  /** INCREMENTAL sketch maintenance (the L52 ingest pattern applied
    * to the L46 audit): bottom-k is a semilattice —
    * `bottomK(bottomK(A) ∪ bottomK(B)) = bottomK(A ∪ B)` — so the
    * stored per-source sketches absorb an ingest batch's sketches
    * with pure built-in array math over one (sources)-row join, cost
    * ∝ sources × k, never re-touching the history corpus. The gate
    * `q_c_overlap_incremental` pins the identity: estimates from the
    * merged sketches hash-match an oracle that re-derives the
    * sketches from scratch over the union corpus.
    */
  def mergeSketches(stored: DataFrame, batch: DataFrame,
      k: Int = 512): DataFrame = {
    val a = stored.select(col("source"), col("sketch").as("ska"))
    val b = batch.select(col("source"), col("sketch").as("skb"))
    a.join(b, Seq("source"), "full_outer")
      .select(col("source"),
        slice(array_sort(array_union(
            coalesce(col("ska"), array().cast("array<bigint>")),
            coalesce(col("skb"), array().cast("array<bigint>")))),
          1, k).as("sketch"))
  }

  /** Pairwise KMV estimates over the sketch table (one row per
    * source): (sa, sb, est_jaccard, est_cont_a_in_b, est_cont_b_in_a,
    * n_eff_a, n_eff_b). Pure built-in array math.
    *
    * Containment is the DIRECTIONAL contamination number — a small
    * dump fully inside a huge mix has Jaccard ≈ |B|/|A| ≈ 0 but
    * C(B ⊆ A) ≈ 1. KMV form: bottomK(A ∪ B) is a uniform sample of
    * the union, so C(A ⊆ B) ≈ |unionK ∩ A ∩ B| / |unionK ∩ A| — the
    * denominator (`n_eff_a`) is the effective sample size for the
    * binomial error band, which callers use as √(C(1−C)/n_eff).
    */
  def pairEstimates(sketches: DataFrame, k: Int = 512): DataFrame = {
    val a = sketches.select(col("source").as("sa"), col("sketch").as("ska"))
    val b = sketches.select(col("source").as("sb"), col("sketch").as("skb"))
    val unionK = slice(array_sort(array_union(col("ska"), col("skb"))), 1, k)
    val common = size(array_intersect(unionK,
      array_intersect(col("ska"), col("skb"))))
    val inA = size(array_intersect(unionK, col("ska")))
    val inB = size(array_intersect(unionK, col("skb")))
    val denom = least(lit(k), size(array_union(col("ska"), col("skb"))))
    a.join(b, col("sa") < col("sb"))
      .select(col("sa"), col("sb"),
        (common.cast("double") / greatest(denom, lit(1)).cast("double"))
          .as("est_jaccard"),
        (common.cast("double") / greatest(inA, lit(1)).cast("double"))
          .as("est_cont_a_in_b"),
        (common.cast("double") / greatest(inB, lit(1)).cast("double"))
          .as("est_cont_b_in_a"),
        inA.as("n_eff_a"), inB.as("n_eff_b"))
  }
}
