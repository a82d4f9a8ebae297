package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw-pool document by how target-domain-like its hashed
  * n-gram distribution is, so a 100 TB crawl can be subsampled toward
  * a small high-quality target corpus.
  *
  *   1. features: word unigrams + bigrams, hashed into `buckets`
  *      buckets (the paper's hashed n-gram generative model);
  *   2. two bag-of-buckets unigram LMs with add-1 smoothing — target
  *      docs vs the raw pool;
  *   3. per-bucket log-likelihood ratio λ_b = ln p̂_target(b) −
  *      ln p̂_raw(b), quantized to 1e-6 fixed-point integers;
  *   4. document weight = Σ λ_{bucket(ng)} over the doc's n-gram
  *      OCCURRENCES (an exact integer sum — order-free under any
  *      partitioning); `selected` = weight > 0 (more target-like
  *      than pool-like; the paper then samples ∝ exp(weight), which
  *      is a per-row transform of this output).
  *
  * Scale shape: one explode→groupBy(bucket) shuffle builds both LMs in
  * a single pass (map-side partial aggregation; the exchange carries ≤
  * `buckets` cells per partition). The λ table is BOUNDED at `buckets`
  * rows — a model artifact, broadcast by construction — and the
  * scoring pass is map-side (broadcast hash join on bucket) plus one
  * groupBy(doc) of exact longs. Nothing data-sized reaches the driver.
  *
  * Determinism: bucket counts and totals are exact integers; λ_b is a
  * fixed per-bucket IEEE chain (ln of integer ratios) quantized at
  * 1e-6, and doc weights sum the quantized longs. The only
  * cross-engine risk is a last-ulp `ln` difference (libm vs JDK)
  * landing within ~1e-10 of a quantization boundary — none observed
  * across the corpus; all downstream arithmetic is exact.
  */
object Dsir {

  /** Lowercased unigrams + space-joined bigrams, as occurrences (NOT
    * distinct — DSIR models counts).
    */
  def ngramFeatures(text: Column): Column = {
    val toks = filter(split(lower(text), "\\s+"), t => t =!= "")
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    concat(toks, bigrams)
  }

  /** First 8 md5 hex chars mod `buckets` — the repo-wide
    * engine-portable hash (see [[graft.operators.Sampling]]).
    */
  def bucketOf(ng: Column, buckets: Int): Column =
    conv(substring(md5(ng), 1, 8), 16, 10).cast("long") % buckets

  /** (id, n_features, weight, selected) for every NON-target doc.
    *
    * Both the LM fit and the scoring read ONE per-(doc, bucket)
    * count table, built by the [[graft.expressions.DsirBucketOps]]
    * codegen kernel — a single tokenize+hash pass per doc with a
    * reused digest, histogram pre-aggregated inside the kernel (the
    * builtin-HOF form re-tokenized per element_at lambda, O(n²) per
    * row, and paid a fresh MessageDigest per n-gram; 13.5 s → ~2 s at
    * sf0.1). The model branch and the scoring branch share the count
    * table's exchange (Catalyst reuses identical exchange subtrees),
    * so the corpus is scanned once, and every shuffle carries ≤
    * min(features, buckets) rows per doc instead of one per n-gram
    * occurrence.
    *
    * @param targetPred selects the target-domain docs by id; they
    *                   train p̂_target and are excluded from output.
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column => Column, buckets: Int = 1024): DataFrame = {
    val perDocBucket = df
      .select(col(idCol), targetPred(col(idCol)).as("is_target"),
        explode(graft.expressions.ShingleFunctions
          .dsirBuckets(col(textCol), buckets)).as("e"))
      .select(col(idCol), col("is_target"),
        col("e.b").as("b"), col("e.cnt").as("cnt"))

    // both LMs in one pass over the count table; counts are exact
    val perBucket = perDocBucket.groupBy("b").agg(
      sum(when(col("is_target"), col("cnt")).otherwise(0L)).as("ct"),
      sum(when(!col("is_target"), col("cnt")).otherwise(0L)).as("cr"))

    // 1-row totals, broadcast (scalar crossJoin — the q_t_bm25 shape)
    val totals = perBucket.agg(
      sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))

    // λ_b quantized to 1e-6 fixed-point LONG: downstream is exact
    val lam = perBucket.crossJoin(broadcast(totals))
      .select(col("b"),
        floor(
          (log((col("ct") + 1L).cast("double") /
            (col("tt") + buckets.toLong).cast("double")) -
            log((col("cr") + 1L).cast("double") /
              (col("tr") + buckets.toLong).cast("double"))) * 1e6 + 0.5)
          .cast("long").as("lam_q"))

    perDocBucket.filter(!col("is_target"))
      .join(broadcast(lam), Seq("b")) // ≤ `buckets` rows: model artifact
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_features"),
        sum(col("cnt") * col("lam_q")).as("wq"))
      .select(col(idCol), col("n_features"),
        (col("wq").cast("double") / 1e6).as("weight"),
        (col("wq") > 0L).as("selected"))
  }
}
