package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** Gopher-style document quality RULE BATTERY (Rae et al. 2021,
  * "Scaling Language Models", Appendix A1.1) — the hard per-document
  * gates production corpora apply before model training, kept as
  * individual verdict columns (not folded into one score like
  * [[TextAnalysis.qualityScore]]) because curation pipelines ablate
  * and tune rules one at a time.
  *
  * Rules (thresholds as published):
  *   - word count in [50, 100000]
  *   - mean word length in [3, 10]
  *   - symbol-to-word ratio (`#`, `…`) ≤ 0.1
  *   - ≤ 90% of lines start with a bullet (`• `, `- `, `* `)
  *   - ≤ 30% of lines end with an ellipsis (`…`, `...`)
  *   - ≥ 80% of words contain at least one alphabetic character
  *   - ≥ 2 distinct required stopwords present
  *     (the/be/to/of/and/that/have/with)
  *
  * Everything is a single codegen'd projection over builtins — one
  * map-side pass, zero shuffles, zero UDFs. Ratios are one integer
  * count divided by another (exact int sums → one IEEE division), so
  * the DuckDB oracle reproduces them bit-for-bit; displayed ratios are
  * additionally 6-dp rounded on both sides.
  */
object GopherRules {

  /** Gopher's required-stopword list (A1.1). */
  val RequiredStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  val MinWords = 50
  val MaxWords = 100000
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MaxSymbolRatio = 0.1
  val MaxBulletLineRatio = 0.9
  val MaxEllipsisLineRatio = 0.3
  val MinAlphaWordRatio = 0.8
  val MinRequiredStops = 2

  /** Full battery: metrics, per-rule verdicts, and the conjunction.
    * Append to a `select` over any text column.
    */
  def columns(idCol: Column, text: Column): Seq[Column] = {
    val words = filter(split(text, "\\s+"), w => w =!= "")
    val nWords = size(words).cast("long")
    val sumLen = aggregate(words, lit(0L), (a, w) => a + length(w))
    val meanLen = when(nWords > 0L,
      sumLen.cast("double") / nWords.cast("double")).otherwise(lit(0.0))
    val nSymbols =
      (length(text) - length(regexp_replace(text, "#", ""))).cast("long") +
      (length(text) - length(regexp_replace(text, "…", ""))).cast("long")
    val symbolRatio = when(nWords > 0L,
      nSymbols.cast("double") / nWords.cast("double")).otherwise(lit(0.0))

    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      substring(l, 1, 2) === "• " || substring(l, 1, 2) === "- " ||
        substring(l, 1, 2) === "* ")).cast("long")
    val bulletRatio = when(nLines > 0L,
      nBullet.cast("double") / nLines.cast("double")).otherwise(lit(0.0))
    val nEllipsis = size(filter(lines, l =>
      endswith(l, lit("…")) || endswith(l, lit("...")))).cast("long")
    val ellipsisRatio = when(nLines > 0L,
      nEllipsis.cast("double") / nLines.cast("double")).otherwise(lit(0.0))

    val nAlpha = size(filter(words, w => w.rlike("[A-Za-z]"))).cast("long")
    val alphaRatio = when(nWords > 0L,
      nAlpha.cast("double") / nWords.cast("double")).otherwise(lit(0.0))

    val nStops = size(array_intersect(
      array_distinct(transform(words, w => lower(w))),
      array(RequiredStops.map(lit): _*))).cast("long")

    val rWordCount = nWords >= MinWords && nWords <= MaxWords
    val rMeanLen = meanLen >= MinMeanWordLen && meanLen <= MaxMeanWordLen
    val rSymbol = symbolRatio <= MaxSymbolRatio
    val rBullet = bulletRatio <= MaxBulletLineRatio
    val rEllipsis = ellipsisRatio <= MaxEllipsisLineRatio
    val rAlpha = alphaRatio >= MinAlphaWordRatio
    val rStops = nStops >= MinRequiredStops

    Seq(
      idCol,
      nWords.as("n_words"),
      Parity.roundHalfUp(meanLen, 6).as("mean_word_len"),
      Parity.roundHalfUp(symbolRatio, 6).as("symbol_ratio"),
      Parity.roundHalfUp(bulletRatio, 6).as("bullet_ratio"),
      Parity.roundHalfUp(ellipsisRatio, 6).as("ellipsis_ratio"),
      Parity.roundHalfUp(alphaRatio, 6).as("alpha_ratio"),
      nStops.as("n_req_stops"),
      rWordCount.as("r_word_count"),
      rMeanLen.as("r_mean_word_len"),
      rSymbol.as("r_symbol_ratio"),
      rBullet.as("r_bullet_lines"),
      rEllipsis.as("r_ellipsis_lines"),
      rAlpha.as("r_alpha_words"),
      rStops.as("r_stopwords"),
      (rWordCount && rMeanLen && rSymbol && rBullet && rEllipsis &&
        rAlpha && rStops).as("keep"))
  }
}
