package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._


/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, fingerprinting.
  *
  * All pure `Column` pipelines over codegen'd built-ins — no UDFs — so
  * they run inside whole-stage codegen and are DuckDB-oracle checkable.
  */
object TextAnalysis {

  /** Per-language stopword sets for the n-gram/stopword language-ID
    * heuristic. Tiny by design: language ID at 100 TB must be a cheap
    * map-side expression; a model-backed classifier would slot in via
    * mapPartitions behind the same column contract.
    */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "no"),
    "fr" -> Seq("le", "les", "des", "et", "une", "du", "est", "dans", "pour", "ce"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "im"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "不", "人", "这"))

  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Language ID: argmax of per-language stopword hit counts with a
    * fixed priority order on ties; "und" when no list hits at all.
    * Returns a struct(lang, conf) with conf = hits/n_tokens. Runs as
    * the codegen'd [[graft.expressions.LangIdExpr]] kernel — one
    * tokenization pass for all lexicons (the per-language
    * `filter(isInCollection)` composition interpreted per element and
    * re-split the text per language).
    */
  def langId(text: Column): Column =
    graft.expressions.ShingleFunctions.langId(text,
      Stopwords.map(_._1), Stopwords.map(_._2))

  /** Heuristic document quality score in [0,1] (Gopher/C4-style
    * length / repetition / stopword-density gates):
    * 0.3*min(n/100,1) + 0.3*uniq_ratio + 0.2*min(5*stop_ratio,1)
    * + 0.2*min(avg_len/8,1). One codegen'd pass — the HOF composition
    * (`aggregate(transform(tokens))` + distinct + stopword filter)
    * re-tokenized per element interpreted; float-op order preserved
    * bit-for-bit in [[graft.expressions.QualityOps]].
    */
  def qualityScore(text: Column): Column =
    graft.expressions.ShingleFunctions.qualityScore(text, Stopwords.head._2)

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, single digits, single
    * punctuation — a cheap proxy for subword tokenizer counts.
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  /** chars/4 estimator used widely as an LLM-token heuristic. */
  def tokenEstimateChars(text: Column): Column =
    ceil(length(text).cast("double") / 4.0).cast("long")

  /** BPE merge-step statistics — the inner loop of byte-pair-encoding
    * tokenizer TRAINING: corpus-wide adjacent character-pair
    * frequencies, weighted by word frequency. (Real BPE iterates
    * merge→recount; this is the per-iteration counting step, the part
    * that touches the corpus.)
    *
    * Scale shape: aggregate WORD COUNTS first — the classic BPE
    * preprocessing — so the pair explode runs over DISTINCT words
    * (vocabulary-sized: ~10⁵-10⁶ rows regardless of corpus size)
    * weighted by their counts, never over the raw corpus. Two keyed
    * shuffles (word, then pair), both map-side combinable; at 100 TB
    * the word-count table is the only corpus-scale aggregation and it
    * is exactly the token-frequency table other stages (TF-IDF, DSIR)
    * already build.
    *
    * Returns (pair, pair_count) — every adjacent pair of the
    * lowercased whitespace vocabulary, count summed over occurrences.
    */
  def bpePairCounts(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val words = df.select(explode(tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .filter(length(col("word")) >= 2)
    words
      .select(col("word"), col("n"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(expr("substring(word, i, 2)").as("pair"), col("n"))
      .groupBy("pair").agg(sum("n").as("pair_count"))
  }

  /** Word n-gram shingles (distinct), the base for MinHash / Jaccard /
    * winnowing fingerprints. Empty array when the doc is shorter than n.
    * Native kernel ([[graft.expressions.WordShingles]]): the HOF
    * formulation re-tokenized per element and dominated dedup benches.
    */
  def shingles(text: Column, n: Int = 3): Column =
    graft.expressions.ShingleFunctions.wordShingles(text, n)

  /** Word n-gram occurrences WITH multiplicity (no dedup) — the
    * corpus-frequency-mining base ([[graft.expressions.WordShinglesAll]]).
    */
  def shinglesAll(text: Column, n: Int): Column =
    graft.expressions.ShingleFunctions.wordShinglesAll(text, n)

  /** Gopher-style repetition probe: struct(gram, cnt) of the most
    * frequent word n-gram (count DESC, gram ASC ties), one codegen'd
    * pass ([[graft.expressions.TopNgram]]); empty gram / cnt 0 when
    * the doc is shorter than n. The character-fraction gate divides
    * cnt·len(gram) by len(text).
    */
  def topNgram(text: Column, n: Int): Column =
    graft.expressions.ShingleFunctions.topNgram(text, n)

  /** Whole-document fingerprint (md5) + winnowing-style min-shingle
    * fingerprint: min over md5(shingle) — stable under small
    * permutations, the rolling-hash-fingerprint analog.
    */
  def docFingerprint(text: Column): Column = md5(text)

  def minShingleFingerprint(text: Column, n: Int = 3): Column =
    array_min(transform(shingles(text, n), s => md5(s)))
}
