package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar text / normalization column functions (SURVEY §2.2).
  *
  * Pure `Column => Column` builders over Spark built-ins so everything
  * stays inside whole-stage codegen. Semantics derived from the
  * reference pipeline (cited per function); no code is ported.
  */
object TextFunctions {

  /** EVM contract address extraction — reference api/normalize/x.py:17-105 (F1). */
  val CaPattern = "0x[a-fA-F0-9]{40}"

  /** `$SYMBOL` cashtag extraction — reference api/normalize/x.py (F1). */
  val SymbolPattern = "\\$[A-Za-z][A-Za-z0-9]{1,9}"

  def extractCa(text: Column): Column =
    nullifEmpty(regexp_extract(text, CaPattern, 0))

  def extractSymbol(text: Column): Column =
    nullifEmpty(regexp_extract(text, SymbolPattern, 0))

  private def nullifEmpty(c: Column): Column = when(c =!= "", c)

  /** Candidate gate flag: has CA, cashtag, or crypto keyword (F1/P3). */
  def isCandidate(text: Column, keywords: Seq[String]): Column = {
    val kwHit = keywords
      .map(k => lower(text).contains(k.toLowerCase))
      .reduceOption(_ || _).getOrElse(lit(false))
    extractCa(text).isNotNull || extractSymbol(text).isNotNull || kwHit
  }

  /** Text normalization, full reference chain (api/events.py:380-411,
    * F2) in the reference's exact order and with its exact replacement
    * strings: lowercase → Unicode NFC ([[graft.expressions
    * .NfcNormalize]]) → strip `https?://` URLs (with "") → strip
    * `www.` chunks (with "") → strip bare domains followed by
    * space/punctuation (with " ") → strip @handles (with "", keeping
    * #hashtags) → collapse whitespace → trim.
    */
  def normalizeText(text: Column): Column =
    graft.expressions.GraftFunctions.normalizeTextFused(text)

  /** The same chain composed from Spark built-ins — kept as the
    * differential-test witness for the fused kernel (TextNormSpec pins
    * byte-equality on adversarial inputs).
    */
  private[graft] def normalizeTextComposed(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              graft.expressions.GraftFunctions.nfcNormalize(lower(text)),
              "https?://\\S+", ""),
            "www\\.\\S+", ""),
          "\\b[a-zA-Z0-9][a-zA-Z0-9-]*\\.(com|org|net|io|xyz|co|app|tech|ai|dev|finance|eth)[\\s,\\.!?;:]",
          " "),
        "@\\w+", ""),
      "\\s+", " "))

  /** Token symbol canonical form: trim, lowercase, ensure single `$`
    * prefix — reference api/events.py:187-207 (F4).
    */
  def normalizeSymbol(symbol: Column): Column =
    when(symbol.isNull || trim(symbol) === "", lit(null))
      .otherwise(concat(lit("$"), regexp_replace(lower(trim(symbol)), "^\\$+", "")))

  /** Candidate score `0.6*((sentiment+1)/2) + 0.4*min(|keywords|/5, 1)`,
    * clamped to [0,1] — reference api/events.py:344-377 (F9).
    */
  def candidateScore(sentimentScore: Column, keywords: Column): Column =
    candidateScoreN(sentimentScore,
      when(keywords.isNull, lit(0)).otherwise(size(keywords)))

  /** [[candidateScore]] with a keyword COUNT instead of an array. */
  def candidateScoreN(sentimentScore: Column, keywordCount: Column): Column = {
    val s = coalesce(sentimentScore, lit(0.0))
    val raw = lit(0.6) * ((s + 1.0) / 2.0) +
      lit(0.4) * least(keywordCount.cast("double") / 5.0, lit(1.0))
    greatest(lit(0.0), least(lit(1.0), raw))
  }

  /** Lexicon sentiment (F11 — reference api/rules_sentiment.py:5-84).
    * Tokens are `\b\w+\b` word tokens over the lowercased text (every
    * maximal `\w+` run — so `"scam,"` yields the lexicon hit `scam`,
    * and punctuation never reaches the token-count denominator); score
    * = clamp((pos-neg)/n_tokens * 3, -1, 1); label at ±0.1.
    * Counts token OCCURRENCES (not distinct), matching the reference's
    * per-token loop.
    *
    * Deliberate deviation: `\w` here is ASCII (Java and RE2 defaults,
    * matching the DuckDB oracle), while Python's is unicode-aware — a
    * non-ASCII word can tokenize into a different COUNT and shift the
    * denominator. The lexicons are ASCII and the flow is
    * ASCII-dominant; CPython-fuzzed on that domain (SentFuzz, 500
    * punctuation-heavy cases, zero diff).
    */
  def tokenize(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\w+"), lit(0))

  /** Runs as the codegen'd [[graft.expressions.LexiconSentiment]]
    * kernel — one regex pass per row instead of interpreted
    * per-element membership filters (measured 7.6 s → sub-second at
    * sf0.1).
    */
  def sentimentScore(text: Column, pos: Seq[String], neg: Seq[String]): Column =
    graft.expressions.ShingleFunctions.lexiconSentiment(text, pos, neg)

  def sentimentLabel(score: Column): Column =
    when(score > 0.1, "pos").when(score < -0.1, "neg").otherwise("neu")

  /** Rules keyphrases (F13 — reference api/keyphrases.py:80-90): regex
    * tokens `$word | letters{2,}`, stopword filter, order-preserving
    * dedup, top-k.
    */
  def keyphrases(text: Column, stopwords: Seq[String], topK: Int): Column = {
    val toks = regexp_extract_all(lower(text), lit("\\$\\w+|[a-z]{2,}"), lit(0))
    slice(filter(array_distinct(toks), t => !t.isInCollection(stopwords)), 1, topK)
  }

  /** Chain detection from scan-site URLs (F19 — reference
    * worker/jobs/events_compact.py:26-50).
    */
  def chainFromUrl(url: Column): Column = {
    val u = lower(coalesce(url, lit("")))
    when(u.contains("etherscan"), "eth")
      .when(u.contains("bscscan"), "bsc")
      .when(u.contains("arbiscan"), "arb")
      .when(u.contains("optimistic"), "op")
      .when(u.contains("basescan"), "base")
      .when(u.contains("solscan"), "sol")
      .otherwise(lit(null))
  }

  /** Evidence strength grading (F20 — reference
    * worker/jobs/events_compact.py:69-97).
    */
  def evidenceStrength(url: Column): Column = {
    val u = lower(coalesce(url, lit("")))
    when(chainFromUrl(url).isNotNull, "strong")
      .when(u.contains("dexscreener") || u.contains("geckoterminal"), "medium")
      .otherwise("weak")
  }

  /** Memeable-topic confidence `min(1, 0.3*n_entities)` (F15 —
    * reference worker/pipeline/is_memeable_topic.py:94-151).
    */
  def memeableConfidence(nEntities: Column): Column =
    least(lit(1.0), lit(0.3) * nEntities.cast("double"))

  /** GoPlus risk labeling (F10 — reference
    * api/providers/goplus_provider.py:279-379): honeypot → red;
    * buy/sell tax ≥ 10% → red; lp_lock_days < 30 → yellow; green if any
    * data present; unknown otherwise. Tax ratios ≤ 1 are scaled ×100.
    */
  def goplusRisk(honeypot: Column, buyTax: Column, sellTax: Column,
      lpLockDays: Column): Column = {
    def pct(t: Column): Column =
      when(t.isNull, lit(null)).when(t <= 1.0, t * 100.0).otherwise(t)
    val bt = pct(buyTax)
    val st = pct(sellTax)
    when(honeypot === true, "red")
      .when(bt >= 10.0 || st >= 10.0, "red")
      .when(lpLockDays.isNotNull && (lpLockDays < 30), "yellow")
      .when(honeypot.isNotNull || bt.isNotNull || st.isNotNull ||
        lpLockDays.isNotNull, "green")
      .otherwise("unknown")
  }
}
