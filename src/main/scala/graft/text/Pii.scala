package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection + redaction over document text — the scrub pass every
  * large-scale training-data pipeline runs before anything else (cf.
  * C4 / The Pile / Gopher preprocessing).
  *
  * Pure map-side projection: a chain of codegen'd `regexp_replace` /
  * `regexp_extract_all` builtins, zero shuffles, zero UDFs. The
  * patterns deliberately stay inside the regex subset shared by Java's
  * `Pattern` and RE2 (no lookarounds, no backrefs) so the DuckDB
  * oracle can run the byte-identical expressions.
  */
object Pii {

  /** RFC-5322-ish practical email matcher. */
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** International-prefix phone shapes `+C[C]-NNN-NNN-NNNN`. */
  val PhonePat = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** Dotted-quad IPv4. */
  val Ipv4Pat = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** 20-byte hex chain address (`0x` + 40 hex chars). */
  val AddrPat = "\\b0x[0-9a-fA-F]{40}\\b"

  /** (pattern, replacement token) in application order. Email runs
    * first so a dotted domain is consumed before the IPv4 rule can see
    * it; the address rule runs last so the hex body can't be clipped
    * by an earlier rule.
    */
  val Rules: Seq[(String, String)] = Seq(
    EmailPat -> "<EMAIL>",
    PhonePat -> "<PHONE>",
    Ipv4Pat -> "<IP>",
    AddrPat -> "<ADDR>")

  /** Redacted text: every match replaced by its type token. */
  def scrub(text: Column): Column =
    Rules.foldLeft(text) { case (c, (pat, rep)) => regexp_replace(c, pat, rep) }

  /** Per-type match count on the RAW text (pre-redaction). */
  def count(text: Column, pat: String): Column =
    size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")

  /** doc frame → (id, n_emails, n_phones, n_ips, n_addrs, has_pii,
    * clean). Counts are taken on the raw text, then the redaction chain
    * runs — one projection, fully codegen'd.
    */
  def scrubDocs(idCol: Column, text: Column): Seq[Column] = {
    val n = Rules.map { case (pat, _) => count(text, pat) }
    Seq(
      idCol,
      n(0).as("n_emails"),
      n(1).as("n_phones"),
      n(2).as("n_ips"),
      n(3).as("n_addrs"),
      (n(0) + n(1) + n(2) + n(3) > 0L).as("has_pii"),
      scrub(text).as("clean"))
  }

  // -----------------------------------------------------------------
  // Financial identifiers with CHECKSUM validation (L21 extension,
  // round-14 verdict item 7): a 16-digit group is only a credit card
  // if its Luhn checksum holds, an IBAN only if its ISO-7064 mod-97
  // residue is 1 — so a random number that merely LOOKS like one is
  // counted as a suspect, never redacted. Both checks are pure
  // integer folds over the matched characters (higher-order Catalyst
  // expressions — still zero UDFs, still one map-side projection),
  // and both are exactly reproducible in SQL.
  // -----------------------------------------------------------------

  /** `dddd-dddd-dddd-dddd` card-shaped groups. */
  val CardPat = "\\b[0-9]{4}-[0-9]{4}-[0-9]{4}-[0-9]{4}\\b"

  /** Country code + check digits + 10-30 alphanumerics. */
  val IbanPat = "\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}\\b"

  /** Luhn checksum over a digits-only string: doubling every second
    * digit from the RIGHT (with digit-sum), total ≡ 0 (mod 10).
    */
  def luhnValid(digits: Column): Column = {
    val n = length(digits)
    val total = aggregate(
      sequence(lit(1), n),
      lit(0),
      (acc, i) => {
        val d = digits.substr(i, lit(1)).cast("int")
        val doubled = d * 2
        acc + when((n - i) % 2 === 1,
          when(doubled > 9, doubled - 9).otherwise(doubled)).otherwise(d)
      })
    (total % 10 === 0) && (n > 0)
  }

  /** ISO-7064 mod-97 IBAN check: move the first four characters to
    * the end, expand letters to two digits (A=10 … Z=35), and fold
    * the digit string left-to-right as `(acc·10 + d) mod 97` — the
    * streaming form of the big-integer residue; valid iff 1.
    */
  def ibanValid(iban: Column): Column = {
    val rearranged = concat(substring(iban, 5, 1000000),
      substring(iban, 1, 4))
    val expanded = array_join(transform(split(rearranged, ""), c =>
      when(c >= "A" && c <= "Z", (ascii(c) - 55).cast("string"))
        .otherwise(c)), "")
    val rem = aggregate(split(expanded, ""), lit(0L),
      (acc, c) => (acc * 10L + c.cast("long")) % 97L)
    rem === 1L
  }

  /** doc frame → (id, n_cards, n_card_suspects, n_ibans,
    * n_iban_suspects, clean): checksum-VALID matches are counted and
    * redacted (`<CARD>`/`<IBAN>` via a fold over the bounded per-doc
    * match list, each replaced through the SAME `\b`-anchored shape
    * the extractor matched — a literal replace would also rewrite an
    * embedded occurrence the extractor deliberately skipped, e.g. the
    * card digits inside a longer identifier, desynchronizing counts
    * from redactions; both match families are regex-metacharacter-
    * free, so the matched string is safe to splice into a pattern);
    * checksum-FAILING shapes are counted as suspects and left in
    * place. One projection, shuffle-free.
    */
  def scrubFinancialDocs(idCol: Column, text: Column): Seq[Column] = {
    val cards = regexp_extract_all(text, lit(CardPat), lit(0))
    val cardsValid = filter(cards,
      c => luhnValid(regexp_replace(c, "-", "")))
    val ibans = regexp_extract_all(text, lit(IbanPat), lit(0))
    val ibansValid = filter(ibans, c => ibanValid(c))
    val c1 = aggregate(cardsValid, text, (acc, c) =>
      regexp_replace(acc, concat(lit("\\b"), c, lit("\\b")),
        lit("<CARD>")))
    val clean = aggregate(ibansValid, c1, (acc, c) =>
      regexp_replace(acc, concat(lit("\\b"), c, lit("\\b")),
        lit("<IBAN>")))
    Seq(
      idCol,
      size(cardsValid).cast("long").as("n_cards"),
      (size(cards) - size(cardsValid)).cast("long").as("n_card_suspects"),
      size(ibansValid).cast("long").as("n_ibans"),
      (size(ibans) - size(ibansValid)).cast("long").as("n_iban_suspects"),
      clean.as("clean"))
  }
}
