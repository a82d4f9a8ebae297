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
}
