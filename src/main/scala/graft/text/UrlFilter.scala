package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL / domain blocklist filtering — the C4-style doc gate that drops
  * documents citing blocklisted hosts.
  *
  * Map-side only: URL extraction and host parsing are codegen'd regex
  * builtins over the text column, and the blocklist (bounded — real
  * blocklists are ~100k hosts) rides into the plan as a literal /
  * broadcast set. Zero shuffles. Patterns stay in the Java∩RE2 subset
  * so the DuckDB oracle runs them verbatim (same rule as [[Pii]]).
  */
object UrlFilter {

  /** Scheme-anchored URL matcher (whitespace-delimited, as in C4). */
  val UrlPat = "https?://[^\\s]+"

  /** Host capture out of a matched URL: skips an optional
    * `userinfo@` prefix and stops before `:port`, `/path`, or
    * whitespace, so `https://u@SPAM.Example.COM:443/x` yields
    * `SPAM.Example.COM` (lowercased by [[hosts]] before any
    * blocklist compare — DNS names are case-insensitive).
    */
  val HostPat = "https?://(?:[^/@\\s]*@)?([^/:@\\s]+)"

  def urls(text: Column): Column =
    regexp_extract_all(text, lit(UrlPat), lit(0))

  def hosts(text: Column): Column =
    transform(urls(text), u => lower(regexp_extract(u, HostPat, 1)))

  /** (id, n_urls, n_blocked, keep): keep = no host on the blocklist.
    * One projection; the blocklist is a literal set (broadcast-scale
    * in production).
    */
  def flagBlocked(idCol: Column, text: Column,
      blocklist: Seq[String]): Seq[Column] = {
    val h = hosts(text)
    val nBlocked = size(filter(h, x => x.isin(blocklist: _*))).cast("long")
    Seq(
      idCol,
      size(urls(text)).cast("long").as("n_urls"),
      nBlocked.as("n_blocked"),
      (nBlocked === 0L).as("keep"))
  }
}
