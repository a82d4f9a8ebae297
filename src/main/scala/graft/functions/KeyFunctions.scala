package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic key / hash / time-bucket functions (SURVEY §2.2).
  *
  * Everything here is built from codegen'd built-ins (`sha2`, `sha1`,
  * `md5`, arithmetic) so keys are reproducible across engines — the
  * DuckDB oracle computes the identical hex digests.
  */
object KeyFunctions {

  /** Event time bucket: floor epoch seconds to `bucketSec` (default 600)
    * — reference api/events.py:175-184 (F6).
    */
  def tsBucket(epochSec: Column, bucketSec: Long = 600L): Column = {
    // integer arithmetic only: `/` on Columns is DOUBLE division, and
    // truncating its result can misbucket near boundaries at large
    // epochs (the ns-epoch variants in queries use `div` for the same
    // reason)
    val e = epochSec.cast("long")
    e - (e % bucketSec)
  }

  /** Event key v1 (F5 — reference api/events.py:414-470):
    * `sha256(type|SYMBOL|ca|text_norm|bucket)[:40]` over `|`-joined
    * parts with nulls encoded as empty strings.
    */
  def eventKeyV1(typ: Column, symbol: Column, tokenCa: Column,
      textNorm: Column, bucket: Column): Column =
    substring(
      sha2(concat_ws("|",
        coalesce(typ, lit("")),
        upper(coalesce(symbol, lit(""))),
        coalesce(tokenCa, lit("")),
        coalesce(textNorm, lit("")),
        bucket.cast("string")), 256),
      1, 40)

  /** Topic hash (F8 — reference api/events.py:313-341, sha256 variant):
    * `sha256("kw1||kw2||...")[:12]` over the sorted keyword list.
    */
  def topicHash(keywords: Column): Column =
    substring(sha2(array_join(array_sort(keywords), "||"), 256), 1, 12)

  /** Event key v2 (F5 — reference api/events.py:472-528): keyed
    * blake2s-160 of `"v2|type|identity|topic_hash|bucket|text_sig"`,
    * identity = token_ca else `symbol|chain`; 40 hex chars. Uses the
    * custom [[graft.expressions.Blake2sHash]] Catalyst expression (no
    * JDK blake2s); stays codegen'd.
    */
  def eventKeyV2(typ: Column, symbol: Column, tokenCa: Column, chain: Column,
      topicHash: Column, textSig: Column, bucket: Column,
      salt: String = ""): Column = {
    val identity = coalesce(tokenCa,
      concat_ws("|", coalesce(symbol, lit("")), coalesce(chain, lit(""))))
    graft.expressions.GraftFunctions.blake2s(
      concat_ws("|", lit("v2"), coalesce(typ, lit("")), identity,
        coalesce(topicHash, lit("")), bucket.cast("string"),
        coalesce(textSig, lit(""))),
      digestBytes = 20, key = salt)
  }

  /** Topic hash, blake2s default algorithm (F8 — reference
    * api/events.py:313-341): blake2s-48 of `"kw1||kw2||..."` → 12 hex.
    */
  def topicHashBlake(keywords: Column): Column =
    graft.expressions.GraftFunctions.blake2s(
      array_join(array_sort(keywords), "||"), digestBytes = 6)

  /** Post fingerprint for window dedup (D1 — reference
    * worker/jobs/x_kol_poll.py:82-117): `sha1(source|author|ts|text[:30])`.
    */
  def postFingerprint(source: Column, author: Column, tsIso: Column,
      text: Column): Column =
    sha1(concat_ws("|",
      coalesce(source, lit("")),
      coalesce(author, lit("")),
      coalesce(tsIso, lit("")),
      substring(coalesce(text, lit("")), 1, 30)))
}
