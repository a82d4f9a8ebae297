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

  /** Event key v1 (F5 — reference api/events.py:499-502):
    * `sha256(lower(type)|SYMBOL|ca|text_norm|bucket|salt)[:40]` over
    * `|`-joined parts with nulls encoded as empty strings. The trailing
    * salt segment (EVENT_KEY_SALT, default `"v1"`) is part of the
    * preimage, and the type is lowercased (`type_norm`).
    */
  def eventKeyV1(typ: Column, symbol: Column, tokenCa: Column,
      textNorm: Column, bucket: Column, salt: String = "v1"): Column =
    substring(
      sha2(concat_ws("|",
        lower(coalesce(typ, lit(""))),
        upper(coalesce(symbol, lit(""))),
        lower(coalesce(tokenCa, lit(""))),
        coalesce(textNorm, lit("")),
        bucket.cast("string"),
        lit(salt)), 256),
      1, 40)

  /** Topic hash (F8 — reference api/events.py:313-341, sha256 variant):
    * `sha256("kw1||kw2||...")[:12]` over the sorted keyword list; an
    * empty/null list hashes the literal `"none"` (events.py:325-329).
    */
  def topicHash(keywords: Column): Column =
    substring(sha2(topicContent(keywords), 256), 1, 12)

  private def topicContent(keywords: Column): Column =
    when(keywords.isNull || size(keywords) === 0, lit("none"))
      .otherwise(array_join(array_sort(keywords), "||"))

  /** Lightweight text signature used by the v2 key (reference
    * api/events.py:507-508): unkeyed full blake2s hexdigest of the
    * normalized text, first 16 hex chars.
    */
  def textSig(textNorm: Column): Column =
    substring(graft.expressions.GraftFunctions.blake2s(
      coalesce(textNorm, lit("")), digestBytes = 32), 1, 16)

  /** Event key v2 (F5 — reference api/events.py:503-516): FULL 32-byte
    * keyed blake2s of `"v2|type|identity|topic_hash|bucket|text_sig"`,
    * hexdigest truncated to 40 chars (`hexdigest()[:40]` — NOT a
    * 20-byte-output digest: BLAKE2 encodes the digest length in its
    * parameter block, so blake2s-160 would be a different function).
    * identity = token_ca else `symbol|chain`. Uses the custom
    * [[graft.expressions.Blake2sHash]] Catalyst expression (no JDK
    * blake2s); stays codegen'd.
    */
  def eventKeyV2(typ: Column, symbol: Column, tokenCa: Column, chain: Column,
      topicHash: Column, textSig: Column, bucket: Column,
      salt: String = ""): Column = {
    // empty-string CA is falsy in the reference (`token_ca_norm or …`)
    val identity = coalesce(nullif(lower(tokenCa), lit("")),
      concat_ws("|", coalesce(symbol, lit("")), coalesce(chain, lit(""))))
    substring(
      graft.expressions.GraftFunctions.blake2s(
        concat_ws("|", lit("v2"), lower(coalesce(typ, lit(""))), identity,
          coalesce(topicHash, lit("")), bucket.cast("string"),
          coalesce(textSig, lit(""))),
        digestBytes = 32, key = salt),
      1, 40)
  }

  /** Topic hash, blake2s default algorithm (F8 — reference
    * api/events.py:313-341): full blake2s hexdigest of
    * `"kw1||kw2||..."` truncated to 12 hex (`hexdigest()[:12]`);
    * empty list hashes `"none"`.
    */
  def topicHashBlake(keywords: Column): Column =
    substring(graft.expressions.GraftFunctions.blake2s(
      topicContent(keywords), digestBytes = 32), 1, 12)

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
