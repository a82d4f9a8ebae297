package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Parity
import graft.text.TextAnalysis

/** Document deduplication family for training-data pipelines:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design notes (100 TB):
  *   - exact dedup is one hash-shuffle on the fingerprint;
  *   - MinHash+LSH is the linear-cost near-dup path: per-doc signature
  *     (map-side), explode to `bands` rows, ONE shuffle on
  *     (band_id, band_key), pairs emerge only inside buckets — never an
  *     all-pairs join;
  *   - the verify step re-joins shingle sets only for candidate pairs;
  *   - hash functions are md5/sha built-ins so results are
  *     reproducible in any engine (DuckDB oracle included). A faster
  *     xxhash64 variant is a drop-in for production (same shape,
  *     non-portable hashes).
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest id as the
    * canonical representative. Reference analog: first-seen-wins tweet
    * dedup (worker/jobs/x_kol_poll.py:82-117).
    */
  def exactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-n-gram shingle sets per doc. */
  def withShingles(df: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    df.select(col(idCol).as("doc_id"), TextAnalysis.shingles(col(textCol), n).as("sh"))

  /** MinHash signature: for k in 0..numHashes-1,
    * sig[k] = min over shingles of md5(k || ':' || shingle).
    */
  def minhashSignature(sh: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      k => array_min(transform(sh, s => md5(concat(k.cast("string"), lit(":"), s)))))

  /** LSH band keys: hash each consecutive group of `rowsPerBand`
    * signature values. bands = numHashes / rowsPerBand.
    */
  def bandKeys(sig: Column, numHashes: Int, rowsPerBand: Int): Column = {
    val bands = numHashes / rowsPerBand
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws("|",
        slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))))
  }

  /** Exact Jaccard between two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_distinct(concat(a, b))).cast("double")

  /** MinHash+LSH near-duplicate pairs with exact-Jaccard verification.
    *
    * Pipeline: shingles → 16-hash signature → 4 bands of 4 → explode →
    * shuffle on (band_id, band_key) → candidate pairs inside buckets →
    * verify jaccard ≥ threshold. Candidate generation cost is linear in
    * corpus size; only bucket-collisions pay the pair cost.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, numHashes: Int = 16, rowsPerBand: Int = 4,
      shingleN: Int = 3): DataFrame = {
    val sh = withShingles(df, idCol, textCol, shingleN)
      .filter(size(col("sh")) > 0)
    val sig = sh.withColumn("sig", minhashSignature(col("sh"), numHashes))
    val bands = sig
      .select(col("doc_id"), col("sh"),
        posexplode(bandKeys(col("sig"), numHashes, rowsPerBand))
          .as(Seq("band_id", "band_key")))
    val a = bands.select(col("band_id"), col("band_key"),
      col("doc_id").as("ida"), col("sh").as("sha"))
    val b = bands.select(col("band_id"), col("band_key"),
      col("doc_id").as("idb"), col("sh").as("shb"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb", "sha", "shb").distinct()
      .withColumn("jaccard", Parity.roundHalfUp(jaccard(col("sha"), col("shb")), 6))
      .filter(col("jaccard") >= threshold)
      .select("ida", "idb", "jaccard")
  }

  /** All-pairs n-gram Jaccard above a threshold — the exact (quadratic)
    * baseline the LSH path approximates; useful as a per-partition /
    * small-corpus verifier and as the correctness oracle for LSH.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.5, shingleN: Int = 3): DataFrame = {
    val sh = withShingles(df, idCol, textCol, shingleN)
      .filter(size(col("sh")) > 0)
    val a = sh.select(col("doc_id").as("ida"), col("sh").as("sha"))
    val b = sh.select(col("doc_id").as("idb"), col("sh").as("shb"))
    a.crossJoin(b).filter(col("ida") < col("idb"))
      .withColumn("jaccard", Parity.roundHalfUp(jaccard(col("sha"), col("shb")), 6))
      .filter(col("jaccard") >= threshold)
      .select("ida", "idb", "jaccard")
  }

  /** 32-bit SimHash fingerprints per row (adds `simhash` LongType).
    *
    * Token hash = first 8 hex chars of md5 (portable); bit b of the
    * fingerprint is the majority vote of distinct-token-hash bits. Pure
    * SQL expressions → codegen'd, and reproducible in the DuckDB
    * oracle. Per-token hashes materialize in an intermediate `hs`
    * column so the majority vote reads it once.
    */
  def withSimhash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
        transform(
          array_distinct(TextAnalysis.tokens(col(textCol))),
          t => conv(substring(md5(t), 1, 8), 16, 10).cast("long")).as("hs"))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 31), cast(0 as bigint),
             (acc, b) -> acc + IF(
               2 * size(filter(hs, h -> (shiftright(h, b) & 1) = 1)) > size(hs),
               shiftleft(cast(1 as bigint), b), cast(0 as bigint)))"""))
      .select("doc_id", "simhash")

  /** SimHash near-dup pairs: hamming distance ≤ maxDist. Banded by the
    * 4 bytes of the fingerprint (a pair within distance d ≤ 3 shares at
    * least one exact byte) to avoid all-pairs at scale.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val fp = withSimhash(df, idCol, textCol)
    val bandStructs = array((0 until 4).map(b =>
      struct(lit(b).as("band_id"),
        shiftright(col("simhash"), b * 8).bitwiseAND(lit(255L)).as("band_val"))): _*)
    val banded = fp.select(col("doc_id"), col("simhash"),
        explode(bandStructs).as("band"))
      .select(col("doc_id"), col("simhash"),
        col("band.band_id").as("band_id"), col("band.band_val").as("band_val"))
    val a = banded.select(col("band_id"), col("band_val"),
      col("doc_id").as("ida"), col("simhash").as("fpa"))
    val b = banded.select(col("band_id"), col("band_val"),
      col("doc_id").as("idb"), col("simhash").as("fpb"))
    a.join(b, Seq("band_id", "band_val"))
      .filter(col("ida") < col("idb"))
      .select("ida", "idb", "fpa", "fpb").distinct()
      .withColumn("hamming", bit_count(col("fpa").bitwiseXOR(col("fpb"))))
      .filter(col("hamming") <= maxDist)
      .select("ida", "idb", "hamming")
  }

  /** Streaming-style first-seen-wins dedup for batch frames: keep the
    * earliest row per key (D1/D2 batch analog).
    */
  def firstSeen(df: DataFrame, keyCols: Seq[String], orderCol: String): DataFrame =
    firstSeenBy(df, keyCols, Seq(col(orderCol).asc))

  /** firstSeen with an explicit (total) ordering — pass a unique
    * tie-break column to keep results engine-deterministic.
    */
  def firstSeenBy(df: DataFrame, keyCols: Seq[String],
      order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
