package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** Embedding similarity search over an `Array[Float]` column.
  *
  * Scale design (100 TB):
  *   - the exact path broadcasts the (small) query set and scans the
  *     corpus once — embarrassingly parallel, no shuffle except the
  *     final per-query top-k;
  *   - the LSH path adds sign-bucket pre-filtering: deterministic
  *     hyperplane signs derived from md5, so buckets are reproducible;
  *     candidates are only compared within matching buckets (probes=0)
  *     — linear in corpus size;
  *   - dot products run on `double`-cast arrays with sequential
  *     `aggregate`, matching DuckDB `list_dot_product` accumulation
  *     order for oracle parity.
  */
object Similarity {

  /** Cast a float embedding column to double for stable arithmetic. */
  def asDouble(e: Column): Column = transform(e, x => x.cast("double"))

  /** Codegen'd kernel (see [[graft.expressions.VectorOps]]) — the
    * `zip_with`+`aggregate` formulation interprets its lambdas per
    * element and dominated ANN plans at bench scale.
    */
  def dot(a: Column, b: Column): Column =
    graft.expressions.VectorFunctions.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Corpus frame with precomputed double vector + norm. */
  def prepared(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol).as("vec_id"), asDouble(col(embCol)).as("e"))
      .withColumn("nrm", norm(col("e")))

  /** Exact brute-force cosine top-k for a query subset.
    *
    * @param queryPred picks the query rows out of the corpus
    */
  def bruteForceTopK(df: DataFrame, idCol: String, embCol: String,
      queryPred: Column => Column, k: Int): DataFrame = {
    val base = prepared(df, idCol, embCol)
    val q = base.filter(queryPred(col("vec_id")))
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qnrm"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim_raw").desc, col("nn_id").asc)
    base.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        cosine(col("e"), col("qe"), col("nrm"), col("qnrm")).as("cos_sim_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nn_id"),
        Parity.roundHalfUp(col("cos_sim_raw"), 6).as("cos_sim"), col("rank"))
  }

  /** Nearest neighbor (top-1) for EVERY vector + near-dup flag at a
    * cosine threshold — the embedding-cosine near-duplicate detector.
    * All-pairs within the frame; use [[lshTopK]] shape at corpus scale.
    */
  def nearestNeighborAll(df: DataFrame, idCol: String, embCol: String,
      dupThreshold: Double): DataFrame = {
    val base = prepared(df, idCol, embCol)
    val other = base.select(col("vec_id").as("nn_id"), col("e").as("oe"),
      col("nrm").as("onrm"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos_sim_raw").desc, col("nn_id").asc)
    base.crossJoin(other)
      .filter(col("vec_id") =!= col("nn_id"))
      .select(col("vec_id"), col("nn_id"),
        cosine(col("e"), col("oe"), col("nrm"), col("onrm")).as("cos_sim_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("vec_id"), col("nn_id"),
        Parity.roundHalfUp(col("cos_sim_raw"), 6).as("cos_sim"),
        (col("cos_sim_raw") >= dupThreshold).as("is_dup"))
  }

  /** Deterministic sign-LSH bucket key: `planes` pseudo-random
    * hyperplanes whose component signs derive from md5(p:j); bucket bit
    * p = sign(e · signs_p).
    *
    * The sign vectors are computed ONCE on the driver and embedded as
    * literal arrays feeding the codegen'd [[dot]] kernel — the
    * expression-level formulation hashed md5(p:j) per element per row
    * (interpreted, ~dim×planes digests/row) and dominated the ANN
    * bench.
    */
  def signBucket(e: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val signs: Seq[Double] = (0 until dim).map { j =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p:$j".getBytes("UTF-8"))
        // parity of the first two hex chars == parity of the first byte
        if (((h(0) >> 4) * 16 + (h(0) & 0xf)) % 2 == 0) 1.0 else -1.0
      }
      when(dot(e, typedlit(signs)) > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k: restrict comparisons to vectors sharing the
    * sign-LSH bucket, then exact cosine inside the bucket. Trades
    * recall for a shuffle-on-bucket plan that stays linear at corpus
    * scale. Falls back to fewer than k results when a bucket is small
    * (standard IVF/LSH behavior; raise `planes`/probes for recall).
    */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
      queryPred: Column => Column, k: Int, dim: Int, planes: Int = 4): DataFrame = {
    val base = prepared(df, idCol, embCol)
      .withColumn("bucket", signBucket(col("e"), dim, planes))
    val q = base.filter(queryPred(col("vec_id")))
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qnrm"), col("bucket"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim_raw").desc, col("nn_id").asc)
    base.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        cosine(col("e"), col("qe"), col("nrm"), col("qnrm")).as("cos_sim_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nn_id"),
        Parity.roundHalfUp(col("cos_sim_raw"), 6).as("cos_sim"), col("rank"))
  }
}
