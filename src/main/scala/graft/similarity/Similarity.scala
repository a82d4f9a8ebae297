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
  *   - the LSH paths add sign-bucket pre-filtering: deterministic
  *     hyperplane signs derived from md5, so buckets are reproducible
  *     on any engine (the DuckDB oracle rebuilds them); multiple hash
  *     tables + Hamming-1 multi-probe amplify recall; candidates are
  *     only compared within matching buckets — linear in corpus size;
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

  /** Nearest neighbor (top-1) for EVERY vector + near-dup flag, via an
    * all-pairs cross join — O(n²), the small-corpus ground truth that
    * specs measure [[nearDupLsh]]'s recall against. NEVER the scale
    * path: the gate query runs [[nearDupLsh]].
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

  /** Deterministic ±1 hyperplane components for (table, plane): the
    * sign of component j derives from the parity of the first byte of
    * md5("t:p:j") — reproducible on ANY engine with md5 (the DuckDB
    * oracle rebuilds the identical planes in SQL), no RNG state.
    *
    * Computed ONCE on the driver and embedded as literal arrays feeding
    * the codegen'd [[dot]] kernel — the expression-level formulation
    * hashed md5 per element per row (interpreted, ~dim×planes
    * digests/row) and dominated the ANN bench.
    */
  def planeSigns(table: Int, plane: Int, dim: Int): Seq[Double] =
    (0 until dim).map { j =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$table:$plane:$j".getBytes("UTF-8"))
      // parity of the first byte == parity of the 2nd hex char
      if (((h(0) >> 4) * 16 + (h(0) & 0xf)) % 2 == 0) 1.0 else -1.0
    }

  /** One sign-LSH bucket key per hash table: bucket bit p of table t =
    * sign(e · planeSigns(t, p)). Multiple independent tables are the
    * standard recall amplifier: a near pair collides if it agrees on
    * ALL planes of ANY table — P(miss) = (1-(1-θ/π)^planes)^tables,
    * which for near-dup angles (cos ≥ 0.9) vanishes at 8×4.
    */
  def signBuckets(e: Column, dim: Int, planes: Int, tables: Int): Column =
    array((0 until tables).map { t =>
      (0 until planes).map { p =>
        when(dot(e, typedlit(planeSigns(t, p, dim))) > 0,
          shiftleft(lit(1L), p)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)

  /** Corpus exploded to one row per (vector, table) with its bucket —
    * the shuffle key both LSH operators join on.
    */
  private def bucketed(df: DataFrame, idCol: String, embCol: String,
      dim: Int, planes: Int, tables: Int): DataFrame =
    prepared(df, idCol, embCol)
      .select(col("vec_id"), col("e"), col("nrm"),
        posexplode(signBuckets(col("e"), dim, planes, tables)).as(Seq("t", "bucket")))

  /** Embedding-cosine near-duplicate detector at corpus scale: best
    * bucket-mate per vector (top-1 cosine among vectors sharing a
    * (table, bucket) key) + `is_dup` flag at `dupThreshold`.
    *
    * Plan shape: one shuffle on (t, bucket), pairs generated only
    * inside buckets — linear in corpus size for hash-partitioned
    * buckets (bucket population ≈ n/2^planes per table; grow `planes`
    * with log₂(corpus) to hold that constant). NO cross join anywhere.
    * For genuinely-near pairs (the ones dedup cares about) the
    * multi-table collision bound above makes recall ≥ 0.99 at 8×4 —
    * asserted against [[nearestNeighborAll]] ground truth in AnnSpec
    * on a planted-near-dup corpus.
    */
  def nearDupLsh(df: DataFrame, idCol: String, embCol: String,
      dupThreshold: Double, dim: Int, planes: Int = 8, tables: Int = 4): DataFrame = {
    val b = bucketed(df, idCol, embCol, dim, planes, tables)
    val left = b.select(col("t"), col("bucket"), col("vec_id"), col("e"), col("nrm"))
    val right = b.select(col("t"), col("bucket"), col("vec_id").as("nn_id"),
      col("e").as("oe"), col("nrm").as("onrm"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cos_sim_raw").desc, col("nn_id").asc)
    // a pair colliding in several tables yields IDENTICAL rows; top-1
    // keeps one of them, so no distinct pass is needed before ranking
    left.join(right, Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("nn_id"))
      .select(col("vec_id"), col("nn_id"),
        cosine(col("e"), col("oe"), col("nrm"), col("onrm")).as("cos_sim_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("vec_id"), col("nn_id"),
        Parity.roundHalfUp(col("cos_sim_raw"), 6).as("cos_sim"),
        (col("cos_sim_raw") >= dupThreshold).as("is_dup"))
  }

  /** Approximate top-k for a query subset: sign-LSH buckets with
    * MULTI-PROBE — each query additionally probes every bucket at
    * Hamming distance 1 (the `planes` single-bit flips), recovering
    * near misses where exactly one hyperplane splits the pair. The
    * corpus side keeps its exact buckets, so corpus cost stays one
    * shuffle; only the (small) query side fans out ×(planes+1).
    * Candidates are deduped on (qid, nn_id) before ranking — the same
    * pair can surface from several probes/tables and duplicate rows
    * would otherwise occupy two of the k ranks.
    */
  // -----------------------------------------------------------------
  // IVF (inverted-file) ANN — the centroid-bucketed scale path
  // -----------------------------------------------------------------

  /** Deterministic IVF "training": the `nlist` corpus vectors whose
    * `md5(vec_id)` ranks lowest become the coarse centroids,
    * L2-normalized. A seeded sample stands in for k-means (the
    * assignment/probe machinery is identical, and determinism is what
    * the oracle needs — DuckDB re-derives the same centroid set with
    * the same md5 ranking). The collect is BOUNDED at `nlist` rows
    * (~64 × dim doubles), standard IVF practice: centroids are a
    * driver-side model artifact, broadcast into codegen as literals —
    * NOT a driver-side loop over data.
    */
  def ivfCentroids(df: DataFrame, idCol: String, embCol: String,
      nlist: Int): Seq[Seq[Double]] =
    prepared(df, idCol, embCol)
      .orderBy(md5(col("vec_id").cast("string")).asc, col("vec_id").asc)
      .limit(nlist)
      .select(col("e"), col("nrm"))
      .collect()
      .toSeq
      .map(r => r.getSeq[Double](0).map(_ / r.getDouble(1)))

  /** Spherical k-means (Lloyd) training for the IVF coarse quantizer:
    * md5-ranked sample init ([[ivfCentroids]]), then `iters` rounds of
    * assign → recompute → renormalize.
    *
    * Scale shape: assignment is the map-side literal-centroid argmax
    * (no join, no corpus shuffle); the recompute is a posexplode +
    * `groupBy(list, pos).sum` whose map-side partial aggregation means
    * the exchange carries only partitions × nlist × dim partial cells,
    * and the driver collect is BOUNDED at nlist × dim aggregated cells
    * per round — the model artifact, exactly as in [[ivfCentroids]].
    * The corpus itself is scanned once per round and never shuffled.
    *
    * Determinism: the ONLY order-dependent step of Lloyd is the
    * per-(list, dim) sum over member rows, so each u-component is
    * quantized per row to a 1e-12 fixed-point integer (exact — the
    * per-row value is a deterministic IEEE chain on both engines) and
    * summed as unbounded integers (decimal(38,0) here, HUGEINT in the
    * oracle): an integer sum is associative/commutative, hence
    * identical under any partitioning or row order. The mean,
    * renormalize, and final 9-dp half-up round are then fixed IEEE
    * chains on identical inputs — genuinely bit-for-bit cross-engine,
    * not merely rounded-and-hoped (the nll_sum_u pattern from
    * [[graft.text.LangModel]]). Empty lists keep their previous
    * centroid (classic Lloyd fallback).
    */
  def kmeansCentroids(df: DataFrame, idCol: String, embCol: String,
      nlist: Int, iters: Int): Seq[Seq[Double]] = {
    val base = prepared(df, idCol, embCol)
      .withColumn("u", transform(col("e"), x => x / col("nrm")))
    var cents = ivfCentroids(df, idCol, embCol, nlist)
    val dim = cents.head.length
    for (_ <- 1 to iters) {
      val cells = base
        .withColumn("list_id", ivfAssign(col("e"), cents))
        .select(col("list_id"), posexplode(col("u")).as(Seq("pos", "x")))
        // quantize per row (exact), sum as unbounded integers: order-free
        .groupBy("list_id", "pos")
        .agg(sum(floor(col("x") * lit(1e12) + lit(0.5)).cast("decimal(38,0)"))
          .as("sx"), count(lit(1)).as("cnt"))
        .collect()
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val cnts = new Array[Long](nlist)
      cells.foreach { r =>
        val l = r.getInt(0)
        sums(l)(r.getInt(1)) = r.getDecimal(2).doubleValue() / 1e12
        cnts(l) = r.getLong(3)
      }
      cents = cents.zipWithIndex.map { case (prev, l) =>
        if (cnts(l) == 0L) prev
        else {
          val m = sums(l).map(_ / cnts(l))
          var s = 0.0
          var j = 0
          while (j < dim) { s += m(j) * m(j); j += 1 }
          val nrm = math.sqrt(s)
          m.toSeq.map(x => math.floor(x / nrm * 1e9 + 0.5) / 1e9)
        }
      }
    }
    cents
  }

  /** Trained-IVF partition map: every vector labeled with its list
    * under the k-means-trained centroids, the list population, and the
    * cosine to its centroid (the quantization-quality signal that
    * drives nlist growth at scale). One small shuffle for the sizes;
    * the assignment itself is map-side.
    */
  def ivfTrainAssignments(df: DataFrame, idCol: String, embCol: String,
      nlist: Int, iters: Int): DataFrame = {
    val cents = kmeansCentroids(df, idCol, embCol, nlist, iters)
    val top = element_at(centroidRank(col("e"), cents), 1)
    val w = Window.partitionBy("list_id")
    prepared(df, idCol, embCol)
      .select(col("vec_id"), top.getField("cid").as("list_id"),
        (-top.getField("nd") / col("nrm")).as("cos_raw"))
      .withColumn("list_size", count(lit(1)).over(w))
      .select(col("vec_id"), col("list_id"), col("list_size"),
        Parity.roundHalfUp(col("cos_raw"), 6).as("cos_c"))
  }

  /** Centroid ranking as a sortable literal array: element i holds
    * (-e·ĉᵢ, i), so ascending sort = cosine DESC with centroid-index
    * ties first (centroids are unit-norm, so the dot IS the cosine
    * ranking for a fixed row). All `nlist` dots run inside the codegen'd
    * [[dot]] kernel against literal arrays — map-side only, no shuffle,
    * no lookup join.
    */
  private def centroidRank(e: Column, cents: Seq[Seq[Double]]): Column =
    sort_array(array(cents.zipWithIndex.map { case (c, i) =>
      struct((-dot(e, typedlit(c))).as("nd"), lit(i).as("cid"))
    }: _*))

  /** Nearest-centroid list id (first max on ties, matching the oracle's
    * `ORDER BY dot DESC, cid ASC` row_number).
    */
  def ivfAssign(e: Column, cents: Seq[Seq[Double]]): Column =
    element_at(centroidRank(e, cents), 1).getField("cid")

  /** The `nprobe` nearest centroid ids for a query vector. */
  def ivfProbes(e: Column, cents: Seq[Seq[Double]], nprobe: Int): Column =
    transform(slice(centroidRank(e, cents), 1, nprobe), x => x.getField("cid"))

  /** IVF top-k: corpus vectors are assigned to their nearest centroid's
    * inverted list (a pure map-side projection — the list id is computed
    * from literal centroids, so the corpus is scanned ONCE and never
    * shuffled); each query probes its `nprobe` nearest lists and is
    * broadcast into a hash join on `list_id`; ranking sees only the
    * probed lists' candidates (expected corpus_fraction ≈ nprobe/nlist).
    *
    * Complement to [[lshTopK]]: IVF adapts to the data distribution
    * (lists follow density; a skewed corpus gets balanced lists by
    * growing `nlist`), while sign-LSH is data-independent. Candidates
    * need no dedup — every corpus vector lives in EXACTLY one list and
    * a query's probed lists are distinct.
    */
  def ivfTopK(df: DataFrame, idCol: String, embCol: String,
      queryPred: Column => Column, k: Int, nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val cents = ivfCentroids(df, idCol, embCol, nlist)
    val base = prepared(df, idCol, embCol)
    val corpus = base.withColumn("list_id", ivfAssign(col("e"), cents))
    val q = base.filter(queryPred(col("vec_id")))
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qnrm"),
        explode(ivfProbes(col("e"), cents, nprobe)).as("list_id"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim_raw").desc, col("nn_id").asc)
    corpus.join(broadcast(q), Seq("list_id"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        cosine(col("e"), col("qe"), col("nrm"), col("qnrm")).as("cos_sim_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nn_id"),
        Parity.roundHalfUp(col("cos_sim_raw"), 6).as("cos_sim"), col("rank"))
  }

  /** L58 — incremental IVF list maintenance: the ANN analogue of the
    * L40/L52 ingest contract. The coarse quantizer (centroids) is the
    * STORED model artifact from the history snapshot — production IVF
    * indexes retrain it rarely, not per batch — so ingesting a batch
    * costs: (a) a map-side assignment of the batch's vectors against
    * the broadcast centroid literals (∝ batch), and (b) an append to
    * the stored per-list layout (at 100 TB the history lists are a
    * bucketed-by-list_id table that never reshuffles — the L40
    * BucketingSpec pattern). Search is [[ivfTopK]]'s probe join over
    * history ∪ batch, unchanged.
    *
    * The gate's oracle re-derives the same pipeline with the centroid
    * CTE restricted to the history slice; with an EMPTY batch this
    * reduces exactly to [[ivfTopK]] over the history (spec-asserted).
    */
  def ivfTopKIncremental(history: DataFrame, batch: DataFrame,
      idCol: String, embCol: String, queryPred: Column => Column,
      k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents = ivfCentroids(history, idCol, embCol, nlist)
    val corpus = prepared(history, idCol, embCol)
      .unionByName(prepared(batch, idCol, embCol))
    ivfProbeSearch(corpus, cents, queryPred, k, nprobe)
  }

  /** The shared IVF probe-join search over a PREPARED corpus frame
    * (`vec_id`, `e`, `nrm`) against literal centroids: map-side list
    * assignment, broadcast query probes, per-query top-k. Both the
    * frozen-quantizer path ([[ivfTopKIncremental]]) and the
    * retrain-on-drift path ([[ivfMaintain]]) end here — which
    * centroids to search with is the ONLY thing the maintenance rule
    * decides.
    */
  private def ivfProbeSearch(prep: DataFrame, cents: Seq[Seq[Double]],
      queryPred: Column => Column, k: Int, nprobe: Int): DataFrame = {
    val corpus = prep.withColumn("list_id", ivfAssign(col("e"), cents))
    val q = corpus.filter(queryPred(col("vec_id")))
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qnrm"),
        explode(ivfProbes(col("e"), cents, nprobe)).as("list_id"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim_raw").desc, col("nn_id").asc)
    corpus.join(broadcast(q), Seq("list_id"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        cosine(col("e"), col("qe"), col("nrm"), col("qnrm")).as("cos_sim_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nn_id"),
        Parity.roundHalfUp(col("cos_sim_raw"), 6).as("cos_sim"), col("rank"))
  }

  /** L58's retrain rule EXECUTABLE (round-10 verdict item 4): measure
    * the inverted lists' occupancy drift after an ingest batch and
    * re-initialize the coarse quantizer from a sample of the union
    * corpus when the stated trigger fires — the SCALE_REHEARSAL.md
    * rule ("max/mean occupancy > `driftFactor` × the post-train
    * value → sample re-init") as an operator, not prose.
    *
    *   - occupancy is measured under the STORED quantizer (history
    *     centroids) before and after the batch: max list count over
    *     mean (total/nlist, empty lists counted) — two bounded
    *     nlist-row aggregations, the same model-artifact-sized
    *     driver collect as the trainer;
    *   - NO drift → the result is IDENTICAL to [[ivfTopKIncremental]]
    *     (same centroids, same probe search; DataOpsSpec asserts the
    *     identity row-for-row, and `q_s_ivf_maintain` shares the
    *     search SQL with `q_s_ivf_incremental`);
    *   - drift → centroids re-initialize via [[ivfCentroids]] over
    *     history ∪ batch (the rehearsed remedy) and the search runs
    *     under the re-balanced lists (`q_s_ivf_maintain_drift` — the
    *     oracle re-derives the trigger arithmetic AND the re-init).
    *
    * The decision inputs ride on every output row (`retrained`,
    * `occ_ratio_trained`, `occ_ratio_after`) so the oracle's hash
    * compare proves the trigger, not just the search it selected.
    */
  def ivfMaintain(history: DataFrame, batch: DataFrame, idCol: String,
      embCol: String, queryPred: Column => Column, k: Int,
      nlist: Int = 16, nprobe: Int = 4,
      driftFactor: Double = 2.0): DataFrame = {
    // bootstrap derivation of the stored baseline — production calls
    // pass the persisted (centroids, post-train ratio) artifact to
    // ivfMaintainWith instead of re-scanning history per batch
    val cents0 = ivfCentroids(history, idCol, embCol, nlist)
    val r0 = occupancyRatio(prepared(history, idCol, embCol), cents0, nlist)
    ivfMaintainWith(history, batch, idCol, embCol, queryPred, k,
      cents0, r0, nlist, nprobe, driftFactor)
  }

  /** Per-(list assignment under `cents`) occupancy max/mean (empty
    * lists counted via the nlist denominator) — bounded nlist-row
    * aggregation, model-artifact-sized collect.
    */
  def occupancyRatio(prep: DataFrame, cents: Seq[Seq[Double]],
      nlist: Int): Double = {
    val counts = prep
      .withColumn("list_id", ivfAssign(col("e"), cents))
      .groupBy("list_id").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    if (counts.isEmpty) 1.0
    else counts.max / (counts.sum.toDouble / nlist)
  }

  /** [[ivfMaintain]] against the STORED baseline: `trainedCents` and
    * `trainedRatio` are the quantizer + post-train occupancy ratio
    * persisted when the index was (re)trained — the production call
    * shape, where a per-batch maintenance step scans history once
    * (the post-batch occupancy pass over the lists it already stores;
    * at 100 TB that pass reads the per-list COUNTS the manifest
    * already aggregates, not vectors) instead of re-deriving
    * train-time constants. [[ivfMaintain]] is the bootstrap/gate path
    * that derives both from the history frame.
    */
  def ivfMaintainWith(history: DataFrame, batch: DataFrame, idCol: String,
      embCol: String, queryPred: Column => Column, k: Int,
      trainedCents: Seq[Seq[Double]], trainedRatio: Double,
      nlist: Int = 16, nprobe: Int = 4,
      driftFactor: Double = 2.0): DataFrame = {
    val hPrep = prepared(history, idCol, embCol)
    val uPrep = hPrep.unionByName(prepared(batch, idCol, embCol))
    val r1 = occupancyRatio(uPrep, trainedCents, nlist)
    val retrain = r1 > driftFactor * trainedRatio
    val cents =
      if (retrain) ivfCentroids(history.unionByName(batch), idCol, embCol, nlist)
      else trainedCents
    ivfProbeSearch(uPrep, cents, queryPred, k, nprobe)
      .withColumn("retrained", lit(retrain))
      .withColumn("occ_ratio_trained", Parity.roundHalfUp(lit(trainedRatio), 6))
      .withColumn("occ_ratio_after", Parity.roundHalfUp(lit(r1), 6))
  }

  /** L50 — IVF-SQ8, the production ANN configuration (faiss
    * IndexIVFScalarQuantizer): IVF list pruning bounds WHICH vectors
    * are scanned (nprobe/nlist of the corpus), SQ8 bounds what each
    * scanned vector COSTS (8-bit codes, 4× less memory traffic), and
    * the distance is asymmetric — full-precision query against the
    * dequantized corpus. Index-build-time assignment uses the full-
    * precision vectors (they exist when the index is built); only the
    * stored codes are quantized.
    *
    * Scale shape: assignment + encoding are map-side on literal
    * centroids/stats (both bounded model artifacts); the one shuffle
    * is the probe join on `list_id`, identical to [[ivfTopK]] — the
    * corpus itself is never shuffled. Exact-mirror oracle: every
    * stage (centroid init, assignment, probes, codes, dequantized
    * cosine) is deterministic double math.
    */
  def ivfSq8TopK(df: DataFrame, idCol: String, embCol: String,
      queryPred: Column => Column, k: Int, nlist: Int = 16,
      nprobe: Int = 4): DataFrame = {
    val cents = ivfCentroids(df, idCol, embCol, nlist)
    val (mn, mx) = sq8Stats(df, idCol, embCol)
    val base = prepared(df, idCol, embCol)
    val corpus = base
      .withColumn("list_id", ivfAssign(col("e"), cents))
      .withColumn("dq", sq8Dequantize(col("e"), mn, mx))
      .withColumn("dqnrm", norm(col("dq")))
      .select("vec_id", "list_id", "dq", "dqnrm")
    val q = base.filter(queryPred(col("vec_id")))
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qnrm"),
        explode(ivfProbes(col("e"), cents, nprobe)).as("list_id"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim_raw").desc, col("nn_id").asc)
    corpus.join(broadcast(q), Seq("list_id"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        cosine(col("dq"), col("qe"), col("dqnrm"), col("qnrm")).as("cos_sim_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nn_id"),
        Parity.roundHalfUp(col("cos_sim_raw"), 6).as("cos_sim"), col("rank"))
  }

  /** SemDeDup (Abbas et al. 2023) — semantic deduplication: k-means
    * cluster the embedding space, then prune within each cluster any
    * vector whose cosine to a LOWER-id cluster-mate reaches `tau`
    * (the deterministic analog of the paper's keep-one-per-duplicate-
    * group rule; min id keeps, exactly the repo's dedup convention).
    *
    * Scale shape: clustering reuses the spherical-Lloyd trainer
    * ([[kmeansCentroids]] — corpus scanned once per round, never
    * shuffled); assignment is the map-side literal-centroid argmax;
    * the ONLY shuffle is the self-join on `list_id`. The within-
    * cluster pairwise cost is the published algorithm's cost — at
    * 100 TB `nlist` grows with the corpus to hold the expected list
    * size constant (the paper runs ~100k clusters for LAION-scale),
    * so the per-cluster quadratic stays bounded.
    */
  /** Embedding-space coverage audit — the semantic-diversity
    * diagnostic a curation pipeline runs when SOURCE tags are missing
    * or untrusted (the L45/L68 mixture ops balance by tag; this
    * measures the corpus's actual geometry): assign every vector to
    * the trained coarse quantizer's cells, then report the occupancy
    * distribution's Shannon entropy and its exponential — the
    * EFFECTIVE number of semantic clusters the corpus spans. A
    * scraped dump that looks large but collapses to a few effective
    * cells is over-concentrated; the occupancy max/mean ratio (the
    * L58b retrain trigger's input) rides along per the same counts.
    *
    * One map-side assignment against broadcast centroid literals +
    * ONE combining groupBy to ≤ nlist rows; entropy in the repo's
    * fixed-point convention (ln quantized 1e-6, per-cell summands
    * quantized to integers, total = exact order-free integer sum);
    * empty cells contribute 0 (the 0·ln 0 limit) and are absent from
    * the output, so `eff_lists` counts genuinely occupied structure.
    */
  def clusterEntropy(df: DataFrame, idCol: String, embCol: String,
      nlist: Int, iters: Int): DataFrame = {
    val cells = ivfTrainAssignments(df, idCol, embCol, nlist, iters)
      .groupBy("list_id").agg(count(lit(1)).as("n"))
    val totals = cells.agg(sum("n").as("nt"),
      count(lit(1)).as("n_lists"), max("n").as("max_n"))
    val withH = cells.crossJoin(broadcast(totals))
      .withColumn("p_raw",
        col("n").cast("double") / col("nt").cast("double"))
      .withColumn("ln_u",
        floor(log(col("n").cast("double") / col("nt").cast("double")) *
          lit(1000000.0) + lit(0.5)).cast("long"))
      .withColumn("h_u",
        floor(-col("p_raw") * col("ln_u").cast("double") + lit(0.5))
          .cast("long"))
    val hTot = withH.agg(sum("h_u").as("h_total_u"))
    withH.crossJoin(broadcast(hTot)).select(
      col("list_id"), col("n"),
      Parity.roundHalfUp(col("p_raw"), 6).as("p_share"),
      col("h_u"),
      (col("h_total_u").cast("double") / 1000000.0).as("entropy"),
      Parity.roundHalfUp(
        exp(col("h_total_u").cast("double") / 1000000.0), 6).as("eff_lists"),
      Parity.roundHalfUp(col("max_n").cast("double") *
        col("n_lists").cast("double") / col("nt").cast("double"), 6)
        .as("occ_ratio"))
  }

  def semDedup(df: DataFrame, idCol: String, embCol: String,
      nlist: Int, iters: Int, tau: Double): DataFrame = {
    val cents = kmeansCentroids(df, idCol, embCol, nlist, iters)
    val base = prepared(df, idCol, embCol)
      .select(col("vec_id"),
        transform(col("e"), x => x / col("nrm")).as("u"),
        ivfAssign(col("e"), cents).as("list_id"))
    val lower = base.select(col("list_id"), col("vec_id").as("ida"),
      col("u").as("ua"))
    val dups = base
      .select(col("list_id"), col("vec_id").as("idb"), col("u").as("ub"))
      .join(lower, Seq("list_id"))
      .filter(col("ida") < col("idb") && dot(col("ua"), col("ub")) >= tau)
      .groupBy(col("idb").as("vec_id"))
      .agg(count(lit(1)).as("n_dup_lower"))
    base.select(col("vec_id"), col("list_id"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("list_id"),
        coalesce(col("n_dup_lower"), lit(0L)).as("n_dup_lower"),
        (coalesce(col("n_dup_lower"), lit(0L)) === 0L).as("keep"))
  }

  // ---------- product quantization (IVF-PQ, the 100 TB ANN form) ----

  /** PQ codebooks: the unit-sphere md5-ranked sample (the
    * [[ivfCentroids]] seed), sliced into `m` subspaces — codebook
    * entry (s, j) is sample vector j's s-th subvector. Init-only by
    * design (the [[kmeansCentroids]] Lloyd machinery is the training
    * path, applied per subspace); the gate pins the encode + ADC
    * mechanics, which are training-independent.
    */
  def pqCodebooks(df: DataFrame, idCol: String, embCol: String,
      m: Int, k: Int): Seq[Seq[Seq[Double]]] = {
    val sample = ivfCentroids(df, idCol, embCol, k)
    val w = sample.head.length / m
    (0 until m).map(s => sample.map(_.slice(s * w, (s + 1) * w)))
  }

  /** Per-subspace code assignment: argmin_j of the L2 distance to the
    * codebook entry, computed as `-2·x_s·c + ‖c‖²` (the `‖x_s‖²` term
    * is constant within a subspace, so it cannot change the argmin and
    * is dropped on BOTH engines). Map-side over literal codebooks; ties
    * break to the smaller code. Returns an array<int> of m codes.
    */
  def pqEncode(u: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.size
    val w = books.head.head.size
    array((0 until m).map { s =>
      val sub = slice(u, s * w + 1, w)
      val ranked = sort_array(array(books(s).zipWithIndex.map { case (c, j) =>
        val c2 = c.foldLeft(0.0)((acc, x) => acc + x * x)
        struct((dot(sub, typedlit(c)) * -2.0 + lit(c2)).as("d"),
          lit(j).as("j"))
      }: _*))
      element_at(ranked, 1).getField("j")
    }: _*)
  }

  /** Per-query ADC table: the m×k flattened array of true squared
    * subspace distances `‖q_s‖² − 2·q_s·c + ‖c‖²`, computed ONCE per
    * query (map-side); pair scoring is then m array lookups.
    */
  private def adcTable(u: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.size
    val w = books.head.head.size
    concat((0 until m).map { s =>
      val sub = slice(u, s * w + 1, w)
      val q2 = dot(sub, sub)
      array(books(s).map { c =>
        val c2 = c.foldLeft(0.0)((acc, x) => acc + x * x)
        q2 + dot(sub, typedlit(c)) * -2.0 + lit(c2)
      }: _*)
    }: _*)
  }

  /** IVF-PQ top-k — the composition a 10⁹-vector corpus actually runs:
    * coarse IVF routing (corpus assigned map-side to literal
    * centroids, never shuffled; queries probe `nprobe` lists via a
    * broadcast join) + PQ-compressed scoring (corpus vectors carried
    * as m 4-bit-class codes, query builds its ADC table once, each
    * candidate costs m array lookups instead of a dim-wide dot).
    * Approximate distances rank the probed lists' candidates; the
    * uncompressed kernels ([[ivfTopK]]/[[bruteForceTopK]]) remain the
    * exact baselines.
    */
  def ivfPqTopK(df: DataFrame, idCol: String, embCol: String,
      queryPred: Column => Column, k: Int, nlist: Int = 16,
      nprobe: Int = 4, m: Int = 8, codesPerSub: Int = 16): DataFrame = {
    val cents = ivfCentroids(df, idCol, embCol, nlist)
    val books = pqCodebooks(df, idCol, embCol, m, codesPerSub)
    val base = prepared(df, idCol, embCol)
      .withColumn("u", transform(col("e"), x => x / col("nrm")))
    val corpus = base
      .select(col("vec_id"), ivfAssign(col("e"), cents).as("list_id"),
        pqEncode(col("u"), books).as("codes"))
    val q = base.filter(queryPred(col("vec_id")))
      .select(col("vec_id").as("qid"), adcTable(col("u"), books).as("tbl"),
        explode(ivfProbes(col("e"), cents, nprobe)).as("list_id"))
    val adc = (0 until m)
      .map(s => element_at(col("tbl"),
        element_at(col("codes"), s + 1) + lit(s * codesPerSub) + 1))
      .reduce(_ + _)
    val w = Window.partitionBy("qid")
      .orderBy(col("adc_raw").asc, col("nn_id").asc)
    corpus.join(broadcast(q), Seq("list_id"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nn_id"), adc.as("adc_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nn_id"),
        Parity.roundHalfUp(col("adc_raw"), 6).as("adc_dist"), col("rank"))
  }

  def lshTopK(df: DataFrame, idCol: String, embCol: String,
      queryPred: Column => Column, k: Int, dim: Int, planes: Int = 8,
      tables: Int = 4): DataFrame = {
    val corpus = bucketed(df, idCol, embCol, dim, planes, tables)
      .select(col("t"), col("bucket"), col("vec_id").as("nn_id"),
        col("e").as("oe"), col("nrm").as("onrm"))
    val probes = (qb: Column) =>
      array((Seq(qb) ++ (0 until planes).map(i => qb.bitwiseXOR(lit(1L << i)))): _*)
    val q = bucketed(df, idCol, embCol, dim, planes, tables)
      .filter(queryPred(col("vec_id")))
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qnrm"),
        col("t"), explode(probes(col("bucket"))).as("bucket"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim_raw").desc, col("nn_id").asc)
    corpus.join(broadcast(q), Seq("t", "bucket"))
      .filter(col("nn_id") =!= col("qid"))
      .dropDuplicates("qid", "nn_id")
      .select(col("qid"), col("nn_id"),
        cosine(col("oe"), col("qe"), col("onrm"), col("qnrm")).as("cos_sim_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nn_id"),
        Parity.roundHalfUp(col("cos_sim_raw"), 6).as("cos_sim"), col("rank"))
  }

  /** F14 — MMR keyphrase selection (reference api/keyphrases.py:166-188):
    * greedy maximal-marginal-relevance top-k over a candidate pool,
    * score = α·rel − (1−α)·mean(sim to already-selected), α = 0.65,
    * candidate pool = top max(50, k) by relevance, strict-> first-best
    * tie behavior exactly as the reference loop.
    *
    * The KBIR encoder needs a model the sandbox lacks, so candidates
    * are the embeddings table's vectors: per label group the "document"
    * is the min-vec_id vector and the remaining vectors are the phrase
    * candidates — the selection algebra (the operator under test) is
    * the reference's, byte-for-byte in its float ops.
    *
    * Scale shape: relevance + pairwise sims are relational (one shuffle
    * on label; pool capped at `poolCap` so the within-group pair count
    * is bounded at poolCap²), and the inherently-sequential greedy fold
    * runs per group over ≤poolCap collected candidates — the same
    * bounded-group pattern as the heat EMA fold. Pool SELECTION is the
    * salted two-phase top-k (the domainCap pattern): pass 1 ranks
    * within (label, vec_id mod salts) and keeps ≤ pool per salt —
    * bounding the hot task at salts·pool rows however large the group
    * (a LANGUAGE-grouped corpus has a handful of giant groups; a
    * single-window rank would funnel a fifth of the corpus through one
    * task) — pass 2 ranks the ≤ salts·pool survivors. Bit-identical to
    * the oracle's single window: each salt keeps its own pool-best, so
    * the global top-pool is contained in the union.
    */
  def mmrKeyphrases(df: DataFrame, idCol: String, embCol: String,
      groupCol: String, k: Int = 5, alpha: Double = 0.65,
      poolCap: Int = 50, salts: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("int").as("label"),
        col(idCol).as("vec_id"), asDouble(col(embCol)).as("e"))
      .withColumn("nrm", norm(col("e")))
    val doc = base.groupBy("label").agg(min("vec_id").as("doc_id"))
    val docv = doc.join(base,
        doc("label") === base("label") && col("doc_id") === col("vec_id"))
      .select(doc("label").as("dlabel"), col("doc_id"),
        col("e").as("de"), col("nrm").as("dnrm"))
    val pool0 = base.join(broadcast(docv), col("label") === col("dlabel"))
      .filter(col("vec_id") =!= col("doc_id"))
      .select(col("label"), col("vec_id"), col("e"), col("nrm"),
        cosine(col("e"), col("de"), col("nrm"), col("dnrm")).as("rel"))
    // salted pre-prune: each salt keeps its own pool-best, so the
    // global top-pool survives; the hot task is bounded at salts·pool
    val w1 = Window
      .partitionBy(col("label"), pmod(col("vec_id"), lit(salts.toLong)))
      .orderBy(col("rel").desc, col("vec_id").asc)
    val w = Window.partitionBy("label")
      .orderBy(col("rel").desc, col("vec_id").asc)
    val pool = pool0
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= math.max(poolCap, k))
      .drop("__r1")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= math.max(poolCap, k))
    val other = pool.select(col("label").as("plabel"),
      col("vec_id").as("j"), col("e").as("oe"), col("nrm").as("onrm"))
    val pairs = pool.join(other,
        col("label") === col("plabel") && col("vec_id") < col("j"))
      .select(col("label"), col("vec_id").as("i"), col("j"),
        cosine(col("e"), col("oe"), col("nrm"), col("onrm")).as("sim"))
    val poolDs = pool.select("label", "vec_id", "rel", "rnk")
      .as[(Int, Long, Double, Int)]
    val pairDs = pairs.select("label", "i", "j", "sim")
      .as[(Int, Long, Long, Double)]
    val selected = poolDs.groupByKey(_._1)
      .cogroup(pairDs.groupByKey(_._1)) { (label, ps, qs) =>
        val cand = ps.toArray.sortBy(_._4) // rnk order == rel-desc order
        if (cand.isEmpty) Iterator.empty
        else {
          val sim = new scala.collection.mutable.HashMap[(Long, Long), Double]
          qs.foreach { q =>
            sim((q._2, q._3)) = q._4
            sim((q._3, q._2)) = q._4
          }
          // (candidate, score-at-selection); head's score is its rel
          val sel = scala.collection.mutable.ArrayBuffer(
            (cand.head, cand.head._3))
          val rest = scala.collection.mutable.ArrayBuffer(cand.tail: _*)
          while (sel.size < k && rest.nonEmpty) {
            var bestIdx = -1
            var bestScore = -1e9
            var i = 0
            while (i < rest.size) {
              val c = rest(i)
              var dsum = 0.0
              sel.foreach { case (srow, _) => dsum += sim((c._2, srow._2)) }
              val div = dsum / sel.size
              val score = alpha * c._3 - (1 - alpha) * div
              if (score > bestScore) { bestScore = score; bestIdx = i }
              i += 1
            }
            sel += ((rest(bestIdx), bestScore))
            rest.remove(bestIdx)
          }
          sel.iterator.zipWithIndex.map { case ((row, score), idx) =>
            (label, idx + 1, row._2, score)
          }
        }
      }
    selected.toDF("label", "rank", "vec_id", "mmr_score_raw")
      .select(col("label"), col("rank"), col("vec_id"),
        Parity.roundHalfUp(col("mmr_score_raw"), 6).as("mmr_score"))
  }

  /** L48 — Johnson-Lindenstrauss ±1 random projection: deterministic
    * md5-seeded sign matrix (the [[planeSigns]] trick under a "jl"
    * namespace), p_j = e · s_j / √r. Map-side, zero shuffle; the
    * r-dim projections are the cheap pre-filter space (r/dim of the
    * IO and FLOPs) in front of exact re-ranking.
    */
  def jlSigns(j: Int, dim: Int): Seq[Double] =
    (0 until dim).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"jl:$j:$i".getBytes("UTF-8"))
      if (((h(0) >> 4) * 16 + (h(0) & 0xf)) % 2 == 0) 1.0 else -1.0
    }

  def jlProject(e: Column, dim: Int, r: Int): Column =
    array((0 until r).map(j =>
      dot(e, typedlit(jlSigns(j, dim))) / lit(math.sqrt(r.toDouble))): _*)

  /** JL pre-filter + exact re-rank: top-`cand` in projected space,
    * re-ranked by full-precision cosine, top-`k` out. Deterministic
    * end to end (md5 signs), so the WHOLE pipeline exact-mirrors in
    * the oracle — candidate selection included.
    *
    * Recall contract is MARGIN-dependent (the JL distortion bound):
    * similarities that stand ε above the bulk survive projection when
    * r ≳ 8·ln(n)/ε² — near-dups (cos ≥ 0.9 over a ~0 bulk) survive
    * r=16 with recall ≥ 0.9 (spec-pinned on planted pairs), while the
    * margin-less generic top-k of i.i.d. random vectors does NOT
    * (measured 0.5-0.8 on this corpus, climbing only as cand → N).
    * Use it to cheapen near-dup/high-sim candidate generation; use
    * SQ8/IVF when the ranking must hold in the bulk.
    *
    * Scale shape: the candidate scan runs in r-dim space (map-side
    * projection, broadcast query set — same whitelisted shape as the
    * brute-force baseline); the full-dim vectors are touched only for
    * the queries×cand candidate rows, joined back via a broadcast of
    * that tiny candidate list. At 100 TB the projections are a stored
    * column and the full-dim re-read is the candidate-only scan.
    */
  def jlRerankTopK(df: DataFrame, idCol: String, embCol: String,
      queryPred: Column => Column, k: Int, dim: Int = 64, r: Int = 16,
      cand: Int = 32): DataFrame = {
    val base = prepared(df, idCol, embCol)
    val proj = base.select(col("vec_id"),
      jlProject(col("e"), dim, r).as("pe"))
      .withColumn("pnrm", norm(col("pe")))
    val qp = proj.filter(queryPred(col("vec_id")))
      .select(col("vec_id").as("qid"), col("pe").as("qpe"),
        col("pnrm").as("qpnrm"))
    val wc = Window.partitionBy("qid")
      .orderBy(col("pcos").desc, col("nn_id").asc)
    val candidates = proj.crossJoin(broadcast(qp))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        cosine(col("pe"), col("qpe"), col("pnrm"), col("qpnrm")).as("pcos"))
      .withColumn("rank_p", row_number().over(wc))
      .filter(col("rank_p") <= cand)
      .select("qid", "nn_id")
    val qf = base.filter(queryPred(col("vec_id")))
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qnrm"))
    val wr = Window.partitionBy("qid")
      .orderBy(col("cos_sim_raw").desc, col("nn_id").asc)
    base.select(col("vec_id").as("nn_id"), col("e"), col("nrm"))
      .join(broadcast(candidates), Seq("nn_id"))
      .join(broadcast(qf), Seq("qid"))
      .select(col("qid"), col("nn_id"),
        cosine(col("e"), col("qe"), col("nrm"), col("qnrm")).as("cos_sim_raw"))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nn_id"),
        Parity.roundHalfUp(col("cos_sim_raw"), 6).as("cos_sim"), col("rank"))
  }

  /** L47 — int8 SCALAR quantization (faiss SQ8): per-dim min/max
    * train, 8-bit linear codes, asymmetric cosine (full-precision
    * query against the dequantized corpus). The standard 4× memory
    * cut between full precision and PQ's 32× — at 100 TB the corpus
    * codes are what sit in RAM next to the IVF lists.
    *
    * Scale shape: training is ONE partial-aggregated pass — the
    * posexplode collapses map-side to ≤dim rows per partition before
    * the dim-keyed shuffle moves anything (64 rows per map task, not
    * N·dim). The (dim × 2 doubles) stats table is a bounded model
    * artifact collected to the driver and re-broadcast as literals —
    * the IVF-centroid precedent — so encoding is map-side-only; the
    * query scan composes with the IVF list pruning at scale exactly
    * like [[ivfPqTopK]]'s ADC stage.
    *
    * Determinism: codes are floor((x−mn)/(mx−mn)·255 + 0.5) clamped
    * to [0,255] in IEEE double, mirrored token-for-token in the
    * DuckDB oracle — the code array and every downstream cosine are
    * bit-equal across engines (the fixed-point convention).
    */
  def sq8Stats(df: DataFrame, idCol: String, embCol: String)
      : (Array[Double], Array[Double]) = {
    val base = prepared(df, idCol, embCol)
    val rows = base
      .select(posexplode(col("e")).as(Seq("d", "v")))
      .groupBy("d").agg(min("v").as("mn"), max("v").as("mx"))
      .orderBy("d").collect()
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** Dequantized-corpus column math shared by the operator and specs:
    * codes (int 0..255) and the dequantized double vector from
    * per-dim (mn, mx) literals. Degenerate dims (mx == mn) encode 0
    * and dequantize to mn.
    */
  def sq8Dequantize(e: Column, mn: Array[Double], mx: Array[Double]): Column = {
    val mnl = typedLit(mn)
    val mxl = typedLit(mx)
    transform(e, (x, i) => {
      val lo = element_at(mnl, i + 1)
      val hi = element_at(mxl, i + 1)
      val span = hi - lo
      val code = least(lit(255.0), greatest(lit(0.0),
        floor((x - lo) / span * lit(255.0) + lit(0.5)).cast("double")))
      when(span > lit(0.0), lo + code * span / lit(255.0)).otherwise(lo)
    })
  }

  /** SQ8 asymmetric top-k: exact-mirror gate output
    * (qid, nn_id, cos_sim 6dp, rank).
    */
  def sq8TopK(df: DataFrame, idCol: String, embCol: String,
      queryPred: Column => Column, k: Int): DataFrame = {
    val (mn, mx) = sq8Stats(df, idCol, embCol)
    val base = prepared(df, idCol, embCol)
    val corpus = base
      .select(col("vec_id"), sq8Dequantize(col("e"), mn, mx).as("dq"))
      .withColumn("dqnrm", norm(col("dq")))
    val q = base.filter(queryPred(col("vec_id")))
      .select(col("vec_id").as("qid"), col("e").as("qe"), col("nrm").as("qnrm"))
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim_raw").desc, col("nn_id").asc)
    corpus.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nn_id"),
        cosine(col("dq"), col("qe"), col("dqnrm"), col("qnrm")).as("cos_sim_raw"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nn_id"),
        Parity.roundHalfUp(col("cos_sim_raw"), 6).as("cos_sim"), col("rank"))
  }
}
