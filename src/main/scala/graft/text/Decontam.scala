package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** Eval-set decontamination — the n-gram-overlap scrub run before
  * training (the GPT-3 13-gram rule): a training document is
  * contaminated when it shares ANY word n-gram with a held-out
  * benchmark/eval document.
  *
  * Scale shape: the eval set is SMALL by construction (benchmarks are
  * thousands of docs, the corpus is billions), so its distinct n-gram
  * set is collected into a broadcast hash join — the training corpus
  * is scanned exactly once, map-side, and only matching (doc, ngram)
  * rows reach the per-doc count shuffle (≈ contamination volume, not
  * corpus volume). No corpus self-join anywhere.
  */
object Decontam {

  /** Per-doc distinct word n-grams via the codegen'd
    * [[graft.expressions.WordShingles]] kernel (lowercase, `\s+`
    * split, first-occurrence dedup).
    */
  private def ngrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol),
      explode(TextAnalysis.shingles(col(textCol), n)).as("ng"))

  /** Label every NON-eval doc with its eval-overlap count.
    *
    * @param evalPred selects the held-out eval docs by id; everything
    *                 else is the training side.
    * @param n        shingle width (8 here ≈ the published 13-gram /
    *                 8-gram decontamination range).
    */
  def flagOverlap(df: DataFrame, idCol: String, textCol: String,
      evalPred: Column => Column, n: Int): DataFrame = {
    val ng = ngrams(df, idCol, textCol, n)
    val evalNg = ng.filter(evalPred(col(idCol))).select("ng").distinct()
    val hits = ng.filter(!evalPred(col(idCol)))
      .join(broadcast(evalNg), Seq("ng"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap")) // shingles are per-doc distinct
    df.filter(!evalPred(col(idCol)))
      .select(col(idCol))
      // hits' row count tracks the contamination volume — data-dependent
      // and unbounded (boilerplate-heavy corpora contaminate millions of
      // docs), so unlike the eval-set broadcast above this join must
      // shuffle on the id key; AQE still downgrades it to broadcast at
      // runtime when the measured size is actually small.
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        (coalesce(col("n_overlap"), lit(0L)) > 0L).as("contaminated"))
  }

  /** The stored half of the incremental audit: the eval side's
    * distinct gram INDEX (one "ng" column) — built once per eval-set
    * snapshot, merged ∝ batch as eval sets grow.
    */
  def gramIndex(evalDocs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    ngrams(evalDocs, idCol, textCol, n).select("ng").distinct()

  /** Probe `train` against a stored gram index: (id, n_overlap) for
    * EVERY train doc (zero when clean) — [[flagOverlap]]'s hit side
    * over an index that arrives as data instead of being rebuilt.
    */
  def probeCounts(train: DataFrame, grams: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val hits = ngrams(train, idCol, textCol, n)
      .join(broadcast(grams), Seq("ng"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    train.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
  }

  /** INCREMENTAL decontamination — the maintenance moment both sides
    * of the audit hit in production: NEW EVAL DOCS extend the stored
    * gram index (a benchmark refresh) and NEW TRAINING DOCS arrive,
    * and neither history side is recomputed:
    *
    *   - the index merge keeps only the TRULY new grams
    *     (batch grams − stored grams, one anti-join on the small eval
    *     side), so the stored index is never re-derived;
    *   - the HISTORY training docs' counts update by probing against
    *     ONLY those new grams — correct because a doc's overlap count
    *     is `|docGrams ∩ evalGrams|` and the old/new gram sets are
    *     DISJOINT by construction, so counts ADD (the semilattice
    *     argument the overlap-sketch merge uses, here exact) — one
    *     corpus pass against a batch-sized broadcast instead of a
    *     re-probe of the full index;
    *   - the arriving training batch probes the merged index once
    *     (∝ batch scan).
    *
    * Output = (id, n_overlap, contaminated) for history ∪ batch
    * training docs, IDENTICAL to from-scratch [[flagOverlap]] over
    * the union corpus — the gate's oracle is exactly the from-scratch
    * derivation.
    */
  def flagOverlapIncremental(
      storedGrams: DataFrame, storedCounts: DataFrame,
      oldTrain: DataFrame, newEval: DataFrame, newTrain: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    // materialized once: the anti-join against a large stored index
    // is the expensive step, and both the history delta broadcast and
    // the merged index reuse it (bounded by the eval batch's grams)
    val newGrams = gramIndex(newEval, idCol, textCol, n)
      .join(storedGrams, Seq("ng"), "left_anti").localCheckpoint()
    val mergedIdx = storedGrams.unionByName(newGrams)
    val deltaOld = ngrams(oldTrain, idCol, textCol, n)
      .join(broadcast(newGrams), Seq("ng"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("__delta"))
    // the history doc set is derived from oldTrain, NOT storedCounts:
    // the two inputs are redundant (storedCounts must cover oldTrain's
    // ids), and driving the output from storedCounts would silently
    // DROP any doc missing a stored row — deriving from oldTrain makes
    // such a gap surface as a zero base count instead of a lost doc
    val oldOut = oldTrain.select(col(idCol))
      .join(storedCounts, Seq(idCol), "left")
      .join(deltaOld, Seq(idCol), "left")
      .select(col(idCol),
        (coalesce(col("n_overlap"), lit(0L)) +
          coalesce(col("__delta"), lit(0L)))
          .as("n_overlap"))
    oldOut.unionByName(probeCounts(newTrain, mergedIdx, idCol, textCol, n))
      .withColumn("contaminated", col("n_overlap") > 0L)
  }

  /** FUZZY decontamination — per-(train, eval) n-gram JACCARD instead
    * of any-overlap: a training doc is contaminated when its shingle
    * set is ≥ `theta`-similar to SOME eval doc (the near-duplicate
    * form of test-set leakage that any-single-n-gram rules either miss
    * at large n or drown in false hits at small n).
    *
    * EXACT, not sketched — and still linear in the corpus: because the
    * eval side is small by construction, its postings list
    * (eval n-grams) and its per-doc set sizes both BROADCAST; the
    * corpus is scanned once map-side, and the only shuffle is the
    * per-(train, eval) intersection count whose volume is the
    * co-occurrence mass (≈ contamination volume), never a corpus
    * self-join. The MinHash/LSH formulation is strictly worse here:
    * sketches pay a recall risk to avoid a quadratic blow-up this
    * shape never had.
    *
    * Returns every non-eval doc: (id, near_j, near_eval, contaminated)
    * with near_j the best Jaccard (rounded 6, 0.0 when no candidate),
    * near_eval the best-matching eval id (min id on ties, null when
    * none ≥ theta).
    */
  def flagNearOverlap(df: DataFrame, idCol: String, textCol: String,
      evalPred: Column => Column, n: Int, theta: Double): DataFrame = {
    val base = df.select(col(idCol),
      TextAnalysis.shingles(col(textCol), n).as("sh"))
    val sizes = base.select(col(idCol), size(col("sh")).as("sa"))
    val ng = base.select(col(idCol), explode(col("sh")).as("ng"))
    val evalNg = ng.filter(evalPred(col(idCol)))
      .select(col(idCol).as("__eval_id"), col("ng"))
    val evalSz = sizes.filter(evalPred(col(idCol)))
      .select(col(idCol).as("__eval_id"), col("sa").as("sb"))
    val co = ng.filter(!evalPred(col(idCol)))
      .join(broadcast(evalNg), Seq("ng"))
      .groupBy(col(idCol), col("__eval_id"))
      .agg(count(lit(1)).as("inter")) // shingles are per-doc distinct
    val j = co
      .join(broadcast(evalSz), Seq("__eval_id"))
      .join(sizes, Seq(idCol))
      .withColumn("jaccard", Parity.roundHalfUp(
        col("inter").cast("double") /
          (col("sa") + col("sb") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= theta)
    // best match per train doc: max jaccard, ties to the SMALLEST eval
    // id — max(struct(j, -id)) keeps it a partial aggregation (no
    // per-doc window sort; the keep-best-per-cluster pattern)
    val best = j.groupBy(col(idCol))
      .agg(max(struct(col("jaccard"), (-col("__eval_id")).as("neg"))).as("w"))
      .select(col(idCol), col("w.jaccard").as("near_j"),
        (-col("w.neg")).as("near_eval"))
    df.filter(!evalPred(col(idCol))).select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("near_j"), lit(0.0)).as("near_j"),
        col("near_eval"),
        col("near_eval").isNotNull.as("contaminated"))
  }

  /** L55 — n-gram novelty vs a REFERENCE corpus: for each batch doc,
    * the fraction of its distinct word n-grams unseen anywhere in the
    * reference — the "does this crawl dump add anything" curation
    * signal (prefer-novel sampling, dump triage), the inverse question
    * of [[flagOverlap]].
    *
    * Scale shape is the inverse too: [[flagOverlap]]'s eval set is
    * small and broadcasts; here the reference is the 100 TB training
    * mix, so its DISTINCT gram table is a stored artifact (written
    * once per corpus snapshot, bucketed by gram — the L40 layout) and
    * the batch side equi-joins on gram with one batch-sized shuffle.
    * The reference side is already distinct, so a corpus-boilerplate
    * gram matches each batch occurrence exactly once — no candidate
    * blowup, no df cap needed — and the per-doc counts partial-agg
    * map-side. A doc too short to have any n-gram is maximally novel
    * by convention (novelty = 1.0, n_grams = 0).
    */
  def noveltyScore(batch: DataFrame, ref: DataFrame, idCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    val bg = batch.select(col(idCol).as("doc_id"),
      explode_outer(TextAnalysis.shingles(col(textCol), n)).as("g"))
    val rg = ref
      .select(explode(TextAnalysis.shingles(col(textCol), n)).as("g"))
      .distinct().withColumn("seen", lit(true))
    bg.join(rg, Seq("g"), "left")
      .groupBy("doc_id")
      .agg(count(col("g")).as("n_grams"), count(col("seen")).as("n_seen"))
      .select(col("doc_id"), col("n_grams"), col("n_seen"),
        Parity.roundHalfUp(
          when(col("n_grams") > 0,
            lit(1.0) - col("n_seen").cast("double") / col("n_grams"))
            .otherwise(lit(1.0)), 6).as("novelty"))
  }
}
