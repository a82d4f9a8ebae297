package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.functions.Parity
import graft.similarity.Similarity
import graft.text.TextAnalysis

/** Training-data pipeline operators: dedup family, similarity search,
  * text analysis — over the `documents` / `embeddings` tables.
  *
  * The MinHash-LSH query shares its oracle with the exact all-pairs
  * Jaccard query ON PURPOSE: with 16 hashes in 8 bands of 2, the
  * probability of missing a planted near-dup (j ≥ 0.9) is
  * (1-j²)^8 ≈ 2e-6, and the exact-Jaccard verify step removes all
  * false candidates — so LSH output == exact output, and the driver's
  * hash compare doubles as a recall proof.
  */
object DataOpsQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: one hash-shuffle on the content fingerprint.
    "q_d_exact_dedup" -> ((s, dir) =>
      Dedup.exactDuplicates(docs(s, dir), "doc_id", "text").orderBy("fp")),

    // Incremental snapshot dedup: the doc_id % 3 == 0 slice plays the
    // new crawl batch, the rest the historical index; the corpus's
    // natural exact dups straddle the split, so both in_history and
    // batch_dup fire on real data. The operator's contract requires
    // the index unique by fp (append-only keep-rows guarantee it in
    // production); this fixture fabricates the index from a raw slice,
    // so the distinct() here is INDEX CONSTRUCTION — a one-time build
    // cost, not the per-ingest full-history pass the operator forbids.
    "q_d_incremental_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      Dedup.incrementalDedup(
        d.filter(col("doc_id") % 3 === 0),
        d.filter(col("doc_id") % 3 =!= 0)
          .select(md5(col("text")).as("fp")).distinct(),
        "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Bloom-prefiltered incremental dedup: same fixture and same
    // oracle as q_d_incremental_dedup — the bloom pre-filter must be
    // invisible in the output (negatives are guaranteed misses,
    // positives are exact-join verified). expectedItems is the index
    // cardinality the append-only protocol tracks; the fixture passes
    // a round bound.
    "q_d_incremental_bloom" -> ((s, dir) => {
      val d = docs(s, dir)
      val hist = d.filter(col("doc_id") % 3 =!= 0)
        .select(md5(col("text")).as("fp")).distinct()
      val bloom = Dedup.fpBloom(hist, expectedItems = 4096, fpp = 0.03)
      Dedup.incrementalDedupBloom(
        d.filter(col("doc_id") % 3 === 0), hist, "doc_id", "text", bloom)
        .orderBy("doc_id")
    }),

    // Corpus-level frequent-phrase mining (boilerplate detection):
    // word bigrams at 1500 ppm support — exact counts via the
    // two-pass Misra-Gries candidate sketch (HeavyHitters scaladoc).
    "q_t_phrase_hh" -> ((s, dir) =>
      graft.operators.HeavyHitters.frequentPhrases(
        docs(s, dir), "text", n = 2, supportPpm = 1500L)
        .orderBy("item")),

    // Exact all-pairs n-gram Jaccard near-dup baseline (quadratic —
    // the correctness oracle for the LSH path).
    "q_d_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", 0.5)
        .orderBy("ida", "idb")),

    // MinHash+LSH near-dup pairs (linear scale path; see scaladoc).
    "q_d_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(docs(s, dir), "doc_id", "text",
        threshold = 0.5, numHashes = 16, rowsPerBand = 2)
        .orderBy("ida", "idb")),

    // LSH banding S-curve audit: per true-Jaccard bucket, the
    // empirical candidate rate of the RAW banding stage next to the
    // analytic 1−(1−s^r)^b curve at the bucket edges — the tuning
    // report for (numHashes, rowsPerBand). This is the first gate
    // whose oracle mirrors the minhash signatures, band keys, and
    // bucket join DIRECTLY (q_d_minhash_lsh's verification stage
    // makes banding errors invisible as long as recall holds).
    "q_d_lsh_curve" -> ((s, dir) =>
      Dedup.lshCurveAudit(docs(s, dir), "doc_id", "text",
        numHashes = 16, rowsPerBand = 2)
        .orderBy("bin")),

    // C4-style LINE dedup. The corpus has no multi-line docs, so the
    // fixture composes overlapping "pages" (page i = texts of docs i,
    // i+1, i+2 joined by \n — every text recurs in up to 3 pages) on
    // both sides; the operator then drops repeated lines globally,
    // keeping the (page, pos)-first occurrence, and reassembles pages.
    "q_d_line_dedup" -> ((s, dir) => {
      val d = docs(s, dir)
      val pages = d.select(col("doc_id").as("page_id"), col("text").as("t0"))
        .join(d.select((col("doc_id") - 1).as("page_id"), col("text").as("t1")),
          Seq("page_id"), "left")
        .join(d.select((col("doc_id") - 2).as("page_id"), col("text").as("t2")),
          Seq("page_id"), "left")
        .select(col("page_id"),
          concat_ws("\n", col("t0"), col("t1"), col("t2")).as("page"))
      Dedup.lineDedup(pages, "page_id", "page").orderBy("page_id")
    }),

    // SimHash fingerprint per document.
    "q_d_simhash" -> ((s, dir) =>
      Dedup.withSimhash(docs(s, dir), "doc_id", "text").orderBy("doc_id")),

    // SimHash near-dup pairs via byte-banding + hamming verify.
    "q_d_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text", maxDist = 3)
        .orderBy("ida", "idb")),

    // L61 — semantic CONFIRMATION of lexical dedup candidates: the
    // two-stage production pattern (cheap banded SimHash candidates →
    // embedding-cosine verify, here with the TRAINED doc vectors) that
    // kills the near-miss false positives word-level hashing admits.
    // At sf0.01 the candidate cosines spread 0.68-0.99 (median 0.94),
    // so θ=0.95 genuinely discriminates; the oracle recomputes both
    // stages from the simhash CTE + the artifact VALUES list. Scale
    // shape: candidates ∝ banding output; the verify is two hash joins
    // on the pair endpoints + a map-side 16-dim cosine — never a pass
    // over non-candidate pairs.
    "q_d_semantic_confirm" -> ((s, dir) => {
      val pairs = Dedup.simhashPairs(docs(s, dir), "doc_id", "text",
        maxDist = 3)
      val vecs = graft.text.WordEmbedding
        .embed(s, docs(s, dir), "doc_id", "text").toDF()
        .filter(col("nHit") > 0 && exists(col("emb"), x => x =!= 0L))
        .select(col("docId"),
          transform(col("emb"), x => x.cast("double")).as("e"))
        .withColumn("nrm", Similarity.norm(col("e")))
      val va = vecs.select(col("docId").as("ida"), col("e").as("ea"),
        col("nrm").as("na"))
      val vb = vecs.select(col("docId").as("idb"), col("e").as("eb"),
        col("nrm").as("nb"))
      val cosRaw = Similarity.cosine(col("ea"), col("eb"), col("na"), col("nb"))
      pairs.join(va, "ida").join(vb, "idb")
        .select(col("ida"), col("idb"),
          col("hamming").cast("integer").as("hamming"),
          Parity.roundHalfUp(cosRaw, 6).as("cos_sim"),
          (cosRaw >= 0.95).as("confirmed"))
        .orderBy("ida", "idb")
    }),

    // F14: MMR keyphrase selection (greedy maximal-marginal-relevance
    // top-5, α=0.65, pool 50 — reference api/keyphrases.py:166-188)
    // per label group of the embeddings table; the doc vector is the
    // group's min-vec_id row (deterministic stand-in for the KBIR
    // encoder the sandbox can't run). Oracle = the same greedy unrolled
    // as 5 chained argmax CTEs.
    "q_f14_mmr_keyphrases" -> ((s, dir) =>
      Similarity.mmrKeyphrases(embs(s, dir), "vec_id", "embedding",
        "label", k = 5, alpha = 0.65, poolCap = 50)
        .orderBy("label", "rank")),

    // The ENCODER slot retired the F12 way (round-9 stretch): each
    // document pooled into the TRAINED word-embedding space — a real
    // committed PPMI+SVD artifact (embedding-svd-v1.tsv, trained by
    // graft.TrainEmbedding) loaded once per partition behind the same
    // mapPartitions slot as ModelSentiment. Sum pooling keeps the
    // vector an EXACT fixed-point integer (cosine is scale-invariant,
    // so sum ≡ mean for every ranking consumer), making this gate
    // hash-exact against the artifact interpolated into the oracle as
    // a VALUES list.
    "q_t_embed_doc" -> ((s, dir) => {
      val dim = graft.text.WordEmbedding.loadArtifact()._1
      graft.text.WordEmbedding.embed(s, docs(s, dir), "doc_id", "text")
        .toDF()
        .select(col("docId").as("doc_id") +: col("nHit").as("n_hit") +:
          (0 until dim).map(i => col("emb")(i).as(s"e${i + 1}")): _*)
        .orderBy("doc_id")
    }),

    // Embedding-cosine search FED BY the trained artifact: exact
    // brute-force top-3 over the pooled document vectors (the
    // verification harness; the scale path over the same vectors is
    // the existing LSH/IVF family, which consumes any vector column).
    "q_t_embed_nn" -> ((s, dir) => {
      val vecs = graft.text.WordEmbedding
        .embed(s, docs(s, dir), "doc_id", "text").toDF()
        .filter(col("nHit") > 0 && exists(col("emb"), x => x =!= 0L))
        .select(col("docId").as("doc_id"),
          transform(col("emb"), x => x.cast("double")).as("emb"))
      Similarity.bruteForceTopK(vecs, "doc_id", "emb",
        id => id % 50 === 0, k = 3)
        .orderBy("qid", "rank")
    }),

    // L59 — LEARNED BPE token counts (the F12 committed-artifact
    // pattern, third instance): real byte-pair merges trained from
    // the corpus (graft.TrainBpe), applied by the standard
    // lowest-rank-first loop inside a per-partition memoized slot.
    // The oracle joins the artifact's train-vocab subtoken counts
    // (VALUES list) — BpeSpec proves the live encoder reproduces
    // every stored count, so the join IS the encoder on trained
    // vocabulary; OOV occurrences surface as n_oov.
    "q_t_bpe_tokens" -> ((s, dir) =>
      graft.text.BpeTokenizer.tokenCounts(s, docs(s, dir), "doc_id", "text")
        .toDF()
        .select(col("docId").as("doc_id"), col("nWords").as("n_words"),
          col("nBpeKnown").as("n_bpe"), col("nOov").as("n_oov"))
        .orderBy("doc_id")),

    // L59b: Unigram-LM (SentencePiece-style) token counts — the same
    // committed-artifact slot as BPE, with Viterbi segmentation under
    // integer-scaled learned log-probs instead of ranked merges. Same
    // oracle convention: the artifact's train-vocab piece counts join
    // as a VALUES list; UnigramSpec proves table == live Viterbi.
    "q_t_unigram_tokens" -> ((s, dir) =>
      graft.text.UnigramTokenizer
        .tokenCounts(s, docs(s, dir), "doc_id", "text").toDF()
        .select(col("docId").as("doc_id"), col("nWords").as("n_words"),
          col("nUniKnown").as("n_uni"), col("nOov").as("n_oov"))
        .orderBy("doc_id")),

    // L72 × L59b: the two learned tokenizers COMPARED per detected
    // language — fertility (subtokens per known word) side by side,
    // the audit that picks a vocabulary per language before a
    // training run. Both artifact joins are map-side; one combining
    // shuffle to ≤|langs| rows.
    "q_t_tokenizer_fertility" -> ((s, dir) => {
      val bpe = graft.text.BpeTokenizer
        .tokenCounts(s, docs(s, dir), "doc_id", "text").toDF()
        .select(col("docId").as("doc_id"),
          col("nWords").cast("long").as("w"),
          col("nBpeKnown").cast("long").as("b"))
      val uni = graft.text.UnigramTokenizer
        .tokenCounts(s, docs(s, dir), "doc_id", "text").toDF()
        .select(col("docId").as("doc_id"),
          col("nUniKnown").cast("long").as("u"),
          col("nOov").cast("long").as("o"))
      val lid = docs(s, dir).select(col("doc_id"),
        TextAnalysis.langId(col("text")).getField("lang").as("lang"))
      bpe.join(uni, "doc_id").join(lid, "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("w").as("n_words"),
          sum("b").as("n_bpe"), sum("u").as("n_uni"), sum("o").as("n_oov"))
        .select(col("lang"), col("n_docs"), col("n_words"),
          col("n_bpe"), col("n_uni"), col("n_oov"),
          when(col("n_words") - col("n_oov") > 0,
            graft.functions.Parity.roundHalfUp(
              col("n_bpe").cast("double") /
                (col("n_words") - col("n_oov")).cast("double"), 6))
            .as("fertility_bpe"),
          when(col("n_words") - col("n_oov") > 0,
            graft.functions.Parity.roundHalfUp(
              col("n_uni").cast("double") /
                (col("n_words") - col("n_oov")).cast("double"), 6))
            .as("fertility_uni"))
        .orderBy("lang")
    }),

    // Tokenizer FERTILITY audit per detected language (L59 × L10):
    // the multilingual-tokenizer health check — BPE subtokens per
    // known word and the OOV rate, rolled up by the langid kernel's
    // verdict. A language whose fertility spikes (or whose words the
    // merges never cover) is one the tokenizer serves poorly, the
    // signal that drives vocab rebalancing before a training run.
    // Map-side counting + one doc-keyed join + one combining shuffle
    // to ≤|langs| rows; ratios are single divisions of exact longs.
    "q_t_bpe_fertility" -> ((s, dir) => {
      val counts = graft.text.BpeTokenizer
        .tokenCounts(s, docs(s, dir), "doc_id", "text").toDF()
        .select(col("docId").as("doc_id"),
          col("nWords").cast("long").as("w"),
          col("nBpeKnown").cast("long").as("b"),
          col("nOov").cast("long").as("o"))
      val lid = docs(s, dir).select(col("doc_id"),
        TextAnalysis.langId(col("text")).getField("lang").as("lang"))
      counts.join(lid, "doc_id")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("w").as("n_words"),
          sum("b").as("n_bpe"), sum("o").as("n_oov"))
        .select(col("lang"), col("n_docs"), col("n_words"),
          col("n_bpe"), col("n_oov"),
          when(col("n_words") - col("n_oov") > 0,
            graft.functions.Parity.roundHalfUp(
              col("n_bpe").cast("double") /
                (col("n_words") - col("n_oov")).cast("double"), 6))
            .as("fertility"),
          when(col("n_words") > 0,
            graft.functions.Parity.roundHalfUp(
              col("n_oov").cast("double") /
                col("n_words").cast("double"), 6)).as("oov_rate"))
        .orderBy("lang")
    }),

    // F14's MMR selection over the TRAINED document vectors, grouped
    // by language: the same greedy algebra as q_f14_mmr_keyphrases
    // (shared operator AND shared oracle CTE chain), with the learned
    // artifact replacing the embeddings-table stand-in as the encoder.
    "q_f14_mmr_trained" -> ((s, dir) => {
      val langIdx = when(col("lang") === "de", 0)
        .when(col("lang") === "en", 1).when(col("lang") === "es", 2)
        .when(col("lang") === "fr", 3).when(col("lang") === "zh", 4)
        .otherwise(9)
      val groups = docs(s, dir).select(col("doc_id"), langIdx.as("grp"))
      val vecs = graft.text.WordEmbedding
        .embed(s, docs(s, dir), "doc_id", "text").toDF()
        .filter(col("nHit") > 0 && exists(col("emb"), x => x =!= 0L))
        .select(col("docId").as("doc_id"),
          transform(col("emb"), x => x.cast("double")).as("emb"))
        .join(groups, "doc_id")
      Similarity.mmrKeyphrases(vecs, "doc_id", "emb", "grp",
        k = 5, alpha = 0.65, poolCap = 50)
        .orderBy("label", "rank")
    }),

    // Brute-force cosine top-k ANN for a broadcast query subset.
    "q_s_ann_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(embs(s, dir), "vec_id", "embedding",
        id => id % 50 === 0, k = 5).orderBy("qid", "rank")),

    // Embedding-cosine near-dup detector for EVERY vector — the
    // SCALE path (multi-table sign-LSH buckets, one shuffle, no cross
    // join). The oracle rebuilds the identical md5-derived hyperplanes
    // in SQL, so the hash compare proves the bucketing end to end;
    // recall vs the exact cross-join ground truth is proven on a
    // planted-near-dup corpus in AnnSpec (>=0.9 gate). The testdata
    // embeddings are uniform random (max pairwise cosine ≈0.51, no
    // planted pairs), so candidate-equality with brute force is
    // information-theoretically unavailable here — bucketed semantics
    // ARE the contract, as with q_d_minhash_lsh.
    "q_s_embedding_nn" -> ((s, dir) =>
      Similarity.nearDupLsh(embs(s, dir), "vec_id", "embedding",
        dupThreshold = 0.9, dim = 64, planes = 8, tables = 4)
        .orderBy("vec_id")),

    // IVF-PQ: coarse IVF routing + product-quantized ADC scoring —
    // the compressed-scan composition a 10⁹-vector corpus runs.
    // Corpus carried as m=8 codes (4-bit class), query builds one
    // 8×16 ADC table, each candidate costs 8 lookups. The oracle
    // re-derives codebooks, codes, probes, tables and the ranked ADC
    // distances entirely in SQL.
    "q_s_ivf_pq" -> ((s, dir) =>
      Similarity.ivfPqTopK(embs(s, dir), "vec_id", "embedding",
        id => id % 50 === 0, k = 5)
        .orderBy("qid", "rank")),

    // IVF-SQ8 (L50): the production ANN config — IVF list pruning
    // bounds WHICH vectors are scanned, SQ8 bounds what each costs;
    // asymmetric distance, full-precision query vs dequantized codes.
    // Every stage deterministic → exact-mirror oracle.
    "q_s_ivf_sq8" -> ((s, dir) =>
      Similarity.ivfSq8TopK(embs(s, dir), "vec_id", "embedding",
        id => id % 50 === 0, k = 5)
        .orderBy("qid", "rank")),

    // JL random projection + exact re-rank (L48): md5-seeded ±1
    // projection to 16 dims (map-side, zero shuffle), top-32
    // candidates by projected cosine, exact-cosine re-rank to top-5.
    // Deterministic end to end → the oracle mirrors the WHOLE
    // pipeline including candidate selection.
    "q_s_jl_rerank" -> ((s, dir) =>
      Similarity.jlRerankTopK(embs(s, dir), "vec_id", "embedding",
        id => id % 50 === 0, k = 5, dim = 64, r = 16, cand = 32)
        .orderBy("qid", "rank")),

    // SQ8 scalar quantization (L47): per-dim min/max train (one
    // partial-agg pass), 8-bit linear codes, asymmetric cosine —
    // full-precision query against the dequantized corpus. Exact
    // mirror oracle (the code math is deterministic double
    // arithmetic), so the hash compare proves train, encode,
    // dequantize and every distance.
    "q_s_sq8_topk" -> ((s, dir) =>
      Similarity.sq8TopK(embs(s, dir), "vec_id", "embedding",
        id => id % 50 === 0, k = 5)
        .orderBy("qid", "rank")),

    // IVF TRAINING: 2 spherical-Lloyd rounds from the md5-seeded init
    // (assign map-side on literal centroids; recompute = partial-agg
    // groupBy over nlist×dim cells; 9-dp centroid rounding each round
    // keeps the distributed sum and the oracle's SQL agg bit-equal
    // downstream). Output = the trained partition map: list id, list
    // population, cosine-to-centroid. The oracle unrolls both rounds.
    "q_s_ivf_train" -> ((s, dir) =>
      Similarity.ivfTrainAssignments(embs(s, dir), "vec_id", "embedding",
        nlist = 16, iters = 2)
        .orderBy("vec_id")),

    // SemDeDup: same trained quantizer as q_s_ivf_train (the oracle
    // reuses the unrolled Lloyd rounds verbatim), then within-cluster
    // cosine pruning — drop any vector with a lower-id cluster-mate at
    // cos >= 0.35. One list_id self-join shuffle; pairwise cost is
    // per-cluster, bounded by growing nlist with the corpus.
    "q_s_semdedup" -> ((s, dir) =>
      Similarity.semDedup(embs(s, dir), "vec_id", "embedding",
        nlist = 16, iters = 2, tau = 0.35)
        .orderBy("vec_id")),

    // Embedding-space coverage: per trained-quantizer cell the corpus
    // share, plus Shannon entropy / effective-cluster count / max-mean
    // occupancy in every row — the semantic-diversity audit for
    // corpora without trustworthy source tags. Entropy follows the
    // fixed-point ln convention so the total is an exact integer sum.
    "q_s_cluster_entropy" -> ((s, dir) =>
      Similarity.clusterEntropy(embs(s, dir), "vec_id", "embedding",
        nlist = 16, iters = 2)
        .orderBy("list_id")),

    // Sign-LSH bucketed ANN with Hamming-1 multi-probe (scale path);
    // full DuckDB mirror oracle — zero rows-only checks left.
    "q_s_ann_lsh" -> ((s, dir) =>
      Similarity.lshTopK(embs(s, dir), "vec_id", "embedding",
        id => id % 50 === 0, k = 5, dim = 64, planes = 8, tables = 4)
        .orderBy("qid", "rank")),

    // IVF ANN (scale path #2): corpus assigned map-side to its nearest
    // md5-seeded centroid list, queries probe their 4 nearest of 16
    // lists via a broadcast join — no shuffle of the corpus, candidates
    // ≈ nprobe/nlist of it. The oracle re-derives the identical
    // centroid set, assignment, and probes in SQL, so the hash compare
    // proves the whole inverted-file machinery.
    "q_s_ann_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(embs(s, dir), "vec_id", "embedding",
        id => id % 50 === 0, k = 5, nlist = 16, nprobe = 4)
        .orderBy("qid", "rank")),

    // L58 incremental IVF maintenance: centroids are the stored
    // quantizer from the history snapshot (vec_id % 10 <> 0); the
    // batch slice is assigned map-side against those frozen centroids
    // and appended to the lists; the query set (% 50 = 0, all batch
    // members) searches history ∪ batch through the standard probe
    // join. Cost ∝ batch — no retrain, no history reshuffle.
    "q_s_ivf_incremental" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.ivfTopKIncremental(
        e.filter(col("vec_id") % 10 =!= 0),
        e.filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", id => id % 50 === 0,
        k = 5, nlist = 16, nprobe = 4)
        .orderBy("qid", "rank")
    }),

    // L58's retrain rule EXECUTABLE, no-drift arm: the standard
    // ingest slice leaves list occupancy inside the 2× trigger, so
    // ivfMaintain must KEEP the stored quantizer — the search is
    // identical to q_s_ivf_incremental (DataOpsSpec asserts the
    // row-level identity), and the trigger arithmetic (both
    // occupancy ratios + the decision) rides on every row so the
    // oracle proves the rule evaluated, not just the search it chose.
    "q_s_ivf_maintain" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.ivfMaintain(
        e.filter(col("vec_id") % 10 =!= 0),
        e.filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", id => id % 50 === 0,
        k = 5, nlist = 16, nprobe = 4)
        .orderBy("qid", "rank")
    }),

    // L58 drift arm: half the corpus arrives concentrated near one
    // direction (abs + 1 shifts every vector into the positive
    // orthant), occupancy max/mean blows past 2× the post-train
    // value (≈8 vs a ≈1.2–1.7 baseline at every SF), and the rule
    // must RE-INITIALIZE the quantizer from a sample of the union —
    // the oracle re-derives the occupancy counts, the trigger
    // comparison, AND the re-balanced search, branching on its own
    // computed flag.
    "q_s_ivf_maintain_drift" -> ((s, dir) => {
      val e = embs(s, dir)
      Similarity.ivfMaintain(
        e.filter(col("vec_id") % 2 =!= 0),
        e.filter(col("vec_id") % 2 === 0).withColumn("embedding",
          transform(col("embedding"), x => abs(x) + lit(1.0))),
        "vec_id", "embedding", id => id % 50 === 0,
        k = 5, nlist = 16, nprobe = 4)
        .orderBy("qid", "rank")
    }),

    // D7 embedding branch of semantic topic merge (reference
    // api/services/topic_analyzer.py:311-353: merge topics whose
    // entity-set embedding cosine ≥ threshold; the Jaccard branch is
    // q_d_ngram_jaccard). Topic centroid = element-wise mean of member
    // vectors; pairwise cosine runs at TOPIC granularity (topics are
    // few — the quadratic step never touches row counts), emitting
    // every pair with its merge flag at 0.80.
    "q_d7_topic_merge_embed" -> ((s, dir) => {
      val e = embs(s, dir)
        .withColumn("topic_id", col("vec_id") % 20)
        .select(col("topic_id"),
          posexplode(Similarity.asDouble(col("embedding"))).as(Seq("d", "v")))
      val cent = e.groupBy("topic_id", "d").agg(avg("v").as("m"))
        .groupBy("topic_id")
        .agg(sort_array(collect_list(struct(col("d"), col("m")))).as("dm"))
        .select(col("topic_id"),
          transform(col("dm"), x => x.getField("m")).as("cent"))
        .withColumn("nrm", Similarity.norm(col("cent")))
      val a = cent.select(col("topic_id").as("ta"), col("cent").as("ca"),
        col("nrm").as("na"))
      val b = cent.select(col("topic_id").as("tb"), col("cent").as("cb"),
        col("nrm").as("nb"))
      a.join(b, col("ta") < col("tb"))
        .select(col("ta"), col("tb"),
          graft.functions.Parity.roundHalfUp(
            Similarity.cosine(col("ca"), col("cb"), col("na"), col("nb")), 6)
            .as("cos_sim"),
          (Similarity.cosine(col("ca"), col("cb"), col("na"), col("nb")) >= 0.80)
            .as("merged"))
        .orderBy("ta", "tb")
    }),

    // L62 TextRank keywords: per-doc word co-occurrence graph →
    // weighted PageRank (4 fixed iterations, d = 0.85, fixed-point
    // neighbor sums) → top-3 by centrality. The whole graph lives
    // inside a map-side per-doc kernel — no edge table, no
    // per-iteration join, no shuffle; the oracle unrolls the same
    // iterations over the exploded pair table and matches
    // bit-for-bit.
    "q_t_textrank" -> ((s, dir) =>
      graft.text.TextRank.keywords(s, docs(s, dir), "doc_id", "text",
        k = 3, iters = 4)
        .orderBy("doc_id", "rank")),

    // L63 TextRank extractive summary: pseudo-sentence chunks (8
    // tokens — the corpus is unpunctuated), paper similarity
    // |overlap|/(ln n_i + ln n_j) quantized per edge, same PageRank
    // kernel, top-2 chunks as the summary. Shuffle-free per-doc
    // kernel; oracle unrolls identically (ln probed bit-identical
    // across engines on the chunk-length range).
    "q_t_textrank_summary" -> ((s, dir) =>
      graft.text.TextRank.summarize(s, docs(s, dir), "doc_id", "text",
        chunkSize = 8, k = 2, iters = 4)
        .orderBy("doc_id", "rank")),

    // Language ID (stopword heuristic).
    "q_t_langid" -> ((s, dir) => {
      val lid = TextAnalysis.langId(col("text"))
      docs(s, dir).select(col("doc_id"),
        lid.getField("lang").as("lang"), lid.getField("conf").as("conf"))
        .orderBy("doc_id")
    }),

    // TRAINED language ID (L10's committed-artifact form, the sixth
    // model artifact): multiclass LR over hashed char-trigram buckets
    // (langid-lr-v1.tsv via TrainLangid — trainer featurizes through
    // the serving kernel, so they cannot drift), served beside the
    // rules stopword-argmax over the SAME planted multilingual
    // sentences (LangIdModel.plantedText — doc d speaks lang d%5,
    // tokens drawn deterministically from the shared 20-word
    // lexicons; the trainer used a DIFFERENT index stream, so every
    // gate sentence is held-out). The per-language comparison the
    // L72 audit applies to tokenizers: trained_ok vs rules_ok per
    // row — sentences that draw only content words defeat the
    // stopword argmax ('und') while the char-gram model still reads
    // the morphology. One codegen'd kernel call per row, map-side.
    "q_t_langid_trained" -> ((s, dir) => {
      import graft.text.LangIdModel
      val planted = docs(s, dir).select(col("doc_id"),
        LangIdModel.plantedText(col("doc_id")).as("text"),
        LangIdModel.plantedLang(col("doc_id")).as("lang_planted"))
      val rules = TextAnalysis.langId(col("text")).getField("lang")
      LangIdModel.classifyTrained(planted, "text")
        .select(col("doc_id"), col("lang_planted"),
          rules.as("lang_rules"),
          col("lang_trained"), col("z_best"), col("margin"),
          col("n_grams"),
          (col("lang_trained") === col("lang_planted")).as("trained_ok"),
          (rules === col("lang_planted")).as("rules_ok"))
        .orderBy("doc_id")
    }),

    // Heuristic quality score.
    "q_t_quality" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    // TextTiling semantic segmentation (L73): topic-shift boundaries
    // from block-Jaccard cohesion valleys — the seam detector that
    // lets long-document chunking cut at semantic boundaries. Whole
    // chain integer (exact Jaccard rationals at 1e-6, depth-vs-mean
    // as a cross-multiplication), map-side per-doc kernel, zero
    // shuffles.
    "q_t_text_tiling" -> ((s, dir) =>
      graft.text.TextTiling.segments(s, docs(s, dir), "doc_id", "text",
        blockTokens = 10)
        .orderBy("doc_id")),

    // Seam-aware chunking (L31 × L73): the stride windows restart at
    // every TextTiling boundary, so no chunk welds two topics. Same
    // map-side per-doc kernel, rows ∝ chunks, zero shuffles.
    "q_c_chunking_semantic" -> ((s, dir) =>
      graft.text.TextTiling.segmentedChunks(s, docs(s, dir), "doc_id",
        "text", blockTokens = 10, width = 16, stride = 12)
        .orderBy("doc_id", "seg_idx", "chunk_idx")),

    // Gopher repetition metrics: the most frequent word 2-/3-gram and
    // the fraction of characters it covers (cnt·len(gram)/len(text)) —
    // the "fraction of chars in most common n-gram" gate. One
    // codegen'd map-side pass per n; no explode/re-aggregate shuffle.
    "q_t_repetition" -> ((s, dir) => {
      def cols(n: Int, tag: String) = {
        val g = TextAnalysis.topNgram(col("text"), n)
        Seq(g.getField("gram").as(s"top$tag"),
          g.getField("cnt").cast("long").as(s"n$tag"),
          Parity.roundHalfUp(
            (g.getField("cnt") * length(g.getField("gram"))).cast("double") /
              length(col("text")).cast("double"), 6).as(s"frac$tag"))
      }
      docs(s, dir)
        .select(col("doc_id") +: (cols(2, "2") ++ cols(3, "3")): _*)
        .orderBy("doc_id")
    }),

    // Token counting: whitespace, BPE-ish regex, chars/4 estimate.
    "q_t_token_counts" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).as("n_ws"),
        TextAnalysis.tokenCountBpe(col("text")).as("n_bpe"),
        TextAnalysis.tokenEstimateChars(col("text")).as("n_est"))
        .orderBy("doc_id")),

    // Document fingerprints: whole-doc md5 + winnowing-style min-shingle.
    "q_t_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextAnalysis.docFingerprint(col("text")).as("fp"),
        TextAnalysis.minShingleFingerprint(col("text")).as("min_shingle_fp"))
        .orderBy("doc_id")),

    // L41: BPE pair counting (tokenizer-training inner loop): top-50
    // adjacent character pairs of the whitespace vocabulary, weighted
    // by word frequency — the pair explode runs over DISTINCT words
    // (see TextAnalysis.bpePairCounts scaladoc for the 100 TB shape).
    // orderBy().limit() compiles to TakeOrderedAndProject; the rank
    // window sees only the 50 survivors (the q_a8 pattern).
    "q_t_bpe_pairs" -> ((s, dir) => {
      val top = TextAnalysis.bpePairCounts(docs(s, dir), "text")
        .orderBy(col("pair_count").desc, col("pair").asc).limit(50)
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("pair_count").desc, col("pair").asc)
      top.withColumn("rn", row_number().over(w)).orderBy("rn")
    })
  )

  private val ShinglesCte =
    """tk AS (
         SELECT doc_id,
                list_filter(string_split_regex(lower(text), '\s+'),
                  x -> x <> '') AS toks
         FROM documents),
       sh AS (
         SELECT doc_id,
                CASE WHEN len(toks) >= 3
                     THEN list_distinct(list_transform(
                            range(1, len(toks) - 1),
                            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                     ELSE [] END AS sh
         FROM tk)"""

  private val JaccardPairsSql =
    s"""WITH $ShinglesCte,
        p AS (
          SELECT a.doc_id AS ida, b.doc_id AS idb,
                 floor(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                       / len(list_distinct(a.sh || b.sh)) * 1000000.0 + 0.5) / 1000000.0 AS jaccard
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE len(a.sh) > 0 AND len(b.sh) > 0)
        SELECT ida, idb, jaccard FROM p
        WHERE jaccard >= 0.5 ORDER BY ida, idb"""

  private[queries] val SimhashCte =
    """fp AS (
         SELECT doc_id,
                list_sum(list_transform(range(0, 32), b -> CASE
                  WHEN 2 * len(list_filter(hs, h -> (h >> b) & 1 = 1)) > len(hs)
                  THEN (1::BIGINT << b) ELSE 0::BIGINT END))::BIGINT AS simhash
         FROM (
           SELECT doc_id,
                  list_transform(
                    list_distinct(list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '')),
                    t -> ('0x' || substr(md5(t), 1, 8))::BIGINT) AS hs
           FROM documents))"""

  /** One unrolled spherical-Lloyd round: assignment under centroid set
    * `cin` → per-(list, dim) sum/count cells → mean, renormalize,
    * 9-dp half-up round (the Similarity.kmeansCentroids contract) →
    * `cout`; an empty list keeps its previous centroid via the LEFT
    * JOIN + coalesce. The cell sum quantizes each u-component to a
    * 1e-12 fixed-point BIGINT per row and sums exactly (DuckDB widens
    * to HUGEINT), mirroring the engine's decimal(38,0) accumulator —
    * the sum is order-free on both sides, so the downstream IEEE
    * chain (÷1e12, ÷cnt, renormalize, 9-dp round) is bit-for-bit.
    */
  private def lloydRoundCte(cin: String, a: String, cell: String,
      m: String, cout: String): String =
    s"""$a AS (
          SELECT vec_id, cid FROM (
            SELECT n.vec_id, $cin.cid,
                   row_number() OVER (PARTITION BY n.vec_id
                     ORDER BY list_dot_product(n.e, $cin.c) DESC, $cin.cid ASC) AS rn
            FROM n CROSS JOIN $cin) WHERE rn = 1),
        $cell AS (
          SELECT $a.cid, dm.d,
                 sum(CAST(floor(u.u[dm.d + 1] * 1000000000000.0 + 0.5) AS BIGINT)) AS sx,
                 count(*) AS cnt
          FROM $a JOIN u USING (vec_id), dm GROUP BY 1, 2),
        $m AS (SELECT cid, list(CAST(sx AS DOUBLE) / 1000000000000.0 / cnt ORDER BY d) AS m
               FROM $cell GROUP BY cid),
        $cout AS (
          SELECT $cin.cid,
                 coalesce(list_transform($m.m,
                   x -> floor(x / sqrt(list_dot_product($m.m, $m.m)) * 1000000000.0 + 0.5) / 1000000000.0),
                   $cin.c) AS c
          FROM $cin LEFT JOIN $m USING (cid))"""

  /** Full mirror of [[graft.similarity.Similarity.ivfMaintain]]: the
    * occupancy counts under the stored (history-initialized)
    * quantizer before and after the batch, the 2× trigger comparison,
    * a genuine SQL BRANCH on the computed flag (stored vs
    * union-re-initialized centroids), and the probe search under
    * whichever the branch picked. `nCte` supplies the (possibly
    * drifted) prepared-vector CTE ending in
    * `n(vec_id, e, nrm)`; `histCond` names the history slice.
    */
  private def ivfMaintainOracle(nCte: String, histCond: String): String =
    s"""WITH $nCte,
        cent0 AS (
          SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS cid,
                 list_transform(e, x -> x / nrm) AS c
          FROM n WHERE $histCond
          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
        rnk0 AS (
          SELECT n.vec_id, cent0.cid,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.e, cent0.c) DESC, cent0.cid ASC) AS rn
          FROM n CROSS JOIN cent0),
        occ0 AS (
          SELECT cid, count(*) AS cnt FROM rnk0
          WHERE rn = 1 AND $histCond GROUP BY cid),
        occu AS (SELECT cid, count(*) AS cnt FROM rnk0 WHERE rn = 1 GROUP BY cid),
        r0 AS (SELECT max(cnt) / (sum(cnt) / 16.0) AS v FROM occ0),
        r1 AS (SELECT max(cnt) / (sum(cnt) / 16.0) AS v FROM occu),
        flag AS (
          SELECT (SELECT v FROM r1) > 2.0 * (SELECT v FROM r0) AS retrained),
        centu AS (
          SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS cid,
                 list_transform(e, x -> x / nrm) AS c
          FROM n
          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
        cent AS (
          SELECT cid, c FROM centu WHERE (SELECT retrained FROM flag)
          UNION ALL
          SELECT cid, c FROM cent0 WHERE NOT (SELECT retrained FROM flag)),
        rnk AS (
          SELECT n.vec_id, cent.cid,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.e, cent.c) DESC, cent.cid ASC) AS rn
          FROM n CROSS JOIN cent),
        asg AS (SELECT vec_id, cid AS list_id FROM rnk WHERE rn = 1),
        probes AS (
          SELECT vec_id AS qid, cid AS list_id FROM rnk
          WHERE rn <= 4 AND vec_id % 50 = 0),
        sc AS (
          SELECT p.qid, a.vec_id AS nn_id,
                 list_dot_product(x.e, y.e) / (x.nrm * y.nrm) AS c
          FROM probes p
          JOIN asg a ON a.list_id = p.list_id AND a.vec_id <> p.qid
          JOIN n x ON x.vec_id = a.vec_id
          JOIN n y ON y.vec_id = p.qid),
        r AS (
          SELECT qid, nn_id, c,
                 row_number() OVER (PARTITION BY qid ORDER BY c DESC, nn_id ASC) AS rank
          FROM sc)
        SELECT qid, nn_id, floor(c * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, rank,
               (SELECT retrained FROM flag) AS retrained,
               floor((SELECT v FROM r0) * 1000000.0 + 0.5) / 1000000.0 AS occ_ratio_trained,
               floor((SELECT v FROM r1) * 1000000.0 + 0.5) / 1000000.0 AS occ_ratio_after
        FROM r WHERE rank <= 5 ORDER BY qid, rank"""

  private val PreparedVecsCte =
    """n AS (
         SELECT vec_id, embedding::DOUBLE[] AS e,
                sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         FROM embeddings)"""

  /** Trained word-embedding artifact as CTEs (the F12 convention —
    * the oracle scores with the SAME committed resource): `w` is the
    * VALUES-list artifact, `dv` the per-document fixed-point sum
    * pooling over the engine's exact token sequence.
    */
  private lazy val EmbArtifactCte: String = {
    val dim = graft.text.WordEmbedding.loadArtifact()._1
    val cols = (1 to dim).map(i => s"d$i").mkString(", ")
    val sums = (1 to dim)
      .map(i => s"CAST(coalesce(sum(d$i), 0) AS BIGINT) AS e$i")
      .mkString(", ")
    s"""w(term, $cols) AS (VALUES ${graft.text.WordEmbedding.sqlValues()}),
       tkq AS (
         SELECT doc_id,
                unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                  x -> x <> '')) AS t
         FROM documents),
       dv AS (
         SELECT tkq.doc_id, CAST(count(w.term) AS INTEGER) AS n_hit, $sums
         FROM tkq LEFT JOIN w ON tkq.t = w.term
         GROUP BY tkq.doc_id)"""
  }

  /** Pooled vectors as a (vec_id, e DOUBLE[]) select over `dv`,
    * nonzero-vector docs only (cosine needs a norm).
    */
  private lazy val EmbVecSelect: String = {
    val dim = graft.text.WordEmbedding.loadArtifact()._1
    val list = (1 to dim).map(i => s"CAST(e$i AS DOUBLE)").mkString(", ")
    val nonzero = (1 to dim).map(i => s"e$i <> 0").mkString(" OR ")
    s"""SELECT doc_id AS vec_id, [$list] AS e
        FROM dv WHERE n_hit > 0 AND ($nonzero)"""
  }

  /** The greedy-MMR oracle (5 chained argmax CTEs) over any candidate
    * CTE chain ending in `nv(vec_id, label, e, nrm)` — shared verbatim
    * by the embeddings-table gate and the trained-artifact gate: the
    * selection algebra is the operator under test, whatever encoder
    * produced the vectors.
    */
  private def mmrOracleSql(nvCte: String): String = {
    val steps = (2 to 5).map { n =>
      val prev = (1 until n).map(m => s"s$m")
      val joins = prev.map(m => s"JOIN $m ON $m.label = p.label")
        .mkString("\n             ")
      val notSel = prev.map(m => s"p.vec_id <> $m.vec_id")
        .mkString(" AND ")
      val divSum = prev
        .map(m => s"list_dot_product(p.e, $m.e) / (p.nrm * $m.nrm)")
        .mkString(" + ")
      s"""c$n AS (
         SELECT p.label, p.vec_id, p.rel, p.e, p.nrm, p.rnk,
                0.65 * p.rel - (1 - 0.65) * (($divSum) / ${n - 1}) AS score
         FROM pool p
           $joins
         WHERE $notSel),
       s$n AS (
         SELECT * FROM c$n QUALIFY row_number() OVER (
           PARTITION BY label ORDER BY score DESC, rnk ASC) = 1)"""
    }.mkString(",\n         ")
    val selects = (2 to 5).map(n =>
      s"SELECT label, $n AS rank, vec_id, " +
        s"${graft.functions.Parity.sqlRound("score", 6)} AS mmr_score FROM s$n")
      .mkString("\n         UNION ALL ")
    s"""WITH $nvCte,
       doc AS (SELECT label, min(vec_id) AS doc_id FROM nv GROUP BY label),
       docv AS (
         SELECT d.label, d.doc_id, nv.e AS de, nv.nrm AS dnrm
         FROM doc d JOIN nv ON nv.vec_id = d.doc_id),
       pool0 AS (
         SELECT nv.label, nv.vec_id, nv.e, nv.nrm,
                list_dot_product(nv.e, v.de) / (nv.nrm * v.dnrm) AS rel
         FROM nv JOIN docv v ON nv.label = v.label
         WHERE nv.vec_id <> v.doc_id),
       pool AS (
         SELECT *, row_number() OVER (
           PARTITION BY label ORDER BY rel DESC, vec_id ASC) AS rnk
         FROM pool0 QUALIFY rnk <= 50),
       s1 AS (SELECT *, rel AS score FROM pool WHERE rnk = 1),
       $steps
       SELECT * FROM (
         SELECT label, 1 AS rank, vec_id,
                ${graft.functions.Parity.sqlRound("rel", 6)} AS mmr_score
         FROM s1
       UNION ALL $selects)
       ORDER BY label, rank"""
  }

  /** SQL mirror of Similarity.planeSigns/signBuckets: ±1 from the
    * parity of the first md5 byte of "t:p:j" (parity of a byte == the
    * parity of its 2nd hex char), bucket = Σ (e·signs > 0) << p per
    * hash table. 4 tables × 8 planes × 64 dims.
    */
  private val SignBucketsCte =
    """sgn AS (
         SELECT t, p,
                list(CASE WHEN substr(md5(CAST(t AS VARCHAR) || ':' ||
                         CAST(p AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 2, 1)
                       IN ('0','2','4','6','8','a','c','e')
                     THEN 1.0 ELSE -1.0 END ORDER BY j) AS sv
         FROM (SELECT unnest(range(4)) AS t),
              (SELECT unnest(range(8)) AS p),
              (SELECT unnest(range(64)) AS j)
         GROUP BY t, p),
       bk AS (
         SELECT n.vec_id, s.t,
                sum(CASE WHEN list_dot_product(n.e, s.sv) > 0
                    THEN (1::BIGINT << s.p) ELSE 0 END)::BIGINT AS bucket
         FROM n, sgn s GROUP BY n.vec_id, s.t)"""

  private[queries] val EnStop =
    TextAnalysis.Stopwords.head._2.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Quality-score SQL over a `toks` column (mirror of
    * TextAnalysis.qualityScore / QualityOps float-op order).
    */
  private[queries] def qualitySql(toks: String): String =
    s"""floor((0.3 * least(CAST(len($toks) AS DOUBLE) / 100.0, 1.0)
         + 0.3 * (CASE WHEN len($toks) > 0 THEN CAST(len(list_distinct($toks)) AS DOUBLE) / len($toks) ELSE 0.0 END)
         + 0.2 * least((CASE WHEN len($toks) > 0 THEN CAST(len(list_filter($toks, t -> list_contains($EnStop, t))) AS DOUBLE) / len($toks) ELSE 0.0 END) * 5.0, 1.0)
         + 0.2 * least((CASE WHEN len($toks) > 0 THEN CAST(list_sum(list_transform($toks, t -> length(t))) AS DOUBLE) / len($toks) ELSE 0.0 END) / 8.0, 1.0))
       * 10000.0 + 0.5) / 10000.0"""

  /** Language-ID SQL pieces over a `toks` column (mirror of
    * TextAnalysis.langId / LangIdOps): per-language stopword hit
    * counts, argmax with fixed priority order, 'und' on zero hits.
    * Returns (score projections, best expr, lang CASE arms).
    */
  private[queries] def langIdSqlParts(toks: String): (String, String, String) = {
    val scores = TextAnalysis.Stopwords.map { case (l, ws) =>
      val lst = ws.map(w => s"'$w'").mkString("[", ", ", "]")
      s"len(list_filter($toks, t -> list_contains($lst, t))) AS s_$l"
    }.mkString(",\n                  ")
    val langs = TextAnalysis.Stopwords.map(_._1)
    val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
    val cases = langs.map(l =>
      s"WHEN s_$l = best AND best > 0 THEN '$l'").mkString(" ")
    (scores, best, cases)
  }

  /** DuckDB oracle for `q_t_langid_trained`: the planted sentences
    * re-built from the shared lexicon VALUES, char trigrams via
    * substr, the artifact's non-zero weights joined as a VALUES list
    * (the trainedScoreCtes convention), per-language z with the
    * lowest-index tiebreak, and the rules argmax re-derived through
    * [[langIdSqlParts]] — the whole trained path cross-checked in
    * closed form.
    */
  private def langidTrainedOracleSql: String = {
    import graft.text.LangIdModel
    val vocVals = LangIdModel.Vocab.zipWithIndex.map { case (ws, li) =>
      s"($li, [${ws.map(w => s"'$w'").mkString(", ")}])" }.mkString(", ")
    val (biases, w) = LangIdModel.loadArtifact()
    val lwVals = (for {
      l <- w.indices; b <- 0 until LangIdModel.NBuckets if w(l)(b) != 0L
    } yield s"($l, $b, ${w(l)(b)}::BIGINT)").mkString(", ")
    val lbVals = biases.zipWithIndex.map { case (v, l) =>
      s"($l, ${v}::BIGINT)" }.mkString(", ")
    val langArr = LangIdModel.Langs.map(l => s"'$l'")
      .mkString("[", ", ", "]")
    val (scores, best, cases) = langIdSqlParts("toks")
    s"""WITH voc(li, v) AS (VALUES $vocVals),
       lw(li, b, wt) AS (VALUES $lwVals),
       lb(li, bias) AS (VALUES $lbVals),
       praw AS (
         SELECT doc_id, doc_id % 5 AS pl,
                array_to_string(list_transform(range(8 + doc_id % 7),
                  i -> v[CAST((doc_id * 13 + i * 7) % 20 + 1 AS INT)]),
                  ' ') AS t
         FROM documents JOIN voc ON voc.li = doc_id % 5),
       g AS (
         SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
           i -> substr(t, CAST(i AS INT), 3))) AS gr
         FROM praw),
       f AS (
         SELECT doc_id,
                ('0x' || substr(md5(gr), 1, 8))::BIGINT % 256 AS b
         FROM g),
       ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
              FROM f GROUP BY doc_id),
       sc AS (
         SELECT f.doc_id, lb.li,
                lb.bias + CAST(coalesce(sum(lw.wt), 0) AS BIGINT) AS z
         FROM f CROSS JOIN lb
         LEFT JOIN lw ON lw.li = lb.li AND lw.b = f.b
         GROUP BY f.doc_id, lb.li, lb.bias),
       rk AS (
         SELECT doc_id, li, z,
                row_number() OVER (PARTITION BY doc_id
                  ORDER BY z DESC, li ASC) AS r
         FROM sc),
       tb AS (
         SELECT doc_id,
                max(CASE WHEN r = 1 THEN li END) AS bi,
                max(CASE WHEN r = 1 THEN z END) AS zb,
                max(CASE WHEN r = 2 THEN z END) AS z2
         FROM rk GROUP BY doc_id),
       rtk AS (
         SELECT doc_id,
                list_filter(string_split_regex(lower(t), '\\s+'),
                  x -> x <> '') AS toks
         FROM praw),
       rsc AS (SELECT doc_id, $scores FROM rtk),
       rb AS (SELECT *, $best AS best FROM rsc)
       SELECT p.doc_id,
              $langArr[CAST(p.pl + 1 AS INT)] AS lang_planted,
              CASE $cases ELSE 'und' END AS lang_rules,
              $langArr[CAST(tb.bi + 1 AS INT)] AS lang_trained,
              tb.zb AS z_best, tb.zb - tb.z2 AS margin, ng.n_grams,
              $langArr[CAST(tb.bi + 1 AS INT)]
                = $langArr[CAST(p.pl + 1 AS INT)] AS trained_ok,
              (CASE $cases ELSE 'und' END)
                = $langArr[CAST(p.pl + 1 AS INT)] AS rules_ok
       FROM praw p JOIN tb USING (doc_id) JOIN ng USING (doc_id)
       JOIN rb USING (doc_id)
       ORDER BY doc_id"""
  }

  def oracleSql: Map[String, String] = Map(
    "q_t_langid_trained" -> langidTrainedOracleSql,
    "q_d_exact_dedup" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY fp""",

    "q_d_incremental_dedup" ->
      """WITH h AS (
           SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 3 <> 0),
         b AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 3 = 0),
         f AS (SELECT fp, min(doc_id) AS first_id FROM b GROUP BY fp)
         SELECT b.doc_id, b.fp,
                h.fp IS NOT NULL AS in_history,
                b.doc_id <> f.first_id AS batch_dup,
                h.fp IS NULL AND b.doc_id = f.first_id AS keep
         FROM b JOIN f USING (fp) LEFT JOIN h USING (fp)
         ORDER BY doc_id""",

    // bloom pre-filter is output-invisible — the oracle IS the exact
    // form's oracle, verbatim
    "q_d_incremental_bloom" ->
      """WITH h AS (
           SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 3 <> 0),
         b AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 3 = 0),
         f AS (SELECT fp, min(doc_id) AS first_id FROM b GROUP BY fp)
         SELECT b.doc_id, b.fp,
                h.fp IS NOT NULL AS in_history,
                b.doc_id <> f.first_id AS batch_dup,
                h.fp IS NULL AND b.doc_id = f.first_id AS keep
         FROM b JOIN f USING (fp) LEFT JOIN h USING (fp)
         ORDER BY doc_id""",

    // plain exact frequency + support threshold — the sketch only
    // bounds where the operator looks, never what it reports
    "q_t_phrase_hh" ->
      """WITH tk AS (
           SELECT list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '') AS toks
           FROM documents),
         t AS (
           SELECT array_to_string(list_slice(toks, i + 1, i + 2), ' ') AS item
           FROM (SELECT toks, unnest(range(len(toks) - 1)) AS i
                 FROM tk WHERE len(toks) >= 2)),
         tot AS (SELECT count(*) AS n FROM t)
         SELECT item, count(*) AS cnt FROM t, tot
         GROUP BY item, n HAVING count(*) * 1000000 >= 1500 * n
         ORDER BY item""",

    "q_d_ngram_jaccard" -> JaccardPairsSql,

    // LSH output provably equals the exact pairs at these parameters
    // (see object scaladoc) — same oracle.
    "q_d_minhash_lsh" -> JaccardPairsSql,

    // Full mirror of the banding pipeline — the first direct one:
    // exact-dup collapse to reps, the L4 capped-postings Jaccard as
    // ground truth, minhash signatures (15-hex md5 base hash mod
    // 2^31−1, 16 affine maps, min over shingles), band keys (md5 of
    // the '|'-joined 2-row slices), the >4096 bucket cap, the bucket
    // self-join, then the bucket/aggregate and the analytic curve as
    // the SAME sequential multiplication chain the engine folds.
    "q_d_lsh_curve" ->
      """WITH rep AS (
           SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text),
         tk AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '') AS toks
           FROM rep),
         sh AS (
           SELECT doc_id, sh FROM (
             SELECT doc_id,
                    CASE WHEN len(toks) >= 3
                         THEN list_distinct(list_transform(
                                range(1, len(toks) - 1),
                                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                         ELSE [] END AS sh
             FROM tk) WHERE len(sh) > 0),
         post AS (SELECT doc_id, unnest(sh) AS s FROM sh),
         dfreq AS (SELECT s, count(*) AS df FROM post GROUP BY s),
         postc AS (
           SELECT post.doc_id, post.s
           FROM post JOIN dfreq USING (s) WHERE dfreq.df <= 256),
         szs AS (SELECT doc_id, len(sh) AS sz FROM sh),
         inter AS (
           SELECT a.doc_id AS ida, b.doc_id AS idb, count(*) AS i
           FROM postc a JOIN postc b USING (s)
           WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
         truth AS (
           SELECT ida, idb,
                  floor(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i)
                    * 1000000.0 + 0.5) / 1000000.0 AS jaccard
           FROM inter
           JOIN szs sa ON sa.doc_id = ida
           JOIN szs sb ON sb.doc_id = idb),
         sig AS (
           SELECT doc_id,
                  list_transform(range(16), k ->
                    list_min(list_transform(sh, s ->
                      ((('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647)
                        * ((k + 1) * 2654435761 % 2147483647) % 2147483647
                       + (('0x' || substr(md5(s), 17, 15))::BIGINT % 2147483647)
                        * ((2 * k + 1) * 1779033703 % 2147483647) % 2147483647
                       + k * 12345 + 7) % 2147483647))) AS sig
           FROM sh),
         bands AS (
           SELECT doc_id, b.b AS band_id,
                  md5(array_to_string(list_transform(
                    list_slice(sig, CAST(2 * b.b + 1 AS INT),
                      CAST(2 * b.b + 2 AS INT)),
                    x -> CAST(x AS VARCHAR)), '|')) AS band_key
           FROM sig, (SELECT unnest(range(8)) AS b) b),
         bucketn AS (
           SELECT band_id, band_key, count(*) AS n
           FROM bands GROUP BY 1, 2),
         keptb AS (
           SELECT bands.doc_id, bands.band_id, bands.band_key
           FROM bands JOIN bucketn USING (band_id, band_key)
           WHERE bucketn.n <= 4096),
         cand AS (
           SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb
           FROM keptb a JOIN keptb b USING (band_id, band_key)
           WHERE a.doc_id < b.doc_id),
         binned AS (
           SELECT least(CAST(floor(jaccard * 1000000.0 + 0.5) AS BIGINT)
                    // 50000, 19) AS bin,
                  CASE WHEN cand.ida IS NOT NULL THEN 1 ELSE 0 END AS c
           FROM truth LEFT JOIN cand USING (ida, idb)),
         agg AS (
           SELECT bin, CAST(count(*) AS BIGINT) AS n_pairs,
                  CAST(sum(c) AS BIGINT) AS n_cand
           FROM binned GROUP BY bin)
         SELECT bin, bin * 50000 AS j_lo_micros, n_pairs, n_cand,
                floor(CAST(n_cand AS DOUBLE) / CAST(n_pairs AS DOUBLE)
                  * 1000000.0 + 0.5) / 1000000.0 AS cand_rate,
                floor((1.0 - (((((((1.0 - (CAST(bin AS DOUBLE) / 20) * (CAST(bin AS DOUBLE) / 20))
                  * (1.0 - (CAST(bin AS DOUBLE) / 20) * (CAST(bin AS DOUBLE) / 20)))
                  * (1.0 - (CAST(bin AS DOUBLE) / 20) * (CAST(bin AS DOUBLE) / 20)))
                  * (1.0 - (CAST(bin AS DOUBLE) / 20) * (CAST(bin AS DOUBLE) / 20)))
                  * (1.0 - (CAST(bin AS DOUBLE) / 20) * (CAST(bin AS DOUBLE) / 20)))
                  * (1.0 - (CAST(bin AS DOUBLE) / 20) * (CAST(bin AS DOUBLE) / 20)))
                  * (1.0 - (CAST(bin AS DOUBLE) / 20) * (CAST(bin AS DOUBLE) / 20)))
                  * (1.0 - (CAST(bin AS DOUBLE) / 20) * (CAST(bin AS DOUBLE) / 20)))
                  * 1000000.0 + 0.5) / 1000000.0 AS curve_lo,
                floor((1.0 - (((((((1.0 - (CAST(bin + 1 AS DOUBLE) / 20) * (CAST(bin + 1 AS DOUBLE) / 20))
                  * (1.0 - (CAST(bin + 1 AS DOUBLE) / 20) * (CAST(bin + 1 AS DOUBLE) / 20)))
                  * (1.0 - (CAST(bin + 1 AS DOUBLE) / 20) * (CAST(bin + 1 AS DOUBLE) / 20)))
                  * (1.0 - (CAST(bin + 1 AS DOUBLE) / 20) * (CAST(bin + 1 AS DOUBLE) / 20)))
                  * (1.0 - (CAST(bin + 1 AS DOUBLE) / 20) * (CAST(bin + 1 AS DOUBLE) / 20)))
                  * (1.0 - (CAST(bin + 1 AS DOUBLE) / 20) * (CAST(bin + 1 AS DOUBLE) / 20)))
                  * (1.0 - (CAST(bin + 1 AS DOUBLE) / 20) * (CAST(bin + 1 AS DOUBLE) / 20)))
                  * (1.0 - (CAST(bin + 1 AS DOUBLE) / 20) * (CAST(bin + 1 AS DOUBLE) / 20)))
                  * 1000000.0 + 0.5) / 1000000.0 AS curve_hi
         FROM agg ORDER BY bin""",

    "q_d_simhash" ->
      s"""WITH $SimhashCte
          SELECT doc_id, simhash FROM fp ORDER BY doc_id""",

    "q_d_simhash_pairs" ->
      s"""WITH $SimhashCte
          SELECT a.doc_id AS ida, b.doc_id AS idb,
                 bit_count(xor(a.simhash, b.simhash)) AS hamming
          FROM fp a JOIN fp b ON a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
          ORDER BY ida, idb""",

    // both stages recomputed: banded-candidate pairs from the simhash
    // CTE, cosine from the artifact-pooled vectors; raw-double
    // threshold compare (both engines run the identical IEEE chain,
    // the q_s_embedding_nn convention)
    "q_d_semantic_confirm" ->
      s"""WITH $SimhashCte,
          $EmbArtifactCte,
          n AS (
            SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm
            FROM ($EmbVecSelect)),
          p AS (
            SELECT a.doc_id AS ida, b.doc_id AS idb,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
          c AS (
            SELECT p.ida, p.idb, p.hamming,
                   list_dot_product(x.e, y.e) / (x.nrm * y.nrm) AS craw
            FROM p JOIN n x ON x.vec_id = p.ida
                   JOIN n y ON y.vec_id = p.idb)
          SELECT ida, idb, hamming,
                 floor(craw * 1000000.0 + 0.5) / 1000000.0 AS cos_sim,
                 craw >= 0.95 AS confirmed
          FROM c ORDER BY ida, idb""",

    // MMR greedy unrolled: sel-N picks argmax of
    // 0.65*rel - (1-0.65)*mean(sim to sel-1..N-1) among the pool rows
    // not yet selected — float ops in the exact order of the Spark
    // fold (left-to-right div sum, literal (1 - 0.65)).
    "q_f14_mmr_keyphrases" -> mmrOracleSql(
      """nv AS (
           SELECT vec_id, CAST(label AS INT) AS label,
                  embedding::DOUBLE[] AS e,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
           FROM embeddings)"""),

    // pooled-vector parity against the committed artifact: fixed-point
    // BIGINT sums on both sides, hash-exact
    "q_t_embed_doc" -> {
      val dim = graft.text.WordEmbedding.loadArtifact()._1
      val picks = (1 to dim)
        .map(i => s"coalesce(e$i, 0::BIGINT) AS e$i").mkString(", ")
      s"""WITH $EmbArtifactCte
         SELECT d.doc_id, coalesce(dv.n_hit, 0) AS n_hit, $picks
         FROM documents d LEFT JOIN dv USING (doc_id)
         ORDER BY d.doc_id"""
    },

    // brute-force cosine over the trained doc vectors (q_s_ann_topk
    // shape with nv = the artifact-pooled vectors)
    "q_t_embed_nn" ->
      s"""WITH $EmbArtifactCte,
          n AS (
            SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm
            FROM ($EmbVecSelect)),
          q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM n WHERE vec_id % 50 = 0),
          p AS (
            SELECT q.qid, n.vec_id AS nn_id,
                   list_dot_product(n.e, q.qe) / (n.nrm * q.qnrm) AS c
            FROM n CROSS JOIN q WHERE n.vec_id <> q.qid),
          r AS (
            SELECT qid, nn_id, c,
                   row_number() OVER (PARTITION BY qid ORDER BY c DESC, nn_id ASC) AS rank
            FROM p)
          SELECT qid, nn_id, floor(c * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, rank
          FROM r WHERE rank <= 3 ORDER BY qid, rank""",

    // learned-BPE counts against the artifact's vocab table; the
    // engine runs the real merge loop, the spec pins table == encoder
    "q_t_bpe_tokens" ->
      s"""WITH bv(term, n_sub) AS (VALUES ${graft.text.BpeTokenizer.sqlValues()}),
          tkb AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '')) AS t
            FROM documents),
          j AS (
            SELECT tkb.doc_id,
                   CAST(count(*) AS INTEGER) AS n_words,
                   CAST(coalesce(sum(bv.n_sub), 0) AS BIGINT) AS n_bpe,
                   CAST(count(*) - count(bv.term) AS INTEGER) AS n_oov
            FROM tkb LEFT JOIN bv ON tkb.t = bv.term
            GROUP BY tkb.doc_id)
          SELECT d.doc_id,
                 CAST(coalesce(j.n_words, 0) AS INTEGER) AS n_words,
                 CAST(coalesce(j.n_bpe, 0) AS BIGINT) AS n_bpe,
                 CAST(coalesce(j.n_oov, 0) AS INTEGER) AS n_oov
          FROM documents d LEFT JOIN j USING (doc_id)
          ORDER BY d.doc_id""",

    // unigram counts against the artifact's vocab table — the engine
    // runs the real Viterbi, the spec pins table == encoder
    "q_t_unigram_tokens" ->
      s"""WITH uv(term, n_sub) AS (VALUES ${graft.text.UnigramTokenizer.sqlValues()}),
          tkb AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '')) AS t
            FROM documents),
          j AS (
            SELECT tkb.doc_id,
                   CAST(count(*) AS INTEGER) AS n_words,
                   CAST(coalesce(sum(uv.n_sub), 0) AS BIGINT) AS n_uni,
                   CAST(count(*) - count(uv.term) AS INTEGER) AS n_oov
            FROM tkb LEFT JOIN uv ON tkb.t = uv.term
            GROUP BY tkb.doc_id)
          SELECT d.doc_id,
                 CAST(coalesce(j.n_words, 0) AS INTEGER) AS n_words,
                 CAST(coalesce(j.n_uni, 0) AS BIGINT) AS n_uni,
                 CAST(coalesce(j.n_oov, 0) AS INTEGER) AS n_oov
          FROM documents d LEFT JOIN j USING (doc_id)
          ORDER BY d.doc_id""",

    // both artifacts' vocab tables joined under the mirrored langid
    // CTE — the side-by-side fertility rollup
    "q_t_tokenizer_fertility" -> {
      val (scores, best, cases) = langIdSqlParts("toks")
      s"""WITH bv(term, n_sub) AS (VALUES ${graft.text.BpeTokenizer.sqlValues()}),
          uv(term, n_sub) AS (VALUES ${graft.text.UnigramTokenizer.sqlValues()}),
          t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS toks
            FROM documents),
          sc AS (SELECT doc_id, len(toks) AS n, $scores FROM t),
          b AS (SELECT *, $best AS best FROM sc),
          lid AS (SELECT doc_id, CASE $cases ELSE 'und' END AS lang FROM b),
          tkb AS (SELECT doc_id, unnest(toks) AS tk FROM t),
          j AS (
            SELECT tkb.doc_id, CAST(count(*) AS BIGINT) AS w,
                   CAST(coalesce(sum(bv.n_sub), 0) AS BIGINT) AS bt,
                   CAST(coalesce(sum(uv.n_sub), 0) AS BIGINT) AS ut,
                   CAST(count(*) - count(uv.term) AS BIGINT) AS o
            FROM tkb LEFT JOIN bv ON tkb.tk = bv.term
                     LEFT JOIN uv ON tkb.tk = uv.term
            GROUP BY 1),
          d AS (
            SELECT lid.lang, coalesce(j.w, 0) AS w, coalesce(j.bt, 0) AS bt,
                   coalesce(j.ut, 0) AS ut, coalesce(j.o, 0) AS o
            FROM lid LEFT JOIN j USING (doc_id)),
          g AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(w) AS BIGINT) AS n_words,
                   CAST(sum(bt) AS BIGINT) AS n_bpe,
                   CAST(sum(ut) AS BIGINT) AS n_uni,
                   CAST(sum(o) AS BIGINT) AS n_oov
            FROM d GROUP BY lang)
          SELECT lang, n_docs, n_words, n_bpe, n_uni, n_oov,
                 CASE WHEN n_words - n_oov > 0 THEN
                   floor(CAST(n_bpe AS DOUBLE) / CAST(n_words - n_oov AS DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0 END AS fertility_bpe,
                 CASE WHEN n_words - n_oov > 0 THEN
                   floor(CAST(n_uni AS DOUBLE) / CAST(n_words - n_oov AS DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0 END AS fertility_uni
          FROM g ORDER BY lang"""
    },

    // Per-language rollup of the artifact join, languages from the
    // mirrored langid CTE; ratios as single divisions of exact sums.
    "q_t_bpe_fertility" -> {
      val (scores, best, cases) = langIdSqlParts("toks")
      s"""WITH bv(term, n_sub) AS (VALUES ${graft.text.BpeTokenizer.sqlValues()}),
          t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS toks
            FROM documents),
          sc AS (SELECT doc_id, len(toks) AS n, $scores FROM t),
          b AS (SELECT *, $best AS best FROM sc),
          lid AS (SELECT doc_id, CASE $cases ELSE 'und' END AS lang FROM b),
          tkb AS (SELECT doc_id, unnest(toks) AS tk FROM t),
          j AS (
            SELECT tkb.doc_id, CAST(count(*) AS BIGINT) AS w,
                   CAST(coalesce(sum(bv.n_sub), 0) AS BIGINT) AS bt,
                   CAST(count(*) - count(bv.term) AS BIGINT) AS o
            FROM tkb LEFT JOIN bv ON tkb.tk = bv.term GROUP BY 1),
          d AS (
            SELECT lid.lang, coalesce(j.w, 0) AS w,
                   coalesce(j.bt, 0) AS bt, coalesce(j.o, 0) AS o
            FROM lid LEFT JOIN j USING (doc_id)),
          g AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(w) AS BIGINT) AS n_words,
                   CAST(sum(bt) AS BIGINT) AS n_bpe,
                   CAST(sum(o) AS BIGINT) AS n_oov
            FROM d GROUP BY lang)
          SELECT lang, n_docs, n_words, n_bpe, n_oov,
                 CASE WHEN n_words - n_oov > 0 THEN
                   floor(CAST(n_bpe AS DOUBLE) / CAST(n_words - n_oov AS DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0 END AS fertility,
                 CASE WHEN n_words > 0 THEN
                   floor(CAST(n_oov AS DOUBLE) / CAST(n_words AS DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0 END AS oov_rate
          FROM g ORDER BY lang"""
    },

    // SAME greedy MMR CTE chain as q_f14_mmr_keyphrases, nv = the
    // trained doc vectors grouped by language
    "q_f14_mmr_trained" -> mmrOracleSql(
      s"""$EmbArtifactCte,
          lv AS (
            SELECT doc_id,
                   CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 1
                             WHEN 'es' THEN 2 WHEN 'fr' THEN 3
                             WHEN 'zh' THEN 4 ELSE 9 END AS label
            FROM documents),
          nv AS (
            SELECT v.vec_id, lv.label, v.e,
                   sqrt(list_dot_product(v.e, v.e)) AS nrm
            FROM ($EmbVecSelect) v JOIN lv ON v.vec_id = lv.doc_id)"""),

    "q_s_ann_topk" ->
      s"""WITH $PreparedVecsCte,
          q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM n WHERE vec_id % 50 = 0),
          p AS (
            SELECT q.qid, n.vec_id AS nn_id,
                   list_dot_product(n.e, q.qe) / (n.nrm * q.qnrm) AS c
            FROM n CROSS JOIN q WHERE n.vec_id <> q.qid),
          r AS (
            SELECT qid, nn_id, c,
                   row_number() OVER (PARTITION BY qid ORDER BY c DESC, nn_id ASC) AS rank
            FROM p)
          SELECT qid, nn_id, floor(c * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, rank
          FROM r WHERE rank <= 5 ORDER BY qid, rank""",

    "q_s_embedding_nn" ->
      s"""WITH $PreparedVecsCte,
          $SignBucketsCte,
          cand AS (
            SELECT DISTINCT a.vec_id, b.vec_id AS nn_id
            FROM bk a JOIN bk b ON a.t = b.t AND a.bucket = b.bucket
            WHERE a.vec_id <> b.vec_id),
          sc AS (
            SELECT cand.vec_id, cand.nn_id,
                   list_dot_product(x.e, y.e) / (x.nrm * y.nrm) AS c
            FROM cand JOIN n x ON x.vec_id = cand.vec_id
                      JOIN n y ON y.vec_id = cand.nn_id),
          r AS (
            SELECT vec_id, nn_id, c,
                   row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, nn_id ASC) AS rank
            FROM sc)
          SELECT vec_id, nn_id, floor(c * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, c >= 0.9 AS is_dup
          FROM r WHERE rank = 1 ORDER BY vec_id""",

    "q_s_ann_lsh" ->
      s"""WITH $PreparedVecsCte,
          $SignBucketsCte,
          probes AS (
            SELECT vec_id AS qid, t,
                   unnest(list_prepend(bucket,
                     list_transform(range(8), i -> xor(bucket, (1::BIGINT << i))))) AS bucket
            FROM bk WHERE vec_id % 50 = 0),
          cand AS (
            SELECT DISTINCT p.qid, c.vec_id AS nn_id
            FROM probes p JOIN bk c ON c.t = p.t AND c.bucket = p.bucket
            WHERE c.vec_id <> p.qid),
          sc AS (
            SELECT cand.qid, cand.nn_id,
                   list_dot_product(x.e, y.e) / (x.nrm * y.nrm) AS c
            FROM cand JOIN n x ON x.vec_id = cand.qid
                      JOIN n y ON y.vec_id = cand.nn_id),
          r AS (
            SELECT qid, nn_id, c,
                   row_number() OVER (PARTITION BY qid ORDER BY c DESC, nn_id ASC) AS rank
            FROM sc)
          SELECT qid, nn_id, floor(c * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, rank
          FROM r WHERE rank <= 5 ORDER BY qid, rank""",

    "q_s_ann_ivf" ->
      s"""WITH $PreparedVecsCte,
          cent AS (
            SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS cid,
                   list_transform(e, x -> x / nrm) AS c
            FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
          rnk AS (
            SELECT n.vec_id, cent.cid,
                   row_number() OVER (PARTITION BY n.vec_id
                     ORDER BY list_dot_product(n.e, cent.c) DESC, cent.cid ASC) AS rn
            FROM n CROSS JOIN cent),
          asg AS (SELECT vec_id, cid AS list_id FROM rnk WHERE rn = 1),
          probes AS (
            SELECT vec_id AS qid, cid AS list_id FROM rnk
            WHERE rn <= 4 AND vec_id % 50 = 0),
          sc AS (
            SELECT p.qid, a.vec_id AS nn_id,
                   list_dot_product(x.e, y.e) / (x.nrm * y.nrm) AS c
            FROM probes p
            JOIN asg a ON a.list_id = p.list_id AND a.vec_id <> p.qid
            JOIN n x ON x.vec_id = a.vec_id
            JOIN n y ON y.vec_id = p.qid),
          r AS (
            SELECT qid, nn_id, c,
                   row_number() OVER (PARTITION BY qid ORDER BY c DESC, nn_id ASC) AS rank
            FROM sc)
          SELECT qid, nn_id, floor(c * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, rank
          FROM r WHERE rank <= 5 ORDER BY qid, rank""",

    // identical pipeline to q_s_ann_ivf except the centroid CTE is
    // restricted to the history slice — the frozen stored quantizer
    "q_s_ivf_incremental" ->
      s"""WITH $PreparedVecsCte,
          cent AS (
            SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS cid,
                   list_transform(e, x -> x / nrm) AS c
            FROM n WHERE vec_id % 10 <> 0
            ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
          rnk AS (
            SELECT n.vec_id, cent.cid,
                   row_number() OVER (PARTITION BY n.vec_id
                     ORDER BY list_dot_product(n.e, cent.c) DESC, cent.cid ASC) AS rn
            FROM n CROSS JOIN cent),
          asg AS (SELECT vec_id, cid AS list_id FROM rnk WHERE rn = 1),
          probes AS (
            SELECT vec_id AS qid, cid AS list_id FROM rnk
            WHERE rn <= 4 AND vec_id % 50 = 0),
          sc AS (
            SELECT p.qid, a.vec_id AS nn_id,
                   list_dot_product(x.e, y.e) / (x.nrm * y.nrm) AS c
            FROM probes p
            JOIN asg a ON a.list_id = p.list_id AND a.vec_id <> p.qid
            JOIN n x ON x.vec_id = a.vec_id
            JOIN n y ON y.vec_id = p.qid),
          r AS (
            SELECT qid, nn_id, c,
                   row_number() OVER (PARTITION BY qid ORDER BY c DESC, nn_id ASC) AS rank
            FROM sc)
          SELECT qid, nn_id, floor(c * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, rank
          FROM r WHERE rank <= 5 ORDER BY qid, rank""",

    // no-drift arm: standard vector CTE, %10 ingest slices — the
    // computed flag must come out false and the cent branch must
    // fall through to the stored quantizer
    "q_s_ivf_maintain" -> ivfMaintainOracle(
      """n AS (
           SELECT vec_id, embedding::DOUBLE[] AS e,
                  sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
           FROM embeddings)""",
      "vec_id % 10 <> 0"),

    // drift arm: the even half arrives shifted into the positive
    // orthant; the flag must come out true and the cent branch must
    // take the union-sample re-init
    "q_s_ivf_maintain_drift" -> ivfMaintainOracle(
      """n0 AS (SELECT vec_id, embedding::DOUBLE[] AS e0 FROM embeddings),
         n1 AS (
           SELECT vec_id,
                  CASE WHEN vec_id % 2 = 0
                       THEN list_transform(e0, x -> abs(x) + 1.0)
                       ELSE e0 END AS e
           FROM n0),
         n AS (SELECT vec_id, e, sqrt(list_dot_product(e, e)) AS nrm FROM n1)""",
      "vec_id % 2 <> 0"),

    // Pages rebuilt with the same overlapping self-joins; the zipped
    // double-unnest mirrors posexplode; first occurrence by
    // (page, pos) via the same window rule.
    "q_d_line_dedup" ->
      """WITH pages AS (
           SELECT a.doc_id AS page_id,
                  concat_ws(chr(10), a.text, b.text, c.text) AS page
           FROM documents a
           LEFT JOIN documents b ON b.doc_id = a.doc_id + 1
           LEFT JOIN documents c ON c.doc_id = a.doc_id + 2),
         ls AS (SELECT page_id, string_split(page, chr(10)) AS l FROM pages),
         lf AS (
           SELECT page_id, pos, ln FROM (
             SELECT page_id, unnest(range(len(l))) AS pos, unnest(l) AS ln
             FROM ls)
           WHERE ln <> ''),
         k AS (
           SELECT page_id, pos, ln,
                  row_number() OVER (PARTITION BY ln
                    ORDER BY page_id, pos) AS rn
           FROM lf),
         agg AS (
           SELECT page_id, count(*) AS n_kept,
                  array_to_string(list(ln ORDER BY pos), chr(10)) AS text_kept
           FROM k WHERE rn = 1 GROUP BY 1),
         tot AS (SELECT page_id, count(*) AS n_lines FROM lf GROUP BY 1)
         SELECT p.page_id,
                CAST(coalesce(t.n_lines, 0) AS BIGINT) AS n_lines,
                CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
                coalesce(a.text_kept, '') AS text_kept
         FROM pages p
         LEFT JOIN tot t USING (page_id)
         LEFT JOIN agg a USING (page_id)
         ORDER BY page_id""",

    // Codebooks = unit-sample subvector slices; codes = per-subspace
    // argmin of (-2·x_s·c + ‖c‖²); ADC = Σ_s (‖q_s‖² + q_s·c·(-2) +
    // ‖c‖²) over the coded entries, summed in subspace order. Probes
    // and list assignment reuse the q_s_ann_ivf centroid SQL.
    "q_s_ivf_pq" ->
      s"""WITH $PreparedVecsCte,
          u AS (SELECT vec_id, list_transform(e, x -> x / nrm) AS u FROM n),
          cent AS (
            SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS cid,
                   list_transform(e, x -> x / nrm) AS c
            FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
          rnk AS (
            SELECT n.vec_id, cent.cid,
                   row_number() OVER (PARTITION BY n.vec_id
                     ORDER BY list_dot_product(n.e, cent.c) DESC, cent.cid ASC) AS rn
            FROM n CROSS JOIN cent),
          asg AS (SELECT vec_id, cid AS list_id FROM rnk WHERE rn = 1),
          probes AS (
            SELECT vec_id AS qid, cid AS list_id FROM rnk
            WHERE rn <= 4 AND vec_id % 50 = 0),
          books AS (
            SELECT sp.s, cent.cid AS j,
                   list_slice(cent.c, sp.s * 8 + 1, sp.s * 8 + 8) AS c
            FROM cent, (SELECT unnest(range(8)) AS s) sp),
          enc AS (
            SELECT vec_id, s, j AS code FROM (
              SELECT u.vec_id, b.s, b.j,
                     row_number() OVER (PARTITION BY u.vec_id, b.s
                       ORDER BY (list_dot_product(list_slice(u.u, b.s * 8 + 1, b.s * 8 + 8), b.c) * -2.0
                                 + list_dot_product(b.c, b.c)) ASC, b.j ASC) AS rn
              FROM u CROSS JOIN books b) WHERE rn = 1),
          pr AS (
            SELECT p.qid, a.vec_id AS nn_id
            FROM probes p JOIN asg a ON a.list_id = p.list_id
            WHERE a.vec_id <> p.qid),
          adc AS (
            SELECT pr.qid, pr.nn_id,
                   list_sum(list(
                     list_dot_product(list_slice(qu.u, b.s * 8 + 1, b.s * 8 + 8),
                                      list_slice(qu.u, b.s * 8 + 1, b.s * 8 + 8))
                       + list_dot_product(list_slice(qu.u, b.s * 8 + 1, b.s * 8 + 8), b.c) * -2.0
                       + list_dot_product(b.c, b.c)
                     ORDER BY b.s)) AS d
            FROM pr
            JOIN enc ON enc.vec_id = pr.nn_id
            JOIN books b ON b.s = enc.s AND b.j = enc.code
            JOIN u qu ON qu.vec_id = pr.qid
            GROUP BY 1, 2),
          r AS (
            SELECT qid, nn_id, d,
                   row_number() OVER (PARTITION BY qid ORDER BY d ASC, nn_id ASC) AS rank
            FROM adc)
          SELECT qid, nn_id, floor(d * 1000000.0 + 0.5) / 1000000.0 AS adc_dist, rank
          FROM r WHERE rank <= 5 ORDER BY qid, rank""",

    // IVF-SQ8: the ann_ivf CTEs (centroid init, assignment, probes)
    // composed with the sq8 dequantize CTE; scan the probed lists'
    // dequantized codes with the asymmetric cosine
    "q_s_ivf_sq8" ->
      s"""WITH $PreparedVecsCte,
          cent AS (
            SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS cid,
                   list_transform(e, x -> x / nrm) AS c
            FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
          rnk AS (
            SELECT n.vec_id, cent.cid,
                   row_number() OVER (PARTITION BY n.vec_id
                     ORDER BY list_dot_product(n.e, cent.c) DESC, cent.cid ASC) AS rn
            FROM n CROSS JOIN cent),
          asg AS (SELECT vec_id, cid AS list_id FROM rnk WHERE rn = 1),
          probes AS (
            SELECT vec_id AS qid, cid AS list_id FROM rnk
            WHERE rn <= 4 AND vec_id % 50 = 0),
          st AS (
            SELECT d, min(v) AS mn, max(v) AS mx FROM (
              SELECT unnest(e) AS v,
                     unnest(range(1, len(e) + 1)) AS d
              FROM n)
            GROUP BY d),
          lim AS (
            SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs
            FROM st),
          dqv AS (
            SELECT vec_id,
                   list_transform(range(1, 65), i ->
                     CASE WHEN mxs[i] - mns[i] > 0
                          THEN mns[i]
                               + least(255.0, greatest(0.0,
                                   floor((e[i] - mns[i]) / (mxs[i] - mns[i])
                                         * 255.0 + 0.5)))
                                 * (mxs[i] - mns[i]) / 255.0
                          ELSE mns[i] END) AS dq
            FROM n, lim),
          dqn AS (
            SELECT vec_id, dq, sqrt(list_dot_product(dq, dq)) AS dqnrm
            FROM dqv),
          sc AS (
            SELECT p.qid, a.vec_id AS nn_id,
                   list_dot_product(x.dq, y.e) / (x.dqnrm * y.nrm) AS cs
            FROM probes p
            JOIN asg a ON a.list_id = p.list_id AND a.vec_id <> p.qid
            JOIN dqn x ON x.vec_id = a.vec_id
            JOIN n y ON y.vec_id = p.qid),
          r AS (
            SELECT qid, nn_id, cs,
                   row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nn_id ASC) AS rank
            FROM sc)
          SELECT qid, nn_id, floor(cs * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, rank
          FROM r WHERE rank <= 5 ORDER BY qid, rank""",

    // JL: sign matrix from the md5-parity trick (SignBucketsCte
    // convention, 'jl' namespace), projection p_j = e·s_j / sqrt(16),
    // projected-cosine top-32 then exact-cosine top-5 — every stage
    // mirrored
    "q_s_jl_rerank" ->
      s"""WITH $PreparedVecsCte,
          jsgn AS (
            SELECT j,
                   list(CASE WHEN substr(md5('jl:' || CAST(j AS VARCHAR) || ':'
                            || CAST(i AS VARCHAR)), 2, 1)
                          IN ('0','2','4','6','8','a','c','e')
                        THEN 1.0 ELSE -1.0 END ORDER BY i) AS sv
            FROM (SELECT unnest(range(16)) AS j),
                 (SELECT unnest(range(64)) AS i)
            GROUP BY j),
          pv AS (
            SELECT n.vec_id,
                   list(list_dot_product(n.e, s.sv) / sqrt(16.0) ORDER BY s.j) AS pe
            FROM n CROSS JOIN jsgn s GROUP BY n.vec_id),
          pn AS (
            SELECT vec_id, pe, sqrt(list_dot_product(pe, pe)) AS pnrm FROM pv),
          qp AS (SELECT vec_id AS qid, pe AS qpe, pnrm AS qpnrm
                 FROM pn WHERE vec_id % 50 = 0),
          cnd AS (
            SELECT qid, nn_id FROM (
              SELECT q.qid, c.vec_id AS nn_id,
                     row_number() OVER (PARTITION BY q.qid
                       ORDER BY list_dot_product(c.pe, q.qpe) / (c.pnrm * q.qpnrm) DESC,
                                c.vec_id ASC) AS rank_p
              FROM pn c CROSS JOIN qp q WHERE c.vec_id <> q.qid)
            WHERE rank_p <= 32),
          qf AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm
                 FROM n WHERE vec_id % 50 = 0),
          rr AS (
            SELECT cnd.qid, cnd.nn_id,
                   list_dot_product(c.e, q.qe) / (c.nrm * q.qnrm) AS cs
            FROM cnd
            JOIN n c ON c.vec_id = cnd.nn_id
            JOIN qf q ON q.qid = cnd.qid),
          r AS (
            SELECT qid, nn_id, cs,
                   row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nn_id ASC) AS rank
            FROM rr)
          SELECT qid, nn_id, floor(cs * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, rank
          FROM r WHERE rank <= 5 ORDER BY qid, rank""",

    // SQ8: train/encode/dequantize mirrored token-for-token (same
    // IEEE-double op order as the Spark side), then the ann_topk
    // cosine/rank tail over the dequantized corpus
    "q_s_sq8_topk" ->
      s"""WITH $PreparedVecsCte,
          st AS (
            SELECT d, min(v) AS mn, max(v) AS mx FROM (
              SELECT unnest(e) AS v,
                     unnest(range(1, len(e) + 1)) AS d
              FROM n)
            GROUP BY d),
          lim AS (
            SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs
            FROM st),
          dqv AS (
            SELECT vec_id,
                   list_transform(range(1, 65), i ->
                     CASE WHEN mxs[i] - mns[i] > 0
                          THEN mns[i]
                               + least(255.0, greatest(0.0,
                                   floor((e[i] - mns[i]) / (mxs[i] - mns[i])
                                         * 255.0 + 0.5)))
                                 * (mxs[i] - mns[i]) / 255.0
                          ELSE mns[i] END) AS dq
            FROM n, lim),
          dqn AS (
            SELECT vec_id, dq,
                   sqrt(list_dot_product(dq, dq)) AS dqnrm
            FROM dqv),
          q AS (SELECT vec_id AS qid, e AS qe, nrm AS qnrm FROM n WHERE vec_id % 50 = 0),
          p AS (
            SELECT q.qid, c.vec_id AS nn_id,
                   list_dot_product(c.dq, q.qe) / (c.dqnrm * q.qnrm) AS cs
            FROM dqn c CROSS JOIN q WHERE c.vec_id <> q.qid),
          r AS (
            SELECT qid, nn_id, cs,
                   row_number() OVER (PARTITION BY qid ORDER BY cs DESC, nn_id ASC) AS rank
            FROM p)
          SELECT qid, nn_id, floor(cs * 1000000.0 + 0.5) / 1000000.0 AS cos_sim, rank
          FROM r WHERE rank <= 5 ORDER BY qid, rank""",

    // Both Lloyd rounds unrolled; init == the q_s_ann_ivf md5-ranked
    // sample, so the hash compare proves init, both assigns, both
    // mean/renorm/round recomputes, and the final partition map.
    "q_s_ivf_train" ->
      s"""WITH $PreparedVecsCte,
          dm AS (SELECT unnest(range(64)) AS d),
          u AS (SELECT vec_id, list_transform(e, x -> x / nrm) AS u FROM n),
          c0 AS (
            SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS cid,
                   list_transform(e, x -> x / nrm) AS c
            FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
          ${lloydRoundCte("c0", "a0", "cell1", "m1", "c1")},
          ${lloydRoundCte("c1", "a1", "cell2", "m2", "c2")},
          fin AS (
            SELECT vec_id, cid AS list_id, cr FROM (
              SELECT n.vec_id, c2.cid,
                     list_dot_product(n.e, c2.c) / n.nrm AS cr,
                     row_number() OVER (PARTITION BY n.vec_id
                       ORDER BY list_dot_product(n.e, c2.c) DESC, c2.cid ASC) AS rn
              FROM n CROSS JOIN c2) WHERE rn = 1),
          sz AS (SELECT list_id, count(*) AS list_size FROM fin GROUP BY 1)
          SELECT fin.vec_id, fin.list_id, sz.list_size,
                 floor(fin.cr * 1000000.0 + 0.5) / 1000000.0 AS cos_c
          FROM fin JOIN sz USING (list_id) ORDER BY vec_id""",

    // Same trained model (c0→c1→c2 unrolled), then the entropy
    // mirror: 1e-6-quantized ln, integer per-cell summands, exact
    // total, and the exp/occ-ratio chains on identical doubles.
    "q_s_cluster_entropy" ->
      s"""WITH $PreparedVecsCte,
          dm AS (SELECT unnest(range(64)) AS d),
          u AS (SELECT vec_id, list_transform(e, x -> x / nrm) AS u FROM n),
          c0 AS (
            SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS cid,
                   list_transform(e, x -> x / nrm) AS c
            FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
          ${lloydRoundCte("c0", "a0", "cell1", "m1", "c1")},
          ${lloydRoundCte("c1", "a1", "cell2", "m2", "c2")},
          fin AS (
            SELECT vec_id, cid AS list_id FROM (
              SELECT n.vec_id, c2.cid,
                     row_number() OVER (PARTITION BY n.vec_id
                       ORDER BY list_dot_product(n.e, c2.c) DESC, c2.cid ASC) AS rn
              FROM n CROSS JOIN c2) WHERE rn = 1),
          cells AS (
            SELECT list_id, CAST(count(*) AS BIGINT) AS n
            FROM fin GROUP BY 1),
          tot AS (
            SELECT CAST(sum(n) AS BIGINT) AS nt,
                   CAST(count(*) AS BIGINT) AS n_lists,
                   CAST(max(n) AS BIGINT) AS max_n
            FROM cells),
          wh AS (
            SELECT list_id, n,
                   CAST(n AS DOUBLE) / CAST(nt AS DOUBLE) AS p_raw,
                   CAST(floor(ln(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE))
                     * 1000000.0 + 0.5) AS BIGINT) AS ln_u,
                   nt, n_lists, max_n
            FROM cells, tot),
          wh2 AS (
            SELECT *,
                   CAST(floor(-p_raw * CAST(ln_u AS DOUBLE) + 0.5)
                     AS BIGINT) AS h_u
            FROM wh),
          ht AS (SELECT CAST(sum(h_u) AS BIGINT) AS h_total_u FROM wh2)
          SELECT list_id, n,
                 floor(p_raw * 1000000.0 + 0.5) / 1000000.0 AS p_share,
                 h_u,
                 CAST(h_total_u AS DOUBLE) / 1000000.0 AS entropy,
                 floor(exp(CAST(h_total_u AS DOUBLE) / 1000000.0)
                   * 1000000.0 + 0.5) / 1000000.0 AS eff_lists,
                 floor(CAST(max_n AS DOUBLE) * CAST(n_lists AS DOUBLE)
                   / CAST(nt AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS occ_ratio
          FROM wh2, ht ORDER BY list_id""",

    // Same trained model as q_s_ivf_train (c0→c1→c2 unrolled), then
    // the within-cluster lower-id cosine prune. Unit vectors and the
    // pair dot mirror the Spark chain op-for-op (list_dot_product ==
    // the DotProduct kernel, both ascending), so the raw >= 0.35
    // compare is cross-engine-exact.
    "q_s_semdedup" ->
      s"""WITH $PreparedVecsCte,
          dm AS (SELECT unnest(range(64)) AS d),
          u AS (SELECT vec_id, list_transform(e, x -> x / nrm) AS u FROM n),
          c0 AS (
            SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) - 1 AS cid,
                   list_transform(e, x -> x / nrm) AS c
            FROM n ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
          ${lloydRoundCte("c0", "a0", "cell1", "m1", "c1")},
          ${lloydRoundCte("c1", "a1", "cell2", "m2", "c2")},
          fin AS (
            SELECT vec_id, cid AS list_id FROM (
              SELECT n.vec_id, c2.cid,
                     row_number() OVER (PARTITION BY n.vec_id
                       ORDER BY list_dot_product(n.e, c2.c) DESC, c2.cid ASC) AS rn
              FROM n CROSS JOIN c2) WHERE rn = 1),
          fu AS (SELECT fin.vec_id, fin.list_id, u.u
                 FROM fin JOIN u USING (vec_id)),
          d AS (
            SELECT b.vec_id, count(*) AS n_dup_lower
            FROM fu b JOIN fu a
              ON a.list_id = b.list_id AND a.vec_id < b.vec_id
            WHERE list_dot_product(a.u, b.u) >= 0.35
            GROUP BY 1)
          SELECT fu.vec_id, fu.list_id,
                 CAST(coalesce(d.n_dup_lower, 0) AS BIGINT) AS n_dup_lower,
                 coalesce(d.n_dup_lower, 0) = 0 AS keep
          FROM fu LEFT JOIN d USING (vec_id) ORDER BY vec_id""",

    "q_d7_topic_merge_embed" ->
      s"""WITH $PreparedVecsCte,
          dm AS (SELECT unnest(range(64)) AS d),
          m AS (
            SELECT n.vec_id % 20 AS topic_id, dm.d AS d,
                   avg(n.e[dm.d + 1]) AS m
            FROM n, dm GROUP BY 1, 2),
          c AS (
            SELECT topic_id, list(m ORDER BY d) AS cent
            FROM m GROUP BY topic_id),
          c2 AS (
            SELECT topic_id, cent,
                   sqrt(list_dot_product(cent, cent)) AS nrm
            FROM c),
          p AS (
            SELECT a.topic_id AS ta, b.topic_id AS tb,
                   list_dot_product(a.cent, b.cent) / (a.nrm * b.nrm) AS cs
            FROM c2 a JOIN c2 b ON a.topic_id < b.topic_id)
          SELECT ta, tb,
                 floor(cs * 1000000.0 + 0.5) / 1000000.0 AS cos_sim,
                 cs >= 0.80 AS merged
          FROM p ORDER BY ta, tb""",

    // summary mirror: 8-token chunk slices, pairwise distinct-token
    // overlap over ln-length denominators (quantized per edge), the
    // same four unrolled iterations, top-2 by (ws DESC, chunk ASC)
    "q_t_textrank_summary" -> {
      def iter(n: Int): String =
        s"""i$n AS (
           SELECT n.doc_id, n.v,
                  0.15 + 0.85 * (coalesce(s.q, 0) / 1000000000.0) AS ws
           FROM nodes n LEFT JOIN (
             SELECT e.doc_id, e.v,
                    sum(CAST(floor(((CAST(e.wq AS DOUBLE) / e.wdeg) * i.ws)
                      * 1000000000.0 + 0.5) AS BIGINT)) AS q
             FROM e JOIN i${n - 1} i
               ON i.doc_id = e.doc_id AND i.v = e.u
             GROUP BY e.doc_id, e.v) s
           ON s.doc_id = n.doc_id AND s.v = n.v)"""
      s"""WITH tk AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\\s+'),
                    x -> x <> '') AS toks
           FROM documents),
         ch AS (
           SELECT doc_id, unnest(range((len(toks) + 7) // 8)) AS ci, toks
           FROM tk),
         cs AS (
           SELECT doc_id, CAST(ci AS INT) AS ci,
                  list_slice(toks, ci * 8 + 1, ci * 8 + 8) AS ctoks
           FROM ch),
         cf AS (
           SELECT doc_id, ci, ctoks, len(ctoks) AS n,
                  list_distinct(ctoks) AS dt
           FROM cs),
         pr AS (
           SELECT a.doc_id, a.ci AS u, b.ci AS v,
                  len(list_intersect(a.dt, b.dt)) AS ov,
                  a.n AS na, b.n AS nb
           FROM cf a JOIN cf b
             ON a.doc_id = b.doc_id AND a.ci <> b.ci
           WHERE a.n > 1 AND b.n > 1),
         e0 AS (
           SELECT doc_id, u, v,
                  CAST(floor((CAST(ov AS DOUBLE)
                      / (ln(CAST(na AS DOUBLE)) + ln(CAST(nb AS DOUBLE))))
                    * 1000000000.0 + 0.5) AS BIGINT) AS wq
           FROM pr WHERE ov > 0),
         ed AS (SELECT * FROM e0 WHERE wq > 0),
         dg AS (SELECT doc_id, u, sum(wq) AS wdeg FROM ed GROUP BY doc_id, u),
         e AS (
           SELECT ed.doc_id, ed.u, ed.v, ed.wq, dg.wdeg
           FROM ed JOIN dg USING (doc_id, u)),
         nodes AS (SELECT doc_id, ci AS v FROM cf),
         i0 AS (SELECT doc_id, v, 1.0 AS ws FROM nodes),
         ${(1 to 4).map(iter).mkString(",\n")},
         r AS (
           SELECT i4.doc_id, i4.v, i4.ws,
                  row_number() OVER (PARTITION BY i4.doc_id
                    ORDER BY i4.ws DESC, i4.v ASC) AS rank
           FROM i4)
         SELECT r.doc_id, r.v AS chunk_idx,
                array_to_string(cf.ctoks, ' ') AS summary,
                floor(r.ws * 1000000.0 + 0.5) / 1000000.0 AS score, r.rank
         FROM r JOIN cf ON cf.doc_id = r.doc_id AND cf.ci = r.v
         WHERE r.rank <= 2 ORDER BY r.doc_id, r.rank"""
    },

    // TextRank mirror: adjacency pairs by position self-join, both
    // directions with multiplicity, wdeg per node, then the SAME four
    // synchronous iterations (fixed-point 1e-9 neighbor sums, the
    // Lloyd unroll convention), rank on the unrounded final score
    "q_t_textrank" -> {
      def iter(n: Int): String =
        s"""i$n AS (
           SELECT n.doc_id, n.v,
                  0.15 + 0.85 * (coalesce(s.q, 0) / 1000000000.0) AS ws
           FROM nodes n LEFT JOIN (
             SELECT e.doc_id, e.v,
                    sum(CAST(floor(((CAST(e.w AS DOUBLE) / e.wdeg) * i.ws)
                      * 1000000000.0 + 0.5) AS BIGINT)) AS q
             FROM e JOIN i${n - 1} i
               ON i.doc_id = e.doc_id AND i.v = e.u
             GROUP BY e.doc_id, e.v) s
           ON s.doc_id = n.doc_id AND s.v = n.v)"""
      s"""WITH tk AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\\s+'),
                    x -> x <> '') AS toks
           FROM documents),
         pos AS (
           SELECT doc_id, unnest(toks) AS w,
                  unnest(range(len(toks))) AS p
           FROM tk),
         pr AS (
           SELECT a.doc_id, a.w AS x, b.w AS y
           FROM pos a JOIN pos b
             ON b.doc_id = a.doc_id AND b.p = a.p + 1
           WHERE a.w <> b.w),
         ed AS (
           SELECT doc_id, u, v, count(*) AS w FROM (
             SELECT doc_id, x AS u, y AS v FROM pr
             UNION ALL
             SELECT doc_id, y AS u, x AS v FROM pr)
           GROUP BY doc_id, u, v),
         dg AS (SELECT doc_id, u, sum(w) AS wdeg FROM ed GROUP BY doc_id, u),
         e AS (
           SELECT ed.doc_id, ed.u, ed.v, ed.w, dg.wdeg
           FROM ed JOIN dg USING (doc_id, u)),
         nodes AS (SELECT DISTINCT doc_id, unnest(toks) AS v FROM tk),
         i0 AS (SELECT doc_id, v, 1.0 AS ws FROM nodes),
         ${(1 to 4).map(iter).mkString(",\n")},
         r AS (
           SELECT doc_id, v AS keyword, ws,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY ws DESC, v ASC) AS rank
           FROM i4)
         SELECT doc_id, keyword,
                floor(ws * 1000000.0 + 0.5) / 1000000.0 AS score, rank
         FROM r WHERE rank <= 3 ORDER BY doc_id, rank"""
    },

    "q_t_langid" -> {
      val (scores, best, cases) = langIdSqlParts("toks")
      s"""WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
            FROM documents),
          sc AS (
            SELECT doc_id, len(toks) AS n,
                  $scores
            FROM t),
          b AS (SELECT *, $best AS best FROM sc)
          SELECT doc_id,
                 CASE $cases ELSE 'und' END AS lang,
                 CASE WHEN n > 0 THEN floor(CAST(best AS DOUBLE) / n * 10000.0 + 0.5) / 10000.0 ELSE 0.0 END AS conf
          FROM b ORDER BY doc_id"""
    },

    "q_t_quality" ->
      s"""WITH t AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
            FROM documents)
          SELECT doc_id, ${qualitySql("toks")} AS quality
          FROM t ORDER BY doc_id""",

    // blocks → per-gap Jaccard at 1e-6 → valley depths → the strict
    // depth·n > Σdepth rule, all integer — mirrored index-for-index
    "q_t_text_tiling" ->
      """WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '') AS toks
           FROM documents),
         b AS (
           SELECT doc_id,
                  list_transform(range(CAST(ceil(len(toks) / 10.0) AS BIGINT)),
                    i -> list_distinct(list_slice(toks,
                      CAST(i * 10 + 1 AS INT),
                      CAST(least(len(toks), i * 10 + 10) AS INT)))) AS blocks
           FROM t),
         s AS (
           SELECT doc_id, len(blocks) AS nb,
                  list_transform(range(1, len(blocks)), g ->
                    CAST(floor(CAST(len(list_intersect(blocks[g], blocks[g + 1])) AS DOUBLE)
                      / len(list_distinct(blocks[g] || blocks[g + 1]))
                      * 1000000.0 + 0.5) AS BIGINT)) AS sims
           FROM b),
         d AS (
           SELECT doc_id, nb, len(sims) AS ng,
                  list_transform(range(1, len(sims) + 1), j ->
                      greatest(0, CASE WHEN j > 1 THEN sims[CAST(j - 1 AS INT)] - sims[CAST(j AS INT)] ELSE 0 END)
                    + greatest(0, CASE WHEN j < len(sims) THEN sims[CAST(j + 1 AS INT)] - sims[CAST(j AS INT)] ELSE 0 END)) AS depths
           FROM s),
         f AS (
           SELECT doc_id, nb, ng, depths,
                  coalesce(list_sum(depths), 0) AS sd
           FROM d),
         g AS (
           SELECT doc_id, nb, ng,
                  list_filter(range(1, ng + 1), j ->
                    depths[CAST(j AS INT)] > 0
                    AND depths[CAST(j AS INT)] * ng > sd) AS bounds
           FROM f)
         SELECT doc_id, CAST(nb AS INT) AS n_blocks, CAST(ng AS INT) AS n_gaps,
                -- array_to_string of an EMPTY list is NULL in DuckDB
                coalesce(array_to_string(list_transform(bounds,
                  x -> CAST(x AS VARCHAR)), ','), '') AS boundaries,
                CAST(len(bounds) + 1 AS INT) AS n_segments
         FROM g ORDER BY doc_id""",

    // the same tiling chain up to `bounds`, then segment offset lists
    // and the stride windows re-derived per segment
    "q_c_chunking_semantic" ->
      """WITH t AS (
           SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '') AS toks
           FROM documents),
         b AS (
           SELECT doc_id,
                  list_transform(range(CAST(ceil(len(toks) / 10.0) AS BIGINT)),
                    i -> list_distinct(list_slice(toks,
                      CAST(i * 10 + 1 AS INT),
                      CAST(least(len(toks), i * 10 + 10) AS INT)))) AS blocks
           FROM t),
         s AS (
           SELECT doc_id, len(blocks) AS nb,
                  list_transform(range(1, len(blocks)), g ->
                    CAST(floor(CAST(len(list_intersect(blocks[g], blocks[g + 1])) AS DOUBLE)
                      / len(list_distinct(blocks[g] || blocks[g + 1]))
                      * 1000000.0 + 0.5) AS BIGINT)) AS sims
           FROM b),
         d AS (
           SELECT doc_id, nb, len(sims) AS ng,
                  list_transform(range(1, len(sims) + 1), j ->
                      greatest(0, CASE WHEN j > 1 THEN sims[CAST(j - 1 AS INT)] - sims[CAST(j AS INT)] ELSE 0 END)
                    + greatest(0, CASE WHEN j < len(sims) THEN sims[CAST(j + 1 AS INT)] - sims[CAST(j AS INT)] ELSE 0 END)) AS depths
           FROM s),
         f AS (
           SELECT doc_id, nb, ng, depths,
                  coalesce(list_sum(depths), 0) AS sd
           FROM d),
         g AS (
           SELECT doc_id,
                  list_filter(range(1, ng + 1), j ->
                    depths[CAST(j AS INT)] > 0
                    AND depths[CAST(j AS INT)] * ng > sd) AS bounds
           FROM f),
         seg AS (
           SELECT t.doc_id, t.toks,
                  list_concat(list_concat([CAST(0 AS BIGINT)],
                    list_transform(g.bounds, x -> CAST(x * 10 AS BIGINT))),
                    [CAST(len(t.toks) AS BIGINT)]) AS offs
           FROM g JOIN t USING (doc_id)),
         ex AS (
           SELECT doc_id, toks,
                  offs[CAST(si + 1 AS INT)] AS st,
                  offs[CAST(si + 2 AS INT)] AS en,
                  CAST(si AS INT) AS seg_idx
           FROM (SELECT *, unnest(range(len(offs) - 1)) AS si FROM seg)),
         ck AS (
           SELECT doc_id, seg_idx, toks, st, en,
                  unnest(range((en - st - 1) // 12 + 1)) AS k
           FROM ex WHERE en > st)
         SELECT doc_id, seg_idx, CAST(k AS INT) AS chunk_idx,
                CAST(st + k * 12 AS INT) AS tok_start,
                CAST(least(en, st + k * 12 + 16) - (st + k * 12) AS INT) AS n_toks,
                array_to_string(list_slice(toks,
                  CAST(st + k * 12 + 1 AS INT),
                  CAST(least(en, st + k * 12 + 16) AS INT)), ' ') AS chunk
         FROM ck ORDER BY doc_id, seg_idx, chunk_idx""",

    // Non-distinct n-gram counts rebuilt by slice-expansion; top-1 by
    // (count DESC, gram ASC); short docs fall back to ('', 0, 0.0).
    "q_t_repetition" -> {
      def part(n: Int, tag: String) =
        s"""g$tag AS (
              SELECT doc_id, ng, count(*) AS c
              FROM (SELECT doc_id,
                           array_to_string(list_slice(toks, i + 1, i + $n), ' ') AS ng
                    FROM (SELECT doc_id, toks, unnest(range(len(toks) - ${n - 1})) AS i
                          FROM t WHERE len(toks) >= $n))
              GROUP BY 1, 2),
            b$tag AS (
              SELECT doc_id, ng, c,
                     row_number() OVER (PARTITION BY doc_id
                       ORDER BY c DESC, ng ASC) AS rn
              FROM g$tag)"""
      s"""WITH t AS (
            SELECT doc_id, text,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS toks
            FROM documents),
          ${part(2, "2")},
          ${part(3, "3")}
          SELECT t.doc_id,
                 coalesce(b2.ng, '') AS top2,
                 CAST(coalesce(b2.c, 0) AS BIGINT) AS n2,
                 floor(CAST(coalesce(b2.c, 0) * length(coalesce(b2.ng, '')) AS DOUBLE)
                   / CAST(length(t.text) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS frac2,
                 coalesce(b3.ng, '') AS top3,
                 CAST(coalesce(b3.c, 0) AS BIGINT) AS n3,
                 floor(CAST(coalesce(b3.c, 0) * length(coalesce(b3.ng, '')) AS DOUBLE)
                   / CAST(length(t.text) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS frac3
          FROM t
          LEFT JOIN b2 ON b2.doc_id = t.doc_id AND b2.rn = 1
          LEFT JOIN b3 ON b3.doc_id = t.doc_id AND b3.rn = 1
          ORDER BY t.doc_id"""
    },

    "q_t_token_counts" ->
      """SELECT doc_id,
                len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS n_ws,
                len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS n_bpe,
                CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS n_est
         FROM documents ORDER BY doc_id""",

    "q_t_fingerprint" ->
      s"""WITH $ShinglesCte
          SELECT d.doc_id, md5(d.text) AS fp,
                 list_min(list_transform(s.sh, x -> md5(x))) AS min_shingle_fp
          FROM documents d JOIN sh s ON d.doc_id = s.doc_id
          ORDER BY d.doc_id""",

    // range(1, len) is [1, len) = Spark sequence(1, len-1) inclusive;
    // substr is 1-based chars on both engines
    "q_t_bpe_pairs" ->
      """WITH w AS (
           SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                    x -> x <> '')) AS word
           FROM documents),
         wc AS (
           SELECT word, count(*) AS n FROM w
           WHERE length(word) >= 2 GROUP BY word),
         pp AS (
           SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, n
           FROM (SELECT word, n, unnest(range(1, length(word))) AS i
                 FROM wc))
         SELECT pair, CAST(sum(n) AS BIGINT) AS pair_count,
                row_number() OVER (ORDER BY sum(n) DESC, pair ASC) AS rn
         FROM pp GROUP BY pair
         QUALIFY rn <= 50 ORDER BY rn"""
  )
}
