package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Parity

/** fastText-style linear quality classifier — the model-based document
  * filter every modern pretraining pipeline runs after the rule-based
  * gates (LLaMA's "wiki-reference" classifier, GPT-3's quality LR):
  * word unigram + bigram features, feature hashing into a bounded
  * bucket space, mean pooling, a linear layer, sigmoid.
  *
  * Two weight sources behind the same plan shape: [[classify]] keeps
  * the hash-derived pseudo-model (uniform in [-2³¹, 2³¹) — the
  * generic-weights gate), and [[classifyTrained]] carries the
  * COMMITTED trained artifact quality-lr-v1.tsv ([[graft.TrainQuality]],
  * round 11 — the fifth artifact retired by the F12/F14/L59/F17
  * pattern): a per-bucket logistic regression whose weights ride into
  * the codegen'd kernel as a reference object. Every other part of the
  * plan (tokenize, hash, pool, squash, threshold) is identical.
  *
  * Scale shape: pure map-side projection, zero shuffles — tokenize,
  * hash and pool run in ONE pass inside the codegen'd
  * [[graft.expressions.FastTextPool]] kernel (the HOF composition
  * re-tokenized per lambda element: O(n²) per row, 44 s at sf0.1 vs
  * <1 s for the kernel). Pooling sums INTEGER weights, so cross-engine
  * parity holds without float-rounding tricks; a single double chain
  * (mean → sigmoid) runs once per row at the end.
  */
object QualityClassifier {

  /** Per-doc classifier score + label.
    *
    * @return (id, n_features, w_sum, score, label) — w_sum is the
    *         integer pooled weight (the order-independent gate
    *         column); score = sigmoid(4 · mean) rounded at 6 dp.
    */
  def classify(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val score = Parity.roundHalfUp(
      lit(1.0) / (lit(1.0) +
        exp(lit(-4.0) * (col("w_sum").cast("double") /
          col("n_features").cast("double") / lit(2147483648.0)))), 6)
    df.select(col(idCol),
        graft.expressions.ShingleFunctions.fastTextPool(col(textCol)).as("p"))
      .select(col(idCol), col("p.n_features").as("n_features"),
        col("p.w_sum").as("w_sum"))
      .filter(col("n_features") > 0L)
      .select(col(idCol), col("n_features"), col("w_sum"),
        score.as("score"),
        when(score >= 0.5, lit("__label__keep"))
          .otherwise(lit("__label__drop")).as("label"))
  }

  /** The planted degradation fixture shared by trainer, gate and
    * oracle (the plantedPii/DSIR convention): every doc_id % 3 == 0
    * document carries one of two deterministic boilerplate tails, so
    * the trained model's job — separate clean from degraded token
    * distributions — is defined once and mirrored byte-for-byte in
    * SQL.
    */
  object Degradation {
    val TailA = " click here free bonus prize winner claim reward now subscribe newsletter offer"
    val TailB = " buy cheap discount limited deal best price order today shipping coupon sale"

    def plant(id: Column, text: Column): Column =
      when(id % 3 === 0,
        concat(text,
          when(id % 2 === 0, lit(TailA)).otherwise(lit(TailB))))
        .otherwise(text)

    /** DuckDB mirror of [[plant]] over (doc_id, text). */
    val SqlPlant: String =
      s"text || CASE WHEN doc_id % 3 = 0 THEN " +
        s"CASE WHEN doc_id % 2 = 0 THEN '$TailA' ELSE '$TailB' END " +
        "ELSE '' END"

    /** keep = clean (not planted). */
    def label(id: Column): Column = (id % 3 =!= 0).cast("int")
  }

  /** The committed TRAINED model (quality-lr-v1.tsv, via
    * [[graft.TrainQuality]]): logistic regression over the hashed
    * unigram+bigram bucket space, 1e-6 fixed-point weights. Bucket
    * rule = first-8-hex-of-md5 mod NBuckets, shared code
    * ([[graft.expressions.FeatureHashOps]]) between the trainer's
    * featurizer and the serving kernel, and re-derived in SQL by the
    * oracle, which joins the artifact's VALUES list.
    */
  object TrainedModel {
    val Resource = "/graft/quality-lr-v1.tsv"
    val NBuckets = 1024

    /** (bias, dense weight array of NBuckets 1e-6 fixed-point longs). */
    def loadArtifact(): (Long, Array[Long]) = {
      val in = getClass.getResourceAsStream(Resource)
      require(in != null, s"missing model artifact $Resource")
      val lines = scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().filterNot(l => l.startsWith("#") || l.isEmpty).toVector
      in.close()
      var bias = Option.empty[Long]
      val w = new Array[Long](NBuckets)
      lines.foreach { l =>
        val Array(k, v) = l.split("\t", 2)
        if (k == "__bias__") bias = Some(v.toLong)
        else w(k.toInt) = v.toLong
      }
      (bias.getOrElse(sys.error(s"$Resource has no __bias__ row")), w)
    }
  }

  /** Streaming-safe ADMISSION filter over the trained artifact: keep
    * rows whose score clears `minScore` (and that have features at
    * all), preserving every input column — the stateless quality gate
    * a production loop runs BEFORE its stateful stages
    * (IngestStreamSpec composes it ahead of the ingest loop: rejected
    * docs never enter the snapshot/fp/label state, and a re-delivered
    * reject simply re-scores map-side, which is cheaper than the
    * snapshot lookup it skips). Pure map-side projection + filter —
    * no shuffle, no watermark, legal in any streaming plan. The whole
    * predicate is ONE boolean kernel expression
    * ([[graft.expressions.TrainedAdmitOps]]), so the tokenize+hash
    * pass runs exactly once per row — a pooled-struct projection does
    * not survive predicate pushdown (the alias substitutes back into
    * the filter, which performs no subexpression elimination) — and
    * the score chain rounds exactly as [[classifyTrained]] does, so
    * the two faces of the model agree on boundary documents at the
    * same threshold.
    */
  def admit(df: DataFrame, textCol: String, minScore: Double): DataFrame = {
    val (bias, w) = TrainedModel.loadArtifact()
    df.filter(graft.expressions.ShingleFunctions
      .trainedQualityAdmit(col(textCol), w, bias, minScore))
  }

  /** Per-doc score under the COMMITTED trained artifact — the
    * production form of [[classify]]: same single-pass tokenize+hash
    * +pool kernel shape, but the pooled weight of each feature is the
    * model's learned bucket weight (integer, exact) instead of the
    * hash stand-in. z = bias + w_sum/n_features (1e-6 fixed point);
    * score = σ(z) at 6 dp; keep at score ≥ 0.5. Map-side, zero
    * shuffle; the weight array rides as a codegen reference object.
    */
  def classifyTrained(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (bias, w) = TrainedModel.loadArtifact()
    classifyWith(df, idCol, textCol, bias, w)
  }

  /** [[classifyTrained]] under an EXPLICIT (bias, weights) model — the
    * RELOAD face of requalification (round-12 verdict stretch item):
    * a scorer retrained offline (TrainQuality.fit over the reference ∪
    * quarantined slices, RetrainRehearsal) serves through the same
    * single-pass kernel without touching the committed artifact, so
    * the drift gate can score against candidate weights
    * (DriftMonitor.GateConfig.model) while artifact PROMOTION stays a
    * human-gated commit — the self-licensing-drift guard documented in
    * COVERAGE.
    */
  def classifyWith(df: DataFrame, idCol: String, textCol: String,
      bias: Long, w: Array[Long]): DataFrame = {
    val z = (lit(bias.toDouble) +
      col("w_sum").cast("double") / col("n_features").cast("double")) /
      lit(1000000.0)
    val score = Parity.roundHalfUp(
      lit(1.0) / (lit(1.0) + exp(-z)), 6)
    df.select(col(idCol),
        graft.expressions.ShingleFunctions
          .trainedQualityPool(col(textCol), w).as("p"))
      .select(col(idCol), col("p.n_features").as("n_features"),
        col("p.w_sum").as("w_sum"))
      .filter(col("n_features") > 0L)
      .select(col(idCol), col("n_features"), col("w_sum"),
        score.as("score"),
        when(score >= 0.5, lit("__label__keep"))
          .otherwise(lit("__label__drop")).as("label"))
  }
}
