package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The TRAINED language identifier — L10's committed-artifact form
  * (the F12/L30 pattern, seventh model artifact): a multiclass logistic
  * regression over hashed code-point char-trigram buckets
  * ([[graft.expressions.LangIdTrainedOps]] — the feature rule shared
  * by [[graft.TrainLangid]] and serving, mirrored in SQL by the
  * `q_t_langid_trained` oracle), beside the rules path
  * ([[TextAnalysis.langId]]'s stopword argmax). Char n-grams are the
  * published langid feature family (Cavnar–Trenkle n-gram profiles /
  * fastText's hashed grams): they see MORPHOLOGY, not just function
  * words, so short or stopword-poor text that defeats the lexicon
  * argmax still carries signal.
  *
  * One map-side codegen'd kernel call per row — all five languages
  * scored in a single gram pass; integer 1e-6 fixed point end to end.
  */
object LangIdModel {

  val Langs: Seq[String] = TextAnalysis.Stopwords.map(_._1)

  /** Per-language 20-word lexicons (the rules stopwords + ten common
    * content words each — public basic vocabulary): the deterministic
    * sentence material the trainer AND the gate fixture draw from, so
    * the planted-language ground truth is defined once.
    */
  val Vocab: Seq[Seq[String]] = {
    val content = Map(
      "en" -> Seq("house", "water", "day", "time", "people", "year",
        "good", "new", "world", "life"),
      "es" -> Seq("casa", "agua", "dia", "tiempo", "gente", "ano",
        "bueno", "nuevo", "mundo", "vida"),
      "fr" -> Seq("maison", "eau", "jour", "temps", "gens", "annee",
        "bon", "nouveau", "monde", "vie"),
      "de" -> Seq("haus", "wasser", "tag", "zeit", "leute", "jahr",
        "gut", "neu", "welt", "leben"),
      "zh" -> Seq("房子", "水", "天", "时间", "人们", "年", "好", "新",
        "世界", "生活"))
    TextAnalysis.Stopwords.map { case (l, ws) => ws ++ content(l) }
  }

  /** The gate fixture AS A PLAIN FUNCTION — the single source of the
    * sentence rule (lang = d%5, 8+(d%7) tokens, token i =
    * vocab[(d·13 + i·7) % 20]); [[plantedText]] is its Column form,
    * the oracle's list_transform its SQL form, and the trainer's
    * held-out check and the spec consume THIS one so a constant
    * change cannot silently decouple them.
    */
  def plantedSentence(d: Long): (Int, String) = {
    val lang = (d % 5).toInt
    val s = (0 until (8 + d % 7).toInt)
      .map(i => Vocab(lang)(((d * 13 + i * 7) % 20).toInt)).mkString(" ")
    (lang, s)
  }

  /** [[plantedSentence]] as pure Column arithmetic, mirrored verbatim
    * in the oracle's list_transform.
    */
  def plantedText(id: Column): Column = {
    val vocabArr = array(Vocab.map(ws => array(ws.map(lit): _*)): _*)
    val lv = element_at(vocabArr, (id % 5 + 1).cast("int"))
    concat_ws(" ", transform(sequence(lit(0), (lit(7) + id % 7)),
      i => element_at(lv, ((id * 13 + i * 7) % 20 + 1).cast("int"))))
  }

  /** The planted ground-truth language. */
  def plantedLang(id: Column): Column =
    element_at(array(Langs.map(lit): _*), (id % 5 + 1).cast("int"))

  val Resource = "/graft/langid-lr-v1.tsv"
  val NBuckets = 256

  /** (per-language 1e-6 fixed-point biases, per-language dense
    * weight arrays of NBuckets) from the committed artifact.
    */
  def loadArtifact(): (Array[Long], Array[Array[Long]]) = {
    val in = getClass.getResourceAsStream(Resource)
    require(in != null, s"missing model artifact $Resource")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filterNot(l => l.startsWith("#") || l.isEmpty).toVector
    in.close()
    val biases = new Array[Long](Langs.length)
    val w = Array.fill(Langs.length)(new Array[Long](NBuckets))
    lines.foreach { l =>
      val parts = l.split("\t", 3)
      if (parts(0) == "__bias__") biases(Langs.indexOf(parts(1))) =
        parts(2).toLong
      else w(Langs.indexOf(parts(0)))(parts(1).toInt) = parts(2).toLong
    }
    (biases, w)
  }

  private lazy val artifact: (Array[Long], Array[Array[Long]]) =
    loadArtifact()

  /** Per-row trained language verdict: adds
    * (lang_trained, z_best, margin, n_grams) — one codegen'd kernel
    * call, all five languages in one gram pass.
    */
  def classifyTrained(df: DataFrame, textCol: String): DataFrame = {
    val (biases, w) = artifact
    val s = graft.expressions.ShingleFunctions.langIdTrained(
      col(textCol), w, biases)
    df.withColumn("__lid", s)
      .withColumn("lang_trained", element_at(array(Langs.map(lit): _*),
        (col("__lid.best_idx") + 1).cast("int")))
      .withColumn("z_best", col("__lid.z_best"))
      .withColumn("margin", col("__lid.margin"))
      .withColumn("n_grams", col("__lid.n_grams"))
      .drop("__lid")
  }
}
