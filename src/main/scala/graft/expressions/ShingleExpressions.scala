package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingles as a native kernel.
  *
  * The composable formulation — `transform(sequence(...), i →
  * concat_ws(element_at(toks, i), ...))` — re-evaluates the token
  * split for EVERY element_at of every shingle (HOF lambdas evaluate
  * child expressions per element): measured 17 s for one pass over
  * 5 000 documents at sf0.1. This kernel tokenizes once per row and
  * emits the distinct shingle set in first-occurrence order, matching
  * `array_distinct` semantics and the DuckDB oracle's
  * `list_distinct(list_transform(...))` construction exactly.
  */
object ShingleOps {

  /** Lowercase (UTF8String semantics == Spark's `lower`), split on
    * whitespace, join each n consecutive tokens with ' ', dedup
    * preserving first occurrence.
    */
  def shingles(input: UTF8String, n: Int): ArrayData = {
    val toks0 = input.toLowerCase.toString.split("\\s+")
    val toks = toks0.filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    val last = toks.length - n
    val sb = new java.lang.StringBuilder(64)
    while (i <= last) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** EVERY word n-gram occurrence, in order, WITHOUT dedup — the
    * frequency-mining base (corpus-level phrase counting needs
    * multiplicity; the distinct form above is the set-semantics base
    * for MinHash/Jaccard). Same tokenize-once discipline.
    */
  def shinglesAll(input: UTF8String, n: Int): ArrayData = {
    val toks = input.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ShingleOps$$.MODULE$$.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** [[ShingleOps.shinglesAll]] as an expression: every n-gram
  * occurrence with multiplicity (no dedup) — the frequency-mining
  * counterpart of [[WordShingles]].
  */
case class WordShinglesAll(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles_all"

  override protected def nullSafeEval(input: Any): Any =
    ShingleOps.shinglesAll(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.ShingleOps$$.MODULE$$.shinglesAll($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesAll =
    copy(child = newChild)
}

/** F7 keyword priority ordering as a native kernel (reference
  * api/events.py:244-310): tokens = lowercase whitespace words;
  * `$cashtags` first, then 2-3-char words, then the rest; ordered
  * dedup; top-K; joined with ','.
  *
  * The composable formulation (three `filter` HOFs + concat + a
  * positional-dedup `filter` whose `array_position` is O(n) per
  * element) is interpreted per element AND re-evaluates the token
  * split per element — it was the slowest query in the first honest
  * bench (full-evaluation timing). One static call per row instead.
  */
object KeywordPriorityOps {

  def select(input: UTF8String, topK: Int): UTF8String = {
    val toks = input.toLowerCase.toString.split("\\s+")
    val seen = new java.util.LinkedHashSet[String](16)
    // three passes in priority order — dedup keeps the first (highest
    // priority) occurrence, matching the oracle's positional dedup
    var p = 0
    while (p < 3) {
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (t.nonEmpty) {
          val isTag = t.charAt(0) == '$'
          val isShort = !isTag && t.length >= 2 && t.length <= 3
          val hit = p match {
            case 0 => isTag
            case 1 => isShort
            case _ => !isTag && !isShort
          }
          if (hit) seen.add(t)
        }
        i += 1
      }
      p += 1
    }
    val sb = new java.lang.StringBuilder(64)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext && j < topK) {
      if (j > 0) sb.append(',')
      sb.append(it.next())
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class KeywordPriority(child: Expression, topK: Int) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "keyword_priority"

  override protected def nullSafeEval(input: Any): Any =
    KeywordPriorityOps.select(input.asInstanceOf[UTF8String], topK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.KeywordPriorityOps$$.MODULE$$.select($c, $topK)")

  override protected def withNewChildInternal(newChild: Expression): KeywordPriority =
    copy(child = newChild)
}

/** F11 lexicon sentiment as a native kernel (reference
  * api/rules_sentiment.py:5-84): `\w+` word tokens over the lowercased
  * text; score = clamp((pos-neg)/n_tokens·3, -1, 1). One regex pass
  * per row — the composable `regexp_extract_all` + two
  * `filter(isInCollection)` HOFs re-evaluated the token array per
  * element, interpreted (7.6 s at sf0.1 under full-evaluation
  * timing). A token present in BOTH lexicons counts in both tallies,
  * exactly like the reference's two independent membership sums.
  */
object SentimentOps {
  private val Word = java.util.regex.Pattern.compile("\\w+")

  def score(text: UTF8String, pos: java.util.Set[String],
      neg: java.util.Set[String]): Double = {
    val m = Word.matcher(text.toLowerCase.toString)
    var n = 0
    var p = 0
    var q = 0
    while (m.find()) {
      n += 1
      val t = m.group()
      if (pos.contains(t)) p += 1
      if (neg.contains(t)) q += 1
    }
    if (n == 0) 0.0
    else math.max(-1.0, math.min(1.0, (p - q).toDouble / n * 3.0))
  }
}

/** Language-ID as a native kernel: one tokenization pass counting hits
  * for EVERY language lexicon plus the token total, then the
  * priority-ordered argmax and conf = roundHalfUp(best/n, 4) — all
  * inside the call, because any column-level composition over a shared
  * hits array gets re-inlined by CollapseProject into one kernel call
  * PER REFERENCE. Returns struct(lang, conf). Arithmetic mirrors
  * Parity.roundHalfUp exactly (floor(x·10⁴+0.5)/10⁴ on the same
  * doubles).
  */
object LangIdOps {
  def langConf(text: UTF8String, langs: Array[String],
      lexicons: Array[java.util.Set[String]]): InternalRow = {
    val toks = text.toLowerCase.toString.split("\\s+")
    val counts = new Array[Int](lexicons.length)
    var n = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        n += 1
        var l = 0
        while (l < lexicons.length) {
          if (lexicons(l).contains(t)) counts(l) += 1
          l += 1
        }
      }
      i += 1
    }
    var best = 0
    var bestIdx = -1
    var l = 0
    while (l < counts.length) {
      if (counts(l) > best) { best = counts(l); bestIdx = l } // strict >: first wins ties
      l += 1
    }
    val lang = if (best > 0) langs(bestIdx) else "und"
    val conf =
      if (n > 0) math.floor(best.toDouble / n * 10000.0 + 0.5) / 10000.0
      else 0.0
    new GenericInternalRow(Array[Any](UTF8String.fromString(lang), conf))
  }
}

case class LangIdExpr(child: Expression, langs: Seq[String],
    lexicons: Seq[Seq[String]]) extends UnaryExpression {

  private lazy val langsArr = langs.toArray
  private lazy val lexArr = lexicons.map { ws =>
    val s = new java.util.HashSet[String](ws.size * 2)
    ws.foreach(s.add)
    s: java.util.Set[String]
  }.toArray

  override def dataType: DataType = StructType(Seq(
    StructField("lang", StringType, nullable = false),
    StructField("conf", org.apache.spark.sql.types.DoubleType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    LangIdOps.langConf(input.asInstanceOf[UTF8String], langsArr, lexArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ls = ctx.addReferenceObj("langs", langsArr, "String[]")
    val lx = ctx.addReferenceObj("lexicons", lexArr, "java.util.Set[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.LangIdOps$$.MODULE$$.langConf($c, $ls, $lx)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** Gopher-style repetition probe: the most frequent word n-gram per
  * document (count DESC, gram ASC on ties) in ONE tokenization pass —
  * the HOF formulation (non-distinct shingle build → explode →
  * re-aggregate) would cost two shuffles and per-element interpreted
  * lambdas; this is map-side and codegen'd.
  */
object TopNgramOps {
  def top(text: UTF8String, n: Int): InternalRow = {
    val toks0 = text.toLowerCase.toString.split("\\s+")
    val toks = toks0.filter(_.nonEmpty)
    if (toks.length < n)
      return new GenericInternalRow(Array[Any](UTF8String.fromString(""), 0))
    val counts = new java.util.HashMap[String, Integer](toks.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      counts.merge(sb.toString, 1, (a, b) => a + b)
      i += 1
    }
    var bestGram: String = null
    var bestCnt = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      if (c > bestCnt || (c == bestCnt && e.getKey.compareTo(bestGram) < 0)) {
        bestCnt = c
        bestGram = e.getKey
      }
    }
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(bestGram), bestCnt))
  }
}

case class TopNgram(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("gram", StringType, nullable = false),
    StructField("cnt", org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "top_ngram"

  override protected def nullSafeEval(input: Any): Any =
    TopNgramOps.top(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TopNgramOps$$.MODULE$$.top($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): TopNgram =
    copy(child = newChild)
}

case class LexiconSentiment(child: Expression, pos: Seq[String],
    neg: Seq[String]) extends UnaryExpression {

  private def toJava(xs: Seq[String]): java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](xs.size * 2)
    xs.foreach(s.add)
    s
  }
  private lazy val posSet = toJava(pos)
  private lazy val negSet = toJava(neg)

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lexicon_sentiment"

  override protected def nullSafeEval(input: Any): Any =
    SentimentOps.score(input.asInstanceOf[UTF8String], posSet, negSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("posSet", posSet, "java.util.Set<String>")
    val n = ctx.addReferenceObj("negSet", negSet, "java.util.Set<String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.SentimentOps$$.MODULE$$.score($c, $p, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): LexiconSentiment =
    copy(child = newChild)
}

/** F16 entity normalization as one kernel (reference
  * api/services/topic_analyzer.py:17-69): first-k whitespace tokens →
  * synonym map → stop-term removal → order-preserving dedup → joined
  * string. The column composition (slice → transform(element_at) →
  * filter → positional-dedup filter) nests four HOF lambdas, each
  * re-evaluating its child chain PER ELEMENT interpreted — the same
  * multiplicative trap as keyword priority (spark4 perf notes).
  */
object EntityNormOps {
  def normalize(text: UTF8String, syn: java.util.Map[String, String],
      stops: java.util.Set[String], k: Int): UTF8String = {
    val toks = text.toLowerCase.toString.split("\\s+")
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    var taken = 0
    while (i < toks.length && taken < k) {
      val t = toks(i)
      if (t.nonEmpty) {
        taken += 1
        val mapped = syn.getOrDefault(t, t)
        if (!stops.contains(mapped)) seen.add(mapped)
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(64)
    val it = seen.iterator()
    var first = true
    while (it.hasNext) {
      if (!first) sb.append(',')
      sb.append(it.next())
      first = false
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Heuristic document quality score in one pass (Gopher/C4-style
  * length / repetition / stopword-density gates):
  * 0.3·min(n/100,1) + 0.3·uniq_ratio + 0.2·min(5·stop_ratio,1)
  * + 0.2·min(avg_len/8,1), roundHalfUp 4. The column form nested
  * `aggregate(transform(tokens))` + `array_distinct` + a stopword
  * filter, re-tokenizing per element interpreted. Float-op order
  * mirrors the original Column chain exactly (left-assoc sums, same
  * divisions), so results are bit-identical; token length counts CODE
  * POINTS (Spark `length` / DuckDB `length` semantics, not UTF-16
  * units).
  */
object QualityOps {
  def score(text: UTF8String, stops: java.util.Set[String]): Double = {
    val toks = text.toLowerCase.toString.split("\\s+")
    val uniq = new java.util.HashSet[String]()
    var n = 0
    var stopHits = 0
    var totalLen = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        n += 1
        uniq.add(t)
        if (stops.contains(t)) stopHits += 1
        totalLen += t.codePointCount(0, t.length)
      }
      i += 1
    }
    val nd = n.toDouble
    val score =
      0.3 * math.min(nd / 100.0, 1.0) +
      0.3 * (if (n > 0) uniq.size.toDouble / nd else 0.0) +
      0.2 * math.min((if (n > 0) stopHits.toDouble / nd else 0.0) * 5.0, 1.0) +
      0.2 * math.min((if (n > 0) totalLen.toDouble / nd else 0.0) / 8.0, 1.0)
    math.floor(score * 10000.0 + 0.5) / 10000.0
  }
}

case class QualityScore(child: Expression, stopTerms: Seq[String])
    extends UnaryExpression {

  private lazy val stopSet: java.util.Set[String] = {
    val s = new java.util.HashSet[String](stopTerms.size * 2)
    stopTerms.foreach(s.add)
    s
  }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quality_score"

  override protected def nullSafeEval(input: Any): Any =
    QualityOps.score(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("stopSet", stopSet, "java.util.Set<String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.QualityOps$$.MODULE$$.score($c, $s)")
  }

  override protected def withNewChildInternal(newChild: Expression): QualityScore =
    copy(child = newChild)
}

case class EntityNorm(child: Expression, synonyms: Seq[(String, String)],
    stopTerms: Seq[String], k: Int) extends UnaryExpression {

  private lazy val synMap: java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String](synonyms.size * 2)
    synonyms.foreach { case (a, b) => m.put(a, b) }
    m
  }
  private lazy val stopSet: java.util.Set[String] = {
    val s = new java.util.HashSet[String](stopTerms.size * 2)
    stopTerms.foreach(s.add)
    s
  }

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "entity_norm"

  override protected def nullSafeEval(input: Any): Any =
    EntityNormOps.normalize(input.asInstanceOf[UTF8String], synMap, stopSet, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("synMap", synMap, "java.util.Map<String, String>")
    val s = ctx.addReferenceObj("stopSet", stopSet, "java.util.Set<String>")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.EntityNormOps$$.MODULE$$.normalize($c, $m, $s, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): EntityNorm =
    copy(child = newChild)
}

/** THE feature-hash rule of the hashed-n-gram family — one definition
  * shared by the DSIR buckets, the hash-weight pool, and the
  * trained-weight pool, so a tokenization or hash edit cannot
  * silently desynchronize a trainer from its serving kernel: words =
  * lowercase whitespace split, feature value = first 4 bytes of md5
  * as a big-endian unsigned int (== the SQL
  * `('0x' || substr(md5(f), 1, 8))::BIGINT` every oracle mirrors).
  */
object FeatureHashOps {
  def tokens(text: UTF8String): Array[String] =
    text.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)

  /** First-8-hex-of-md5 as an unsigned 32-bit value; `md` is reused
    * across a document's features (per-call getInstance measured as
    * the dominant cost of the naive form).
    */
  def u32(md: java.security.MessageDigest, feat: String): Long = {
    md.reset()
    val d = md.digest(feat.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}

object FastTextPoolOps {
  /** One tokenize pass: md5-prefix weights for every unigram and
    * bigram, pooled as (n_features, w_sum). Semantics mirror the
    * q_t_quality_classifier oracle: weight = first-8-hex of md5 as a
    * long recentred by 2³¹; bigrams only when the doc has ≥2 tokens.
    * The HOF formulation (transform + aggregate with element_at into
    * a split) re-tokenized per lambda invocation — O(n²) per row and
    * 44 s at sf0.1; this kernel is the single-pass replacement.
    */
  def pool(text: UTF8String): InternalRow = {
    val toks = FeatureHashOps.tokens(text)
    val md = java.security.MessageDigest.getInstance("MD5")
    def w(feat: String): Long = FeatureHashOps.u32(md, feat) - 2147483648L
    var n = 0L
    var s = 0L
    var i = 0
    while (i < toks.length) {
      s += w(toks(i)); n += 1
      if (i + 1 < toks.length) { s += w(toks(i) + " " + toks(i + 1)); n += 1 }
      i += 1
    }
    new GenericInternalRow(Array[Any](n, s))
  }
}

object DsirBucketOps {
  /** Per-doc hashed-ngram bucket histogram for DSIR: one tokenize
    * pass, unigrams + bigrams hashed to `first-8-hex-of-md5 mod
    * nBuckets` (the engine-portable bucket rule — identical to the
    * SQL `conv(substring(md5(ng), 1, 8), 16, 10) % nBuckets`), counts
    * pre-aggregated per doc inside the kernel. Replaces the HOF
    * explode of raw n-gram strings, whose element_at-into-split
    * lambdas re-tokenized per invocation (O(n²) per row — the
    * FastTextPool pathology) and whose md5 went through the
    * per-call-MessageDigest builtin; the digest here is reused across
    * the doc. Returns array<struct<b, cnt>>.
    */
  def buckets(text: UTF8String, nBuckets: Int): ArrayData = {
    val toks = FeatureHashOps.tokens(text)
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new java.util.TreeMap[java.lang.Long, Long]()
    def add(feat: String): Unit = {
      val b = java.lang.Long.valueOf(FeatureHashOps.u32(md, feat) % nBuckets)
      val prev = counts.get(b)
      counts.put(b, if (prev == null) 1L else prev + 1L)
    }
    var i = 0
    while (i < toks.length) {
      add(toks(i))
      if (i + 1 < toks.length) add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    val rows = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      rows(j) = new GenericInternalRow(
        Array[Any](e.getKey.longValue(), e.getValue))
      j += 1
    }
    new GenericArrayData(rows)
  }
}

case class DsirBuckets(child: Expression, nBuckets: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("b", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("cnt", org.apache.spark.sql.types.LongType,
      nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dsir_buckets"

  override protected def nullSafeEval(input: Any): Any =
    DsirBucketOps.buckets(input.asInstanceOf[UTF8String], nBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.DsirBucketOps$$.MODULE$$.buckets($c, $nBuckets)")

  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)
}

object TrainedPoolOps {
  /** One tokenize pass pooling TRAINED per-bucket weights — the
    * production form of [[FastTextPoolOps.pool]] where the weight of
    * a feature comes from a committed model artifact instead of the
    * feature hash itself: every unigram and bigram hashes to
    * `first-8-hex-of-md5 mod weights.length` (the [[FeatureHashOps]]
    * rule SHARED with [[DsirBucketOps]] — the trainer featurizes
    * through that kernel, so trainer and serving cannot drift — and
    * the DuckDB oracle mirrors it in SQL) and contributes the
    * artifact's 1e-6
    * fixed-point weight for that bucket. Integer accumulation —
    * order-free, exact; the sigmoid runs once per row outside.
    */
  def pool(text: UTF8String, weights: Array[Long]): InternalRow = {
    val toks = FeatureHashOps.tokens(text)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = weights.length
    def w(feat: String): Long =
      weights((FeatureHashOps.u32(md, feat) % n).toInt)
    var nf = 0L
    var s = 0L
    var i = 0
    while (i < toks.length) {
      s += w(toks(i)); nf += 1
      if (i + 1 < toks.length) { s += w(toks(i) + " " + toks(i + 1)); nf += 1 }
      i += 1
    }
    new GenericInternalRow(Array[Any](nf, s))
  }
}

object LangIdTrainedOps {
  /** Hashed code-point char-TRIGRAM buckets — the trained langid's
    * feature rule, shared by trainer and serving (the
    * [[DsirBucketOps]] convention) and mirrored in SQL as
    * `('0x' || substr(md5(gram), 1, 8))::BIGINT % nBuckets` over
    * `substr(lower(t), i, 3)`: lowercase first, then every
    * 3-code-point window (code points, not UTF-16 units — DuckDB
    * substr counts characters, and the zh lexicon is multibyte).
    */
  def gramBuckets(text: UTF8String, nBuckets: Int): Array[Int] = {
    val cps = text.toLowerCase.toString.codePoints().toArray
    if (cps.length < 3) return Array.emptyIntArray
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Int](cps.length - 2)
    var i = 0
    while (i < out.length) {
      out(i) = (FeatureHashOps.u32(md, new String(cps, i, 3)) %
        nBuckets).toInt
      i += 1
    }
    out
  }

  /** All languages scored in ONE gram pass: z_l = bias_l + Σ w_l[b].
    * Integer 1e-6 fixed point throughout — order-free, exact; argmax
    * with ties to the LOWEST language index (the rules path's fixed
    * priority order). Returns (best_idx, z_best, margin, n_grams);
    * a text with <3 code points scores biases alone.
    */
  def score(text: UTF8String, weights: Array[Array[Long]],
      biases: Array[Long]): InternalRow = {
    val bs = gramBuckets(text, weights(0).length)
    val z = biases.clone()
    var i = 0
    while (i < bs.length) {
      var l = 0
      while (l < z.length) { z(l) += weights(l)(bs(i)); l += 1 }
      i += 1
    }
    var best = 0
    var l = 1
    while (l < z.length) { if (z(l) > z(best)) best = l; l += 1 }
    var second = Long.MinValue
    l = 0
    while (l < z.length) {
      if (l != best && z(l) > second) second = z(l)
      l += 1
    }
    new GenericInternalRow(Array[Any](best.toLong, z(best),
      z(best) - second, bs.length.toLong))
  }
}

/** Trained language-ID scorer: the committed multiclass artifact
  * rides into generated code as reference objects (5×nBuckets longs —
  * broadcast-sized by construction).
  */
case class LangIdTrained(child: Expression, weights: Array[Array[Long]],
    biases: Array[Long]) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("best_idx", org.apache.spark.sql.types.LongType,
      nullable = false),
    StructField("z_best", org.apache.spark.sql.types.LongType,
      nullable = false),
    StructField("margin", org.apache.spark.sql.types.LongType,
      nullable = false),
    StructField("n_grams", org.apache.spark.sql.types.LongType,
      nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "langid_trained"

  override protected def nullSafeEval(input: Any): Any =
    LangIdTrainedOps.score(input.asInstanceOf[UTF8String], weights, biases)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("lweights", weights, "long[][]")
    val b = ctx.addReferenceObj("lbiases", biases, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.LangIdTrainedOps$$.MODULE$$.score($c, $w, $b)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): LangIdTrained = copy(child = newChild)
}

object TrainedAdmitOps {
  /** Pool + threshold in ONE kernel call: the admission predicate as
    * a single boolean expression, because a pooled-struct projection
    * does NOT survive the optimizer — predicate pushdown substitutes
    * the alias back into the filter, FilterExec performs no
    * subexpression elimination, and the tokenize+hash kernel runs
    * once per textual occurrence (measured 4× in the pushed plan).
    * The score chain is byte-for-byte the classifyTrained chain
    * (σ((bias + w_sum/n)/10⁶) rounded half-up at 6 dp), so the two
    * faces of the model agree on boundary documents.
    */
  def admit(text: UTF8String, weights: Array[Long], bias: Long,
      minScore: Double): Boolean = {
    val pooled = TrainedPoolOps.pool(text, weights)
    val n = pooled.getLong(0)
    val s = pooled.getLong(1)
    n > 0L && {
      val z = (bias.toDouble + s.toDouble / n.toDouble) / 1000000.0
      graft.functions.Parity.roundHalfUpScalar(
        1.0 / (1.0 + math.exp(-z)), 6) >= minScore
    }
  }
}

/** The admission predicate over the trained artifact — boolean out,
  * one kernel evaluation per row by construction.
  */
case class TrainedQualityAdmit(child: Expression, weights: Array[Long],
    bias: Long, minScore: Double) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "trained_quality_admit"

  override protected def nullSafeEval(input: Any): Any =
    TrainedAdmitOps.admit(input.asInstanceOf[UTF8String], weights, bias,
      minScore)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("qweights", weights, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TrainedAdmitOps$$.MODULE$$.admit($c, $w, ${bias}L, $minScore)")
  }

  override protected def withNewChildInternal(newChild: Expression): TrainedQualityAdmit =
    copy(child = newChild)
}

/** Trained-artifact feature pooling: weights ride into generated code
  * as a reference object (one `long[]` per task, broadcast-sized —
  * the bucket space is bounded by construction).
  */
case class TrainedQualityPool(child: Expression, weights: Array[Long])
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_features", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("w_sum", org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "trained_quality_pool"

  override protected def nullSafeEval(input: Any): Any =
    TrainedPoolOps.pool(input.asInstanceOf[UTF8String], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("qweights", weights, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.TrainedPoolOps$$.MODULE$$.pool($c, $w)")
  }

  override protected def withNewChildInternal(newChild: Expression): TrainedQualityPool =
    copy(child = newChild)
}

case class FastTextPool(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_features", org.apache.spark.sql.types.LongType, nullable = false),
    StructField("w_sum", org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fasttext_pool"

  override protected def nullSafeEval(input: Any): Any =
    FastTextPoolOps.pool(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.FastTextPoolOps$$.MODULE$$.pool($c)")

  override protected def withNewChildInternal(newChild: Expression): FastTextPool =
    copy(child = newChild)
}

object ShingleFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def wordShingles(c: Column, n: Int): Column =
    column(WordShingles(expression(c), n))

  def wordShinglesAll(c: Column, n: Int): Column =
    column(WordShinglesAll(expression(c), n))

  def topNgram(c: Column, n: Int): Column =
    column(TopNgram(expression(c), n))

  def fastTextPool(c: Column): Column =
    column(FastTextPool(expression(c)))

  def trainedQualityPool(c: Column, weights: Array[Long]): Column =
    column(TrainedQualityPool(expression(c), weights))

  def trainedQualityAdmit(c: Column, weights: Array[Long], bias: Long,
      minScore: Double): Column =
    column(TrainedQualityAdmit(expression(c), weights, bias, minScore))

  def dsirBuckets(c: Column, nBuckets: Int): Column =
    column(DsirBuckets(expression(c), nBuckets))

  def langIdTrained(c: Column, weights: Array[Array[Long]],
      biases: Array[Long]): Column =
    column(LangIdTrained(expression(c), weights, biases))

  def entityNorm(c: Column, synonyms: Seq[(String, String)],
      stopTerms: Seq[String], k: Int): Column =
    column(EntityNorm(expression(c), synonyms, stopTerms, k))

  def qualityScore(c: Column, stopTerms: Seq[String]): Column =
    column(QualityScore(expression(c), stopTerms))

  def keywordPriority(c: Column, topK: Int): Column =
    column(KeywordPriority(expression(c), topK))

  def lexiconSentiment(c: Column, pos: Seq[String], neg: Seq[String]): Column =
    column(LexiconSentiment(expression(c), pos, neg))

  def langId(c: Column, langs: Seq[String], lexicons: Seq[Seq[String]]): Column =
    column(LangIdExpr(expression(c), langs, lexicons))
}
