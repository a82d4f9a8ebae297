package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY §2.11). Each stays inside
  * whole-stage codegen by emitting a single static-method call — no
  * interpreted UDF wrapping, no serialization of closures.
  */

/** Keyed BLAKE2s hex digest of a string column. Backs event-key v2
  * (reference api/events.py:472-528: 20-byte keyed digest, hex[:40])
  * and the default topic hash (api/events.py:313-341: 6-byte digest).
  */
case class Blake2sHash(child: Expression, digestBytes: Int, key: String)
    extends UnaryExpression {

  private lazy val keyBytes: Array[Byte] =
    key.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "blake2s"

  override protected def nullSafeEval(input: Any): Any =
    Blake2s.hexDigestUtf8(input.asInstanceOf[UTF8String], keyBytes, digestBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("blake2sKey", keyBytes, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.Blake2s.hexDigestUtf8($c, $keyRef, $digestBytes)")
  }

  override protected def withNewChildInternal(newChild: Expression): Blake2sHash =
    copy(child = newChild)
}

/** Unicode NFC normalization (reference api/events.py:380-411 applies
  * NFC inside text normalization — F2). Built-ins cannot express this;
  * `java.text.Normalizer` via a codegen'd static call can.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NfcNormalize$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(input: UTF8String): UTF8String =
    UTF8String.fromString(
      Normalizer.normalize(input.toString, Normalizer.Form.NFC))
}

/** Fused text normalization (F2 — reference api/events.py:380-411):
  * the full chain lowercase → NFC → strip URLs → strip `www.` chunks →
  * strip bare domains → strip @handles → collapse whitespace → trim,
  * as ONE codegen'd static call.
  *
  * Byte-identical to the previous composition of Spark built-ins
  * (`lower` → [[NfcNormalize]] → 4× `regexp_replace` → `trim`), but
  * one UTF8String↔String round-trip and five precompiled
  * `java.util.regex` passes instead of six expression nodes each
  * paying its own conversion — this sits on the streaming hot path
  * (per-post event-key derivation, PostPipeline.toEvidence).
  */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeTextExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.NormalizeTextExpr$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

object NormalizeTextExpr {
  import java.util.regex.Pattern

  // exact patterns + replacement strings of the reference chain
  private val Url = Pattern.compile("https?://\\S+")
  private val Www = Pattern.compile("www\\.\\S+")
  private val Domain = Pattern.compile(
    "\\b[a-zA-Z0-9][a-zA-Z0-9-]*\\.(com|org|net|io|xyz|co|app|tech|ai|dev|finance|eth)[\\s,\\.!?;:]")
  private val Handle = Pattern.compile("@\\w+")
  private val Ws = Pattern.compile("\\s+")

  private def replace(p: Pattern, s: String, r: String): String = {
    val m = p.matcher(s)
    if (m.find()) m.reset().replaceAll(r) else s
  }

  def normalize(input: UTF8String): UTF8String = {
    // `toLowerCase` on UTF8String == Spark's `lower` (UTF8_BINARY)
    var t = input.toLowerCase.toString
    // Java's quick-check makes the normalized (ASCII-dominant) case a
    // scan, not an allocation
    if (!Normalizer.isNormalized(t, Normalizer.Form.NFC))
      t = Normalizer.normalize(t, Normalizer.Form.NFC)
    t = replace(Url, t, "")
    t = replace(Www, t, "")
    t = replace(Domain, t, " ")
    t = replace(Handle, t, "")
    t = replace(Ws, t, " ")
    // Spark `trim` strips only 0x20; after the \s+ collapse the edges
    // hold at most one space each
    var lo = 0
    var hi = t.length
    while (lo < hi && t.charAt(lo) == ' ') lo += 1
    while (hi > lo && t.charAt(hi - 1) == ' ') hi -= 1
    UTF8String.fromString(if (lo == 0 && hi == t.length) t else t.substring(lo, hi))
  }
}

/** URL canonicalization (reference api/events.py:123-173 — F3):
  * http/https/schemeless → https (other schemes kept, lowercased),
  * lowercase + IDN-punycode host, drop default ports (http:80 /
  * https:443 — note an `http://…:80` input keeps `:80`, because the
  * scheme is upgraded to https BEFORE the default-port check, exactly
  * as the reference does), drop fragments, drop tracking params
  * (utm_*, ref, ref_src), sort remaining params by (key, value),
  * collapse trailing slashes on non-root paths. Unparseable input
  * (e.g. invalid port, unbalanced IPv6 bracket) passes through
  * UNCHANGED (reference returns the original url on any exception);
  * only null/empty input yields null.
  */
case class CanonicalUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "canonical_url"

  override protected def nullSafeEval(input: Any): Any =
    CanonicalUrl.canonicalizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val resultTerm = ctx.freshName("canonUrl")
    nullSafeCodeGen(ctx, ev, c => {
      s"""org.apache.spark.unsafe.types.UTF8String $resultTerm =
           graft.expressions.CanonicalUrl$$.MODULE$$.canonicalizeUtf8($c);
         if ($resultTerm == null) { ${ev.isNull} = true; }
         else { ${ev.value} = $resultTerm; }"""
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)
}

object CanonicalUrl {

  def canonicalizeUtf8(input: UTF8String): UTF8String = {
    val s = canonicalize(input.toString)
    if (s == null) null else UTF8String.fromString(s)
  }

  private val SchemeRe = "^([a-zA-Z][a-zA-Z0-9+.\\-]*):(.*)$".r

  /** CPython urllib.parse.uses_netloc — these schemes always render a
    * `//` authority separator, even when the netloc is empty.
    */
  private[expressions] val UsesNetloc: Set[String] = Set(
    "", "ftp", "http", "gopher", "nntp", "telnet", "imap", "wais",
    "file", "mms", "https", "shttp", "snews", "prospero", "rtsp",
    "rtspu", "rtsps", "rsync", "svn", "svn+ssh", "sftp", "nfs", "git",
    "git+ssh", "ws", "wss", "itms-services")

  /** Mirrors reference api/events.py:123-173 `_normalize_url`, which is
    * built on Python's `urlsplit`/`parse_qsl`/`urlunsplit`. Parses
    * directly (not via java.net.URI, whose getHost is null for raw-IDN
    * hosts) so `MÜNCHEN.de` punycodes instead of failing. Any parse
    * failure returns the ORIGINAL string (reference `except: return
    * url`); null/empty input returns null.
    */
  def canonicalize(raw: String): String = {
    if (raw == null || raw.isEmpty) return null
    try {
      val trimmed = raw.trim
      // --- urlsplit ---
      var scheme0 = ""
      var rest = trimmed
      trimmed match {
        case SchemeRe(s, r) => scheme0 = pyLower(s); rest = r
        case _ =>
      }
      var netloc = ""
      if (rest.startsWith("//")) {
        val end = rest.indexWhere(c => c == '/' || c == '?' || c == '#', 2)
        val cut = if (end == -1) rest.length else end
        netloc = rest.substring(2, cut)
        rest = rest.substring(cut)
      }
      val hashIdx = rest.indexOf('#')
      if (hashIdx >= 0) rest = rest.substring(0, hashIdx) // drop fragment
      val qIdx = rest.indexOf('?')
      val (path0, query0) =
        if (qIdx >= 0) (rest.substring(0, qIdx), rest.substring(qIdx + 1))
        else (rest, "")

      // hostname/port à la urlsplit: strip userinfo, lowercase host,
      // brackets delimit IPv6; an invalid port raises (→ passthrough)
      val hostPort = netloc.substring(netloc.lastIndexOf('@') + 1)
      var host = ""
      var port: Int = -1
      if (hostPort.startsWith("[")) {
        val close = hostPort.indexOf(']')
        if (close < 0) throw new IllegalArgumentException("Invalid IPv6 URL")
        host = pyLower(hostPort.substring(1, close))
        val after = hostPort.substring(close + 1)
        if (after.startsWith(":") && after.length > 1) port = parsePort(after.substring(1))
      } else {
        if (hostPort.indexOf(']') >= 0) throw new IllegalArgumentException("Invalid IPv6 URL")
        val ci = hostPort.lastIndexOf(':')
        if (ci >= 0) {
          host = pyLower(hostPort.substring(0, ci))
          val digits = hostPort.substring(ci + 1)
          if (digits.nonEmpty) port = parsePort(digits)
        } else host = pyLower(hostPort)
      }

      // scheme: http/https/missing → https; anything else kept lowercase
      val scheme =
        if (scheme0 == "http" || scheme0 == "https" || scheme0 == "") "https"
        else scheme0

      // IDN punycode with lowercase fallback (reference host.encode('idna'))
      val hostPuny =
        if (host.isEmpty) host
        else try java.net.IDN.toASCII(host) catch { case _: Exception => host }

      // drop default ports — AFTER the https upgrade, as the reference
      // does, so http://…:80 keeps :80
      var netlocOut = hostPuny
      if (port > 0 && !((scheme == "http" && port == 80) ||
          (scheme == "https" && port == 443)))
        netlocOut = s"$hostPuny:$port"

      // query: parse_qsl(keep_blank_values=True) DECODES each field
      // ('+' → space, then %XX percent-unquote, UTF-8 errors=replace),
      // keys lowercase, drop utm_*/ref/ref_src ON THE DECODED KEY (so
      // an encoded `%75tm_x` is still filtered), sort the DECODED
      // (key, value) tuples by code point, then urlencode re-encodes
      // both sides with quote_plus — 'a=b%20c' round-trips to 'a=b+c'
      val kept = query0.split("&").iterator
        .filter(_.nonEmpty)
        .map { seg =>
          val eq = seg.indexOf('=')
          val (rawK, rawV) =
            if (eq >= 0) (seg.substring(0, eq), seg.substring(eq + 1))
            else (seg, "")
          (pyLower(pyUnquotePlus(rawK)), pyUnquotePlus(rawV))
        }
        .filterNot { case (k, _) =>
          k.startsWith("utm_") || k == "ref" || k == "ref_src"
        }
        .toSeq
      val query = kept.sorted(PairOrdering)
        .map { case (k, v) => s"${pyQuotePlus(k)}=${pyQuotePlus(v)}" }
        .mkString("&")

      // path: empty → "/", else collapse trailing slashes (non-root)
      var path = if (path0.isEmpty) "/" else path0
      if (path != "/") path = path.replaceAll("/+$", "")

      // --- urlunsplit (modern CPython: schemes in uses_netloc get
      // '//' even with an EMPTY netloc, so schemeless inputs render
      // as https:///path) ---
      var out = path
      if (netlocOut.nonEmpty ||
          (CanonicalUrl.UsesNetloc.contains(scheme) && !out.startsWith("//"))) {
        if (out.nonEmpty && !out.startsWith("/")) out = "/" + out
        out = "//" + netlocOut + out
      }
      out = scheme + ":" + out
      if (query.nonEmpty) out = out + "?" + query
      out
    } catch {
      case _: Exception => raw
    }
  }

  private def parsePort(digits: String): Int = {
    if (!digits.forall(_.isDigit)) throw new NumberFormatException(digits)
    val p = digits.toInt // non-numeric/oversized ports → ValueError analog
    if (p > 65535) throw new NumberFormatException(digits)
    p
  }

  // ---- CPython urllib.parse field codecs (parse_qsl / urlencode) ----

  /** `parse_qsl` field decode: '+' → ' ' first, then percent-unquote. */
  private[expressions] def pyUnquotePlus(s: String): String =
    pyUnquote(s.replace('+', ' '))

  /** CPython `unquote(s, 'utf-8', errors='replace')`: non-ASCII chars
    * pass through untouched; within each ASCII run, a '%' followed by
    * two hex digits becomes a byte (otherwise it stays a literal '%'),
    * and the run's byte buffer decodes as UTF-8 with U+FFFD
    * replacement. Scanning left-to-right byte-by-byte is equivalent to
    * CPython's split-on-'%' formulation.
    */
  private[expressions] def pyUnquote(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    val n = s.length
    var i = 0
    while (i < n) {
      if (s.charAt(i) > 0x7f) { out.append(s.charAt(i)); i += 1 }
      else {
        var j = i
        while (j < n && s.charAt(j) <= 0x7f) j += 1
        out.append(decodeAsciiRun(s, i, j))
        i = j
      }
    }
    out.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def decodeAsciiRun(s: String, from: Int, until: Int): String = {
    val bytes = new java.io.ByteArrayOutputStream(until - from)
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < until && isHex(s.charAt(i + 1)) &&
          isHex(s.charAt(i + 2))) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { bytes.write(c); i += 1 }
    }
    // JDK UTF-8 decode replaces each maximal invalid subsequence with
    // U+FFFD — same convention CPython's errors='replace' follows
    new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** `quote_plus(s, safe='')`: UTF-8 bytes, space → '+', ALWAYS_SAFE
    * (alnum + `_.-~`) kept, everything else %XX uppercase.
    */
  private[expressions] def pyQuotePlus(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val c = b.toChar
      if (c == ' ') sb.append('+')
      else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
               (c >= '0' && c <= '9') || c == '_' || c == '.' || c == '-' ||
               c == '~') sb.append(c)
      else sb.append(f"%%$b%02X")
      i += 1
    }
    sb.toString
  }

  /** Python `str.lower()`: like Locale.ROOT full lowercasing but
    * WITHOUT Java's contextual final-sigma rule (Python maps every
    * Σ → σ unconditionally), so Σ is pre-substituted.
    */
  private[expressions] def pyLower(s: String): String =
    s.replace('Σ', 'σ').toLowerCase(java.util.Locale.ROOT)

  /** Python tuple sort over decoded strings compares by CODE POINT;
    * Java's String.compareTo compares UTF-16 units, which misorders
    * supplementary chars against U+E000..U+FFFF.
    */
  private[expressions] val PyStringOrdering: Ordering[String] =
    (a: String, b: String) => {
      val la = a.length; val lb = b.length
      var i = 0
      var res = 0
      while (res == 0 && i < la && i < lb) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(i)
        if (ca != cb) res = Integer.compare(ca, cb)
        else i += Character.charCount(ca)
      }
      if (res != 0) res else Integer.compare(la, lb)
    }

  private val PairOrdering: Ordering[(String, String)] =
    Ordering.Tuple2(PyStringOrdering, PyStringOrdering)
}

/** C/Python `%.6g` float formatting (reference api/cards/summarizer
  * .py:89-94 formats card numbers with `f"{num:.6g}"`). Java's own
  * `%g` never strips trailing zeros (150.0 → "150.000" where Python
  * and C produce "150"), so the card-summary contract needs this tiny
  * kernel; the DuckDB oracle mirrors it with `printf('%.6g', x)`.
  */
case class PyG6Format(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "py6g"

  override protected def nullSafeEval(input: Any): Any =
    PyG6Format.format(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.PyG6Format$$.MODULE$$.format($c)")

  override protected def withNewChildInternal(newChild: Expression): PyG6Format =
    copy(child = newChild)
}

object PyG6Format {

  /** `%.6g` with C/Python semantics: 6 significant digits, trailing
    * zeros stripped, scientific form when exponent < -4 or ≥ 6 with a
    * 2-digit-minimum exponent. The digits come from rounding the EXACT
    * binary value (`new BigDecimal(double)`) half-even — Java's own
    * `%e`/`%g` round half-UP, which disagrees with C/Python printf on
    * exact decimal ties like 19591.25 → "19591.2" (not .3).
    */
  def format(x: Double): UTF8String = UTF8String.fromString(fmt(x))

  def fmt(x: Double): String = {
    // sign bit first: C/CPython "%.6g" prints -0.0 as "-0"
    if (x == 0.0)
      return if (java.lang.Double.doubleToRawLongBits(x) != 0L) "-0" else "0"
    if (x.isNaN) return "nan"
    if (x.isInfinite) return if (x > 0) "inf" else "-inf"
    val neg = x < 0
    val bd = new java.math.BigDecimal(math.abs(x))
      .round(new java.math.MathContext(6, java.math.RoundingMode.HALF_EVEN))
    val exp = bd.precision - bd.scale - 1
    val digits = (bd.unscaledValue.toString + "000000").take(6)
    val body =
      if (exp < -4 || exp >= 6) {
        val frac = digits.substring(1).reverse.dropWhile(_ == '0').reverse
        val m = if (frac.isEmpty) digits.substring(0, 1)
                else s"${digits.substring(0, 1)}.$frac"
        val es = if (exp < 0) "-" else "+"
        f"${m}e$es${math.abs(exp)}%02d"
      } else if (exp >= 0) {
        val intPart = digits.substring(0, exp + 1)
        val frac = digits.substring(exp + 1).reverse.dropWhile(_ == '0').reverse
        if (frac.isEmpty) intPart else s"$intPart.$frac"
      } else {
        val frac = ("0" * (-exp - 1)) + digits
        val trimmed = frac.reverse.dropWhile(_ == '0').reverse
        s"0.$trimmed"
      }
    if (neg) "-" + body else body
  }
}

/** C/Python fixed-point float formatting — `%.Nf` (and Python's
  * grouped `{:,.0f}`) with printf semantics: the digits come from
  * rounding the EXACT binary value half-even, where Java's
  * `String.format("%.2f", …)` rounds half-UP (1.5625 → "1.57" vs
  * C/Python "1.56"). The card channel render (reference
  * templates/cards/primary_card.tg.j2:24-29 `"%.6f" | format`,
  * `"{:,.0f}".format`, market_risk_card.tg.j2:28-31 `"%.1f%%"`)
  * needs the C digits because the DuckDB oracle prints through C
  * printf. `grouping` inserts thousands separators into the integer
  * part — Python's `{:,.Nf}`.
  */
case class PyFixedFormat(child: Expression, decimals: Int,
    grouping: Boolean) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pyfixed"

  override protected def nullSafeEval(input: Any): Any =
    PyFixedFormat.format(input.asInstanceOf[Double], decimals, grouping)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.PyFixedFormat$$.MODULE$$.format($c, $decimals, $grouping)")

  override protected def withNewChildInternal(newChild: Expression): PyFixedFormat =
    copy(child = newChild)
}

object PyFixedFormat {

  def format(x: Double, decimals: Int, grouping: Boolean): UTF8String =
    UTF8String.fromString(fmt(x, decimals, grouping))

  def fmt(x: Double, decimals: Int, grouping: Boolean): String = {
    if (x.isNaN) return "nan"
    if (x.isInfinite) return if (x > 0) "inf" else "-inf"
    val neg = x < 0 ||
      (x == 0.0 && java.lang.Double.doubleToRawLongBits(x) != 0L)
    val bd = new java.math.BigDecimal(math.abs(x))
      .setScale(decimals, java.math.RoundingMode.HALF_EVEN)
    val plain = bd.toPlainString
    val body =
      if (!grouping) plain
      else {
        val dot = plain.indexOf('.')
        val intPart = if (dot < 0) plain else plain.substring(0, dot)
        val rest = if (dot < 0) "" else plain.substring(dot)
        intPart.reverse.grouped(3).mkString(",").reverse + rest
      }
    if (neg) "-" + body else body
  }
}

/** Column-level entry points for the custom expressions.
  *
  * Spark 4 removed `Column(expr)` / `col.expr` from the public Column
  * API (Connect-agnostic columns); the classic bridge is
  * `org.apache.spark.sql.classic.ExpressionUtils`.
  */
object GraftFunctions {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def blake2s(c: Column, digestBytes: Int, key: String = ""): Column =
    column(Blake2sHash(expression(c), digestBytes, key))

  def nfcNormalize(c: Column): Column = column(NfcNormalize(expression(c)))

  def normalizeTextFused(c: Column): Column =
    column(NormalizeTextExpr(expression(c)))

  def canonicalUrl(c: Column): Column = column(CanonicalUrl(expression(c)))

  def py6g(c: Column): Column = column(PyG6Format(expression(c)))

  def pyFixed(c: Column, decimals: Int, grouping: Boolean = false): Column =
    column(PyFixedFormat(expression(c), decimals, grouping))

  /** Violation list of `c` (a JSON document string) against a JSON
    * Schema (Draft-7 subset, see [[JsonSchemaValidate]]); empty array
    * = conforming.
    */
  def jsonSchemaValidate(c: Column, schema: String): Column =
    column(JsonSchemaValidate(expression(c),
      expression(org.apache.spark.sql.functions.lit(schema))))
}
