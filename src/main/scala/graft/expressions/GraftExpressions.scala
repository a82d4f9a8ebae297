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

/** URL canonicalization (reference api/events.py:123-173 — F3):
  * https-upgrade, lowercase + IDN-punycode host, drop default ports and
  * fragments, drop tracking params (utm_*, ref), sort remaining query
  * params. Null on unparseable input.
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

  private val TrackingParams: Set[String] = Set("ref", "fbclid", "gclid")

  def canonicalizeUtf8(input: UTF8String): UTF8String = {
    val s = canonicalize(input.toString)
    if (s == null) null else UTF8String.fromString(s)
  }

  private val UrlRe =
    "(?i)^([a-z][a-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$".r

  /** Returns null for inputs that do not parse as http(s) URLs.
    * Parses directly (not via java.net.URI, whose getHost is null for
    * raw-IDN hosts) so `münchen.de` punycodes instead of failing.
    */
  def canonicalize(raw: String): String = {
    try {
      val trimmed = raw.trim
      if (trimmed.isEmpty) return null
      val withScheme =
        if (trimmed.matches("(?i)^[a-z][a-z0-9+.-]*://.*")) trimmed
        else "https://" + trimmed
      withScheme match {
        case UrlRe(scheme0, authority, path0, query0) =>
          if (scheme0.toLowerCase != "http" && scheme0.toLowerCase != "https")
            return null
          // drop userinfo, split host[:port]
          val hostPort = authority.substring(authority.lastIndexOf('@') + 1)
          if (hostPort.isEmpty) return null
          val (host0, port) = hostPort.lastIndexOf(':') match {
            case -1 => (hostPort, "")
            case i =>
              val digits = hostPort.substring(i + 1)
              val outsideBracket = i > hostPort.lastIndexOf(']')
              // nonEmpty guards "host:" (forall on "" is vacuously true
              // and ''.toInt would throw into the catch-all → null)
              if (outsideBracket && digits.nonEmpty && digits.length <= 5 &&
                  digits.forall(_.isDigit)) {
                val p = digits.toInt
                (hostPort.substring(0, i),
                  if (p == 80 || p == 443) "" else s":$p")
              } else if (outsideBracket && digits.isEmpty)
                (hostPort.substring(0, i), "") // trailing "host:"
              else (hostPort, "")
          }
          // reject garbage authorities (':::', empty) — IDN.toASCII
          // happily passes them through
          if (host0.isEmpty ||
              (host0.contains(':') && !host0.startsWith("["))) return null
          val host = java.net.IDN.toASCII(host0.toLowerCase)
          val path = if (path0.isEmpty) "/" else path0
          val query = Option(query0).map(_.trim).filter(_.nonEmpty) match {
            case None => ""
            case Some(q) =>
              val kept = q.split("&").filter(_.nonEmpty).filterNot { kv =>
                val k = kv.split("=", 2)(0).toLowerCase
                k.startsWith("utm_") || TrackingParams.contains(k)
              }
              if (kept.isEmpty) "" else kept.sorted.mkString("?", "&", "")
          }
          s"https://$host$port$path$query"
        case _ => null
      }
    } catch {
      case _: Exception => null
    }
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

  def canonicalUrl(c: Column): Column = column(CanonicalUrl(expression(c)))
}
