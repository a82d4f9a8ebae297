package graft.expressions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Structural JSON-Schema (Draft-7 subset) validation as a codegen'd
  * expression — the conformance check the reference runs on every
  * card document before render (reference api/cards/build.py:578-583
  * `jsonschema.validate(card, schema)` against
  * schemas/cards.schema.json), surfaced Spark-side as a VERDICT
  * column instead of an exception: `json_schema_validate(doc,
  * schema)` returns the violation list (empty = conforming), so a
  * 100 TB pipeline can quarantine non-conforming documents with a
  * filter instead of dying on the first bad row.
  *
  * Supported keywords (everything the card contract uses): `type`
  * (object/array/string/number/integer/boolean/null), `const`,
  * `enum`, `pattern` (unanchored find, Draft-7 semantics),
  * `minLength`/`maxLength` (code points), `minimum`/`maximum`,
  * `required`, `additionalProperties: false`, `properties`, `items`
  * (single-schema form), `minItems`/`maxItems`, and local
  * `$ref: "#/$defs/..."`. Draft-7 `format` is annotation-only by
  * default (the reference's validator asserts nothing for it), so it
  * is deliberately ignored.
  *
  * Violations are `<json-path>: <keyword>` strings in a DETERMINISTIC
  * order — depth-first through the SCHEMA's property declaration
  * order, with a fixed keyword order per node (type, $ref, const,
  * enum, pattern, minLength, maxLength, minimum, maximum, minItems,
  * maxItems, required, additionalProperties, then descent). A type
  * mismatch reports once and stops descending that node (the other
  * keywords would be meaningless). `additionalProperties` violations
  * follow DOCUMENT key order (the only doc-ordered rule). The fixed
  * order is what lets the `q_p6_schema_validate` oracle re-derive
  * the exact violation string per planted fixture class in SQL.
  *
  * The schema rides as a foldable string child; executors compile it
  * once through a concurrent cache (schema text → parsed tree), so
  * per-row work is one Jackson parse of the document plus the walk.
  */
case class JsonSchemaValidate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "json_schema_validate"

  override protected def nullSafeEval(json: Any, schema: Any): Any =
    JsonSchema.validate(json.asInstanceOf[UTF8String],
      schema.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (j, s) =>
      s"graft.expressions.JsonSchema$$.MODULE$$.validate($j, $s)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JsonSchemaValidate =
    copy(left = newLeft, right = newRight)
}

object JsonSchema {

  private val Mapper = new ObjectMapper()
  private val schemaCache = new ConcurrentHashMap[String, JsonNode]()
  private val patternCache = new ConcurrentHashMap[String, Pattern]()

  /** The card-document schema, shipped as a library resource. */
  lazy val cardsSchema: String = {
    val in = getClass.getResourceAsStream("/cards.schema.json")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  def validate(json: UTF8String, schema: UTF8String): ArrayData = {
    val root = schemaCache.computeIfAbsent(schema.toString, Mapper.readTree _)
    val out = new scala.collection.mutable.ArrayBuffer[UTF8String]()
    val doc =
      try Mapper.readTree(json.toString)
      catch { case _: Exception => null }
    if (doc == null) out += UTF8String.fromString("$: parse")
    else walk(doc, root, root, "$", out)
    new GenericArrayData(out.toArray[Any])
  }

  private def emit(out: scala.collection.mutable.ArrayBuffer[UTF8String],
      path: String, kw: String): Unit =
    out += UTF8String.fromString(s"$path: $kw")

  private def typeOk(node: JsonNode, t: String): Boolean = t match {
    case "object" => node.isObject
    case "array" => node.isArray
    case "string" => node.isTextual
    case "number" => node.isNumber
    case "integer" => node.isIntegralNumber
    case "boolean" => node.isBoolean
    case "null" => node.isNull
    case _ => true
  }

  // scalastyle:off cyclomatic.complexity method.length
  private def walk(node: JsonNode, schema0: JsonNode, root: JsonNode,
      path: String, out: scala.collection.mutable.ArrayBuffer[UTF8String]): Unit = {
    // local $ref resolution (one hop is all the card contract needs);
    // an unresolvable pointer is a SCHEMA bug — fail NAMED at the
    // first row instead of NPE-ing on the next keyword probe. JSON
    // Pointer unescaping (~1 → '/', ~0 → '~', in that order) so a
    // $defs key containing either character still resolves.
    val schema = if (schema0.has("$ref")) {
      val ref = schema0.get("$ref").asText
      ref.split("/").drop(1) // "#", segments…
        .foldLeft(root) { (n, seg0) =>
          val seg = seg0.replace("~1", "/").replace("~0", "~")
          val next = if (n == null) null else n.get(seg)
          if (next == null)
            throw new IllegalArgumentException(
              s"jsonSchemaValidate: unresolvable $$ref '$ref' " +
                s"(segment '$seg') — fix the schema")
          next
        }
    } else schema0

    if (schema.has("type") && !typeOk(node, schema.get("type").asText)) {
      emit(out, path, "type")
      return // the remaining keywords are meaningless on a wrong type
    }
    // Draft-7 equality is VALUE equality for numbers (1 == 1.0);
    // JsonNode.equals distinguishes IntNode from DoubleNode, so
    // numeric pairs compare by decimalValue instead
    def jsonEq(a: JsonNode, b: JsonNode): Boolean =
      (a.isNumber && b.isNumber &&
        a.decimalValue.compareTo(b.decimalValue) == 0) || a == b
    if (schema.has("const") && !jsonEq(node, schema.get("const")))
      emit(out, path, "const")
    if (schema.has("enum")) {
      val it = schema.get("enum").elements()
      var ok = false
      while (it.hasNext && !ok) ok = jsonEq(it.next(), node)
      if (!ok) emit(out, path, "enum")
    }
    if (node.isTextual) {
      val s = node.asText
      if (schema.has("pattern")) {
        val p = patternCache.computeIfAbsent(
          schema.get("pattern").asText, Pattern.compile _)
        if (!p.matcher(s).find()) emit(out, path, "pattern")
      }
      val cp = s.codePointCount(0, s.length)
      if (schema.has("minLength") && cp < schema.get("minLength").asInt)
        emit(out, path, "minLength")
      if (schema.has("maxLength") && cp > schema.get("maxLength").asInt)
        emit(out, path, "maxLength")
    }
    if (node.isNumber) {
      val v = node.decimalValue
      if (schema.has("minimum") &&
          v.compareTo(schema.get("minimum").decimalValue) < 0)
        emit(out, path, "minimum")
      if (schema.has("maximum") &&
          v.compareTo(schema.get("maximum").decimalValue) > 0)
        emit(out, path, "maximum")
    }
    if (node.isArray) {
      if (schema.has("minItems") && node.size < schema.get("minItems").asInt)
        emit(out, path, "minItems")
      if (schema.has("maxItems") && node.size > schema.get("maxItems").asInt)
        emit(out, path, "maxItems")
      if (schema.has("items")) {
        val items = schema.get("items")
        var i = 0
        while (i < node.size) {
          walk(node.get(i), items, root, s"$path[$i]", out)
          i += 1
        }
      }
    }
    if (node.isObject) {
      if (schema.has("required")) {
        val it = schema.get("required").elements()
        while (it.hasNext) {
          val k = it.next().asText
          if (!node.has(k)) emit(out, s"$path.$k", "required")
        }
      }
      val props = if (schema.has("properties")) schema.get("properties") else null
      if (schema.has("additionalProperties") &&
          schema.get("additionalProperties").isBoolean &&
          !schema.get("additionalProperties").asBoolean) {
        val it = node.fieldNames()
        while (it.hasNext) {
          val k = it.next()
          if (props == null || !props.has(k))
            emit(out, s"$path.$k", "additionalProperties")
        }
      }
      if (props != null) {
        val it = props.fieldNames() // SCHEMA declaration order
        while (it.hasNext) {
          val k = it.next()
          if (node.has(k)) walk(node.get(k), props.get(k), root, s"$path.$k", out)
        }
      }
    }
  }
  // scalastyle:on cyclomatic.complexity method.length
}
