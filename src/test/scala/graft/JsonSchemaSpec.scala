package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.{GraftFunctions, JsonSchema}
import org.apache.spark.unsafe.types.UTF8String

/** The Draft-7-subset validator behind `q_p6_schema_validate`
  * (reference enforcement api/cards/build.py:578-583). Unit rows pin
  * each keyword + the deterministic walk order; the integration row
  * ties the validator to the REAL card builder: every document
  * Cards.buildDocument produces on the sf0.001 fixture tables must
  * conform to the shipped cards.schema.json — the schema column is a
  * guard beside the P6 regex guards, not a parallel reality.
  */
class JsonSchemaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def v(json: String, schema: String): Seq[String] = {
    val arr = JsonSchema.validate(UTF8String.fromString(json),
      UTF8String.fromString(schema))
    (0 until arr.numElements).map(i => arr.getUTF8String(i).toString)
  }

  test("const/enum use Draft-7 value equality for numbers (1 == 1.0), and an unresolvable $ref fails named instead of NPE-ing") {
    val s = """{"type":"object","properties":{
      "n":{"const":1},"m":{"enum":[0,1]}}}"""
    // jsonschema treats 1 and 1.0 as equal — so must we
    assert(v("""{"n":1.0,"m":1.0}""", s) == Nil)
    assert(v("""{"n":2,"m":3}""", s) == Seq("$.n: const", "$.m: enum"))
    val bad = """{"type":"object","properties":{
      "x":{"$ref":"#/$defs/typo"}}}"""
    val e = intercept[IllegalArgumentException] {
      v("""{"x":1}""", bad)
    }
    assert(e.getMessage.contains("unresolvable $ref"))
    // JSON Pointer unescaping: a $defs key containing '/' resolves
    val esc = """{"type":"object","properties":{
      "x":{"$ref":"#/$defs/a~1b"}},
      "$defs":{"a/b":{"type":"number"}}}"""
    assert(v("""{"x":1}""", esc) == Nil)
    assert(v("""{"x":"s"}""", esc) == Seq("$.x: type"))
  }

  test("each supported keyword fires with its path, and a type mismatch stops the descent") {
    val s = """{"type":"object","required":["a","b"],
      "additionalProperties":false,"properties":{
      "a":{"type":"string","minLength":2,"maxLength":4,"pattern":"^[a-z]+$"},
      "b":{"type":"number","minimum":0,"maximum":10},
      "c":{"type":"array","minItems":1,"maxItems":2,
           "items":{"type":"string","maxLength":3}},
      "d":{"enum":["x","y"]},
      "e":{"const":"k"}}}"""
    assert(v("""{"a":"ab","b":5}""", s) == Nil)
    assert(v("""{"a":"ab"}""", s) == Seq("$.b: required"))
    assert(v("""{"a":"a","b":11}""", s) ==
      Seq("$.a: minLength", "$.b: maximum"))
    assert(v("""{"a":"abcde","b":-1}""", s) ==
      Seq("$.a: maxLength", "$.b: minimum"))
    assert(v("""{"a":"AB","b":0}""", s) == Seq("$.a: pattern"))
    assert(v("""{"a":"ab","b":1,"z":true}""", s) ==
      Seq("$.z: additionalProperties"))
    assert(v("""{"a":"ab","b":1,"c":[]}""", s) == Seq("$.c: minItems"))
    assert(v("""{"a":"ab","b":1,"c":["u","v","wxyz"]}""", s) ==
      Seq("$.c: maxItems", "$.c[2]: maxLength"))
    assert(v("""{"a":"ab","b":1,"d":"z","e":"j"}""", s) ==
      Seq("$.d: enum", "$.e: const"))
    // wrong type: one violation, no string-keyword noise underneath
    assert(v("""{"a":7,"b":1}""", s) == Seq("$.a: type"))
    assert(v("""[1,2]""", s) == Seq("$: type"))
    assert(v("""not json""", s) == Seq("$: parse"))
    // maxLength counts code points, not UTF-16 units
    assert(v("""{"a":"ab","b":1,"c":["🟩🟨⬜"]}""", s) == Nil)
  }

  test("local $ref resolves through $defs") {
    val s = """{"type":"object","properties":{
      "o":{"$ref":"#/$defs/frame"}},
      "$defs":{"frame":{"type":"object","required":["x"],
        "properties":{"x":{"type":"number"}}}}}"""
    assert(v("""{"o":{"x":1}}""", s) == Nil)
    assert(v("""{"o":{}}""", s) == Seq("$.o.x: required"))
  }

  test("every document the real card builder produces conforms to the shipped cards schema") {
    val s = spark
    val dir = "/root/testdata/sf0.001"
    val docs = graft.queries.CoverageQueries
      .queries("q_j6_card_doc")(s, dir)
    val bad = docs.select(
        GraftFunctions.jsonSchemaValidate(col("card_json"),
          JsonSchema.cardsSchema).as("viol"))
      .filter(size(col("viol")) > 0)
      .limit(5).collect()
    assert(bad.isEmpty, s"builder docs violate the schema: " +
      bad.map(_.toString).mkString(" | "))
  }

  test("the planted-violation gate discriminates all eight fixture classes") {
    val out = graft.queries.CoverageQueries
      .queries("q_p6_schema_validate")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val byCls = out.groupBy(r =>
      r.getString(0).stripPrefix("EV:").toLong % 8)
    assert(byCls.keySet == (0L to 7L).toSet)
    byCls.foreach { case (cls, rows) =>
      rows.foreach { r =>
        assert(r.getBoolean(1) == (cls == 0L),
          s"class $cls schema_ok mismatch: $r")
      }
    }
  }
}
