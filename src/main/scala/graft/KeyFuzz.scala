package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: event-key v1/v2 + %.6g formatting vs CPython-generated
  * expected values (see /tmp producers).
  */
object KeyFuzz {
  def main(args: Array[String]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

    // --- py6g (no session needed) ---
    val g6 = mapper.readTree(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/tmp/g6_cases.json")), "UTF-8"))
    var bad6 = 0
    (0 until g6.size()).foreach { i =>
      val bits = java.lang.Long.parseUnsignedLong(g6.get(i).get(0).asText(), 16)
      val v = java.lang.Double.longBitsToDouble(bits)
      val want = g6.get(i).get(1).asText()
      val got = graft.expressions.PyG6Format.fmt(v)
      if (got != want) {
        bad6 += 1
        if (bad6 <= 8) println(s"G6 MISMATCH v=$v want=[$want] got=[$got]")
      }
    }
    println(s"py6g: ${g6.size()} cases, $bad6 mismatches")

    // --- event keys through the actual Column functions ---
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val root = mapper.readTree(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/tmp/key_cases.json")), "UTF-8"))
    val rows = (0 until root.size()).map { i =>
      val r = root.get(i)
      def s(j: Int) = if (r.get(j).isNull) null else r.get(j).asText()
      (i, s(0), s(1), s(2), s(3), s(4), s(5), r.get(6).asLong, s(7), s(8), s(9))
    }
    val df = rows.toDF("i", "typ", "symbol", "ca", "chain", "text",
      "topic", "bucket", "salt", "want_v1", "want_v2")
    import graft.functions.KeyFunctions
    def keyed(salt: String) = df.filter(col("salt") === salt).select(col("i"),
      KeyFunctions.eventKeyV1(col("typ"), col("symbol"), col("ca"),
        col("text"), col("bucket"), salt).as("v1"),
      KeyFunctions.eventKeyV2(col("typ"), col("symbol"),
        col("ca"), col("chain"), // empty-string CA exercises the falsy branch
        col("topic"), KeyFunctions.textSig(col("text")), col("bucket"), salt)
        .as("v2"),
      col("want_v1"), col("want_v2"))
    var bad = 0
    Seq("v1", "rotated").foreach { salt =>
      keyed(salt).collect().foreach { r =>
        if (r.getString(1) != r.getString(3)) { bad += 1
          if (bad <= 5) println(s"V1 MISMATCH i=${r.getInt(0)} got=${r.getString(1)} want=${r.getString(3)}") }
        if (r.getString(2) != r.getString(4)) { bad += 1
          if (bad <= 5) println(s"V2 MISMATCH i=${r.getInt(0)} got=${r.getString(2)} want=${r.getString(4)}") }
      }
    }
    println(s"event keys: ${rows.size} cases, $bad mismatches")
    spark.stop()
  }
}
