package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: LexiconSentiment vs CPython analyze_rules semantics. */
object SentFuzz {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/tmp/sent_cases.json")), "UTF-8"))
    val rows = (0 until root.size()).map { i =>
      val r = root.get(i)
      (i, r.get(0).asText(), r.get(1).asText(), r.get(2).asText().toDouble)
    }
    val pos = Seq("fast", "big", "spark", "join", "merge")
    val neg = Seq("slow", "small", "dup", "error", "scan")
    import graft.functions.TextFunctions
    val score = TextFunctions.sentimentScore(col("text"), pos, neg)
    var bad = 0
    rows.toDF("i", "text", "want_label", "want_score")
      .select(col("i"), score.as("score"),
        TextFunctions.sentimentLabel(score).as("label"),
        col("want_label"), col("want_score"))
      .collect().foreach { r =>
        val ok = r.getString(2) == r.getString(3) &&
          math.abs(r.getDouble(1) - r.getDouble(4)) < 1e-15
        if (!ok) { bad += 1
          if (bad <= 5) println(s"SENT MISMATCH i=${r.getInt(0)} got=(${r.getString(2)},${r.getDouble(1)}) want=(${r.getString(3)},${r.getDouble(4)})") }
      }
    println(s"sentiment: ${rows.size} cases, $bad mismatches")
    spark.stop()
  }
}
