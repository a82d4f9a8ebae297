package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: scan every gate query's physical plan for scale
  * anti-patterns (cartesian products, whole-table global windows,
  * broadcast nested-loop joins).
  */
object PlanAudit {

  /** Deliberate tiny-side shapes: BroadcastNestedLoopJoin is CORRECT
    * when one side is a scalar/handful of rows.
    */
  val Whitelist: Map[String, String] = Map(
    "q_a5_mention_24h" -> "1-row scalar max(ts) broadcast",
    "q_a8_top_holders" -> "1-row scalar total broadcast",
    "q_s_ann_topk" -> "brute-force baseline: broadcast query set (deliberate)",
    "q_d7_topic_merge_embed" -> "non-equi pair join over ~20 topic centroids",
    "q_t_tfidf_topk" -> "1-row corpus scalar (N) broadcast",
    "q_t_bm25_topk" -> "1-row corpus scalars (N, avgdl) broadcast",
    "q_t_perplexity" -> "1-row LM scalar (vocab size V) broadcast",
    "q_t_dsir_weights" -> "1-row corpus scalars (Tt, Tr) broadcast")

  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    var flagged = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val hits = Seq(
          "CartesianProduct" -> plan.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
          "GlobalWindow" -> plan.linesIterator.exists(l =>
            l.contains("Window") && l.contains("windowspecdefinition()") )
        ).filter(_._2).map(_._1)
        if (hits.nonEmpty) {
          Whitelist.get(name) match {
            case Some(why) => println(s"OK   $name: ${hits.mkString(",")} — $why")
            case None => flagged += 1; println(s"FLAG $name: ${hits.mkString(",")}")
          }
        }
      } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage.take(80)}") }
    }
    println(s"audited ${SparkEntry.queries.size} plans, $flagged flagged")
    spark.stop()
  }
}
