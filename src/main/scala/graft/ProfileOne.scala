package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Dev profiler: run a query once (warm-up) + once measured, then print
  * every plan node whose executed metrics carry time, sorted
  * descending — pinpoints which operator a slow query spends its wall
  * clock in (codegen span duration, shuffle write/fetch, sort, state
  * store commit, ...). Usage:
  *
  *   runMain graft.ProfileOne <query> [sfDir]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val name = args(0)
    SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count() // warm
    val qe = SparkEntry.queries(name)(spark, dir).queryExecution
    val t0 = System.nanoTime()
    qe.toRdd.count()
    println(f"[profile] $name total ${(System.nanoTime() - t0) / 1e9}%.2f s")

    def walk(p: SparkPlan, depth: Int,
        out: collection.mutable.ArrayBuffer[(Long, String)]): Unit = {
      p.metrics.foreach { case (k, m) =>
        val isTime = k.toLowerCase.contains("time") ||
          k.toLowerCase.contains("duration")
        if (isTime && m.value > 0)
          out += ((m.value, f"${p.nodeName}%-40s $k=${m.value} ms")) // metric type: timing ⇒ ms
      }
      val children = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case _ => p.children
      }
      children.foreach(walk(_, depth + 1, out))
    }
    val buf = collection.mutable.ArrayBuffer.empty[(Long, String)]
    walk(qe.executedPlan, 0, buf)
    buf.sortBy(-_._1).take(25).foreach { case (_, s) => println("[profile] " + s) }
    spark.stop()
  }
}
