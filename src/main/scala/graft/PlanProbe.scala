package graft

import org.apache.spark.sql.SparkSession

/** Dev probe: dump a query's executed plan (duplicate-evaluation
  * detector). Usage: runMain graft.PlanProbe <query> [outFile]
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val out = if (args.length > 1) args(1) else "/tmp/plan.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(out), plan.getBytes)
    println(s"[probe] wrote $out (${plan.length} chars)")
  }
}
