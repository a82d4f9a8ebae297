package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of named gate
  * queries at sf0.001 (plan shape is data-size independent) — for
  * eyeballing codegen spans, exchange counts, and expensive-expression
  * duplication that TimeOne alone can't localize.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    // env overrides so optimization rounds can dump plans at the
    // bench's own scale/core count (partitioning-sensitive rewrites)
    val cpus = sys.env.getOrElse("PLANDUMP_CPUS", "4")
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("PLANDUMP_SF", "/root/testdata/sf0.001")
    args.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
