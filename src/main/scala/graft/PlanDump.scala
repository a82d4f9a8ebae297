package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of named gate
  * queries at sf0.001 (plan shape is data-size independent) — for
  * eyeballing codegen spans, exchange counts, and expensive-expression
  * duplication that TimeOne alone can't localize.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    args.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
