package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: print the formatted plan of a named gate query. */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(
      SparkSession.builder().master("local[4]"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val df = SparkEntry.queries(args(0))(spark, dir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
