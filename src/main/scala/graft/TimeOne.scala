package graft

import org.apache.spark.sql.SparkSession
/** Dev utility: time named gate queries (full evaluation, 3 runs). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.builderDefaults(SparkSession.builder().master("local[32]"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    args.foreach { name =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
