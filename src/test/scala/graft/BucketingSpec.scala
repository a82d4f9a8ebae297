package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing: pre-bucketed tables joined on the
  * bucket key need NO shuffle at join time — the layout strategy for
  * repeatedly-joined 100 TB fact tables (SURVEY §4: the reference's
  * btree indexes become partitioning/bucketing layout).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    // warehouse.dir is a static conf — use external table locations
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketing").toString
    val o = Tables.load(spark, TestSpark.Sf, "orders")
    val l = Tables.load(spark, TestSpark.Sf, "lineitem")
    o.write.mode("overwrite").option("path", s"$wh/orders_b")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    l.write.mode("overwrite").option("path", s"$wh/lineitem_b")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus")
        .agg(sum("l_quantity").as("q"))
      // disable broadcast so the join itself must pick SMJ over buckets
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      // no Exchange may appear BELOW the join (bucket layout feeds it
      // directly); the post-aggregation exchange is expected.
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"join should read bucketed layout without shuffling:\n$joinSection")
      // and the result matches the unbucketed computation
      val expect = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got.keySet == expect.keySet)
      got.foreach { case (k, v) => assert(math.abs(v - expect(k)) < 1e-6) }
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
