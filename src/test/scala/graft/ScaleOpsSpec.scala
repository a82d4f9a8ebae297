package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleOps

class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val li = Tables.load(spark, TestSpark.Sf, "lineitem")

  test("salted count equals direct groupBy count") {
    val direct = li.groupBy("l_returnflag").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = ScaleOps.saltedCount(li, Seq("l_returnflag"), "l_orderkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("salted sum equals direct groupBy sum (within fp tolerance)") {
    val direct = li.groupBy("l_returnflag").agg(sum("l_quantity"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = ScaleOps.saltedSum(li, Seq("l_returnflag"), "l_orderkey",
      "l_quantity")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    direct.foreach { case (k, v) =>
      assert(math.abs(salted(k) - v) < 1e-6 * math.abs(v).max(1.0), k)
    }
  }

  test("approx distinct lands within rsd of exact") {
    val exact = ScaleOps.activeWindow(li, "l_returnflag", "l_partkey",
      exact = true).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = ScaleOps.activeWindow(li, "l_returnflag", "l_partkey",
      exact = false).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v).toDouble / v.max(1) < 0.15,
        s"$k approx=${approx(k)} exact=$v")
    }
  }
}
