package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites (one JVM, forked by sbt). */
object TestSpark {
  lazy val spark: SparkSession = Sessions.local("4")
  val Sf = "/root/testdata/sf0.001"
}

class EntrySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.Sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("no raw timestamp columns reach the oracle compare") {
    import org.apache.spark.sql.types.TimestampType
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, TestSpark.Sf)
      val ts = df.schema.fields.filter(_.dataType == TimestampType)
      assert(ts.isEmpty, s"$name outputs TimestampType: ${ts.map(_.name).mkString(",")}")
    }
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without query: $extra")
  }
}
