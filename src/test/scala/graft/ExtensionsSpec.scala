package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.registerFunctions(spark)
    val r = spark.sql(
      """SELECT blake2s('abc') AS b32,
                blake2s('abc', 20, 'salt') AS b20,
                nfc_normalize('éclair') AS nfc,
                canonical_url('https://Example.com/p?utm_a=1&b=2') AS cu,
                dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
                word_shingles('a b c d', 3) AS sh,
                py6g(19591.25d) AS g6,
                keyword_priority('$peak go the pump', 3) AS kw""").head
    assert(r.getString(0) ==
      "508c5e8c327c14e2e1a72ba34eeb452f37458b209ed63a294d999b4c86675982")
    assert(r.getString(1).length == 40)
    assert(r.getString(2) == "éclair")
    assert(r.getString(3) == "https://example.com/p?b=2")
    assert(r.getDouble(4) == 11.0)
    assert(r.getSeq[String](5) == Seq("a b c", "b c d"))
    assert(r.getString(6) == "19591.2") // C/Python %.6g half-even tie
    assert(r.getString(7) == "$peak,go,the")
  }

  test("unbounded-scan lint rejects bare scans of guarded tables only") {
    val lint = UnboundedScanLint(spark)
    import org.apache.spark.sql.GraftColumnBridge
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed
    spark.conf.set("spark.graft.lint.guardedTables", "lineitem")
    try {
      val li = Tables.load(spark, TestSpark.Sf, "lineitem")
      intercept[IllegalStateException] {
        lint(planOf(li.groupBy("l_returnflag").count()))
      }
      // filtered and limited scans pass
      lint(planOf(li.filter(col("l_quantity") > 0).groupBy("l_returnflag").count()))
      lint(planOf(li.limit(10)))
      // non-guarded tables pass unbounded
      lint(planOf(Tables.load(spark, TestSpark.Sf, "orders").groupBy("o_orderstatus").count()))
    } finally spark.conf.set("spark.graft.lint.guardedTables", "")
  }
}
