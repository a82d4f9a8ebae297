package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift tripwire (round 8, VERDICT r7 item 4).
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed the physical encoding of `events.ts` once (INT64 nanos →
  * TIMESTAMP(MICROS, isAdjustedToUTC=false)). When that happens, every
  * query that reads `events` silently vanishes from the correctness
  * gate. This spec pins the ENGINE-VISIBLE dtypes of every table at
  * every available SF so the next regeneration fails as one named
  * assertion here instead of 31 missing gate rows.
  */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val sfDirs =
    Seq("sf0.001", "sf0.01").map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(d).isDirectory)

  test("every table loads at every SF") {
    for (dir <- sfDirs; name <- Tables.names) {
      val df = Tables.load(spark, dir, name)
      assert(df.columns.nonEmpty, s"$dir/$name has no columns")
    }
  }

  test("events exposes ts_ns:Long (oracle epoch_ns parity) and ts:Timestamp") {
    for (dir <- sfDirs) {
      val sch = Tables.load(spark, dir, "events").schema
      val byName = sch.fields.map(f => f.name -> f.dataType).toMap
      assert(byName.get("ts_ns").contains(LongType),
        s"$dir events.ts_ns is ${byName.get("ts_ns")}, expected LongType")
      // The 31 events gate queries were verified (r6) against
      // TimestampType-derived schemas; an NTZ passthrough would trade
      // analysis errors for schema_match failures in the driver gate.
      assert(byName.get("ts").contains(TimestampType),
        s"$dir events.ts is ${byName.get("ts")}, expected TimestampType")
    }
  }

  test("ts_ns and ts agree (ts == ts_ns truncated to micros)") {
    import org.apache.spark.sql.functions._
    for (dir <- sfDirs) {
      val bad = Tables.load(spark, dir, "events")
        .where(unix_micros(col("ts")) =!= expr("ts_ns div 1000"))
        .count()
      assert(bad == 0L, s"$dir events: $bad rows where ts != ts_ns/1000")
    }
  }

  test("legacy INT64-nanos events encoding still loads (LongType branch)") {
    import org.apache.spark.sql.functions._
    // The live testdata no longer exercises the nanos path; synthesize
    // it so the branch stays covered if the driver reverts encodings.
    val dir = java.nio.file.Files.createTempDirectory("graft-nanos").toString
    val sq = spark
    import sq.implicits._
    Seq((1L, 1723500000123456789L, "x"), (2L, 1723500001987654321L, "y"))
      .toDF("event_id", "ts", "payload")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.load(spark, dir, "events")
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("ts_ns") == LongType && byName("ts") == TimestampType)
    val r = df.orderBy("event_id")
      .select(col("ts_ns"), unix_micros(col("ts"))).head()
    assert(r.getLong(0) == 1723500000123456789L)
    assert(r.getLong(1) == 1723500000123456L) // truncated to micros
  }

  test("non-events tables keep stable key dtypes") {
    val expect: Map[(String, String), DataType] = Map(
      ("lineitem", "l_quantity") -> DoubleType,
      ("lineitem", "l_orderkey") -> LongType,
      ("orders", "o_orderkey") -> LongType,
      ("documents", "doc_id") -> LongType,
      ("documents", "text") -> StringType,
      ("embeddings", "vec_id") -> LongType
    )
    for (dir <- sfDirs) {
      val cache = scala.collection.mutable.Map.empty[String, Map[String, DataType]]
      expect.foreach { case ((tbl, colName), dt) =>
        val byName = cache.getOrElseUpdate(tbl,
          Tables.load(spark, dir, tbl).schema.fields.map(f => f.name -> f.dataType).toMap)
        assert(byName.get(colName).contains(dt),
          s"$dir $tbl.$colName is ${byName.get(colName)}, expected $dt")
      }
    }
  }

  test("events NTZ loader fails loudly under a non-UTC session time zone") {
    // ADVICE r9: the NTZ→TimestampType cast is wall-clock-preserving
    // only in UTC; a misconfigured session must error, not silently
    // shift every ts_ns off oracle parity. (Only applicable while the
    // testdata carries the NTZ encoding — skip otherwise.)
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val dir = sfDirs.head
    val enc = spark.read.parquet(Tables.path(dir, "events")).schema("ts").dataType
    assume(enc == TimestampNTZType || enc == TimestampType)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val e = intercept[IllegalArgumentException] {
        Tables.load(spark, dir, "events")
      }
      assert(e.getMessage.contains("timeZone"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
