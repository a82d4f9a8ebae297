package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are assembled from per-area query packs; the
  * driver runs each query at sf0.01 and hash-compares against the
  * DuckDB oracle (column names must match — every computed column is
  * aliased identically on both sides).
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    QueryPack(CoreQueries.queries, CoreQueries.oracleSql),
    QueryPack(DataOpsQueries.queries, DataOpsQueries.oracleSql),
    QueryPack(PipelineQueries.queries, PipelineQueries.oracleSql),
    QueryPack(CustomExprQueries.queries, CustomExprQueries.oracleSql),
    QueryPack(StreamingQueries.queries, StreamingQueries.oracleSql)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Mini end-to-end slice of the event pipeline: bucket → key → count.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val e = Tables.load(spark, dir, "events")
      .withColumn("bucket", expr("ts_ns div 1000000000 div 600 * 600"))
      .withColumn("event_key", graft.functions.KeyFunctions.eventKeyV1(
        col("event_type"), col("user_id").cast("string"),
        lit(null).cast("string"), lit(null).cast("string"), col("bucket")))
    e.groupBy("event_key", "event_type").agg(count(lit(1)).as("n"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.map(_.oracleSql).reduce(_ ++ _)
}

/** A bundle of queries + their oracles contributed by one area. */
final case class QueryPack(
    queries: Map[String, (SparkSession, String) => DataFrame],
    oracleSql: Map[String, String])
