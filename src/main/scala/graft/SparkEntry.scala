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
    QueryPack(CurationQueries.queries, CurationQueries.oracleSql),
    QueryPack(PipelineQueries.queries, PipelineQueries.oracleSql),
    QueryPack(CustomExprQueries.queries, CustomExprQueries.oracleSql),
    QueryPack(StreamingQueries.queries ++ StreamingQueries.changeDetectQueries
        ++ StreamingQueries.sinkQueries,
      StreamingQueries.oracleSql),
    QueryPack(CoverageQueries.queries, CoverageQueries.oracleSql),
    QueryPack(EnrichmentQueries.queries, EnrichmentQueries.oracleSql),
    QueryPack(WindowQueries.queries, WindowQueries.oracleSql),
    QueryPack(RefineQueries.queries, RefineQueries.oracleSql)
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The reference's main pipeline (SURVEY §3.1) as ONE declarative
    * program: posts → candidate filter (P1) → normalize + extract (F1/
    * F2) → lexicon sentiment (F11) → event key (F5) + bucket (F6) →
    * keyed merge (A1 batch form) → rules scoring + level (R1) →
    * level rollup.
    */
  def entry(spark: SparkSession): DataFrame = {
    import graft.functions.{KeyFunctions, TextFunctions}
    import graft.rules.RuleEngine
    val dir = "/root/testdata/sf0.001"
    val posts = Tables.load(spark, dir, "documents")
      .withColumn("post", concat(lit("$"), upper(col("source")), lit(" "),
        col("text"), lit(" ca 0x"), md5(col("text")),
        substring(md5(col("source")), 1, 8)))
      .withColumn("ts_us", lit(1700000000000000L) + col("doc_id") * 1000000L)
    val candidates = posts
      .filter(TextFunctions.isCandidate(col("post"), Seq("launch", "mint")))
      .withColumn("text_norm", TextFunctions.normalizeText(col("post")))
      .withColumn("token_ca", TextFunctions.extractCa(col("post")))
      .withColumn("symbol", TextFunctions.extractSymbol(col("post")))
      .withColumn("sentiment", TextFunctions.sentimentScore(col("post"),
        Seq("fast", "big", "spark"), Seq("slow", "small", "error")))
      .withColumn("bucket", KeyFunctions.tsBucket(expr("ts_us div 1000000")))
      .withColumn("event_key", KeyFunctions.eventKeyV1(lit("social"),
        col("symbol"), col("token_ca"), col("text_norm"), col("bucket")))
    val events = candidates.groupBy("event_key")
      .agg(count(lit(1)).as("evidence_count"),
        min("ts_us").as("start_us"), max("ts_us").as("last_us"),
        max_by(col("sentiment"), col("ts_us")).as("last_sentiment_score"),
        max_by(col("symbol"), col("ts_us")).as("symbol"))
    val scored = RuleEngine.evaluate(
      events
        .withColumn("goplus_risk", lit("green"))
        .withColumn("buy_tax", lit(3.0)).withColumn("sell_tax", lit(3.0))
        .withColumn("lp_lock_days", lit(90))
        .withColumn("dex_liquidity", col("evidence_count") * lit(100.0))
        .withColumn("dex_volume_1h", col("evidence_count") * lit(50.0))
        .withColumn("heat_slope", col("last_sentiment_score"))
      , RuleEngine.DemoRules)
    scored.groupBy("rules_level").agg(count(lit(1)).as("n_events"))
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
