package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S4/S5 — enrichment lookups with cache/freshness semantics
  * (reference api/providers/dex_provider.py:368-538,
  * goplus_provider.py:279-379).
  *
  * The reference fetches over HTTP with a 5-minute-bucket cache, a
  * primary→fallback provider ladder (DexScreener → GeckoTerminal) and
  * a 24 h stale-last-ok degrade. Spark-side, the cache IS a lookup
  * DataFrame (broadcast if small); freshness and the degrade ladder
  * become status columns, never dropped rows — downstream rules can
  * then weigh degraded data (the reference's `cache/stale/degrade`
  * output contract, dex_provider.py:92-105).
  *
  * A live-HTTP variant slots in as a mapPartitions batch fetch behind
  * the same output schema (one client per partition) — deliberately
  * not implemented here: zero-egress container, and deterministic
  * lookups are what the oracle gate needs.
  */
object Enrichment {

  val FreshTtlUs: Long = 300L * 1000000L        // 5-minute cache bucket
  val StaleTtlUs: Long = 24L * 3600L * 1000000L // last_ok degrade window

  /** Enrich `df` by `key` from a primary and a fallback lookup frame
    * (each: key, value columns..., fetched_us). Adds:
    *   - the fallback-coalesced value columns;
    *   - `enrich_source` ∈ {primary, fallback, none};
    *   - `enrich_status` ∈ {fresh, stale, miss} (age vs the chosen
    *     source's fetched_us at `nowUs`).
    */
  def withLookup(df: DataFrame, key: String,
      primary: DataFrame, fallback: DataFrame,
      valueCols: Seq[String], nowUs: Long): DataFrame = {
    def prefixed(lookup: DataFrame, p: String): DataFrame =
      valueCols.foldLeft(lookup)((d, c) => d.withColumnRenamed(c, s"${p}_$c"))
        .withColumnRenamed("fetched_us", s"${p}_fetched_us")
    val joined = df
      .join(broadcast(prefixed(primary, "pri")), Seq(key), "left")
      .join(broadcast(prefixed(fallback, "fb")), Seq(key), "left")
    // a source older than the stale window is ABSENT, not "chosen but
    // miss" — otherwise an expired primary shadows a fresh fallback
    // (the reference's last_ok degrade treats >24h entries as gone)
    def usable(fetched: Column): Column =
      fetched.isNotNull && (lit(nowUs) - fetched <= StaleTtlUs)
    val usePrimary = usable(col("pri_fetched_us"))
    val useFallback = !usePrimary && usable(col("fb_fetched_us"))
    val chosenFetched = when(usePrimary, col("pri_fetched_us"))
      .when(useFallback, col("fb_fetched_us"))
    val age = lit(nowUs) - chosenFetched
    val withVals = valueCols.foldLeft(joined)((d, c) =>
      d.withColumn(c,
        when(usePrimary, col(s"pri_$c")).when(useFallback, col(s"fb_$c"))))
    withVals
      .withColumn("enrich_source",
        when(usePrimary, "primary").when(useFallback, "fallback")
          .otherwise("none"))
      .withColumn("enrich_status",
        when(chosenFetched.isNull, "miss")
          .when(age <= FreshTtlUs, "fresh")
          .when(age <= StaleTtlUs, "stale")
          .otherwise("miss"))
      .drop(valueCols.flatMap(c => Seq(s"pri_$c", s"fb_$c")) ++
        Seq("pri_fetched_us", "fb_fetched_us"): _*)
  }

  /** 5-minute cache bucket of a fetch timestamp (the reference's cache
    * key granularity).
    */
  def cacheBucket(fetchedUs: Column): Column =
    (fetchedUs / FreshTtlUs).cast("long") * FreshTtlUs
}
