package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out aggregation helpers (SURVEY §7.4 risk 7 — 100 TB
  * mandate): skew salting and approximate-distinct switches.
  */
object ScaleOps {

  /** Two-phase salted aggregation for skewed keys: phase 1 groups by
    * (key, salt) — spreading a hot key over `saltBuckets` reducers —
    * phase 2 re-aggregates per key. Correct for any MERGEABLE
    * aggregate supplied as (partial, merge) column pairs with matching
    * names: counts/sums/min/max/collect_set re-aggregate losslessly;
    * non-algebraic aggregates (exact medians, first/last, positional
    * picks) must NOT go through a salted split.
    *
    * `saltCol` must be a DETERMINISTIC per-row expression (a row id:
    * `pmod(id, buckets)` is the canonical form, shared with
    * Sampling.domainCap). The earlier `spark_partition_id() +
    * monotonically_increasing_id()` salt was partition-layout-dependent
    * — harmless for counts (re-agg erases it) but unreproducible
    * run-to-run, so it could never sit under the oracle gate.
    *
    * AQE's skew-join handling covers JOIN skew at runtime; aggregation
    * skew on a hot GROUP BY key still needs salting, which is why this
    * exists as a first-class operator.
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltCol: Column,
      saltBuckets: Int)(
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(saltCol, lit(saltBuckets)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted count per key — result identical to a direct groupBy count. */
  def saltedCount(df: DataFrame, keyCols: Seq[String], idCol: String,
      saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keyCols, col(idCol), saltBuckets)(
      Seq(count(lit(1)).as("__c")), Seq(sum("__c").as("cnt")))

  /** Salted sum per key. */
  def saltedSum(df: DataFrame, keyCols: Seq[String], idCol: String,
      valueCol: String, saltBuckets: Int = 16): DataFrame =
    saltedAgg(df, keyCols, col(idCol), saltBuckets)(
      Seq(sum(valueCol).as("__s")), Seq(sum("__s").as(s"sum_$valueCol")))

  /** Fan a compute-heavy, narrow projection out across the session's
    * cores when its upstream scan yields fewer partitions than the
    * scheduler has slots (guide §2.5 "input skew — one huge
    * unsplittable file → repartition immediately after the read").
    * The driver's testdata parquet is written as ONE row group per
    * file, so the scan is unsplittable and every map-heavy operator
    * downstream of it otherwise executes in a single task with the
    * other cores idle. The round-robin exchange moves only the narrow
    * pre-projected columns (project-before-exchange, §2.3) and its
    * row→partition assignment is deterministic (sortBeforeRepartition
    * stays on, §2.5), so the result SET is unchanged.
    *
    * Scale-adaptive by construction, not a local[32] constant: the
    * target is the session's defaultParallelism and the exchange is
    * SKIPPED whenever the upstream already carries at least that many
    * partitions — a real cluster scan of multi-row-group files takes
    * the no-op branch, so nothing here pins the plan to local mode.
    * Call it on a scan-stage frame (no exchange upstream): the
    * partition count of a pre-shuffle frame is known at plan time, so
    * the `.rdd.getNumPartitions` peek compiles only the scan+project
    * subplan and runs no job.
    */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** A6/A7-style window aggregate with an exact / approximate distinct
    * switch — `approx_count_distinct` (HLL++) is the 100 TB path, the
    * exact form is the oracle-checkable one (SURVEY A6 note).
    */
  def activeWindow(df: DataFrame, keyCol: String, distinctCol: String,
      exact: Boolean, rsd: Double = 0.05): DataFrame = {
    val distinctAgg =
      if (exact) countDistinct(col(distinctCol))
      else approx_count_distinct(col(distinctCol), rsd)
    df.groupBy(keyCol)
      .agg(count(lit(1)).as("tx_count"), distinctAgg.as("uniq"))
  }
}
