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
