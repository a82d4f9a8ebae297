package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation.
  *
  * `sample()`-style RNG sampling is nondeterministic across runs,
  * partitionings, and engines; curation pipelines need the SAME rows
  * selected on every rebuild (and an oracle needs to reproduce the
  * choice). Both operators key off md5 of the row id, so membership is
  * a pure function of the data:
  *
  *   - [[hashSample]] — rate-based: keep rows whose 32-bit hash prefix
  *     falls below floor(rate·2³²). A map-side integer comparison —
  *     ZERO shuffles, no floats — so at 100 TB it fuses into the scan
  *     (predicate on a computed column; the parquet reader still
  *     prunes columns, and the filter runs inside whole-stage codegen).
  *   - [[stratifiedSample]] — fixed-size per stratum: the n smallest
  *     hash keys per stratum (deterministic "uniform without
  *     replacement"). ONE shuffle on the stratum key. A hot stratum
  *     funnels into one task here; at extreme skew the standard fix is
  *     a per-partition `rank ≤ n` pre-prune (TakeOrderedAndProject
  *     shape) before the final per-stratum window — n is small, so the
  *     pre-pruned volume is tasks·n rows.
  */
object Sampling {

  /** 32-bit integer sample key: first 8 hex chars of md5(id). */
  def sampleKey32(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Keep rows with sampleKey32 < floor(rate·2³²); adds `sample_key`. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    val cut = math.floor(rate * 4294967296.0).toLong
    df.withColumn("sample_key", sampleKey32(col(idCol)))
      .filter(col("sample_key") < cut)
  }

  /** The n hash-smallest rows per stratum; adds `sample_rank` (1-based
    * within the stratum). doc-id tie-break keeps the window order
    * TOTAL (md5 collisions are no excuse for engine-dependent output).
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(sampleKey32(col(idCol)).asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }
}
