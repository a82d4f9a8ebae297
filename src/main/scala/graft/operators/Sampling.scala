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

  /** Mixture sampling: per-stratum keep rates (training-mix weighting —
    * e.g. upsample low-resource languages, downsample boilerplate
    * sources). Same map-side integer cut as [[hashSample]], the cut
    * point looked up per row from a literal map — still ZERO shuffles
    * and fully deterministic. Strata absent from `rates` fall back to
    * `defaultRate`.
    */
  def mixtureSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    def cut(rate: Double): Long = math.floor(rate * 4294967296.0).toLong
    val cutCol = rates.foldLeft(lit(cut(defaultRate))) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, lit(cut(rate))).otherwise(acc)
    }
    df.withColumn("sample_key", sampleKey32(col(idCol)))
      .filter(col("sample_key") < cutCol)
  }

  /** Greedy sequential token packing per stratum (sequence packing for
    * training batches): rows ordered by hash key within their stratum,
    * each assigned to pack floor(running_token_total_before_it /
    * budget) — the deterministic first-fit fill. A pack may overrun
    * the budget by at most one document (the straddler stays in the
    * pack it started in), which is the standard greedy contract.
    *
    * Scale: ONE shuffle on the stratum key; the running sum is a
    * per-stratum window, never a global one (a global cumsum would
    * serialize the corpus through one task). Strata are the
    * parallelism unit — at 100 TB pack within (stratum, shard) where
    * shard = sampleKey32 mod k for any k that bounds per-task volume.
    */
  def packByTokens(df: DataFrame, idCol: String, strataCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(sampleKey32(col(idCol)).asc, col(idCol).asc)
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      // integer division — the double-division-then-cast form can
      // misbucket at exact budget boundaries (oracle-parity rule)
      .withColumn("pack_id", expr(s"(__cum - $tokensCol) div $budget"))
      .drop("__cum")
  }
}
