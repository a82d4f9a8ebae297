package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic numeric helpers.
  *
  * `round()` is NOT portable across engines for doubles: Spark rounds
  * the double's shortest decimal representation (BigDecimal.valueOf →
  * HALF_UP), while DuckDB rounds the binary value — a result whose
  * shortest form ends in ...5 (e.g. 0.53375 ≈ 0.533749999…) rounds UP
  * in Spark and DOWN in DuckDB. The oracle gate hash-compares values,
  * so every rounded double must instead use an expression both engines
  * evaluate identically on IEEE doubles: `floor(x*10^d + 0.5) / 10^d`.
  * The matching DuckDB SQL fragment is [[Parity.sqlRound]].
  */
object Parity {

  /** Deterministic half-up rounding (toward +inf at exact halves). */
  def roundHalfUp(c: Column, digits: Int): Column = {
    val p = math.pow(10.0, digits)
    floor(c * p + 0.5) / p
  }

  /** Scalar twin of [[roundHalfUp]] for per-row JVM kernels (decoder
    * features, trained-model confidences, TextRank scores) — ONE home
    * for the house rounding convention on both the Column and scalar
    * paths.
    */
  def roundHalfUpScalar(v: Double, digits: Int): Double = {
    val p = math.pow(10.0, digits)
    math.floor(v * p + 0.5) / p
  }

  /** The DuckDB-side expression equivalent to [[roundHalfUp]]. */
  def sqlRound(exprSql: String, digits: Int): String = {
    val p = "1" + ("0" * digits) + ".0"
    s"floor(($exprSql) * $p + 0.5) / $p"
  }
}
