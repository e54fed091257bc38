package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-parity column helpers. */
object Qf {
  /** DuckDB-bit-compatible double rounding.
    *
    * DuckDB's `round(DOUBLE, n)` computes `std::round(x * 10^n) / 10^n`
    * (round half away from zero); Spark's `round` goes through
    * `BigDecimal.setScale(HALF_UP)` on the exact binary value. The two
    * disagree whenever `x * 10^n` lands on a representation boundary
    * (e.g. 65764.165 → 65764.17 vs 65764.16). Computing the same IEEE
    * double expression on both engines makes rounding bit-identical, so
    * the driver's hash compare can never diverge on rounding algorithm.
    * Uses only codegen'd built-ins — stays inside WholeStageCodegen.
    */
  def dround(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    (signum(c) * floor(abs(c) * p + 0.5) / p).cast("double")
  }

  /** Driver-side scalar twin of [[dround]] — the SAME IEEE expression,
    * for operators that iterate model-sized state on the driver (power
    * iteration) and must round exactly like the column form and the
    * oracle's `round`.
    */
  def droundD(x: Double, n: Int): Double = {
    val p = math.pow(10, n)
    math.signum(x) * math.floor(math.abs(x) * p + 0.5) / p
  }
}
