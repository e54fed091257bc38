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

  /** Deterministic total order for a MODEL-SIZED conformance dump at
    * single-exchange cost. A trailing global `orderBy` pays a
    * range-boundary SAMPLING job plus a range exchange for a property
    * the dump needs only for determinism (the driver compare
    * canonicalizes row order itself — the s08 rationale). This form
    * skips the sampling job: one round-robin exchange down to a single
    * partition, then an in-partition sort = the same total order, one
    * fewer driver barrier per query (measured 113→65 ms narrow-tailed,
    * 120→98 ms agg-tailed, warm sf0.1).
    *
    * `repartition(1)`, NOT `coalesce(1)`: coalesce propagates the
    * single partition up through narrow stages (it would serialize a
    * scan or broadcast-join probe upstream); repartition is an
    * exchange barrier, so every upstream stage keeps full width.
    * ONLY for outputs that stay model-sized at any corpus scale
    * (aggregates, top-k, sweeps, verdict relations): a
    * corpus-proportional dump keeps the parallel global orderBy —
    * single-partitioning one of those at 100 TB would bottleneck the
    * write.
    */
  /** Run independent side-effect legs (disjoint ledger stores) as
    * concurrent Spark jobs — the guide's "overlap independent jobs"
    * pattern: a conformance cycle composed of two or three unrelated
    * write→advance chains is otherwise a straight line of driver
    * barriers whose tails leave the executor pool idle (and every
    * sequential barrier is a scheduling point sibling-host CPU can
    * steal — the d105/d106 lesson). EVERY leg is awaited on EVERY
    * exit (the r16 always-awaited discipline): a failed leg must not
    * leave a sibling still mutating its store in the background after
    * the caller observed failure. The first failure propagates.
    * ONLY for legs over disjoint stores: same-store chains keep their
    * program order.
    */
  def concurrently(legs: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = legs.map(l => Future(l()))
    val outcomes = fs.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
    outcomes.collectFirst { case scala.util.Failure(e) => throw e }
  }

  implicit class DumpSortOps(private val df: org.apache.spark.sql.DataFrame)
      extends AnyVal {
    def dumpSorted(first: String, rest: String*): org.apache.spark.sql.DataFrame =
      df.repartition(1).sortWithinPartitions(first, rest: _*)
    def dumpSortedBy(cols: Column*): org.apache.spark.sql.DataFrame =
      df.repartition(1).sortWithinPartitions(cols: _*)
  }
}
