package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation for aggregations whose key distribution is
  * pathological (a handful of keys holding most rows — boilerplate
  * documents, bot users, null-ish sentinel keys).
  *
  * AQE's skew handling only splits SHUFFLE JOIN partitions; a skewed
  * aggregation still funnels every row of a hot key through one task's
  * final aggregate. Salting splits each key into `salts` sub-keys for the
  * partial round, then re-aggregates the (tiny) per-salt partials — two
  * shuffles, both balanced, identical results for any decomposable
  * aggregate (sum/count/min/max/avg-as-sum+count).
  *
  * The salt is deterministic (hash of whole-row content mod salts, not
  * rand()) so re-runs and retried tasks produce identical partials —
  * nondeterministic salts break task retry exactly-once semantics.
  */
object SkewOps {

  /** Decomposable aggregates that survive two-phase re-aggregation. */
  sealed trait Agg { def out: String }
  final case class SumAgg(in: Column, out: String) extends Agg
  final case class CountAgg(out: String) extends Agg
  final case class MinAgg(in: Column, out: String) extends Agg
  final case class MaxAgg(in: Column, out: String) extends Agg

  /** `df.groupBy(keys).agg(...)` with a salted first phase: rows spread
    * over `keys + salt`, partials re-combined per key. Result is
    * row-identical to the unsalted aggregation.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salts: Int, aggs: Seq[Agg]): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head match { case a => partial(a) }, aggs.tail.map(partial): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(combine(aggs.head), aggs.tail.map(combine): _*)
  }

  private def partial(a: Agg): Column = a match {
    case SumAgg(in, out) => sum(in).as(s"__p_$out")
    case CountAgg(out) => count(lit(1)).as(s"__p_$out")
    case MinAgg(in, out) => min(in).as(s"__p_$out")
    case MaxAgg(in, out) => max(in).as(s"__p_$out")
  }

  private def combine(a: Agg): Column = a match {
    case SumAgg(_, out) => sum(col(s"__p_$out")).as(out)
    case CountAgg(out) => sum(col(s"__p_$out")).as(out)
    case MinAgg(_, out) => min(col(s"__p_$out")).as(out)
    case MaxAgg(_, out) => max(col(s"__p_$out")).as(out)
  }
}
