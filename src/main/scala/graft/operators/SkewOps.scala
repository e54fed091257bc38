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
    require(aggs.nonEmpty, "saltedAgg needs at least one aggregate")
    val salted = df.withColumn("__salt", rowSalt(df, salts))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial(aggs.head), aggs.tail.map(partial): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(combine(aggs.head), aggs.tail.map(combine): _*)
  }

  /** The deterministic per-row salt both ops share: content hash PLUS
    * the input partition id. Content alone is the retry-idempotent
    * part, but BYTE-IDENTICAL duplicate rows of a hot key — exactly
    * the boilerplate-document case this module exists for — would all
    * hash to ONE salt and defeat the spread entirely; folding the
    * partition id in spreads identical rows across as many salts as
    * input partitions touch them while staying deterministic under
    * task retry (a retried task re-reads the same input split, so pid
    * and content are both stable). Residual: identical rows WITHIN one
    * input partition still share a salt — bounded by
    * spark.sql.files.maxPartitionBytes, not by the hot key's size.
    */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(hash((df.columns.map(col) :+ spark_partition_id()).toIndexedSeq: _*),
      lit(salts))

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

  /** Salted equi-join for a hot-keyed BIG side against a side too large
    * to broadcast: the big side gets a deterministic per-row salt, the
    * small side replicates `salts`× with every salt value, and the join
    * runs on `key + salt` — each hot key's rows spread over `salts`
    * shuffle partitions instead of funneling into one. Result is
    * row-identical to the plain join (every big row still meets every
    * matching small row exactly once, under exactly one salt).
    *
    * Use when AQE's skew-join split can't apply (it only rewrites
    * sort-merge/shuffle-hash joins it plans itself — not stateful or
    * pre-partitioned pipelines). Cost: the small side shuffles `salts`×
    * its size; pick `salts` ≈ hot-key-rows / healthy-partition-rows.
    * The salt is content-deterministic (like [[saltedAgg]]'s) so task
    * retries rebuild identical partitions.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigS = big.withColumn("__salt", rowSalt(big, salts))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
