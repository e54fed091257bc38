package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT percentiles (interpolated, `quantile_cont`
  * semantics) without materializing groups in memory.
  *
  * Spark's built-in `percentile` aggregate buffers every (value → count)
  * of a group in one executor hash map — at 100 TB a single popular group
  * holds ~10⁸ entries and OOMs, and even at bench scale the map churn
  * dominates GC. This operator computes the same result with bounded
  * memory from three shuffle-friendly steps:
  *
  *  1. `groupBy(keys, value).count()` — the shuffle carries DISTINCT
  *     (key, value) pairs with counts (map-side combined);
  *  2. one window over the group ordered by value gives each distinct
  *     value its 0-based index range [start, end) plus the group total n
  *     (sort-based, spills gracefully — never a hash map);
  *  3. for each requested quantile q, target rank t = (n−1)·q; the values
  *     at ⌊t⌋/⌈t⌉ are picked with conditional `max(when(...))` aggregates
  *     and interpolated exactly like Spark's built-in:
  *     v_lo·(⌈t⌉−t) + v_hi·(t−⌊t⌋) (v_lo when t is integral).
  *
  * NULL values are excluded, like the built-in aggregate.
  */
object PercentileOps {

  /** One output row per key: `keys ++ quantile columns` (named by the
    * caller via `qs`: name → q in [0,1]).
    */
  def exactQuantiles(df: DataFrame, keys: Seq[String],
      valueCol: Column, qs: Seq[(String, Double)]): DataFrame = {
    val keyCols = keys.map(col)
    val counts = df
      .filter(valueCol.isNotNull)
      .groupBy(keyCols :+ valueCol.cast("double").as("__v"): _*)
      .agg(count(lit(1)).as("__cnt"))
    val wOrd = Window.partitionBy(keyCols: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(keyCols: _*)
    val ranked = counts
      .withColumn("__end", sum(col("__cnt")).over(wOrd)) // 1-based end of this value's run
      .withColumn("__start", col("__end") - col("__cnt")) // 0-based first index
      .withColumn("__n", sum(col("__cnt")).over(wAll))
    val aggs = qs.flatMap { case (name, q) =>
      val t = (col("__n") - 1) * lit(q)
      val i0 = floor(t)
      val i1 = ceil(t)
      Seq(
        max(when(col("__start") <= i0 && i0 < col("__end"), col("__v"))).as(s"__${name}_lo"),
        max(when(col("__start") <= i1 && i1 < col("__end"), col("__v"))).as(s"__${name}_hi"),
        first(t).as(s"__${name}_t"))
    }
    val picked = ranked.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    val outCols = keyCols ++ qs.map { case (name, _) =>
      val (lo, hi, t) = (col(s"__${name}_lo"), col(s"__${name}_hi"), col(s"__${name}_t"))
      // Spark Percentile.getPercentile: lower when the rank is integral,
      // else lower·(higher−rank) + higher·(rank−lower)
      when(floor(t) === ceil(t), lo)
        .otherwise(lo * (ceil(t) - t) + hi * (t - floor(t)))
        .as(name)
    }
    picked.select(outCols: _*)
  }
}
