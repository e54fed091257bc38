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
  *     value its 0-based index range [start, end) (sort-based, spills
  *     gracefully — never a hash map); the group total n joins in from
  *     a broadcast model-sized aggregate (one row per group);
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
      valueCol: Column, qs: Seq[(String, Double)]): DataFrame =
    exactQuantilesMulti(df, keys, Seq(("m", valueCol, qs)))

  /** Quantiles over SEVERAL value columns in ONE pass over `df`: the
    * measures are unpivoted to `(keys, measure, value)` rows first, so
    * the distinct-count shuffle, the ranking window and the final pick
    * aggregation each run once for all measures together — not once per
    * measure (which would scan and shuffle the fact table N times and
    * join the results back).
    *
    * `measures`: (measureName, valueColumn, quantiles). Quantile output
    * names must be globally unique across measures; output is one row
    * per key with every requested quantile column.
    */
  def exactQuantilesMulti(df: DataFrame, keys: Seq[String],
      measures: Seq[(String, Column, Seq[(String, Double)])]): DataFrame = {
    val keyCols = keys.map(col)
    // unpivot: one row per (input row × measure); NULL measure values are
    // dropped per measure (matching the built-in aggregate), not per row
    val unpivoted = df
      .select(keyCols ++ measures.map { case (m, c, _) => c.cast("double").as(s"__in_$m") }: _*)
      .unpivot(
        ids = keyCols.toArray,
        values = measures.map { case (m, _, _) => col(s"__in_$m").as(m) }.toArray,
        variableColumnName = "__m", valueColumnName = "__v")
      .filter(col("__v").isNotNull)
    val counts = unpivoted
      .groupBy(keyCols ++ Seq(col("__m"), col("__v")): _*)
      .agg(count(lit(1)).as("__cnt"))
    val grp = keyCols :+ col("__m")
    val wOrd = Window.partitionBy(grp: _*).orderBy(col("__v"))
    // group totals via a tiny broadcast aggregate, NOT a second
    // unbounded window: a whole-partition WindowExec pass over every
    // distinct value costs as much as the ranking window itself, while
    // this aggregate is map-side-combined down to one row per
    // (keys, measure)
    val totals = unpivoted.groupBy(grp: _*).agg(count(lit(1)).as("__n"))
    val ranked = counts
      .withColumn("__end", sum(col("__cnt")).over(wOrd)) // 1-based end of this value's run
      .withColumn("__start", col("__end") - col("__cnt")) // 0-based first index
      .join(broadcast(totals), keys :+ "__m") // per (keys, measure) total
    val aggs = measures.flatMap { case (m, _, qs) =>
      qs.flatMap { case (name, q) =>
        // __n is this row's own (keys, measure) group total, so the target
        // rank t is row-local; the when(__m === m) guards pivot the fused
        // frame back apart during the single final aggregation
        val t = (col("__n") - 1) * lit(q)
        val i0 = floor(t)
        val i1 = ceil(t)
        val isM = col("__m") === lit(m)
        Seq(
          max(when(isM && col("__start") <= i0 && i0 < col("__end"), col("__v"))).as(s"__${name}_lo"),
          max(when(isM && col("__start") <= i1 && i1 < col("__end"), col("__v"))).as(s"__${name}_hi"),
          max(when(isM, t)).as(s"__${name}_t"))
      }
    }
    val picked = ranked.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    val outCols = keyCols ++ measures.flatMap { case (_, _, qs) => qs.map { case (name, _) =>
      val (lo, hi, t) = (col(s"__${name}_lo"), col(s"__${name}_hi"), col(s"__${name}_t"))
      // Spark Percentile.getPercentile: lower when the rank is integral,
      // else lower·(higher−rank) + higher·(rank−lower)
      when(floor(t) === ceil(t), lo)
        .otherwise(lo * (ceil(t) - t) + hi * (t - floor(t)))
        .as(name)
    } }
    picked.select(outCols: _*)
  }
}
