package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pure range join — `point BETWEEN lo AND hi` with NO equality key.
  *
  * Spark plans a bare inequality join as BroadcastNestedLoopJoin (O(n·m)
  * pair evaluations); engines the reference inherits (DuckDB) special-case
  * it with IEJoin. The Spark-first equivalent is BINNING: quantize the
  * range dimension into fixed-width bins, explode each interval to the
  * bins it covers, map each point to its single bin, equi-join on the bin
  * id, then apply the exact predicate. The O(n·m) loop becomes one
  * hash-shuffle join whose cost is Σ per-bin (points × intervals) — the
  * classic spatial-grid trick, AQE-skew-splittable like any equi-join.
  *
  * A (point, interval) pair meets in exactly ONE bin (the point's), so no
  * post-join dedup is needed. `binWidth` trades shuffle fan-out
  * (intervals replicate to ⌈len/binWidth⌉+1 bins) against bin selectivity
  * — set it near the typical interval length.
  */
object IntervalJoin {

  /** Join `points` to every interval containing the point.
    * `pointCol` / `loCol` / `hiCol` must be integral (day numbers, epoch
    * seconds, …); all columns of both inputs are kept.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val pb = points.withColumn("__bin", floor(col(pointCol) / binWidth).cast("long"))
    val ib = intervals.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    pb.join(ib, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
