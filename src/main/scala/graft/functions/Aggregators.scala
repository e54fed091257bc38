package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (`Aggregator[IN, BUF, OUT]`) — the engine's
  * user-defined-aggregate extension point (the reference's host engine
  * exposes the analogous DuckDB aggregate-function API; SURVEY §2.C).
  *
  * Aggregators merge partial buffers map-side like built-ins, so they
  * scale the same way: the shuffle carries one small buffer per
  * (partition, group), never rows.
  */
object Aggregators {

  /** Weighted mean: sum(x·w)/sum(w) with null-safe inputs. */
  final case class WSum(var sum: Double, var wsum: Double)

  object WeightedMean extends Aggregator[(Double, Double), WSum, Double] {
    override def zero: WSum = WSum(0.0, 0.0)
    override def reduce(b: WSum, a: (Double, Double)): WSum = {
      b.sum += a._1 * a._2; b.wsum += a._2; b
    }
    override def merge(x: WSum, y: WSum): WSum = {
      x.sum += y.sum; x.wsum += y.wsum; x
    }
    override def finish(r: WSum): Double = if (r.wsum == 0.0) Double.NaN else r.sum / r.wsum
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form usable in untyped `agg(...)`. */
  def weightedMean(x: Column, w: Column): Column =
    udaf(WeightedMean).apply(x, w)

  /** Register for SQL: `SELECT weighted_mean(x, w)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("weighted_mean", udaf(WeightedMean))
}
