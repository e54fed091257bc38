package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation.
  *
  * Scale design (100 TB): a count-min sketch is a FIXED-SIZE (w×d counter
  * grid) commutative monoid — each partition folds its rows into a local
  * sketch and the shuffle carries one sketch per partition instead of the
  * token stream, so a corpus-wide frequency summary costs one map-side-
  * combined aggregation regardless of vocabulary size. Point lookups then
  * answer from the sketch without ever materializing the vocab. The
  * estimate is deterministic (fixed seed; merge is additive, so partition
  * order cannot change the result) and one-sided: est ≥ true, with
  * est ≤ true + ε·N at confidence `conf`.
  */
object SketchOps {

  /** Build a count-min sketch over a string column and estimate the
    * counts of `candidates`. The sketch and candidate list are bounded
    * driver-side state (same contract as `IvfIndex.train`'s k×dim
    * centroid stats) — the data-sized work all happens in the one
    * distributed aggregation.
    */
  def cmsEstimates(df: DataFrame, valueCol: Column, candidates: Seq[String],
      eps: Double = 0.001, conf: Double = 0.99, seed: Int = 42): Seq[(String, Long)] = {
    val bin = df.select(valueCol.as("__v"))
      .agg(expr(s"count_min_sketch(__v, ${eps}d, ${conf}d, $seed)").as("__sk"))
      .head().getAs[Array[Byte]]("__sk")
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bin))
    candidates.map(t => t -> cms.estimateCount(t))
  }

  /** Approximate heavy hitters: the top-k tokens by exact count alongside
    * their count-min estimates. The exact top-k (a TakeOrdered over a
    * partial-agg) supplies the candidate set; the sketch supplies the
    * estimates a 100 TB pipeline would serve lookups from.
    * Output: (token, exact, est) ordered by exact desc, token.
    */
  def heavyHitters(df: DataFrame, tokenCol: Column, k: Int,
      eps: Double = 0.001, conf: Double = 0.99, seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tok = df.select(tokenCol.as("token"))
    val top = tok.groupBy(col("token")).agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("token")).limit(k)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val ests = cmsEstimates(tok, col("token"), top.map(_._1).toSeq, eps, conf, seed).toMap
    top.map { case (t, exact) => (t, exact, ests(t)) }.toSeq
      .toDF("token", "exact", "est")
      .orderBy(col("exact").desc, col("token"))
  }
}
