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

  /** Sketch estimates from PRE-AGGREGATED (value, count) rows: adding a
    * value with weight `count` touches the same cells `count` unit adds
    * would, and the sketch is additive, so the resulting sketch — and
    * therefore every estimate — is IDENTICAL to streaming the raw
    * occurrences (same library, same eps/conf/seed hash functions).
    * The win is pass economics: the sketch build runs over the
    * vocabulary, not the token stream, so a caller that already owns
    * the grouped counts (any heavy-hitter pipeline does) pays one
    * corpus pass total instead of two.
    */
  def cmsEstimatesWeighted(counts: DataFrame, valueCol: Column, weightCol: Column,
      candidates: Seq[String],
      eps: Double = 0.001, conf: Double = 0.99, seed: Int = 42): Seq[(String, Long)] = {
    val spark = counts.sparkSession
    import spark.implicits._
    val empty = org.apache.spark.util.sketch.CountMinSketch.create(eps, conf, seed)
    // the count_min_sketch SQL aggregate SKIPS NULL inputs; mirror that
    // here — CountMinSketch.add(null, c) would throw
    val cms = counts.select(valueCol.cast("string").as("__v"), weightCol.cast("long").as("__c"))
      .filter(col("__v").isNotNull)
      .as[(String, Long)].rdd
      .mapPartitions { it =>
        val sk = org.apache.spark.util.sketch.CountMinSketch.create(eps, conf, seed)
        it.foreach { case (v, c) => sk.add(v, c) }
        Iterator(sk)
      }
      // fold (not reduce): an empty counts frame still yields the empty
      // sketch instead of throwing
      .fold(empty) { (a, b) => a.mergeInPlace(b); a }
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
    // ONE corpus pass: the grouped counts feed both the exact top-k
    // (TakeOrdered) and the weighted sketch build — persisted so the
    // two actions share the explode+shuffle instead of re-running it.
    // The cache is vocabulary-sized (distinct tokens), never the token
    // stream, and is dropped synchronously after the second action.
    // NULL tokens are excluded up front: the sketch side skips NULLs
    // (count_min_sketch semantics), so a NULL in the top-k could never
    // be estimated anyway
    val counts = df.select(tokenCol.as("token"))
      .filter(col("token").isNotNull)
      .groupBy(col("token")).agg(count(lit(1)).as("exact"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val top = counts
        .orderBy(col("exact").desc, col("token")).limit(k)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val ests = cmsEstimatesWeighted(counts, col("token"), col("exact"),
        top.map(_._1).toSeq, eps, conf, seed).toMap
      top.map { case (t, exact) => (t, exact, ests(t)) }.toSeq
        .toDF("token", "exact", "est")
        .orderBy(col("exact").desc, col("token"))
    } finally counts.unpersist(false)
  }
}
