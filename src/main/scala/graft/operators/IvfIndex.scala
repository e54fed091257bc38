package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: k-means coarse quantizer + per-cluster
  * candidate lists — the classic scale path for similarity search
  * (alternative to hyperplane LSH; see SimilarityOps).
  *
  * Scale design: training touches only centroid statistics (k×dim
  * doubles collected per iteration — the MODEL is small, the data never
  * leaves executors); assignment is a per-row expression over broadcast
  * centroid literals; probing reads only `nprobe` of `k` cluster
  * partitions. With the corpus written bucket-partitioned by
  * `cluster`, a probe is a partition-pruned scan of ~nprobe/k of the
  * data.
  *
  * Determinism: centroids initialize from evenly-strided input rows
  * (no RNG), and Lloyd iterations are fixed-count — the same inputs
  * always produce the same model.
  */
object IvfIndex {

  final case class Model(centroids: Vector[Array[Double]]) {
    def k: Int = centroids.length
  }

  private def centroidCol(c: Array[Double]): Column = array(c.map(lit).toIndexedSeq: _*)

  /** Squared L2 distance from a float-vector column to a centroid literal.
    * Fused codegen'd kernel (SqDistFD) — bit-identical to the composable
    * `aggregate(zip_with(v,c,(x,y)=>(x-y)*(x-y)),0d,+)` form, which is
    * interpreted and re-evaluates per use site. (||v||² − 2·v·c + ||c||²
    * would save work but subtracting large doubles loses precision; the
    * direct form stays deterministic.)
    */
  private def sqDist(vec: Column, c: Array[Double]): Column =
    graft.functions.VectorExpressions.sqDistFD(vec, centroidCol(c))

  /** Nearest-centroid id for a vector column.
    *
    * argmin is `array_position(d, array_min(d)) - 1` over the distance
    * array — each distance evaluates a bounded number of times. (A
    * when-chain fold re-evaluates its accumulated branch twice per
    * level → exponential interpreted-eval blowup; measured as a
    * 300s+ single task before this form.)
    */
  def assignCluster(vec: Column, model: Model): Column = {
    val darr = array(model.centroids.map(sqDist(vec, _)): _*)
    (array_position(darr, array_min(darr)) - 1).cast("int")
  }

  /** Train by fixed-count Lloyd iterations. Only k×dim centroid sums are
    * aggregated; `data` is scanned `iters + 1` times and never collected.
    */
  def train(data: DataFrame, vecCol: String, k: Int, iters: Int): Model = {
    val spark = data.sparkSession
    val dim = data.select(size(col(vecCol))).head().getInt(0)

    // deterministic init: evenly-strided rows in id-less order → use a
    // row_number over a stable sort of the vector's first components
    val n = data.count()
    val stride = math.max(1L, n / k)
    val init = data
      .select(col(vecCol).cast("array<double>").as("v"))
      .withColumn("__id", monotonically_increasing_id())
      .filter(col("__id") % stride === 0) // strided pick, filtered on executors
      .limit(k)
      .collect() // exactly k seed vectors reach the driver
      .map(_.getSeq[Double](0).toArray)
      .toVector

    var model = Model(init)
    (0 until iters).foreach { _ =>
      // persist = optimizer barrier: without it CollapseProject inlines
      // the argmin into the exploded projection and re-evaluates the
      // full centroid distance per vector ELEMENT (dim× blowup). MLlib
      // k-means caches the assignment for the same reason.
      val assigned = data.select(col(vecCol).as("v"),
        assignCluster(col(vecCol), model).as("cluster"))
        .persist()
      // per-cluster elementwise mean via posexplode + (cluster, pos) agg —
      // shuffles k×dim aggregates, not vectors
      val sums = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(avg(col("x")).as("m"))
        .collect()
      assigned.unpersist()
      val next = Array.fill(model.k)(new Array[Double](dim))
      val seen = Array.fill(model.k)(false)
      sums.foreach { r =>
        val c = r.getInt(0); seen(c) = true
        next(c)(r.getInt(1)) = r.getDouble(2)
      }
      // empty clusters keep their previous centroid
      model = Model(next.toVector.zipWithIndex.map { case (c, i) =>
        if (seen(i)) c else model.centroids(i) })
    }
    model
  }

  /** ANN top-k: probe the `nprobe` nearest clusters per query, exact
    * cosine rescoring within them.
    */
  def annTopK(queries: DataFrame, qId: String, qVec: String,
      candidates: DataFrame, cId: String, cVec: String,
      model: Model, k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = candidates.select(col(cId).as("neighbor_id"), col(cVec).as("__cv"),
      assignCluster(col(cVec), model).as("__cluster"))
    // query → its nprobe nearest clusters (exploded probe list)
    val qDists = model.centroids.zipWithIndex.map { case (c, i) =>
      struct(sqDist(col(qVec), c).as("d"), lit(i).as("c"))
    }
    val qb = queries.select(col(qId).as("query_id"), col(qVec).as("__qv"),
      slice(array_sort(array(qDists: _*)), 1, nprobe).as("__probes"))
      .select(col("query_id"), col("__qv"),
        explode(col("__probes.c")).as("__cluster"))
    val scored = broadcast(qb).join(cb, Seq("__cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.queries.Qf.dround(SimilarityOps.cosine(col("__qv"), col("__cv")), 6).as("score"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("score").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rk").cast("int").as("rk"))
  }
}
