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

  /** Nearest-centroid id for a vector column — ONE compiled expression
    * over the referenced centroid matrix ([[graft.functions.NearestCentroid]]).
    * The earlier `array(per-centroid dist…) + array_position(array_min)`
    * form was linear in k at the generated-SOURCE level and blew
    * Janino's 64 KB method limit (→ silent interpreted fallback) once
    * k ∝ corpus-size clustering pushed k into the hundreds.
    */
  def assignCluster(vec: Column, model: Model): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.NearestCentroid(
        org.apache.spark.sql.GraftSqlShims.expression(vec),
        model.centroids.map(_.toIndexedSeq).toIndexedSeq))

  /** The `nprobe` nearest centroid ids for a vector column (multi-probe /
    * soft assignment), nearest first; ties ascending by id.
    */
  def assignClusters(vec: Column, model: Model, nprobe: Int): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.NearestCentroids(
        org.apache.spark.sql.GraftSqlShims.expression(vec),
        model.centroids.map(_.toIndexedSeq).toIndexedSeq, nprobe))

  /** Train by fixed-count Lloyd iterations. Only k×(dim+1) partial sums
    * per partition ever reach the driver; `data` is cached as a vector
    * RDD and scanned once per iteration.
    *
    * The iteration is a `mapPartitions` kernel over BROADCAST centroids,
    * not a Catalyst expression: centroid literals change every
    * iteration, so an expression form re-plans and janino-recompiles a
    * k×dim-literal plan per iteration — the compile time dominated the
    * whole train at small scale, and at any scale the kernel's one pass
    * (no posexplode shuffle of dim× rows) is strictly less work.
    * Partials are combined on the driver in partition-index order, so
    * the floating-point sum order — and therefore the model — is
    * deterministic for a given input partitioning.
    */
  def train(data: DataFrame, vecCol: String, k: Int, iters: Int): Model = {
    val spark = data.sparkSession
    import spark.implicits._
    val vecs = data.select(col(vecCol).cast("array<double>"))
      .as[Seq[Double]].rdd.map(_.toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = vecs.count()
    require(n > 0, "cannot train IVF on an empty dataset")
    val dim = vecs.first().length

    // deterministic init: evenly-strided rows by global row index
    val stride = math.max(1L, n / k)
    val init = vecs.zipWithIndex()
      .filter { case (_, i) => i % stride == 0 && i / stride < k }
      .map { case (v, i) => (i / stride, v) }
      .collect() // exactly ≤k seed vectors reach the driver
      .sortBy(_._1).map(_._2).toVector

    var model = Model(init)
    (0 until iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(model.centroids.toArray)
      val partials = vecs.mapPartitionsWithIndex { (pid, it) =>
        val cent = bc.value
        val sums = Array.ofDim[Double](cent.length, dim)
        val cnts = new Array[Long](cent.length)
        it.foreach { v =>
          var best = 0; var bd = Double.MaxValue; var c = 0
          while (c < cent.length) {
            var d = 0.0; var j = 0
            val cc = cent(c)
            while (j < dim) { val t = v(j) - cc(j); d += t * t; j += 1 }
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          val s = sums(best); var j = 0
          while (j < dim) { s(j) += v(j); j += 1 }
          cnts(best) += 1
        }
        Iterator((pid, (sums, cnts)))
      }.collect() // k×(dim+1) doubles per partition — the model, not the data
      bc.destroy()
      val sums = Array.ofDim[Double](model.k, dim)
      val cnts = new Array[Long](model.k)
      partials.sortBy(_._1).foreach { case (_, (ps, pc)) =>
        var c = 0
        while (c < model.k) {
          var j = 0
          while (j < dim) { sums(c)(j) += ps(c)(j); j += 1 }
          cnts(c) += pc(c); c += 1
        }
      }
      // empty clusters keep their previous centroid
      model = Model((0 until model.k).map { c =>
        if (cnts(c) == 0) model.centroids(c)
        else { val m = new Array[Double](dim); var j = 0
          while (j < dim) { m(j) = sums(c)(j) / cnts(c); j += 1 }; m }
      }.toVector)
    }
    vecs.unpersist(false)
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
    SimilarityOps.perKeyTopK(scored, "score", asc = false, k)
  }
}
