package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) ANN: split each vector into `m` subvectors,
  * k-means a small codebook per subspace, and represent every corpus
  * vector by its `m` nearest-codeword ids — 64 floats become `m` bytes.
  * Queries score candidates with asymmetric distance: per query, a
  * lookup table of query-subvector→codeword distances (m×k doubles),
  * and a candidate's approximate distance is the sum of `m` table
  * lookups by its stored codes.
  *
  * This is THE memory-compression scale path for similarity search
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search"):
  * at 100 TB the float corpus cannot live in executor memory, but the
  * 8-byte-per-vector code table can — and scoring never touches the
  * original vectors.
  *
  * Scale design mirrors IvfIndex: training touches only centroid
  * statistics (`m` small codebooks; the data never leaves executors);
  * encoding is a per-row codegen'd expression over codebook literals;
  * the query-side lookup tables are model-sized (n_queries × m × k
  * doubles), computed on the driver from the already-driver-resident
  * model and BROADCAST — candidates stream past them with per-row
  * arithmetic, zero corpus shuffle before the top-k.
  *
  * Determinism: inherits IvfIndex.train's RNG-free init and fixed
  * iteration count; LUT arithmetic is plain double sums in fixed order.
  */
object PqIndex {

  final case class Model(subDim: Int, codebooks: Vector[IvfIndex.Model]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.k
  }

  /** Train one codebook per subspace (m passes over the cached vector
    * column — each pass is an IvfIndex.train on a dim/m slice).
    */
  def train(data: DataFrame, vecCol: String, m: Int, k: Int, iters: Int): Model = {
    val dim = data.select(size(col(vecCol))).first().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val books = (0 until m).map { j =>
      IvfIndex.train(
        data.select(slice(col(vecCol), j * subDim + 1, subDim).as("__sub")),
        "__sub", k, iters)
    }.toVector
    Model(subDim, books)
  }

  /** Code columns (one per subspace): nearest-codeword id for each
    * subvector, as codegen'd argmin expressions over codebook literals.
    */
  def encode(vec: Column, model: Model): Seq[Column] =
    (0 until model.m).map { j =>
      IvfIndex.assignCluster(
        slice(vec, j * model.subDim + 1, model.subDim), model.codebooks(j))
    }

  /** Asymmetric-distance top-k: encode the corpus, broadcast per-query
    * LUTs, rank by summed table lookups. `dist` is the approximate L2
    * (sqrt of the summed squared subspace distances), rounded for
    * deterministic ordering.
    *
    * With `rerank > 0`, runs the standard ADC + re-rank pipeline: the
    * top `rerank` candidates per query by approximate distance form a
    * pool that is re-scored with EXACT distances. The pool id set is
    * query-count-sized and broadcast, so the re-rank reads full vectors
    * for only `n_queries × rerank` rows — the corpus floats still never
    * shuffle and are never resident beyond the one scoring scan.
    */
  def annTopK(queries: DataFrame, qId: String, qVec: String,
      candidates: DataFrame, cId: String, cVec: String,
      model: Model, k: Int, rerank: Int = 0, distDecimals: Int = 6): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._

    val codes = candidates.select(
      col(cId).as("neighbor_id") +: encode(col(cVec), model)
        .zipWithIndex.map { case (c, j) => c.as(s"__c$j") }: _*)

    // per-query LUTs: n_queries × m × k doubles — model-sized, driver math
    val qRows = queries.select(col(qId).cast("long"), col(qVec).cast("array<double>"))
      .as[(Long, Seq[Double])].collect() // bounded: the query set
    val luts = qRows.toSeq.map { case (id, v) =>
      val lut = (0 until model.m).map { j =>
        val sub = v.slice(j * model.subDim, (j + 1) * model.subDim)
        model.codebooks(j).centroids.map { c =>
          var d = 0.0; var i = 0
          while (i < model.subDim) { val t = sub(i) - c(i); d += t * t; i += 1 }
          d
        }.toSeq
      }
      (id, lut)
    }
    val lutDf = luts.toDF("query_id", "__lut")

    val adist2 = (0 until model.m)
      .map(j => element_at(element_at(col("__lut"), j + 1), col(s"__c$j") + 1))
      .reduce(_ + _)
    val scored = codes.join(broadcast(lutDf), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        graft.queries.Qf.dround(sqrt(adist2), distDecimals).as("dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("neighbor_id"))
    def topK(df: DataFrame, n: Int) = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= n)
      .select(col("query_id"), col("neighbor_id"), col("dist"), col("rk").cast("int").as("rk"))
    if (rerank <= 0) topK(scored, k)
    else {
      val pool = topK(scored, rerank).select(col("query_id"), col("neighbor_id"))
      val exact = broadcast(pool)
        .join(candidates.select(col(cId).as("neighbor_id"), col(cVec).as("__cv")), Seq("neighbor_id"))
        .join(broadcast(queries.select(col(qId).as("query_id"), col(qVec).as("__qv"))), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          graft.queries.Qf.dround(
            sqrt(graft.functions.VectorExpressions.sqDistFF(col("__qv"), col("__cv"))),
            distDecimals).as("dist"))
      topK(exact, k)
    }
  }
}
