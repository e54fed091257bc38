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

  /** Train all `m` codebooks in ONE pass per Lloyd iteration: the
    * per-partition kernel assigns every subvector of a row to its
    * nearest codeword and accumulates m×k×subDim centroid sums — so
    * training costs `iters` scans of the corpus total, not `m × iters`
    * (and only model-sized partials ever reach the driver, combined in
    * partition-index order for determinism). Produces bit-identical
    * codebooks to running IvfIndex.train per subspace slice: same
    * strided seeds, same fixed-count iterations, same tie-breaking.
    */
  def train(data: DataFrame, vecCol: String, m: Int, k: Int, iters: Int): Model = {
    val spark = data.sparkSession
    import spark.implicits._
    val vecs = data.select(col(vecCol).cast("array<double>"))
      .as[Seq[Double]].rdd.map(_.toArray)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = vecs.count()
    require(n > 0, "cannot train PQ on an empty dataset")
    val dim = vecs.first().length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m

    // deterministic init: evenly-strided rows (same rows IvfIndex picks)
    val stride = math.max(1L, n / k)
    val init = vecs.zipWithIndex()
      .filter { case (_, i) => i % stride == 0 && i / stride < k }
      .map { case (v, i) => (i / stride, v) }
      .collect() // exactly ≤k seed vectors reach the driver
      .sortBy(_._1).map(_._2)
    val kk = init.length
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m, kk)((j, c) => init(c).slice(j * subDim, (j + 1) * subDim))

    (0 until iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(books)
      val partials = vecs.mapPartitionsWithIndex { (pid, it) =>
        val cent = bc.value
        val sums = Array.ofDim[Double](m, kk, subDim)
        val cnts = Array.ofDim[Long](m, kk)
        it.foreach { v =>
          var j = 0
          while (j < m) {
            val off = j * subDim
            var best = 0; var bd = Double.MaxValue; var c = 0
            while (c < kk) {
              var d = 0.0; var i = 0
              val cc = cent(j)(c)
              while (i < subDim) { val t = v(off + i) - cc(i); d += t * t; i += 1 }
              if (d < bd) { bd = d; best = c }
              c += 1
            }
            val s = sums(j)(best); var i = 0
            while (i < subDim) { s(i) += v(off + i); i += 1 }
            cnts(j)(best) += 1
            j += 1
          }
        }
        Iterator((pid, (sums, cnts)))
      }.collect() // m×k×(subDim+1) doubles per partition — the model, not the data
      bc.destroy()
      val sums = Array.ofDim[Double](m, kk, subDim)
      val cnts = Array.ofDim[Long](m, kk)
      partials.sortBy(_._1).foreach { case (_, (ps, pc)) =>
        var j = 0
        while (j < m) {
          var c = 0
          while (c < kk) {
            var i = 0
            while (i < subDim) { sums(j)(c)(i) += ps(j)(c)(i); i += 1 }
            cnts(j)(c) += pc(j)(c); c += 1
          }
          j += 1
        }
      }
      // empty clusters keep their previous codeword
      books = Array.tabulate(m, kk) { (j, c) =>
        if (cnts(j)(c) == 0) books(j)(c)
        else sums(j)(c).map(_ / cnts(j)(c))
      }
    }
    vecs.unpersist(blocking = false)
    Model(subDim, books.map(b => IvfIndex.Model(b.toVector)).toVector)
  }

  /** Code columns (one per subspace): nearest-codeword id for each
    * subvector, as codegen'd argmin expressions over codebook literals.
    */
  def encode(vec: Column, model: Model): Seq[Column] =
    (0 until model.m).map { j =>
      IvfIndex.assignCluster(
        slice(vec, j * model.subDim + 1, model.subDim), model.codebooks(j))
    }

  /** The per-candidate index row: id + m code columns, all codegen'd
    * per-row expressions (one scan, no shuffle).
    */
  def codeTable(candidates: DataFrame, cId: String, cVec: String,
      model: Model): DataFrame =
    candidates.select(
      col(cId).as("neighbor_id") +: encode(col(cVec), model)
        .zipWithIndex.map { case (c, j) => c.as(s"__c$j") }: _*)

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
      model: Model, k: Int, rerank: Int = 0, distDecimals: Int = 6,
      prebuiltCodes: Option[DataFrame] = None): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._

    // `prebuiltCodes`: a persisted code table amortizes the corpus
    // encode across query batches (the code table IS the index)
    val codes = prebuiltCodes.getOrElse(codeTable(candidates, cId, cVec, model))

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
    def topK(df: DataFrame, n: Int) =
      SimilarityOps.perKeyTopK(df, "dist", asc = true, n)
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
