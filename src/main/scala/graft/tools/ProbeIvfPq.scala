package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{IvfPq, SimilarityOps}

/** Dev probe: where does IVFPQ recall go — the cell-pruning ceiling
  * (true neighbor's cell unprobed: unrecoverable at any code quality) or
  * ADC ranking (true neighbor probed but outside the rerank pool)?
  * Prints recall per (nprobe, residual) plus the prune-only ceiling.
  */
object ProbeIvfPq {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val brute = SimilarityOps.l2TopK(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    for (kc <- Seq(8, 12, 16, 24); residual <- Seq(false, true)) {
      val model = IvfPq.train(emb, "embedding", kc = kc, m = 8, k = 32, iters = 5,
        residual = residual)
      // prune-only ceiling: fraction of true neighbors whose cell is probed
      val cellOf = IvfPq.codeTable(emb, "vec_id", "embedding", model)
        .select("neighbor_id", "__cluster")
        .collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      val qVecs = queries.select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      for (nprobe <- Seq(3, 4, 5, 6, 8)) {
        val probed = qVecs.map { case (id, v) =>
          id -> model.coarse.centroids.zipWithIndex.map { case (c, i) =>
            var d = 0.0; var j = 0
            while (j < c.length) { val t = v(j) - c(j); d += t * t; j += 1 }
            (d, i)
          }.sorted.take(nprobe).map(_._2.toLong).toSet
        }
        val ceiling = brute.count { case (q, n) => probed(q).contains(cellOf(n)) }
          .toDouble / brute.size
        val got = IvfPq.annTopK(queries, "vec_id", "embedding",
            emb, "vec_id", "embedding", model, k = 5, nprobe = nprobe, rerank = 100)
          .select("query_id", "neighbor_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val recall = got.intersect(brute).size.toDouble / brute.size
        println(f"[probe-ivfpq] kc=$kc residual=$residual nprobe=$nprobe ceiling=$ceiling%.3f recall=$recall%.3f")
      }
    }
    spark.stop()
  }
}
