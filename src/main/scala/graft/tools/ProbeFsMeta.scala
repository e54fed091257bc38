package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: bound the Hadoop-FS metadata cost of the sig-index
  * invalidation (exists + listStatus + per-dir delete/exists) on a
  * REAL cluster-ledger /sig dir, so a bench-scale regression can be
  * attributed to (or exonerated from) the r16 fail-loud hardening
  * with a measured number instead of an argument.
  */
object ProbeFsMeta {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val iters = if (args.length > 1) args(1).toInt else 1000
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val path = java.nio.file.Files
      .createTempDirectory("graft-fsmeta").toString + "/cl"
    graft.operators.DedupOps.writeClusterLedger(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
    val sig = new org.apache.hadoop.fs.Path(path + "/sig")
    val fs = sig.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(sig).length
    // warm
    (1 to 100).foreach(_ => fs.listStatus(sig))
    val t0 = System.nanoTime()
    var dirs = 0
    (1 to iters).foreach { _ =>
      if (fs.exists(sig))
        dirs += fs.listStatus(sig).count(st => st.isDirectory &&
          st.getPath.getName.startsWith("_GRAFT_SIG_INDEX"))
    }
    val perOp = (System.nanoTime() - t0) / 1e6 / iters
    println(f"[probe-fsmeta] /sig entries=$entries; exists+listStatus+filter: " +
      f"$perOp%.3f ms/op over $iters iters " +
      f"(r16 double-listing cost per append ≈ ${2 * perOp}%.3f ms; " +
      f"3 appends/cycle ≈ ${6 * perOp}%.3f ms)")
    spark.stop()
  }
}
