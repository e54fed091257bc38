package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: print the FORMATTED physical plan of the cluster-ledger
  * advance's fused CC edge pass (the exec that dominates the advance's
  * AQE stage-job count), index-bound and index-absent variants.
  */
object ProbeD66Edges {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .withExtensions(new graft.GraftSparkExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val odd = docs.filter(col("doc_id") % 2 =!= 0)
    val path = java.nio.file.Files.createTempDirectory("graft-d66e").toString + "/cl"
    graft.operators.DedupOps.writeClusterLedger(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
    val sigAll = graft.operators.DedupOps
      .minHashSignatures(odd, "doc_id", "text", 8, 5).persist()
    val sig = sigAll.filter(col("mh0").isNotNull)
    val storedSig = spark.read.parquet(s"$path/sig")
    val idx = spark.read.parquet(s"$path/sig/_GRAFT_SIG_INDEX2_B4/bands")
    val asg = spark.read.parquet(s"$path/asg")
    println("=== INDEX-BOUND EDGE PLAN ===")
    println(graft.operators.DedupOps
      .advanceEdges(sig, () => storedSig, Some(idx), asg, "doc_id", 8, 4)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    println("=== INDEX-ABSENT EDGE PLAN ===")
    println(graft.operators.DedupOps
      .advanceEdges(sig, () => storedSig, None, asg, "doc_id", 8, 4)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
