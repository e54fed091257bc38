package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the LSM cluster-ledger advance: build ledgers over a
  * 1× and a 10× corpus, advance the SAME fixed-size batch into each,
  * and time the advance — the r9 design rewrote the O(corpus)
  * assignments table per advance, so its advance time scaled with the
  * corpus; the delta design's should track the batch.
  */
object ProbeClusterAdvance {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val n1 = docs.count()
    // 10x corpus: replicate with disjoint id ranges and salted text so
    // replicas don't all collapse into one near-dup cluster
    val big = (0 until 10).map { r =>
      docs.select((col("doc_id") + lit(r * 10 * n1)).as("doc_id"),
        concat(col("text"), lit(s" replica$r marker$r")).as("text"))
    }.reduce(_ unionByName _)
    val batch = docs.select((col("doc_id") + lit(1000L * n1)).as("doc_id"),
        col("text"))
      .limit(500)
    def time(what: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe-cluster] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    Seq(("1x", docs), ("10x", big)).foreach { case (tag, corpus) =>
      val path = java.nio.file.Files.createTempDirectory(s"graft-cl-$tag").toString + "/cl"
      time(s"$tag build (${corpus.count()} docs)") {
        graft.operators.DedupOps.writeClusterLedger(corpus, "doc_id", "text", path)
      }
      time(s"$tag advance (500-doc batch)") {
        graft.operators.DedupOps.advanceClusterLedger(batch, "doc_id", "text", path)
      }
      time(s"$tag read resolved") {
        println("[probe-cluster] rows: " + graft.operators.DedupOps
          .readClusterAssignments(spark, path).count())
      }
    }
    spark.stop()
  }
}
