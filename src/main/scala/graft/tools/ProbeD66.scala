package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-phase timing of the d66 conformance cycle. */
object ProbeD66 {
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
    def time(what: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe-d66] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    (1 to 2).foreach { pass =>
      val path = java.nio.file.Files.createTempDirectory(s"graft-d66-$pass").toString + "/cl"
      val odd = docs.filter(col("doc_id") % 2 === 1)
      time(s"p$pass write") {
        graft.operators.DedupOps.writeClusterLedger(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
      }
      time(s"p$pass advance") {
        graft.operators.DedupOps.advanceClusterLedger(odd, "doc_id", "text", path)
      }
      time(s"p$pass replay") {
        graft.operators.DedupOps.advanceClusterLedger(odd, "doc_id", "text", path)
      }
      time(s"p$pass compact") {
        graft.operators.DedupOps.compactClusterLedger(spark, path)
      }
      time(s"p$pass read") {
        println("[probe-d66] rows: " +
          graft.operators.DedupOps.readClusterAssignments(spark, path).count())
      }
    }
    spark.stop()
  }
}
