package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the BENCHED d66 shape exactly (marked advance + marked
  * replay, the batchId fast path), leg times plus Spark JOB COUNTS per
  * leg — sequential driver barriers amplify sibling contention
  * linearly (the d105/d106 lesson), so job count is the lever to read
  * before touching any leg.
  */
object ProbeD66Bench {
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def time(what: String)(f: => Unit): Unit = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      f
      println(f"[probe-d66b] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        f"  jobs=${jobs.get() - j0}")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 3).foreach { pass =>
      val path = java.nio.file.Files
        .createTempDirectory(s"graft-d66b-$pass").toString + "/cl"
      val odd = docs.filter(col("doc_id") % 2 =!= 0)
      time(s"p$pass write") {
        graft.operators.DedupOps.writeClusterLedger(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
      }
      time(s"p$pass advance") {
        graft.operators.DedupOps.advanceClusterLedger(odd, "doc_id", "text",
          path, batchId = Some("odd-1"))
      }
      time(s"p$pass replay(marked)") {
        graft.operators.DedupOps.advanceClusterLedger(odd, "doc_id", "text",
          path, batchId = Some("odd-1"))
      }
      time(s"p$pass compact") {
        graft.operators.DedupOps.compactClusterLedger(spark, path)
      }
      time(s"p$pass read+sizes") {
        val labels = graft.operators.DedupOps.readClusterAssignments(spark, path)
          .select(col("node").as("doc_id"), col("label").as("cluster_id"))
        val sizes = labels.groupBy(col("cluster_id"))
          .agg(count(lit(1)).as("cluster_size"))
        labels.join(sizes, Seq("cluster_id"))
          .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
