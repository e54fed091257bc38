package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: print every Spark job (callsite + wall) fired by one
  * cluster-ledger write / advance / compact / read cycle — the job-level
  * dissection behind the d66 fusion work.
  */
object ProbeD66Jobs {
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
    val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          t0.put(js.jobId, System.nanoTime())
          val execId = Option(js.properties.getProperty("spark.sql.execution.id"))
            .map("exec=" + _).getOrElse("")
          val stages = js.stageInfos.map(_.name.take(70)).mkString(" ;; ")
          println(f"[job ${js.jobId}%3d START] $execId stages[${js.stageInfos.size}]: $stages")
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val ms = (System.nanoTime() - t0.getOrDefault(je.jobId, 0L)) / 1e6
          println(f"[job ${je.jobId}%3d END  ] $ms%.0f ms")
        }
      })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val odd = docs.filter(col("doc_id") % 2 =!= 0)
    // warm pass (uncounted chatter is fine — job ids keep increasing)
    val wpath = java.nio.file.Files.createTempDirectory("graft-d66j-w").toString + "/cl"
    graft.operators.DedupOps.writeClusterLedger(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", wpath)
    graft.operators.DedupOps.advanceClusterLedger(odd, "doc_id", "text",
      wpath, batchId = Some("odd-1"))
    graft.operators.DedupOps.compactClusterLedger(spark, wpath)
    println("=== WARM DONE — phases below are the measured cycle ===")
    val path = java.nio.file.Files.createTempDirectory("graft-d66j").toString + "/cl"
    println("=== PHASE write ===")
    graft.operators.DedupOps.writeClusterLedger(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
    println("=== PHASE advance ===")
    graft.operators.DedupOps.advanceClusterLedger(odd, "doc_id", "text",
      path, batchId = Some("odd-1"))
    println("=== PHASE compact ===")
    graft.operators.DedupOps.compactClusterLedger(spark, path)
    println("=== PHASE read+sizes ===")
    val labels = graft.operators.DedupOps.readClusterAssignments(spark, path)
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
    val sizes = labels.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
      .orderBy("doc_id")
      .write.format("noop").mode("overwrite").save()
    println("=== DONE ===")
    spark.stop()
  }
}
