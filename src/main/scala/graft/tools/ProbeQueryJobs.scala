package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: list every Spark job (final-stage callsite + wall) fired
  * by ONE named query — warm pass first (uncounted), then the measured
  * pass. Usage: runMain graft.tools.ProbeQueryJobs <name> [sfDir]
  */
object ProbeQueryJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .withExtensions(new graft.GraftSparkExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(): Unit = graft.SparkEntry.queries(name)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    run() // warm
    println("=== MEASURED PASS ===")
    val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val names = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          t0.put(js.jobId, System.nanoTime())
          val execId = Option(js.properties.getProperty("spark.sql.execution.id"))
            .map("exec=" + _).getOrElse("")
          names.put(js.jobId, s"$execId ${js.stageInfos.map(_.name.takeWhile(_ != '\n').take(60)).mkString(" ;; ")}")
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val ms = (System.nanoTime() - t0.getOrDefault(je.jobId, 0L)) / 1e6
          println(f"[qjob ${je.jobId}%3d] $ms%6.0f ms  ${names.getOrDefault(je.jobId, "?")}")
        }
      })
    val w0 = System.nanoTime()
    run()
    println(f"=== DONE wall ${(System.nanoTime() - w0) / 1e9}%.2f s ===")
    spark.stop()
  }
}
