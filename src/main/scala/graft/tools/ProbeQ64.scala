package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the q64 audit (r11 verdict item 6): formatted plan,
  * job count, and stage timings for the decimal battery at sf0.1.
  * Usage: runMain graft.tools.ProbeQ64 [sfDir]
  */
object ProbeQ64 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
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

    @volatile var jobs = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        tasks += 1
    })

    def run(): Unit =
      graft.SparkEntry.queries("q64_decimal_exact")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    run() // warmup
    Thread.sleep(500)
    jobs = 0; tasks = 0
    val t0 = System.nanoTime()
    run()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[q64] warm ${sec}%.2f s, jobs=$jobs tasks=$tasks")
    graft.SparkEntry.queries("q64_decimal_exact")(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
