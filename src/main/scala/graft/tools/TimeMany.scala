package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a comma-separated list of queries in one session.
  * Usage: runMain graft.tools.TimeMany q1,q2,... [sfDir]
  */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
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
      // the full extension set (TVFs, kernels, levenshtein + percentile
      // optimizer rules) active from session birth: every query plans
      // identically regardless of run order
      .withExtensions(new graft.GraftSparkExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def nCompiled(): Long =
      org.apache.spark.metrics.source.CodegenMetrics.METRIC_COMPILATION_TIME.getCount
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    names.foreach { name =>
      val (c0, g0, t0) = (nCompiled(), gcMs(), System.nanoTime())
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[time-many] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        s" nc=${nCompiled() - c0} gc=${gcMs() - g0}ms")
    }
    spark.stop()
  }
}
