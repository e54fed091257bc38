package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one named query in a fresh session; optionally print its
  * formatted plan. Usage: runMain graft.tools.TimeOne <name> [sfDir] [explain]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    if (args.contains("explain")) fn(spark, sfDir).explain("formatted")
    val runs = sys.env.getOrElse("TIME_ONE_RUNS", "2").toInt
    val mx = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    (1 to runs).foreach { i =>
      val gc0 = mx.stream.mapToLong(_.getCollectionTime).sum
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val gc1 = mx.stream.mapToLong(_.getCollectionTime).sum
      println(f"[time-one] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (gc ${(gc1 - gc0) / 1000.0}%.1f s)")
    }
    spark.stop()
  }
}
