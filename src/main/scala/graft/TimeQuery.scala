package graft

import org.apache.spark.sql.SparkSession

/** Local timing harness for ITERATING on one query's plan without paying
  * a full Bench sweep: `runMain graft.TimeQuery <sfDir> <passes> <name>...`
  * times each named query with the same session conf and noop-sink
  * methodology as [[Bench]] (warm JVM, min over `passes`), printing one
  * `name min [p1 p2 ...]` line per query. Not part of the driver
  * contract — a builder tool.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val passes = args(1).toInt
    val names = args.drop(2).toSeq
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
      .withExtensions(new GraftSparkExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
        SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      run(n) // untimed warmup: codegen + parquet footers
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        run(n)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $n ${times.min}%.3f  " +
        times.map(t => f"$t%.3f").mkString(" "))
    }
    spark.stop()
  }
}
