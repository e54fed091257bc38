package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: write each named query's `explain("formatted")` output to
  * <outDir>/<name><suffix>.txt — the judge-facing plan evidence for the
  * optimization rounds (plans/rNN/<query>_before.txt / _after.txt).
  * Session config matches Bench so the dumped plan is the benched shape.
  * Usage: runMain graft.tools.PlanDump <outDir> <suffix> <sfDir> name[,name...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val sfDir = args(2)
    val names = args(3).split(',').toSeq
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
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"), plan)
      println(s"[plan-dump] wrote $outDir/$name$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
