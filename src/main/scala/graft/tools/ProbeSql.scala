package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run ad-hoc SQL strings against a local session to probe
  * engine feature support (e.g. WITH RECURSIVE, mode()) before wiring a
  * conformance entry. Usage: runMain graft.tools.ProbeSql "<sql>" ...
  */
object ProbeSql {
  def main(args: Array[String]): Unit = {
    // mirror the Verify/Bench session confs (UTC, nanos-as-long) so a
    // probe's answer is the answer the conformance harness will see
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { sql =>
      try {
        println(s"-- $sql")
        spark.sql(sql).show(20, truncate = false)
      } catch {
        case e: Throwable =>
          println(s"FAIL ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).linesIterator.take(3).mkString(" | ")}")
      }
    }
    spark.stop()
  }
}
