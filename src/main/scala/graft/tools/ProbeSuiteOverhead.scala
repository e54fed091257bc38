package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for the r15 bench anomaly: d105/d106 run ~1.2-1.4 s in an
  * isolated session but 4.2/9.8 s inside the full Bench sweep with ZERO
  * gc/codegen deltas. 600 trivial shuffle jobs do NOT reproduce it, so
  * it is not raw status-store job count — this probe replays the real
  * suite prefix (every query alphabetically before the victims, exactly
  * Bench's order) and times the victims after, optionally bisecting.
  * Usage: runMain graft.tools.ProbeSuiteOverhead <sfDir> <firstK|all> [fromName]
  */
object ProbeSuiteOverhead {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spec = if (args.length > 1) args(1) else "all"
    val fromName = if (args.length > 2) Some(args(2)) else None
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
    def run(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    def time(name: String): Double = {
      val t0 = System.nanoTime(); run(name); (System.nanoTime() - t0) / 1e9
    }
    val victims = Seq("d105_unigram_encode", "d106_unigram_learn")
    victims.foreach(run) // warmup: codegen + footers
    victims.foreach(n => println(f"[probe] fresh   $n ${time(n)}%.3f"))
    val sortedAll = graft.SparkEntry.queries.keys.toSeq.sorted
    val before = sortedAll.filter(_ < "d105")
      .dropWhile(n => fromName.exists(n < _))
    val prefix = spec match {
      case "all" => before
      case "full" => sortedAll.filterNot(victims.contains) // one whole Bench pass
      case k => before.take(k.toInt)
    }
    println(s"[probe] replaying ${prefix.size} suite-prefix queries " +
      s"(${prefix.headOption.getOrElse("-")} .. ${prefix.lastOption.getOrElse("-")})")
    prefix.foreach { n =>
      val t = try time(n) catch { case e: Throwable =>
        println(s"[probe] prefix $n FAILED: $e"); -1.0 }
      if (t > 2.0) println(f"[probe]   prefix $n $t%.3f")
    }
    victims.foreach(n => println(f"[probe] after-prefix $n ${time(n)}%.3f"))
    victims.foreach(n => println(f"[probe] again        $n ${time(n)}%.3f"))
    spark.stop()
  }
}
