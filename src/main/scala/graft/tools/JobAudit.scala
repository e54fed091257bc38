package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev audit: one pass over every SparkEntry query recording (wall,
  * Spark jobs launched). Sequential driver-blocking jobs amplify
  * same-host sibling contention linearly (memory: the d105/d106
  * 9.8→1.3 s lesson), so jobs-per-query is the lever list for the
  * next fusion round: a cheap query with an outsized job count is a
  * candidate; a ledger cycle's jobs are usually its semantics.
  */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    // per-callsite histogram (the job's FINAL stage name): which code
    // paths the suite's driver barriers actually come from
    val byKind = new java.util.concurrent.ConcurrentHashMap[String, Integer]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          val name = js.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n'))
            .getOrElse("?")
          byKind.merge(name, 1, (a, b) => a + b)
        }
      })
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    // warm pass (uncounted): codegen + footers
    Seq("q01_pricing_summary", "d01_text_stats").foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    val rows = names.map { n =>
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      (n, dt, jobs.get() - j0)
    }
    println("[jobaudit] name,sec,jobs")
    rows.sortBy(-_._3).foreach { case (n, t, j) =>
      println(f"[jobaudit] $n,$t%.3f,$j")
    }
    println(f"[jobaudit] TOTAL,${rows.map(_._2).sum}%.1f,${rows.map(_._3).sum}")
    import scala.jdk.CollectionConverters._
    byKind.asScala.toSeq.sortBy(-_._2.intValue).take(60).foreach { case (k, c) =>
      println(s"[jobkind] $c  $k")
    }
    spark.stop()
  }
}
