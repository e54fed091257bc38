package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.rules.RuleExecutor

/** Dev tool: profile planning-vs-execution for a query list.
  * Runs each query N warm iterations, printing per-iteration wall time;
  * resets Catalyst's RuleExecutor metrics after warmup and dumps the
  * accumulated per-rule time at the end, so optimizer-rule overhead
  * (including injected extension rules) is separable from execution.
  *
  * Usage: runMain graft.tools.ProfileAnn q1,q2 [iters] [sfDir]
  * Env: GRAFT_NO_EXT_RULES=1 builds the session WITHOUT the injected
  * optimizer rules (functions/TVFs still injected) for A/B comparison.
  */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val iters = if (args.length > 1) args(1).toInt else 4
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val noRules = sys.env.get("GRAFT_NO_EXT_RULES").contains("1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
    val spark = (if (noRules) {
      // functions + TVFs only — skip the two injected optimizer rules
      builder.withExtensions(new graft.GraftSparkExtensions().registerFunctions(_))
    } else builder.withExtensions(new graft.GraftSparkExtensions()(_)))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // warmup: one pass over each (trains + caches models)
    names.foreach { n =>
      val t0 = System.nanoTime()
      run(n)
      println(f"[profile] warmup $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    RuleExecutor.resetMetrics()
    names.foreach { n =>
      (1 to iters).foreach { i =>
        val t0 = System.nanoTime()
        run(n)
        println(f"[profile] $n iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    // split plan-build (analysis+optimization+physical planning+codegen
    // prep) from execution for one more iteration of each query; count
    // jobs/stages and task time via a listener to expose scheduling floor
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val taskNs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        taskNs.addAndGet(s.stageInfo.taskMetrics.executorRunTime * 1000000L)
      }
    })
    names.foreach { n =>
      jobs.set(0); stages.set(0); taskNs.set(0)
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val qe = df.queryExecution
      qe.executedPlan // forces analysis → optimization → physical planning
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      Thread.sleep(300) // let the listener bus drain
      println(f"[profile] $n plan-build ${(t1 - t0) / 1e9}%.2f s, execute ${(t2 - t1) / 1e9}%.2f s, " +
        f"jobs ${jobs.get}, stages ${stages.get}, task-time ${taskNs.get / 1e9}%.2f s")
    }
    val dump = RuleExecutor.dumpTimeSpent()
    println("[profile] === RuleExecutor totals ===")
    dump.linesIterator.take(3).foreach(println)
    // top rules by TOTAL time
    val ruleLines = dump.linesIterator.drop(3).filter(_.trim.nonEmpty).toSeq
    val parsed = ruleLines.flatMap { l =>
      // "name  effTime / totTime  effRuns / totRuns"
      val parts = l.trim.split("\\s+")
      if (parts.length >= 4 && parts(2) == "/")
        scala.util.Try(parts(0) -> parts(3).toLong).toOption
      else None
    }
    println("[profile] === top 25 rules by total ns ===")
    parsed.sortBy(-_._2).take(25).foreach { case (r, t) =>
      println(f"[profile] ${t / 1e6}%10.1f ms  $r")
    }
    spark.stop()
  }
}
