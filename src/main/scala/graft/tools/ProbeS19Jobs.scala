package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-leg wall + Spark job counts for the s19 IVFPQ
  * maintenance cycle (the suite's second-highest job count after d66).
  */
object ProbeS19Jobs {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .withExtensions(new graft.GraftSparkExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    def time(what: String)(f: => Unit): Unit = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      f
      println(f"[probe-s19] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        f"  jobs=${jobs.get() - j0}")
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    (1 to 2).foreach { pass =>
      val path = java.nio.file.Files
        .createTempDirectory(s"graft-s19-$pass").toString + "/ivfpq"
      var model: graft.operators.IvfPq.Model = null
      time(s"p$pass train") {
        model = graft.operators.IvfPq.train(emb, "embedding",
          kc = 8, m = 8, k = 32, iters = 5, residual = true)
      }
      time(s"p$pass write") {
        graft.operators.IvfPq.writeIndex(
          emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", model, path)
      }
      time(s"p$pass append") {
        graft.operators.IvfPq.appendToIndex(
          emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding", path)
      }
      val dead = emb.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
      time(s"p$pass delete") {
        graft.operators.IvfPq.deleteFromIndex(spark, path, dead, "vec_id")
      }
      time(s"p$pass delete-replay") {
        graft.operators.IvfPq.deleteFromIndex(spark, path, dead, "vec_id")
      }
      time(s"p$pass compact") {
        graft.operators.IvfPq.compactIndex(spark, path)
      }
      time(s"p$pass probe") {
        val queries = emb.filter(col("vec_id") < 8)
        graft.operators.IvfPq.probeIndex(spark, path,
          queries, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 5, nprobe = 6, rerank = 100)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
