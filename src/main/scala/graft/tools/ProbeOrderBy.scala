package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: what the conformance queries' trailing GLOBAL orderBy
  * actually costs vs the s08 single-partition local sort, on outputs
  * of the two sizes the suite produces (corpus-scale ~5000 rows at
  * sf0.1, model-scale ≤100). The orderBy exists only so the dump is
  * deterministic — the driver compare sorts rows itself — so any
  * measurable delta is pure bench overhead times 267 queries.
  */
object ProbeOrderBy {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // a d01-shaped body: per-row kernel + projection over the corpus
    def body() = docs.select(col("doc_id"), col("lang"),
      length(col("text")).cast("int").as("n_chars"))
    def run(tag: String, f: () => org.apache.spark.sql.DataFrame): Unit = {
      f().write.format("noop").mode("overwrite").save() // warm
      val reps = 20
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ =>
        f().write.format("noop").mode("overwrite").save())
      val dt = (System.nanoTime() - t0) / 1e6 / reps
      println(f"[probe-orderby] $tag: $dt%.1f ms/run, " +
        f"jobs/run=${(jobs.get() - j0).toDouble / reps}%.1f")
    }
    // model-sized tail: aggregate output (post-shuffle — coalesce safe)
    def agg() = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), avg(length(col("text"))).as("len"))
    (1 to 2).foreach { pass =>
      run(s"p$pass none", () => body())
      run(s"p$pass orderBy", () => body().orderBy("doc_id"))
      run(s"p$pass coalesce1-sort", () =>
        body().coalesce(1).sortWithinPartitions("doc_id"))
      run(s"p$pass repart1-sort", () =>
        body().repartition(1).sortWithinPartitions("doc_id"))
      run(s"p$pass agg-orderBy", () => agg().orderBy("lang"))
      run(s"p$pass agg-repart1-sort", () =>
        agg().repartition(1).sortWithinPartitions("lang"))
    }
    spark.stop()
  }
}
