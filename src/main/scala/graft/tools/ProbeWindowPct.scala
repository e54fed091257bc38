package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: time the exact-percentile window form directly (no
  * optimizer splice) vs the same query through the rewrite rule, to
  * attribute any slowness. Usage: runMain graft.tools.ProbeWindowPct [sfDir]
  */
object ProbeWindowPct {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag min: ${ts.min}%.2f s (runs ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    val qs = Seq(("p25", 0.25, true), ("p50", 0.5, true), ("p90", 0.9, true))
    if (sys.env.get("PROBE_BREAKDOWN").contains("1")) {
      // stage-attribution for the select plan: time progressively larger
      // prefixes of the same plan
      val keyCols = Seq(col("l_returnflag"))
      val unpiv = li.select(col("l_returnflag"), col("l_extendedprice").cast("double").as("__v"))
      time("scan-only") { unpiv.filter(col("__v").isNotNull).groupBy().count().collect() }
      val bucketExpr = org.apache.spark.sql.GraftSqlShims.column(
        graft.functions.DoubleSortableBucket(
          org.apache.spark.sql.GraftSqlShims.expression(col("__v")), sys.env.getOrElse("PROBE_SHIFT","44").toInt))
      val hist = unpiv.groupBy(col("l_returnflag"), bucketExpr.as("__b")).agg(count(lit(1)).as("__c"))
      time("hist-agg") { hist.groupBy().count().collect() }
      import org.apache.spark.sql.expressions.Window
      val wB = Window.partitionBy(col("l_returnflag")).orderBy(col("__b").asc_nulls_last)
      val cum = hist.withColumn("__endc", sum(col("__c")).over(wB))
      time("hist+window") { cum.groupBy().count().collect() }
      val needed = cum.limit(20).select(col("l_returnflag").as("__nk"), col("__b").as("__n_b"))
      val cands = unpiv.join(broadcast(needed), col("l_returnflag") <=> col("__nk") && bucketExpr === col("__n_b"))
      time("scan2+join") { cands.groupBy().count().collect() }
    }
    time("windowed-direct") {
      graft.operators.PercentileOps.exactQuantilesWindowed(
        li, Seq("l_returnflag"), Seq(("m", col("l_extendedprice"), qs))).collect()
    }
    time("select-direct") {
      graft.operators.PercentileOps.exactQuantilesSelect(
        li, Seq("l_returnflag"), Seq(("m", col("l_extendedprice"), qs))).collect()
    }
    time("hist-direct") {
      graft.operators.PercentileOps.exactQuantilesHist(
        li, Seq("l_returnflag"),
        Seq(("m", col("l_extendedprice"), qs.map(q => (q._1, q._2)))), disc = true).collect()
    }
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.PercentileAggregateRewrite
    li.createOrReplaceTempView("li")
    time("rewrite-sql") {
      spark.sql(
        """SELECT l_returnflag,
          |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
          |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50,
          |  percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice) AS p90
          |FROM li GROUP BY l_returnflag""".stripMargin).collect()
    }
    spark.stop()
  }
}
