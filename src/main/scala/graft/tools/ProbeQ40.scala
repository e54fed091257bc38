package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway profiler for q40: times each stage of the fused exact-quantile
  * pipeline to find the dominant cost (shuffle? window? final agg?).
  */
object ProbeQ40 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe-q40] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = graft.queries.Registry.table(spark, sfDir, "lineitem")
    noop(li.select("l_returnflag", "l_extendedprice", "l_quantity")) // warm

    val keyCols = Seq(col("l_returnflag"))
    val unpivoted = li
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("double").as("__in_price"),
        col("l_quantity").cast("double").as("__in_qty"))
      .unpivot(ids = Array(col("l_returnflag")),
        values = Array(col("__in_price").as("price"), col("__in_qty").as("qty")),
        variableColumnName = "__m", valueColumnName = "__v")
      .filter(col("__v").isNotNull)
    time("unpivot-scan")(noop(unpivoted))

    val counts = unpivoted
      .groupBy(col("l_returnflag"), col("__m"), col("__v"))
      .agg(count(lit(1)).as("__cnt"))
    time("counts")(noop(counts))

    val grp = keyCols :+ col("__m")
    val wOrd = Window.partitionBy(grp: _*).orderBy(col("__v"))
    val wAll = Window.partitionBy(grp: _*)
    val ranked = counts
      .withColumn("__end", sum(col("__cnt")).over(wOrd))
      .withColumn("__start", col("__end") - col("__cnt"))
      .withColumn("__n", sum(col("__cnt")).over(wAll))
    time("counts+2windows")(noop(ranked))

    val rankedOne = counts
      .withColumn("__end", sum(col("__cnt")).over(wOrd))
      .withColumn("__start", col("__end") - col("__cnt"))
    time("counts+1window")(noop(rankedOne))

    // raw-row variant: no pre-aggregation; row_number over the sorted raw
    // rows + broadcast group totals, pick rows at the 12 target ranks
    def rawVariant(): org.apache.spark.sql.DataFrame = {
      val totals = unpivoted.groupBy(col("l_returnflag"), col("__m"))
        .agg(count(lit(1)).as("__n"))
      val rn = row_number().over(
        Window.partitionBy(col("l_returnflag"), col("__m")).orderBy(col("__v")))
      val ranked2 = unpivoted.withColumn("__rn", rn)
        .join(broadcast(totals), Seq("l_returnflag", "__m"))
      val qs = Seq(("price", "p25", 0.25), ("price", "p50", 0.5),
        ("price", "p90", 0.9), ("qty", "med_qty", 0.5))
      val aggs = qs.flatMap { case (m, name, q) =>
        val t = (col("__n") - 1) * lit(q)
        val isM = col("__m") === lit(m)
        Seq(
          max(when(isM && (col("__rn") - 1) === floor(t), col("__v"))).as(s"__${name}_lo"),
          max(when(isM && (col("__rn") - 1) === ceil(t), col("__v"))).as(s"__${name}_hi"),
          max(when(isM, t)).as(s"__${name}_t"))
      }
      val picked = ranked2.groupBy(col("l_returnflag")).agg(aggs.head, aggs.tail: _*)
      picked.select(col("l_returnflag") +: qs.map { case (_, name, _) =>
        val (lo, hi, t) = (col(s"__${name}_lo"), col(s"__${name}_hi"), col(s"__${name}_t"))
        when(floor(t) === ceil(t), lo)
          .otherwise(lo * (ceil(t) - t) + hi * (t - floor(t))).as(name)
      }: _*)
    }
    time("raw-rownum-variant")(noop(rawVariant()))
    time("raw-rownum-again")(noop(rawVariant()))

    // counts + ONE window + broadcast totals (no second WindowExec)
    def oneWindowVariant(): org.apache.spark.sql.DataFrame = {
      val totals = unpivoted.groupBy(col("l_returnflag"), col("__m"))
        .agg(count(lit(1)).as("__n"))
      val ranked3 = counts
        .withColumn("__end", sum(col("__cnt")).over(wOrd))
        .withColumn("__start", col("__end") - col("__cnt"))
        .join(broadcast(totals), Seq("l_returnflag", "__m"))
      val qs = Seq(("price", "p25", 0.25), ("price", "p50", 0.5),
        ("price", "p90", 0.9), ("qty", "med_qty", 0.5))
      val aggs = qs.flatMap { case (m, name, q) =>
        val t = (col("__n") - 1) * lit(q)
        val i0 = floor(t)
        val i1 = ceil(t)
        val isM = col("__m") === lit(m)
        Seq(
          max(when(isM && col("__start") <= i0 && i0 < col("__end"), col("__v"))).as(s"__${name}_lo"),
          max(when(isM && col("__start") <= i1 && i1 < col("__end"), col("__v"))).as(s"__${name}_hi"),
          max(when(isM, t)).as(s"__${name}_t"))
      }
      val picked = ranked3.groupBy(col("l_returnflag")).agg(aggs.head, aggs.tail: _*)
      picked.select(col("l_returnflag") +: qs.map { case (_, name, _) =>
        val (lo, hi, t) = (col(s"__${name}_lo"), col(s"__${name}_hi"), col(s"__${name}_t"))
        when(floor(t) === ceil(t), lo)
          .otherwise(lo * (ceil(t) - t) + hi * (t - floor(t))).as(name)
      }: _*)
    }
    time("one-window-variant")(noop(oneWindowVariant()))
    time("one-window-again")(noop(oneWindowVariant()))

    // full q40 via registry (second run, warm)
    time("full-q40")(noop(graft.SparkEntry.queries("q40_percentiles")(spark, sfDir)))
    time("full-q40-again")(noop(graft.SparkEntry.queries("q40_percentiles")(spark, sfDir)))
    spark.stop()
  }
}
