package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (backs the q15b SCALE row): built-in lag/lead over the
  * 3-value order-status key vs `partitionedShift` at full width, same
  * projection. Usage: runMain graft.tools.ProbeWindowShift [sfDir]
  */
object ProbeWindowShift {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $tag min: ${ts.min}%.2f s (runs ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val vs = struct(col("o_orderkey"), col("o_orderdate"))
    time("builtin-lag-lead") {
      orders.select(col("o_orderkey"),
        lag(vs, 2).over(w).getField("o_orderkey").as("p"),
        lead(vs, 2).over(w).getField("o_orderkey").as("n"),
        datediff(col("o_orderdate"), lag(vs, 2).over(w).getField("o_orderdate")).as("d"))
        .select(sum(hash(col("o_orderkey"), col("p"), col("n"), col("d")))).collect()
    }
    time("partitionedShift") {
      graft.operators.WindowRankOps.partitionedShift(orders,
        Seq("o_orderstatus"),
        Seq(("o_orderdate", true), ("o_orderkey", true)),
        Seq("o_orderkey", "o_orderdate"), k = 2)
        .select(col("o_orderkey"),
          col("lag2.o_orderkey").as("p"), col("lead2.o_orderkey").as("n"),
          datediff(col("o_orderdate"), col("lag2.o_orderdate")).as("d"))
        .select(sum(hash(col("o_orderkey"), col("p"), col("n"), col("d")))).collect()
    }
    spark.stop()
  }
}
