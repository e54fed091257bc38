package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: attribute d12's cost on the duplicated 10x fixture —
  * simhash compute vs group structure vs pair expansion.
  * Usage: runMain graft.tools.ProbeSimhash [docsDir]
  */
object ProbeSimhash {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_10x"
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val h = graft.operators.DedupOps.simHash16Df(docs, "doc_id", "text")
    time("simhash-count-1")(println("  rows=" + h.count()))
    time("simhash-count-2")(println("  rows=" + h.count()))
    // group-size distribution over identical simhash
    val gs = h.groupBy("simhash").count()
    time("group-structure") {
      gs.agg(count(lit(1)).as("n_groups"), max("count").as("max_g"),
        sum(col("count") * col("count")).as("sum_sq")).show(false)
    }
    // band-bucket structure over distinct simhashes (reps)
    val reps = gs.select(col("simhash"), shiftright(col("simhash"), 8).as("__band"))
    time("rep-band-structure") {
      reps.groupBy("__band").count()
        .agg(count(lit(1)).as("n_bands"), max("count").as("max_b"),
          sum(col("count") * col("count")).as("sum_sq")).show(false)
    }
    time("pairs-full-count") {
      println("  pairs=" + graft.operators.DedupOps
        .simHashPairs(docs, "doc_id", "text", maxHamming = 6, bandShift = 8).count())
    }
    spark.stop()
  }
}
