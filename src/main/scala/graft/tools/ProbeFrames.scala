package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the m06 frame-dedup plan. */
object ProbeFrames {
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
    def time(what: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe-frames] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("__bin", col("text").cast("binary"))
    (1 to 2).foreach { pass =>
      time(s"p$pass sigs") {
        graft.operators.MultimodalOps.frameSignatures(docs, "doc_id", "__bin", 8, 2)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"p$pass groups") {
        graft.operators.MultimodalOps.frameSignatures(docs, "doc_id", "__bin", 8, 2)
          .groupBy(col("fhs")).agg(min(col("doc_id")).as("rep"), count(lit(1)).as("m"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"p$pass bucketjoin") {
        val sigs = graft.operators.MultimodalOps.frameSignatures(docs, "doc_id", "__bin", 8, 2)
        val groups = sigs.groupBy(col("fhs"))
          .agg(sort_array(collect_set(col("doc_id"))).as("__members"), first(col("n")).as("__n"))
          .select(element_at(col("__members"), 1).as("__rep"), col("__members"), col("__n"), col("fhs"))
        val ex = groups.select(col("__rep"), col("__n"), explode(col("fhs")).as("__fh"))
        val n = ex.select(col("__rep").as("__ra"), col("__n").as("__na"), col("__fh"))
          .join(ex.select(col("__rep").as("__rb"), col("__n").as("__nb"), col("__fh")), Seq("__fh"))
          .filter(col("__ra") < col("__rb"))
          .groupBy(col("__ra"), col("__rb"), col("__na"), col("__nb"))
          .agg(count(lit(1)).as("__common")).count()
        println(s"[probe-frames] repPairs rows: $n")
      }
      time(s"p$pass full") {
        graft.operators.MultimodalOps.frameDedupPairs(docs, "doc_id", "__bin", 8, 2, 0.5)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
