package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: candidate-volume + stage timing of the PPJoin-style m06. */
object ProbeFrames2 {
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
      println(f"[probe2] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("__bin", col("text").cast("binary"))
    (1 to 2).foreach { pass =>
      val sigs = graft.operators.MultimodalOps.frameSignatures(docs, "doc_id", "__bin", 8, 2)
      val groups = sigs.groupBy(col("fhs"))
        .agg(sort_array(collect_set(col("doc_id"))).as("__members"), first(col("n")).as("__n"))
        .select(element_at(col("__members"), 1).as("__rep"), col("__members"), col("__n"), col("fhs"))
        .localCheckpoint(false)
      val tPre = 0.5 - 0.00005
      val ex = groups.select(col("__rep"), explode(col("fhs")).as("__fh"))
      val dfreq = ex.groupBy(col("__fh")).agg(count(lit(1)).as("__df"))
      val ordered = ex.join(dfreq, "__fh")
        .groupBy(col("__rep"))
        .agg(sort_array(collect_list(struct(col("__df"), col("__fh")))).as("__ord"))
      val pLen = size(col("__ord")) - ceil(size(col("__ord")) * lit(tPre)).cast("int") + 1
      val pre = ordered.select(col("__rep"),
        explode(slice(transform(col("__ord"), s => s.getField("__fh")), lit(1), pLen)).as("__fh"))
      val pre2 = ordered.select(col("__rep"), size(col("__ord")).as("__sz"),
          posexplode(slice(transform(col("__ord"), s => s.getField("__fh")), lit(1), pLen)))
        .select(col("__rep"), col("__sz"), (col("pos") + 1).as("__pos"), col("col").as("__fh"))
      val reqOverlap = lit(tPre / (1.0 + tPre)) * (col("__sa") + col("__sb"))
      val cand = pre2.select(col("__rep").as("__ra"), col("__sz").as("__sa"),
          col("__pos").as("__pa"), col("__fh"))
        .join(pre2.select(col("__rep").as("__rb"), col("__sz").as("__sb"),
          col("__pos").as("__pb"), col("__fh")), Seq("__fh"))
        .filter(col("__ra") < col("__rb") &&
          greatest(col("__sa"), col("__sb")) * lit(tPre) <= least(col("__sa"), col("__sb")) &&
          (least(col("__sa") - col("__pa"), col("__sb") - col("__pb")) + 1) >= reqOverlap)
        .select(col("__ra"), col("__rb")).dropDuplicates()
      time(s"p$pass groups-count") { println("[probe2] groups: " + groups.count()) }
      time(s"p$pass dfreq") { println("[probe2] dfreq rows: " + dfreq.count()) }
      time(s"p$pass pre") { println("[probe2] pre rows: " + pre.count()) }
      time(s"p$pass cand") { println("[probe2] cand rows: " + cand.count()) }
      time(s"p$pass full") {
        graft.operators.MultimodalOps.frameDedupPairs(docs, "doc_id", "__bin", 8, 2, 0.5)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"p$pass out-count") {
        println("[probe2] out rows: " + graft.operators.MultimodalOps
          .frameDedupPairs(docs, "doc_id", "__bin", 8, 2, 0.5).count())
      }
    }
    spark.stop()
  }
}
