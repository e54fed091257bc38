package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: leg-by-leg timing of the m08/m09/m13 ledger cycles (the
  * r15 verdict item-5 bench tail) — which of write / append / replay /
  * compact / forget / probe actually carries the seconds.
  */
object ProbeM08 {
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
    import graft.operators.MultimodalOps
    def time(what: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe-m08] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("__bin", col("text").cast("binary"))
    (1 to 2).foreach { pass =>
      val path = s"/tmp/graft_probe_m08/p${pass}_${System.nanoTime()}"
      val gen2 = docs.filter((col("doc_id") % 10) > 5)
      time(s"p$pass write") {
        MultimodalOps.writeFrameLedger(docs.filter((col("doc_id") % 10).between(1, 5)),
          "doc_id", "__bin", 8, 2, path)
      }
      time(s"p$pass append") {
        MultimodalOps.appendToFrameLedger(gen2, "doc_id", "__bin", 8, 2, path,
          batchId = Some("gen-2"))
      }
      time(s"p$pass replay") {
        MultimodalOps.appendToFrameLedger(gen2, "doc_id", "__bin", 8, 2, path,
          batchId = Some("gen-2"))
      }
      time(s"p$pass compact") {
        MultimodalOps.compactFrameLedger(spark, path, targetFiles = 4)
      }
      time(s"p$pass probe") {
        MultimodalOps.frameDedupAgainstLedger(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "__bin", path,
          frameBytes = 8, everyK = 2, minJaccard = 0.5)
          .orderBy("new_id", "corpus_id")
          .write.format("noop").mode("overwrite").save()
      }
      // m13 legs (mirror the conformance fixture exactly)
      val gen = udf((m: Long, near: Boolean) =>
        if (near) MultimodalOps.syntheticToneWavNearCached(m, 8000, 4096, 1.0)
        else MultimodalOps.syntheticToneWavCached(m, 8000, 4096, 1.0))
      val wavs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), gen(col("doc_id") % 64,
          col("doc_id") % 128 >= 64).as("wav"))
      val corpus = wavs.filter(col("doc_id") % 10 =!= 0)
      val g2 = corpus.filter(col("doc_id") % 10 > 5)
      val apath = s"/tmp/graft_probe_m13/p${pass}_${System.nanoTime()}"
      time(s"p$pass a-write") {
        MultimodalOps.writeAudioFpLedger(
          corpus.filter((col("doc_id") % 10).between(1, 5)), "doc_id", "wav", apath)
      }
      time(s"p$pass a-append") {
        MultimodalOps.appendToAudioFpLedger(g2, "doc_id", "wav", apath,
          batchId = Some("gen-2"))
      }
      time(s"p$pass a-compact") {
        MultimodalOps.compactAudioFpLedger(spark, apath, targetFiles = 4)
      }
      time(s"p$pass a-forget") {
        MultimodalOps.removeFromAudioFpLedger(
          corpus.filter(col("doc_id") % 3 === 1).select(col("doc_id")),
          "doc_id", apath)
      }
      time(s"p$pass a-probe") {
        MultimodalOps.audioNearDupAgainstLedger(
          wavs.filter(col("doc_id") % 10 === 0), "doc_id", "wav", apath,
          maxHamming = 2)
          .orderBy("new_id", "corpus_id")
          .write.format("noop").mode("overwrite").save()
      }
      println(s"[probe-m08] pass $pass done")
    }
    spark.stop()
  }
}
