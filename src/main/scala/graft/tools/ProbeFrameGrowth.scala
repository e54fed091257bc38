package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: the frame-probe corpus-reduction route's growth law
  * (`spark.graft.frameProbe.reduceMinBytes`, the r16 verdict item-4
  * ask). Fixed batch, 1× vs ~10× ledger, reduction FORCED on: probe
  * cost must track batch + matching rows, not corpus size — the same
  * no-growth pin d66's O(batch) advance carries (ProbeClusterAdvance).
  */
object ProbeFrameGrowth {
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
    // force the reduction route regardless of ledger size
    spark.conf.set("spark.graft.frameProbe.reduceMinBytes", "1")
    import graft.operators.MultimodalOps
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
      .withColumn("__bin", col("text").cast("binary"))
    // fixed batch: ~5% of ids; 1× corpus: ~9% of ids; 10× corpus: the
    // 1× slice plus nine id-shifted clones (distinct ids, same payload
    // distribution — real 10× rows AND 10× distinct frame-hash groups)
    val batch = docs.filter(col("doc_id") % 20 === 0)
    val base = docs.filter(col("doc_id") % 11 === 1)
    def shifted(k: Int) = base.select(
      (col("doc_id") + lit(1000000L * k)).as("doc_id"),
      col("text"), col("__bin"))
    val big = (1 to 9).map(shifted).foldLeft(base.select("doc_id", "text", "__bin"))(_ unionAll _)
    def time(what: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe-framegrowth] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def mkLedger(src: org.apache.spark.sql.DataFrame, tag: String): String = {
      val path = s"/tmp/graft_probe_fg/${tag}_${System.nanoTime()}"
      MultimodalOps.writeFrameLedger(src, "doc_id", "__bin", 8, 2, path)
      val bytes = {
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.getContentSummary(p).getLength
      }
      println(s"[probe-framegrowth] ledger $tag: ${src.count()} docs, $bytes bytes")
      path
    }
    val led1 = mkLedger(base, "x1")
    val led10 = mkLedger(big, "x10")
    def probe(path: String): Unit =
      MultimodalOps.frameDedupAgainstLedger(
        batch, "doc_id", "__bin", path, frameBytes = 8, everyK = 2,
        minJaccard = 0.5)
        .write.format("noop").mode("overwrite").save()
    (1 to 3).foreach { pass =>
      time(s"p$pass probe@1x") { probe(led1) }
      time(s"p$pass probe@10x") { probe(led10) }
    }
    spark.stop()
  }
}
