package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: sub-step timing inside one cluster-ledger advance
  * (inline copy of advanceClusterLedger's body, instrumented).
  */
object ProbeD66b {
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
      println(f"[probe-d66b] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    (1 to 2).foreach { pass =>
      val path = java.nio.file.Files.createTempDirectory(s"graft-d66b-$pass").toString + "/cl"
      val odd = docs.filter(col("doc_id") % 2 === 1)
      time(s"p$pass write-ledger") {
        graft.operators.DedupOps.writeClusterLedger(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
      }
      // -- inline advance, instrumented --
      val sigLedger = path + "/sig"
      val asgLedger = path + "/asg"
      var sig: org.apache.spark.sql.DataFrame = null
      time(s"p$pass adv:sig-persist") {
        sig = graft.operators.DedupOps
          .minHashSignatures(odd, "doc_id", "text", 8, 5)
          .filter(col("mh0").isNotNull).persist()
        sig.count(): Unit
      }
      var comp: org.apache.spark.sql.DataFrame = null
      time(s"p$pass adv:sig-append") {
        sig.write.mode("append").parquet(
          graft.operators.LedgerGuard.appendPath(spark, sigLedger))
      }
      time(s"p$pass adv:probe+cc") {
        val probe = graft.operators.DedupOps.crossDedupAgainstSignatures(
          odd, "doc_id", "text", sigLedger)
          .filter(col("new_id") =!= col("corpus_id"))
        val asg = graft.operators.LedgerGuard.readLedger(spark, asgLedger)
        val bc = probe
          .select(col("new_id").cast("long").as("d1"),
            col("corpus_id").cast("long").as("__cn"))
          .join(asg.select(col("node").as("__cn"), col("label")), Seq("__cn"))
          .select(col("d1"), col("label").as("d2"))
        val internal = graft.operators.DedupOps
          .lshCandidatePairs(odd, "doc_id", "text")
          .select(col("d1").cast("long"), col("d2").cast("long"))
        comp = graft.operators.DedupOps.connectedComponents(bc.union(internal), "d1", "d2")
        comp.count(): Unit
      }
      time(s"p$pass adv:batchAsg-append") {
        odd.select(col("doc_id").cast("long").as("node")).distinct()
          .join(comp, Seq("node"), "left")
          .select(col("node"), coalesce(col("label"), col("node")).as("label"))
          .write.mode("append").parquet(
            graft.operators.LedgerGuard.appendPath(spark, asgLedger))
      }
      time(s"p$pass adv:rmp-swap") {
        import spark.implicits._
        val rmp = path + "/rmp"
        graft.operators.LedgerGuard.advanceInPlace(spark, rmp, "probe rmp") { st =>
          Seq.empty[(Long, Long)].toDF("old_label", "new_label").write.parquet(st)
        }
      }
      sig.unpersist(false)
    }
    spark.stop()
  }
}
