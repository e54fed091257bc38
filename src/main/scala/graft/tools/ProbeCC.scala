package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiler for d17: times candidate-pair generation vs the
  * label-propagation loop vs the final window/sort.
  */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    (1 to 2).foreach { round =>
      println(s"[probe] === pass $round ===")
      val docs = graft.queries.Registry.table(spark, sfDir, "documents")
      val cand = t("lshCandidatePairs materialize") {
        graft.operators.DedupOps.lshCandidatePairs(docs, "doc_id", "text",
          numHashes = 8, bandSize = 4, shingleSize = 5)
          .select(col("d1"), col("d2")).localCheckpoint(true)
      }
      println(s"[probe] pairs: ${cand.count()}")
      val labels = t("connectedComponents") {
        val l = graft.operators.DedupOps.connectedComponents(cand, "d1", "d2")
        l.write.format("noop").mode("overwrite").save(); l
      }
    }
    spark.stop()
  }
}
