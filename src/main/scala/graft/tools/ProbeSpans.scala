package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-isolate d53's duplicated-span plan on a fixture dir.
  * Usage: runMain graft.tools.ProbeSpans [sfDir]
  */
object ProbeSpans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_10x"
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(f: => Long): Unit = {
      // warm once, then min of 2
      f
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); val n = f
        (System.nanoTime() - t0) / 1e9 -> n
      }
      println(f"[probe] $label%-28s ${ts.map(_._1).min}%6.2f s  rows=${ts.head._2}")
    }

    import graft.functions.NgramExpressions.wordGramMd5s
    val k = 4
    val grams = docs.select(col("doc_id"),
      posexplode(wordGramMd5s(col("text"), k))).toDF("doc_id", "pos", "h")

    time("grams only") { grams.count() }
    val dup = grams.groupBy(col("h")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).select(col("h"))
    time("dup hashes") { dup.count() }
    val wins = grams.join(dup, Seq("h"), "left_semi")
    time("wins (semi join)") { wins.count() }
    val lists = wins.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("ps"))
    time("collect_list") { lists.count() }
    time("full d53") {
      graft.operators.DedupOps.duplicatedSpans(docs, "doc_id", "text", k).count()
    }
    time("d53 no orderBy+count spans") {
      graft.operators.DedupOps.duplicatedSpans(docs, "doc_id", "text", k).count()
    }
    spark.stop()
  }
}
