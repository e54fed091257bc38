package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: which STAGE of the m08 ledger probe carries the seconds —
  * batch hashing, corpus collapse, dfreq, prefix derivation, candidate
  * join, or the scoring join.
  */
object ProbeM08Stages {
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
    import graft.operators.{MultimodalOps, LedgerGuard}
    def time(what: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[stages] $what: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("__bin", col("text").cast("binary"))
    val path = s"/tmp/graft_probe_m08s/${System.nanoTime()}"
    MultimodalOps.writeFrameLedger(docs.filter(col("doc_id") % 10 =!= 0),
      "doc_id", "__bin", 8, 2, path)
    val newDocs = docs.filter(col("doc_id") % 10 === 0)
    (1 to 2).foreach { pass =>
      val rows = LedgerGuard.readLedger(spark, path)
      val batch = MultimodalOps.frameSignatures(newDocs, "doc_id", "__bin", 8, 2)
      def groupsOf(t: org.apache.spark.sql.DataFrame) = t.groupBy(col("fhs"))
        .agg(sort_array(collect_set(col("doc_id"))).as("__members"),
          first(col("n")).as("__n"))
        .select(element_at(col("__members"), 1).as("__rep"),
          col("__members"), col("__n"), col("fhs"))
      time(s"p$pass batch-sigs")(batch.count())
      val gn = groupsOf(batch)
      time(s"p$pass gn")(gn.count())
      time(s"p$pass ledger-scan")(rows.count())
      val batchHashes = gn.select(explode(col("fhs")).as("fh")).dropDuplicates()
      time(s"p$pass batch-hashes")(batchHashes.count())
      val reduced = rows.join(batchHashes, Seq("fh"), "left_semi")
      time(s"p$pass reduced")(reduced.count())
      val corpus = reduced.groupBy(col("doc_id"))
        .agg(sort_array(collect_set(col("fh"))).as("fhs"), first(col("n")).as("n"))
      time(s"p$pass corpus-collapse")(corpus.count())
      val gc = corpus.groupBy(col("fhs"), col("n"))
        .agg(sort_array(collect_set(col("doc_id"))).as("__members"))
        .select(element_at(col("__members"), 1).as("__rep"),
          col("__members"), col("n").as("__n"), col("fhs"))
      time(s"p$pass gc")(gc.count())
      def exOf(g: org.apache.spark.sql.DataFrame) =
        g.select(col("__rep"), explode(col("fhs")).as("__fh"))
      val dfreq = exOf(gn).unionByName(exOf(gc))
        .groupBy(col("__fh")).agg(count(lit(1)).as("__df"))
      time(s"p$pass dfreq")(dfreq.count())
      val tPre = 0.49995
      def preOf(g: org.apache.spark.sql.DataFrame, rep: String) =
        exOf(g).join(dfreq, "__fh")
          .groupBy(col("__rep"))
          .agg(sort_array(collect_list(struct(col("__df"), col("__fh")))).as("__ord"))
          .select(col("__rep").as(rep),
            explode(slice(transform(col("__ord"), s => s.getField("__fh")), lit(1),
              size(col("__ord")) - ceil(size(col("__ord")) * lit(tPre)).cast("int") + 1))
              .as("__fh"))
      time(s"p$pass preN")(preOf(gn, "__rn").count())
      time(s"p$pass preC")(preOf(gc, "__rc").count())
      val cand = preOf(gn, "__rn").join(preOf(gc, "__rc"), Seq("__fh"))
        .select(col("__rn"), col("__rc")).dropDuplicates()
      time(s"p$pass cand")(cand.count())
      time(s"p$pass full-probe") {
        MultimodalOps.frameDedupAgainstLedger(newDocs, "doc_id", "__bin", path,
          8, 2, 0.5).count()
      }
    }
    spark.stop()
  }
}
