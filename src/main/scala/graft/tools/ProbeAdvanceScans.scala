package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev audit: how many times does each ledger family's advance/append
  * READ ITS BATCH? At ingest scale the batch scan count IS the cost of
  * keeping a ledger current (the stored side is model-sized or
  * rewritten per-cell; the batch is the 100 TB stream) — an advance
  * that scans its input twice doubles every ingest pipeline built on
  * it. Empirical, not structural: the batch rides behind a
  * row-counting nondeterministic filter, so `scans = rows-seen /
  * batch-rows` counts actual materializations (a persisted re-use
  * counts once — which is the point). Also reports Spark jobs per
  * advance, the driver-barrier tax under sibling contention.
  */
object ProbeAdvanceScans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.GraftSparkExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      })

    val base = java.nio.file.Files
      .createTempDirectory("graft-advance-scans").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("text"))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val g1d = docs.filter(col("doc_id") % 10 < 6)
    val batchD = docs.filter(col("doc_id") % 10 === 6)
    import graft.operators._

    val results = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Int)]
    def probe(name: String, mkBatch: DataFrame)(run: DataFrame => Unit): Unit = {
      val acc = spark.sparkContext.longAccumulator(s"scan-$name")
      val n = mkBatch.count()
      val seen = udf { (_: Long) => acc.add(1); true }.asNondeterministic()
      val idc = mkBatch.columns.head
      val instrumented = mkBatch.filter(seen(col(idc).cast("long")))
      val j0 = jobs.get()
      try {
        run(instrumented)
        results += ((name, acc.value, n, jobs.get() - j0))
      } catch {
        case e: Exception =>
          println(s"[advance-scans] $name FAILED: ${e.getMessage}")
      }
    }

    // --- text/stats families (CurationOps / SketchOps / KllSketch)
    probe("bigram", batchD) { b =>
      val p = s"$base/bigram"
      CurationOps.writeBigramLedger(g1d, "text", p)
      CurationOps.advanceBigramLedger(b, "text", p, batchId = Some("g2"))
    }
    probe("stats", batchD) { b =>
      val p = s"$base/stats"
      CurationOps.writeStatsLedger(g1d, "lang", "text", p)
      CurationOps.advanceStatsLedger(b, "lang", "text", p, batchId = Some("g2"))
    }
    probe("sketch-hll", batchD) { b =>
      val p = s"$base/hll"
      CurationOps.writeSketchLedger(g1d, "lang", col("doc_id"), p)
      CurationOps.advanceSketchLedger(b, "lang", col("doc_id"), p,
        batchId = Some("g2"))
    }
    probe("quantile-hist", batchD.withColumn("len", length(col("text")))) { b =>
      val p = s"$base/qh"
      CurationOps.writeQuantileLedger(
        g1d.withColumn("len", length(col("text"))), "lang", "len", 4, p)
      CurationOps.advanceQuantileLedger(b, "lang", "len", 4, p,
        batchId = Some("g2"))
    }
    probe("sample", batchD) { b =>
      val p = s"$base/sample"
      CurationOps.writeSampleLedger(g1d, "doc_id", "s17", 50, p)
      CurationOps.advanceSampleLedger(b, "doc_id", "s17", 50, p,
        batchId = Some("g2"))
    }
    probe("vocab", batchD) { b =>
      val p = s"$base/vocab"
      SketchOps.writeVocabLedger(g1d, "lang", TextOps.tokens(col("text")), p)
      SketchOps.advanceVocabLedger(b, "lang", TextOps.tokens(col("text")), p,
        batchId = Some("g2"))
    }
    probe("kll", batchD.withColumn("mwl",
        length(col("text")).cast("double"))) { b =>
      val p = s"$base/kll"
      KllSketch.writeKllLedger(
        g1d.withColumn("mwl", length(col("text")).cast("double")),
        "lang", "mwl", 64, p)
      KllSketch.advanceKllLedger(b, "lang", "mwl", 64, p, batchId = Some("g2"))
    }

    // --- dedup families (DedupOps)
    probe("signature", batchD) { b =>
      val p = s"$base/sig"
      DedupOps.writeSignatureLedger(g1d, "doc_id", "text", p)
      DedupOps.appendToSignatureLedger(b, "doc_id", "text", p,
        batchId = Some("g2"))
    }
    probe("cluster", batchD) { b =>
      val p = s"$base/cluster"
      DedupOps.writeClusterLedger(g1d, "doc_id", "text", p)
      DedupOps.advanceClusterLedger(b, "doc_id", "text", p,
        batchId = Some("g2"))
    }
    probe("bloom", batchD) { b =>
      val p = s"$base/bloom"
      val digest = DedupOps.md5Hash32(col("text"), "") // long-castable (d119)
      DedupOps.writeBloomLedger(g1d, digest, "md5-32", 100000L, 0.01, p)
      DedupOps.advanceBloomLedger(b, digest, "md5-32", 100000L, 0.01, p,
        batchId = Some("g2"))
    }
    probe("simhash", batchD) { b =>
      val p = s"$base/simhash"
      DedupOps.writeSimHashLedger(g1d, "doc_id", "text", p)
      DedupOps.appendToSimHashLedger(b, "doc_id", "text", p,
        batchId = Some("g2"))
    }
    probe("digest", batchD) { b =>
      val p = s"$base/digest"
      DedupOps.writeLedger(g1d, "doc_id", Seq("text"), p)
      DedupOps.appendToLedger(b, "doc_id", Seq("text"), p)
    }
    probe("spanhash", batchD) { b =>
      val p = s"$base/span"
      DedupOps.writeSpanHashLedger(g1d, "doc_id", "text", 20, p)
      DedupOps.appendToSpanHashLedger(b, "doc_id", "text", 20, p,
        batchId = Some("g2"))
    }

    // --- multimodal families (payload columns; synthetic codecs)
    val gen = udf((m: Long, near: Boolean) =>
      if (near) MultimodalOps.syntheticToneWavNearCached(m, 8000, 2048, 1.0)
      else MultimodalOps.syntheticToneWavCached(m, 8000, 2048, 1.0))
    val wavs = docs.limit(600)
      .select(col("doc_id"),
        gen(col("doc_id") % 64, col("doc_id") % 128 >= 64).as("wav"))
    probe("audio-fp", wavs.filter(col("doc_id") % 10 === 6)) { b =>
      val p = s"$base/afp"
      MultimodalOps.writeAudioFpLedger(
        wavs.filter(col("doc_id") % 10 < 6), "doc_id", "wav", p)
      MultimodalOps.appendToAudioFpLedger(b, "doc_id", "wav", p,
        batchId = Some("g2"))
    }
    val binDocs = docs.limit(600)
      .select(col("doc_id"),
        substring(encode(col("text"), "UTF-8"), 1, 256).as("__bin"))
    probe("frame", binDocs.filter(col("doc_id") % 10 === 6)) { b =>
      val p = s"$base/frame"
      MultimodalOps.writeFrameLedger(
        binDocs.filter(col("doc_id") % 10 < 6), "doc_id", "__bin", 8, 2, p)
      MultimodalOps.appendToFrameLedger(b, "doc_id", "__bin", 8, 2, p,
        batchId = Some("g2"))
    }

    // --- ANN at-rest families
    probe("lsh-bucketed", emb.filter(col("vec_id") % 2 =!= 0)) { b =>
      val p = s"$base/lsh"
      SimilarityOps.writeBucketedIndex(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", 4, 64, p)
      SimilarityOps.appendToBucketedIndex(b, "vec_id", "embedding", 4, 64, p,
        batchId = Some("g2"))
    }
    probe("ivfpq", emb.filter(col("vec_id") % 2 =!= 0)) { b =>
      val p = s"$base/ivfpq"
      val model = IvfPq.train(emb, "embedding",
        kc = 4, m = 8, k = 16, iters = 2, residual = true)
      IvfPq.writeIndex(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", model, p)
      IvfPq.appendToIndex(b, "vec_id", "embedding", p, batchId = Some("g2"))
    }

    println("[advance-scans] family,rows_seen,batch_rows,scans,jobs")
    results.foreach { case (n, seenN, rows, j) =>
      val scans = if (rows == 0) 0.0 else seenN.toDouble / rows
      println(f"[advance-scans] $n,$seenN,$rows,$scans%.2f,$j")
    }
    spark.stop()
  }
}
