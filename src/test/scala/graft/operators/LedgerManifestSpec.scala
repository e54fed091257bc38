package graft.operators

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** A local filesystem whose rename is COPY + DELETE — the object-store
  * failure model the manifest commit protocol exists for (S3 "rename"
  * is a server-side copy then a delete; a crash mid-way leaves both or
  * neither, and a directory "rename" is per-object, never atomic).
  * Registered under the `nonatomic:` scheme; no AbstractFileSystem is
  * registered for it, so FileContext-based atomic rename is unavailable
  * too — exactly the degraded surface an object store presents.
  */
class NonAtomicRenameFs extends RawLocalFileSystem {
  override def getScheme: String = "nonatomic"
  override def getUri: java.net.URI = java.net.URI.create("nonatomic:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) false
    else FileUtil.copy(this, src, this, dst, false, true, getConf) &&
      delete(src, true)
  }
}

/** Manifest-mode ledger commits: the object-store-safe protocol
  * (explicit generation dirs + atomically-replaced pointer) must run
  * every ledger family's maintenance cycle correctly on a filesystem
  * whose rename is copy+delete, and equal the plain-mode results.
  */
class LedgerManifestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.hadoopConfiguration.set(
      "fs.nonatomic.impl", classOf[NonAtomicRenameFs].getName)
    s
  }
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def genDirs(local: String): Seq[String] =
    Option(new java.io.File(local).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("gen-"))
      .map(_.getName).toSeq.sorted

  test("stats ledger on copy+delete-rename FS: convert, advance, exactly-once, retention") {
    val local = tmp("graft-manifest") + "/ledger"
    val path = "nonatomic://" + local
    val seed = Seq(("s1", "a b")).toDF("source", "text")
    val b1 = Seq(("s1", "c d e"), ("s2", "f")).toDF("source", "text")
    CurationOps.writeStatsLedger(seed, "source", "text", path)
    LedgerGuard.convertToManifested(spark, path)
    assert(new java.io.File(local, "_GRAFT_MANIFEST").exists)
    assert(genDirs(local).size == 1)
    // no loose parquet left at the top level after conversion
    assert(!new java.io.File(local).listFiles().exists(f =>
      f.isFile && f.getName.endsWith(".parquet")))

    CurationOps.advanceStatsLedger(b1, "source", "text", path, batchId = Some("b-1"))
    // exactly-once: replay is a no-op
    CurationOps.advanceStatsLedger(b1, "source", "text", path, batchId = Some("b-1"))
    val got = LedgerGuard.readLedger(spark, path)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("s1" -> ((2L, 5L)), "s2" -> ((1L, 1L))), got.toString)
    // keep-2 retention: the pre-advance generation is still on disk for
    // in-flight readers
    assert(genDirs(local).size == 2, genDirs(local).toString)
    CurationOps.advanceStatsLedger(
      Seq(("s2", "g h")).toDF("source", "text"), "source", "text", path,
      batchId = Some("b-2"))
    assert(genDirs(local).size == 2, genDirs(local).toString)
    val got2 = LedgerGuard.readLedger(spark, path)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got2 == Map("s1" -> ((2L, 5L)), "s2" -> ((2L, 3L))), got2.toString)
    // plain-mode swap siblings never appear in manifest mode
    assert(!new java.io.File(local + ".staging").exists)
    assert(!new java.io.File(local + ".old").exists)
  }

  test("digest ledger + compaction: manifest mode on nonatomic FS equals plain mode (d39/d45 cycle)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val gen1 = docs.filter(col("doc_id") % 3 === 1)
    val gen2 = docs.filter(col("doc_id") % 3 === 2)
    def cycle(path: String, manifested: Boolean): Set[Long] = {
      DedupOps.writeLedger(gen1, "doc_id", Seq("text"), path)
      if (manifested) LedgerGuard.convertToManifested(spark, path)
      DedupOps.appendToLedger(gen2, "doc_id", Seq("text"), path)
      DedupOps.compactLedger(spark, path, targetFiles = 2)
      DedupOps.dedupAgainstLedger(docs, "doc_id", Seq("text"), path)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val plain = cycle(tmp("graft-led-p") + "/led", manifested = false)
    val mani = cycle("nonatomic://" + tmp("graft-led-m") + "/led", manifested = true)
    assert(plain == mani && plain.nonEmpty, s"plain=${plain.size} mani=${mani.size}")
  }

  test("signature ledger: manifest-mode append/replay/compact probe equals plain; meta survives") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val gen1 = docs.filter((col("doc_id") % 10).between(1, 5))
    val gen2 = docs.filter(col("doc_id") % 10 > 5)
    def cycle(path: String, manifested: Boolean): Set[(Long, Long, Long)] = {
      DedupOps.writeSignatureLedger(gen1, "doc_id", "text", path)
      if (manifested) LedgerGuard.convertToManifested(spark, path)
      DedupOps.appendToSignatureLedger(gen2, "doc_id", "text", path)
      DedupOps.appendToSignatureLedger(gen2, "doc_id", "text", path) // replay
      DedupOps.compactSignatureLedger(spark, path, targetFiles = 2)
      DedupOps.crossDedupAgainstSignatures(batch, "doc_id", "text", path)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val plain = cycle(tmp("graft-sig-p") + "/led", manifested = false)
    val maniPath = "nonatomic://" + tmp("graft-sig-m") + "/led"
    val mani = cycle(maniPath, manifested = true)
    assert(plain == mani && mani.nonEmpty, s"plain=${plain.size} mani=${mani.size}")
    // the self-describing meta sidecar rode through conversion, appends
    // and compaction: a drifted probe still fails loudly
    val e = intercept[IllegalArgumentException](
      DedupOps.crossDedupAgainstSignatures(batch, "doc_id", "text", maniPath, shingleSize = 7))
    assert(e.getMessage.contains("shingleSize=5"), e.getMessage)
  }

  test("cluster ledger: manifest-mode write/advance/replay/compact equals plain (d66 cycle)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val gen1 = docs.filter(col("doc_id") % 2 === 0)
    val gen2 = docs.filter(col("doc_id") % 2 =!= 0)
    def cycle(path: String, manifested: Boolean): Set[(Long, Long)] = {
      DedupOps.writeClusterLedger(gen1, "doc_id", "text", path)
      if (manifested) {
        // composite ledger: all three parts (embedded signature ledger,
        // assignments, remap log) convert — the /sig + /asg + /rmp layout
        LedgerGuard.convertToManifested(spark, path + "/sig")
        LedgerGuard.convertToManifested(spark, path + "/asg")
        LedgerGuard.convertToManifested(spark, path + "/rmp")
      }
      DedupOps.advanceClusterLedger(gen2, "doc_id", "text", path)
      DedupOps.advanceClusterLedger(gen2, "doc_id", "text", path) // replay
      DedupOps.compactClusterLedger(spark, path, targetFiles = 2)
      DedupOps.readClusterAssignments(spark, path)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val plain = cycle(tmp("graft-cl-p") + "/cl", manifested = false)
    val mani = cycle("nonatomic://" + tmp("graft-cl-m") + "/cl", manifested = true)
    assert(plain == mani && mani.nonEmpty, s"plain=${plain.size} mani=${mani.size}")
    assert(mani.exists { case (n, l) => n != l }, "fixture produced no non-trivial cluster")
  }

  test("span-hash ledger: manifest-mode write/append/replay/compact scrub equals plain (d58 cycle)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val probe = docs.filter(col("doc_id") % 10 === 0)
    val gen1 = docs.filter((col("doc_id") % 10).between(1, 5))
    val gen2 = docs.filter(col("doc_id") % 10 > 5)
    def cycle(path: String, manifested: Boolean): Set[(Long, String, Long)] = {
      DedupOps.writeSpanHashLedger(gen1, "doc_id", "text", k = 4, path)
      if (manifested) LedgerGuard.convertToManifested(spark, path)
      DedupOps.appendToSpanHashLedger(gen2, "doc_id", "text", k = 4, path)
      DedupOps.appendToSpanHashLedger(gen2, "doc_id", "text", k = 4, path) // replay
      DedupOps.compactSpanHashLedger(spark, path, targetFiles = 2)
      DedupOps.scrubAgainstSpanLedger(probe, "doc_id", "text", path)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    }
    val plain = cycle(tmp("graft-span-p") + "/led", manifested = false)
    val maniPath = "nonatomic://" + tmp("graft-span-m") + "/led"
    val mani = cycle(maniPath, manifested = true)
    assert(plain == mani && mani.nonEmpty, s"plain=${plain.size} mani=${mani.size}")
    // the width sidecar rode through conversion + compaction: a drifted
    // append still fails loudly naming both widths
    val e = intercept[IllegalArgumentException](
      DedupOps.appendToSpanHashLedger(probe, "doc_id", "text", k = 6, maniPath))
    assert(e.getMessage.contains("k=4") && e.getMessage.contains("k=6"), e.getMessage)
  }

  test("sketch ledger: manifest-mode advance equals plain (d46 cycle)") {
    val corpus = Seq(
      ("s1", "a"), ("s1", "b"), ("s2", "b"), ("s2", "c"), ("s3", "x"))
      .toDF("source", "text")
    val b2 = Seq(("s1", "c"), ("s3", "y")).toDF("source", "text")
    def cycle(path: String, manifested: Boolean): Map[String, (Long, Long)] = {
      CurationOps.writeSketchLedger(corpus, "source", col("text"), path)
      if (manifested) LedgerGuard.convertToManifested(spark, path)
      CurationOps.advanceSketchLedger(b2, "source", col("text"), path)
      CurationOps.sketchEstimates(spark, path)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    val plain = cycle(tmp("graft-sk-p") + "/led", manifested = false)
    val mani = cycle("nonatomic://" + tmp("graft-sk-m") + "/led", manifested = true)
    assert(plain == mani && mani.nonEmpty, s"plain=$plain mani=$mani")
  }

  test("quantile ledger: manifest-mode write/advance/replay/compact probe equals plain (d78 cycle)") {
    val corpus = Seq(("s1", 10L), ("s1", 200L), ("s1", 35L), ("s2", 7L),
      ("s2", 900L)).toDF("source", "len")
    val b2 = Seq(("s1", 64L), ("s3", 1000L)).toDF("source", "len")
    def cycle(path: String, manifested: Boolean): Set[(String, Double, Long, Long)] = {
      CurationOps.writeQuantileLedger(corpus, "source", "len", shift = 4, path)
      if (manifested) LedgerGuard.convertToManifested(spark, path)
      CurationOps.advanceQuantileLedger(b2, "source", "len", 4, path, Some("g2"))
      CurationOps.advanceQuantileLedger(b2, "source", "len", 4, path, Some("g2")) // replay
      CurationOps.retractFromQuantileLedger( // forget an admitted row
        Seq(("s1", 200L)).toDF("source", "len"), "source", "len", 4, path, Some("rm1"))
      CurationOps.compactQuantileLedger(spark, path, targetFiles = 1)
      CurationOps.quantilesFromLedger(spark, path, Seq(0.5, 0.99))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSet
    }
    val plain = cycle(tmp("graft-qh-p") + "/led", manifested = false)
    val maniPath = "nonatomic://" + tmp("graft-qh-m") + "/led"
    val mani = cycle(maniPath, manifested = true)
    assert(plain == mani && mani.nonEmpty, s"plain=$plain mani=$mani")
    // the bucketing sidecar rode through conversion, advances and
    // compaction: a drifted advance still fails loudly
    val e = intercept[IllegalArgumentException](
      CurationOps.advanceQuantileLedger(b2, "source", "len", 5, maniPath))
    assert(e.getMessage.contains("shift=4"), e.getMessage)
  }

  test("vocab ledger: manifest-mode write/advance/replay/compact probe equals plain (d79 cycle)") {
    import graft.operators.{SketchOps, TextOps}
    val corpus = Seq(("en", "a b a"), ("de", "x y")).toDF("lang", "text")
    val b2 = Seq(("en", "b c"), ("fr", "z")).toDF("lang", "text")
    def cycle(path: String, manifested: Boolean): Set[(String, Int, String, Long)] = {
      SketchOps.writeVocabLedger(corpus, "lang", TextOps.tokens(col("text")), path)
      if (manifested) LedgerGuard.convertToManifested(spark, path)
      SketchOps.advanceVocabLedger(b2, "lang", TextOps.tokens(col("text")), path,
        batchId = Some("g2"))
      SketchOps.advanceVocabLedger(b2, "lang", TextOps.tokens(col("text")), path,
        batchId = Some("g2")) // replay
      SketchOps.retractFromVocabLedger( // forget an admitted document
        Seq(("fr", "z")).toDF("lang", "text"), "lang",
        TextOps.tokens(col("text")), path, batchId = Some("rm1"))
      SketchOps.compactVocabLedger(spark, path, targetFiles = 1)
      SketchOps.topTokensFromLedger(spark, path, 2)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    }
    val plain = cycle(tmp("graft-vc-p") + "/led", manifested = false)
    val maniPath = "nonatomic://" + tmp("graft-vc-m") + "/led"
    val mani = cycle(maniPath, manifested = true)
    assert(plain == mani && mani.nonEmpty, s"plain=$plain mani=$mani")
    // the tokenizer sidecar rode through conversion, advances and
    // compaction: a drifted advance still fails loudly
    val e = intercept[IllegalArgumentException](SketchOps.advanceVocabLedger(
      b2, "lang", TextOps.tokens(col("text")), maniPath, tokenizerId = "bpe-v2"))
    assert(e.getMessage.contains("tokenizerId=ws"), e.getMessage)
  }

  test("simhash ledger: manifest-mode write/append/replay/compact probe equals plain (d97 cycle)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val gen1 = docs.filter((col("doc_id") % 10).between(1, 5))
    val gen2 = docs.filter(col("doc_id") % 10 > 5)
    def cycle(path: String, manifested: Boolean): Set[(Long, Long, Int)] = {
      DedupOps.writeSimHashLedger(gen1, "doc_id", "text", path)
      if (manifested) LedgerGuard.convertToManifested(spark, path)
      DedupOps.appendToSimHashLedger(gen2, "doc_id", "text", path)
      DedupOps.appendToSimHashLedger(gen2, "doc_id", "text", path) // replay
      DedupOps.compactSimHashLedger(spark, path, targetFiles = 2)
      DedupOps.crossDedupAgainstSimHashes(batch, "doc_id", "text", path,
          maxHamming = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    val plain = cycle(tmp("graft-sh-p") + "/led", manifested = false)
    val maniPath = "nonatomic://" + tmp("graft-sh-m") + "/led"
    val mani = cycle(maniPath, manifested = true)
    assert(plain == mani && mani.nonEmpty, s"plain=${plain.size} mani=${mani.size}")
    // the tokenizer sidecar rode through conversion, appends and
    // compaction: a drifted probe still fails loudly
    val e = intercept[IllegalArgumentException](
      DedupOps.crossDedupAgainstSimHashes(batch, "doc_id", "text", maniPath,
        maxHamming = 20, tokenizerId = "bpe-v2"))
    assert(e.getMessage.contains("tokenizerId=ws-md5-60"), e.getMessage)
  }

  test("bigram-LM ledger: manifest-mode write/advance/replay/retract/compact score equals plain (d90/d91 cycle)") {
    val corpus = Seq((1L, "a b a b c"), (2L, "c a"), (3L, "q")).toDF("doc_id", "text")
    val b2 = Seq((4L, "b c a"), (5L, "z")).toDF("doc_id", "text")
    val probe = corpus.unionByName(Seq((9L, "a zz")).toDF("doc_id", "text"))
    def cycle(path: String, manifested: Boolean): Set[(Long, Int, Double)] = {
      CurationOps.writeBigramLedger(corpus, "text", path)
      if (manifested) LedgerGuard.convertToManifested(spark, path)
      CurationOps.advanceBigramLedger(b2, "text", path, batchId = Some("g2"))
      CurationOps.advanceBigramLedger(b2, "text", path, batchId = Some("g2")) // replay
      CurationOps.retractFromBigramLedger( // forget an admitted document
        Seq((5L, "z")).toDF("doc_id", "text"), "text", path, batchId = Some("rm1"))
      CurationOps.compactBigramLedger(spark, path, targetFiles = 1)
      CurationOps.bigramScoreFromLedger(probe, "doc_id", "text", path)
        .collect().map(r => (r.getLong(0), r.getInt(1),
          math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet
    }
    val plain = cycle(tmp("graft-bg-p") + "/led", manifested = false)
    val maniPath = "nonatomic://" + tmp("graft-bg-m") + "/led"
    val mani = cycle(maniPath, manifested = true)
    assert(plain == mani && mani.nonEmpty, s"plain=$plain mani=$mani")
    // the tokenizer sidecar rode through conversion, advances, the
    // retraction and compaction: a drifted probe still fails loudly
    val e = intercept[IllegalArgumentException](CurationOps.bigramScoreFromLedger(
      probe, "doc_id", "text", maniPath, tokenizerId = "bpe-v2"))
    assert(e.getMessage.contains("tokenizerId=ws"), e.getMessage)
  }

  test("frame ledger: manifest-mode write/append/replay/forget/compact probe equals plain (m08/m09 cycle)") {
    val docs = Seq(
      (1L, "aaaaaaaabbbbbbbbccccccccdddddddd"),
      (2L, "aaaaaaaabbbbbbbbzzzzzzzzyyyyyyyy"),
      (3L, "qqqqqqqqrrrrrrrrsssssssstttttttt"),
      (4L, "aaaaaaaabbbbbbbbccccccccdddddddd"),
      (10L, "aaaaaaaabbbbbbbbccccccccdddddddd"))
      .toDF("doc_id", "text").withColumn("__bin", col("text").cast("binary"))
    val batch = docs.filter(col("doc_id") >= 10)
    def cycle(path: String, manifested: Boolean): Set[(Long, Long, Int, Double)] = {
      MultimodalOps.writeFrameLedger(docs.filter(col("doc_id") === 1),
        "doc_id", "__bin", 8, 2, path)
      if (manifested) LedgerGuard.convertToManifested(spark, path)
      val gen2 = docs.filter(col("doc_id").between(2, 4))
      MultimodalOps.appendToFrameLedger(gen2, "doc_id", "__bin", 8, 2, path)
      MultimodalOps.appendToFrameLedger(gen2, "doc_id", "__bin", 8, 2, path) // replay
      MultimodalOps.removeFromFrameLedger(
        docs.filter(col("doc_id") === 3).select(col("doc_id")), "doc_id", path)
      MultimodalOps.compactFrameLedger(spark, path, targetFiles = 2)
      MultimodalOps.frameDedupAgainstLedger(batch, "doc_id", "__bin", path, 8, 2, 0.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    }
    val plain = cycle(tmp("graft-fr-p") + "/led", manifested = false)
    val maniPath = "nonatomic://" + tmp("graft-fr-m") + "/led"
    val mani = cycle(maniPath, manifested = true)
    assert(plain == mani && mani.nonEmpty, s"plain=$plain mani=$mani")
    assert(!mani.exists(_._2 == 3L), "forgotten payload still paired")
    // the framing sidecar rode through conversion, appends, forget and
    // compaction: a drifted probe still fails loudly
    val e = intercept[IllegalArgumentException](
      MultimodalOps.frameDedupAgainstLedger(batch, "doc_id", "__bin",
        maniPath, 4, 2, 0.0))
    assert(e.getMessage.contains("frameBytes=8"), e.getMessage)
  }

  test("manifest-mode compaction carries the exactly-once marker (batchId straddling compaction)") {
    val local = tmp("graft-m-once") + "/ledger"
    val path = "nonatomic://" + local
    val seed = Seq(("s1", "a b")).toDF("source", "text")
    val b1 = Seq(("s1", "c d e"), ("s2", "f")).toDF("source", "text")
    CurationOps.writeStatsLedger(seed, "source", "text", path)
    LedgerGuard.convertToManifested(spark, path)
    CurationOps.advanceStatsLedger(b1, "source", "text", path, batchId = Some("b-1"))
    // unmarked advance (compaction-style rewrite) — marker must carry
    LedgerGuard.advanceInPlace(spark, path, "test compaction") { staging =>
      LedgerGuard.readLedger(spark, path).write.parquet(staging)
    }
    CurationOps.advanceStatsLedger(b1, "source", "text", path, batchId = Some("b-1"))
    val got = LedgerGuard.readLedger(spark, path)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map("s1" -> ((2L, 5L)), "s2" -> ((1L, 1L))), got.toString)
  }

  test("ANN index (partitioned layout): manifest-mode maintenance cycle equals plain mode") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 8)
    val odds = emb.filter(col("vec_id") % 2 === 1)
    def cycle(path: String, manifested: Boolean): Set[(Long, Int, Long)] = {
      SimilarityOps.writeBucketedIndex(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", 4, 64, path)
      if (manifested) LedgerGuard.convertToManifested(spark, path)
      SimilarityOps.appendToBucketedIndex(odds, "vec_id", "embedding", 4, 64, path)
      SimilarityOps.appendToBucketedIndex(odds, "vec_id", "embedding", 4, 64, path) // replay
      SimilarityOps.compactBucketedIndex(spark, path)
      SimilarityOps.probeBucketedIndex(spark, path, queries,
        "vec_id", "embedding", "vec_id", "embedding", 4, 64, k = 3)
        .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).toSet
    }
    val plain = cycle(tmp("graft-ann-p") + "/idx", manifested = false)
    val mani = cycle("nonatomic://" + tmp("graft-ann-m") + "/idx", manifested = true)
    assert(plain == mani && mani.nonEmpty, s"plain=${plain.size} mani=${mani.size}")
  }

  test("manifest mode: a reader bound BEFORE an advance still reads its generation (snapshot isolation)") {
    val local = tmp("graft-snap") + "/ledger"
    val path = "nonatomic://" + local
    val seed = Seq(("s1", "a b")).toDF("source", "text")
    CurationOps.writeStatsLedger(seed, "source", "text", path)
    LedgerGuard.convertToManifested(spark, path)
    // bind NOW (resolves the manifest to the current generation and
    // lists its immutable files at plan time)...
    val bound = LedgerGuard.readLedger(spark, path)
    // ...then a writer commits a new generation before the action runs.
    // Plain mode's documented failure here is FileNotFound (the swap
    // retired the directory under the plan); manifest mode keeps the
    // previous generation on disk (keep-2), so the action succeeds AND
    // returns the snapshot the reader bound.
    CurationOps.advanceStatsLedger(
      Seq(("s2", "c d e")).toDF("source", "text"), "source", "text", path)
    val snap = bound.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(snap == Map("s1" -> 1L), s"stale reader saw $snap")
    // a FRESH bind sees the advanced generation
    val now = LedgerGuard.readLedger(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(now == Map("s1" -> 1L, "s2" -> 1L), now.toString)
  }

  test("conversion is idempotent and a second writer's lease still fails fast") {
    val local = tmp("graft-m-lock") + "/ledger"
    val path = "nonatomic://" + local
    CurationOps.writeStatsLedger(
      Seq(("s1", "a")).toDF("source", "text"), "source", "text", path)
    LedgerGuard.convertToManifested(spark, path)
    LedgerGuard.convertToManifested(spark, path) // no-op, no nesting
    assert(genDirs(local).size == 1)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(local + ".lock"), "999@elsewhere")
    val e = intercept[IllegalStateException](
      CurationOps.advanceStatsLedger(
        Seq(("s2", "b")).toDF("source", "text"), "source", "text", path))
    assert(e.getMessage.contains("999@elsewhere"), e.getMessage)
    java.nio.file.Files.delete(java.nio.file.Paths.get(local + ".lock"))
  }

  test("KLL sketch ledger: manifest-mode write/advance/replay/compact equals plain (d110 cycle)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("double").as("v"))
    val gen1 = docs.filter(col("doc_id") % 2 === 0)
    val gen2 = docs.filter(col("doc_id") % 2 =!= 0)
    def cycle(path: String, manifested: Boolean): Seq[(String, Double, Double, Long)] = {
      KllSketch.writeKllLedger(gen1, "lang", "v", k = 64, path = path)
      if (manifested) LedgerGuard.convertToManifested(spark, path)
      KllSketch.advanceKllLedger(gen2, "lang", "v", 64, path, batchId = Some("g2"))
      KllSketch.advanceKllLedger(gen2, "lang", "v", 64, path, batchId = Some("g2")) // replay
      KllSketch.compactKllLedger(spark, path)
      KllSketch.quantilesFromKllLedger(spark, path, Seq(0.25, 0.5, 0.9))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
          r.getLong(3))).toSeq.sorted
    }
    val plainPath = tmp("graft-kll-p") + "/led"
    val plain = cycle(plainPath, manifested = false)
    val mani = cycle("nonatomic://" + tmp("graft-kll-m") + "/led", manifested = true)
    // deterministic sketch (no RNG) => the two cycles agree EXACTLY,
    // and per-lang n sums to the corpus count (replay did not
    // double-merge; weight-exact collapses lost nothing)
    assert(plain == mani && mani.nonEmpty, s"plain=$plain mani=$mani")
    assert(mani.groupBy(_._1).map(_._2.head._4).sum == docs.count(),
      s"per-lang n must sum to ${docs.count()}")
    // drifted k on a later advance fails loudly naming both sides
    val e2 = intercept[IllegalArgumentException](
      KllSketch.advanceKllLedger(gen2.limit(3), "lang", "v", 32, plainPath))
    assert(e2.getMessage.contains("k=64") && e2.getMessage.contains("k=32"),
      e2.getMessage)
  }

  test("cluster-ledger create: sig-lane failure surfaces, half-created ledger rejects a later advance") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = tmp("graft-cl-createfail")
    val path = base + "/cl"
    val boom = new RuntimeException("injected sig-lane failure")
    DedupOps.clusterCreateSigLaneFailpoint = () => throw boom
    try {
      // creation must NOT return "done": the /asg leg may complete (and
      // clean-mark) but the sig-lane failure is surfaced to the caller
      val e = intercept[RuntimeException](DedupOps.writeClusterLedger(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path))
      assert(e eq boom, s"sig-lane failure must surface from create, got $e")
    } finally DedupOps.clusterCreateSigLaneFailpoint = () => ()
    // the half-created ledger (asg present, sig absent) must reject an
    // advance loudly — today via the missing /sig parquet read; this
    // spec pins that SOME loud failure precedes any mutation, so a
    // later relaxation of the probe path cannot silently admit
    // advances against a ledger whose creation never finished
    intercept[Exception](DedupOps.advanceClusterLedger(
      docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", path,
      batchId = Some("after-half-create")))
    // re-create from scratch heals (the creation contract), and the
    // healed ledger admits the advance
    DedupOps.writeClusterLedger(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", path)
    DedupOps.advanceClusterLedger(
      docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", path,
      batchId = Some("after-heal"))
    assert(DedupOps.readClusterAssignments(spark, path).count() == docs.count())
  }

  test("signature-ledger compaction: main-leg failure awaits the index leg, leaves no .idx residue, retry heals") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = tmp("graft-sig-fail")
    val path = base + "/led"
    DedupOps.writeSignatureLedger(
      docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", path)
    val boom = new RuntimeException("injected main-leg failure")
    DedupOps.sigCompactMainLegFailpoint = () => throw boom
    try {
      val e = intercept[RuntimeException](
        DedupOps.compactSignatureLedger(spark, path, targetFiles = 2))
      assert(e eq boom, s"main-leg failure must stay primary, got $e")
    } finally DedupOps.sigCompactMainLegFailpoint = () => ()
    // the concurrent index leg was awaited and its scratch dir removed —
    // no `.idx` residue anywhere next to the ledger
    val leftovers = Option(new java.io.File(base).listFiles())
      .getOrElse(Array.empty).map(_.getName).filter(_.contains(".idx"))
    assert(leftovers.isEmpty, leftovers.mkString(", "))
    // the aborted advance never swapped: the ledger is intact, a retried
    // compaction succeeds and leaves a live probe index in the generation
    DedupOps.compactSignatureLedger(spark, path, targetFiles = 2)
    assert(new java.io.File(
      new java.io.File(path, "_GRAFT_SIG_INDEX2_B4"), "bands/_SUCCESS").exists,
      "retried compaction must rebuild the probe index")
    val probe = DedupOps.crossDedupAgainstSignatures(
      docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", path)
    assert(probe.count() > 0, "post-retry probe must still find collisions")
  }
}
