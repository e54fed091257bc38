package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression gates for the scale-critical operator shapes.
  * Correctness tests prove the small-SF answer; these prove the PLAN is
  * the one that survives a 100× scale-up — per-row kernels stay
  * shuffle-free, model-sized sides stay broadcast, and the known skew
  * traps (windows over corpus-frequency keys) stay out of the plans.
  * AQE is disabled per-test (runtime-mutable conf) so the asserted
  * static shapes are deterministic.
  */
class PlanShapeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // events.parquet carries TIMESTAMP(NANOS) — read as LONG nanos and
    // let Registry.table normalize, same as the Verify/Bench sessions
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  private def withStaticPlans[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def nodes[T <: SparkPlan](df: DataFrame)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
    df.queryExecution.executedPlan.collect(pf)

  private def shuffles(df: DataFrame): Int =
    nodes(df) { case e: ShuffleExchangeExec => e }.size
  private def broadcasts(df: DataFrame): Int =
    nodes(df) { case e: BroadcastExchangeExec => e }.size
  private def windows(df: DataFrame): Int =
    nodes(df) { case w: WindowExec => w }.size

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("repetitionStats is a pure scan: zero shuffles, zero windows") {
    withStaticPlans {
      val df = CurationOps.repetitionStats(docs, "doc_id", "text")
      assert(shuffles(df) == 0, df.queryExecution.executedPlan.toString)
      assert(windows(df) == 0)
    }
  }

  test("corpusMix: corpus streams past a broadcast rate table (1 shuffle, 1 broadcast)") {
    withStaticPlans {
      val df = CurationOps.corpusMix(docs, "doc_id", "text", "source", 800)
      assert(shuffles(df) == 1, df.queryExecution.executedPlan.toString) // the model-sized rate agg
      assert(broadcasts(df) == 1)
    }
  }

  test("d10 expansion: null-safe set joins stay hash joins; the only nested loop is the rep cross") {
    withStaticPlans {
      val df = graft.SparkEntry.queries("d10_ngram_jaccard")(spark, "/root/testdata/sf0.001")
      val plan = df.queryExecution.executedPlan
      // EqualNullSafe is a legal hash-join key: the two member-expansion
      // joins must plan as BroadcastHashJoin, never fall to a nested
      // loop (which would be quadratic in members at scale)
      val bhj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }.size
      val bnlj = plan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j }.size
      assert(bhj == 2, s"expected 2 null-safe hash expansions, got $bhj:\n$plan")
      assert(bnlj == 1, s"only the distinct-set scoring cross may nest, got $bnlj:\n$plan")
    }
  }

  test("signature-ledger probe shingles ONLY the batch side (the at-rest point)") {
    withStaticPlans {
      val dir = java.nio.file.Files.createTempDirectory("sigplan").toString + "/led"
      DedupOps.writeSignatureLedger(docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", dir)
      def shingles(df: DataFrame): Int =
        "(?i)shinglehash".r.findAllIn(df.queryExecution.executedPlan.toString).size
      val probe = shingles(DedupOps.crossDedupAgainstSignatures(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", dir))
      val direct = shingles(DedupOps.crossDedupPairs(
        docs.filter(col("doc_id") % 10 === 0), docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text"))
      // the corpus side must come from the columnar signature scan, so
      // the probe plan carries the shingle kernel for the batch side
      // only — half the direct form's sites
      assert(probe > 0 && probe * 2 == direct,
        s"probe=$probe direct=$direct — corpus side is being re-shingled")
    }
  }

  test("passageDedup: no window over the chunk hash (the skew trap)") {
    withStaticPlans {
      val df = CurationOps.passageDedup(docs, "doc_id", "text", 10)
      assert(windows(df) == 0, df.queryExecution.executedPlan.toString)
      assert(shuffles(df) <= 3) // winner agg (+join when not broadcast) + rebuild agg
    }
  }

  test("PQ annTopK: corpus scores through broadcast LUTs; shuffles only for top-k windows") {
    withStaticPlans {
      val model = PqIndex.train(emb, "embedding", m = 8, k = 32, iters = 1)
      val df = PqIndex.annTopK(emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", model, k = 5, rerank = 20)
      assert(shuffles(df) <= 2, df.queryExecution.executedPlan.toString) // ADC pool window + exact re-rank window
      assert(broadcasts(df) >= 2) // LUTs, pool ids, query vectors
    }
  }

  test("exactQuantilesMulti: ONE ranking window + broadcast totals, all measures fused") {
    withStaticPlans {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val df = PercentileOps.exactQuantilesMulti(li, Seq("l_returnflag"), Seq(
        ("price", col("l_extendedprice"), Seq("p25" -> 0.25, "p50" -> 0.5)),
        ("qty", col("l_quantity"), Seq("med" -> 0.5))))
      // one sort-based ranking window over the fused (keys, measure)
      // frame — NOT one per measure, and NOT a second whole-partition
      // window for group totals (those broadcast from a tiny aggregate)
      assert(windows(df) == 1, df.queryExecution.executedPlan.toString)
      assert(broadcasts(df) == 1, df.queryExecution.executedPlan.toString)
    }
  }

  test("exactQuantilesSelectRev: the NEEDED side broadcasts, never the unpivoted fact stream") {
    withStaticPlans {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val df = PercentileOps.exactQuantilesSelectRev(li, Seq("l_returnflag"), Seq(
        ("price", col("l_extendedprice"),
          Seq(("d40", 0.4, true, true), ("c25", 0.25, false, true))),
        ("qty", col("l_quantity"), Seq(("t50", 0.5, true, true)))))
      val bcasts = nodes(df) { case e: BroadcastExchangeExec => e }
      assert(bcasts.nonEmpty, df.queryExecution.executedPlan.toString)
      // every broadcast subtree must be the model-sized `needed` lineage
      // (recognizable by the cum-rank Window beneath it) — a broadcast
      // WITHOUT a window is the unpivoted fact stream being collected
      // to the driver, the stats-misestimate this plan explicitly pins
      // against (rows × measures never fits at real scale)
      bcasts.foreach { b =>
        assert(b.collect { case w: WindowExec => w }.nonEmpty,
          s"broadcast of a non-needed (fact-stream) side:\n$b")
      }
    }
  }

  test("zValue interleaves bits (Morton order) and matches its own SQL form") {
    import spark.implicits._
    val df = Seq((3L, 5L), (0L, 0L), (1023L, 1L), (65535L, 65535L)).toDF("x", "y")
    val got = df.select(
      LayoutOps.zValue(col("x"), col("y")).as("z"),
      expr(LayoutOps.sqlZValue("x", "y")).as("zsql"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got(0) == ((39L, 39L))) // x=11b -> 0101b, y=101b -> 010001b<<1
    assert(got(1) == ((0L, 0L)))
    assert(got(2)._1 == got(2)._2)
    assert(got(3) == (((1L << 32) - 1, (1L << 32) - 1))) // full 16+16 bits
    got.foreach { case (z, zsql) => assert(z == zsql) }
  }

  test("zorderBy plans a range repartition + within-partition sort (no global sort)") {
    withStaticPlans {
      val df = LayoutOps.zorderBy(
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet"),
        numFiles = 4, pmod(col("l_partkey"), lit(1024)), pmod(col("l_suppkey"), lit(1024)))
      val plan = df.queryExecution.executedPlan
      assert(plan.collect {
        case e: ShuffleExchangeExec if e.outputPartitioning.toString.contains("rangepartitioning") => e
      }.size == 1, plan.toString)
      val sorts = plan.collect { case s: org.apache.spark.sql.execution.SortExec => s }
      assert(sorts.nonEmpty && sorts.forall(!_.global), plan.toString)
    }
  }

  test("writeSized compacts to the target file count with per-file record caps") {
    val out = java.nio.file.Files.createTempDirectory("graft-sized").toString + "/li"
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    LayoutOps.writeSized(li, out, col("l_orderkey"), numFiles = 4, maxRecordsPerFile = 10000)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, files.map(_.getName).mkString(","))
    val back = spark.read.parquet(out)
    assert(back.count() == li.count())
  }

  test("metadata-only aggregation pushes COUNT/MIN/MAX into the parquet scan") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.sources.useV1SourceList", "")
    s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val df = s2.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .agg(count(lit(1)).as("n"), min(col("l_quantity")).as("mn"),
        max(col("l_extendedprice")).as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [COUNT(*), MIN(l_quantity), MAX(l_extendedprice)]"),
      plan)
    assert(df.head().getLong(0) == 6000L)
  }

  test("bruteForceTopK ranks through the bounded-heap aggregate: zero windows, rows equal the window form") {
    withStaticPlans {
      val q = emb.filter(col("vec_id") < 4)
      val df = SimilarityOps.bruteForceTopK(q, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5)
      assert(windows(df) == 0, df.queryExecution.executedPlan.toString)
      // row-equality vs the window form it replaced
      val fromAgg = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val scored = broadcast(q.select(col("vec_id").as("query_id"), col("embedding").as("__qv")))
        .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv")),
          col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          graft.queries.Qf.dround(SimilarityOps.cosine(col("__qv"), col("__cv")), 6).as("score"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("neighbor_id"))
      val fromWin = scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(fromAgg == fromWin)
    }
  }

  test("q62b's JDBC read fans out to multiple partitions (never a one-task serial scan)") {
    // the conformance query itself must carry the partitioned-read shape:
    // its JDBC scan declares numPartitions=4 (stride-ranged parallel
    // queries), not the single-task read q62 keeps as round-trip oracle
    val df = graft.SparkEntry.queries("q62b_jdbc_partitioned")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("numPartitions=4"), plan)
    assert(df.count() > 0)
  }

  test("perKeyTopK orders NaN scores exactly like the window form (NaN above +Infinity)") {
    // cosine of a zero vector yields NaN; Spark's double ordering puts
    // NaN ABOVE +Infinity, so desc ranking lists NaN rows first — the
    // aggregate must agree (raw </> comparisons would bury NaN last)
    val rows = Seq(
      (1L, 10L, Double.NaN), (1L, 11L, Double.PositiveInfinity),
      (1L, 12L, 0.9), (1L, 13L, Double.NaN), (1L, 14L, -0.5),
      (2L, 20L, 0.1), (2L, 21L, Double.NaN), (2L, 22L, 0.2))
    val scored = spark.createDataFrame(rows).toDF("query_id", "neighbor_id", "score")
    for (asc <- Seq(true, false); k <- Seq(2, 3)) {
      val fromAgg = SimilarityOps.perKeyTopK(scored, "score", asc, k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      val ord = if (asc) col("score").asc else col("score").desc
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
        .orderBy(ord, col("neighbor_id"))
      val fromWin = scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
      assert(fromAgg == fromWin, s"asc=$asc k=$k: $fromAgg != $fromWin")
    }
  }

  test("runtime bloom filter from the selective dim side prunes the fact scan") {
    withStaticPlans {
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.adaptive.enabled", "false")
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      val li = s2.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      val part = s2.read.parquet("/root/testdata/sf0.001/part.parquet")
      val df = li.join(part.filter(col("p_brand") === "Brand#23"),
        col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"no runtime bloom filter injected:\n$plan")
      assert(df.count() > 0)
    }
  }

  test("persisted IVFPQ index: probe is partition-pruned and row-identical to the in-flight form") {
    withStaticPlans {
      val path = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
      val queries = emb.filter(col("vec_id") < 4)
      // residual form: also pins that the at-rest marker row round-trips
      // (a probe that loaded residual codes as raw would score garbage)
      val model = IvfPq.train(emb, "embedding", kc = 8, m = 8, k = 16, iters = 2,
        residual = true)
      IvfPq.writeIndex(emb, "vec_id", "embedding", model, path)
      // model round-trips bit-exactly through parquet
      val loaded = IvfPq.loadModel(spark, path)
      assert(loaded.residual == model.residual)
      assert(loaded.pq.subDim == model.pq.subDim)
      assert(loaded.coarse.centroids.map(_.toSeq) == model.coarse.centroids.map(_.toSeq))
      assert(loaded.pq.codebooks.map(_.centroids.map(_.toSeq)) ==
        model.pq.codebooks.map(_.centroids.map(_.toSeq)))
      val probed = IvfPq.probeIndex(spark, path, queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5, nprobe = 3, rerank = 20)
      val plan = probed.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("__cluster"),
        s"probe scan not partition-pruned:\n$plan")
      val direct = IvfPq.annTopK(queries, "vec_id", "embedding",
        emb, "vec_id", "embedding", model, k = 5, nprobe = 3, rerank = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val viaIndex = probed
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(viaIndex == direct)

      // incremental append: a new batch (re-keyed copies) lands in the
      // cell dirs without rewriting old files; the probe sees old + new
      // == an index built over the union in one shot
      val newBatch = emb.select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
      IvfPq.appendToIndex(newBatch, "vec_id", "embedding", path)
      val union = emb.select(col("vec_id"), col("embedding")).unionByName(newBatch)
      val probedAll = IvfPq.probeIndex(spark, path, queries, "vec_id", "embedding",
        union, "vec_id", "embedding", k = 5, nprobe = 3, rerank = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val oneShot = {
        val p2 = java.nio.file.Files.createTempDirectory("graft-ivfpq2").toString
        IvfPq.writeIndex(union, "vec_id", "embedding", model, p2)
        IvfPq.probeIndex(spark, p2, queries, "vec_id", "embedding",
          union, "vec_id", "embedding", k = 5, nprobe = 3, rerank = 20)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      }
      assert(probedAll == oneShot)

      // s19: tombstone delete + compaction — row-identity with the LIVE
      // path over the surviving corpus, before AND after compaction
      // (the s17 contract mirrored onto the IVFPQ layout)
      val dead = union.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
      IvfPq.deleteFromIndex(spark, path, dead, "vec_id")
      IvfPq.deleteFromIndex(spark, path, dead, "vec_id") // crash-and-retry replay
      val survivors = union.filter(col("vec_id") % 3 =!= 0)
      def probeSet(): Set[(Long, Long, Double, Int)] =
        IvfPq.probeIndex(spark, path, queries, "vec_id", "embedding",
          union, "vec_id", "embedding", k = 5, nprobe = 3, rerank = 20)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val liveAnswer = IvfPq.annTopK(queries, "vec_id", "embedding",
        survivors, "vec_id", "embedding", model, k = 5, nprobe = 3, rerank = 20)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      assert(probeSet() == liveAnswer, "tombstoned probe != live path over survivors")
      assert(!liveAnswer.exists(_._2 % 3 == 0) && liveAnswer.nonEmpty)
      IvfPq.compactIndex(spark, path)
      assert(probeSet() == liveAnswer, "post-compact probe drifted")
      // the tombstone partition is physically gone and each surviving
      // cell compacted to one data file
      val cellDirs = new java.io.File(s"$path/codes").listFiles()
        .filter(_.isDirectory).map(_.getName).toSeq
      assert(!cellDirs.contains("__cluster=-1"), cellDirs.toString)
      cellDirs.filter(_.startsWith("__cluster=")).foreach { d =>
        val files = new java.io.File(s"$path/codes/$d").listFiles()
          .count(_.getName.endsWith(".parquet"))
        assert(files == 1, s"$d holds $files data files after compaction")
      }
    }
  }

  test("IVFPQ: full purge + compaction leaves a READABLE empty index; marked append replay no-ops; re-append revives") {
    withStaticPlans {
      val path = java.nio.file.Files.createTempDirectory("graft-ivfpq-purge").toString
      val small = emb.filter(col("vec_id") < 40)
      val queries = emb.filter(col("vec_id") < 2)
      val model = IvfPq.train(small, "embedding", kc = 4, m = 8, k = 16, iters = 2)
      IvfPq.writeIndex(small, "vec_id", "embedding", model, path)
      // purge EVERY id, then compact: the store must stay readable as a
      // legitimately empty index (a zero-row partitioned write carries
      // no parquet footer — the 0-row footer file the empty branch
      // writes is what keeps schema inference alive)
      IvfPq.deleteFromIndex(spark, path, small.select(col("vec_id")), "vec_id")
      IvfPq.compactIndex(spark, path)
      assert(spark.read.parquet(s"$path/codes").count() == 0,
        "fully-purged index must read as empty, not throw")
      assert(IvfPq.probeIndex(spark, path, queries, "vec_id", "embedding",
        small, "vec_id", "embedding", k = 3, nprobe = 2, rerank = 10)
        .collect().isEmpty, "probe of an empty index must return no rows")
      // marked re-append + replay: exactly-once, then the index revives
      val revived = small.filter(col("vec_id") < 20)
      IvfPq.appendToIndex(revived, "vec_id", "embedding", path, batchId = Some("r1"))
      val afterOnce = spark.read.parquet(s"$path/codes")
        .filter(col("__cluster") =!= -1).count()
      IvfPq.appendToIndex(revived, "vec_id", "embedding", path, batchId = Some("r1"))
      assert(spark.read.parquet(s"$path/codes")
        .filter(col("__cluster") =!= -1).count() == afterOnce,
        "marked replay must append nothing")
      assert(afterOnce == 20)
      val probed = IvfPq.probeIndex(spark, path, queries, "vec_id", "embedding",
        revived, "vec_id", "embedding", k = 3, nprobe = 4, rerank = 20)
      assert(probed.collect().nonEmpty, "revived index must answer probes")
    }
  }

  test("pre-bucketed tables join with zero shuffles (the co-located fact join layout)") {
    withStaticPlans {
      val wh = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
      import spark.implicits._
      val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("id", "av")
      val b = (1L to 1000L).map(i => (i, i * 2)).toDF("id", "bv")
      spark.sql("DROP TABLE IF EXISTS bucket_a")
      spark.sql("DROP TABLE IF EXISTS bucket_b")
      a.write.bucketBy(4, "id").sortBy("id").option("path", s"$wh/bucket_a").saveAsTable("bucket_a")
      b.write.bucketBy(4, "id").sortBy("id").option("path", s"$wh/bucket_b").saveAsTable("bucket_b")
      val joined = spark.table("bucket_a").join(spark.table("bucket_b"), "id")
      assert(shuffles(joined) == 0, joined.queryExecution.executedPlan.toString)
      assert(joined.count() == 1000)
    }
  }

  test("q74's bucketedJoin: zero Exchange with broadcast disabled (bucket co-location, not small-side luck)") {
    val df = LayoutOps.bucketedJoin(spark, "/root/testdata/sf0.001", adaptive = false)
    assert(shuffles(df) == 0, df.queryExecution.executedPlan.toString)
    assert(broadcasts(df) == 0, df.queryExecution.executedPlan.toString)
    assert(df.count() > 0)
  }

  test("d83 probe: the corpus scans ONCE (the tf side) — df and N come from at-rest ledger scans") {
    withStaticPlans {
      // the operator's whole point is that the corpus-wide df/N pass
      // lives at rest: if the probe's plan ever scans the documents
      // file more than once, it is re-deriving what the ledgers hold
      import graft.operators.{CurationOps, SketchOps, TextOps}
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val base = java.nio.file.Files.createTempDirectory("graft-tfidfplan").toString
      val dtok = array_distinct(TextOps.tokens(col("text")))
      SketchOps.writeVocabLedger(docs.withColumn("c", lit("all")), "c", dtok,
        base + "/df", tokenizerId = "ws-distinct")
      CurationOps.writeStatsLedger(docs, "source", "text", base + "/stats")
      val probe = SketchOps.tfidfAgainstLedgers(
        docs.filter(col("doc_id") % 7 === 0), "doc_id",
        TextOps.tokens(col("text")), base + "/df", base + "/stats", k = 3)
      val scans = nodes(probe) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.relation.location.rootPaths.map(_.toString).mkString)
      assert(scans.count(_.contains("documents.parquet")) == 1,
        s"corpus must scan exactly once, got $scans")
      assert(scans.exists(_.contains("/df")) && scans.exists(_.contains("/stats")),
        s"df/N must come from the ledger scans, got $scans")
      // one window: the per-doc top-k, partitioned by the doc id
      // (doc-length-bounded — never the low-cardinality skew trap)
      assert(windows(probe) == 1, probe.queryExecution.executedPlan.toString)
      assert(probe.count() > 0)
    }
  }

  test("d90 LM probe: the batch scans once, c2/c1/V come from ledger scans — the corpus is never re-read") {
    withStaticPlans {
      import graft.operators.CurationOps
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val base = java.nio.file.Files.createTempDirectory("graft-lmplan").toString + "/lm"
      CurationOps.writeBigramLedger(docs, "text", base)
      val probe = CurationOps.bigramScoreFromLedger(
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", base)
      val scans = nodes(probe) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.relation.location.rootPaths.map(_.toString).mkString)
      assert(scans.count(_.contains("documents.parquet")) == 1,
        s"the probe batch must scan exactly once, got $scans")
      assert(scans.exists(_.contains("/lm")), scans.toString)
      assert(probe.count() > 0)
      // the interpolated scorer keeps the same contract
      val jm = CurationOps.bigramScoreInterpolated(
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", base)
      val jmScans = nodes(jm) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.relation.location.rootPaths.map(_.toString).mkString)
      assert(jmScans.count(_.contains("documents.parquet")) == 1, jmScans.toString)
      assert(jm.count() > 0)
      // ...and so does the Kneser-Ney scorer (d107): one batch scan,
      // every model table a ledger derivation
      val kn = CurationOps.bigramScoreKneserNey(
        docs.filter(col("doc_id") % 7 === 0), "doc_id", "text", base)
      val knScans = nodes(kn) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.relation.location.rootPaths.map(_.toString).mkString)
      assert(knScans.count(_.contains("documents.parquet")) == 1, knScans.toString)
      assert(knScans.exists(_.contains("/lm")), knScans.toString)
      assert(kn.count() > 0)
    }
  }

  test("d92 plan time: the mixture plan reads the stats ledger, never a corpus file") {
    withStaticPlans {
      import graft.operators.CurationOps
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val base = java.nio.file.Files.createTempDirectory("graft-mixplan").toString + "/st"
      CurationOps.writeStatsLedger(docs, "source", "text", base)
      val tok = LedgerGuard.readLedger(spark, base)
        .select(col("source"), col("n_tokens"))
        .withColumn("weight", lit(1.0))
      val plan = CurationOps.mixturePlan(tok, "source", "n_tokens", "weight",
        budgetTokens = 1000L, maxEpochs = 2.0)
      val scans = nodes(plan) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.relation.location.rootPaths.map(_.toString).mkString)
      assert(!scans.exists(_.contains("documents.parquet")),
        s"plan time must not touch the corpus, got $scans")
      assert(scans.exists(_.contains("/st")), scans.toString)
      assert(plan.count() > 0)
    }
  }

  test("d93 drift: the plan reads TWO ledger stores and never a corpus file") {
    withStaticPlans {
      import graft.operators.CurationOps
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val base = java.nio.file.Files.createTempDirectory("graft-driftplan").toString
      CurationOps.writeQuantileLedger(
        docs.select(col("source"), length(col("text")).cast("long").as("len")),
        "source", "len", 4, base + "/a")
      CurationOps.writeQuantileLedger(
        docs.select(col("source"),
          expr("length(replace(text, ' ', ''))").cast("long").as("len")),
        "source", "len", 4, base + "/b")
      val drift = CurationOps.histogramDrift(spark, base + "/a", base + "/b")
      val scans = nodes(drift) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.relation.location.rootPaths.map(_.toString).mkString)
      assert(!scans.exists(_.contains("documents.parquet")),
        s"drift time must not touch the corpus, got $scans")
      assert(scans.exists(_.contains("/a")) && scans.exists(_.contains("/b")), scans.toString)
      assert(drift.count() > 0)
    }
  }

  test("d97 probe: batch simhashes in ONE corpus scan; the corpus side is the ledger's columnar read") {
    withStaticPlans {
      import graft.operators.DedupOps
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      val base = java.nio.file.Files.createTempDirectory("graft-shplan").toString
      DedupOps.writeSimHashLedger(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", base + "/led")
      val probe = DedupOps.crossDedupAgainstSimHashes(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", base + "/led",
        maxHamming = 30)
      val scans = nodes(probe) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.map(_.relation.location.rootPaths.map(_.toString).mkString)
      // the batch side is lazily checkpointed inside hammingJoin, so
      // its scan-and-hash computes once no matter how many plan arms
      // consume it — at most one documents scan may survive in the plan
      assert(scans.count(_.contains("documents.parquet")) <= 1,
        s"the batch must scan at most once, got $scans")
      assert(scans.exists(_.contains("/led")), scans.toString)
      assert(probe.count() > 0)
    }
  }

  test("s14's at-rest SQ8 probe prunes columns: approx pass reads (id, q) only, re-rank reads (id, vec) only") {
    withStaticPlans {
      // the 4× scan-byte cut IS this pruning — if the approx scan ever
      // drags the float column along, SQ8-at-rest saves nothing
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val path = java.nio.file.Files.createTempDirectory("graft-sq8plan").toString + "/corpus"
      SimilarityOps.writeQuantizedCorpus(emb, "vec_id", "embedding", path)
      val probe = SimilarityOps.quantizedTopKAtRest(spark, path,
        emb.filter(col("vec_id") < 4), "vec_id", "embedding", "vec_id", k = 3)
      val scans = nodes(probe) {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("sq8plan")) => s
        }.map(_.requiredSchema.fieldNames.toSet)
      assert(scans.size == 2, s"expected 2 corpus scans, got $scans")
      assert(scans.exists(s => s.contains("q") && !s.contains("vec")),
        s"approx scan not pruned to codes: $scans")
      assert(scans.exists(s => s.contains("vec") && !s.contains("q")),
        s"re-rank scan not pruned to floats: $scans")
      assert(probe.count() > 0)
    }
  }

  test("s16's at-rest MRL probe prunes columns: approx pass reads (id, prefix) only, re-rank (id, vec) only") {
    withStaticPlans {
      // the dim/prefixDim× scan-byte cut IS this pruning — if the approx
      // scan ever drags the full vector along, the prefix column buys nothing
      val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      val path = java.nio.file.Files.createTempDirectory("graft-mrlplan").toString + "/corpus"
      SimilarityOps.writeMatryoshkaCorpus(emb, "vec_id", "embedding", prefixDim = 16, path)
      val probe = SimilarityOps.matryoshkaTopKAtRest(spark, path,
        emb.filter(col("vec_id") < 4), "vec_id", "embedding", "vec_id",
        k = 3, prefixDim = 16)
      val scans = nodes(probe) {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("mrlplan")) => s
        }.map(_.requiredSchema.fieldNames.toSet)
      assert(scans.size == 2, s"expected 2 corpus scans, got $scans")
      assert(scans.exists(s => s.contains("prefix") && !s.contains("vec")),
        s"approx scan not pruned to the prefix column: $scans")
      assert(scans.exists(s => s.contains("vec") && !s.contains("prefix")),
        s"re-rank scan not pruned to floats: $scans")
      assert(probe.count() > 0)
    }
  }

  test("frameSignatures is a pure scan (zero shuffles) and no m06 exchange carries payload bytes") {
    withStaticPlans {
      val vids = docs.withColumn("__bin", col("text").cast("binary"))
      // the per-payload signature is one per-row kernel: the r9 form's
      // explode + corpus-wide groupBy (1 shuffle, binary row-amplified)
      // is gone — payload bytes provably never leave the scan partition
      val sigs = MultimodalOps.frameSignatures(vids, "doc_id", "__bin", 8, 2)
      assert(shuffles(sigs) == 0, sigs.queryExecution.executedPlan.toString)
      assert(windows(sigs) == 0)
      // and in the full pair plan, no exchange (shuffle or broadcast)
      // moves a BinaryType column — only hashes and id lists shuffle
      val pairs = MultimodalOps.frameDedupPairs(vids, "doc_id", "__bin", 8, 2, 0.5)
      val exchanges = nodes(pairs) {
        case e: ShuffleExchangeExec => e: SparkPlan
        case e: BroadcastExchangeExec => e: SparkPlan
      }
      // aggregate partial buffers are BinaryType too ("buf") — the gate
      // targets PAYLOAD bytes: the input binary column (by name) or any
      // other non-buffer binary attribute
      val leaky = exchanges.filter(_.output.exists(a =>
        a.name == "__bin" ||
          (a.dataType == org.apache.spark.sql.types.BinaryType && a.name != "buf")))
      assert(leaky.isEmpty, s"payload bytes cross an exchange: $leaky")
    }
  }

  test("frame-ledger probe reads (id, n, fh) only — never a corpus payload") {
    withStaticPlans {
      val vids = docs.withColumn("__bin", col("text").cast("binary"))
      val dir = java.nio.file.Files.createTempDirectory("frplan").toString + "/led"
      MultimodalOps.writeFrameLedger(vids.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "__bin", 8, 2, dir)
      val probe = MultimodalOps.frameDedupAgainstLedger(
        vids.filter(col("doc_id") % 10 === 0), "doc_id", "__bin", dir, 8, 2, 0.0)
      val ledgerScans = nodes(probe) {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("frplan")) => s
        }.map(_.requiredSchema.fieldNames.toSet)
      assert(ledgerScans.nonEmpty, "probe plan has no ledger scan")
      ledgerScans.foreach(s => assert(s.subsetOf(Set("doc_id", "n", "fh")),
        s"ledger scan reads unexpected columns: $s"))
      // the only binary-bearing scan is the BATCH side's own input
      val binScans = nodes(probe) {
          case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.requiredSchema.exists(_.dataType ==
              org.apache.spark.sql.types.BinaryType) => s
        }
      assert(binScans.isEmpty, // batch binary comes from a cast projection, not a scan
        s"a file scan reads binary payloads: $binScans")
      assert(probe.count() > 0)
    }
  }

  test("partitionedRanks: every window partitions by the slice id — never by the skew key alone") {
    withStaticPlans {
      import spark.implicits._
      val df = (1 to 1000).map(i => ("F" + (i % 3), i % 5, i)).toDF("flag", "qty", "ln")
      // the checkpoint hides the ranking fragment from the OUTPUT plan,
      // so gate the fragment itself: every WindowExec must include the
      // slice id in its partition spec — no window ever clusters on the
      // low-cardinality key alone (the skew trap the operator avoids)
      val frag = WindowRankOps.slicedLocalRanks(df, Seq("flag"),
        Seq(("qty", false), ("ln", true)), np = 4)
      val wins = nodes(frag) { case w: WindowExec => w }
      assert(wins.nonEmpty, "fragment plan lost its window")
      wins.foreach { w =>
        assert(w.partitionSpec.exists(_.references.exists(_.name == "__pid")),
          s"window clustered without the slice id: ${w.partitionSpec}")
      }
      // and the full operator still returns every row
      val ranked = WindowRankOps.partitionedRanks(df, Seq("flag"),
        Seq(("qty", false), ("ln", true)), ntileN = 4)
      assert(ranked.count() == 1000)
      // same gate with the reverse rank on (distribution windows)
      val fragR = WindowRankOps.slicedLocalRanks(df, Seq("flag"),
        Seq(("qty", false), ("ln", true)), np = 4, withReverse = true)
      val winsR = nodes(fragR) { case w: WindowExec => w }
      assert(winsR.size >= 2, "reverse fragment should add a second window")
      winsR.foreach { w =>
        assert(w.partitionSpec.exists(_.references.exists(_.name == "__pid")),
          s"window clustered without the slice id: ${w.partitionSpec}")
      }
      // same gate for the shift fragment (lag/lead)
      val shiftFrag = WindowRankOps.slicedLocalShift(df, Seq("flag"),
        Seq(("ln", true)), Seq("qty"), k = 2, np = 4)
      val shiftWins = nodes(shiftFrag) { case w: WindowExec => w }
      assert(shiftWins.nonEmpty, "shift fragment plan lost its windows")
      shiftWins.foreach { w =>
        assert(w.partitionSpec.exists(_.references.exists(_.name == "__pid")),
          s"shift window clustered without the slice id: ${w.partitionSpec}")
      }
      // same gate for the running-aggregate fragment
      val runFrag = WindowRankOps.slicedLocalRunning(
        df.withColumn("cents", col("ln").cast("long")),
        Seq("flag"), Seq(("ln", true)), "cents", movingK = 3, np = 4)
      val runWins = nodes(runFrag) { case w: WindowExec => w }
      assert(runWins.nonEmpty, "running fragment plan lost its windows")
      runWins.foreach { w =>
        assert(w.partitionSpec.exists(_.references.exists(_.name == "__pid")),
          s"running window clustered without the slice id: ${w.partitionSpec}")
      }
    }
  }

  test("registrableDomains: rules meet hosts in a broadcast hash join (no shuffle of the rule side)") {
    withStaticPlans {
      import spark.implicits._
      val rules = Seq("com", "example.com", "*.ck", "!www.ck").toDF("rule")
      val hosts = docs.select(concat(lit("h"), col("doc_id") % 100, lit(".example.com")).as("host"))
      val df = DomainOps.registrableDomains(hosts, "host", rules)
      val bhj = nodes(df) {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j }
      val bnlj = nodes(df) {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j }
      assert(bhj.size == 1, s"rule join must be a broadcast hash join:\n${df.queryExecution.executedPlan}")
      assert(bnlj.isEmpty, "rule join fell to a nested loop")
      // distinct-host collapse + prevailing-rule agg: shuffles bound by
      // the distinct-host table, never the corpus row count
      assert(shuffles(df) <= 2, df.queryExecution.executedPlan.toString)
    }
  }

  test("knnLabelAgreement: zero windows; the corpus label pass reads a pruned 2-column projection and never shuffles") {
    withStaticPlans {
      val df = SimilarityOps.knnLabelAgreement(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding", "label",
        emb, "vec_id", "embedding", "label", k = 5)
      val plan = df.queryExecution.executedPlan.toString
      assert(windows(df) == 0, plan)
      // the label side of the plan must scan only (vec_id, label) — the
      // vector column is pruned off the second corpus pass
      assert(plan.contains("ReadSchema: struct<vec_id:bigint,label:int>"), plan)
      // shuffles: only the two model-sized aggregations (top-k partials
      // + the per-anchor agreement agg); the corpus joins are broadcast
      assert(shuffles(df) <= 2, plan)
      assert(broadcasts(df) >= 2, plan)
    }
  }

  test("marginBitextMine: zero windows — both directional passes rank through the bounded heap, the margin algebra is broadcast-joined") {
    withStaticPlans {
      val df = SimilarityOps.marginBitextMine(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb.filter(col("vec_id") >= 8 && col("vec_id") < 20), "vec_id", "embedding",
        k = 3)
      val plan = df.queryExecution.executedPlan.toString
      assert(windows(df) == 0, plan)
      assert(broadcasts(df) >= 3, plan) // 2 directional + avg/score re-joins
    }
  }

  test("sourceUnigramJsd: the corpus text scans for tokenization only — every join above it is vocab- or group-sized") {
    withStaticPlans {
      val df = CurationOps.sourceUnigramJsd(docs, "source", "text")
      val plan = df.queryExecution.executedPlan.toString
      assert(windows(df) == 0, plan)
      // the token-probability divide joins group totals via BROADCAST
      // (model-sized: one row per group)
      assert(broadcasts(df) >= 1, plan)
    }
  }

  test("graft-avro pruned scan: a projection's scan node carries only the required columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avroplan").toString + "/t"
    docs.select(col("doc_id"), col("lang"), col("source")).limit(10)
      .write.format("graft-avro").mode("overwrite").save(dir)
    val one = spark.read.format("graft-avro").load(dir).select("lang")
    val leaf = one.queryExecution.executedPlan.collectLeaves().head
    assert(leaf.schema.fieldNames.toSeq == Seq("lang"), leaf.schema)
    assert(leaf.toString.contains("ReadSchema: lang"), leaf.toString)
  }

  test("cdcChunks is a pure per-row scan (zero shuffles, zero windows) and plans ONE kernel call") {
    withStaticPlans {
      val df = docs.select(col("doc_id"),
        explode(TextOps.cdcChunks(col("text"))).as("c"))
      assert(shuffles(df) == 0, df.queryExecution.executedPlan.toString)
      assert(windows(df) == 0)
      // one fused kernel call in the plan — not a sequence/transform/
      // filter HOF chain (those evaluate interpreted)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.toLowerCase.contains("cdcchunks"), plan)
      assert(!plan.contains("transform("), plan)
    }
  }

  test("license gate (d111) is a pure per-row scan: zero shuffles, zero windows") {
    withStaticPlans {
      val df = docs.select(col("doc_id"),
        TextOps.spdxTags(col("text")).as("spdx"),
        TextOps.licenseClass(col("text")).as("license_class"),
        TextOps.licenseGate(col("text")).as("allowed"))
      assert(shuffles(df) == 0, df.queryExecution.executedPlan.toString)
      assert(windows(df) == 0)
    }
  }

  test("ANN decision relation (s04): the 1-row verdict joins via broadcast NLJ — no CartesianProduct anywhere") {
    // the r16 graduation wrapper crossJoins a single aggregated verdict
    // row back onto the exact side; this gate pins that it stays a
    // broadcast nested-loop (model-sized build) and that no
    // un-broadcast cartesian can sneak into the shape at scale
    val df = graft.SparkEntry.queries("s04_ivf_topk")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("dumpSorted queries carry NO range-sampling exchange; corpus dumps and q01 keep the parallel global sort") {
    withStaticPlans {
      // the r17 job diet: model-sized conformance dumps end in
      // repartition(1) + in-partition sort (one round-robin exchange,
      // no range-boundary sampling job). Representatives across the
      // converted families — an OLAP agg, a ledger cycle's readout
      // shape, a sweep — must plan ZERO range exchanges...
      def rangeExchanges(df: DataFrame): Int =
        nodes(df) { case e: ShuffleExchangeExec
          if e.outputPartitioning.isInstanceOf[
            org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] => e }.size
      Seq("q08_distinct_agg", "q42_weighted_avg", "d16_length_histogram")
        .foreach { n =>
          val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
          assert(rangeExchanges(df) == 0,
            s"$n plans a range exchange:\n" + df.queryExecution.executedPlan)
        }
      // ...while q01 (the bench's fixed calm anchor — plan must never
      // change) and a corpus-proportional dump (parallel sort is the
      // scale-correct choice there) still plan exactly one
      Seq("q01_pricing_summary", "d01_text_stats").foreach { n =>
        val df = graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        assert(rangeExchanges(df) == 1,
          s"$n lost its global sort:\n" + df.queryExecution.executedPlan)
      }
    }
  }
}
