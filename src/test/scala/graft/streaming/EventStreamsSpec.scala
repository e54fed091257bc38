package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming transforms driven synchronously over the `events` fixture
  * (file source + memory sink + processAllAvailable), checked against
  * their batch equivalents — same semantics, unbounded plan.
  */
class EventStreamsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // the file stream source needs a DIRECTORY of files
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    dir
  }
  private val eventsPath = "/root/testdata/sf0.001/events.parquet"

  // normalize ts to a session-zone (UTC) TIMESTAMP whichever encoding
  // the fixture generation used — LONG nanos (nanosAsLong) or
  // TIMESTAMP_NTZ micros — mirroring Registry.table
  private def normTs(df: org.apache.spark.sql.DataFrame) =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  private def streamingEvents() = {
    val raw = spark.read.parquet(eventsPath)
    normTs(spark.readStream.schema(raw.schema).parquet(eventsDir))
  }

  private def batchEvents() =
    normTs(spark.read.parquet(eventsPath))

  test("streaming hourly counts equal the batch aggregation") {
    val q = EventStreams.hourlyTypeCounts(streamingEvents())
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out")
      .start()
    try {
      graft.StreamTestGuard.drain(q)
      val streamed = spark.sql("SELECT hour_start, event_type, n FROM hourly_out")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = batchEvents()
        .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("curation kernels run unchanged on a stream (stream == batch results)") {
    // the per-row curation kernels (repetition stats, PII scrub, quality)
    // are stateless Column expressions, so the same code path serves
    // readStream without modification — the stream/batch unification the
    // engine promises for scoring pipelines.
    val docsPath = "/root/testdata/sf0.001/documents.parquet"
    val docsDir = java.nio.file.Files.createTempDirectory("graft-docs-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(docsPath),
      java.nio.file.Paths.get(docsDir, "documents.parquet"))
    val raw = spark.read.parquet(docsPath)
    def score(df: org.apache.spark.sql.DataFrame) = {
      val st = graft.functions.NgramExpressions.repetitionStats(col("text"))
      df.select(col("doc_id"), st.getField("n_tokens").as("n_tokens"),
        st.getField("n_unique").as("n_unique"),
        graft.operators.CurationOps.piiScrub(col("text")).as("scrubbed"),
        graft.operators.CurationOps.splitAssign(col("doc_id"),
          Seq("train" -> 0.9, "test" -> 0.1)).as("split"),
        size(graft.operators.TextOps.chunkWithOverlap(col("text"), 32, 16))
          .as("n_chunks"))
    }
    val q = score(spark.readStream.schema(raw.schema).parquet(docsDir))
      .writeStream.outputMode("append")
      .format("memory").queryName("curation_out")
      .start()
    try {
      graft.StreamTestGuard.drain(q)
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3), r.getString(4), r.getInt(5))
      val streamed = spark.sql("SELECT * FROM curation_out").collect().map(key).toSet
      val batch = score(raw).collect().map(key).toSet
      assert(streamed == batch)
      assert(streamed.size == 500)
    } finally q.stop()
  }

  test("mapGroupsWithState running totals equal batch per-user totals") {
    import spark.implicits._
    val evts = batchEvents()
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[EventStreams.Evt]
    // drive the stateful op through a streaming plan over the same file
    val stream = streamingEvents()
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[EventStreams.Evt]
    val q = EventStreams.runningUserTotals(stream)
      .writeStream.outputMode("update")
      .format("memory").queryName("totals_out")
      .start()
    try {
      graft.StreamTestGuard.drain(q)
      val streamed = spark.sql(
        """SELECT user_id, max_by(n_events, n_events) AS n
          |FROM totals_out GROUP BY user_id""".stripMargin)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = evts.groupByKey(_.user_id).count().collect().toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join") {
    val q = EventStreams.clickPurchaseJoin(streamingEvents())
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out")
      .start()
    try {
      graft.StreamTestGuard.drain(q)
      val streamed = spark.sql("SELECT purchase_id, click_id FROM ssjoin_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch equivalent: same predicate as a plain join
      val ev = batchEvents()
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
          col("event_id").as("purchase_id"))
      val batch = purchases.join(clicks,
          col("p_user") === col("user_id") &&
            col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
            col("click_ts") <= col("purchase_ts"))
        .select(col("purchase_id"), col("click_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup keeps one row per content fingerprint") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val evts = Seq(
      EventStreams.Evt(1L, ts(0), "click", 1.0),
      EventStreams.Evt(1L, ts(1), "click", 1.0),  // dup content (user+type+value)
      EventStreams.Evt(1L, ts(2), "view", 1.0),
      EventStreams.Evt(2L, ts(3), "click", 1.0),
      EventStreams.Evt(2L, ts(4), "click", 1.0))  // dup
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Evt](
      spark)
    stream.addData(evts)
    val q = EventStreams.streamingDedup(stream.toDS().toDF(),
        Seq("user_id", "event_type", "value"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      graft.StreamTestGuard.drain(q)
      val kept = spark.sql("SELECT user_id, event_type FROM dedup_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(kept == Seq((1L, "click"), (1L, "view"), (2L, "click")))
    } finally q.stop()
  }

  test("streaming dedup against the batch ledger drops admitted content, then dedups within the stream") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    // the BATCH corpus admits (1, click, 1.0) and (9, view, 2.0)
    val path = java.nio.file.Files.createTempDirectory("graft-sled").toString + "/led"
    val admitted = Seq(
      EventStreams.Evt(1L, ts(0), "click", 1.0),
      EventStreams.Evt(9L, ts(0), "view", 2.0)).toDF()
      .withColumn("fp_id", monotonically_increasing_id())
    graft.operators.DedupOps.writeLedger(admitted, "fp_id",
      Seq("user_id", "event_type", "value"), path)
    // the stream re-sends an admitted row, a new row twice, and a new row
    val evts = Seq(
      EventStreams.Evt(1L, ts(1), "click", 1.0),  // in ledger → dropped
      EventStreams.Evt(2L, ts(2), "click", 1.0),  // new, first wins
      EventStreams.Evt(2L, ts(3), "click", 1.0),  // in-stream dup
      EventStreams.Evt(3L, ts(4), "view", 5.0))   // new
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Evt](
      spark)
    stream.addData(evts)
    val q = EventStreams.streamingDedupAgainstLedger(stream.toDS().toDF(),
        Seq("user_id", "event_type", "value"), path)
      .writeStream.outputMode("append")
      .format("memory").queryName("sled_out")
      .start()
    try {
      graft.StreamTestGuard.drain(q)
      val kept = spark.sql("SELECT user_id, event_type FROM sled_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
      assert(kept == Seq((2L, "click"), (3L, "view")))
    } finally q.stop()
  }

  test("streaming sessionize agrees with q61's batch sessionization on the real fixture") {
    import spark.implicits._
    // batch truth: q61's exact plan (2h gap) over the events fixture
    val batch = graft.SparkEntry.queries("q61_sessionization")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    // streaming emits only CLOSED sessions — each user's LAST batch
    // session stays open in state, so drop it from the expectation
    val expected = batch.groupBy(_._1).toSeq.flatMap { case (_, ss) =>
      ss.sortBy(_._2).dropRight(1)
    }.map(s => (s._1, s._3)).sorted // (user_id, n_events)
    // truncate to whole seconds: the batch form compares floor-second
    // differences (ts cast to long), the streaming one exact millis —
    // aligning the inputs makes the gap boundaries bit-comparable
    val evts = batchEvents()
      .select(col("user_id"),
        expr("timestamp_seconds(cast(ts as long))").as("ts"),
        col("event_type"), col("value"))
      .as[EventStreams.Evt].collect().toSeq
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Evt](
      spark)
    stream.addData(evts)
    val q = EventStreams.sessionize(stream.toDS(), gapMinutes = 120)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_vs_batch")
      .start()
    try {
      graft.StreamTestGuard.drain(q)
      val got = spark.sql("SELECT user_id, CAST(n_events AS BIGINT) FROM sessions_vs_batch")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(got == expected,
        s"streaming closed ${got.size} sessions, batch (minus open) expects ${expected.size}")
    } finally q.stop()
  }

  test("the batch-trained quality classifier scores a stream (streaming inference)") {
    import spark.implicits._
    val docsPath = "/root/testdata/sf0.001/documents.parquet"
    val docs = spark.read.parquet(docsPath)
    val feats = graft.operators.MlOps.featureFrame(docs, "doc_id", "text")
    val model = graft.operators.MlOps.trainQuality(feats)
    val batchScores = graft.operators.MlOps.scoreWith(model, feats, "doc_id")
      .select("doc_id", "p_good")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // same documents arriving as a stream, scored by the SAME model
    val dir = java.nio.file.Files.createTempDirectory("docs-stream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(docsPath), java.nio.file.Paths.get(dir, "part.parquet"))
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val q = graft.operators.MlOps.scoreWith(model,
        graft.operators.MlOps.featureFrame(stream, "doc_id", "text"), "doc_id")
      .select("doc_id", "p_good")
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_scores")
      .start()
    try {
      graft.StreamTestGuard.drain(q)
      val got = spark.sql("SELECT doc_id, p_good FROM stream_scores")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == batchScores.keySet)
      got.foreach { case (k, v) => assert(v == batchScores(k), s"doc $k: $v != ${batchScores(k)}") }
    } finally q.stop()
  }

  test("sessionize closeIdleSessions: an idle user's final session flushes via the processing-time timeout") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Evt](
      spark)
    stream.addData(Seq(
      EventStreams.Evt(7L, ts(0), "click", 1.0),
      EventStreams.Evt(7L, ts(0), "view", 1.0))) // same ts: one open session, n=2
    // gap 0 ⇒ the registered timeout is the 1 ms floor: the flush fires
    // on the engine's next timeout-evaluation batch. No
    // processAllAvailable here — registered processing-time timeouts
    // keep the engine running batches, so the test POLLS the sink.
    val q = EventStreams.sessionize(stream.toDS(), gapMinutes = 0,
        closeIdleSessions = true)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_idle_out")
      .start()
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var rows = Array.empty[(Long, Int)]
      while (rows.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(100)
        rows = spark.sql("SELECT user_id, n_events FROM sessions_idle_out")
          .collect().map(r => (r.getLong(0), r.getInt(1)))
      }
      assert(rows.toSeq == Seq((7L, 2)),
        s"idle session not flushed within 30 s: ${rows.toSeq}")
    } finally q.stop()
  }

  test("sessionizer closes sessions on gap within a batch") {
    import spark.implicits._
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val evts = Seq(
      EventStreams.Evt(1L, ts(0), "click", 1.0),
      EventStreams.Evt(1L, ts(5), "view", 1.0),
      EventStreams.Evt(1L, ts(60), "click", 1.0), // new session after 55m gap
      EventStreams.Evt(2L, ts(2), "view", 1.0))
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[EventStreams.Evt](
      spark)
    stream.addData(evts)
    val q = EventStreams.sessionize(stream.toDS(), gapMinutes = 30)
      .writeStream.outputMode("append")
      .format("memory").queryName("sessions_out")
      .start()
    try {
      graft.StreamTestGuard.drain(q)
      val sessions = spark.sql("SELECT user_id, n_events FROM sessions_out")
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      // user 1's first session (2 events) closed by the 60m event;
      // open sessions (user1 second, user2) remain in state
      assert(sessions == Seq((1L, 2)))
    } finally q.stop()
  }

  test("streaming semantic decontamination: per-microbatch scoring equals the batch pass") {
    import spark.implicits._
    // the streaming face of d49: contamination is per-document against
    // a FIXED broadcast benchmark, so scoring a stream is the same
    // operator applied per micro-batch (each document lives in exactly
    // one batch — no cross-batch state)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bench = emb.filter(col("vec_id") % 50 === 0)
    val corpus = emb.filter(col("vec_id") % 50 =!= 0)
    val rows = corpus.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val out = scala.collection.mutable.Set[(Long, Long, Double)]()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Array[Float])](
      spark)
    val q = stream.toDS().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        out.synchronized {
          out ++= graft.operators.CurationOps.semanticDecontamination(
            batch, "vec_id", "embedding", bench, "vec_id", "embedding", 0.3)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        }
        ()
      }
      .start()
    try {
      stream.addData(rows.take(200).toSeq); graft.StreamTestGuard.drain(q)
      stream.addData(rows.drop(200).toSeq); graft.StreamTestGuard.drain(q)
      val batchResult = graft.operators.CurationOps.semanticDecontamination(
        corpus, "vec_id", "embedding", bench, "vec_id", "embedding", 0.3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(out.toSet == batchResult && batchResult.nonEmpty,
        s"stream=${out.size} batch=${batchResult.size}")
    } finally q.stop()
  }

  test("streaming stats-ledger maintenance: per-microbatch merges equal the batch recompute") {
    import spark.implicits._
    // the streaming face of d41: each micro-batch folds its delta into
    // the at-rest per-source stats via foreachBatch — generation dirs so
    // a merge never overwrites the ledger it is lazily reading
    val base = java.nio.file.Files.createTempDirectory("graft-stled").toString
    def genPath(g: Int) = s"$base/g$g"
    val seed = Seq(("s1", "a b c"), ("s1", "d e")).toDF("source", "text")
    val later = Seq(
      Seq(("s2", "x"), ("s2", "y z w")),
      Seq(("s3", "hello world"), ("s1", "f")))
    graft.operators.CurationOps.writeStatsLedger(seed, "source", "text", genPath(0))
    @volatile var gen = 0
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)](
      spark)
    val q = stream.toDS().toDF("source", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.CurationOps.mergeStatsLedger(batch, "source", "text", genPath(gen))
          .write.mode("overwrite").parquet(genPath(gen + 1))
        gen += 1
      }
      .start()
    try {
      later.foreach { b => stream.addData(b); graft.StreamTestGuard.drain(q) }
      val got = spark.read.parquet(genPath(gen))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val want = graft.operators.CurationOps.corpusStats(
          (Seq(("s1", "a b c"), ("s1", "d e")) ++ later.flatten).toDF("source", "text"),
          "source", "text")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == want, s"$got != $want")
    } finally q.stop()
  }

  test("streaming span-ledger maintenance: per-microbatch scrub+append matches the sequential batch replay") {
    import spark.implicits._
    // the streaming face of d58: each micro-batch is scrubbed against
    // the corpus-so-far (ledger-hit windows cut, fresh ones kept) and
    // then admits its own hashes — foreachBatch invocations are serial,
    // so batch i+1 sees exactly seed ∪ batches ≤ i, the same contract
    // the batch ingest loop has
    val path = java.nio.file.Files.createTempDirectory("graft-spanstream").toString + "/led"
    val seed = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    graft.operators.DedupOps.writeSpanHashLedger(seed, "doc_id", "text", k = 4, path)
    val later = Seq(
      Seq((10L, "x y a b c d e z")),     // hits the SEED's "a b c d e"
      Seq((20L, "q x y a b c d w")))     // hits windows admitted by BATCH 1
    val out = scala.collection.mutable.Map[Long, (String, Long)]()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      spark)
    val q = stream.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.persist() // scrub + append both consume it
        graft.operators.DedupOps.scrubAgainstSpanLedger(batch, "doc_id", "text", path)
          .collect().foreach(r => out(r.getLong(0)) = (r.getString(1), r.getLong(2)))
        graft.operators.DedupOps.appendToSpanHashLedger(batch, "doc_id", "text", k = 4, path)
        batch.unpersist()
        ()
      }
      .start()
    try {
      later.foreach { b => stream.addData(b); graft.StreamTestGuard.drain(q) }
      // batch 2's span comes from windows batch 1 admitted ("x y a b" …),
      // proving appends are visible to the next micro-batch
      assert(out.toMap == Map(
        10L -> (("x y z", 5L)),
        20L -> (("q w", 6L))), out.toString)
    } finally q.stop()
  }

  test("streaming frame-ledger ingest: per-microbatch appends equal one batch admission") {
    import spark.implicits._
    // the streaming face of m08: each micro-batch of video payloads is
    // admitted to the at-rest frame-signature ledger (hashed ONCE at
    // admission); a later probe sees the union of all batches exactly
    // as if they were admitted together.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val seed = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("__bin", col("text").cast("binary"))
    val rest = docs.filter(col("doc_id") % 3 =!= 0).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val incPath = java.nio.file.Files.createTempDirectory("graft-frstream").toString + "/fr"
    graft.operators.MultimodalOps.writeFrameLedger(seed, "doc_id", "__bin", 8, 2, incPath)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      spark)
    val q = stream.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.MultimodalOps.appendToFrameLedger(
          batch.withColumn("__bin", col("text").cast("binary")),
          "doc_id", "__bin", 8, 2, incPath)
      }
      .start()
    try {
      stream.addData(rest.take(30).toSeq); graft.StreamTestGuard.drain(q)
      stream.addData(rest.drop(30).toSeq); graft.StreamTestGuard.drain(q)
      val fullPath = java.nio.file.Files.createTempDirectory("graft-frfull").toString + "/fr"
      graft.operators.MultimodalOps.writeFrameLedger(
        docs.withColumn("__bin", col("text").cast("binary")),
        "doc_id", "__bin", 8, 2, fullPath)
      val probe = docs.filter(col("doc_id") < 20)
        .withColumn("__bin", col("text").cast("binary"))
      def pairs(p: String) = graft.operators.MultimodalOps
        .frameDedupAgainstLedger(probe, "doc_id", "__bin", p, 8, 2, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
      val inc = pairs(incPath)
      val full = pairs(fullPath)
      assert(inc == full && full.nonEmpty, s"inc=${inc.size} full=${full.size}")
    } finally q.stop()
  }

  test("streaming cluster-ledger maintenance: per-microbatch advances equal clustering everything at once") {
    import spark.implicits._
    // the streaming face of d66: each micro-batch folds into the
    // at-rest near-dup clustering (probe → label-lift → CC → remap);
    // foreachBatch invocations are serial, so batch i+1 probes exactly
    // seed ∪ batches ≤ i — the batch ingest loop's contract. Parity:
    // final assignments equal writeClusterLedger over the whole corpus.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val seed = docs.filter(col("doc_id") % 3 === 0)
    val rest = docs.filter(col("doc_id") % 3 =!= 0).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val incPath = java.nio.file.Files.createTempDirectory("graft-clstream").toString + "/cl"
    graft.operators.DedupOps.writeClusterLedger(seed, "doc_id", "text", incPath)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      spark)
    val q = stream.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.operators.DedupOps.advanceClusterLedger(batch, "doc_id", "text",
          incPath, batchId = Some(id.toString))
      }
      .start()
    try {
      stream.addData(rest.take(100).toSeq); graft.StreamTestGuard.drain(q)
      stream.addData(rest.drop(100).toSeq); graft.StreamTestGuard.drain(q)
      val fullPath = java.nio.file.Files.createTempDirectory("graft-clfull2").toString + "/cl"
      graft.operators.DedupOps.writeClusterLedger(docs, "doc_id", "text", fullPath)
      val inc = graft.operators.DedupOps.readClusterAssignments(spark, incPath)
        .as[(Long, Long)].collect().toSet
      val full = graft.operators.DedupOps.readClusterAssignments(spark, fullPath)
        .as[(Long, Long)].collect().toSet
      assert(inc == full && full.exists { case (n, l) => n != l },
        s"inc=${inc.size} full=${full.size}")
    } finally q.stop()
  }

  test("streaming sketch-ledger maintenance: per-microbatch advances track distinct content at rest") {
    import spark.implicits._
    // the streaming face of d46: each micro-batch folds its delta HLL
    // into the at-rest sketch ledger. Unlike the generation-dir stats
    // test above, this uses the IN-PLACE advance at a fixed path — the
    // natural fit for streaming, since foreachBatch invocations are
    // serial (the lease never contends) and monitoring readers want one
    // stable location. The streaming batchId rides through the advance's
    // exactly-once marker, so a crash-and-replay of a micro-batch is a
    // no-op instead of double-counting n_docs.
    val path = java.nio.file.Files.createTempDirectory("graft-skstream").toString + "/led"
    val seed = Seq(("s1", "a b"), ("s2", "d")).toDF("source", "text")
    val later = Seq(
      Seq(("s1", "a b"), ("s2", "q")), // "a b" re-seen: doc counted, distinct not
      Seq(("s3", "z"), ("s1", "w")))
    graft.operators.CurationOps.writeSketchLedger(seed, "source", col("text"), path)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)](
      spark)
    val q = stream.toDS().toDF("source", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.operators.CurationOps.advanceSketchLedger(batch, "source", col("text"), path,
          batchId = Some(id.toString))
      }
      .start()
    try {
      later.foreach { b => stream.addData(b); graft.StreamTestGuard.drain(q) }
      val got = graft.operators.CurationOps.sketchEstimates(spark, path)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // tiny cardinalities are exact in HLL's sparse mode
      assert(got == Map("s1" -> ((3L, 2L)), "s2" -> ((2L, 2L)), "s3" -> ((1L, 1L))),
        got.toString)
    } finally q.stop()
  }

  test("streaming KLL-ledger maintenance: per-microbatch advances equal one pass over everything ingested") {
    import spark.implicits._
    // the streaming face of d110: each micro-batch's per-key double-
    // measure sketches merge into the at-rest KLL ledger; the streaming
    // batchId rides the exactly-once marker so a replayed micro-batch
    // cannot double-merge (n would inflate — the same hazard the stats
    // ledger's marker closes). Parity: quantile estimates from the
    // composed at-rest state equal a single-pass sketch over the union
    // of everything ingested, EXACTLY — the deterministic no-RNG
    // collapse is what makes cross-path equality testable at all.
    val path = java.nio.file.Files.createTempDirectory("graft-kllstream").toString + "/led"
    def mk(rows: Seq[(String, Double)]) = rows.toDF("lang", "v")
    val seed = (1 to 40).map(i => ("en", i.toDouble)) ++
      (1 to 15).map(i => ("de", i * 2.0))
    val b1 = (41 to 60).map(i => ("en", i.toDouble))
    val b2 = (16 to 30).map(i => ("de", i * 2.0)) ++ Seq(("fr", 7.0))
    graft.operators.KllSketch.writeKllLedger(mk(seed), "lang", "v", k = 16, path = path)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Double)](
      spark)
    val q = stream.toDS().toDF("lang", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.operators.KllSketch.advanceKllLedger(batch, "lang", "v", 16, path,
          batchId = Some(id.toString))
      }
      .start()
    try {
      Seq(b1, b2).foreach { b => stream.addData(b); graft.StreamTestGuard.drain(q) }
      val atRest = graft.operators.KllSketch
        .quantilesFromKllLedger(spark, path, Seq(0.25, 0.5, 0.9, 1.0))
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> ((r.getDouble(2), r.getLong(3))))
        .toMap
      // n is exact per key (weight-exact collapses, no double-merge)
      assert(atRest(("en", 1.0))._2 == 60L && atRest(("de", 1.0))._2 == 30L &&
        atRest(("fr", 1.0))._2 == 1L, atRest.toString)
      // max is exact; medians land within the sketch's rank bound
      assert(atRest(("en", 1.0))._1 == 60.0 && atRest(("de", 1.0))._1 == 60.0)
      assert(math.abs(atRest(("en", 0.5))._1 - 30.0) <= 6.0, atRest(("en", 0.5)).toString)
      assert(atRest(("fr", 0.5))._1 == 7.0)
    } finally q.stop()
  }

  test("streaming sample-ledger maintenance: per-microbatch advances equal the one-shot bottom-k") {
    import spark.implicits._
    // the streaming face of d117: each micro-batch's own bottom-k merges
    // into the at-rest sample under the exactly-once marker. The
    // bottom-k sketch's merge property + hash priorities (no RNG) make
    // the parity EXACT: after any number of micro-batches the ledger IS
    // the one-shot sample of everything ingested.
    val path = java.nio.file.Files.createTempDirectory("graft-bkstream").toString + "/led"
    val seed = (0L until 100L).map(i => Tuple1(i))
    val b1 = (100L until 180L).map(i => Tuple1(i))
    val b2 = (180L until 250L).map(i => Tuple1(i))
    graft.operators.CurationOps.writeSampleLedger(
      seed.toDF("doc_id"), "doc_id", "s", 25, path)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Tuple1[Long]](spark)
    val q = stream.toDS().toDF("doc_id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.operators.CurationOps.advanceSampleLedger(batch, "doc_id", "s", 25,
          path, batchId = Some(id.toString))
      }
      .start()
    try {
      Seq(b1, b2).foreach { b => stream.addData(b); graft.StreamTestGuard.drain(q) }
      val atRest = graft.operators.LedgerGuard.readLedger(spark, path)
        .collect().map(_.getLong(0)).toSet
      val oneShot = graft.operators.CurationOps.bottomKSample(
        (0L until 250L).toDF("doc_id"), "doc_id", "s", 25)
        .collect().map(_.getLong(0)).toSet
      assert(atRest == oneShot && atRest.size == 25, s"$atRest != $oneShot")
    } finally q.stop()
  }

  test("streaming quantile-ledger maintenance: per-microbatch advances equal the from-scratch histogram") {
    import spark.implicits._
    // the streaming face of d78: each micro-batch folds its bucket
    // counts into the at-rest histogram (in-place advance at a fixed
    // path, streaming batchId as the exactly-once marker — the
    // sketch-ledger pattern above). Determinism makes the parity claim
    // exact: after any number of micro-batches the ledger equals the
    // from-scratch histogram of everything admitted, bit-for-bit.
    val path = java.nio.file.Files.createTempDirectory("graft-qhstream").toString + "/led"
    val seed = Seq(("s1", 10L), ("s2", 300L)).toDF("source", "len")
    val later = Seq(Seq(("s1", 17L), ("s2", 290L)), Seq(("s3", 64L), ("s1", 11L)))
    graft.operators.CurationOps.writeQuantileLedger(seed, "source", "len", 4, path)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)](
      spark)
    val q = stream.toDS().toDF("source", "len").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.operators.CurationOps.advanceQuantileLedger(batch, "source", "len", 4, path,
          batchId = Some(id.toString))
      }
      .start()
    try {
      later.foreach { b => stream.addData(b); graft.StreamTestGuard.drain(q) }
      val got = spark.read.parquet(path)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      val everything = seed.unionByName(later.flatten.toDF("source", "len"))
      val want = graft.operators.CurationOps.longHistogram(everything, "source", "len", 4)
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == want, s"$got != $want")
    } finally q.stop()
  }

  test("streaming vocab-ledger maintenance: per-microbatch advances equal the from-scratch counts") {
    import spark.implicits._
    // the streaming face of d79 — the quantile-ledger pattern above:
    // exact mergeable counts, so parity is bit-for-bit
    val path = java.nio.file.Files.createTempDirectory("graft-vcstream").toString + "/led"
    val seed = Seq(("en", "a b a"), ("de", "x")).toDF("lang", "text")
    val later = Seq(Seq(("en", "b c")), Seq(("fr", "z"), ("en", "a")))
    graft.operators.SketchOps.writeVocabLedger(seed, "lang",
      graft.operators.TextOps.tokens(col("text")), path)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, String)](
      spark)
    val q = stream.toDS().toDF("lang", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.operators.SketchOps.advanceVocabLedger(batch, "lang",
          graft.operators.TextOps.tokens(col("text")), path, batchId = Some(id.toString))
      }
      .start()
    try {
      later.foreach { b => stream.addData(b); graft.StreamTestGuard.drain(q) }
      val got = spark.read.parquet(path)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val everything = seed.unionByName(later.flatten.toDF("lang", "text"))
      val want = graft.operators.SketchOps.tokenCounts(everything, "lang",
          graft.operators.TextOps.tokens(col("text")))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == want, s"$got != $want")
    } finally q.stop()
  }

  test("streaming bigram-ledger maintenance: per-microbatch advances equal the from-scratch LM") {
    import spark.implicits._
    // the streaming face of d90 — the corpus language model advanced
    // per microbatch; counts are exact and mergeable, so both the
    // ledger rows AND a probe's scores are bit-for-bit the from-scratch
    // pass over everything admitted
    val path = java.nio.file.Files.createTempDirectory("graft-bgstream").toString + "/led"
    val seed = Seq((1L, "a b a b c"), (2L, "c a")).toDF("doc_id", "text")
    val later = Seq(Seq((3L, "b c a")), Seq((4L, "z"), (5L, "a b q")))
    graft.operators.CurationOps.writeBigramLedger(seed, "text", path)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      spark)
    val q = stream.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.operators.CurationOps.advanceBigramLedger(batch, "text", path,
          batchId = Some(id.toString))
      }
      .start()
    try {
      later.foreach { b => stream.addData(b); graft.StreamTestGuard.drain(q) }
      val everything = seed.unionByName(later.flatten.toDF("doc_id", "text"))
      val got = spark.read.parquet(path)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = graft.operators.CurationOps.bigramCounts(everything, "text")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == want, s"$got != $want")
      val atRest = graft.operators.CurationOps.bigramScoreFromLedger(
          everything, "doc_id", "text", path)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
      val scratch = graft.operators.CurationOps.bigramLmScore(
          everything, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
      assert(atRest.keySet == scratch.keySet &&
        atRest.forall { case (k, (n, s)) =>
          scratch(k)._1 == n && math.abs(scratch(k)._2 - s) < 1e-9 },
        s"$atRest != $scratch")
    } finally q.stop()
  }

  test("streaming simhash-ledger ingest: per-microbatch appends equal one batch admission") {
    import spark.implicits._
    // the streaming face of d97: each microbatch appends its (id,
    // simhash) rows; a probe against the accreted ledger equals one
    // against a single whole-corpus admission
    val root = java.nio.file.Files.createTempDirectory("graft-shstream").toString
    val (live, once) = (root + "/live", root + "/once")
    val seed = Seq((1L, "a b a b c"), (2L, "c a d e f")).toDF("doc_id", "text")
    val later = Seq(Seq((3L, "a b a b c x")), Seq((4L, "q r s t u"), (5L, "c a d e f")))
    graft.operators.DedupOps.writeSimHashLedger(seed, "doc_id", "text", live)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      spark)
    val q = stream.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.operators.DedupOps.appendToSimHashLedger(batch, "doc_id", "text", live)
      }
      .start()
    try {
      later.foreach { b => stream.addData(b); graft.StreamTestGuard.drain(q) }
      graft.operators.DedupOps.writeSimHashLedger(
        seed.unionByName(later.flatten.toDF("doc_id", "text")), "doc_id", "text", once)
      val probe = Seq((100L, "a b a b c"), (101L, "q r s t u")).toDF("doc_id", "text")
      def pairs(p: String): Set[(Long, Long, Int)] =
        graft.operators.DedupOps.crossDedupAgainstSimHashes(
            probe, "doc_id", "text", p, maxHamming = 10)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(pairs(live) == pairs(once) && pairs(once).nonEmpty,
        s"${pairs(live)} != ${pairs(once)}")
    } finally q.stop()
  }

  test("streaming audio-fp-ledger ingest: per-microbatch appends equal one batch admission") {
    import spark.implicits._
    import graft.operators.MultimodalOps
    // the streaming face of m13: each microbatch decodes + fingerprints
    // its payloads once and appends (id, afp); a probe against the
    // accreted ledger equals one against a single whole-corpus admission
    val root = java.nio.file.Files.createTempDirectory("graft-afpstream").toString
    val (live, once) = (root + "/live", root + "/once")
    def wav(id: Long): Array[Byte] =
      if (id % 2 == 0) MultimodalOps.syntheticToneWav(id % 4, 8000, 4096)
      else MultimodalOps.syntheticToneWavNear(id % 4, 8000, 4096)
    def df(ids: Seq[Long]) = ids.map(i => (i, wav(i))).toDF("id", "wav")
    val seedIds = Seq(1L, 2L)
    val laterBatches = Seq(Seq(3L, 4L), Seq(5L, 6L, 7L))
    MultimodalOps.writeAudioFpLedger(df(seedIds), "id", "wav", live)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long](spark)
    val q = stream.toDS().toDF("id").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val wavUdf = udf((i: Long) => wav(i))
        MultimodalOps.appendToAudioFpLedger(
          batch.withColumn("wav", wavUdf(col("id"))), "id", "wav", live)
      }
      .start()
    try {
      laterBatches.foreach { b => stream.addData(b); graft.StreamTestGuard.drain(q) }
      MultimodalOps.writeAudioFpLedger(
        df(seedIds ++ laterBatches.flatten), "id", "wav", once)
      val probe = df(Seq(100L, 101L, 102L))
      def pairs(p: String): Set[(Long, Long, Int)] =
        MultimodalOps.audioNearDupAgainstLedger(probe, "id", "wav", p, maxHamming = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(pairs(live) == pairs(once) && pairs(once).nonEmpty,
        s"${pairs(live)} != ${pairs(once)}")
    } finally q.stop()
  }

  test("streaming drift monitor: per-microbatch quantile-ledger advances give the from-scratch drift vs a reference") {
    import spark.implicits._
    // the streaming face of d93: the live ingest window's histogram
    // advances per microbatch; after each batch the drift vs a static
    // reference ledger equals the from-scratch comparison over
    // everything admitted — the monitoring loop never re-reads data
    val root = java.nio.file.Files.createTempDirectory("graft-driftstream").toString
    val (live, ref) = (root + "/live", root + "/ref")
    val refRows = Seq(("k", 0L), ("k", 16L), ("k", 33L), ("k", 48L)).toDF("src", "v")
    graft.operators.CurationOps.writeQuantileLedger(refRows, "src", "v", 4, ref)
    val seed = Seq(("k", 0L), ("k", 17L)).toDF("src", "v")
    graft.operators.CurationOps.writeQuantileLedger(seed, "src", "v", 4, live)
    val later = Seq(Seq(("k", 34L)), Seq(("k", 49L), ("k", 3L)))
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)](
      spark)
    val q = stream.toDS().toDF("src", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.operators.CurationOps.advanceQuantileLedger(batch, "src", "v", 4,
          live, batchId = Some(id.toString))
      }
      .start()
    try {
      later.foreach { b => stream.addData(b); graft.StreamTestGuard.drain(q) }
      def driftRow(a: String): (Long, Long, Double, Double) =
        graft.operators.CurationOps.histogramDrift(spark, a, ref)
          .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
            r.getDouble(4))).head
      val scratch = root + "/scratch"
      graft.operators.CurationOps.writeQuantileLedger(
        seed.unionByName(later.flatten.toDF("src", "v")), "src", "v", 4, scratch)
      assert(driftRow(live) == driftRow(scratch),
        s"${driftRow(live)} != ${driftRow(scratch)}")
    } finally q.stop()
  }

  test("streaming threshold sweep: summed per-microbatch bucket counts re-derive the batch curve") {
    import spark.implicits._
    import graft.operators.{MlOps, TextOps}
    // the streaming face of d63: per-bucket (pos, neg) counts are
    // ADDITIVE, so the ingest loop maintains them incrementally (the
    // d41 stats-ledger regime) and sweepFromBuckets re-derives the
    // whole operating-point curve from the ≤101-row count table — the
    // corpus is never rescanned. Parity: accumulate each micro-batch's
    // bucket counts, sweep the sum, compare row-for-row to the one-shot
    // batch sweep over the union.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def scored(df: org.apache.spark.sql.DataFrame) = df.select(
      TextOps.qualityScore(col("text")).as("__score"),
      (TextOps.stopwordCount(col("text")) >= 2).cast("int").as("__lab"))
    val acc = scala.collection.mutable.ArrayBuffer[(Double, Long, Long)]()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](
      spark)
    val q = stream.toDS().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val counts = scored(batch)
          .groupBy(graft.queries.Qf.dround(col("__score"), 2).as("thr"))
          .agg(sum(col("__lab").cast("long")).as("__pos"),
            (count(lit(1)) - sum(col("__lab").cast("long"))).as("__neg"))
          .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
        acc.synchronized { acc ++= counts }
        ()
      }
      .start()
    try {
      stream.addData(docs.take(40).toSeq); graft.StreamTestGuard.drain(q)
      stream.addData(docs.slice(40, 70).toSeq); graft.StreamTestGuard.drain(q)
      stream.addData(docs.drop(70).toSeq); graft.StreamTestGuard.drain(q)
      val fromStream = MlOps.sweepFromBuckets(
        acc.toSeq.toDF("thr", "__pos", "__neg"))
        .orderBy(col("thr").desc)
        .as[(Double, Long, Long, Long, Double, Double, Double)].collect().toSeq
      val batchCurve = MlOps.thresholdSweep(
        scored(docs.toSeq.toDF("doc_id", "text")), "__score", "__lab")
        .orderBy(col("thr").desc)
        .as[(Double, Long, Long, Long, Double, Double, Double)].collect().toSeq
      assert(fromStream == batchCurve && batchCurve.nonEmpty,
        s"stream=${fromStream.size} batch=${batchCurve.size}")
    } finally q.stop()
  }
}
