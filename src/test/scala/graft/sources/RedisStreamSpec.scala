package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.net.FakeRedisServer

/** Streaming keyspace source: new keys arrive as micro-batch rows. */
class RedisStreamSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val server = new FakeRedisServer()
  private var port: Int = _

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    (1 to 3).foreach(i => server.put(s"seed:$i", s"v$i"))
    port = server.start()
  }

  override def afterAll(): Unit = server.stop()

  test("redis-key-stream emits pre-existing keys, then only new arrivals") {
    val stream = spark.readStream.format("redis-key-stream")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "seed:*").load()
    val query = stream.writeStream
      .format("memory").queryName("keystream").outputMode("append").start()
    try {
      graft.StreamTestGuard.drain(query)
      val firstBatch = spark.sql("SELECT key_name FROM keystream")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(firstBatch == Seq("seed:1", "seed:2", "seed:3"))

      server.put("seed:4", "v4")
      server.put("other:9", "ignored") // outside the pattern
      graft.StreamTestGuard.drain(query)
      val secondBatch = spark.sql("SELECT key_name FROM keystream")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(secondBatch == Seq("seed:1", "seed:2", "seed:3", "seed:4"),
        "exactly the one new in-pattern key should be appended")

      // no change → no new rows
      graft.StreamTestGuard.drain(query)
      assert(spark.sql("SELECT count(*) FROM keystream").head().getLong(0) == 4L)
    } finally query.stop()
  }

  test("checkpoint restart fast-forwards the offset and emits the re-seed batch") {
    (1 to 2).foreach(i => server.put(s"restart:$i", s"v$i"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt").toString
    val got = scala.collection.mutable.ArrayBuffer[String]()
    def start() = spark.readStream.format("redis-key-stream")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "restart:*").load()
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val ks = batch.collect().map(_.getString(0))
          got.synchronized { got ++= ks }
          ()
      }.option("checkpointLocation", ckpt).start()

    val q1 = start()
    try graft.StreamTestGuard.drain(q1) finally q1.stop()
    assert(got.synchronized(got.sorted.toSeq) == Seq("restart:1", "restart:2"))

    // restart from the same checkpoint: the committed offset N is restored
    // into a fresh stream whose counter would otherwise restart at 0 and
    // silently emit nothing until it climbed past N. The fast-forward makes
    // the first post-restart snapshot land at N+1 → current keyspace
    // (including the key added while down) is re-emitted as documented.
    server.put("restart:3", "v3")
    got.synchronized(got.clear())
    val q2 = start()
    try {
      graft.StreamTestGuard.drain(q2)
      assert(got.synchronized(got.sorted.toSeq) == Seq("restart:1", "restart:2", "restart:3"),
        "restart must re-seed from the current keyspace, not swallow it")
    } finally q2.stop()
  }

  test("end-to-end: keyspace stream enriched with values via foreachBatch") {
    server.put("enrich:a", "va")
    server.put("enrich:b", "vb")
    val out = scala.collection.mutable.Map[String, String]()
    val stream = spark.readStream.format("redis-key-stream")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "enrich:*").load()
    val query = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val enriched = graft.functions.RedduckFunctions.withRedisValues(
          batch.withColumnRenamed("key_name", "key"), "key",
          hostPort = Some(("127.0.0.1", port)))
        val rows = enriched.collect().map(r => r.getString(0) -> r.getString(1))
        out.synchronized { out ++= rows }
        ()
    }.start()
    try {
      graft.StreamTestGuard.drain(query)
      assert(out.synchronized(out.toMap) == Map("enrich:a" -> "va", "enrich:b" -> "vb"))
      server.put("enrich:c", "vc")
      graft.StreamTestGuard.drain(query)
      assert(out.synchronized(out.toMap).get("enrich:c").contains("vc"))
    } finally query.stop()
  }

  test("end-to-end: Redis Streams ingestion feeds the stats ledger — per-microbatch advances equal one batch pass") {
    import org.apache.spark.sql.functions._
    import graft.net.RedisCommands
    // live pipeline shape: XADD events land in a Redis Stream, the
    // redis-stream source replays them exactly-once by entry id, and
    // each micro-batch folds into the at-rest stats ledger with the
    // micro-batch id as the exactly-once marker. Parity: the composed
    // at-rest state equals computing the stats over the whole stream
    // read back in one batch via XRANGE.
    val k = "ing:docs"
    val c = new graft.net.RedisConnection("127.0.0.1", port)
    try (1 to 6).foreach(i => RedisCommands.xadd(c, k, s"5-$i",
      Seq("src" -> (if (i % 2 == 0) "web" else "books"), "text" -> s"w$i " * i)))
    finally c.close()
    val path = java.nio.file.Files.createTempDirectory("graft-xing").toString + "/led"
    graft.operators.CurationOps.writeStatsLedger(
      spark.emptyDataFrame.select(lit("x").as("src"), lit("").as("text")).limit(0),
      "src", "text", path)
    val q = spark.readStream.format("redis-stream")
      .option("host", "127.0.0.1").option("port", port.toString)
      .option("stream", k).option("maxEntriesPerTrigger", "2")
      .load()
      .select(col("fields")("src").as("src"), col("fields")("text").as("text"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.operators.CurationOps.advanceStatsLedger(batch, "src", "text", path,
          batchId = Some(id.toString))
      }
      .start()
    try {
      graft.StreamTestGuard.drain(q)
      // more arrivals while the query runs: later micro-batches fold in
      val c2 = new graft.net.RedisConnection("127.0.0.1", port)
      try (7 to 8).foreach(i => RedisCommands.xadd(c2, k, s"6-$i",
        Seq("src" -> "web", "text" -> s"w$i late")))
      finally c2.close()
      graft.StreamTestGuard.drain(q)
    } finally q.stop()
    val atRest = graft.operators.LedgerGuard.readLedger(spark, path)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val oneShot = spark.read.format("redis-stream")
      .option("host", "127.0.0.1").option("port", port.toString)
      .option("stream", k).load()
      .select(col("fields")("src").as("src"), col("fields")("text").as("text"))
    val expect = graft.operators.CurationOps.corpusStats(oneShot, "src", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(atRest == expect && expect.nonEmpty, s"atRest=$atRest expect=$expect")
  }
}
