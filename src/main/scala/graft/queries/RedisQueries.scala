package graft.queries

import Qf.DumpSortOps

import org.apache.spark.sql.functions._
import graft.functions.RedduckFunctions
import graft.net.FakeRedisServer
import graft.sources.RedisSources

/** Redis-surface parity queries (SURVEY §2.A, reference test
  * /root/reference/test/sql/scan.test + README.md:16-38).
  *
  * The reference's suite needs a live, pre-seeded Redis; ours spins a
  * hermetic in-process RESP server ONCE per JVM on a fixed port, seeded
  * exactly like FIXTURES.md §1 — so these queries run under the same
  * driver gate as everything else, with plain VALUES oracles (the seed
  * state is deterministic).
  */
object RedisQueries {

  /** One fake server per JVM on a fixed port (oracle strings must be able
    * to reference the port as a literal). Lives until JVM exit.
    */
  object Harness {
    val Host = "127.0.0.1"
    val Port = 16379
    val users: Seq[(Int, String, Int, String)] = Seq(
      (1001, "Ada", 36, "London"),
      (1002, "Grace", 45, "NewYork"),
      (1003, "Alan", 41, "Cambridge"),
      (1004, "Edsger", 72, "Austin"),
      (1005, "Barbara", 68, "Boston"))

    lazy val ensureStarted: Unit = {
      val s = new FakeRedisServer(Port)
      (1 to 10).foreach(i => s.put(f"testkey:$i%04d", s"value$i"))
      s.put("binpat:a_b", "underscore")
      s.put("binpat:axb", "x-variant")
      users.foreach { case (id, name, age, city) =>
        s.putHash(s"user:$id", Map("name" -> name, "age" -> age.toString, "city" -> city))
      }
      // Redis Streams fixture: deterministic entry ids so the r15 oracle
      // is a plain VALUES literal
      (1 to 9).foreach(i =>
        s.putStreamEntry("events:log", s"100-$i", Seq("v" -> s"ev$i", "n" -> i.toString)))
      // second stream for r16 (multi-stream read): ids INTERLEAVE with
      // events:log's ms=100 block (95..105 straddles it), so the
      // composite-offset read is exercised on streams whose entries are
      // not time-separable
      Seq(95, 97, 99, 101, 103, 105).zipWithIndex.foreach { case (ms, i) =>
        s.putStreamEntry("events:bus", s"$ms-1", Seq("v" -> s"bus${i + 1}", "n" -> (i + 1).toString))
      }
      startWithRetry(s)
    }

    def startWithRetry(s: FakeRedisServer): Unit = {
      var attempts = 0
      var started = false
      while (!started) {
        try { s.start(); started = true }
        catch {
          case e: java.net.BindException =>
            attempts += 1
            if (attempts > 20) throw e
            Thread.sleep(250) // a previous JVM may still be releasing the port
        }
      }
    }
  }

  /** Two-master "cluster" for partition.mode=cluster conformance: each
    * node owns half the slot space and (as a real node's SCAN would only
    * walk its own slots) holds a disjoint half of the keys; both answer
    * the same CLUSTER SLOTS map.
    */
  object ClusterHarness {
    val Host = "127.0.0.1"
    val PortA = 16380
    val PortB = 16381
    lazy val ensureStarted: Unit = {
      val a = new FakeRedisServer(PortA)
      val b = new FakeRedisServer(PortB)
      (0 until 10).foreach { i =>
        (if (i % 2 == 0) a else b).put(f"ckey:$i%02d", s"cv$i")
      }
      val slotMap = Seq((0, 8191, Host, PortA), (8192, 16383, Host, PortB))
      a.setClusterSlots(slotMap)
      b.setClusterSlots(slotMap)
      Harness.startWithRetry(a)
      Harness.startWithRetry(b)
    }
  }

  private def scanDf(s: org.apache.spark.sql.SparkSession, pattern: String) = {
    Harness.ensureStarted
    s.read.format("redis-scan")
      .option("host", Harness.Host).option("port", Harness.Port)
      .option("pattern", pattern).load()
  }

  private def kvDf(s: org.apache.spark.sql.SparkSession, pattern: String) = {
    Harness.ensureStarted
    s.read.format("redis-kv")
      .option("host", Harness.Host).option("port", Harness.Port)
      .option("pattern", pattern).load()
  }

  private def q(name: String, oracle: String)(
      run: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): NamedQuery =
    NamedQuery(name, run, Option(oracle).filter(_.nonEmpty))

  private val kvValues =
    (1 to 10).map(i => f"('testkey:$i%04d', 'value$i')").mkString(", ")

  val all: Seq[NamedQuery] = Seq(
    // scan.test:19-22 — COUNT(*) over redis_scan('testkey:*') = 10
    q("r01_redis_scan_count",
      "SELECT CAST(10 AS BIGINT) AS n") { (s, _) =>
      scanDf(s, "testkey:*").agg(count(lit(1)).as("n"))
    },

    // scan.test:24-29 — ORDER BY key_name LIMIT 3
    q("r02_redis_scan_topk",
      """SELECT * FROM (VALUES ('testkey:0001'), ('testkey:0002'), ('testkey:0003')) t(key_name)
        |ORDER BY key_name""".stripMargin) { (s, _) =>
      scanDf(s, "testkey:*").orderBy("key_name").limit(3)
    },

    // WHERE-clause → server-side MATCH glob pushdown (SURVEY §4 row 1)
    q("r03_redis_scan_pushdown",
      """SELECT * FROM (VALUES ('binpat:a_b'), ('binpat:axb')) t(key_name)
        |ORDER BY key_name""".stripMargin) { (s, _) =>
      scanDf(s, "*").filter(col("key_name").startsWith("binpat:"))
        .dumpSorted("key_name")
    },

    // redis_kv: SCAN + pipelined MGET (README.md:29-31)
    q("r04_redis_kv",
      s"""SELECT * FROM (VALUES $kvValues) t(key, value) ORDER BY key""".stripMargin) { (s, _) =>
      kvDf(s, "testkey:*").dumpSorted("key")
    },

    // batched redis_get incl. missing-key → NULL (vs reference's "")
    q("r05_redis_get_batched",
      s"""SELECT * FROM (VALUES $kvValues, ('missing:zz', NULL)) t(key, value)
         |ORDER BY key""".stripMargin) { (s, _) =>
      val keys = scanDf(s, "testkey:*").select(col("key_name").as("key"))
        .unionByName(s.range(1).select(lit("missing:zz").as("key")))
      RedduckFunctions.withRedisValues(keys, "key",
          hostPort = Some((Harness.Host, Harness.Port)))
        .dumpSorted("key")
    },

    // redis_hgetall with user-declared struct schema (README.md:36-38)
    q("r06_redis_hgetall", {
      val rows = Harness.users
        .map { case (id, n, a, c) => s"('user:$id', '$n', $a, '$c')" }.mkString(", ")
      s"""SELECT * FROM (VALUES $rows) t(key, name, age, city) ORDER BY key"""
    }) { (s, _) =>
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("name", StringType),
        StructField("age", IntegerType), StructField("city", StringType)))
      val keys = scanDf(s, "*").filter(col("key_name").startsWith("user:"))
        .select(col("key_name").as("key"))
      RedduckFunctions.withHashFields(keys, "key", Some(schema),
          hostPort = Some((Harness.Host, Harness.Port)))
        .dumpSorted("key")
    },

    // demo scalars (redduck_extension.cpp:17-40)
    q("r07_demo_scalars",
      """SELECT key_name, 'Redduck ' || key_name || ' 🐥' AS greeting, 'name is set' AS named
        |FROM (VALUES ('testkey:0001'), ('testkey:0002'), ('testkey:0003')) t(key_name)
        |ORDER BY key_name""".stripMargin) { (s, _) =>
      scanDf(s, "testkey:*").orderBy("key_name").limit(3)
        .select(col("key_name"),
          RedduckFunctions.redduck(col("key_name")).as("greeting"),
          RedduckFunctions.setName(col("key_name")).as("named"))
        .dumpSorted("key_name")
    },

    // redis_connect status string (redduck_extension.cpp:112-118)
    q("r08_redis_connect",
      s"SELECT 'Redis Target Set: ${Harness.Host}:${Harness.Port}' AS status") { (s, _) =>
      Harness.ensureStarted
      val status = RedduckFunctions.redisConnect(s, s"${Harness.Host}:${Harness.Port}")
      import s.implicits._
      Seq(status).toDF("status")
    },

    // SQL-registered redis_get UDF over the scan (README.md:33-34 shape:
    // SELECT key, redis_get(key) FROM redis_scan(...))
    q("r09_redis_get_udf",
      s"""SELECT * FROM (VALUES $kvValues) t(key_name, value) ORDER BY key_name""".stripMargin) { (s, _) =>
      Harness.ensureStarted
      RedduckFunctions.redisConnect(s, s"${Harness.Host}:${Harness.Port}")
      RedduckFunctions.registerAll(s)
      scanDf(s, "testkey:*").createOrReplaceTempView("redis_scan_keys")
      s.sql("""SELECT key_name, redis_get(key_name) AS value
              |FROM redis_scan_keys ORDER BY key_name""".stripMargin)
    },

    // the reference's PRIMARY syntax, verbatim: a table-valued function in
    // FROM (README.md:24, test/sql/scan.test:20) — registered on Spark's
    // tableFunctionRegistry, no temp view, no read.format
    q("r10_redis_scan_tvf", {
      val keys = (1 to 10).map(i => f"('testkey:$i%04d')").mkString(", ")
      s"""SELECT * FROM (VALUES $keys) t(key_name) ORDER BY key_name"""
    }) { (s, _) =>
      Harness.ensureStarted
      graft.GraftRedis.connect(s, s"${Harness.Host}:${Harness.Port}")
      graft.GraftRedis.registerSql(s)
      s.sql("SELECT * FROM redis_scan('testkey:*') ORDER BY key_name")
    },

    // redis_kv as a TVF: SCAN + pipelined MGET straight from SQL
    q("r11_redis_kv_tvf",
      s"""SELECT * FROM (VALUES $kvValues) t(key, value) ORDER BY key""") { (s, _) =>
      Harness.ensureStarted
      graft.GraftRedis.connect(s, s"${Harness.Host}:${Harness.Port}")
      graft.GraftRedis.registerSql(s)
      s.sql("SELECT * FROM redis_kv('testkey:*') ORDER BY key")
    },

    // hash keys as a first-class DSv2 source: SCAN + one pipelined HGETALL
    // batch per page → (key, fields MAP) projected to typed columns
    q("r12_redis_hash_source", {
      val rows = Harness.users
        .map { case (id, n, a, c) => s"('user:$id', '$n', $a, '$c')" }.mkString(", ")
      s"""SELECT * FROM (VALUES $rows) t(key, name, age, city) ORDER BY key"""
    }) { (s, _) =>
      Harness.ensureStarted
      s.read.format("redis-hash")
        .option("host", Harness.Host).option("port", Harness.Port.toString)
        .option("pattern", "user:*").load()
        .select(col("key"),
          col("fields")("name").as("name"),
          col("fields")("age").cast("int").as("age"),
          col("fields")("city").as("city"))
        .dumpSorted("key")
    },

    // ...and the same via the SQL TVF syntax
    q("r13_redis_hash_tvf", {
      val rows = Harness.users
        .map { case (id, n, a, c) => s"('user:$id', '$n', $a, '$c')" }.mkString(", ")
      s"""SELECT * FROM (VALUES $rows) t(key, name, age, city) ORDER BY key"""
    }) { (s, _) =>
      Harness.ensureStarted
      graft.GraftRedis.connect(s, s"${Harness.Host}:${Harness.Port}")
      graft.GraftRedis.registerSql(s)
      s.sql("""SELECT key, fields['name'] AS name, CAST(fields['age'] AS INT) AS age,
              |  fields['city'] AS city
              |FROM redis_hash('user:*') ORDER BY key""".stripMargin)
    },

    // cluster-slot partition planning: CLUSTER SLOTS on the seed node →
    // one partition per master, per-node cursors disjoint by slot
    // ownership; the scan's union covers the whole keyspace no matter
    // which node seeds it
    q("r14_redis_cluster_scan", {
      val keys = (0 until 10).map(i => f"('ckey:$i%02d')").mkString(", ")
      s"""SELECT * FROM (VALUES $keys) t(key_name) ORDER BY key_name"""
    }) { (s, _) =>
      ClusterHarness.ensureStarted
      s.read.format("redis-scan")
        .option("host", ClusterHarness.Host).option("port", ClusterHarness.PortA.toString)
        .option("partition.mode", "cluster")
        .option("pattern", "ckey:*").load()
        .dumpSorted("key_name")
    },

    // Redis Streams as a replayable micro-batch source: entry-id offsets
    // (public Redis Streams spec — XADD ids are strictly increasing and
    // XRANGE replays any committed range). The query DRIVES the streaming
    // source across ≥3 micro-batches (admission control at 3 entries per
    // trigger over a 9-entry stream) and returns what arrived — the
    // VALUES oracle is exactly the stream's XRANGE content, so this IS
    // the batch-read parity check, hash-compared by the driver.
    q("r15_redis_stream_source", {
      val rows = (1 to 9).map(i => s"('100-$i', 'ev$i', $i)").mkString(", ")
      s"SELECT * FROM (VALUES $rows) t(entry_id, v, n) ORDER BY entry_id"
    }) { (s, _) =>
      Harness.ensureStarted
      val stream = s.readStream.format("redis-stream")
        .option("host", Harness.Host).option("port", Harness.Port.toString)
        .option("stream", "events:log").option("maxEntriesPerTrigger", "3")
        .load()
        .writeStream.format("memory").queryName("r15_stream_sink").start()
      try {
        stream.processAllAvailable()
        val batches = stream.recentProgress.count(_.numInputRows > 0)
        require(batches >= 3, s"admission control failed: $batches micro-batches for 9 entries at 3/trigger")
      } finally stream.stop()
      s.table("r15_stream_sink")
        .select(col("entry_id"),
          col("fields")("v").as("v"),
          col("fields")("n").cast("int").as("n"))
        .dumpSorted("entry_id")
    },

    // MULTI-stream source: two streams (ids interleaved across them)
    // read by ONE query under a composite {stream → last id} offset —
    // the 100 TB ingest shape (a Redis stream is one ordered partition
    // by design; scale-out is many streams, like Kafka partitions). The
    // admission cap is split across the streams per trigger; the VALUES
    // oracle is the union of both streams' XRANGE content, so this IS
    // the union-equals-batch parity check, hash-compared by the driver.
    q("r16_redis_multi_stream", {
      val logRows = (1 to 9).map(i => s"('events:log', '100-$i', 'ev$i', $i)")
      val busRows = Seq(95, 97, 99, 101, 103, 105).zipWithIndex.map {
        case (ms, i) => s"('events:bus', '$ms-1', 'bus${i + 1}', ${i + 1})"
      }
      s"""SELECT * FROM (VALUES ${(logRows ++ busRows).mkString(", ")})
         |t(stream, entry_id, v, n) ORDER BY stream, entry_id""".stripMargin
    }) { (s, _) =>
      Harness.ensureStarted
      val stream = s.readStream.format("redis-stream")
        .option("host", Harness.Host).option("port", Harness.Port.toString)
        .option("streams", "events:log,events:bus")
        .option("maxEntriesPerTrigger", "4")
        .load()
        .writeStream.format("memory").queryName("r16_stream_sink").start()
      try {
        stream.processAllAvailable()
        val batches = stream.recentProgress.count(_.numInputRows > 0)
        require(batches >= 4,
          s"admission split failed: $batches micro-batches for 15 entries at 4/trigger")
      } finally stream.stop()
      s.table("r16_stream_sink")
        .select(col("stream"), col("entry_id"),
          col("fields")("v").as("v"),
          col("fields")("n").cast("int").as("n"))
        .dumpSorted("stream", "entry_id")
    },

    // ROUTED multi-stream sink (the sink-side scale-out shape, dual to
    // r16's read): 9 rows route to 3 streams through the streamColumn
    // (the Kafka topic-column analog), with explicit ids (idempotent
    // mode) so a re-run of this query is server-deduplicated — the
    // write, like the read, is exercised end-to-end on every
    // conformance pass. Read-back is ONE multi-stream batch read; the
    // VALUES oracle computes the identical mod-3 routing, so the hash
    // compare proves rows landed on exactly their named streams.
    q("r17_routed_stream_sink", {
      val rows = (1 to 9).map(i => s"('xshard:${i % 3}', '300-$i', 'm$i', $i)")
      s"""SELECT * FROM (VALUES ${rows.mkString(", ")})
         |t(stream, entry_id, v, n) ORDER BY stream, entry_id""".stripMargin
    }) { (s, _) =>
      Harness.ensureStarted
      val streams = "xshard:0,xshard:1,xshard:2"
      val df = s.range(1, 10).select(
        concat_ws("", lit("xshard:"), col("id") % 3).as("stream"),
        concat_ws("", lit("300-"), col("id")).as("entry_id"),
        concat_ws("", lit("m"), col("id")).as("v"),
        col("id").cast("int").as("n"))
        // idempotent + routed: ids must ascend per (partition, stream) —
        // one writer sorted by (stream, id) satisfies it for all three
        .coalesce(1).sortWithinPartitions("stream", "entry_id")
      df.write.format("redis-stream")
        .option("host", Harness.Host).option("port", Harness.Port.toString)
        .option("streams", streams).option("streamColumn", "stream")
        .option("idColumn", "entry_id").mode("append").save()
      s.read.format("redis-stream")
        .option("host", Harness.Host).option("port", Harness.Port.toString)
        .option("streams", streams).load()
        .select(col("stream"), col("entry_id"),
          col("fields")("v").as("v"),
          col("fields")("n").cast("int").as("n"))
        .dumpSorted("stream", "entry_id")
    }
  )
}
