package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.net.FakeRedisServer

/** DSv2 source parity tests — the reference's scan.test golden assertions
  * (/root/reference/test/sql/scan.test:19-29) plus pushdown and
  * partition-sharding behavior it has no analog for.
  */
class RedisSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val server = new FakeRedisServer()
  private var port: Int = _

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = {
    (1 to 10).foreach(i => server.put(f"testkey:$i%04d", s"value$i"))
    server.put("binpat:a_b", "underscore")
    server.put("binpat:axb", "x-variant")
    server.putHash("hash:1", Map("a" -> "1", "b" -> "x"))
    server.putHash("hash:2", Map("a" -> "2"))
    port = server.start()
  }

  test("redis_connect validates host:port and fails fast on unreachable targets") {
    // malformed target strings are rejected before any I/O
    // (reference: SetAddressScalarFun validation, redduck_extension.cpp:54-119)
    intercept[IllegalArgumentException] {
      graft.GraftRedis.connect(spark, "no-port-here")
    }
    intercept[IllegalArgumentException] {
      graft.GraftRedis.connect(spark, "host:")
    }
    intercept[IllegalArgumentException] {
      graft.GraftRedis.connect(spark, "host:not-a-number")
    }
    // eager PING: an unreachable target fails at connect time, not first query
    intercept[Exception] {
      graft.GraftRedis.connect(spark, "127.0.0.1:1") // nothing listens on 1
    }
    // a failed connect must not clobber a previously working target
    graft.GraftRedis.connect(spark, s"127.0.0.1:$port")
    assert(graft.functions.RedduckFunctions.target(spark) == ("127.0.0.1", port))
  }

  test("redis-hash source reads hashes as (key, fields map)") {
    val rows = spark.read.format("redis-hash")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "hash:*").load()
      .collect().map(r => r.getString(0) -> r.getMap[String, String](1).toMap).toMap
    assert(rows == Map(
      "hash:1" -> Map("a" -> "1", "b" -> "x"),
      "hash:2" -> Map("a" -> "2")))
  }

  test("redis-hash WHERE on key pushes a MATCH glob like the other sources") {
    val df = spark.read.format("redis-hash")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "*").load()
      .filter(org.apache.spark.sql.functions.col("key").startsWith("hash:"))
    val leaf = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(leaf.contains("hash:"), s"expected pushed glob in hash scan:\n$leaf")
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("hash:1", "hash:2"))
  }

  test("partition.mode=cluster: one partition per master, disjoint union = keyspace") {
    // two masters, each owning half the slots — and therefore half the
    // keys (a real cluster node's SCAN only walks the keys it owns; the
    // fakes model that by simply holding disjoint key sets)
    val nodeA = new FakeRedisServer()
    val nodeB = new FakeRedisServer()
    val portA = nodeA.start()
    val portB = nodeB.start()
    try {
      (0 until 10).foreach { i =>
        val owner = if (i % 2 == 0) nodeA else nodeB
        owner.put(f"ck:$i%02d", s"v$i")
      }
      // both nodes answer the SAME (MOVED-consistent) slot map
      val slotMap = Seq((0, 8191, "127.0.0.1", portA), (8192, 16383, "127.0.0.1", portB))
      nodeA.setClusterSlots(slotMap)
      nodeB.setClusterSlots(slotMap)

      val df = spark.read.format("redis-scan")
        .option("host", "127.0.0.1").option("port", portA)
        .option("partition.mode", "cluster")
        .option("pattern", "ck:*").load()
      assert(df.rdd.getNumPartitions == 2, "one input partition per master node")
      val keys = df.collect().map(_.getString(0)).toSeq
      assert(keys.size == keys.distinct.size, "per-node scans must be disjoint")
      assert(keys.sorted == (0 until 10).map(i => f"ck:$i%02d"),
        "union of per-node scans must equal the keyspace")

      // kv mode plans through the same seam (values come from each node)
      val kv = spark.read.format("redis-kv")
        .option("host", "127.0.0.1").option("port", portB) // any seed node works
        .option("partition.mode", "cluster")
        .option("pattern", "ck:*").load()
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(kv == (0 until 10).map(i => f"ck:$i%02d" -> s"v$i").toMap)
    } finally { nodeA.stop(); nodeB.stop() }
  }

  test("partition.mode=cluster rejects gapped slot maps and option conflicts") {
    val node = new FakeRedisServer()
    val p = node.start()
    try {
      node.put("gk:1", "v")
      // gap: 100..199 unowned — a scan would silently drop those slots' keys
      node.setClusterSlots(Seq((0, 99, "127.0.0.1", p), (200, 16383, "127.0.0.1", p)))
      val e = intercept[Exception] {
        spark.read.format("redis-scan")
          .option("host", "127.0.0.1").option("port", p)
          .option("partition.mode", "cluster").option("pattern", "gk:*").load()
          .collect()
      }
      assert(e.getMessage != null)
      // cluster mode + pattern-sharding options is ambiguous → reject
      intercept[Exception] {
        spark.read.format("redis-scan")
          .option("host", "127.0.0.1").option("port", p)
          .option("partition.mode", "cluster").option("partition.slots", "4")
          .option("pattern", "gk:*").load().collect()
      }
    } finally node.stop()
  }

  override def afterAll(): Unit = server.stop()

  private def scan(pattern: String) = spark.read.format("redis-scan")
    .option("host", "127.0.0.1").option("port", port)
    .option("pattern", pattern).load()

  test("scan.test:19-22 — COUNT(*) over redis_scan('testkey:*') = 10") {
    assert(scan("testkey:*").count() == 10L)
  }

  test("scan.test:24-29 — ORDER BY key_name LIMIT 3") {
    val rows = scan("testkey:*").orderBy("key_name").limit(3)
      .collect().map(_.getString(0)).toSeq
    assert(rows == Seq("testkey:0001", "testkey:0002", "testkey:0003"))
  }

  test("plain key scans read columnar (ColumnarToRow above the scan)") {
    val df = scan("testkey:*")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), s"expected columnar scan handoff:\n$plan")
    assert(df.count() == 10L)
    // kv mode stays row-based (values interleave with pipelined MGET)
    val kvPlan = spark.read.format("redis-kv")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "testkey:*").load()
      .queryExecution.executedPlan.toString
    assert(!kvPlan.contains("ColumnarToRow"))
  }

  test("small scan.count forces multi-page cursor with identical results") {
    val keys = spark.read.format("redis-scan")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "testkey:*").option("scan.count", "2").load()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(keys == (1 to 10).map(i => f"testkey:$i%04d"))
  }

  test("WHERE startsWith pushes a MATCH glob into the scan") {
    val df = scan("*").filter(org.apache.spark.sql.functions.col("key_name").startsWith("binpat:"))
    val planned = df.queryExecution.executedPlan.toString
    assert(planned.contains("PushedFilters") || planned.contains("RedisScan"),
      s"expected scan node in plan:\n$planned")
    // semantics: only the matching keys come back
    assert(df.collect().map(_.getString(0)).sorted.toSeq == Seq("binpat:a_b", "binpat:axb"))
    // and the pushed glob actually narrowed the scan to one pattern
    val scanDesc = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scanDesc.contains("binpat:"), s"expected pushed pattern in scan:\n$scanDesc")
  }

  test("equality filter matches glob-metacharacter keys literally") {
    // binpat:a_b contains '_' (glob-significant in the reference's broken
    // SqlToResp); an EqualTo must escape it and match exactly one key
    val df = scan("*").filter(org.apache.spark.sql.functions.col("key_name") === "binpat:a_b")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("binpat:a_b"))
  }

  test("redis-kv returns values via pipelined MGET") {
    val rows = spark.read.format("redis-kv")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "testkey:*").load()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows == (1 to 10).map(i => f"testkey:$i%04d" -> s"value$i").toMap)
  }

  test("GraftRedis facade: connect + scan + kv + SQL registration") {
    val status = graft.GraftRedis.connect(spark, s"127.0.0.1:$port")
    assert(status == s"Redis Target Set: 127.0.0.1:$port")
    assert(graft.GraftRedis.scan(spark, "testkey:*").count() == 10L)
    val kv = graft.GraftRedis.kv(spark, "testkey:*").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(kv("testkey:0005") == "value5")
    graft.GraftRedis.registerSql(spark)
    assert(spark.sql("SELECT redis_get('testkey:0002') AS v").head().getString(0) == "value2")
    assert(spark.sql("SELECT redduck('x') AS v").head().getString(0) == "Redduck x 🐥")
  }

  test("pushed LIMIT stops the SCAN cursor early (fewer round trips)") {
    val base = spark.read.format("redis-scan")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "testkey:*").option("scan.count", "2")
    // full drain: 12 keys at COUNT 2 → 6 SCAN round trips
    server.resetScanCalls()
    assert(base.load().collect().length == 10)
    val fullTrips = server.scanCalls
    assert(fullTrips >= 6, s"expected ≥6 full-drain trips, got $fullTrips")
    // LIMIT 3: cursor stops once 3 keys matched
    server.resetScanCalls()
    val limited = base.load().limit(3)
    val leaf = limited.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(leaf.contains("limit=3"), s"expected pushed limit in scan:\n$leaf")
    assert(limited.collect().length == 3)
    assert(server.scanCalls < fullTrips,
      s"pushed limit did not cut round trips: ${server.scanCalls} vs $fullTrips")
  }

  test("pushed ORDER BY + LIMIT keeps an n-element heap per partition") {
    val df = spark.read.format("redis-scan")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "testkey:*").load()
      .orderBy("key_name").limit(3)
    val leaf = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(leaf.contains("topN=3 ASC"), s"expected pushed topN in scan:\n$leaf")
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("testkey:0001", "testkey:0002", "testkey:0003"))
    // descending too
    val desc = spark.read.format("redis-scan")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "testkey:*").load()
      .orderBy(org.apache.spark.sql.functions.col("key_name").desc).limit(2)
    assert(desc.collect().map(_.getString(0)).toSeq == Seq("testkey:0010", "testkey:0009"))
  }

  test("pushed TopN heap selects in UTF8 binary order (Spark StringType), not UTF-16") {
    // U+1F600 (surrogate pair D83D DE00) sorts BEFORE U+FFFF in UTF-16
    // code-unit order but AFTER it in UTF-8 binary order — Spark sorts
    // StringType in binary order, and keys the heap drops are gone before
    // Spark's re-sort, so a UTF-16 heap would silently return the wrong key
    val bmpMax = "uni:" + "\uFFFF"
    val emoji = "uni:" + new String(Character.toChars(0x1F600))
    server.put(bmpMax, "bmp-max")
    server.put(emoji, "emoji")
    def scan() = spark.read.format("redis-scan")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "uni:*").load()
    assert(scan().orderBy("key_name").limit(1)
      .collect().map(_.getString(0)).toSeq == Seq(bmpMax))
    assert(scan().orderBy(org.apache.spark.sql.functions.col("key_name").desc).limit(1)
      .collect().map(_.getString(0)).toSeq == Seq(emoji))
  }

  test("scan.test verbatim SQL: table-valued redis_scan in FROM") {
    graft.GraftRedis.connect(spark, s"127.0.0.1:$port")
    graft.GraftRedis.registerSql(spark)
    // test/sql/scan.test:19-22
    assert(spark.sql("SELECT COUNT(*) FROM redis_scan('testkey:*')").head().getLong(0) == 10L)
    // test/sql/scan.test:24-29
    val top3 = spark.sql("SELECT key_name FROM redis_scan('testkey:*') ORDER BY key_name LIMIT 3")
      .collect().map(_.getString(0)).toSeq
    assert(top3 == Seq("testkey:0001", "testkey:0002", "testkey:0003"))
    // kv TVF joins + projects like any relation
    val v = spark.sql(
      "SELECT value FROM redis_kv('testkey:*') WHERE key = 'testkey:0007'")
      .head().getString(0)
    assert(v == "value7")
    // non-literal argument is rejected with a clear message
    val err = intercept[Exception] {
      spark.sql("SELECT * FROM redis_scan(key_name)").collect()
    }
    assert(err.getMessage != null)
  }

  test("partition.patterns shards the keyspace into one partition each") {
    val df = spark.read.format("redis-scan")
      .option("host", "127.0.0.1").option("port", port)
      .option("partition.patterns", "testkey:000*, testkey:001*, binpat:*").load()
    assert(df.rdd.getNumPartitions == 3)
    val keys = df.collect().map(_.getString(0)).sorted.toSeq
    assert(keys == ((1 to 10).map(i => f"testkey:$i%04d") ++ Seq("binpat:a_b", "binpat:axb")).sorted)
  }

  test("partition.slots shards into disjoint, exhaustive partitions") {
    // exercise every shard shape: alphanumeric suffixes, a non-alphabet
    // suffix (%), and a key equal to the bare prefix
    server.put("slot:", "bare-prefix")
    server.put("slot:%weird", "non-alnum")
    (0 until 26).foreach(i => server.put(s"slot:${('a' + i).toChar}$i", s"v$i"))
    val df = spark.read.format("redis-scan")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "slot:*").option("partition.slots", "4").load()
    assert(df.rdd.getNumPartitions == 4)
    val perPartition = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      rows.map(r => pid -> r.getString(0))
    }.collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val all = perPartition.values.flatten.toSeq
    // exhaustive: every key seen exactly once across partitions
    assert(all.size == all.toSet.size, "a key appeared in two shards")
    assert(all.toSet == ((0 until 26).map(i => s"slot:${('a' + i).toChar}$i").toSet
      + "slot:" + "slot:%weird"))
    // disjoint by construction AND actually spread over >1 partition
    assert(perPartition.count(_._2.nonEmpty) >= 3, s"degenerate sharding: $perPartition")
    // bare prefix + non-alphabet suffix land in the complement shard (last)
    assert(perPartition(3).contains("slot:") && perPartition(3).contains("slot:%weird"))
  }

  test("redis-kv write path: pipelined SET round-trips through the read path") {
    import spark.implicits._
    val df = (1 to 300).map(i => (f"written:$i%04d", s"wv$i")).toDF("key", "value")
    df.repartition(3).write.format("redis-kv")
      .option("host", "127.0.0.1").option("port", port)
      .option("scan.count", "64") // force multiple pipeline flushes per partition
      .mode("append").save()
    val back = spark.read.format("redis-kv")
      .option("host", "127.0.0.1").option("port", port)
      .option("pattern", "written:*").load()
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(back.size == 300)
    assert(back("written:0007") == "wv7" && back("written:0300") == "wv300")
    // scan source stays read-only
    val err = intercept[Exception] {
      df.write.format("redis-scan")
        .option("host", "127.0.0.1").option("port", port)
        .mode("append").save()
    }
    assert(err.getMessage != null)
  }

  test("legacyEmptyStringForMissingKey reproduces the reference's '' semantics") {
    graft.GraftRedis.connect(spark, s"127.0.0.1:$port")
    // default: missing key → SQL NULL
    spark.conf.set(graft.functions.RedduckFunctions.LegacyEmptyConf, "false")
    graft.GraftRedis.registerSql(spark)
    assert(spark.sql("SELECT redis_get('no:such:key') AS v").head().isNullAt(0))
    // legacy flag: missing key → "" like the reference's RedisClient
    spark.conf.set(graft.functions.RedduckFunctions.LegacyEmptyConf, "true")
    graft.GraftRedis.registerSql(spark)
    assert(spark.sql("SELECT redis_get('no:such:key') AS v").head().getString(0) == "")
    // batched form honors the same conf
    import spark.implicits._
    val keys = Seq("testkey:0001", "no:such:key").toDF("key")
    val vals = graft.functions.RedduckFunctions.withRedisValues(keys, "key",
      hostPort = Some(("127.0.0.1", port)))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(vals("testkey:0001") == "value1" && vals("no:such:key") == "")
    spark.conf.set(graft.functions.RedduckFunctions.LegacyEmptyConf, "false")
    graft.GraftRedis.registerSql(spark)
  }

  test("AUTH: requirepass server rejects unauthenticated reads; .option(auth)/session conf authenticate; ACL 2-arg form; wrong password fails loudly") {
    val authServer = new FakeRedisServer()
    authServer.setRequirePass("s3cret")
    (1 to 5).foreach(i => authServer.put(s"ak:$i", s"v$i"))
    val aport = authServer.start()
    try {
      // no credentials → the server's NOAUTH surfaces loudly
      val noAuth = intercept[Exception] {
        spark.read.format("redis-scan")
          .option("host", "127.0.0.1").option("port", aport.toString)
          .option("pattern", "ak:*").load().count()
      }
      assert(noAuth.getMessage.contains("NOAUTH") ||
        Option(noAuth.getCause).exists(_.getMessage.contains("NOAUTH")),
        s"expected NOAUTH, got: ${noAuth.getMessage}")
      // wrong password fails at connect, naming AUTH (never silently)
      val badPw = intercept[Exception] {
        spark.read.format("redis-scan")
          .option("host", "127.0.0.1").option("port", aport.toString)
          .option("auth", "wrong").option("pattern", "ak:*").load().count()
      }
      assert(badPw.getMessage.contains("AUTH") ||
        Option(badPw.getCause).exists(_.getMessage.contains("AUTH")),
        s"expected AUTH failure, got: ${badPw.getMessage}")
      // correct password: scan + kv read + write path all authenticate
      def authed(fmt: String) = spark.read.format(fmt)
        .option("host", "127.0.0.1").option("port", aport.toString)
        .option("auth", "s3cret").option("pattern", "ak:*").load()
      assert(authed("redis-scan").count() == 5)
      assert(authed("redis-kv").collect().map(_.getString(1)).sorted.toSeq ==
        Seq("v1", "v2", "v3", "v4", "v5"))
      import spark.implicits._
      Seq(("ak:6", "v6")).toDF("key", "value").write.format("redis-kv")
        .option("host", "127.0.0.1").option("port", aport.toString)
        .option("auth", "s3cret").mode("append").save()
      assert(authed("redis-scan").count() == 6)
      // ACL 2-arg form ("user password", one space)
      authServer.setRequirePass("pw2", user = Some("svc"))
      assert(spark.read.format("redis-scan")
        .option("host", "127.0.0.1").option("port", aport.toString)
        .option("auth", "svc pw2").option("pattern", "ak:*").load().count() == 6)
      // session surface: connect(host:port, auth) persists the credential,
      // UDFs and TVF-style reads pick it up; the status string never
      // echoes the credential
      val status = graft.GraftRedis.connect(spark, s"127.0.0.1:$aport", "svc pw2")
      assert(status == s"Redis Target Set: 127.0.0.1:$aport" && !status.contains("pw2"))
      graft.GraftRedis.registerSql(spark)
      assert(spark.sql("SELECT redis_get('ak:1') AS v").head().getString(0) == "v1")
      assert(graft.GraftRedis.scan(spark, "ak:*").count() == 6)
    } finally {
      authServer.stop()
      spark.conf.unset(graft.functions.RedduckFunctions.AuthConf)
      graft.GraftRedis.connect(spark, s"127.0.0.1:$port")
      graft.GraftRedis.registerSql(spark)
    }
  }

  test("TLS: rediss-style server serves scans over .option(tls); plain client and handshake failures are loud; AUTH composes") {
    // self-signed server keystore via the JDK's own keytool (offline)
    val dir = java.nio.file.Files.createTempDirectory("graft-tls").toString
    val ks = s"$dir/server.p12"
    val gen = new ProcessBuilder("keytool", "-genkeypair", "-alias", "redis",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "2",
      "-dname", "CN=localhost", "-keystore", ks, "-storetype", "PKCS12",
      "-storepass", "changeit", "-keypass", "changeit")
      .redirectErrorStream(true).start()
    assert(gen.waitFor() == 0, "keytool failed")
    val tlsServer = new FakeRedisServer(tlsKeystore = Some((ks, "changeit")))
    tlsServer.setRequirePass("tlspw")
    (1 to 4).foreach(i => tlsServer.put(s"tk:$i", s"v$i"))
    val tport = tlsServer.start()
    try {
      def reader(tls: Boolean, trustAll: Boolean, auth: Boolean) = {
        var r = spark.read.format("redis-kv")
          .option("host", "127.0.0.1").option("port", tport.toString)
          .option("pattern", "tk:*")
        if (tls) r = r.option("tls", "true")
        if (trustAll) r = r.option("tls.trustAll", "true")
        if (auth) r = r.option("auth", "tlspw")
        r.load()
      }
      // the full stack: TLS transport + AUTH + pipelined MGET values
      assert(reader(tls = true, trustAll = true, auth = true)
        .collect().map(_.getString(1)).sorted.toSeq == Seq("v1", "v2", "v3", "v4"))
      // a PLAIN client against a TLS server fails loudly (garbled RESP /
      // connection reset — never silent wrong data)
      intercept[Exception](reader(tls = false, trustAll = false, auth = true).count())
      // without trustAll the self-signed chain is rejected at handshake
      val bad = intercept[Exception](
        reader(tls = true, trustAll = false, auth = true).count())
      def chain(t: Throwable): Seq[String] =
        if (t == null) Nil else t.toString +: chain(t.getCause)
      assert(chain(bad).exists(m => m.contains("SSL") || m.contains("PKIX") ||
        m.contains("certificate")), chain(bad).mkString(" | "))
    } finally tlsServer.stop()
  }
}
