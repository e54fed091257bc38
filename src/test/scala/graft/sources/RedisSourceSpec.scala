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
    port = server.start()
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

  test("partition.patterns shards the keyspace into one partition each") {
    val df = spark.read.format("redis-scan")
      .option("host", "127.0.0.1").option("port", port)
      .option("partition.patterns", "testkey:000*, testkey:001*, binpat:*").load()
    assert(df.rdd.getNumPartitions == 3)
    val keys = df.collect().map(_.getString(0)).sorted.toSeq
    assert(keys == ((1 to 10).map(i => f"testkey:$i%04d") ++ Seq("binpat:a_b", "binpat:axb")).sorted)
  }
}
