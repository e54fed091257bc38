package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.net.FakeRedisServer

/** Config-only deployment path: a session built with the extension gets
  * the SQL surface with zero registration calls in user code.
  */
class GraftSparkExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val server = new FakeRedisServer()
  private var port: Int = _

  override def beforeAll(): Unit = {
    (1 to 5).foreach(i => server.put(s"ext:$i", s"v$i"))
    server.putHash("exthash:1", Map("f" -> "1"))
    port = server.start()
  }

  override def afterAll(): Unit = server.stop()

  private def extendedSession(): SparkSession = {
    // force a NEW session over the (possibly shared) context so the
    // extension applies — getOrCreate would return a previous spec's
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions()(_))
      .getOrCreate()
  }

  test("extension injects scalar kernels and Redis TVFs into a fresh session") {
    val spark = extendedSession()
    spark.conf.set(functions.RedduckFunctions.HostConf, "127.0.0.1")
    spark.conf.set(functions.RedduckFunctions.PortConf, port.toString)

    // scalar kernels available in plain SQL, no registration call
    val dot = spark.sql(
      "SELECT dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val h = spark.sql("SELECT md5_hash32('abc') AS h").head().getLong(0)
    val expected = spark.sql(
      "SELECT CAST(conv(substring(md5('abc'), 1, 8), 16, 10) AS BIGINT) AS h").head().getLong(0)
    assert(h == expected)

    // table-valued sources parse as-is
    assert(spark.sql("SELECT count(*) FROM redis_scan('ext:*')").head().getLong(0) == 5L)
    assert(spark.sql("SELECT value FROM redis_kv('ext:*') WHERE key = 'ext:3'")
      .head().getString(0) == "v3")
    assert(spark.sql("SELECT fields['f'] FROM redis_hash('exthash:*')")
      .head().getString(0) == "1")
  }
}
