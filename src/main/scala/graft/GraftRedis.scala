package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** User-facing facade — the one-import surface for a RedDuck user moving
  * to this engine (README.md:16-38 workflow parity):
  *
  * {{{
  * import graft.GraftRedis
  * GraftRedis.connect(spark, "127.0.0.1:6379")   // ≈ SELECT redis_connect(...)
  * val keys = GraftRedis.scan(spark, "user:*")   // ≈ FROM redis_scan('user:*')
  * val kv   = GraftRedis.kv(spark, "user:*")     // ≈ redis_kv (batched MGET)
  * GraftRedis.registerSql(spark)                 // redis_get / redis_hgetall /
  *                                               // redduck / set_name in SQL
  * }}}
  */
object GraftRedis {

  /** Validate + PING + persist the default target in session conf.
    * Returns the reference's exact status string.
    */
  def connect(spark: SparkSession, hostPort: String): String =
    functions.RedduckFunctions.redisConnect(spark, hostPort)

  private def reader(spark: SparkSession, fmt: String, pattern: String,
      numPartitionsPatterns: Seq[String]) = {
    val (host, port) = functions.RedduckFunctions.target(spark)
    val base = spark.read.format(fmt)
      .option("host", host).option("port", port.toString)
      .option("pattern", pattern)
    (if (numPartitionsPatterns.nonEmpty)
      base.option("partition.patterns", numPartitionsPatterns.mkString(","))
    else base).load()
  }

  /** Keyspace scan → (key_name STRING). Pass `shards` to parallelize
    * across disjoint glob patterns (one partition + connection each).
    */
  def scan(spark: SparkSession, pattern: String = "*",
      shards: Seq[String] = Nil): DataFrame =
    reader(spark, "redis-scan", pattern, shards)

  /** Scan + pipelined MGET → (key STRING, value STRING). */
  def kv(spark: SparkSession, pattern: String = "*",
      shards: Seq[String] = Nil): DataFrame =
    reader(spark, "redis-kv", pattern, shards)

  /** Register the SQL scalar surface on the session. */
  def registerSql(spark: SparkSession): Unit =
    functions.RedduckFunctions.registerAll(spark)
}
