package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every declared query inventory (SURVEY.md §2.D): core OLAP
  * surface, text/dedup/similarity pipeline operators, and the Redis-source
  * parity queries. Each entry pairs a Spark DataFrame builder with (where
  * ANSI-SQL-expressible) a DuckDB oracle over the same parquet tables.
  */
object SparkEntry {

  private def registries: Seq[graft.queries.NamedQuery] =
    graft.queries.OlapQueries.all ++ graft.queries.PipelineQueries.all ++
      graft.queries.RedisQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(nq => nq.name -> nq.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    registries.flatMap(nq => nq.oracle.map(nq.name -> _)).toMap
}
