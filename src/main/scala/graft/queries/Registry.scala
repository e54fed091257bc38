package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checkable query: the Spark-side builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB SQL string over
  * the same parquet tables. Queries without an oracle get the driver's
  * weaker rows-only check.
  */
final case class NamedQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Registry {
  /** Read one fixture table from the given scale-factor directory.
    *
    * The `events` table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark only reads with `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set in Verify/Bench sessions) — the column then arrives as LONG
    * nanoseconds. Normalize it back to a microsecond TIMESTAMP with
    * integer division (`div`, not `/`: double division loses precision at
    * ~1.7e18). Truncation toward zero matches DuckDB's
    * `CAST(ts_ns AS TIMESTAMP)`, which the oracle SQL uses.
    */
  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    val df = s.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }
}
