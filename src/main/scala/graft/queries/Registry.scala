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

  /** Per-session memo of resolved table plans. `spark.read.parquet` pays a
    * file listing plus a parquet-footer schema read EVERY call; across a
    * 100+-query inventory that fixed cost dominates small-SF runs and is
    * pure waste at any scale (the fixture dirs are immutable for a run).
    * The analyzed logical plan is immutable, so reusing the DataFrame
    * object across queries is safe.
    *
    * NOT a WeakHashMap: the cached DataFrames strongly reference their
    * own SparkSession, so value → key would keep every entry reachable
    * forever (the WeakHashMap value-cycle leak). An access-ordered
    * bounded map caps retention at the 16 most recent sessions instead.
    */
  private val planCache =
    new java.util.LinkedHashMap[SparkSession, scala.collection.concurrent.TrieMap[String, DataFrame]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[SparkSession, scala.collection.concurrent.TrieMap[String, DataFrame]]): Boolean =
        size() > 16
    }

  /** Read one fixture table from the given scale-factor directory.
    *
    * The `events.ts` column is normalized to a session-zone (UTC)
    * microsecond TIMESTAMP whatever the fixture generation encoded:
    *  - TIMESTAMP(NANOS) parquet (earlier fixture rounds) reads as LONG
    *    nanoseconds under `spark.sql.legacy.parquet.nanosAsLong=true`
    *    (set in Verify/Bench sessions) → integer-divide to micros
    *    (`div`, not `/`: double division loses precision at ~1.7e18;
    *    truncation toward zero matches DuckDB's `CAST(ts_ns AS
    *    TIMESTAMP)`);
    *  - TIMESTAMP_NTZ (timestamp[us] fixtures) → value-preserving cast
    *    to TIMESTAMP (the session zone is pinned UTC, so wall-clock
    *    fields are unchanged and epoch math — `cast(ts as long)`,
    *    date_trunc, window ranges — behaves identically to the oracle's
    *    native timestamp).
    */
  def table(s: SparkSession, dir: String, name: String): DataFrame = {
    val perSession = planCache.synchronized {
      var m = planCache.get(s)
      if (m == null) { m = scala.collection.concurrent.TrieMap.empty; planCache.put(s, m) }
      m
    }
    perSession.getOrElseUpdate(s"$dir/$name", {
      val df = s.read.parquet(s"$dir/$name.parquet")
      df.schema.fields.find(_.name == "ts").map(_.dataType) match {
        case Some(org.apache.spark.sql.types.LongType) =>
          df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case Some(org.apache.spark.sql.types.TimestampNTZType) =>
          df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => df
      }
    })
  }
}
