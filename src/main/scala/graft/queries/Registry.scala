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

  /** Register a pid-scoped conformance scratch path for deletion at JVM
    * exit. The query RESULT reads these paths lazily, so they cannot be
    * deleted when the query builder returns — but without cleanup every
    * Bench/Verify process accretes one directory set under /tmp forever.
    * One hook per distinct path; pure java.io so it still works after
    * the SparkSession is stopped.
    */
  def scratchDir(path: String): String = {
    if (scratchHooked.add(path))
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(new java.io.File(path))))
    path
  }
  private val scratchHooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def deleteRec(f: java.io.File): Unit =
    try {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
      f.delete(): Unit
    } catch { case _: Throwable => () }

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
