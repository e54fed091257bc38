package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order clustering and sized writes.
  *
  * At 100 TB the dominant cost of a selective query is how much of the
  * corpus the scan can SKIP. Parquet skips at two granularities — files
  * (partition/range pruning) and row groups (min/max stats) — and both
  * depend entirely on how the writer laid the data out:
  *
  *  - [[zValue]]/[[zorderBy]]: interleave the bits of two key columns
  *    (Morton order) and range-partition + sort by the result. Rows
  *    close in EITHER dimension land close on disk, so min/max stats
  *    prune scans filtered on either column — the classic multi-
  *    dimensional clustering layout (same idea as Delta/Iceberg
  *    Z-ORDER). The interleave is plain codegen'd bitwise arithmetic
  *    (no UDF, no custom expression needed — and the identical formula
  *    runs in any SQL engine, which is what the conformance oracle
  *    does).
  *  - [[writeSized]]: compaction — range-repartition to a target
  *    file count and cap records per file. The small-files problem
  *    (10⁶ tiny files → footer-read dominated scans, starved
  *    split planning) is a layout bug, fixed at write time.
  */
object LayoutOps {

  private val SpreadSteps = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Spread a 16-bit non-negative value's bits to the even positions. */
  private def spread(c: Column): Column =
    SpreadSteps.foldLeft(c.cast("long")) { case (v, (sh, mask)) =>
      v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(mask))
    }

  /** A value outside [0, 2^16) would silently ALIAS under the spread
    * masks (spread(65536) == spread(256)): distinct key ranges would
    * interleave to identical z-values and min/max pruning would quietly
    * stop working — fail loudly per row instead (callers clamp with
    * pmod upstream, q53's regime). The SQL twin deliberately carries no
    * guard: the oracle replays already-validated values.
    */
  private def in16(c: Column): Column = {
    val v = c.cast("long")
    when(v < 0 || v > 65535,
      raise_error(concat(lit("zValue input outside [0, 65535]: "),
        c.cast("string"))))
      .otherwise(v)
  }

  /** Morton/Z-order value of two non-negative values < 2^16 (guarded —
    * see [[in16]]): bits of `x` at even positions, bits of `y` at odd.
    * Pure codegen'd bitwise arithmetic.
    */
  def zValue(x: Column, y: Column): Column =
    spread(in16(x)).bitwiseOR(shiftleft(spread(in16(y)), 1))

  /** The same interleave as ANSI SQL text (for cross-engine oracles) —
    * generated from the same constants so the engines cannot drift.
    */
  def sqlZValue(x: String, y: String): String = {
    def sqlSpread(e: String): String =
      SpreadSteps.foldLeft(s"CAST(($e) AS BIGINT)") { case (v, (sh, mask)) =>
        s"(($v | ($v << $sh)) & $mask)"
      }
    s"(${sqlSpread(x)} | (${sqlSpread(y)} << 1))"
  }

  /** Z-order-cluster a frame for writing: range-partition by the
    * interleaved key (equal-sized output files via range boundaries
    * sampled from the data, NOT hash buckets — neighboring z-values
    * must land in the same or adjacent files for min/max pruning to
    * bite), then sort within partitions.
    */
  def zorderBy(df: DataFrame, numFiles: Int, x: Column, y: Column): DataFrame = {
    require(!df.columns.contains("__z"),
      "input column __z collides with zorderBy's internal sort key — rename it")
    df.withColumn("__z", zValue(x, y))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Compaction write: range-repartition on `key` to `numFiles` roughly
    * equal files (keeping `key` order for min/max pruning), capped at
    * `maxRecordsPerFile` so late data growth splits files instead of
    * ballooning them.
    */
  def writeSized(df: DataFrame, path: String, key: Column,
      numFiles: Int, maxRecordsPerFile: Long, srcBytes: Long = -1L): Unit = {
    // size-adaptive (guide §2/§6): when the caller knows the SOURCE
    // generation's at-rest size (driver metadata, no job) and it fits
    // one healthy output file, skip the range layout — a model-sized
    // ledger split by repartitionByRange pays a range-boundary SAMPLING
    // job plus a range exchange to scatter tens of rows over `numFiles`
    // tiny files, the §6 small-files anti-pattern. A fold's output is
    // never larger than its input, so srcBytes bounds the output.
    // Big ledgers (srcBytes above the threshold, or unknown) keep the
    // sorted range layout that makes min/max pruning work at scale.
    val oneFileBytes = scala.util.Try(
        df.sparkSession.conf.get("spark.graft.compact.singleFileBytes").toLong)
      .getOrElse(64L * 1024 * 1024)
    if (srcBytes >= 0 && srcBytes <= oneFileBytes)
      df.repartition(1).sortWithinPartitions(key)
        .write.option("maxRecordsPerFile", maxRecordsPerFile)
        .mode("overwrite").parquet(path)
    else
      df.repartitionByRange(numFiles, key)
        .sortWithinPartitions(key)
        .write.option("maxRecordsPerFile", maxRecordsPerFile)
        .mode("overwrite").parquet(path)
  }

  /** Generic core: write `df` bucketed+sorted by `keyCol` at `path`,
    * register it as `name`, and return the registered table. Reuses an
    * existing registration only when its backing files are also present
    * — a catalog entry that outlives its files (persistent metastore,
    * recycled tmpdir) is silently rebuilt instead of read as a dead
    * path. The presence probe goes through the path's own Hadoop
    * FileSystem, so object-store URIs (s3://, hdfs://) reuse correctly
    * too — a local-disk `java.io.File` probe would report them absent
    * and re-shuffle the whole table on every call. This is the
    * write-once side of every co-located join: pay the shuffle at
    * layout time, join forever without one.
    */
  def writeBucketed(df: DataFrame, keyCol: String, buckets: Int,
      name: String, path: String): DataFrame = {
    val s = df.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    bucketLock.synchronized {
      if (!s.catalog.tableExists(name) || !fs.exists(p)) {
        df.write.format("parquet").bucketBy(buckets, keyCol).sortBy(keyCol)
          .option("path", path).mode("overwrite").saveAsTable(name)
      }
    }
    s.table(name)
  }

  /** Bucketed (co-located) join layout: both fact tables written ONCE
    * with `bucketBy(n, key)` on the join key, after which every join on
    * that key reads both sides already hash-distributed — zero Exchange
    * in the join subtree (PlanShapeSpec gates this via [[bucketedJoin]]).
    * At 100 TB this is THE layout decision: a repeated fact-fact join
    * pays its shuffle once at write time instead of on every query, and
    * bucket pruning serves point lookups on the key for free. The tables
    * are registered in the shared catalog keyed by the source dir, so
    * repeat calls (second bench pass, other sessions in the JVM) reuse
    * the files.
    */
  def bucketedTables(s: SparkSession, dir: String, buckets: Int = 8): (DataFrame, DataFrame) = {
    // Identity = (full dir path, bucket count): a different bucket count
    // gets its own tables (never a silent 8-bucket reuse), and distinct
    // dirs can't collide — the readable sanitized tag alone could (every
    // punctuation char collapses to '_'), so an md5 of the exact string
    // disambiguates. The files live under a per-JVM tmpdir so
    // concurrently running JVMs (Bench next to Verify) each write their
    // own copy instead of racing on one overwrite target. Source parquet
    // is assumed immutable for the JVM's lifetime — same contract as
    // Registry.table's plan cache.
    val key = s"$dir#$buckets"
    val tag = key.replaceAll("[^A-Za-z0-9]", "_") + "_" +
      java.security.MessageDigest.getInstance("MD5").digest(key.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
    val base = new java.io.File(
      System.getProperty("java.io.tmpdir"),
      s"graft_bucketed_pid${ProcessHandle.current.pid}_$tag").getAbsolutePath
    val o = writeBucketed(
      graft.queries.Registry.table(s, dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority"),
      "o_orderkey", buckets, s"graft_bkt_orders_$tag", s"$base/orders")
    val l = writeBucketed(
      graft.queries.Registry.table(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount"),
      "l_orderkey", buckets, s"graft_bkt_lineitem_$tag", s"$base/lineitem")
    (o, l)
  }

  private val bucketLock = new Object

  // One broadcast-disabled clone per (parent session, adaptive flag):
  // newSession() builds a full SessionState, far too heavy to pay per
  // bucketedJoin call inside a timed bench pass. WeakHashMap on the
  // parent keeps stopped sessions collectable (the clone holds no
  // context of its own).
  private val cloneCache =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[Boolean, SparkSession]]

  private def bucketSession(s: SparkSession, adaptive: Boolean): SparkSession =
    cloneCache.synchronized {
      var m = cloneCache.get(s)
      if (m == null) { m = scala.collection.mutable.Map.empty; cloneCache.put(s, m) }
      m.getOrElseUpdate(adaptive, {
        val s2 = s.newSession()
        s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        // the plan gate turns AQE off so the asserted static shape is
        // deterministic; the conformance query keeps it on
        s2.conf.set("spark.sql.adaptive.enabled", adaptive.toString)
        s2
      })
    }

  /** The co-located join itself (no aggregate) — what the no-Exchange
    * plan gate inspects. Broadcast is disabled on a cloned session so
    * the gate proves bucket co-location, not small-side luck.
    */
  def bucketedJoin(s: SparkSession, dir: String, adaptive: Boolean = true): DataFrame = {
    val (o, l) = bucketedTables(bucketSession(s, adaptive), dir)
    o.filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
  }
}
