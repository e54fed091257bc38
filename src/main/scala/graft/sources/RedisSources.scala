package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, StringContains, StringEndsWith, StringStartsWith}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.net.{RedisCommands, RedisConnection}

/** DataSource V2 connectors for the Redis keyspace — the Spark-native
  * re-expression of the reference's `redis_scan` TableFunction
  * (/root/reference/src/redduck_extension.cpp:125-322) and its
  * documented-but-unimplemented `redis_kv` (README.md:29-31).
  *
  *   spark.read.format("redis-scan").option("host", h).option("port", p)
  *     .option("pattern", "user:*").load()          // → (key_name STRING)
  *   spark.read.format("redis-kv")...load()          // → (key, value)
  *
  * Scale design: Redis `SCAN` is one logical cursor, so parity mode is a
  * single input partition (≈ the reference's hard `MaxThreads()==1`,
  * redduck_extension.cpp:154-156). The `partition.patterns` option
  * shards the keyspace into N disjoint glob patterns — one partition,
  * connection, and cursor each — which is how the source spreads over a
  * cluster (per-slot/hash-tag sharding on Redis Cluster plugs into the
  * same seam). Each partition owns its connection; nothing is shared
  * (the reference serializes everything behind process-global mutexes).
  *
  * Predicate pushdown translates key-column filters into server-side
  * `MATCH` globs (resurrecting the intent of the reference's dead
  * `SqlToResp`, resp_parser.cpp:136-144, with the `%`→`*` mapping it
  * got wrong — SURVEY §7.5b).
  */
object RedisSources {
  val ScanSchema: StructType = StructType(Seq(StructField("key_name", StringType, nullable = false)))
  val KvSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("value", StringType, nullable = true)))
  val HashSchema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("fields", MapType(StringType, StringType, valueContainsNull = false), nullable = false)))

  final case class Options(host: String, port: Int, pattern: String, count: Int,
      partitionPatterns: Seq[String], slots: Int, clusterMode: Boolean,
      auth: Option[String] = None, tls: Boolean = false,
      tlsTrustAll: Boolean = false, scanType: Option[String] = None,
      resp3: Boolean = false) {
    /** Disjoint pattern lists, one per input partition. */
    def effectivePatterns(pushed: Option[String]): Seq[Seq[String]] = pushed match {
      case Some(p) => Seq(Seq(p))
      case None =>
        if (partitionPatterns.nonEmpty) partitionPatterns.map(Seq(_))
        else if (slots > 1) slotPatterns(pattern, slots)
        else Seq(Seq(pattern))
    }
  }

  def parseOptions(m: util.Map[String, String]): Options = {
    val o = new CaseInsensitiveStringMap(m)
    val opts = Options(
      host = o.getOrDefault("host", "127.0.0.1"),
      port = o.getOrDefault("port", "6379").toInt,
      // requirepass / ACL credentials: "password" or "user password".
      // Preferred option name is "password" — it matches Spark's default
      // SQL-options redaction regex, so EXPLAIN/UI plan dumps mask it;
      // "auth" stays accepted for back-compat but is NOT auto-redacted.
      auth = Option(o.get("password")).orElse(Option(o.get("auth"))).filter(_.nonEmpty),
      // rediss://-style transport: TLS-wrap every connection;
      // tls.trustAll accepts self-signed certs (test/dev ONLY)
      tls = o.getOrDefault("tls", "false").toBoolean,
      tlsTrustAll = o.getOrDefault("tls.trustAll", "false").toBoolean,
      pattern = o.getOrDefault("pattern", "*"),
      count = o.getOrDefault("scan.count", "2048").toInt, // reference batch size, resp_parser.cpp:159-161
      // `SCAN ... TYPE t` server-side type filter (Redis ≥6.0): opt-in
      // so existing plans stay byte-identical; on a mixed keyspace
      // `.option("scan.type", "hash")` keeps string/stream keys from
      // ever crossing the wire
      scanType = Option(o.get("scan.type")).filter(_.nonEmpty).map { t =>
        val valid = Set("string", "list", "set", "zset", "hash", "stream")
        require(valid(t.toLowerCase),
          s"scan.type must be one of ${valid.toSeq.sorted.mkString("/")}, got '$t'")
        t.toLowerCase
      },
      // protocol negotiation: .option("resp", "3") sends HELLO 3 on every
      // connection (loud failure on pre-6.0 servers) — reply SHAPES differ
      // (map-typed HGETALL, set frames) but the parsed rows are identical,
      // pinned by spec
      resp3 = o.getOrDefault("resp", "2") match {
        case "2" => false
        case "3" => true
        case other => throw new IllegalArgumentException(
          s"resp must be '2' (default) or '3', got '$other'")
      },
      partitionPatterns = Option(o.get("partition.patterns")).toSeq
        .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)),
      slots = o.getOrDefault("partition.slots", "0").toInt,
      clusterMode = o.getOrDefault("partition.mode", "") match {
        case "" => false
        case "cluster" => true
        case other => throw new IllegalArgumentException(
          s"partition.mode must be 'cluster' (or unset), got '$other'")
      })
    require(!opts.clusterMode || (opts.partitionPatterns.isEmpty && opts.slots <= 1),
      "partition.mode=cluster already shards by node ownership; " +
        "it cannot combine with partition.patterns/partition.slots")
    opts
  }

  /** Cluster-driven partition planning: ask the seed node for
    * `CLUSTER SLOTS` and emit ONE partition per distinct MASTER node,
    * each running the (same) pattern's SCAN cursor against its own node.
    * On Redis Cluster `SCAN` iterates only the keys the node owns, so
    * per-node cursors are disjoint by slot ownership and jointly
    * exhaustive by the validated 0..16383 coverage — no pattern algebra
    * needed (unlike `partition.slots`' first-character sharding, which
    * this supersedes on a real cluster). Runs on the DRIVER once per
    * scan; at 1000 executors the partition count equals the node count,
    * which is exactly the parallelism the server side can serve.
    */
  def clusterPartitions(opts: Options, pushed: Option[String],
      limit: Option[Int], topN: Option[TopN]): Array[InputPartition] = {
    val conn = new RedisConnection(opts.host, opts.port, auth = opts.auth,
      tls = opts.tls, tlsTrustAll = opts.tlsTrustAll)
    val ranges = try RedisCommands.clusterSlots(conn) finally conn.close()
    val masters = ranges.map(r => (r.host, r.port)).distinct
    val pats = Seq(pushed.getOrElse(opts.pattern))
    masters.map { case (h, p) =>
      // Each partition remembers the slot ranges its node owned at PLAN
      // time: the reader re-checks ownership when its cursor completes,
      // so a reshard that migrated slots mid-scan fails loudly naming
      // them instead of returning a silently short result.
      val owned = ranges.filter(r => r.host == h && r.port == p)
        .map(r => (r.start, r.end))
      // cluster nodes share the deployment's credentials
      RedisInputPartition(h, p, pats, opts.count, limit, topN,
        auth = opts.auth, tls = opts.tls,
        tlsTrustAll = opts.tlsTrustAll, ownedSlots = owned,
        scanType = opts.scanType, resp3 = opts.resp3): InputPartition
    }.toArray
  }

  /** End-of-cursor reshard guard for cluster-mode partitions: re-fetch
    * `CLUSTER SLOTS` on the partition's own node and require every
    * plan-time range to still be owned here. Redis Cluster migrates
    * slots key-by-key, so a cursor that straddled a migration can have
    * MISSED keys (they left before the cursor reached them) with no
    * error anywhere — guaranteed-complete scans are impossible mid-
    * reshard (the same window Kafka calls an unclean leader election).
    * The honest contract is fail-loud-and-rerun: a rerun re-plans from
    * the NEW slot map. Single-key value fetches (MGET/HGETALL) already
    * follow one MOVED/ASK hop, so an in-flight migration only aborts
    * the scan when ownership actually changed.
    */
  def verifySlotOwnership(conn: RedisConnection, host: String, port: Int,
      owned: Seq[(Int, Int)]): Unit = {
    if (owned.isEmpty) return
    val now = RedisCommands.clusterSlots(conn) // re-validates 0..16383 coverage
    // every overlap of a plan-time range with a range now owned ELSEWHERE
    // is a migrated sub-range — report each with its new owner
    val moved = for {
      (s, e) <- owned
      r <- now if r.start <= e && s <= r.end
      if !(r.host == host && r.port == port)
    } yield s"[${math.max(s, r.start)},${math.min(e, r.end)}]→${r.host}:${r.port}"
    if (moved.nonEmpty)
      throw new java.io.IOException(
        s"cluster reshard during scan: node $host:$port no longer owns slots ${moved.mkString(", ")}; " +
          "results would be silently incomplete — rerun the scan to re-plan from the new slot map")
  }

  /** First-character alphabet used by `partition.slots` sharding — no glob
    * metacharacters, so class patterns need no escaping.
    */
  val SlotAlphabet: IndexedSeq[Char] =
    ('0' to '9') ++ ('A' to 'Z') ++ ('a' to 'z')

  /** Shard a `literal*` keyspace pattern into `slots` DISJOINT,
    * jointly-exhaustive pattern lists — one per input partition, each its
    * own connection + cursor:
    *
    *  - slots−1 partitions take `prefix[<chars>]*` character classes
    *    (round-robin split of [[SlotAlphabet]] on the first suffix char);
    *  - the last partition takes the complement class `prefix[^A..z]*`
    *    PLUS the exact-prefix literal (a key equal to the prefix has no
    *    suffix char and would otherwise match no shard).
    *
    * This is the standalone-Redis analog of per-slot cursor sharding on
    * Redis Cluster (`SCAN ... SLOT` style): the same partition seam takes
    * per-slot cursors when a cluster client lands here.
    */
  def slotPatterns(base: String, slots: Int): Seq[Seq[String]] = {
    require(slots >= 2 && slots <= SlotAlphabet.length + 1,
      s"partition.slots must be in 2..${SlotAlphabet.length + 1}, got $slots")
    require(base.nonEmpty && base.last == '*'
      && !base.dropRight(1).exists(c => "*?[]\\".contains(c)),
      s"partition.slots needs a 'literal*' pattern to shard, got '$base'")
    val prefix = base.dropRight(1)
    val g = slots - 1
    val classes = (0 until g).map(i => SlotAlphabet.zipWithIndex.collect {
      case (c, idx) if idx % g == i => c
    })
    classes.map(cs => Seq(s"$prefix[${cs.mkString}]*")) :+
      Seq(s"$prefix[^${SlotAlphabet.mkString}]*", globEscape(prefix))
  }

  /** Pushed ORDER BY key LIMIT n (scan mode only). */
  final case class TopN(ascending: Boolean, n: Int)

  /** Escape Redis glob metacharacters so a literal matches itself. */
  def globEscape(s: String): String =
    s.flatMap { c => if ("*?[]\\".contains(c)) s"\\$c" else c.toString }

  /** Translate one supported key filter to a glob; None = not translatable. */
  def filterToGlob(keyCol: String, f: Filter): Option[String] = f match {
    case EqualTo(c, v: String) if c == keyCol => Some(globEscape(v))
    case StringStartsWith(c, v) if c == keyCol => Some(globEscape(v) + "*")
    case StringEndsWith(c, v) if c == keyCol => Some("*" + globEscape(v))
    case StringContains(c, v) if c == keyCol => Some("*" + globEscape(v) + "*")
    case _ => None
  }
}

// ---------------------------------------------------------------------------
// providers

class RedisScanProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "redis-scan"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RedisSources.ScanSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RedisTable(fetchValues = false, RedisSources.parseOptions(properties))
}

class RedisKvProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "redis-kv"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RedisSources.KvSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RedisTable(fetchValues = true, RedisSources.parseOptions(properties))
}

/** Hash-typed keys as rows: SCAN pages resolved with one pipelined
  * HGETALL batch per page → (key, fields MAP<STRING,STRING>). The MapType
  * default is honest for dynamic hash fields (README.md:36-38 claims
  * STRUCT — project with `fields['name']` or
  * `RedduckFunctions.withHashFields` for a typed view). String-typed keys
  * return empty maps (HGETALL on a string errors in real Redis only for
  * WRONGTYPE — callers scope the pattern to hash keys, same contract as
  * the reference docs).
  */
class RedisHashProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "redis-hash"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RedisSources.HashSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = RedisSources.parseOptions(properties)
    new Table with SupportsRead {
      override def name(): String = s"redis-hash(${opts.host}:${opts.port}, ${opts.pattern})"
      override def schema(): StructType = RedisSources.HashSchema
      override def capabilities(): util.Set[TableCapability] =
        util.EnumSet.of(TableCapability.BATCH_READ)
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        new ScanBuilder with SupportsPushDownFilters {
          private var pushedGlob: Option[String] = None
          private var pushedArr: Array[org.apache.spark.sql.sources.Filter] = Array.empty

          override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
              : Array[org.apache.spark.sql.sources.Filter] = {
            // same one-glob MATCH pushdown as the scan/kv sources
            val canPush = opts.pattern == "*" && opts.partitionPatterns.isEmpty && opts.slots <= 1
            if (canPush) {
              val (tr, rest) = filters.partition(f =>
                RedisSources.filterToGlob("key", f).isDefined)
              tr.headOption.foreach(f => pushedGlob = RedisSources.filterToGlob("key", f))
              pushedArr = tr.take(1)
              rest ++ tr.drop(1)
            } else { pushedArr = Array.empty; filters }
          }
          override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushedArr

          override def build(): Scan = new Scan with Batch {
            override def readSchema(): StructType = RedisSources.HashSchema
            override def description(): String =
              s"RedisHashScan(patterns=${opts.effectivePatterns(pushedGlob).map(_.mkString("|")).mkString(",")}, count=${opts.count})"
            override def toBatch: Batch = this
            override def planInputPartitions(): Array[InputPartition] =
              if (opts.clusterMode)
                RedisSources.clusterPartitions(opts, pushedGlob, None, None)
              else opts.effectivePatterns(pushedGlob)
                .map(ps => RedisInputPartition(opts.host, opts.port, ps, opts.count,
                  auth = opts.auth, tls = opts.tls,
                  tlsTrustAll = opts.tlsTrustAll,
                  scanType = opts.scanType, resp3 = opts.resp3): InputPartition)
                .toArray
            override def createReaderFactory(): PartitionReaderFactory =
              (partition: InputPartition) =>
                new RedisHashPartitionReader(partition.asInstanceOf[RedisInputPartition])
          }
        }
    }
  }
}

class RedisHashPartitionReader(p: RedisInputPartition)
    extends PartitionReader[InternalRow] {
  import org.apache.spark.sql.catalyst.util.ArrayBasedMapData

  private val conn = new RedisConnection(p.host, p.port, auth = p.auth,
    tls = p.tls, tlsTrustAll = p.tlsTrustAll, resp3 = p.resp3)
  private var cursor = "0"
  private var patternIdx = 0
  private var done = false
  private var batch: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (!batch.hasNext && !done) {
      val (next, keys) = RedisCommands.scanPage(conn, cursor, p.patterns(patternIdx), p.count, p.scanType)
      cursor = next
      if (cursor == "0") {
        patternIdx += 1
        cursor = "0"
        if (patternIdx >= p.patterns.length) done = true
      }
      if (keys.nonEmpty) {
        val maps = RedisCommands.hgetallPipelined(conn, keys)
        batch = keys.iterator.zip(maps.iterator).map { case (k, m) =>
          val sorted = m.toSeq.sortBy(_._1) // deterministic field order
          InternalRow(UTF8String.fromString(k),
            ArrayBasedMapData(
              sorted.map(e => UTF8String.fromString(e._1)).toArray,
              sorted.map(e => UTF8String.fromString(e._2)).toArray))
        }
      }
    }
    if (batch.hasNext) { current = batch.next(); true }
    else {
      if (!guarded) { // cluster mode: reshard-during-scan fails loudly
        guarded = true
        RedisSources.verifySlotOwnership(conn, p.host, p.port, p.ownedSlots)
      }
      false
    }
  }
  private var guarded = false

  override def get(): InternalRow = current
  override def close(): Unit = conn.close()
}

// ---------------------------------------------------------------------------
// table / scan

class RedisTable(fetchValues: Boolean, opts: RedisSources.Options)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String =
    s"redis-${if (fetchValues) "kv" else "scan"}(${opts.host}:${opts.port}, ${opts.pattern})"
  override def schema(): StructType =
    if (fetchValues) RedisSources.KvSchema else RedisSources.ScanSchema
  override def capabilities(): util.Set[TableCapability] =
    if (fetchValues) util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
    else util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RedisScanBuilder(fetchValues, opts)

  /** Write path (kv mode): `df.write.format("redis-kv").mode("append")` —
    * each partition pipelines SET commands in `scan.count`-sized batches
    * over its own connection (the reverse of the read path's pipelined
    * MGET; a feature-store writeback at 100 TB is embarrassingly parallel
    * because SET is per-key idempotent upsert). Input must be
    * (key STRING, value STRING); NULL values are skipped.
    */
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    require(fetchValues, "redis-scan is read-only; write with format(\"redis-kv\")")
    val schema = info.schema()
    require(schema.fieldNames.toSeq == Seq("key", "value"),
      s"redis-kv write expects columns (key, value), got ${schema.fieldNames.mkString(",")}")
    new org.apache.spark.sql.connector.write.WriteBuilder {
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
            new RedisBatchWrite(opts)
        }
    }
  }
}

class RedisBatchWrite(opts: RedisSources.Options)
    extends org.apache.spark.sql.connector.write.BatchWrite {
  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new RedisDataWriterFactory(opts.host, opts.port, opts.count, opts.auth,
      opts.tls, opts.tlsTrustAll, opts.resp3)
  override def commit(messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = ()
  // no coordinator: SET is an idempotent upsert, so task retries are safe
  override def useCommitCoordinator(): Boolean = false
}

final case class RedisWriteCommit(written: Long)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

class RedisDataWriterFactory(host: String, port: Int, batchSize: Int,
    auth: Option[String] = None, tls: Boolean = false,
    tlsTrustAll: Boolean = false, resp3: Boolean = false)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new org.apache.spark.sql.connector.write.DataWriter[InternalRow] {
      // resp3 rides to the WRITE connections too: resp=3 documents
      // "HELLO 3 on every connection", and silently leaving writers on
      // RESP2 would defeat protocol pinning against a RESP3-required
      // proxy
      private val conn = new RedisConnection(host, port, auth = auth,
        tls = tls, tlsTrustAll = tlsTrustAll, resp3 = resp3)
      private val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
      private var written = 0L

      private def flush(): Unit = if (buf.nonEmpty) {
        val replies = conn.pipeline(buf.toSeq.map { case (k, v) => Seq("SET", k, v) })
        replies.foreach {
          case graft.resp.RespValue.Err(m) => throw new java.io.IOException(s"SET failed: $m")
          case _ => ()
        }
        written += buf.length
        buf.clear()
      }

      override def write(row: InternalRow): Unit = {
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          buf += ((row.getUTF8String(0).toString, row.getUTF8String(1).toString))
          if (buf.length >= batchSize) flush()
        }
      }
      override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
        flush()
        RedisWriteCommit(written)
      }
      override def abort(): Unit = buf.clear()
      override def close(): Unit = conn.close()
    }
}

class RedisScanBuilder(fetchValues: Boolean, opts: RedisSources.Options)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownTopN {
  private val keyCol = if (fetchValues) "key" else "key_name"
  private var pushedGlob: Option[String] = None
  private var pushed: Array[Filter] = Array.empty
  private var pushedLimit: Option[Int] = None
  private var pushedTopN: Option[RedisSources.TopN] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // Push at most one translatable key filter into the server-side MATCH
    // glob — only when no explicit pattern/slot sharding would conflict.
    val canPush = opts.pattern == "*" && opts.partitionPatterns.isEmpty && opts.slots <= 1
    if (canPush) {
      val (tr, rest) = filters.partition(f => RedisSources.filterToGlob(keyCol, f).isDefined)
      tr.headOption.foreach { f => pushedGlob = RedisSources.filterToGlob(keyCol, f) }
      pushed = tr.take(1)
      rest ++ tr.drop(1) // untranslated + extra translatable stay residual
    } else { pushed = Array.empty; filters }
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** Plain LIMIT n: each partition stops its SCAN cursor after n matched
    * keys — on a 10⁸-key keyspace that is ~1 page of round trips instead
    * of the full cursor walk. Partial (returns false): with multiple
    * partitions each emits up to n rows, so Spark's own Limit finishes.
    */
  override def pushLimit(limit: Int): Boolean = {
    pushedLimit = Some(limit)
    false
  }

  /** ORDER BY <key> [ASC|DESC] LIMIT n: SCAN order is arbitrary, so the
    * cursor must still drain — but each partition keeps only a bounded
    * n-element heap and emits n keys instead of the whole keyspace (the
    * transfer/memory win at scale). Partial: Spark re-sorts the ≤
    * n×partitions survivors.
    */
  override def pushTopN(orders: Array[SortOrder], limit: Int): Boolean = {
    val sortable = !fetchValues && orders.length == 1 && (orders(0).expression() match {
      case f: NamedReference => f.fieldNames().sameElements(Array(keyCol))
      case _ => false
    })
    if (sortable) {
      pushedTopN = Some(RedisSources.TopN(
        ascending = orders(0).direction() == SortDirection.ASCENDING, n = limit))
      true
    } else false
  }
  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan =
    new RedisScan(fetchValues, opts, pushedGlob, pushedLimit, pushedTopN)
}

class RedisScan(fetchValues: Boolean, opts: RedisSources.Options, pushedGlob: Option[String],
    pushedLimit: Option[Int], pushedTopN: Option[RedisSources.TopN])
    extends Scan with Batch {
  override def readSchema(): StructType =
    if (fetchValues) RedisSources.KvSchema else RedisSources.ScanSchema
  override def description(): String = {
    val extras = pushedTopN.map(t => s", topN=${t.n} ${if (t.ascending) "ASC" else "DESC"}")
      .orElse(pushedLimit.map(l => s", limit=$l")).getOrElse("")
    s"RedisScan(patterns=${opts.effectivePatterns(pushedGlob).map(_.mkString("|")).mkString(",")}, count=${opts.count}$extras)"
  }
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    if (opts.clusterMode)
      RedisSources.clusterPartitions(opts, pushedGlob, pushedLimit, pushedTopN)
    else opts.effectivePatterns(pushedGlob)
      .map(ps => RedisInputPartition(opts.host, opts.port, ps, opts.count,
        pushedLimit, pushedTopN, auth = opts.auth, tls = opts.tls,
        tlsTrustAll = opts.tlsTrustAll, scanType = opts.scanType,
        resp3 = opts.resp3): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new RedisReaderFactory(fetchValues)
}

/** One partition = one connection running one SCAN cursor per pattern in
  * `patterns`, sequentially (slot shards put the complement class + the
  * exact-prefix literal in the same partition).
  */
final case class RedisInputPartition(host: String, port: Int, patterns: Seq[String], count: Int,
    limit: Option[Int] = None, topN: Option[RedisSources.TopN] = None,
    auth: Option[String] = None, tls: Boolean = false,
    tlsTrustAll: Boolean = false,
    // cluster mode: slot ranges this node owned at plan time (empty =
    // standalone; readers re-verify ownership at cursor end)
    ownedSlots: Seq[(Int, Int)] = Nil,
    // `SCAN ... TYPE t` server-side filter (scan.type option)
    scanType: Option[String] = None,
    // HELLO 3 per connection (resp option)
    resp3: Boolean = false)
    extends InputPartition {
  // case-class toString would print the credential into task logs /
  // debug dumps — mask it (present/absent is all an operator needs)
  override def toString: String =
    s"RedisInputPartition($host,$port,${patterns.mkString("|")},$count," +
      s"limit=$limit,topN=$topN,auth=${if (auth.isDefined) "***" else "none"}," +
      s"tls=$tls,tlsTrustAll=$tlsTrustAll" +
      scanType.map(t => s",type=$t").getOrElse("") + ")"
}

class RedisReaderFactory(fetchValues: Boolean) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RedisInputPartition]
    new RedisPartitionReader(p, fetchValues)
  }

  /** Columnar handoff (SURVEY §1.1 optimization item, completed r17):
    * key scans AND kv scans emit one ColumnarBatch per SCAN page, so
    * Spark's codegen'd ColumnarToRow consumes vectors instead of
    * row-at-a-time InternalRows — kv pages resolve with the same ONE
    * pipelined MGET as the row path, missing keys landing as vector
    * nulls. Only pushed-topN (bounded heap with cross-page state)
    * keeps the row reader.
    */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    partition.asInstanceOf[RedisInputPartition].topN.isEmpty

  override def createColumnarReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val p = partition.asInstanceOf[RedisInputPartition]
    new RedisColumnarPartitionReader(p, fetchValues)
  }
}

/** Columnar key / kv scan: the SCAN cursor loop of
  * [[RedisPartitionReader]], emitting each page as one ColumnarBatch —
  * one string vector for key-only scans, (key, value) vectors with
  * null-slot misses for kv mode.
  */
class RedisColumnarPartitionReader(p: RedisInputPartition, fetchValues: Boolean)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val conn = new RedisConnection(p.host, p.port, auth = p.auth,
    tls = p.tls, tlsTrustAll = p.tlsTrustAll, resp3 = p.resp3)
  private var cursor = "0"
  private var patternIdx = 0
  private var done = false
  private var current: ColumnarBatch = _
  private var remaining: Int = p.limit.getOrElse(Int.MaxValue)

  override def next(): Boolean = {
    if (current != null) { current.close(); current = null }
    while (!done) {
      val (next, keys) = RedisCommands.scanPage(conn, cursor, p.patterns(patternIdx), p.count, p.scanType)
      cursor = next
      if (cursor == "0") {
        patternIdx += 1
        cursor = "0"
        if (patternIdx >= p.patterns.length) done = true
      }
      val page = limitPage(keys)
      if (page.nonEmpty) {
        val keyVec = new OnHeapColumnVector(page.length, StringType)
        var i = 0
        while (i < page.length) {
          val bytes = page(i).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          keyVec.putByteArray(i, bytes, 0, bytes.length)
          i += 1
        }
        current =
          if (!fetchValues) new ColumnarBatch(Array(keyVec), page.length)
          else {
            // same one-pipelined-MGET-per-page as the row reader;
            // a nil reply (missing/expired key) is a vector null.
            // toIndexedSeq: the while loop below indexes — a linked
            // Seq would make the page fill quadratic
            val values = RedisCommands.mget(conn, page).toIndexedSeq
            val valVec = new OnHeapColumnVector(page.length, StringType)
            var j = 0
            while (j < page.length) {
              values(j) match {
                case Some(v) =>
                  val b = v.getBytes(java.nio.charset.StandardCharsets.UTF_8)
                  valVec.putByteArray(j, b, 0, b.length)
                case None => valVec.putNull(j)
              }
              j += 1
            }
            new ColumnarBatch(Array(keyVec, valVec), page.length)
          }
        return true
      }
    }
    if (!guarded && !limitHit) { // cluster reshard-during-scan fails loudly
      guarded = true              // (skipped when a pushed LIMIT stopped us)
      RedisSources.verifySlotOwnership(conn, p.host, p.port, p.ownedSlots)
    }
    false
  }
  private var guarded = false
  private var limitHit = false
  // distinct-key LIMIT accounting — see RedisPartitionReader.limitPage
  private val seenForLimit =
    if (p.limit.isDefined) new java.util.HashSet[String]() else null
  private def limitPage(keys: Seq[String]): Seq[String] = {
    if (remaining == Int.MaxValue) return keys
    val fresh = keys.filter(seenForLimit.add)
    val page = if (fresh.length > remaining) fresh.take(remaining) else fresh
    remaining -= page.length
    if (remaining <= 0) { done = true; limitHit = true } // pushed LIMIT satisfied
    page
  }

  override def get(): ColumnarBatch = current

  override def close(): Unit = {
    if (current != null) current.close()
    conn.close()
  }
}

/** Runs the SCAN cursor loop (≈ `FetchNextBatch`,
  * redduck_extension.cpp:166-228): one page per round trip, internal
  * retry on empty-but-not-done pages, done when the cursor returns "0".
  * In kv mode each page is resolved with one pipelined MGET (the batched
  * replacement for the reference's per-row GET, SURVEY §3.3).
  */
class RedisPartitionReader(p: RedisInputPartition, fetchValues: Boolean)
    extends PartitionReader[InternalRow] {

  private val conn = new RedisConnection(p.host, p.port, auth = p.auth,
    tls = p.tls, tlsTrustAll = p.tlsTrustAll, resp3 = p.resp3)
  private var cursor = "0"
  private var patternIdx = 0
  private var done = false
  private var batch: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _
  // plain-LIMIT budget: stop the cursor as soon as enough keys matched
  private var remaining: Int = p.limit.filter(_ => p.topN.isEmpty).getOrElse(Int.MaxValue)

  override def next(): Boolean = {
    p.topN match {
      case Some(t) if batch.isEmpty && !done => batch = drainTopN(t)
      case _ => ()
    }
    while (!batch.hasNext && !done) fetchNextBatch()
    if (batch.hasNext) { current = batch.next(); true }
    else { reshardGuard(); false }
  }

  // cluster mode: fail loudly (never silently short) if this node's
  // plan-time slots moved while the cursor was walking. NOT run when
  // the cursor stopped because a pushed LIMIT was satisfied: a
  // LIMIT-without-ORDER answer of any n DISTINCT matching keys cannot
  // be "incomplete", and the extra CLUSTER SLOTS round trip would tax
  // exactly the fast path the pushdown exists for. The distinctness
  // matters: SCAN may return a key twice during rehash/migration
  // (documented Redis behavior), so the limit budget counts distinct
  // keys via a seen-set (bounded by the scanned prefix, ≈ n + one
  // page) — without it a duplicate could occupy one of the n slots.
  private var guarded = false
  private var limitHit = false
  private val seenForLimit =
    if (p.limit.exists(_ => p.topN.isEmpty)) new java.util.HashSet[String]() else null
  private def reshardGuard(): Unit = if (!guarded && !limitHit) {
    guarded = true
    RedisSources.verifySlotOwnership(conn, p.host, p.port, p.ownedSlots)
  }
  /** Apply the pushed-LIMIT budget to a SCAN page: distinct-key
    * accounting, early cursor stop when the budget is spent.
    */
  private def limitPage(keys: Seq[String]): Seq[String] = {
    if (remaining == Int.MaxValue) return keys
    val fresh = keys.filter(seenForLimit.add)
    val page = if (fresh.length > remaining) fresh.take(remaining) else fresh
    remaining -= page.length
    if (remaining <= 0) { done = true; limitHit = true } // pushed LIMIT satisfied
    page
  }

  override def get(): InternalRow = current

  /** Cursor end: advance to this partition's next pattern, if any. */
  private def cursorDone(): Unit = {
    patternIdx += 1
    cursor = "0"
    if (patternIdx >= p.patterns.length) done = true
  }

  private def fetchNextBatch(): Unit = {
    val (next, keys) = RedisCommands.scanPage(conn, cursor, p.patterns(patternIdx), p.count, p.scanType)
    cursor = next
    if (cursor == "0") cursorDone()
    val page = limitPage(keys)
    if (page.nonEmpty) {
      batch = if (!fetchValues) {
        page.iterator.map(k => InternalRow(UTF8String.fromString(k)))
      } else {
        val values = RedisCommands.mget(conn, page)
        page.iterator.zip(values.iterator).map { case (k, v) =>
          InternalRow(UTF8String.fromString(k),
            v.map(UTF8String.fromString).orNull)
        }
      }
    }
  }

  /** Pushed ORDER BY key LIMIT n: drain the cursor (SCAN order is
    * arbitrary — every key must be seen) but keep only an n-element
    * bounded heap, so the partition emits n keys, not the keyspace.
    */
  private def drainTopN(t: RedisSources.TopN): Iterator[InternalRow] = {
    // The heap MUST select with Spark's StringType ordering — UTF8String
    // binary (code-point) order — not java.lang.String's UTF-16 code-unit
    // order; they disagree on supplementary characters (emoji sort AFTER
    // U+FFFF in binary order but before it in UTF-16), and keys dropped
    // here are gone before Spark's re-sort can fix them.
    val utf8Asc = new Ordering[UTF8String] {
      def compare(a: UTF8String, b: UTF8String): Int = a.compareTo(b)
    }
    val ord = if (t.ascending) utf8Asc else utf8Asc.reverse
    // max-heap of the n best-so-far: root is the WORST kept key
    val heap = new java.util.PriorityQueue[UTF8String](math.max(1, t.n), ord.reverse)
    // SCAN may return a key TWICE during a rehash/migration (the same
    // documented behavior the LIMIT path dedups with its seen-set):
    // without the dedup both copies would occupy heap slots, evicting a
    // distinct key that belongs in the true top-n — and evicted keys
    // are gone before Spark's re-sort can restore them. The set is
    // bounded by the keys ADMITTED to the heap's vicinity, not the
    // keyspace: only keys that beat the current worst are remembered.
    val seen = new java.util.HashSet[UTF8String]()
    while (!done) {
      val (next, keys) = RedisCommands.scanPage(conn, cursor, p.patterns(patternIdx), p.count, p.scanType)
      cursor = next
      if (cursor == "0") cursorDone()
      keys.foreach { s =>
        val k = UTF8String.fromString(s)
        if (heap.size < t.n) {
          if (seen.add(k)) heap.add(k)
        } else if (heap.size > 0 && ord.lt(k, heap.peek()) && seen.add(k)) {
          seen.remove(heap.poll())
          heap.add(k)
        }
      }
    }
    val out = new Array[UTF8String](heap.size)
    var i = out.length - 1
    while (i >= 0) { out(i) = heap.poll(); i -= 1 } // heap pops worst-first
    out.iterator.map(k => InternalRow(k))
  }

  override def close(): Unit = conn.close()
}
