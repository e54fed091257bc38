package graft.sources

import java.util
import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.net.{RedisCommands, RedisConnection}

/** Structured Streaming source over the Redis keyspace: each micro-batch
  * emits the keys that APPEARED since the previous batch (snapshot diff
  * via SCAN) — the SURVEY §7 "streaming Redis source" stretch item.
  *
  *   spark.readStream.format("redis-key-stream")
  *     .option("host", h).option("port", p).option("pattern", "user:*")
  *     .load()                                     // → (key_name STRING)
  *
  * Design notes:
  *  - Keyspace notifications (`notify-keyspace-events` + SUBSCRIBE) are
  *    Redis pub/sub, which is fire-and-forget: a dropped subscriber loses
  *    events, so notifications cannot back a replayable offset log either.
  *    Polling SCAN snapshots gives the same at-most-once arrival semantics
  *    with strictly simpler machinery and no server reconfiguration.
  *  - Like Spark's own socket source, this source is NOT fault-tolerant:
  *    offsets index an in-driver buffer of pending batches, so a restarted
  *    query re-seeds from the current keyspace instead of replaying. Use
  *    it for monitoring/ingest-trigger pipelines, not exactly-once ETL.
  *  - Driver state is the seen-key set (bounded by keyspace size). The
  *    SCAN itself runs driver-side per trigger — one cursor, same cost
  *    model as the reference's scan; executors only read the diff.
  *  - Deletions are not emitted (a SCAN diff sees only appearances);
  *    `key_name` matches the batch `redis-scan` schema so downstream
  *    plans (joins against `redis_kv`, `redis_get` lookups) are reusable.
  */
class RedisKeyStreamProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "redis-key-stream"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RedisSources.ScanSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RedisStreamTable(RedisSources.parseOptions(properties))
}

class RedisStreamTable(opts: RedisSources.Options) extends Table with SupportsRead {
  override def name(): String = s"redis-key-stream(${opts.host}:${opts.port}, ${opts.pattern})"
  override def schema(): StructType = RedisSources.ScanSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = RedisSources.ScanSchema
        override def description(): String =
          s"RedisKeyStream(pattern=${opts.pattern}, count=${opts.count})"
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new RedisKeyMicroBatchStream(opts)
      }
    }
}

/** Offset = number of snapshots taken so far. */
final case class RedisStreamOffset(snapshot: Long) extends Offset {
  override def json(): String = snapshot.toString
}

class RedisKeyMicroBatchStream(opts: RedisSources.Options)
    extends MicroBatchStream with SupportsAdmissionControl {
  private val seen = mutable.HashSet[String]()
  private val pending = mutable.TreeMap[Long, Seq[String]]()
  private var snapshot = 0L
  private var initialized = false

  private def scanKeys(): Seq[String] = {
    val conn = new RedisConnection(opts.host, opts.port, auth = opts.auth,
      tls = opts.tls, tlsTrustAll = opts.tlsTrustAll)
    try {
      val out = Seq.newBuilder[String]
      var cursor = "0"
      var first = true
      while (first || cursor != "0") {
        first = false
        val (next, keys) = RedisCommands.scanPage(conn, cursor, opts.pattern, opts.count)
        cursor = next
        out ++= keys
      }
      out.result()
    } finally conn.close()
  }

  override def initialOffset(): Offset = RedisStreamOffset(0L)

  // Admission-control form: Spark hands us the START offset, which on a
  // checkpoint restart is the restored committed offset N while this fresh
  // instance's counter still sits at 0. Without the fast-forward the next
  // snapshot would be numbered 1, planInputPartitions(N, 1) would emit
  // nothing, and commit(1) would drop the buffered keys — silently
  // swallowing the documented re-seed batch. Jumping the counter to N makes
  // the first post-restart snapshot land at N+1 and actually re-emit the
  // current keyspace. (The no-arg latestOffset() is never called once
  // SupportsAdmissionControl is implemented.)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = synchronized {
    val restored = start.asInstanceOf[RedisStreamOffset].snapshot
    if (restored > snapshot) snapshot = restored
    val current = scanKeys()
    val fresh = current.filterNot(seen)
    // the first snapshot is batch 1: existing keys are "new" to the query
    if (fresh.nonEmpty || !initialized) {
      initialized = true
      snapshot += 1
      seen ++= fresh
      pending(snapshot) = fresh
    }
    RedisStreamOffset(snapshot)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = synchronized {
    val s = start.asInstanceOf[RedisStreamOffset].snapshot
    val e = end.asInstanceOf[RedisStreamOffset].snapshot
    val keys = pending.range(s + 1, e + 1).values.flatten.toArray
    Array(RedisKeyBatch(keys))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val keys = partition.asInstanceOf[RedisKeyBatch].keys
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < keys.length }
        override def get(): InternalRow = InternalRow(UTF8String.fromString(keys(i)))
        override def close(): Unit = ()
      }
    }

  override def deserializeOffset(json: String): Offset = synchronized {
    val restored = json.toLong
    // Checkpoint restart: the committed offset N survives but this stream's
    // in-memory counter restarts at 0. Without fast-forwarding, the next
    // snapshot would be numbered 1 and planInputPartitions(N, 1) would emit
    // nothing (and commit would drop the buffered keys) until the counter
    // climbed past N — silently swallowing the re-seed batch. Jumping the
    // counter to N makes the first post-restart snapshot land at N+1, so
    // the current keyspace is actually re-emitted as documented above.
    if (restored > snapshot) snapshot = restored
    RedisStreamOffset(restored)
  }

  override def commit(end: Offset): Unit = synchronized {
    val e = end.asInstanceOf[RedisStreamOffset].snapshot
    pending.keys.takeWhile(_ <= e).toSeq.foreach(pending.remove)
  }

  override def stop(): Unit = ()
}

final case class RedisKeyBatch(keys: Array[String]) extends InputPartition
