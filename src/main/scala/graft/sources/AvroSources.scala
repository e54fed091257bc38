package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => AvroSchema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Avro container-file interchange (writer + DSv2 reader) built directly
  * on the `org.apache.avro` core library that ships with Spark's jars —
  * the spark-avro CONNECTOR module is deliberately not a dependency
  * (zero-egress build), and this surface needs only the flat-relational
  * subset the engine's other interchange formats (csv/jdbc/xml) speak.
  *
  *   AvroIO.write(df, dir)                      // one .avro file per partition
  *   spark.read.format("graft-avro").load(dir)  // schema inferred from the files
  *
  * Type mapping (both directions, Avro logical types per the public
  * Avro 1.12 spec — nullability = union(null, T)):
  *   boolean/int/long/float/double/string/bytes ↔ the obvious Catalyst
  *   atomics; DateType ↔ int+`date`; TimestampType ↔ long+
  *   `timestamp-micros`; DecimalType(p,s) ↔ bytes+`decimal(p,s)`
  *   (two's-complement unscaled big-endian, the spec's encoding).
  * Nested/complex Catalyst types fail loudly at write (and unknown Avro
  * shapes at read) — flat-relational by design, like the q62 JDBC
  * surface.
  *
  * Scale shape: the writer emits one container file per input
  * partition from the executors (no driver collect), so read
  * parallelism equals write parallelism; the reader plans one
  * partition per file and streams records through Avro's decoder
  * (container-file blocks bound memory). Task-sized files are the
  * operating assumption, as with the engine's other interchange
  * writers; finer-than-file splitting (Avro sync markers) is what the
  * connector module exists for and is out of scope here.
  */
object AvroIO {

  /** Spark → Avro schema for the supported flat-relational subset. */
  def toAvroSchema(schema: StructType, recordName: String = "spark_row"): AvroSchema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case BooleanType => AvroSchema.create(AvroSchema.Type.BOOLEAN)
        case IntegerType => AvroSchema.create(AvroSchema.Type.INT)
        case LongType => AvroSchema.create(AvroSchema.Type.LONG)
        case FloatType => AvroSchema.create(AvroSchema.Type.FLOAT)
        case DoubleType => AvroSchema.create(AvroSchema.Type.DOUBLE)
        case StringType => AvroSchema.create(AvroSchema.Type.STRING)
        case BinaryType => AvroSchema.create(AvroSchema.Type.BYTES)
        case DateType =>
          LogicalTypes.date().addToSchema(AvroSchema.create(AvroSchema.Type.INT))
        case TimestampType => LogicalTypes.timestampMicros()
          .addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
        case d: DecimalType => LogicalTypes.decimal(d.precision, d.scale)
          .addToSchema(AvroSchema.create(AvroSchema.Type.BYTES))
        case other => throw new IllegalArgumentException(
          s"graft-avro: column '${f.name}' has unsupported type " +
            s"${other.simpleString} — the surface is flat-relational " +
            "(boolean/int/long/float/double/string/binary/date/timestamp/decimal)")
      }
      val t = if (f.nullable)
        AvroSchema.createUnion(util.Arrays.asList(
          AvroSchema.create(AvroSchema.Type.NULL), base))
      else base
      new AvroSchema.Field(f.name, t, null, null)
    }
    AvroSchema.createRecord(recordName, null, "graft", false, util.Arrays.asList(fields: _*))
  }

  /** Avro → Spark schema; inverse of [[toAvroSchema]], rejecting shapes
    * outside the documented subset loudly.
    */
  def toSparkSchema(schema: AvroSchema): StructType = {
    require(schema.getType == AvroSchema.Type.RECORD,
      s"graft-avro: top-level Avro type must be a record, got ${schema.getType}")
    StructType(schema.getFields.asScala.map { f =>
      val (t, nullable) = unwrap(f.schema(), f.name())
      StructField(f.name(), t, nullable)
    }.toArray)
  }

  private def unwrap(s: AvroSchema, field: String): (DataType, Boolean) =
    s.getType match {
      case AvroSchema.Type.UNION =>
        val branches = s.getTypes.asScala
        val nonNull = branches.filter(_.getType != AvroSchema.Type.NULL)
        require(nonNull.length == 1 && branches.length <= 2,
          s"graft-avro: field '$field' has a non-nullable-union schema $s — " +
            "only union(null, T) is supported")
        (atomic(nonNull.head, field), true)
      case _ => (atomic(s, field), false)
    }

  private def atomic(s: AvroSchema, field: String): DataType =
    (s.getType, Option(s.getLogicalType)) match {
      case (AvroSchema.Type.INT, Some(_: LogicalTypes.Date)) => DateType
      case (AvroSchema.Type.LONG, Some(_: LogicalTypes.TimestampMicros)) => TimestampType
      case (AvroSchema.Type.BYTES, Some(d: LogicalTypes.Decimal)) =>
        DecimalType(d.getPrecision, d.getScale)
      case (AvroSchema.Type.BOOLEAN, _) => BooleanType
      case (AvroSchema.Type.INT, _) => IntegerType
      case (AvroSchema.Type.LONG, _) => LongType
      case (AvroSchema.Type.FLOAT, _) => FloatType
      case (AvroSchema.Type.DOUBLE, _) => DoubleType
      case (AvroSchema.Type.STRING, _) => StringType
      case (AvroSchema.Type.BYTES, _) => BinaryType
      case (t, _) => throw new IllegalArgumentException(
        s"graft-avro: field '$field' has unsupported Avro type $t — " +
          "flat-relational subset only")
    }

  /** Write `df` under `dir`, replacing its previous contents — a thin
    * alias for `df.write.format("graft-avro").mode("overwrite").save(dir)`,
    * so it carries the SAME staged-commit protocol as the DSv2 face
    * (task retries / speculative duplicates can never surface a torn
    * file; a pre-commit failure leaves the previous contents untouched,
    * and the rename-first commit never destroys them — see
    * [[AvroBatchWrite.commit]]). One container file per input
    * partition, written by the executors.
    */
  def write(df: DataFrame, dir: String): Unit =
    df.write.format("graft-avro").mode("overwrite").save(dir)
}

class AvroSourceProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-avro"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroIO.toSparkSchema(AvroTable.readFileSchema(
      AvroTable.listFiles(AvroTable.pathOf(options))))
  // writes carry the dataframe's schema (the path may not exist yet);
  // reads infer from the files
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new AvroTable(schema, AvroTable.pathOf(new CaseInsensitiveStringMap(properties)))
}

object AvroTable {
  /** Driver-side Hadoop configuration: the SESSION's (fs credentials,
    * defaultFS overrides), falling back to a bare Configuration only
    * when no session is active. Executors get it shipped inside the
    * partitions / writer factory as a SerializableConfiguration — a
    * bare `new Configuration()` on an executor would silently drop
    * everything the session set.
    */
  private[sources] def hadoopConf(): org.apache.hadoop.conf.Configuration =
    scala.util.Try(org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private[sources] def shippableConf(): org.apache.spark.util.SerializableConfiguration =
    org.apache.spark.sql.GraftSqlShims.serializableConf(hadoopConf())

  /** The .avro files under the load path (option "path"), sorted for
    * deterministic partition order. Runs on the driver at plan time —
    * one directory listing, the same cost as any file source's.
    */
  def pathOf(options: CaseInsensitiveStringMap): String =
    Option(options.get("path")).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        "graft-avro requires a path: .load(dir) to read, .save(dir) to write"))

  def listFiles(path: String): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(hadoopConf())
    val stat = fs.getFileStatus(root)
    val files =
      if (stat.isDirectory)
        fs.listStatus(root).filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
          .map(_.getPath.toString)
      else Array(root.toString)
    require(files.nonEmpty, s"graft-avro: no .avro files under $path")
    files.sorted.toSeq
  }

  /** Container-file header → Avro schema (first file wins; all files of
    * one write share it).
    */
  def readFileSchema(files: Seq[String]): AvroSchema = {
    val p = new Path(files.head)
    val fs = p.getFileSystem(hadoopConf())
    val in = fs.open(p)
    try {
      val s = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try s.getSchema finally s.close()
    } finally scala.util.Try(in.close())
  }

  /** The files' writer schema filtered to `keep` (in that order) —
    * record name/namespace and per-field schemas preserved EXACTLY, so
    * Avro's resolution (which matches records and fields by name)
    * accepts it for any producer, not just this writer. Fields the
    * reader omits are SKIPPED by the decoder: the byte-level column
    * pruning a row-oriented container supports.
    */
  def prunedAvroSchema(writer: AvroSchema, keep: Seq[String]): AvroSchema = {
    val fields = keep.map { n =>
      val f = Option(writer.getField(n)).getOrElse(
        throw new IllegalArgumentException(
          s"graft-avro: required column '$n' is not in the file schema " +
            s"(${writer.getFields.asScala.map(_.name()).mkString(", ")})"))
      new AvroSchema.Field(f.name(), f.schema(), f.doc(), f.defaultVal())
    }
    AvroSchema.createRecord(writer.getName, writer.getDoc, writer.getNamespace,
      false, util.Arrays.asList(fields: _*))
  }

  private[sources] val readerFactory: PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[AvroFilePartition]
      val sparkSchema = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
      new PartitionReader[InternalRow] {
        private val path = new Path(p.file)
        private val in = path.getFileSystem(p.conf.value).open(path)
        // expected (= pruned reader) schema set up front; DataFileStream
        // installs the file's writer schema as the actual, and the
        // resolving decoder skips the omitted fields' bytes
        private val datumReader = {
          val dr = new GenericDatumReader[GenericRecord]()
          dr.setExpected(new AvroSchema.Parser().parse(p.readerAvroJson))
          dr
        }
        private val stream =
          new DataFileStream[GenericRecord](in, datumReader)
        private var current: InternalRow = _
        // per-column decoders resolved once from the SPARK schema (the
        // write side's inverse; Avro runtime values → Catalyst)
        private val dec: Array[AnyRef => Any] =
          sparkSchema.fields.map(f => decodeValue(f.dataType) _).toArray

        override def next(): Boolean =
          if (!stream.hasNext) false
          else {
            val rec = stream.next()
            val vals = new Array[Any](dec.length)
            var i = 0
            while (i < dec.length) {
              val v = rec.get(i)
              vals(i) = if (v == null) null else dec(i)(v)
              i += 1
            }
            current = InternalRow.fromSeq(scala.collection.immutable.ArraySeq
              .unsafeWrapArray(vals))
            true
          }
        override def get(): InternalRow = current
        override def close(): Unit = { stream.close(); scala.util.Try(in.close()) }
      }
    }

  private def decodeValue(dt: DataType)(v: AnyRef): Any = dt match {
    case StringType => UTF8String.fromString(v.toString) // Utf8 or String
    case BinaryType =>
      val b = v.asInstanceOf[java.nio.ByteBuffer]
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case DateType => v.asInstanceOf[java.lang.Integer].intValue()
    case TimestampType => v.asInstanceOf[java.lang.Long].longValue()
    case d: DecimalType =>
      val b = v.asInstanceOf[java.nio.ByteBuffer]
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
      org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(new java.math.BigInteger(arr), d.scale), d.precision, d.scale)
    case _ => v // boolean/int/long/float/double are identical runtime types
  }
}

final case class AvroFilePartition(file: String, schemaJson: String,
    conf: org.apache.spark.util.SerializableConfiguration,
    readerAvroJson: String)
    extends InputPartition

class AvroTable(tableSchema: StructType, path: String)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-avro($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
      // files listed at SCAN build, not table construction: the same
      // path may be the target of a write that hasn't happened yet
      private lazy val files = AvroTable.listFiles(path)
      // COLUMN PRUNING — Avro's own schema-resolution rules are the
      // format's pruning path: a reader schema that omits fields makes
      // the decoder SKIP their bytes (no object is ever materialized),
      // which is as close to columnar pruning as a row-oriented
      // container gets. Catalyst pushes the required columns here; the
      // scan then ships a reader schema built by FILTERING the files'
      // OWN writer schema (names/types/record name preserved exactly, so
      // resolution never trips on a foreign record name).
      private var required: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema
      override def build(): Scan = new Scan with Batch {
        // records decode POSITIONALLY against the expected schema, so a
        // user-supplied .schema(...) that differs from the files would
        // be silent corruption — require exact agreement (the
        // redis-stream source's rule: project after load())
        // ONE header read per scan: the writer schema parsed here feeds
        // both the validation and the pruned reader schema (on a remote
        // FS each header read is an open + round trip)
        private lazy val validated: (Seq[String], AvroSchema) = {
          val writerSchema = AvroTable.readFileSchema(files)
          val inferred = AvroIO.toSparkSchema(writerSchema)
          require(tableSchema == inferred,
            s"graft-avro reads produce ${inferred.simpleString} (from the " +
              s"files); a different read schema (${tableSchema.simpleString}) " +
              "is not supported — project after load()")
          (files, writerSchema)
        }
        override def readSchema(): StructType = required
        override def description(): String =
          s"GraftAvro(${files.length} files, " +
            s"ReadSchema: ${required.fieldNames.mkString(",")})"
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] = {
          val conf = AvroTable.shippableConf()
          // the pruned READER schema, filtered from the files' writer
          // schema in the REQUIRED order (Avro resolution matches by
          // name and handles reordering; a zero-field record is legal —
          // the count(*) shape decodes nothing)
          val (vFiles, writerSchema) = validated
          val readerAvro = AvroTable.prunedAvroSchema(writerSchema,
            required.fieldNames.toSeq)
          vFiles.map(f =>
            AvroFilePartition(f, required.json, conf,
              readerAvro.toString): InputPartition).toArray
        }
        override def createReaderFactory(): PartitionReaderFactory =
          AvroTable.readerFactory
      }
    }

  /** DSv2 write face — `df.write.format("graft-avro").mode(m).save(dir)`
    * with the standard staged-commit file protocol: every task attempt
    * writes its own UNIQUELY-NAMED file under `<dir>/.staging-<queryId>`,
    * only the files named in COMMITTED task messages are renamed into
    * the target, and the staging dir is dropped — so task retries and
    * speculative duplicates can never surface, and a job that fails
    * BEFORE commit leaves the target untouched. `overwrite` swaps
    * RENAME-FIRST-THEN-DELETE: the new generation is fully in place
    * before any previous file is removed, so even a crash INSIDE commit
    * can never destroy data (worst case both generations are visible
    * behind a loud job failure — see [[AvroBatchWrite.commit]]; a
    * pointer-atomic swap is LedgerGuard manifest territory). `append`
    * final names carry the queryId so they cannot collide with earlier
    * writes.
    */
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    AvroIO.toAvroSchema(info.schema()) // plan-time loud validation
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var overwrite = false
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
        overwrite = true; this
      }
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
            new AvroBatchWrite(path, info.schema(), overwrite, info.queryId())
        }
    }
  }
}

/** Driver-side half of the staged-commit protocol (see
  * [[AvroTable.newWriteBuilder]]).
  */
class AvroBatchWrite(dir: String, schema: StructType, overwrite: Boolean,
    queryId: String) extends org.apache.spark.sql.connector.write.BatchWrite {
  import org.apache.spark.sql.connector.write._

  private val stagingName = s".staging-$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val root = new Path(dir)
    val fs = root.getFileSystem(AvroTable.hadoopConf())
    // APPEND onto existing files requires the SAME schema: reads infer
    // from the first file and decode every file positionally against
    // it, so a mixed-schema directory would be silent corruption —
    // reject it here, driver-side, before any task runs. (Overwrite
    // replaces the files, so only the new schema matters.)
    if (!overwrite && fs.exists(root)) {
      val existing = fs.listStatus(root)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
        .map(_.getPath.toString).sorted
      if (existing.nonEmpty) {
        val have = AvroTable.readFileSchema(existing.toSeq)
        val want = AvroIO.toAvroSchema(schema)
        require(have == want,
          s"graft-avro append: the directory's files carry schema $have " +
            s"but the write carries $want — appends must match exactly " +
            "(names, types, nullability); use overwrite to replace")
      }
    }
    fs.mkdirs(new Path(root, stagingName))
    AvroWriterFactory(s"$dir/$stagingName", queryId, schema.json,
      AvroIO.toAvroSchema(schema).toString, AvroTable.shippableConf())
  }

  /** Commit order is RENAME-THEN-DELETE: the new generation is fully in
    * place before any previous file is touched, so a commit-time crash
    * can never destroy data — the failure mode is both generations
    * visible (duplicates, loud job failure) rather than a half-deleted
    * directory with the old contents already gone. Previous-generation
    * names can't collide with the new ones (final names carry the
    * queryId). Pointer-atomic swaps need a manifest — that's
    * LedgerGuard's manifest mode, deliberately not re-implemented for a
    * plain file sink.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(AvroTable.hadoopConf())
    val staging = new Path(root, stagingName)
    val previous =
      if (overwrite) fs.listStatus(root)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".avro"))
        .map(_.getPath).toSeq
      else Seq.empty
    messages.foreach { case AvroTaskCommit(staged, fin) =>
      val target = new Path(root, fin)
      // belt-and-braces next to the full-queryId names: a local FS's
      // rename silently replaces an existing target (HDFS fails), so
      // refuse loudly rather than let any residual collision turn the
      // previous-generation delete below into data loss
      if (fs.exists(target))
        throw new java.io.IOException(
          s"graft-avro commit: final name $fin already exists under $dir " +
            "— refusing to overwrite a previous generation in-place")
      if (!fs.rename(new Path(staging, staged), target))
        throw new java.io.IOException(
          s"graft-avro commit: rename $staged -> $fin under $dir failed")
    }
    previous.foreach(p => fs.delete(p, false))
    fs.delete(staging, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(AvroTable.hadoopConf())
    fs.delete(new Path(root, stagingName), true)
  }
}

/** One staged file per task attempt; `staged` is attempt-unique, `fin`
  * is partition-unique (exactly one attempt per partition commits).
  */
final case class AvroTaskCommit(staged: String, fin: String)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

final case class AvroWriterFactory(stagingDir: String, queryId: String,
    sparkSchemaJson: String, avroSchemaJson: String,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  import org.apache.spark.sql.connector.write._

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val sparkSchema =
        DataType.fromJson(sparkSchemaJson).asInstanceOf[StructType]
      private val avro = new AvroSchema.Parser().parse(avroSchemaJson)
      private val staged = f"part-$partitionId%05d-$taskId.avro"
      // FULL queryId (never a truncated prefix): the commit's
      // rename-then-delete ordering is only crash-safe if a new
      // generation's names can never equal a previous generation's —
      // an 8-char prefix collision would let the local-FS rename
      // silently replace an old file and the subsequent
      // previous-generation delete remove the just-committed one
      private val fin = f"part-$partitionId%05d-$queryId.avro"
      private val out = new Path(stagingDir, staged)
      private val w = {
        val fs = out.getFileSystem(conf.value)
        val wr = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avro))
        wr.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        wr.create(avro, fs.create(out, true))
        wr
      }
      // Catalyst-side getters: InternalRow already stores timestamps as
      // MICROS and dates as DAYS — exactly Avro's logical encodings, so
      // the write path has no conversion at all for them
      private val get: Array[InternalRow => AnyRef] =
        sparkSchema.fields.zipWithIndex.map { case (f, i) =>
          f.dataType match {
            case BooleanType => (r: InternalRow) => Boolean.box(r.getBoolean(i))
            case IntegerType | DateType => (r: InternalRow) => Int.box(r.getInt(i))
            case LongType | TimestampType => (r: InternalRow) => Long.box(r.getLong(i))
            case FloatType => (r: InternalRow) => Float.box(r.getFloat(i))
            case DoubleType => (r: InternalRow) => Double.box(r.getDouble(i))
            case StringType => (r: InternalRow) => r.getUTF8String(i).toString
            case BinaryType => (r: InternalRow) =>
              java.nio.ByteBuffer.wrap(r.getBinary(i))
            case d: DecimalType => (r: InternalRow) => java.nio.ByteBuffer.wrap(
              r.getDecimal(i, d.precision, d.scale).toJavaBigDecimal
                .setScale(d.scale).unscaledValue().toByteArray)
            case other => throw new IllegalArgumentException(
              s"graft-avro: unsupported type ${other.simpleString}") // gated at plan
          }
        }.toArray

      override def write(row: InternalRow): Unit = {
        val rec = new GenericData.Record(avro)
        var i = 0
        while (i < get.length) {
          rec.put(i, if (row.isNullAt(i)) null else get(i)(row))
          i += 1
        }
        w.append(rec)
      }
      override def commit(): WriterCommitMessage = { w.close(); AvroTaskCommit(staged, fin) }
      override def abort(): Unit = {
        scala.util.Try(w.close())
        scala.util.Try(out.getFileSystem(conf.value).delete(out, false))
      }
      override def close(): Unit = ()
    }
}
