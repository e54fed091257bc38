package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** graft-avro interchange conformance (q75's unit face): every supported
  * type — including the three logical types and NULLs in every column —
  * must survive the container-file round trip bit-exactly, write
  * parallelism must be preserved on read, and everything outside the
  * flat-relational subset must fail loudly.
  */
class AvroSourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-avro").toString

  test("all supported types round-trip bit-exactly, nulls included") {
    val schema = StructType(Seq(
      StructField("b", BooleanType), StructField("i", IntegerType),
      StructField("l", LongType), StructField("f", FloatType),
      StructField("d", DoubleType), StructField("s", StringType),
      StructField("bin", BinaryType), StructField("dt", DateType),
      StructField("ts", TimestampType), StructField("dec", DecimalType(12, 3))))
    import java.sql.{Date, Timestamp}
    val rows = Seq(
      org.apache.spark.sql.Row(true, 1, 2L, 1.5f, 2.25, "héllo ✓",
        Array[Byte](0, 1, -1, 127), Date.valueOf("2024-02-29"),
        Timestamp.valueOf("2024-01-02 03:04:05.123456"),
        new java.math.BigDecimal("12345.678")),
      org.apache.spark.sql.Row(false, -2, -3L, -0.5f, -1.125, "",
        Array[Byte](), Date.valueOf("1969-12-31"),
        Timestamp.valueOf("1969-12-31 23:59:59.999999"),
        new java.math.BigDecimal("-0.001")),
      // a NULL in every column
      org.apache.spark.sql.Row(null, null, null, null, null, null,
        null, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmp()
    AvroIO.write(df, dir)
    val back = spark.read.format("graft-avro").load(dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      schema.map(f => (f.name, f.dataType)))
    // canonical render both sides: bit-exactness without Row equality quirks
    def canon(x: org.apache.spark.sql.DataFrame): Seq[String] = {
      val hexed = x.withColumn("bin", lower(hex(col("bin"))))
      hexed.select(hexed.columns.map(c => col(c).cast("string").as(c)): _*)
        .collect().map(_.mkString("§")).sorted.toSeq
    }
    assert(canon(back) == canon(df), canon(back).mkString("\n"))
    // write parallelism preserved: 2 input partitions → 2 files → 2 read partitions
    assert(back.rdd.getNumPartitions == 2)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".avro")) == 2)
  }

  test("outside the flat-relational subset fails loudly; missing path/empty dir fail loudly") {
    import spark.implicits._
    val nested = Seq((1, Seq("a", "b"))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException] { AvroIO.write(nested, tmp()) }
    assert(e.getMessage.contains("arr") && e.getMessage.contains("unsupported"))
    val noFiles = intercept[Exception] {
      spark.read.format("graft-avro").load(tmp()).collect()
    }
    assert(noFiles.getMessage.contains("no .avro files"))
  }

  test("DSv2 write face: staged commit, overwrite and append modes, no staging residue") {
    import spark.implicits._
    val dir = tmp()
    val df1 = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v").repartition(2)
    df1.write.format("graft-avro").mode("overwrite").save(dir)
    val back1 = spark.read.format("graft-avro").load(dir)
    assert(back1.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // write parallelism preserved through the staged protocol
    assert(back1.rdd.getNumPartitions == 2)
    // append: new files carry the queryId, never colliding with run 1
    Seq((4L, "d")).toDF("id", "v").write.format("graft-avro").mode("append").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() == 4)
    // overwrite: previous .avro files are replaced at commit time
    Seq((9L, "z")).toDF("id", "v").write.format("graft-avro").mode("overwrite").save(dir)
    val after = spark.read.format("graft-avro").load(dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(after == Seq((9L, "z")), after.mkString(","))
    // the staging dir was dropped with the commit — no residue
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith(".staging")),
      new java.io.File(dir).listFiles().map(_.getName).mkString(","))
    // unsupported type fails at PLAN time through the DSv2 face too
    val e = intercept[Exception] {
      Seq((1, Map("k" -> "v"))).toDF("id", "m").write
        .format("graft-avro").mode("overwrite").save(tmp())
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(e).contains("unsupported"), chain(e))
  }

  test("schema gates: user read schema must match the files; append must match the directory") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a")).toDF("id", "v").write.format("graft-avro")
      .mode("overwrite").save(dir)
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    // a user-supplied schema that differs (here: column order flipped)
    // would decode POSITIONALLY wrong — rejected loudly, never silent
    val r = intercept[Exception] {
      spark.read.schema("v STRING, id BIGINT").format("graft-avro")
        .load(dir).collect()
    }
    assert(chain(r).contains("project after load"), chain(r))
    // append with a different schema would make a mixed-schema dir that
    // first-file-wins inference then misdecodes — rejected driver-side
    val a = intercept[Exception] {
      Seq(("x", 2L)).toDF("v", "id").write.format("graft-avro")
        .mode("append").save(dir)
    }
    assert(chain(a).contains("append") && chain(a).toLowerCase.contains("match"),
      chain(a))
    // same schema still appends fine
    Seq((2L, "b")).toDF("id", "v").write.format("graft-avro")
      .mode("append").save(dir)
    assert(spark.read.format("graft-avro").load(dir).count() == 2)
  }

  test("column pruning reaches the avro decoder: the scan reads only the required fields") {
    import spark.implicits._
    val dir = tmp()
    Seq((1L, "a", 10.5), (2L, "b", 20.5), (3L, "c", 30.5))
      .toDF("id", "v", "x").write.format("graft-avro").mode("overwrite").save(dir)
    // a 1-column projection: the scan's output schema (and thus the
    // reader's expected avro schema) must carry ONLY that column
    val one = spark.read.format("graft-avro").load(dir).select("v")
    val scan = one.queryExecution.executedPlan.collectLeaves().head
    assert(scan.schema.fieldNames.toSeq == Seq("v"), scan.schema)
    assert(scan.toString.contains("ReadSchema: v"), scan.toString)
    assert(one.as[String].collect().sorted.toSeq == Seq("a", "b", "c"))
    // column ORDER in the projection is honored through avro's
    // name-based resolution (reader fields may reorder vs the writer)
    val re = spark.read.format("graft-avro").load(dir).select("x", "id")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._2).toSeq
    assert(re == Seq((10.5, 1L), (20.5, 2L), (30.5, 3L)), re)
    // the count(*) shape prunes to ZERO fields — a legal empty record
    // read that decodes nothing
    assert(spark.read.format("graft-avro").load(dir).count() == 3)
  }

  test("avro schema mapping is its own inverse (logical types, nullability)") {
    val schema = StructType(Seq(
      StructField("a", TimestampType, nullable = true),
      StructField("b", DateType, nullable = false),
      StructField("c", DecimalType(20, 6), nullable = true),
      StructField("d", BinaryType, nullable = false)))
    assert(AvroIO.toSparkSchema(AvroIO.toAvroSchema(schema)) == schema)
  }
}
