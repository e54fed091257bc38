package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a document's UTF-8 bytes — the
  * compression-ratio quality signal (RedPajama-v2's `ccnet_*`-adjacent
  * quality battery and the classic "too compressible = boilerplate/spam,
  * too incompressible = noise/binary junk" filter): natural language
  * sits in a band of deflate ratios, and both tails are worth a gate.
  * zlib via `java.util.zip.Deflater` (JDK, no deps), raw-deflate
  * (nowrap — no 6-byte zlib envelope skewing short docs), fixed level 6
  * and default strategy so the size is DETERMINISTIC for a given input
  * on a given JDK zlib build. Deterministic-per-build is enough for a
  * filter threshold; it is NOT a cross-engine-stable hash — nothing
  * downstream may treat it as content-addressable (use md5 for that).
  *
  * One `Deflater` per executor thread (ThreadLocal, `reset()` per row):
  * allocating the native zlib stream per row would dominate the kernel;
  * 32 threads hold 32 native streams, released by the finalizer at
  * executor death. The expression is codegen'd (a static call, the
  * TextStatsUtil pattern), so it rides inside WholeStageCodegen.
  */
object DeflateUtil {
  private val local = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6, true)
  }

  def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(
      math.max(64, bytes.length / 2))
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      out.write(buf, 0, n)
    }
    out.toByteArray
  }

  /** Lossless inverse, for the gate's round-trip proof (raw-deflate,
    * matching [[deflate]]'s nowrap).
    */
  def inflate(bytes: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(bytes)
      val out = new java.io.ByteArrayOutputStream(math.max(64, bytes.length * 2))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return out.toByteArray // truncated input
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  def deflatedSize(s: UTF8String): Long = deflate(s.getBytes).length.toLong
}

final case class DeflatedSize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    DeflateUtil.deflatedSize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateUtil.deflatedSize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressionExpression {
  import org.apache.spark.sql.{Column, GraftSqlShims}
  def deflatedSize(text: Column): Column =
    GraftSqlShims.column(DeflatedSize(GraftSqlShims.expression(text)))
}
