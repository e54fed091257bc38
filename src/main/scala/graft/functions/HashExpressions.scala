package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Stable 32-bit md5 hash as BIGINT — bit-identical to
  * `conv(substring(md5(x), 1, 8), 16, 10) cast long` (and to DuckDB's
  * `CAST('0x' || substr(md5(x),1,8) AS BIGINT)`), i.e. the first four
  * digest bytes read big-endian unsigned.
  *
  * The composable form materializes a 32-char hex string, substrings it,
  * and parses base-16 PER VALUE — at ~10⁰³ shingles per document that
  * allocation chain is the dominant dedup-sketch cost. This expression
  * digests the UTF-8 bytes and masks the first word directly (thread-local
  * MessageDigest, zero intermediate strings), inside whole-stage codegen.
  */
object Md5Util {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes of the string's UTF-8 encoding, big-endian unsigned. */
  def hash32(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val out = d.digest(s.getBytes)
    ((out(0) & 0xffL) << 24) | ((out(1) & 0xffL) << 16) |
      ((out(2) & 0xffL) << 8) | (out(3) & 0xffL)
  }
}

final case class Md5Hash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Md5Util.hash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Util.hash32($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
