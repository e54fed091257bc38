package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text statistics — the fused kernel behind TextOps' per-row
  * metrics. The composable forms (`split`/`filter`/`array_contains`) are
  * higher-order functions with NO codegen (CodegenFallback) and therefore
  * no common-subexpression elimination: a projection computing token
  * count, stopword count and quality score re-tokenizes the document per
  * output column. This expression walks the UTF-8 bytes once and returns
  * all three counters; being codegen'd, whole-stage CSE evaluates it once
  * per row no matter how many fields a projection extracts.
  *
  * Counter semantics are pinned EXACTLY to the composable forms:
  *  - `n_tokens`  = `size(split(trim(text), " "))` — trim strips ' '
  *    only (SQL trim), consecutive spaces yield empty tokens that COUNT,
  *    and the empty trimmed string has one (empty) token;
  *  - `n_stop`    = tokens ∈ stopword list (byte-equality);
  *  - `n_chars_nospace` = `length(regexp_replace(text, " ", ""))` —
  *    CHARACTER count of the full (untrimmed) text minus all ' ' chars.
  */
object TextStatsUtil {
  def compute(s: UTF8String, stopwords: Array[Array[Byte]]): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length
    // full-string space count (0x20 never occurs inside a UTF-8 sequence)
    var spacesAll = 0
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) spacesAll += 1; i += 1 }
    val charsNoSpace = s.numChars() - spacesAll
    // trim ' ' only (SQL trim), then walk tokens
    var start = 0
    while (start < n && bytes(start) == 0x20) start += 1
    var end = n - 1
    while (end >= start && bytes(end) == 0x20) end -= 1
    var nTokens = 1
    var nStop = 0
    var tokStart = start
    var j = start
    while (j <= end + 1) {
      if (j == end + 1 || bytes(j) == 0x20) {
        if (isStopword(bytes, tokStart, j - tokStart, stopwords)) nStop += 1
        if (j <= end) nTokens += 1
        tokStart = j + 1
      }
      j += 1
    }
    InternalRow(nTokens, nStop, charsNoSpace)
  }

  private def isStopword(bytes: Array[Byte], off: Int, len: Int,
      stopwords: Array[Array[Byte]]): Boolean = {
    var k = 0
    while (k < stopwords.length) {
      val w = stopwords(k)
      if (w.length == len) {
        var m = 0
        while (m < len && bytes(off + m) == w(m)) m += 1
        if (m == len) return true
      }
      k += 1
    }
    false
  }
}

final case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_chars_nospace", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(input: Any): Any =
    TextStatsUtil.compute(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwords", stopBytes, "byte[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextStatsUtil.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** One-pass fingerprint normalization: `trim` (spaces only) → lowercase →
  * collapse space runs — byte-identical to
  * `regexp_replace(lower(trim(text)), " +", " ")` without the per-row
  * regex machinery. Lowercasing delegates to the same
  * `UTF8String.toLowerCase` Spark's `lower()` uses, so unicode case
  * mapping matches exactly; the collapse pass then walks bytes (0x20
  * never occurs inside a UTF-8 sequence).
  */
object NormalizeTextUtil {
  def normalize(s: UTF8String): UTF8String = {
    val lowered = s.trim().toLowerCase
    val bytes = lowered.getBytes
    val n = bytes.length
    val out = new Array[Byte](n)
    var i = 0
    var o = 0
    var prevSpace = false
    while (i < n) {
      val b = bytes(i)
      if (b == 0x20) {
        if (!prevSpace) { out(o) = b; o += 1 }
        prevSpace = true
      } else {
        out(o) = b; o += 1
        prevSpace = false
      }
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, o))
  }
}

final case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NormalizeTextUtil.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeTextUtil.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode normalization (`java.text.Normalizer`, JDK — no deps): the
  * canonicalization pass a multilingual corpus needs BEFORE any
  * fingerprint/dedup/join on text — visually identical strings with
  * different codepoint sequences (composed é vs e + COMBINING ACUTE)
  * otherwise hash apart and defeat exact dedup. Fast path:
  * `Normalizer.isNormalized` short-circuits already-normalized (and all
  * pure-ASCII) text without re-encoding, so the common case costs one
  * scan of the string and zero allocation.
  */
object UnicodeNormalizeUtil {
  def normalize(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

final case class UnicodeNormalize(child: Expression, formName: String)
    extends UnaryExpression {
  // construction-time validation: an unknown form must fail the QUERY
  // plan, not every row at runtime
  require(Set("NFC", "NFD", "NFKC", "NFKD")(formName),
    s"unknown normalization form '$formName' (expected NFC/NFD/NFKC/NFKD)")
  @transient private lazy val form = java.text.Normalizer.Form.valueOf(formName)

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeUtil.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormalizeUtil.normalize($c, java.text.Normalizer.Form.$formName)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStatsExpression {
  import org.apache.spark.sql.GraftSqlShims
  def textStats(text: Column, stopwords: Seq[String]): Column =
    GraftSqlShims.column(TextStats(GraftSqlShims.expression(text), stopwords))
  def normalizeText(text: Column): Column =
    GraftSqlShims.column(NormalizeText(GraftSqlShims.expression(text)))
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    GraftSqlShims.column(UnicodeNormalize(GraftSqlShims.expression(text), form))
}
