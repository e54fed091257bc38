package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass line-level curation kernels (the C4 / T5 §2.2 line rules).
  *
  * The composable form — `filter(split(text, "\n"), l => ...)` with a
  * `trim`/`split`/`substring` per line — evaluates as an interpreted
  * higher-order function: no codegen, a fresh token array per line, and
  * a re-split of the document per derived field. These kernels do the
  * whole battery in one byte walk, exploiting that `\n`, space and the
  * terminal-punctuation candidates are all single ASCII bytes (UTF-8
  * continuation bytes are ≥ 0x80, so byte comparisons are exact
  * character comparisons). Same playbook as [[NgramUtil.mergeSpans]]
  * (the d53 span-assembly fusion): per-row kernel, zero shuffle,
  * scan-speed at 100 TB.
  */
object C4Util {

  /** Fused C4 line filter — bit-identical to the composable form
    * {{{
    * kept = filter(split(text, "\n"), l =>
    *   size(split(trim(l), " ")) >= minWords &&
    *   substring(trim(l), -1, 1).isin(".", "!", "?", "\""))
    * struct(size(split(text, "\n")), size(kept),
    *        array_join(transform(kept, trim), "\n"))
    * }}}
    * Line splitting keeps trailing empty lines (Java split semantics
    * with limit -1, what Spark's `split` does); `trim` strips 0x20
    * only; the "word count" is `split(t, " ")` size, i.e. number of
    * spaces + 1 (consecutive spaces yield empty tokens that COUNT —
    * replicated, not "fixed", because the conformance oracle applies
    * the same SQL rule). Returns `(n_lines, n_kept, kept)`.
    */
  def c4LineFilter(s: UTF8String, minWords: Int): InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    var nLines = 0
    var keptEnds = new Array[Int](16) // packed (ts, te) pairs
    var nKeptBounds = 0
    var keptBytes = 0
    var ls = 0
    var i = 0
    while (i <= len) {
      if (i == len || bytes(i) == '\n') {
        nLines += 1
        var ts = ls
        var te = i
        while (ts < te && bytes(ts) == 0x20) ts += 1
        while (te > ts && bytes(te - 1) == 0x20) te -= 1
        if (te > ts) {
          val last = bytes(te - 1)
          if (last == '.' || last == '!' || last == '?' || last == '"') {
            var spaces = 0
            var j = ts
            while (j < te) { if (bytes(j) == 0x20) spaces += 1; j += 1 }
            if (spaces + 1 >= minWords) {
              if (nKeptBounds + 2 > keptEnds.length)
                keptEnds = java.util.Arrays.copyOf(keptEnds, keptEnds.length * 2)
              keptEnds(nKeptBounds) = ts
              keptEnds(nKeptBounds + 1) = te
              nKeptBounds += 2
              keptBytes += te - ts
            }
          }
        }
        ls = i + 1
      }
      i += 1
    }
    val nKept = nKeptBounds / 2
    val out = new Array[Byte](if (nKept == 0) 0 else keptBytes + nKept - 1)
    var p = 0
    var k = 0
    while (k < nKept) {
      if (k > 0) { out(p) = '\n'; p += 1 }
      val off = keptEnds(2 * k)
      val n = keptEnds(2 * k + 1) - off
      System.arraycopy(bytes, off, out, p, n)
      p += n
      k += 1
    }
    InternalRow(nLines, nKept, UTF8String.fromBytes(out))
  }

  /** Multi-line page synthesis for the d74 conformance fixture —
    * bit-identical to the composable form (w-token slices of
    * `split(trim(text), " ")` space-rejoined, a terminal mark cycling
    * `'' / '.' / '!'` by `(docId + lineNo) % 3`, lines joined with
    * `\n`). A w-token slice space-rejoined is the contiguous byte
    * slice from its first token's start to its last token's end (the
    * [[NgramUtil.wordGramMd5s]] invariant: separators are exactly one
    * 0x20 byte), so the page assembles from byte copies without ever
    * materializing the token array. Lives next to the operator kernel
    * so the TIMED conformance path measures the OPERATOR, not an
    * interpreted fixture lambda.
    */
  def synthC4Page(s: UTF8String, docId: Long, w: Int): UTF8String = {
    // docId assumed non-negative (fixture doc ids): the Column form's
    // element_at would error on the negative-% index this % mirrors
    val bytes = s.getBytes
    val spans = NgramUtil.tokenSpans(bytes)
    val nTok = spans.length / 2
    val nl = (nTok + w - 1) / w // >= 1: split() yields >= 1 token
    val bos = new java.io.ByteArrayOutputStream(bytes.length + 2 * nl + 8)
    var p = 0
    while (p < nl) {
      if (p > 0) bos.write('\n')
      val firstTok = p * w
      val lastTok = math.min(firstTok + w, nTok) - 1
      val off = spans(2 * firstTok)
      val end = spans(2 * lastTok + 1)
      bos.write(bytes, off, end - off)
      val m = ((docId + p) % 3).toInt
      if (m == 1) bos.write('.') else if (m == 2) bos.write('!')
      p += 1
    }
    UTF8String.fromBytes(bos.toByteArray)
  }
}

/** `c4_line_filter(text, minWords)` → STRUCT<n_lines INT, n_kept INT,
  * kept STRING> (see [[C4Util.c4LineFilter]]).
  */
final case class C4LineFilter(child: Expression, minWords: Int) extends UnaryExpression {
  require(minWords >= 0, "minWords must be >= 0")
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("kept", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    C4Util.c4LineFilter(input.asInstanceOf[UTF8String], minWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.C4Util.c4LineFilter($c, $minWords)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `synth_c4_page(text, doc_id, w)` → STRING (see [[C4Util.synthC4Page]]). */
final case class SynthC4Page(left: Expression, right: Expression, w: Int)
    extends BinaryExpression {
  require(w >= 1, "line width must be >= 1")
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"inputs must be (string, bigint), got $other")
    }

  override def nullSafeEval(text: Any, docId: Any): Any =
    C4Util.synthC4Page(text.asInstanceOf[UTF8String], docId.asInstanceOf[Long], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, d) => s"graft.functions.C4Util.synthC4Page($t, $d, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LineFilterExpressions {
  def c4LineFilter(text: Column, minWords: Int): Column =
    GraftSqlShims.column(C4LineFilter(GraftSqlShims.expression(text), minWords))
  def synthC4Page(text: Column, docId: Column, w: Int): Column =
    GraftSqlShims.column(SynthC4Page(
      GraftSqlShims.expression(text), GraftSqlShims.expression(docId), w))
}
