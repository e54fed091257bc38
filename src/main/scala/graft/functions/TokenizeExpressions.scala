package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WordPiece tokenizer APPLY (the encode side of subword tokenization —
  * d61 counts the training statistics, this runs a finished vocabulary
  * over the corpus): greedy longest-match-first segmentation with `##`
  * continuation pieces and whole-word `[UNK]` fallback, the scheme
  * BERT's reference implementation defines (Devlin et al. 2019;
  * `tokenization.py`'s `WordpieceTokenizer`).
  *
  * Built as ONE Catalyst expression with the vocabulary riding along as
  * a codegen reference object (model-sized HashSet — the same regime as
  * [[CentroidUtil]]'s centroid matrix): the per-row loop is ordinary
  * compiled JVM code inside whole-stage codegen, constant generated-
  * source size no matter how large the vocab. Tokenization is
  * inherently per-row — zero shuffle, scan speed at 100 TB; the
  * vocabulary broadcasts with the plan.
  *
  * Greedy search is bounded by the vocab's longest piece, so a
  * pathological 1 MB "word" costs O(len · maxPiece), not O(len²).
  */
object WordPieceUtil {

  /** Encode one whitespace-token stream. Tokens are the repo's standard
    * split-on-single-space definition (empty tokens contribute no
    * pieces); each token segments greedily: the longest vocab piece at
    * the cursor wins (`##`-prefixed after the first), and a token with
    * NO matching piece at some cursor emits `unk` for the WHOLE token —
    * BERT's is_bad contract, not a partial emission.
    */
  def encode(text: UTF8String, vocab: java.util.HashSet[String],
      maxPiece: Int, unk: String): ArrayData = {
    val s = text.toString.trim
    val out = new java.util.ArrayList[UTF8String]()
    var start = 0
    val n = s.length
    while (start <= n) {
      val sp = s.indexOf(' ', start)
      val end = if (sp < 0) n else sp
      if (end > start) encodeWord(s, start, end, vocab, maxPiece, unk, out)
      if (sp < 0) start = n + 1 else start = sp + 1
    }
    new GenericArrayData(out.toArray)
  }

  private def encodeWord(s: String, from: Int, to: Int,
      vocab: java.util.HashSet[String], maxPiece: Int, unk: String,
      out: java.util.ArrayList[UTF8String]): Unit = {
    val first = out.size()
    var i = from
    while (i < to) {
      var j = math.min(to, i + maxPiece)
      var piece: String = null
      while (j > i && piece == null) {
        val cand =
          if (i == from) s.substring(i, j)
          else "##" + s.substring(i, j)
        if (vocab.contains(cand)) piece = cand else j -= 1
      }
      if (piece == null) {
        // whole-word fallback: drop any pieces already emitted for it
        while (out.size() > first) out.remove(out.size() - 1)
        out.add(UTF8String.fromString(unk))
        return
      }
      out.add(UTF8String.fromString(piece))
      i = j
    }
  }
}

/** `wordpiece_encode(text)` → ARRAY<STRING> of pieces. */
final case class WordPieceEncode(child: Expression, vocab: Seq[String],
    unk: String = "[UNK]") extends UnaryExpression {
  require(vocab.nonEmpty, "vocab must be non-empty")

  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  // longest piece length in CHARS of word surface (## prefix excluded)
  private val maxPiece: Int =
    vocab.map(v => if (v.startsWith("##")) v.length - 2 else v.length).max

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"input must be string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    WordPieceUtil.encode(input.asInstanceOf[UTF8String], vocabSet, maxPiece, unk)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", vocabSet, "java.util.HashSet")
    val unkLit = ctx.addReferenceObj("wpUnk", unk, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordPieceUtil.encode($c, $ref, $maxPiece, $unkLit)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenizeExpressions {
  import org.apache.spark.sql.GraftSqlShims
  /** Column-facing wrapper. */
  def wordPieceEncode(text: Column, vocab: Seq[String],
      unk: String = "[UNK]"): Column =
    GraftSqlShims.column(WordPieceEncode(GraftSqlShims.expression(text), vocab, unk))
}
