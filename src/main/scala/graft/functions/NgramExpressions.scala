package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-n-gram kernels.
  *
  * The composable word-n-gram form (`transform(sequence(...),
  * i => concat_ws(" ", slice(tokens, i, n)))`) is an interpreted
  * higher-order function: no codegen, no common-subexpression
  * elimination, and a fresh array slice + string concat per gram. The
  * kernels here exploit that tokens come from `split(trim(text), " ")`,
  * so every separator is EXACTLY one 0x20 byte and an n-token gram is
  * the contiguous byte slice from its first token's start to its last
  * token's end — no token array, no slices, no concatenation.
  *
  * Repetition statistics are all PER-DOCUMENT, so the whole Gopher-style
  * battery collapses into per-row work: one byte walk + three exact
  * open-addressed span tables (hash fast path, byte-compare on hit, so
  * counts are exact regardless of hash collisions). Zero shuffles at any
  * scale — the explode → (doc, gram) groupBy pipeline this replaces
  * shuffled every gram of the corpus twice.
  */
object NgramUtil {

  /** Token start/end byte offsets of `split(trim(text), " ")` semantics:
    * trim strips 0x20 only; consecutive spaces yield empty tokens; the
    * empty trimmed string has one empty token. Returns a packed array
    * [ts0, te0, ts1, te1, ...] (te exclusive).
    */
  private[functions] def tokenSpans(bytes: Array[Byte]): Array[Int] = {
    val len = bytes.length
    var start = 0
    while (start < len && bytes(start) == 0x20) start += 1
    var end = len - 1
    while (end >= start && bytes(end) == 0x20) end -= 1
    if (start > end) return Array(start, start) // one empty token
    var spaces = 0
    var i = start
    while (i <= end) { if (bytes(i) == 0x20) spaces += 1; i += 1 }
    val nTok = spaces + 1
    val spans = new Array[Int](2 * nTok)
    var t = 0
    spans(0) = start
    i = start
    while (i <= end) {
      if (bytes(i) == 0x20) {
        spans(2 * t + 1) = i
        t += 1
        spans(2 * t) = i + 1
      }
      i += 1
    }
    spans(2 * t + 1) = end + 1
    spans
  }

  /** Exact open-addressed multiset of byte spans: hash is a fast path,
    * equal-hash slots byte-compare, so distinct/max counts are exact.
    * Capacity is fixed up front (pow2 >= 2*expected) — no resizing.
    */
  private final class SpanCounter(bytes: Array[Byte], expected: Int) {
    private val cap: Int = {
      // Long arithmetic + 2^30 clamp: expected > 2^30 would overflow
      // `expected * 2` to negative and leave cap at 4 (infinite probe
      // loop once full). 2^30 slots bound the table at ~16 GiB of
      // parallel arrays — far past any realistic single document.
      val need = math.min(math.max(expected.toLong, 1L) * 2, 1L << 30)
      var c = 4
      while (c < need) c <<= 1
      c
    }
    private val mask = cap - 1
    private val offs = new Array[Int](cap)
    private val lens = new Array[Int](cap)
    private val hashes = new Array[Int](cap)
    private val counts = new Array[Int](cap)
    var distinct = 0
    var maxCount = 0

    def add(off: Int, len: Int): Unit = {
      var h = -2128831035 // FNV-1a 32-bit offset basis
      var i = off
      val end = off + len
      while (i < end) { h = (h ^ (bytes(i) & 0xff)) * 16777619; i += 1 }
      var idx = h & mask
      while (true) {
        if (counts(idx) == 0) {
          offs(idx) = off; lens(idx) = len; hashes(idx) = h; counts(idx) = 1
          distinct += 1
          if (maxCount < 1) maxCount = 1
          return
        } else if (hashes(idx) == h && lens(idx) == len && spansEqual(offs(idx), off, len)) {
          counts(idx) += 1
          if (counts(idx) > maxCount) maxCount = counts(idx)
          return
        }
        idx = (idx + 1) & mask
      }
    }

    private def spansEqual(a: Int, b: Int, len: Int): Boolean = {
      if (a == b) return true
      var i = 0
      while (i < len) {
        if (bytes(a + i) != bytes(b + i)) return false
        i += 1
      }
      true
    }
  }

  /** All Gopher-repetition counters in one pass:
    * (n_tokens, n_unique, top_bigram_n, n_bigrams, n_distinct_bigrams,
    * n_trigrams, n_distinct_trigrams); gram fields are NULL when the
    * document has too few tokens for that width (matching the
    * explode + LEFT JOIN shape this kernel replaces).
    */
  def repetitionStats(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val spans = tokenSpans(bytes)
    val nTok = spans.length / 2

    val toks = new SpanCounter(bytes, nTok)
    var i = 0
    while (i < nTok) { toks.add(spans(2 * i), spans(2 * i + 1) - spans(2 * i)); i += 1 }

    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(7)
    row.update(0, nTok)
    row.update(1, toks.distinct.toLong)
    if (nTok >= 2) {
      val bi = new SpanCounter(bytes, nTok - 1)
      i = 0
      while (i < nTok - 1) { bi.add(spans(2 * i), spans(2 * i + 3) - spans(2 * i)); i += 1 }
      row.update(2, bi.maxCount.toLong)
      row.update(3, (nTok - 1).toLong)
      row.update(4, bi.distinct.toLong)
    } else { row.update(2, null); row.update(3, null); row.update(4, null) }
    if (nTok >= 3) {
      val tri = new SpanCounter(bytes, nTok - 2)
      i = 0
      while (i < nTok - 2) { tri.add(spans(2 * i), spans(2 * i + 5) - spans(2 * i)); i += 1 }
      row.update(5, (nTok - 2).toLong)
      row.update(6, tri.distinct.toLong)
    } else { row.update(5, null); row.update(6, null) }
    row
  }

  /** Non-overlapping `w`-token passages with positions and md5-32
    * hashes, one pass: passage `p` covers tokens `[p·w, min((p+1)·w,
    * nTok))`, and its string is the byte slice between its end tokens
    * (single-space separators), so chunk text, position, and hash all
    * come from the same span walk — no token array, no slices, no
    * concat, no second hashing projection.
    */
  def wordChunks(s: UTF8String, w: Int): ArrayData = {
    val bytes = s.getBytes
    val spans = tokenSpans(bytes)
    val nTok = spans.length / 2
    val nChunks = (nTok + w - 1) / w
    val out = new Array[org.apache.spark.sql.catalyst.InternalRow](nChunks)
    val d = Md5Util.digest()
    val scratch = new Array[Byte](16)
    var p = 0
    while (p < nChunks) {
      val off = spans(2 * p * w)
      val lastTok = math.min((p + 1) * w, nTok) - 1
      val len = spans(2 * lastTok + 1) - off
      d.reset()
      d.update(bytes, off, len)
      d.digest(scratch, 0, 16)
      val h = ((scratch(0) & 0xffL) << 24) | ((scratch(1) & 0xffL) << 16) |
        ((scratch(2) & 0xffL) << 8) | (scratch(3) & 0xffL)
      // defensive copy: getBytes MAY return the string's underlying
      // (possibly reused) buffer, and these chunk strings outlive the row
      out(p) = org.apache.spark.sql.catalyst.InternalRow(
        p, UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, off, off + len)), h)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  /** Merge a SORTED array of k-wide window start positions into maximal
    * spans `(s, e, nw)` — the duplicated-span assembly kernel
    * (DedupOps.duplicatedSpans / scrubDuplicatedSpans). Identical to
    * the composable higher-order `aggregate` fold (chain while next
    * start ≤ running end, i.e. gap ≤ k), but one primitive loop: the
    * HOF form is interpreted and allocates per element, which measured
    * 3.3 s of a 4.2 s plan on the 10×-duplicated fixture (2.5 M fold
    * steps).
    */
  def mergeSpans(pos: ArrayData, k: Int): ArrayData = {
    val n = pos.numElements()
    if (n == 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](4)
    var s = pos.getInt(0)
    var e = s + k
    var nw = 1L
    var i = 1
    while (i < n) {
      val p = pos.getInt(i)
      if (p > e) {
        out.add(org.apache.spark.sql.catalyst.InternalRow(s, e, nw))
        s = p; e = p + k; nw = 1L
      } else {
        e = p + k; nw += 1L
      }
      i += 1
    }
    out.add(org.apache.spark.sql.catalyst.InternalRow(s, e, nw))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** Rebuild a document's text without the tokens covered by `spans`
    * — the ExactSubstr scrub tail. Bit-identical to the composable
    * form
    * {{{
    * array_join(filter(split(trim(text), " "), (_, i) =>
    *   !exists(spans, sp => i >= sp.s && i < sp.e)), " ")
    * }}}
    * plus `n_removed = Σ (sp.e − sp.s)`, but one byte walk: kept
    * tokens are contiguous byte slices (single-0x20 separators), and
    * the span check is a sorted-merge cursor rather than a per-token
    * `exists` scan — the interpreted per-token HOF cost scales with
    * exactly the dup-saturated corpora the operator targets. REQUIRES
    * `spans` sorted ascending by `s` and pairwise disjoint (what
    * [[mergeSpans]] emits); under that contract the cursor walk and
    * the quadratic `exists` agree on every token. Returns the struct
    * `(clean_text, n_removed)`.
    */
  def scrubSpans(s: UTF8String, spans: ArrayData): InternalRow = {
    val bytes = s.getBytes
    val tok = tokenSpans(bytes)
    val nTok = tok.length / 2
    val m = spans.numElements()
    var removed = 0L
    var j = 0
    while (j < m) {
      val st = spans.getStruct(j, 3)
      removed += st.getInt(1).toLong - st.getInt(0).toLong
      j += 1
    }
    val out = new Array[Byte](if (bytes.length == 0) 0 else bytes.length)
    var p = 0
    var first = true
    var si = 0
    var curS = if (m > 0) spans.getStruct(0, 3).getInt(0) else Int.MaxValue
    var curE = if (m > 0) spans.getStruct(0, 3).getInt(1) else Int.MaxValue
    var i = 0
    while (i < nTok) {
      while (si < m && i >= curE) {
        si += 1
        if (si < m) {
          val st = spans.getStruct(si, 3)
          curS = st.getInt(0); curE = st.getInt(1)
        } else { curS = Int.MaxValue; curE = Int.MaxValue }
      }
      if (!(i >= curS && i < curE)) {
        if (!first) { out(p) = 0x20; p += 1 }
        val off = tok(2 * i)
        val n = tok(2 * i + 1) - off
        System.arraycopy(bytes, off, out, p, n)
        p += n
        first = false
      }
      i += 1
    }
    InternalRow(UTF8String.fromBytes(java.util.Arrays.copyOfRange(out, 0, p)), removed)
  }

  /** md5-32 hash of every word n-gram — bit-identical to
    * `transform(wordNgrams(text, n), g => md5Hash32(g))` (the gram
    * string's UTF-8 bytes ARE the byte slice between its end tokens),
    * one pass, no intermediate strings. Empty array when the document
    * has fewer than `n` tokens.
    */
  def wordGramMd5s(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val spans = tokenSpans(bytes)
    val nTok = spans.length / 2
    if (nTok < n) return ArrayData.toArrayData(Array.empty[Long])
    val out = new Array[Long](nTok - n + 1)
    val d = Md5Util.digest()
    val scratch = new Array[Byte](16)
    var i = 0
    while (i < out.length) {
      val off = spans(2 * i)
      val len = spans(2 * (i + n - 1) + 1) - off
      d.reset()
      d.update(bytes, off, len)
      d.digest(scratch, 0, 16)
      out(i) = ((scratch(0) & 0xffL) << 24) | ((scratch(1) & 0xffL) << 16) |
        ((scratch(2) & 0xffL) << 8) | (scratch(3) & 0xffL)
      i += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** `repetition_stats(text)` → struct of all per-document repetition
  * counters (see [[NgramUtil.repetitionStats]]). Codegen'd, so a
  * projection extracting several fields evaluates the kernel once.
  */
final case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_unique", LongType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = true),
    StructField("n_bigrams", LongType, nullable = true),
    StructField("n_distinct_bigrams", LongType, nullable = true),
    StructField("n_trigrams", LongType, nullable = true),
    StructField("n_distinct_trigrams", LongType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NgramUtil.repetitionStats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramUtil.repetitionStats($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `word_gram_md5s(text, n)` → ARRAY<BIGINT> of md5-32 gram hashes
  * (see [[NgramUtil.wordGramMd5s]]).
  */
final case class WordGramMd5s(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram width must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NgramUtil.wordGramMd5s(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramUtil.wordGramMd5s($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `merge_spans(sorted_pos, k)` → ARRAY<STRUCT<s INT, e INT, nw BIGINT>>
  * (see [[NgramUtil.mergeSpans]]). Input MUST be sorted ascending.
  */
final case class MergeSpans(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "window width must be >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("s", IntegerType, nullable = false),
    StructField("e", IntegerType, nullable = false),
    StructField("nw", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(s"input must be array<int>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    NgramUtil.mergeSpans(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramUtil.mergeSpans($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `scrub_spans(text, spans)` → STRUCT<clean_text STRING, n_removed BIGINT>
  * (see [[NgramUtil.scrubSpans]]). `spans` must be sorted & disjoint.
  */
final case class ScrubSpans(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_removed", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StructType(fs), _))
          if fs.length == 3 && fs(0).dataType == IntegerType &&
            fs(1).dataType == IntegerType && fs(2).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"inputs must be (string, array<struct<s:int,e:int,nw:bigint>>), got $other")
    }

  override def nullSafeEval(text: Any, spans: Any): Any =
    NgramUtil.scrubSpans(text.asInstanceOf[UTF8String], spans.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, sp) => s"graft.functions.NgramUtil.scrubSpans($t, $sp)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `word_chunks(text, w)` → ARRAY<STRUCT<pos INT, chunk STRING, h BIGINT>>
  * (see [[NgramUtil.wordChunks]]).
  */
final case class WordChunks(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "chunk width must be >= 1")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("chunk", StringType, nullable = false),
    StructField("h", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    NgramUtil.wordChunks(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramUtil.wordChunks($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramExpressions {
  import org.apache.spark.sql.GraftSqlShims
  def repetitionStats(text: Column): Column =
    GraftSqlShims.column(RepetitionStats(GraftSqlShims.expression(text)))
  def wordGramMd5s(text: Column, n: Int): Column =
    GraftSqlShims.column(WordGramMd5s(GraftSqlShims.expression(text), n))
  def wordChunks(text: Column, w: Int): Column =
    GraftSqlShims.column(WordChunks(GraftSqlShims.expression(text), w))
  def mergeSpans(sortedPos: Column, k: Int): Column =
    GraftSqlShims.column(MergeSpans(GraftSqlShims.expression(sortedPos), k))
  def scrubSpans(text: Column, spans: Column): Column =
    GraftSqlShims.column(ScrubSpans(
      GraftSqlShims.expression(text), GraftSqlShims.expression(spans)))
}
