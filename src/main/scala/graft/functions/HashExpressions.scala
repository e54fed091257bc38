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

  /** Thread-local reusable digest (for fused kernels in this file). */
  def digest(): java.security.MessageDigest = md.get()

  private val HexDigits = "0123456789abcdef".toCharArray

  /** Render a 16-byte digest as lowercase md5 hex into a caller-owned
    * 32-char scratch — the one hex loop every fused kernel in this file
    * shares (an uppercase/format change must change them all at once).
    */
  def hex32(scratch: Array[Byte], hex: Array[Char]): String = {
    var i = 0
    while (i < 16) {
      hex(2 * i) = HexDigits((scratch(i) >> 4) & 0xf)
      hex(2 * i + 1) = HexDigits(scratch(i) & 0xf)
      i += 1
    }
    new String(hex)
  }

  /** Char-start byte offsets of a UTF-8 buffer (numChars + 1 entries,
    * last = total bytes) — the shared offset walk that lets kernels
    * slice n-CHAR windows as byte ranges without UTF8String.substr's
    * scan-from-start indexing.
    */
  def charStarts(bytes: Array[Byte], numChars: Int): Array[Int] = {
    val starts = new Array[Int](numChars + 1)
    var i = 0
    var b = 0
    while (i < numChars) {
      starts(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    starts(numChars) = bytes.length
    starts
  }

  /** First 4 md5 bytes of the string's UTF-8 encoding, big-endian unsigned. */
  def hash32(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val out = d.digest(s.getBytes)
    ((out(0) & 0xffL) << 24) | ((out(1) & 0xffL) << 16) |
      ((out(2) & 0xffL) << 8) | (out(3) & 0xffL)
  }

  /** First 60 md5 bits (15 hex digits) as an always-positive long —
    * bit-identical to SQL `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`
    * (7 full bytes, then the high nibble of byte 7), the widest md5
    * prefix both engines parse into a signed 64-bit integer without
    * sign games. Token-hash width for the 60-bit SimHash family.
    */
  def hash60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val out = d.digest(s.getBytes)
    hash60OfDigest(out)
  }

  private def hash60OfDigest(out: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (out(i) & 0xffL); i += 1 }
    (v << 4) | ((out(7) & 0xffL) >>> 4)
  }

  /** Fused per-document 60-bit SimHash: ONE byte walk over the trimmed
    * text, md5 per whitespace token (the thread-local digest), ±1
    * bit-sums in a local array, sign `> 0` fold — bit-identical to
    * `explode(tokens) → md5Hash60 → 60 sum aggregates → sign` (the
    * composable form unit-pins the parity) with no explode, no 60-wide
    * aggregation, no shuffle: simhash is a pure per-row function, and
    * this kernel keeps it one. Tokenization matches `TextOps.tokens`
    * exactly: `split(trim(text), ' ')` — single-space separators,
    * empty tokens between consecutive spaces INCLUDED, all-space text
    * yields the single empty token.
    */
  def simHash60(s: UTF8String): Long = {
    val d = md.get()
    // UTF8String.trim() strips 0x20 only — exactly functions.trim's
    // StringTrim, so the kernel tokenizes precisely TextOps.tokens' list
    val bytes = s.trim().getBytes
    val n = bytes.length
    val sums = new Array[Int](60)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        d.reset()
        d.update(bytes, start, i - start)
        val th = hash60OfDigest(d.digest())
        var j = 0
        while (j < 60) {
          if (((th >>> j) & 1L) == 1L) sums(j) += 1 else sums(j) -= 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (sums(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }
}

object ShingleUtil {
  /** All `n`-char shingle hashes of `s`, each `md5-first-word % mod` —
    * bit-identical to `transform(shingles(s, n), x => md5Hash32(x) % mod)`
    * (an n-char UTF-8 substring is exactly the byte slice between its
    * char boundaries, and md5 runs over those bytes either way), but one
    * pass over the raw bytes: no `sequence` position array, no per-shingle
    * `UTF8String` substring allocation, no interpreted HOF lambda. The
    * digest is reused via thread-local and writes into a fixed 16-byte
    * scratch buffer.
    */
  def shingleHashes(s: UTF8String, n: Int, mod: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val numChars = s.numChars()
    if (numChars < n)
      return org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(Array.empty[Long])
    val starts = Md5Util.charStarts(bytes, numChars)
    val out = new Array[Long](numChars - n + 1)
    val d = Md5Util.digest()
    val scratch = new Array[Byte](16)
    var k = 0
    while (k < out.length) {
      d.reset()
      d.update(bytes, starts(k), starts(k + n) - starts(k))
      d.digest(scratch, 0, 16)
      val h = ((scratch(0) & 0xffL) << 24) | ((scratch(1) & 0xffL) << 16) |
        ((scratch(2) & 0xffL) << 8) | (scratch(3) & 0xffL)
      out(k) = h % mod
      k += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}

/** Fused character-shingle hasher: `shingle_hashes(text, n, mod)` →
  * ARRAY<BIGINT> of the md5-32 hash (mod `mod`) of every n-char shingle.
  * Replaces the `sequence`+`transform(substr)`+`transform(md5Hash32)`
  * chain in the MinHash pipeline — same values, one codegen'd call.
  */
final case class ShingleHash32s(child: Expression, n: Int, mod: Long)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingleHashes(input.asInstanceOf[UTF8String], n, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingleHashes($c, $n, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcUtil {
  /** Content-defined chunks in ONE byte pass — bit-identical to the
    * composable `filter(window-hash % mask == 0)` + per-chunk
    * `md5(substr)` chain (pinned by the d121 oracle), but fused: the
    * window residues, boundary selection and chunk digests share one
    * traversal and one thread-local MessageDigest, with no HOF lambdas
    * (which Catalyst evaluates interpreted) and no re-evaluation of the
    * boundary array inside its own transform — the two costs that made
    * the composable form ~6× slower than the data volume justifies.
    * Returns `array<struct<idx int, len int, digest string>>`; empty
    * text → empty array; the document end always closes the last chunk.
    */
  def cdcChunks(s: UTF8String, w: Int, mask: Int):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.InternalRow
    val bytes = s.getBytes
    val numChars = s.numChars()
    if (numChars == 0)
      return org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(Array.empty[InternalRow])
    val starts = Md5Util.charStarts(bytes, numChars)
    val d = Md5Util.digest()
    val scratch = new Array[Byte](16)
    // boundary = 1-based char position ending a window whose md5-32
    // residue mod `mask` is 0; the doc end always closes the final chunk
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
    var k = 0
    while (k <= numChars - w) {
      d.reset()
      d.update(bytes, starts(k), starts(k + w) - starts(k))
      d.digest(scratch, 0, 16)
      val h = ((scratch(0) & 0xffL) << 24) | ((scratch(1) & 0xffL) << 16) |
        ((scratch(2) & 0xffL) << 8) | (scratch(3) & 0xffL)
      if (h % mask == 0) bounds += (k + w)
      k += 1
    }
    if (bounds.isEmpty || bounds(bounds.length - 1) != numChars)
      bounds += numChars
    val rows = new Array[InternalRow](bounds.length)
    val hex = new Array[Char](32)
    var prev = 0
    var j = 0
    while (j < bounds.length) {
      val e = bounds(j)
      d.reset()
      d.update(bytes, starts(prev), starts(e) - starts(prev))
      d.digest(scratch, 0, 16)
      rows(j) = InternalRow(j + 1, e - prev,
        UTF8String.fromString(Md5Util.hex32(scratch, hex)))
      prev = e
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(rows)
  }
}

/** Fused content-defined chunker: `cdc_chunks(text, w, maskBits)` →
  * ARRAY<STRUCT<idx, len, digest>> — see [[CdcUtil.cdcChunks]] and
  * `TextOps.cdcChunks` for semantics and the scale argument.
  */
final case class CdcChunksExpr(child: Expression, w: Int, maskBits: Int)
    extends UnaryExpression {
  require(w >= 2 && maskBits >= 1 && maskBits <= 20,
    s"need w >= 2 and 1 <= maskBits <= 20, got w=$w maskBits=$maskBits")
  private def mask = 1 << maskBits
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("idx",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("len",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("digest",
          StringType, nullable = false))),
      containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    CdcUtil.cdcChunks(input.asInstanceOf[UTF8String], w, mask)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcUtil.cdcChunks($c, $w, $mask)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FrameHashUtil {
  /** The distinct, SORTED md5-hex set of a payload's sampled frames —
    * bit-identical to exploding [[graft.operators.MultimodalOps
    * .sampleFrames]]'s chunks through `md5()` and re-collecting
    * `sort_array(collect_set(...))`, but per-row: frame `p`
    * (p ∈ [0, max(⌊len/(frameBytes·everyK)⌋, 1))) is the byte slice
    * `[p·frameBytes·everyK, +frameBytes)` clipped to the payload (the
    * `substr` clipping rule), hashed with a thread-local digest, hex'd
    * without intermediate strings, dedup'd in a TreeSet. Replaces an
    * explode (~frames-per-payload row amplification of the BINARY
    * column) + a corpus-wide groupBy shuffle with zero-shuffle
    * scan-local work — the difference between "payload bytes never
    * leave the scan partition" as a doc-comment and as a plan shape.
    */
  def frameMd5s(bin: Array[Byte], frameBytes: Int, everyK: Int):
      org.apache.spark.sql.catalyst.util.ArrayData = {
    val len = bin.length
    val stride = frameBytes * everyK
    val n = math.max(len / stride, 1)
    val set = new java.util.TreeSet[String]()
    val d = Md5Util.digest()
    val scratch = new Array[Byte](16)
    val hex = new Array[Char](32)
    var p = 0
    while (p < n) {
      val off = p * stride
      val end = math.min(off + frameBytes, len)
      d.reset()
      if (end > off) d.update(bin, off, end - off)
      d.digest(scratch, 0, 16)
      set.add(Md5Util.hex32(scratch, hex)): Unit
      p += 1
    }
    val out = new Array[Any](set.size)
    var i = 0
    val it = set.iterator()
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** `frame_md5s(bin, frameBytes, everyK)` → ARRAY<STRING>, sorted
  * distinct (see [[FrameHashUtil.frameMd5s]]).
  */
final case class FrameMd5s(child: Expression, frameBytes: Int, everyK: Int)
    extends UnaryExpression {
  require(frameBytes >= 1 && everyK >= 1, "frameBytes and everyK must be >= 1")
  require(frameBytes.toLong * everyK <= Int.MaxValue, "frameBytes * everyK overflows Int")
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    FrameHashUtil.frameMd5s(input.asInstanceOf[Array[Byte]], frameBytes, everyK)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FrameHashUtil.frameMd5s($c, $frameBytes, $everyK)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
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

final case class Md5Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Md5Util.hash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Util.hash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

final case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Md5Util.simHash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Util.simHash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SortableBitsUtil {
  /** IEEE-754 double → long whose SIGNED order matches the double order
    * (the radix-sort bit trick): negative doubles flip their magnitude
    * bits, positives pass through. Monotonic over all finite doubles;
    * −0.0 lands one step below +0.0 (adjacent, so equal values can only
    * straddle adjacent histogram buckets — harmless for rank selection);
    * NaN canonicalizes via doubleToLongBits and sorts above +Inf, like
    * Spark's ordering.
    */
  def sortable(v: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(v)
    bits ^ ((bits >> 63) & 0x7fffffffffffffffL)
  }
}

/** Order-preserving bucket id for a double: the top bits of the sortable
  * long, i.e. `sortable(v) >> shift`. Bucket ids compare like the values
  * do — the building block for histogram-selection quantiles, where a
  * monotonic bucketing is needed WITHOUT a prior min/max pass.
  */
final case class DoubleSortableBucket(child: Expression, shift: Int)
    extends UnaryExpression {
  require(shift >= 0 && shift < 64, "shift must be in [0, 64)")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be double, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SortableBitsUtil.sortable(input.asInstanceOf[Double]) >> shift

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"(graft.functions.SortableBitsUtil.sortable($c) >> $shift)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `audio_fingerprint(bin)` → LONG: the 32-band spectral band-energy
  * content key ([[graft.operators.MultimodalOps.audioFingerprint32]] —
  * JDK PCM decode + frame FFT per row; 0 for undecodable payloads).
  * The scalar-SQL face of the m11 seam, same kernel, so the two
  * surfaces cannot drift.
  */
final case class AudioFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be binary, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    graft.operators.MultimodalOps.audioFingerprint32(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.operators.MultimodalOps.audioFingerprint32($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
