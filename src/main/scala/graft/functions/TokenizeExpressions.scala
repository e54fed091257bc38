package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-ONLY edge trim — the repo's token-stream contract
  * (`TextOps.tokens` = Spark `trim`, which strips ' ' alone; the
  * DuckDB oracles' `trim(text)` likewise). Java's `String.trim` strips
  * every char <= U+0020, which would silently diverge from both on
  * text with edge tabs/newlines — newly load-bearing now that the
  * d68/d86 tokenizer applies are hash-matched against SQL oracles.
  */
private[functions] object SpaceTrim {
  def apply(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    if (from == 0 && to == s.length) s else s.substring(from, to)
  }
}

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
    * BERT's is_bad contract, not a partial emission. A token longer
    * than `maxWordChars` codepoints emits `unk` without segmentation —
    * BERT's `max_input_chars_per_word` cap (reference default 200).
    *
    * With `basic = true`, BERT's BasicTokenizer runs FIRST
    * ([[basicTokenize]]): control-char cleanup, CJK char isolation,
    * punctuation splitting, and (with `lowercase`) lowercasing +
    * accent stripping — what raw web text needs before WordPiece, so
    * punctuation-glued tokens segment instead of falling to whole-word
    * `unk`. Default OFF: the pre-existing space-split contract (and
    * the d68 conformance hashes) are unchanged.
    */
  def encode(text: UTF8String, vocab: java.util.HashSet[String],
      maxPiece: Int, unk: String, basic: Boolean, lowercase: Boolean,
      maxWordChars: Int): ArrayData = {
    val raw = text.toString
    val s = SpaceTrim(if (basic) basicTokenize(raw, lowercase) else raw)
    val out = new java.util.ArrayList[UTF8String]()
    var start = 0
    val n = s.length
    while (start <= n) {
      val sp = s.indexOf(' ', start)
      val end = if (sp < 0) n else sp
      if (end > start) encodeWord(s, start, end, vocab, maxPiece, unk, maxWordChars, out)
      if (sp < 0) start = n + 1 else start = sp + 1
    }
    new GenericArrayData(out.toArray)
  }

  /** BERT's BasicTokenizer (Devlin et al. 2019, `tokenization.py`):
    * (1) drop U+0000/U+FFFD and control/format chars, map all
    * whitespace to a space; (2) isolate CJK ideographs as single-char
    * tokens (the unified-ideograph + compatibility blocks the
    * reference lists); (3) whitespace-split; (4) per token, optionally
    * lowercase + strip combining accents (NFD, drop Mn); (5) split
    * punctuation (ASCII punct ranges + Unicode P* categories) into
    * standalone tokens. Returns the tokens single-space-joined — the
    * repo's standard token stream shape.
    */
  def basicTokenize(s: String, lowercase: Boolean): String = {
    val cleaned = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (!(cp == 0 || cp == 0xFFFD || isControl(cp))) {
        if (isWhitespace(cp)) cleaned.append(' ')
        else if (isCjk(cp)) {
          cleaned.append(' '); cleaned.appendCodePoint(cp); cleaned.append(' ')
        } else cleaned.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    val out = new java.lang.StringBuilder(cleaned.length)
    cleaned.toString.split(" ").foreach { tok0 =>
      if (tok0.nonEmpty) {
        val tok =
          if (lowercase) stripAccents(tok0.toLowerCase(java.util.Locale.ROOT))
          else tok0
        // split_on_punc: punctuation chars become their own tokens
        var j = 0
        var inWord = false
        while (j < tok.length) {
          val cp = tok.codePointAt(j)
          if (isPunct(cp)) {
            if (out.length > 0) out.append(' ')
            out.appendCodePoint(cp)
            inWord = false
          } else {
            if (!inWord && out.length > 0) out.append(' ')
            out.appendCodePoint(cp)
            inWord = true
          }
          j += Character.charCount(cp)
        }
      }
    }
    out.toString
  }

  private def isControl(cp: Int): Boolean =
    if (cp == '\t' || cp == '\n' || cp == '\r') false
    else {
      val t = Character.getType(cp)
      t == Character.CONTROL || t == Character.FORMAT
    }

  private def isWhitespace(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' ||
      Character.getType(cp) == Character.SPACE_SEPARATOR

  // BERT's _is_punctuation: the four ASCII punct ranges OR any Unicode
  // P* category (treats $ ^ ` ~ etc. as punctuation via the ASCII arm)
  private def isPunct(cp: Int): Boolean =
    (cp >= 33 && cp <= 47) || (cp >= 58 && cp <= 64) ||
      (cp >= 91 && cp <= 96) || (cp >= 123 && cp <= 126) || {
        val t = Character.getType(cp)
        t == Character.CONNECTOR_PUNCTUATION || t == Character.DASH_PUNCTUATION ||
          t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
          t == Character.INITIAL_QUOTE_PUNCTUATION ||
          t == Character.FINAL_QUOTE_PUNCTUATION || t == Character.OTHER_PUNCTUATION
      }

  // the CJK ideograph blocks tokenization.py's _is_chinese_char lists
  private def isCjk(cp: Int): Boolean =
    (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
      (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0x2A700 && cp <= 0x2B73F) ||
      (cp >= 0x2B740 && cp <= 0x2B81F) || (cp >= 0x2B820 && cp <= 0x2CEAF) ||
      (cp >= 0xF900 && cp <= 0xFAFF) || (cp >= 0x2F800 && cp <= 0x2FA1F)

  private def stripAccents(s: String): String = {
    val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(n.length)
    var i = 0
    while (i < n.length) {
      val c = n.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def encodeWord(s: String, from: Int, to: Int,
      vocab: java.util.HashSet[String], maxPiece: Int, unk: String,
      maxWordChars: Int, out: java.util.ArrayList[UTF8String]): Unit = {
    if (s.codePointCount(from, to) > maxWordChars) {
      out.add(UTF8String.fromString(unk)); return
    }
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

/** `wordpiece_encode(text)` → ARRAY<STRING> of pieces. `basic` turns on
  * BasicTokenizer pre-tokenization (flag-gated, default off — the
  * space-split contract and the d68 hashes are unchanged);
  * `maxWordChars` is BERT's whole-word-`[UNK]` length cap.
  */
final case class WordPieceEncode(child: Expression, vocab: Seq[String],
    unk: String = "[UNK]", basic: Boolean = false, lowercase: Boolean = false,
    maxWordChars: Int = 200) extends UnaryExpression {
  require(vocab.nonEmpty, "vocab must be non-empty")
  require(maxWordChars >= 1, "maxWordChars must be >= 1")

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
    WordPieceUtil.encode(input.asInstanceOf[UTF8String], vocabSet, maxPiece, unk,
      basic, lowercase, maxWordChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpVocab", vocabSet, "java.util.HashSet")
    val unkLit = ctx.addReferenceObj("wpUnk", unk, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordPieceUtil.encode($c, $ref, $maxPiece, $unkLit, $basic, $lowercase, $maxWordChars)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE ENCODING — the apply side of [[graft.operators.CurationOps
  * .learnBpeMerges]] (Sennrich 2016 §3.2's apply algorithm): per
  * whitespace token, start from code-point symbols and repeatedly
  * merge the PRESENT adjacent pair with the LOWEST merge rank (all
  * its occurrences, left to right) until no adjacent pair has a rank.
  * The priority loop is the correct apply — sequential application in
  * list order diverges when a later merge manufactures a symbol an
  * earlier merge's pair names (two merge trees can yield the same
  * symbol string). Per-row kernel, zero shuffle; the rank table rides
  * as a model-sized reference object.
  */
object BpeUtil {

  /** Build the rank lookup: key = `len(lhs) ":" lhs rhs` — length-
    * prefixed so no separator char can collide with symbol content.
    */
  def ranksOf(merges: Seq[(String, String)]): java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(s"${a.length}:$a$b", Int.box(i))
    }
    m
  }

  def encode(text: UTF8String,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    val s = SpaceTrim(text.toString)
    val out = new java.util.ArrayList[ArrayData]()
    var start = 0
    val n = s.length
    while (start <= n) {
      val sp = s.indexOf(' ', start)
      val end = if (sp < 0) n else sp
      if (end > start) out.add(encodeWord(s, start, end, ranks))
      if (sp < 0) start = n + 1 else start = sp + 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[Any]])
  }

  private def encodeWord(s: String, from: Int, to: Int,
      ranks: java.util.HashMap[String, Integer]): ArrayData = {
    // code-point symbols
    var syms = new java.util.ArrayList[String]()
    var i = from
    while (i < to) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      syms.add(s.substring(i, math.min(i + w, to)))
      i += w
    }
    var merging = syms.size >= 2
    while (merging) {
      var bestRank = Int.MaxValue
      var ba: String = null
      var bb: String = null
      var j = 0
      while (j < syms.size - 1) {
        val a = syms.get(j); val b = syms.get(j + 1)
        val r = ranks.get(s"${a.length}:$a$b")
        if (r != null && r < bestRank) { bestRank = r; ba = a; bb = b }
        j += 1
      }
      if (ba == null) merging = false
      else {
        // merge every occurrence of the winning pair, left to right
        val nb = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k + 1 < syms.size && syms.get(k) == ba && syms.get(k + 1) == bb) {
            nb.add(ba + bb); k += 2
          } else { nb.add(syms.get(k)); k += 1 }
        }
        syms = nb
        merging = syms.size >= 2
      }
    }
    val arr = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { arr(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }
}

/** `bpe_encode(text)` → ARRAY<ARRAY<STRING>>: one piece array per
  * whitespace token (inner concatenation reproduces the token exactly
  * — the d86 gate's lossless invariant).
  */
final case class BpeEncode(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  @transient private lazy val ranks = BpeUtil.ranksOf(merges)

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"input must be string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    BpeUtil.encode(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeUtil.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unigram-LM (SentencePiece) tokenizer APPLY — the third major
  * subword family next to BPE (d86) and WordPiece (d68): Kudo 2018
  * ("Subword Regularization"), the vocabulary used by T5/LLaMA-lineage
  * tokenizers. Encoding a word is exact VITERBI over a (piece,
  * logprob) vocabulary: the segmentation maximizing the sum of piece
  * log-probabilities, O(len × maxPieceLen) per word. Single code
  * points absent from the vocabulary fall back to themselves at
  * `unkLogProb` (a large penalty — SentencePiece's unk channel, kept
  * text-preserving here so the d86/d68 lossless-reconstruction gate
  * applies verbatim), which makes every position reachable and the
  * encoder total. Ties break toward the LONGEST last piece
  * (deterministic; the spec pins Viterbi score-optimality against
  * brute-force enumeration, which is tie-break-agnostic).
  */
object UnigramUtil {

  /** (piece → logprob) lookup plus the max piece length, as one
    * reference object.
    */
  final class Vocab(pieces: Seq[(String, Double)], val unkLogProb: Double)
      extends java.io.Serializable {
    require(pieces.nonEmpty, "unigram vocab must be non-empty")
    val map = new java.util.HashMap[String, java.lang.Double](pieces.size * 2)
    pieces.foreach { case (p, lp) =>
      require(p.nonEmpty, "unigram vocab piece must be non-empty")
      map.put(p, Double.box(lp))
    }
    val maxLen: Int = math.max(pieces.iterator.map(_._1.length).max, 2)
  }

  def encode(text: UTF8String, vocab: Vocab): ArrayData = {
    val s = SpaceTrim(text.toString)
    val out = new java.util.ArrayList[ArrayData]()
    var start = 0
    val n = s.length
    while (start <= n) {
      val sp = s.indexOf(' ', start)
      val end = if (sp < 0) n else sp
      if (end > start) out.add(encodeWord(s, start, end, vocab))
      if (sp < 0) start = n + 1 else start = sp + 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray.asInstanceOf[Array[Any]])
  }

  /** Is s[from, from+w) exactly one code point? */
  @inline private def oneCp(s: String, from: Int, w: Int): Boolean =
    w == 1 || (w == 2 && Character.isHighSurrogate(s.charAt(from)) &&
      Character.isLowSurrogate(s.charAt(from + 1)))

  private def encodeWord(s: String, from: Int, to: Int,
      vocab: Vocab): ArrayData = {
    val m = to - from
    val best = new Array[Double](m + 1)
    val back = new Array[Int](m + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0
    var i = 1
    while (i <= m) {
      // j ascending from the farthest reachable start: among equal
      // scores the SMALLEST j (longest piece) wins — strict > below
      var j = math.max(0, i - vocab.maxLen)
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          val lp = vocab.map.get(s.substring(from + j, from + i))
          val sc =
            if (lp != null) best(j) + lp
            else if (oneCp(s, from + j, i - j)) best(j) + vocab.unkLogProb
            else Double.NegativeInfinity
          if (sc > best(i)) { best(i) = sc; back(i) = j }
        }
        j += 1
      }
      i += 1
    }
    // reconstruct (pieces found back-to-front)
    var cnt = 0
    var p = m
    while (p > 0) { cnt += 1; p = back(p) }
    val arr = new Array[Any](cnt)
    p = m
    var k = cnt - 1
    while (p > 0) {
      arr(k) = UTF8String.fromString(s.substring(from + back(p), from + p))
      k -= 1
      p = back(p)
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** Per-word EXPECTED piece counts + log-marginal under a (piece →
    * logprob) vocabulary — the E-step of unigram-LM training (Kudo
    * 2018 §3.2): forward-backward over ALL segmentations in log space,
    * so `expCount(p spanning [i,j)) = exp(α(i) + lp(p) + β(j) − Z)`
    * and the word's likelihood contribution is `Z = α(m)`. No unk
    * channel here — training seeds every single character, so every
    * word is segmentable by construction; an unsegmentable word (a
    * piece-less vocab) returns (empty, −∞) and the trainer skips it
    * loudly.
    */
  def expectedCounts(word: String,
      vocab: java.util.HashMap[String, java.lang.Double], maxLen: Int)
      : (java.util.HashMap[String, java.lang.Double], Double) = {
    val m = word.length
    val out = new java.util.HashMap[String, java.lang.Double]()
    if (m == 0) return (out, 0.0)
    def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else if (a > b) a + math.log1p(math.exp(b - a))
      else b + math.log1p(math.exp(a - b))
    val alpha = Array.fill(m + 1)(Double.NegativeInfinity)
    val beta = Array.fill(m + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    var j = 1
    while (j <= m) {
      var i = math.max(0, j - maxLen)
      while (i < j) {
        if (alpha(i) != Double.NegativeInfinity) {
          val lp = vocab.get(word.substring(i, j))
          if (lp != null) alpha(j) = lse(alpha(j), alpha(i) + lp.doubleValue())
        }
        i += 1
      }
      j += 1
    }
    val z = alpha(m)
    if (z == Double.NegativeInfinity) return (out, Double.NegativeInfinity)
    beta(m) = 0.0
    var i = m - 1
    while (i >= 0) {
      var j2 = math.min(m, i + maxLen)
      while (j2 > i) {
        if (beta(j2) != Double.NegativeInfinity) {
          val lp = vocab.get(word.substring(i, j2))
          if (lp != null) beta(i) = lse(beta(i), lp.doubleValue() + beta(j2))
        }
        j2 -= 1
      }
      i -= 1
    }
    i = 0
    while (i < m) {
      var j3 = i + 1
      val hi = math.min(m, i + maxLen)
      while (j3 <= hi) {
        val p = word.substring(i, j3)
        val lp = vocab.get(p)
        if (lp != null && alpha(i) != Double.NegativeInfinity &&
            beta(j3) != Double.NegativeInfinity) {
          val e = math.exp(alpha(i) + lp.doubleValue() + beta(j3) - z)
          if (e > 0.0) out.merge(p, java.lang.Double.valueOf(e),
            (x, y) => java.lang.Double.valueOf(x + y))
        }
        j3 += 1
      }
      i += 1
    }
    (out, z)
  }

  /** Viterbi total score of a word (the quantity the optimality spec
    * compares against brute-force enumeration).
    */
  def wordScore(word: String, vocab: Vocab): Double = {
    val a = encodeWord(word, 0, word.length, vocab)
    var sc = 0.0
    var i = 0
    while (i < a.numElements()) {
      val piece = a.getUTF8String(i).toString
      val lp = vocab.map.get(piece)
      sc += (if (lp != null) lp.doubleValue() else vocab.unkLogProb)
      i += 1
    }
    sc
  }
}

/** `unigram_encode(text)` → ARRAY<ARRAY<STRING>>: one Viterbi piece
  * array per whitespace token (inner concatenation reproduces the
  * token exactly — the d105 gate's lossless invariant).
  */
final case class UnigramEncode(child: Expression,
    pieces: Seq[(String, Double)], unkLogProb: Double = -20.0)
    extends UnaryExpression {
  @transient private lazy val vocab = new UnigramUtil.Vocab(pieces, unkLogProb)

  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"input must be string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    UnigramUtil.encode(input.asInstanceOf[UTF8String], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab",
      new UnigramUtil.Vocab(pieces, unkLogProb),
      "graft.functions.UnigramUtil.Vocab")
    defineCodeGen(ctx, ev, c => s"graft.functions.UnigramUtil.encode($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ftfy-style mojibake repair: undo the classic UTF-8-bytes-read-as-
  * cp1252 mis-decode ("café" → "cafÃ©", "’" → "â€™"), the single most
  * common encoding corruption in web crawls.
  */
object MojibakeUtil {

  /** "Sloppy" windows-1252 (ftfy's `sloppy-windows-1252`): the real-
    * world mis-decoders pass cp1252's five UNDEFINED bytes (81, 8D,
    * 8F, 90, 9D) through as the corresponding C1 controls, where
    * Java's own charset replaces them with U+FFFD and destroys the
    * round-trip. Table built from the public cp1252 spec: latin-1
    * identity except the 0x80–0x9F block.
    */
  private val Cp1252ToChar: Array[Char] = {
    val t = Array.tabulate[Char](256)(_.toChar)
    val block = Map(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
      0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
      0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
      0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
      0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
    block.foreach { case (b, c) => t(b) = c }
    t
  }

  private val CharToCp1252: java.util.HashMap[Character, java.lang.Byte] = {
    val m = new java.util.HashMap[Character, java.lang.Byte](512)
    var b = 0
    while (b < 256) {
      m.put(Cp1252ToChar(b), b.toByte)
      b += 1
    }
    m
  }

  /** Decode bytes as sloppy windows-1252 — the exact transform the wild
    * applies when UTF-8 bytes are read with a cp1252 reader. Public so
    * fixtures corrupt with the same semantics the repair undoes.
    */
  def sloppyDecode(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(Cp1252ToChar(bytes(i) & 0xff))
      i += 1
    }
    sb.toString
  }

  /** Undo ONE corruption layer: re-encode the chars through sloppy
    * cp1252 (a char outside its image means the string was never a
    * cp1252 mis-decode; return unchanged), then strict-decode the
    * bytes as UTF-8; on success with an actual change, that IS the
    * repair (a change implies a multi-byte sequence was consumed, so
    * false positives require legitimate text that both fits cp1252 AND
    * parses as multi-byte UTF-8 — the same inherent ambiguity every
    * fixer shares; pure-ASCII short-circuits untouched).
    */
  def repairOnce(str: String): String = {
    var i = 0
    var hasHigh = false
    while (i < str.length && !hasHigh) {
      if (str.charAt(i) >= 0x80) hasHigh = true
      i += 1
    }
    if (!hasHigh) return str
    val bytes = new Array[Byte](str.length)
    i = 0
    while (i < str.length) {
      val b = CharToCp1252.get(str.charAt(i))
      if (b == null) return str
      bytes(i) = b
      i += 1
    }
    try java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .decode(java.nio.ByteBuffer.wrap(bytes)).toString
    catch { case _: java.nio.charset.CharacterCodingException => str }
  }

  /** Iterate [[repairOnce]] to a fixpoint, capped at `maxLayers`
    * (doubly-pasted mojibake exists in real crawls; the cap prevents a
    * pathological self-similar string from looping).
    */
  def repair(s: UTF8String, maxLayers: Int): UTF8String = {
    val orig = s.toString
    var cur = orig
    var i = 0
    var changed = true
    while (i < maxLayers && changed) {
      val next = repairOnce(cur)
      changed = next != cur
      cur = next
      i += 1
    }
    if (cur == orig) s else UTF8String.fromString(cur)
  }
}

/** `repair_mojibake(text)` → STRING with up to `maxLayers` cp1252
  * mis-decode layers undone. Per-row codegen kernel, zero shuffle.
  */
final case class RepairMojibake(child: Expression, maxLayers: Int = 2)
    extends UnaryExpression {
  require(maxLayers >= 1, "maxLayers must be >= 1")
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"input must be string, got $t")
  }
  override def nullSafeEval(input: Any): Any =
    MojibakeUtil.repair(input.asInstanceOf[UTF8String], maxLayers)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MojibakeUtil.repair($c, $maxLayers)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenizeExpressions {
  import org.apache.spark.sql.GraftSqlShims
  /** Column-facing wrapper. */
  def wordPieceEncode(text: Column, vocab: Seq[String],
      unk: String = "[UNK]", basic: Boolean = false, lowercase: Boolean = false,
      maxWordChars: Int = 200): Column =
    GraftSqlShims.column(WordPieceEncode(GraftSqlShims.expression(text), vocab,
      unk, basic, lowercase, maxWordChars))

  /** Column-facing wrapper for [[RepairMojibake]]. */
  def repairMojibake(text: Column, maxLayers: Int = 2): Column =
    GraftSqlShims.column(RepairMojibake(GraftSqlShims.expression(text), maxLayers))

  /** Column-facing wrapper for [[BpeEncode]]. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column =
    GraftSqlShims.column(BpeEncode(GraftSqlShims.expression(text), merges))

  /** Column-facing wrapper for [[UnigramEncode]]. */
  def unigramEncode(text: Column, pieces: Seq[(String, Double)],
      unkLogProb: Double = -20.0): Column =
    GraftSqlShims.column(UnigramEncode(GraftSqlShims.expression(text),
      pieces, unkLogProb))
}
