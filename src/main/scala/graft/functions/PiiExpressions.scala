package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII matchers (the d84 redaction rules as one-pass byte walks).
  *
  * The composable form — three `regexp_replace` + three `regexp_count`
  * over the same row — pays java.util.regex's interpreted-NFA constant
  * (~8× RE2 on these patterns) plus a String⇄UTF8String round trip per
  * pass; on a curation scan that kernel IS the query. These walkers
  * are hand-compiled forms of the EXACT patterns in
  * [[graft.operators.TextOps.PiiEmailPattern]]/`PiiIpv4Pattern`/
  * `PiiPhonePattern`, replicating java.util.regex leftmost-first
  * semantics including the quirky corners (greedy optional separators
  * that annex a trailing sep before a letter via `\b`; `\.tld`
  * backtracking that picks the LAST dot with ≥2 alphas; Java's `\b`
  * word-ness being `Character.isLetterOrDigit` — Unicode-aware even
  * without UNICODE_CHARACTER_CLASS, unlike its ASCII `\w`, so 'é'
  * BLOCKS a boundary) — a ScalaCheck property plus adversarial fixtures pin
  * kernel ≡ regex on both the scrub and the counts, and the d84
  * oracle (DuckDB RE2 running the same pattern text) pins the
  * cross-engine behavior. All pattern characters are single ASCII
  * bytes, so byte comparisons are exact character comparisons (the
  * [[C4Util]] playbook).
  */
object PiiUtil {

  private def mk(f: Char => Boolean): Array[Boolean] =
    Array.tabulate(128)(i => f(i.toChar))
  private def alpha(ch: Char) = (ch >= 'a' && ch <= 'z') || (ch >= 'A' && ch <= 'Z')
  private def digit(ch: Char) = ch >= '0' && ch <= '9'
  private val W = mk(ch => alpha(ch) || digit(ch) || ch == '_') // \w
  private val L = mk(ch => alpha(ch) || digit(ch) || ch == '.' || ch == '_' ||
    ch == '%' || ch == '+' || ch == '-') // email local part class
  private val D = mk(ch => alpha(ch) || digit(ch) || ch == '.' || ch == '-') // domain
  private val A = mk(alpha) // [A-Za-z]
  private val G = mk(digit) // \d
  private val S = mk(ch => ch == '-' || ch == ' ' || ch == '.') // phone sep

  @inline private def in(cls: Array[Boolean], b: Byte): Boolean = b >= 0 && cls(b)

  /** Code point starting at lead-byte index `i` (valid UTF-8 assumed —
    * UTF8String guarantees it; truncated tails decode to U+FFFD-ish
    * garbage that isLetterOrDigit rejects, matching "non-word").
    */
  private def cpAt(bs: Array[Byte], i: Int): Int = {
    val n = bs.length
    val b0 = bs(i) & 0xFF
    if (b0 < 0xC0) b0
    else if (b0 < 0xE0) {
      if (i + 1 >= n) 0xFFFD
      else ((b0 & 0x1F) << 6) | (bs(i + 1) & 0x3F)
    } else if (b0 < 0xF0) {
      if (i + 2 >= n) 0xFFFD
      else ((b0 & 0x0F) << 12) | ((bs(i + 1) & 0x3F) << 6) | (bs(i + 2) & 0x3F)
    } else {
      if (i + 3 >= n) 0xFFFD
      else ((b0 & 0x07) << 18) | ((bs(i + 1) & 0x3F) << 12) |
        ((bs(i + 2) & 0x3F) << 6) | (bs(i + 3) & 0x3F)
    }
  }

  /** java.util.regex `\b` word-ness is NOT `\w`: without
    * UNICODE_CHARACTER_CLASS the Bound node still tests
    * `'_' || Character.isLetterOrDigit(cp)` — Unicode-aware — so 'é'
    * and '日' are boundary-BLOCKING word chars while `\w` would call
    * them non-word (and RE2's ASCII `\b` does; see the TextOps
    * pattern notes for the cross-engine consequence). These check the
    * code point STARTING at byte `i` / ENDING before byte `i`.
    */
  @inline private def isWordAt(bs: Array[Byte], i: Int): Boolean =
    if (i < 0 || i >= bs.length) false
    else if (bs(i) >= 0) W(bs(i))
    else {
      val cp = cpAt(bs, i)
      Character.isLetterOrDigit(cp)
    }

  private def isWordBefore(bs: Array[Byte], i: Int): Boolean =
    if (i <= 0) false
    else if (bs(i - 1) >= 0) W(bs(i - 1))
    else {
      var j = i - 1
      while (j > 0 && (bs(j) & 0xC0) == 0x80) j -= 1
      Character.isLetterOrDigit(cpAt(bs, j))
    }
  @inline private def digitRun(bs: Array[Byte], p: Int): Int = {
    val n = bs.length
    var q = p
    while (q < n && in(G, bs(q))) q += 1
    q - p
  }

  /** Next email match at/after `from`: packed `(start << 32) | end`,
    * or -1. Anchored on each '@' left to right: the local part is the
    * maximal backward L-run (clamped at `from` — java.util.regex
    * resumes start positions there, not lookbehind), the domain is
    * the forward D-run split at the LAST '.' whose following alpha
    * run has ≥ 2 chars (greedy `[A-Za-z0-9.-]+` backtracking into
    * `\.[A-Za-z]{2,}`), with the match ending at that alpha run's end
    * (`{2,}` greedy stops at the first non-alpha, e.g. `ex.co.uk3`
    * matches through `uk` and leaves `3`).
    */
  def nextEmail(bs: Array[Byte], from: Int): Long = {
    val n = bs.length
    var pos = from
    while (pos < n) {
      var a = pos
      while (a < n && bs(a) != '@') a += 1
      if (a >= n) return -1L
      var ls = a
      while (ls > 0 && in(L, bs(ls - 1))) ls -= 1
      if (ls < from) ls = from
      if (ls < a) {
        val dStart = a + 1
        var dEnd = dStart
        while (dEnd < n && in(D, bs(dEnd))) dEnd += 1
        var m = dEnd - 1
        while (m >= dStart + 1) {
          if (bs(m) == '.') {
            var ae = m + 1
            while (ae < n && in(A, bs(ae))) ae += 1
            if (ae - (m + 1) >= 2) return (ls.toLong << 32) | ae
          }
          m -= 1
        }
      }
      pos = a + 1
    }
    -1L
  }

  /** Next IPv4 match at/after `from` (same packing). A candidate start
    * is a digit with a non-`\w` left neighbor (`\b`); each of the
    * first three octets must be a whole 1-3 digit run followed by '.'
    * (a 4+ run can never backtrack into a dot — the next char is a
    * digit), the fourth a whole 1-3 digit run with a non-`\w` right
    * neighbor.
    */
  def nextIp(bs: Array[Byte], from: Int): Long = {
    val n = bs.length
    var p = from
    while (p < n) {
      if (in(G, bs(p)) && !isWordBefore(bs, p)) {
        val e = ipAt(bs, p)
        if (e > 0) return (p.toLong << 32) | e
      }
      p += 1
    }
    -1L
  }

  private def ipAt(bs: Array[Byte], start: Int): Int = {
    val n = bs.length
    var p = start
    var k = 0
    while (k < 3) {
      val rl = digitRun(bs, p)
      if (rl < 1 || rl > 3 || p + rl >= n || bs(p + rl) != '.') return -1
      p += rl + 1
      k += 1
    }
    val rl = digitRun(bs, p)
    if (rl < 1 || rl > 3) return -1
    if (isWordAt(bs, p + rl)) return -1
    p + rl
  }

  /** Next phone match at/after `from` (same packing). Anchored on each
    * '+': country code `\d{1,3}` (greedy, BACKTRACKED 3→1 — a long
    * unseparated run splits between the code and the body) + OPTIONAL
    * separator (greedy-present first) + exactly 3 digits, then the
    * backtracking tail `[- .]? \d{3,4} [- .]? \d{0,4} \b` tried in
    * java.util.regex preference order — each optional separator
    * greedy-present first, each digit group longest first — so the
    * first combination whose end lands on a word boundary wins. That
    * includes the engine's quirk of annexing a trailing separator when
    * a letter follows (`"+12 345-678 word"` matches through the space:
    * sep taken, `\d{0,4}` empty, `\b` holds between ' ' and 'w').
    * The optional first separator is what admits the very common
    * unseparated paste format `+14155551234` (r14 — previously the
    * mandatory separator silently under-redacted those).
    */
  def nextPhone(bs: Array[Byte], from: Int): Long = {
    val n = bs.length
    var p = from
    while (p < n) {
      if (bs(p) == '+') {
        val e = phoneAt(bs, p)
        if (e > 0) return (p.toLong << 32) | e
      }
      p += 1
    }
    -1L
  }

  private def phoneAt(bs: Array[Byte], start: Int): Int = {
    val n = bs.length
    val p0 = start + 1
    val rl = digitRun(bs, p0)
    if (rl < 1) return -1
    var cc = math.min(3, rl) // \d{1,3} greedy: longest first
    while (cc >= 1) {
      val q = p0 + cc
      var s1 = if (q < n && in(S, bs(q))) 1 else 0 // [- .]? present first
      while (s1 >= 0) {
        val r = q + s1
        if (r + 3 <= n && in(G, bs(r)) && in(G, bs(r + 1)) && in(G, bs(r + 2))) {
          val x = phoneTail(bs, r + 3)
          if (x > 0) return x
        }
        s1 -= 1
      }
      cc -= 1
    }
    -1
  }

  /** The `[- .]? \d{3,4} [- .]? \d{0,4} \b` tail from `t`, java-regex
    * preference order; end offset or −1.
    */
  private def phoneTail(bs: Array[Byte], t: Int): Int = {
    val n = bs.length
    var s2 = if (t < n && in(S, bs(t))) 1 else 0
    while (s2 >= 0) {
      val u = t + s2
      var d1 = math.min(4, digitRun(bs, u))
      while (d1 >= 3) {
        val v = u + d1
        var s3 = if (v < n && in(S, bs(v))) 1 else 0
        while (s3 >= 0) {
          val w0 = v + s3
          var d2 = math.min(4, digitRun(bs, w0))
          while (d2 >= 0) {
            val x = w0 + d2
            if (isWordBefore(bs, x) != isWordAt(bs, x)) return x
            d2 -= 1
          }
          s3 -= 1
        }
        d1 -= 1
      }
      s2 -= 1
    }
    -1
  }

  @inline private def next(kind: Int, bs: Array[Byte], from: Int): Long =
    if (kind == 0) nextEmail(bs, from)
    else if (kind == 1) nextIp(bs, from)
    else nextPhone(bs, from)

  private def count(kind: Int, bs: Array[Byte]): Int = {
    var c = 0
    var p = 0
    var m = next(kind, bs, p)
    while (m >= 0) {
      c += 1
      p = (m & 0xFFFFFFFFL).toInt
      m = next(kind, bs, p)
    }
    c
  }

  /** Non-overlapping replace, resuming after each match end (the
    * replaceAll contract); the token is inserted LITERALLY (no `$`
    * group expansion — the placeholders carry none anyway). Returns
    * the input array untouched when nothing matches.
    */
  private def replaceAll(kind: Int, bs: Array[Byte], tok: Array[Byte]): Array[Byte] = {
    var m = next(kind, bs, 0)
    if (m < 0) return bs
    val bos = new java.io.ByteArrayOutputStream(bs.length)
    var p = 0
    while (m >= 0) {
      val st = (m >>> 32).toInt
      val en = (m & 0xFFFFFFFFL).toInt
      bos.write(bs, p, st - p)
      bos.write(tok, 0, tok.length)
      p = en
      m = next(kind, bs, p)
    }
    bos.write(bs, p, bs.length - p)
    bos.toByteArray
  }

  /** Sequential scrub — email, then IPv4 on the email-scrubbed text,
    * then phone on that (rule interactions at replacement junctions
    * are REAL: `"a@b.com1.2.3.4"` only becomes an IP once `<EMAIL>`'s
    * '>' creates the `\b` — so the passes compose, never fuse).
    */
  def scrub(s: UTF8String, emailTok: Array[Byte], ipTok: Array[Byte],
      phoneTok: Array[Byte]): UTF8String = {
    var bs = s.getBytes
    bs = replaceAll(0, bs, emailTok)
    bs = replaceAll(1, bs, ipTok)
    bs = replaceAll(2, bs, phoneTok)
    UTF8String.fromBytes(bs)
  }

  /** Per-rule counts on the ORIGINAL text (independent rules — the
    * [[graft.operators.TextOps.piiCounts]] contract).
    */
  def counts(s: UTF8String): InternalRow = {
    val bs = s.getBytes
    InternalRow(count(0, bs), count(1, bs), count(2, bs))
  }

  // ---- payment-card rule (d103): MAXIMAL digit[-sep-digit] runs ----
  // A run is maximal digits-with-single-separators (sep counts only
  // when followed by a digit — RE2's greedy `\d(?:[ -]?\d)*`, so the
  // cross-engine oracle can extract the identical runs without
  // lookarounds); a 13..19-digit run QUALIFIES when the Luhn checksum
  // holds, and redacts entirely (internal separators included).
  //
  // OVER-LONG runs (>19 digits) are segmented, not dropped: two valid
  // cards separated by a single space/dash merge into one run ("4111…
  // 4012…" in a dump or CSV row), and a rule that only checks whole
  // runs would silently leak both. Segmentation is greedy
  // left-to-right over GROUP boundaries (run start, or a digit right
  // after an in-run separator): from each boundary take the LONGEST
  // boundary-bounded sub-segment of 13..19 digits that passes Luhn,
  // emit it, and continue after it; a boundary that opens no valid
  // segment advances one group. Segments must both START and END at a
  // boundary, so a CONTIGUOUS 20-digit blob still has no internal
  // boundaries and is never carved into a 19-digit "card" — the
  // it's-an-ID-not-a-card defense survives; only separator-structured
  // over-long runs (where adjacent real cards live) are split.

  /** Next qualifying card segment at/after `from`, packed like the
    * others. Resuming from a previous segment's end lands on the
    * run's next group boundary and continues the greedy segmentation.
    */
  def nextCard(bs: Array[Byte], from: Int): Long = {
    val n = bs.length
    var p = from
    while (p < n) {
      if (digitB(bs(p)) && !runPreceded(bs, p)) {
        val e = runEnd(bs, p)
        val nd = digitCount(bs, p, e)
        if (nd >= 13 && nd <= 19 && luhnOk(bs, p, e))
          return (p.toLong << 32) | e
        if (nd > 19) {
          val seg = nextSegment(bs, p, e)
          if (seg >= 0L) return seg
        }
        p = e // a non-qualifying run is skipped whole (it IS maximal)
      } else if (digitB(bs(p)) && groupStart(bs, p) &&
          digitCount(bs, runStart(bs, p), runEnd(bs, p)) > 19) {
        // resumed INSIDE an over-long run (the caller consumed an
        // earlier segment): continue the greedy walk from this boundary
        val e = runEnd(bs, p)
        val seg = nextSegment(bs, p, e)
        if (seg >= 0L) return seg
        p = e
      } else p += 1
    }
    -1L
  }

  /** Is the digit at `p` a group boundary inside a run (preceded by an
    * in-run separator)?
    */
  @inline private def groupStart(bs: Array[Byte], p: Int): Boolean =
    p >= 2 && sepB(bs(p - 1)) && digitB(bs(p - 2))

  /** Start of the maximal run containing the digit at `p0`. */
  private def runStart(bs: Array[Byte], p0: Int): Int = {
    var p = p0
    var cont = true
    while (cont) {
      if (p >= 1 && digitB(bs(p - 1))) p -= 1
      else if (p >= 2 && sepB(bs(p - 1)) && digitB(bs(p - 2))) p -= 2
      else cont = false
    }
    p
  }

  /** Greedy next card segment in an over-long run: from group boundary
    * `b0` (then each following boundary), the LONGEST boundary-bounded
    * sub-segment of 13..19 digits passing Luhn. −1 if the rest of the
    * run opens none.
    */
  private def nextSegment(bs: Array[Byte], b0: Int, runE: Int): Long = {
    var b = b0
    while (b < runE) {
      var p = b
      var nd = 0
      var best = -1
      var go = true
      while (go && p < runE) {
        if (digitB(bs(p))) {
          nd += 1
          if (nd > 19) go = false
          else if (nd >= 13 && (p + 1 == runE || sepB(bs(p + 1))) &&
              luhnOk(bs, b, p + 1)) best = p + 1
        }
        p += 1
      }
      if (best >= 0) return (b.toLong << 32) | best
      // no valid segment opens here — advance to the next group boundary
      var q = b
      while (q < runE && digitB(bs(q))) q += 1
      if (q < runE && sepB(bs(q))) q += 1
      b = q
    }
    -1L
  }

  @inline private def digitB(b: Byte): Boolean = b >= '0' && b <= '9'
  @inline private def sepB(b: Byte): Boolean = b == ' ' || b == '-'

  /** Is the digit at `p` inside or continuing a run that began earlier
    * (previous byte a digit, or a separator itself preceded by one)?
    */
  private def runPreceded(bs: Array[Byte], p: Int): Boolean =
    (p >= 1 && digitB(bs(p - 1))) ||
      (p >= 2 && sepB(bs(p - 1)) && digitB(bs(p - 2)))

  /** End (exclusive) of the maximal run starting at digit `p`. */
  private def runEnd(bs: Array[Byte], p0: Int): Int = {
    val n = bs.length
    var p = p0
    while (p < n) {
      if (digitB(bs(p))) p += 1
      else if (sepB(bs(p)) && p + 1 < n && digitB(bs(p + 1))) p += 1
      else return p
    }
    p
  }

  private def digitCount(bs: Array[Byte], s: Int, e: Int): Int = {
    var c = 0; var p = s
    while (p < e) { if (digitB(bs(p))) c += 1; p += 1 }
    c
  }

  /** Luhn over the run's digits, right-to-left doubling every second. */
  private def luhnOk(bs: Array[Byte], s: Int, e: Int): Boolean = {
    var sum = 0; var k = 0; var p = e - 1
    while (p >= s) {
      if (digitB(bs(p))) {
        var d = bs(p) - '0'
        if (k % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
        sum += d; k += 1
      }
      p -= 1
    }
    sum % 10 == 0
  }

  def countCards(s: UTF8String): Int = {
    val bs = s.getBytes
    var c = 0; var m = nextCard(bs, 0)
    while (m >= 0) { c += 1; m = nextCard(bs, (m & 0xFFFFFFFFL).toInt) }
    c
  }

  /** Total digits inside qualifying runs (the redaction footprint —
    * what the count alone can't see when card lengths vary).
    */
  def cardDigits(s: UTF8String): Int = {
    val bs = s.getBytes
    var c = 0; var m = nextCard(bs, 0)
    while (m >= 0) {
      c += digitCount(bs, (m >>> 32).toInt, (m & 0xFFFFFFFFL).toInt)
      m = nextCard(bs, (m & 0xFFFFFFFFL).toInt)
    }
    c
  }

  /** (n_cards, n_card_digits) as one row — the CardCounts kernel. */
  def cardCountsRow(s: UTF8String): InternalRow =
    InternalRow(countCards(s), cardDigits(s))

  def scrubCards(s: UTF8String, tok: Array[Byte]): UTF8String = {
    val bs = s.getBytes
    var m = nextCard(bs, 0)
    if (m < 0) return s
    val bos = new java.io.ByteArrayOutputStream(bs.length)
    var p = 0
    while (m >= 0) {
      val st = (m >>> 32).toInt
      val en = (m & 0xFFFFFFFFL).toInt
      bos.write(bs, p, st - p)
      bos.write(tok, 0, tok.length)
      p = en
      m = nextCard(bs, p)
    }
    bos.write(bs, p, bs.length - p)
    UTF8String.fromBytes(bos.toByteArray)
  }
}

/** `pii_counts(text)` → STRUCT<n_email INT, n_ip INT, n_phone INT>. */
final case class PiiCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_email", IntegerType, nullable = false),
    StructField("n_ip", IntegerType, nullable = false),
    StructField("n_phone", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PiiUtil.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiUtil.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `scrub_pii(text)` → STRING (see [[PiiUtil.scrub]]); the placeholder
  * tokens are plan constants carried as reference objects.
  */
final case class PiiScrub(child: Expression, emailTok: String, ipTok: String,
    phoneTok: String) extends UnaryExpression {
  private lazy val eB = emailTok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private lazy val iB = ipTok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private lazy val pB = phoneTok.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PiiUtil.scrub(input.asInstanceOf[UTF8String], eB, iB, pB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eRef = ctx.addReferenceObj("piiEmailTok", eB, "byte[]")
    val iRef = ctx.addReferenceObj("piiIpTok", iB, "byte[]")
    val pRef = ctx.addReferenceObj("piiPhoneTok", pB, "byte[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PiiUtil.scrub($c, $eRef, $iRef, $pRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `card_counts(text)` → (n_cards, n_card_digits): qualifying
  * payment-card runs and their redaction footprint (see
  * [[PiiUtil.nextCard]] — maximal runs, 13-19 digits, Luhn).
  */
final case class CardCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_cards", IntegerType, nullable = false),
    StructField("n_card_digits", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PiiUtil.cardCountsRow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiUtil.cardCountsRow($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `scrub_cards(text)` → STRING with qualifying card runs replaced. */
final case class CardScrub(child: Expression, tok: String)
    extends UnaryExpression {
  private lazy val tB = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"input must be string, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PiiUtil.scrubCards(input.asInstanceOf[UTF8String], tB)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("cardTok", tB, "byte[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiUtil.scrubCards($c, $tRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiExpressions {
  def piiCounts(text: Column): Column =
    GraftSqlShims.column(PiiCounts(GraftSqlShims.expression(text)))
  def scrubPii(text: Column, emailTok: String, ipTok: String,
      phoneTok: String): Column =
    GraftSqlShims.column(PiiScrub(GraftSqlShims.expression(text),
      emailTok, ipTok, phoneTok))
  def cardCounts(text: Column): Column =
    GraftSqlShims.column(CardCounts(GraftSqlShims.expression(text)))
  def scrubCards(text: Column, tok: String): Column =
    GraftSqlShims.column(CardScrub(GraftSqlShims.expression(text), tok))
}
