package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All of these are pure `Column` expressions — they shuffle nothing and
  * scale embarrassingly (per-row, no state). The scalar counters run
  * through the fused one-pass [[graft.functions.TextStats]] kernel:
  * the composable `split`/`filter` forms are interpreted HOFs with no
  * CSE, so a projection deriving several metrics would re-tokenize the
  * document once PER COLUMN; the fused expression is codegen'd, and
  * whole-stage common-subexpression elimination runs it once per row.
  */
object TextOps {

  /** Whitespace tokens of a (already single-spaced) document — the array
    * form, for operators that need the tokens themselves (shingling,
    * Jaccard, SimHash).
    */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Tiny default stopword list used by the quality/language heuristics. */
  val DefaultStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "is")

  /** Word n-grams joined with single spaces: `["a b c", "b c d", ...]`.
    * Documents with fewer than `n` tokens yield an EMPTY array (the
    * `sequence` guard — Spark's `sequence(1, k)` counts DOWN for k < 1);
    * NULL text propagates NULL (the file's null-in→null-out convention
    * and the documented bit-parity with the WordGramMd5s kernel, which
    * is null-intolerant — without the guard, `size(NULL) >= n` is
    * not-true and the otherwise-branch minted `[]` for NULL rows).
    */
  def wordNgrams(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(t.isNull, lit(null).cast("array<string>"))
      .when(size(t) >= n,
        transform(sequence(lit(1), size(t) - (n - 1)),
          i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Overlapping token-window chunks — the RAG/embedding-pipeline
    * splitter and the inverse of [[graft.operators.CurationOps.packBins]]:
    * windows of `chunkSize` tokens starting every `stride` tokens
    * (stride < chunkSize ⇒ overlap), space-rejoined. Chunk i covers
    * tokens `[1 + i·stride, 1 + i·stride + chunkSize)` (1-based,
    * clamped at the end), and starts exist while they land on a token —
    * so every token appears in ≥1 chunk and no start is emitted past
    * the text. Pure per-row codegen (`sequence`/`transform`/`slice`),
    * zero shuffle; the caller explodes, so output rows ≈ n/stride per
    * doc. NULL text → NULL (explode drops it). `trim`+single-space
    * tokenization matches [[tokens]], so chunk boundaries agree with
    * every other token-based operator.
    */
  def chunkWithOverlap(text: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val t = tokens(text)
    // split() yields [""] (size 1) even for empty text; an empty or
    // whitespace-only document contributes NO chunks (not one empty
    // chunk a RAG caller would embed and index), matching wordNgrams'
    // empty-array behavior. The ascending-sequence guard exists because
    // Spark's sequence(1, 0) would count DOWN. The isNull guard is
    // separate: greatest() SKIPS nulls, so without it a NULL text would
    // produce [null] instead of propagating NULL.
    when(t.isNull, lit(null).cast("array<string>"))
      .when(size(t) === 1 && element_at(t, 1) === "",
        array().cast("array<string>"))
      .otherwise(
        transform(sequence(lit(1), greatest(size(t), lit(1)), lit(stride)),
          s => array_join(slice(t, s, lit(chunkSize)), " ")))
  }

  /** CONTENT-DEFINED CHUNKING (the LBFS / rsync / FastCDC boundary
    * idea): a chunk boundary falls AFTER position `i` whenever the hash
    * of the trailing `w`-char window `text[i-w+1..i]` lands on the mask
    * (`hash % 2^maskBits == 0`, expected chunk length ≈ 2^maskBits).
    * Because boundaries depend only on LOCAL window content, an insert
    * or delete re-chunks only the neighborhood it touches — every chunk
    * after the edit's window keeps its identity, which is exactly what
    * fixed-stride chunking ([[chunkWithOverlap]], d30 passages) cannot
    * give: there a one-character prefix shift re-digests the whole
    * document. Chunk-digest dedup on CDC chunks therefore catches
    * PARTIAL overlap (code files sharing functions, documents sharing
    * sections) at a granularity exact-dedup misses and with a
    * robustness fixed windows miss; it is the standard primitive for
    * code-corpus and blob dedup.
    *
    * Output: one `array<struct<idx int, len int, digest string>>` per
    * row — chunk index (1-based), length, and the chunk's md5 hex (the
    * d39 digest family, so chunk ledgers compose with the existing
    * exact-dedup machinery). The document end always closes the final
    * chunk; empty/NULL text yields an empty/NULL array. One fused
    * per-row kernel call ([[graft.functions.CdcChunksExpr]], plan-gated)
    * — zero shuffle, scan-speed at 100 TB; callers explode and group by
    * digest. FastCDC's min/max
    * chunk clamps are a documented extension point (they need a
    * sequential fold over boundary candidates; the pure mask rule keeps
    * the operator — and its oracle — exactly replayable).
    */
  def cdcChunks(text: Column, w: Int = 8, maskBits: Int = 6): Column = {
    // one fused byte-pass kernel: window residues, boundary selection
    // and chunk digests share a traversal (CdcChunksExpr) — the
    // composable sequence/filter/transform chain evaluated its HOF
    // lambdas interpreted AND re-computed the boundary array inside its
    // own transform, measured 12.6 s (and 71 s with per-position
    // substr) vs ~1 s fused for the sf0.1 corpus. NULL text → NULL via
    // the expression's null-intolerance; empty text → empty array.
    import org.apache.spark.sql.GraftSqlShims
    GraftSqlShims.column(graft.functions.CdcChunksExpr(
      GraftSqlShims.expression(text), w, maskBits))
  }

  /** Shannon entropy of the UTF-8 byte distribution, in bits/byte — a
    * cheap noise/quality proxy: English text sits near 4.1-4.4 bits,
    * random bytes near 8, degenerate repetition near 0. Built on the
    * fused 256-bucket [[graft.functions.ByteHistogram]] kernel; the fold
    * over the (constant-size) histogram is per-row work with zero
    * shuffle, so this runs at scan speed on 100 TB.
    */
  def byteEntropy(text: Column): Column = {
    val bin = text.cast("binary")
    val hist = graft.functions.VectorExpressions.byteHistogram(bin, 256)
    val n = octet_length(bin).cast("double")
    val sumPlogP = aggregate(
      filter(hist, c => c > 0),
      lit(0.0),
      (acc, c) => acc + (c.cast("double") / n) * log(c.cast("double") / n))
    // null-in → null-out (and null for EMPTY text, where entropy is
    // undefined — mirrors the oracle's group-by, which emits no row)
    when(n > 0, -sumPlogP / log(lit(2.0))).otherwise(lit(null).cast("double"))
  }

  /** Compression-ratio quality signal: `deflate(utf8(text)).length /
    * utf8(text).length` — [[byteEntropy]]'s stronger sibling (entropy
    * sees only the byte histogram; deflate sees REPETITION, the thing
    * boilerplate and spam actually have). Natural language sits in a
    * band; both tails gate (too compressible = template/spam, ~1.0 =
    * noise/binary junk). Per-row codegen kernel, zero shuffle; empty
    * text → null (a ratio of nothing is undefined, and deflate's fixed
    * ~5-byte empty-stream overhead would otherwise fabricate a huge
    * ratio). Deterministic per JDK zlib build — a filter threshold,
    * NOT a cross-engine-stable value (no SQL oracle; gated in spec by
    * inflate-round-trip losslessness + band separation).
    */
  def compressionRatio(text: Column): Column = {
    val n = octet_length(text).cast("double")
    when(n > 0,
      graft.functions.CompressionExpression.deflatedSize(text).cast("double") / n)
      .otherwise(lit(null).cast("double"))
  }

  /** Fused one-pass counters (n_tokens, n_stop, n_chars_nospace). */
  private def stats(text: Column, stopwords: Seq[String]): Column =
    graft.functions.TextStatsExpression.textStats(text, stopwords)

  def tokenCount(text: Column): Column =
    stats(text, DefaultStopwords).getField("n_tokens")

  def stopwordCount(text: Column, stopwords: Seq[String] = DefaultStopwords): Column =
    stats(text, stopwords).getField("n_stop")

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = DefaultStopwords): Column =
    stopwordCount(text, stopwords) / tokenCount(text)

  /** Heuristic quality score in [0,1]: penalizes stopword-HEAVY text
    * (filler density) and rewards document length — a deliberately
    * simple, deterministic placeholder whose value is its oracle-
    * checkable shape, not its linguistics. Note the direction: real
    * pipelines also weight stopword PRESENCE as a naturalness signal
    * (Gopher's minimum-stopword rule — that direction lives in the
    * repetition/Gopher battery, d03), and production scoring is the
    * model-based classifier (d37); swap either in via the same Column
    * shape.
    */
  def qualityScore(text: Column): Column =
    lit(0.5) * (lit(1.0) - stopwordRatio(text)) +
      lit(0.5) * least(lit(1.0), tokenCount(text) / lit(100.0))

  /** n-gram-free language-ID heuristic: stopword hits per language.
    * Production systems use char-n-gram profiles; the operator shape
    * (per-row scalar over the token stream) is identical.
    */
  def langIdHeuristic(text: Column): Column = {
    val hits = stopwordCount(text)
    when(hits >= 3, "en").when(hits >= 1, "en_maybe").otherwise("und")
  }

  /** Canonical form of a URL for web-corpus identity — the dedup key
    * every crawl pipeline needs before content ever loads (C4/CCNet
    * dedupe by normalized URL first, content hash second). Composed
    * entirely from codegen'd built-ins and array HOFs, NULL in → NULL
    * out. Rules, in order:
    *  1. drop the fragment (`#...` — client-side only);
    *  2. drop userinfo (`user:pw@` — never part of resource identity);
    *  3. lowercase the scheme and host (RFC 3986 §6.2.2.1; path and
    *     query stay case-sensitive; bracketed IPv6 hosts keep their
    *     colons);
    *  4. strip the scheme's default port (`:80` http, `:443` https);
    *  5. strip trailing slashes from the path (`/a/b/` ≡ `/a/b`; the
    *     bare root collapses to the empty path);
    *  6. drop tracking query params — they vary per click, not per
    *     resource. The default list is the unambiguous set (`utm_*`,
    *     `fbclid`, `gclid`); pass `trackingParams` to extend it (e.g.
    *     `ref`, which SOME sites use for referral tracking but others
    *     use to address content — stripping it by default would merge
    *     genuinely distinct resources);
    *  7. byte-sort the surviving query params (`?b=2&a=1` ≡
    *     `?a=1&b=2`) and drop the `?` when none survive;
    *  8. normalize percent-encoding in path and query (RFC 3986
    *     §6.2.2.2): escapes of UNRESERVED characters decode (`%41` ≡
    *     `A`, `%7E` ≡ `~` — crawl corpora carry both spellings of the
    *     same resource constantly), every other escape keeps canonical
    *     UPPERCASE hex (`%2f` ≡ `%2F`; decoding a reserved character
    *     would move a component boundary).
    *
    * Input WITHOUT a scheme (`example.com/a`, `//cdn.example.com/x` —
    * common crawl garbage) passes through VERBATIM: the function
    * cannot know the scheme, and fabricating a `"://…"`-prefixed key
    * would neither merge with the `https://` form nor stay honest to
    * the keep-garbage-verbatim policy. Schemeless keys therefore only
    * ever collide with byte-identical raw strings.
    */
  def canonicalUrl(url: Column,
      trackingParams: Seq[String] = Seq("utm_[^=]*", "fbclid", "gclid")): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val noUser = authorityOf(rest)
    val afterHost = regexp_replace(rest, "^[^/?]*", "")
    val host = hostOf(noUser)
    // everything after the host: "" normally, ":8080" for an explicit
    // port — or crawl garbage (":8080x"). Garbage is kept VERBATIM:
    // silently dropping it would canonical-collide a malformed URL with
    // its clean sibling and a dedup pass could drop the real document.
    val hostTail = when(noUser.startsWith("["),
      regexp_replace(noUser, "^\\[[^\\]]*\\]", ""))
      .otherwise(regexp_replace(noUser, "^[^:]*", ""))
    val portDigits = regexp_extract(hostTail, "^:([0-9]+)$", 1)
    // leading zeros normalize (":0080" ≡ ":80") before the default test
    val portNum = regexp_replace(portDigits, "^0+([0-9])", "$1")
    val portNorm = when(portDigits === "", hostTail) // no pure port: verbatim tail
      .when((scheme === "http" && portNum === "80") ||
        (scheme === "https" && portNum === "443"), lit(""))
      .otherwise(concat(lit(":"), portNum))
    val path = regexp_extract(afterHost, "^([^?]*)", 1)
    val pathNorm = pctNormalize(regexp_replace(path, "/+$", ""))
    // percent-normalize BEFORE the tracking filter and the byte-sort:
    // '%75tm_source' is utm_source, and two spellings of one param
    // must sort identically. Decoding only unreserved chars can never
    // introduce a new '&' or '=', so the split stays sound.
    val q = pctNormalize(regexp_extract(afterHost, "\\?(.*)$", 1))
    val trackRe = trackingParams.mkString("^(", "|", ")=")
    val params = filter(split(q, "&"),
      p => !(p === "" || p.rlike(trackRe)))
    val qNorm = array_join(array_sort(params), "&")
    when(scheme === "", url).otherwise(
      concat(scheme, lit("://"), host, portNorm, pathNorm,
        when(qNorm === "", lit("")).otherwise(concat(lit("?"), qNorm))))
  }

  /** RFC 3986 §6.2.2.2 percent-encoding normalization, composed from
    * codegen'd built-ins: split on a lookahead before each `%XX`
    * escape (so each segment carries at most one, at its head), then
    * per segment decode the escape when its code point is UNRESERVED
    * (ALPHA / DIGIT / `-` `.` `_` `~`) or re-emit it with canonical
    * uppercase hex otherwise. Malformed escapes (`%G1`, bare `%`)
    * never match the lookahead or the head test and pass verbatim.
    */
  private def pctNormalize(s: Column): Column = {
    val parts = split(s, "(?=%[0-9A-Fa-f]{2})")
    array_join(transform(parts, p => {
      val hex = upper(substring(p, 2, 2))
      val code = conv(hex, 16, 10).cast("int")
      val rest = substring(p, 4, Int.MaxValue)
      val unreserved = code.between(48, 57) || code.between(65, 90) ||
        code.between(97, 122) || code.isin(45, 46, 95, 126)
      when(p.rlike("^%[0-9A-Fa-f]{2}"),
        concat(when(unreserved, chr(code)).otherwise(concat(lit("%"), hex)), rest))
        .otherwise(p)
    }), "")
  }

  /** Lowercased host of a URL (no port, no userinfo; bracketed IPv6
    * literals intact) — the per-domain grouping key for crawl-side
    * controls (rate/licensing/robots are per host, and C4-style
    * pipelines cap per-domain contributions).
    */
  def urlHost(url: Column): Column =
    hostOf(authorityOf(regexp_replace(regexp_replace(url, "#.*$", ""),
      "^[A-Za-z][A-Za-z0-9+.-]*://", "")))

  /** The authority (host[:port]) of a scheme-stripped URL, userinfo
    * removed — shared by [[canonicalUrl]] and [[urlHost]] so the
    * canonical key and the per-domain grouping key can never diverge
    * on how they parse the same URL.
    */
  private def authorityOf(schemeStripped: Column): Column =
    regexp_replace(regexp_extract(schemeStripped, "^([^/?]*)", 1), "^[^/?@]*@", "")

  /** Lowercased host of an authority; bracketed IPv6 literals keep
    * their colons, otherwise the host ends at the port separator.
    */
  private def hostOf(authority: Column): Column =
    lower(when(authority.startsWith("["), regexp_extract(authority, "^(\\[[^\\]]*\\])", 1))
      .otherwise(regexp_extract(authority, "^([^:]*)", 1)))

  /** Normalized-content fingerprint: md5 over lowercased, space-collapsed
    * text. Identical fingerprints ⇒ exact near-duplicate after
    * normalization (casing/whitespace-insensitive dedup key). The
    * normalization is the fused one-pass kernel — byte-identical to
    * `regexp_replace(lower(trim(text)), " +", " ")`, minus the regex.
    */
  def fingerprint(text: Column): Column =
    md5(graft.functions.TextStatsExpression.normalizeText(text))

  /** Average token length (chars) — a cheap quality signal. */
  def avgTokenLength(text: Column): Column =
    stats(text, DefaultStopwords).getField("n_chars_nospace") / tokenCount(text)

  /** HTML → text extraction (the first stage of every web-crawl corpus:
    * markup off, content out). Tags are replaced by a single space
    * (`<[^>]*>` — RE2 and java.util.regex agree on this class exactly),
    * then runs of spaces collapse and the result is trimmed, so
    * adjacent inline tags never glue two words together and block tags
    * never leave double gaps. Composed codegen `regexp_replace` — a
    * per-row kernel, zero shuffle, scan-speed at 100 TB. Entity
    * decoding and script/style CONTENT removal are out of scope here
    * (the fixture carries neither); a production crawl pass chains
    * those as further per-row kernels.
    */
  def stripHtml(html: Column): Column =
    trim(regexp_replace(regexp_replace(html, "<[^>]*>", " "), " +", " "))

  /** C4's LINE-level rules (§2.2 of the T5 paper): a line survives iff
    * it has ≥ `minWords` whitespace words AND ends in terminal
    * punctuation (`.` `!` `?` `"`). Returns the struct
    * `(n_lines, n_kept, kept)` where `kept` is the surviving lines
    * (trimmed) re-joined with `\n`. One fused codegen kernel per doc
    * ([[graft.functions.C4Util.c4LineFilter]]) — the earlier
    * `filter`-lambda form evaluated interpreted per line and was the
    * dominant cost of d74's plan (5.8× the oracle); the kernel is
    * byte-identical to it (the r9 hashes pin the semantics) and the
    * unit spec pins kernel ≡ HOF on adversarial line shapes.
    */
  def c4LineFilter(text: Column, minWords: Int = 5): Column =
    graft.functions.LineFilterExpressions.c4LineFilter(text, minWords)

  /** Word-list content gate (the C4 §2.2 "bad words" filter shape —
    * the list here is caller-supplied): true when ANY token of the
    * document appears in `words`. Token-exact (no substring matches, so
    * "class" never trips a "*ass*" rule — the Scunthorpe failure the
    * original C4 filter is criticized for). The list is a literal array
    * in the plan (policy lists are small); `arrays_overlap` short-
    * circuits on first hit. Per-row kernel, zero shuffle at any scale.
    */
  def containsAnyWord(text: Column, words: Seq[String]): Column =
    arrays_overlap(tokens(text), array(words.map(lit): _*))

  // ------------------------------------------------------------------
  // License-tag gate (d111) — the code-corpus curation stage between
  // crawl and train: SPDX identifiers (the machine-readable standard,
  // spdx.org) plus the canonical license-header phrases, classified
  // into permissive / copyleft / cc / other / none so a pipeline can
  // keep permissive-only code. Pure regexp composition (the d108
  // rule: `regexp_extract_all` + `rlike`, no UDF), per-row, zero
  // shuffle at any scale; the DuckDB oracle runs the same literal
  // patterns, so the classification is hash-checked, not asserted.
  // ------------------------------------------------------------------

  /** SPDX tag ids in order of appearance (single-token ids; an SPDX
    * expression like `MIT OR Apache-2.0` yields its first token —
    * id-level expression parsing is downstream policy, not extraction).
    */
  private val SpdxRe = "SPDX-License-Identifier:[ \\t]*([A-Za-z0-9.+-]+)"
  def spdxTags(text: Column): Column =
    regexp_extract_all(coalesce(text, lit("")), lit(SpdxRe), lit(1))

  // canonical header phrases (all from the public license texts —
  // fixed literals, not fuzzy matching)
  private val MitPhrase = "Permission is hereby granted, free of charge"
  private val BsdPhrase = "Redistribution and use in source and binary forms"
  private val ApachePhrase = "Licensed under the Apache License"
  private val GplPhrase = "GNU (Affero )?(Lesser )?General Public License"
  private val CcPhrase = "Creative Commons"

  /** License class per document, with copyleft taking precedence (one
    * GPL header poisons permissive-only use no matter what else is
    * stamped on the file): `copyleft` > `permissive` > `cc` > `other`
    * (an SPDX tag we don't classify) > `none`.
    *
    * Tag-level policy edges (deliberate, oracle-checked in d111):
    *  - `CC0-1.0` is a public-domain DEDICATION, not an attribution
    *    license — it classifies `permissive` (alongside Unlicense and
    *    0BSD), not `cc`.
    *  - `BSD-4-Clause` is excluded from `permissive`: its advertising
    *    clause is exactly the obligation permissive-only corpora
    *    exist to avoid — a lone 4-clause tag lands in `other`.
    *    (The BSD HEADER PHRASE is shared by all BSD variants and
    *    cannot see the 4th clause, so phrase-only detection stays
    *    permissive; the SPDX tag is the authoritative signal.)
    */
  def licenseClass(text: Column): Column = {
    val t = coalesce(text, lit(""))
    val spdx = spdxTags(text)
    def anyTag(re: String): Column =
      exists(spdx, x => x.rlike(re))
    val copyleft = t.rlike(GplPhrase) ||
      anyTag("^(GPL|AGPL|LGPL)") || anyTag("^(MPL|EPL|EUPL|CDDL)")
    val permissive = t.contains(MitPhrase) || t.contains(BsdPhrase) ||
      t.contains(ApachePhrase) ||
      anyTag("^(MIT|Apache|ISC|Zlib|Unlicense|0BSD|CC0)") ||
      exists(spdx, x => x.rlike("^BSD") && !x.rlike("^BSD-4-Clause"))
    val cc = t.contains(CcPhrase) || anyTag("^CC")
    when(copyleft, "copyleft")
      .when(permissive, "permissive")
      .when(cc, "cc")
      .when(size(spdx) > 0, "other")
      .otherwise("none")
  }

  /** Permissive-only gate: the conservative keep-set for code training
    * corpora (documents with NO statement are excluded too — absence
    * of a license is not permission; widen via `extraClasses` when a
    * pipeline's counsel says otherwise).
    */
  def licenseGate(text: Column, extraClasses: Seq[String] = Nil): Column =
    licenseClass(text).isin(("permissive" +: extraClasses).map(x => x: Any): _*)

  /** Total characters of anchor (`<a …>text</a>`) inner text — the
    * numerator of LINK DENSITY, the classic boilerplate signal
    * (navigation/footer blocks are link-dense, body prose is not).
    * Non-nested anchors only (`[^<]*` inner), which is what real nav
    * markup is; same per-row regexp-kernel regime as [[stripHtml]].
    * Computed as the length of the concatenated anchor texts (≡ the
    * sum of lengths) rather than an `aggregate` HOF fold — higher-
    * order functions evaluate interpreted and break whole-stage
    * codegen for the surrounding projection (the repo's §7.3 rule;
    * same reason d53's span fold became a fused kernel).
    */
  /** Anchor-element pattern shared verbatim with the d47 oracle (java
    * + RE2 common subset): case-insensitive, attributes OPTIONAL —
    * `<a>Home</a>` and legacy-uppercase `<A HREF=..>` are anchors too
    * (r14; the old attribute-mandatory lowercase form scored such nav
    * blocks as body prose). The anchor text is capture group 2.
    */
  val AnchorPattern = "(?i)<a(\\s[^>]*)?>([^<]*)</a>"

  def anchorTextChars(html: Column): Column =
    length(array_join(
      regexp_extract_all(html, lit(AnchorPattern), lit(2)), ""))

  // ------------------------------------------------------------------
  // PII scrubbing — the redaction pass every released training corpus
  // runs (the Dolma/BigScience regime: emails, IP addresses, phone
  // numbers → placeholder tokens). The default rules are deliberately
  // written in the common subset of java.util.regex and RE2 — no
  // backreferences, no lookaround, ASCII classes — so the SAME
  // pattern text scrubs identically in Spark and in an RE2 engine
  // (the d84 oracle runs them verbatim in DuckDB). One documented
  // divergence survives: `\b` word-ness is Unicode
  // (Character.isLetterOrDigit) in java.util.regex but ASCII in RE2,
  // so a rule whose boundary NEIGHBOR is a non-ASCII letter ('é1.2.3.4')
  // matches in RE2 and not here — the d84 fixture plants
  // ASCII-neighbored PII, and the fused kernel replicates the Java
  // side exactly (see PiiUtil). Per-row byte-walk kernels
  // (graft.functions.PiiUtil), zero shuffle, scan-speed at any
  // corpus size.
  // ------------------------------------------------------------------

  /** Email addresses (`user@host.tld`, alpha TLD ≥ 2). */
  val PiiEmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 (no range check — redaction wants recall; an
    * over-match like `999.0.0.1` is markup noise, not someone's PII).
    */
  val PiiIpv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  /** International-format phone: `+CC` then 7-14 digits broken by
    * optional single spaces/dashes/dots — EVERY separator optional, so
    * the very common unseparated paste format `+14155551234` redacts
    * too (r14; the first separator used to be mandatory and silently
    * under-redacted those). Bare domestic digit runs are left alone —
    * they collide with ids, years, and quantities far more often than
    * they are phones.
    */
  val PiiPhonePattern = "\\+\\d{1,3}[- .]?\\d{3}[- .]?\\d{3,4}[- .]?\\d{0,4}\\b"

  /** Per-rule match counts on the ORIGINAL text (redaction
    * observability: "how much PII did this corpus carry" is reported
    * per class BEFORE any rule rewrites the row — counts are
    * independent per rule, so a span matched by two rules counts in
    * both). Struct `(n_email, n_ip, n_phone)`. One fused byte-walk
    * kernel ([[graft.functions.PiiUtil]]) — semantics pinned ≡ the
    * [[piiCountsRegex]] reference form by a ScalaCheck property.
    */
  def piiCounts(text: Column): Column =
    graft.functions.PiiExpressions.piiCounts(text)

  /** Scrub PII in place: emails, then IPv4s, then phones, each rule's
    * matches replaced by its placeholder. Email runs FIRST so an
    * address's digits are gone before the looser numeric rules look
    * (the placeholders themselves contain no digits, so later rules
    * never match inside an earlier rule's replacement). Fused kernel;
    * the placeholder is inserted literally (no `$`-group expansion —
    * the one deviation from the regex reference form, which treats
    * `$`/`\` in the replacement specially).
    */
  def scrubPii(text: Column, emailToken: String = "<EMAIL>",
      ipToken: String = "<IP>", phoneToken: String = "<PHONE>"): Column =
    graft.functions.PiiExpressions.scrubPii(text, emailToken, ipToken, phoneToken)

  /** Payment-card detection/redaction (Luhn-validated): a MAXIMAL
    * digit[-sep-digit] run (RE2's greedy `\d(?:[ -]?\d)*`, so the
    * cross-engine oracle extracts the identical runs) qualifies when
    * its digit count is 13-19 AND the Luhn checksum holds; qualifying
    * runs redact whole. Run-maximal by design: a 20-digit blob is an
    * ID, not a card with a tail — no backtracked sub-matches, no
    * false positives carved out of longer numbers. Fused byte-walk
    * kernel, per row, zero shuffle; the Luhn conditional is exactly
    * what a pure-regex pass cannot express.
    */
  def cardCounts(text: Column): Column =
    graft.functions.PiiExpressions.cardCounts(text)

  def scrubCards(text: Column, token: String = "<CARD>"): Column =
    graft.functions.PiiExpressions.scrubCards(text, token)

  /** The regex reference form of [[piiCounts]] — what the kernel is
    * pinned against (and exactly what the d84 oracle runs in RE2).
    */
  private[graft] def piiCountsRegex(text: Column): Column = struct(
    regexp_count(text, lit(PiiEmailPattern)).cast("int").as("n_email"),
    regexp_count(text, lit(PiiIpv4Pattern)).cast("int").as("n_ip"),
    regexp_count(text, lit(PiiPhonePattern)).cast("int").as("n_phone"))

  /** The regex reference form of [[scrubPii]] (kernel parity pin). */
  private[graft] def scrubPiiRegex(text: Column, emailToken: String = "<EMAIL>",
      ipToken: String = "<IP>", phoneToken: String = "<PHONE>"): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, PiiEmailPattern, emailToken),
        PiiIpv4Pattern, ipToken),
      PiiPhonePattern, phoneToken)
}
