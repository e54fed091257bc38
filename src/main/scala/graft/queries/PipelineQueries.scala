package graft.queries

import Qf.DumpSortOps

import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, DedupOps, IvfIndex, MultimodalOps, SimilarityOps, TextOps}

/** Training-data-pipeline query inventory: dedup, similarity search, text
  * analysis, multimodal plumbing, and the as-of join — each as a
  * `queries()` entry with a DuckDB oracle over `documents` / `embeddings`
  * / `events`.
  *
  * The oracle SQL re-derives the SAME deterministic primitives
  * (md5-based 32-bit hashes, fixed hyperplanes, identical shingle/token
  * definitions), so even MinHash/SimHash/LSH results hash-match
  * cross-engine. SQL strings are generated from the same constants as
  * the Spark plans to keep both sides in lockstep.
  */
object PipelineQueries {
  import Registry.table

  private def q(name: String, oracle: String)(
      run: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): NamedQuery =
    NamedQuery(name, run, Option(oracle).filter(_.nonEmpty))

  // ---- shared SQL fragments (must mirror the operators exactly) ----
  private val Stop = TextOps.DefaultStopwords // the,a,and,of,to,is
  private val stopList = Stop.map(w => s"'$w'").mkString(", ")
  private val sqlTokens = "string_split(trim(text), ' ')"
  private def sqlHash(x: String, salt: String) =
    s"CAST('0x' || substr(md5($x || '$salt'), 1, 8) AS BIGINT)"
  // shingle size 5: positions 1..len-4 (duckdb range is end-exclusive)
  private val sqlShingles = "list_transform(range(1, length(text) - 3), i -> substr(text, i, 5))"
  // universal-hash MinHash, mirroring DedupOps: base md5 hash once per
  // shingle, then (A_j·h + B_j) mod P per hash function
  private val P = graft.operators.DedupOps.MinHashP
  private val sqlHashedShingles =
    s"list_transform($sqlShingles, x -> ${sqlHash("x", "")} % $P)"
  // word n-grams over a token-list expression `t`, space-joined; empty
  // when len(t) < n (duckdb range is end-exclusive and empty when
  // stop <= start, mirroring TextOps.wordNgrams' guard)
  private def sqlNgrams(t: String, n: Int) =
    s"list_transform(range(1, len($t) - ${n - 2}), i -> array_to_string(list_slice($t, i, i + ${n - 1}), ' '))"

  /** d47/d57's shared synthetic-URL fixture (SQL side): scheme-case /
    * default-port / percent-encoding / tracking-param / fragment
    * variants synthesized from doc_id, plus the expected canonical —
    * the oracle's independent re-derivation of
    * `TextOps.canonicalUrl`'s RFC 3986 rules. Yields `canon(doc_id,
    * url, canonical, lh)`.
    */
  private val sqlUrlFixtureCtes =
    """u AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 11 = 0 THEN ''
      |         ELSE ['HTTP','https','HtTpS'][CAST(doc_id % 3 AS INTEGER) + 1] END AS scheme,
      |    'WWW.Site' || CAST(doc_id % 5 AS VARCHAR) || '.Example.COM' AS host,
      |    [':80', ':443', ':8080', ''][CAST(doc_id % 4 AS INTEGER) + 1] AS port,
      |    ['%7Ea', '%41b', '%2fc', ''][CAST(floor((doc_id % 16) / 4) AS INTEGER) + 1] AS enc,
      |    ['~a', 'Ab', '%2Fc', ''][CAST(floor((doc_id % 16) / 4) AS INTEGER) + 1] AS cenc,
      |    '/Dir' || CAST(doc_id % 7 AS VARCHAR) || '/page' AS pbase,
      |    CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END AS trail,
      |    ['?b=%32&utm_source=x&a=%7E1', '?fbclid=abc', ''][CAST(doc_id % 3 AS INTEGER) + 1] AS q,
      |    ['a=~1&b=2', '', ''][CAST(doc_id % 3 AS INTEGER) + 1] AS cq,
      |    CASE WHEN doc_id % 2 = 0 THEN '#Sec1' ELSE '' END AS frag
      |  FROM documents),
      |raw AS (SELECT doc_id, scheme,
      |    CASE WHEN scheme = '' THEN host || port || pbase || enc || trail || q || frag
      |         ELSE scheme || '://' || host || port || pbase || enc || trail || q || frag
      |    END AS url,
      |    lower(scheme) AS ls, lower(host) AS lh, port, pbase, cenc, cq FROM u),
      |canon AS (SELECT doc_id, url, lh,
      |  CASE WHEN scheme = '' THEN url
      |       ELSE ls || '://' || lh ||
      |    CASE WHEN port = '' OR (ls = 'http' AND port = ':80')
      |         OR (ls = 'https' AND port = ':443') THEN '' ELSE port END ||
      |    pbase || cenc ||
      |    CASE WHEN cq = '' THEN '' ELSE '?' || cq END
      |  END AS canonical
      |  FROM raw)""".stripMargin

  /** d47/d57's shared synthetic-URL fixture (Spark side) — same
    * generator as [[sqlUrlFixtureCtes]]; appends a `url` column.
    */
  private def syntheticUrls(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val id = col("doc_id")
    val scheme = when(id % 11 === 0, lit("")).otherwise(
      element_at(array(lit("HTTP"), lit("https"), lit("HtTpS")), (id % 3 + 1).cast("int")))
    val host = concat(lit("WWW.Site"), (id % 5).cast("string"), lit(".Example.COM"))
    val port = element_at(array(lit(":80"), lit(":443"), lit(":8080"), lit("")), (id % 4 + 1).cast("int"))
    val enc = element_at(array(lit("%7Ea"), lit("%41b"), lit("%2fc"), lit("")),
      (floor((id % 16) / 4) + 1).cast("int"))
    val path = concat(lit("/Dir"), (id % 7).cast("string"), lit("/page"), enc,
      when(id % 2 === 0, lit("/")).otherwise(lit("")))
    val qq = element_at(array(lit("?b=%32&utm_source=x&a=%7E1"), lit("?fbclid=abc"), lit("")), (id % 3 + 1).cast("int"))
    val frag = when(id % 2 === 0, lit("#Sec1")).otherwise(lit(""))
    val assembled = concat(host, port, path, qq, frag)
    df.withColumn("url", when(scheme === "", assembled)
      .otherwise(concat(scheme, lit("://"), assembled)))
  }

  /** d53/d60's shared duplicated-span CTE chain: overlapping k-token
    * window hashes → recurring windows → gaps-and-islands merge into
    * maximal spans `sp(doc_id, s, e, nw)`. The oracle's independent
    * re-derivation of `DedupOps.duplicatedSpans`.
    */
  private def sqlDupSpanCtes(kk: Int) =
    s"""gl AS (SELECT doc_id, list_transform(
       |    ${sqlNgrams("(" + sqlTokens + ")", kk)}, x -> ${sqlHash("x", "")}) AS hs
       |  FROM documents),
       |g AS (SELECT doc_id, unnest(hs) AS h, unnest(range(0, len(hs))) AS pos FROM gl),
       |dup AS (SELECT h FROM g GROUP BY h HAVING count(*) >= 2),
       |w AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (h)),
       |m AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos)
       |    OVER (PARTITION BY doc_id ORDER BY pos) <= $kk THEN 0 ELSE 1 END AS brk
       |  FROM w),
       |isl AS (SELECT doc_id, pos, sum(brk)
       |    OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
       |  FROM m),
       |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + $kk AS e, count(*) AS nw
       |  FROM isl GROUP BY doc_id, grp)""".stripMargin

  /** d55/d56's shared DSIR CTE chain: hashed unigram+bigram features
    * (1024 buckets), add-1-smoothed target/raw count tables, per-bucket
    * ln likelihood ratio. Association mirrors
    * `CurationOps.dsirLogWeights` exactly.
    */
  private val sqlDsirCtes = {
    val b = 1024
    s"""tok AS (SELECT doc_id, ($sqlTokens) AS t FROM documents),
       |f AS (SELECT doc_id, h % $b AS f FROM (
       |  SELECT doc_id, unnest(list_concat(
       |    list_transform(t, x -> ${sqlHash("x", "")}),
       |    list_transform(${sqlNgrams("t", 2)}, x -> ${sqlHash("x", "")}))) AS h
       |  FROM tok)),
       |tf AS (SELECT f, count(*) AS ct FROM f WHERE doc_id % 97 = 0 GROUP BY f),
       |rf AS (SELECT f, count(*) AS cr FROM f WHERE doc_id % 97 <> 0 GROUP BY f),
       |tt AS (SELECT CAST(sum(ct) AS DOUBLE) AS tt FROM tf),
       |rt AS (SELECT CAST(sum(cr) AS DOUBLE) AS rt FROM rf),
       |lr AS (SELECT f,
       |    ln(coalesce(ct, 0) + 1.0) - ln(tt + $b)
       |      - ln(coalesce(cr, 0) + 1.0) + ln(rt + $b) AS lr
       |  FROM tf FULL JOIN rf USING (f), tt, rt)""".stripMargin
  }

  private def sqlMinhash(j: Int) = {
    val a = graft.operators.DedupOps.MinHashA(j)
    val b = graft.operators.DedupOps.MinHashB(j)
    s"list_min(list_transform(hs, h -> (h * $a + $b) % $P))"
  }
  private val sqlMh8 = (0 until 8).map(j => s"${sqlMinhash(j)} AS mh$j").mkString(",\n  ")

  /** The d38/d48 oracle, shared verbatim: cross-corpus banded-LSH pairs
    * recomputed from TEXT for both sub-corpora — file-blind, so d48's
    * at-rest signature round-trip passes only if it changed nothing.
    */
  private val sqlCrossDedupOracle = {
    def bucket(b: Int) = (0 until 4).map(r => s"CAST(mh${b * 4 + r} AS VARCHAR)")
      .mkString("md5(", " || '_' || ", ")")
    s"""WITH sh AS (SELECT doc_id, $sqlHashedShingles AS hs FROM documents),
       |sig AS (SELECT doc_id, $sqlMh8 FROM sh),
       |bands AS (
       |  SELECT doc_id, 0 AS band, ${bucket(0)} AS bucket FROM sig
       |  UNION ALL
       |  SELECT doc_id, 1 AS band, ${bucket(1)} AS bucket FROM sig)
       |SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, count(*) AS n_bands
       |FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
       |WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
       |GROUP BY 1, 2 ORDER BY new_id, corpus_id""".stripMargin
  }

  /** The s03/s12/s17 oracle: exact bucketed-ANN top-k with the
    * hyperplanes embedded as literals (deterministic from
    * (numPlanes=4, dim=64)) — file-blind, so s12 reuses it verbatim to
    * prove the at-rest index's append/replay/compact cycle lossless,
    * and s17 restricts the CANDIDATE set (`candWhere`) to prove delete
    * tombstones subtract exactly the deleted ids and nothing else.
    */
  private def annTopkOracle(candWhere: String) = {
    val planes = graft.operators.SimilarityOps.hyperplanes(4, 64)
    val planeCols = planes.zipWithIndex.map { case (p, j) =>
      s"[${p.mkString(", ")}]::DOUBLE[] AS pl$j"
    }.mkString(",\n  ")
    val bits = (0 until 4).map { j =>
      s"(CASE WHEN list_sum(list_transform(range(1, 65), i -> embedding[i] * pl$j[i])) > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH p AS (SELECT
       |  $planeCols),
       |e AS (SELECT vec_id, embedding, CAST($bits AS INTEGER) AS bucket FROM embeddings, p),
       |q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM e WHERE vec_id < 8),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, bucket FROM e WHERE $candWhere),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    round(list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i]))
       |      / (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])))
       |       * sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))), 6) AS score
       |  FROM q JOIN c USING (bucket) WHERE query_id <> neighbor_id),
       |ranked AS (SELECT query_id, neighbor_id, score,
       |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INTEGER) AS rk
       |  FROM scored)
       |SELECT query_id, neighbor_id, score, rk FROM ranked WHERE rk <= 5
       |ORDER BY query_id, rk""".stripMargin
  }

  private val sqlAnnTopkOracle = annTopkOracle("TRUE")

  /** The r16 ANN-recall decision-relation oracle (the d33/d37 regime,
    * VERDICT r15 item 4): s01's brute-force top-k — exactly replayable —
    * plus the constant `recall_ok` verdict column the Spark side
    * computes from its approximate answer. Shared by s04/s07/s08/s13/
    * s22; the approximate answers themselves are model-dependent and
    * never hashed.
    */
  private def exactTopkRecallOracle(candWhere: String) =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
      |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings WHERE $candWhere),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |    round(list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i]))
      |      / (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])))
      |       * sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))), 6) AS score
      |  FROM q, c WHERE query_id <> neighbor_id),
      |ranked AS (SELECT query_id, neighbor_id, score,
      |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INTEGER) AS rk
      |  FROM scored)
      |SELECT query_id, neighbor_id, score, rk, TRUE AS recall_ok
      |FROM ranked WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  private val sqlExactTopkRecallOracle = exactTopkRecallOracle("TRUE")

  /** The s15/s16 oracle: Matryoshka truncated-prefix retrieval re-derived
    * from scratch — prefix-cosine candidate cut (top 20 by rounded
    * ascore, neighbor_id tie-break), exact full-dim re-rank to top 5.
    * File-blind, so s16 reuses it verbatim to prove the at-rest
    * prefix-column layout changed nothing.
    */
  private val sqlMatryoshkaOracle =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
      |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      |ap AS (SELECT query_id, neighbor_id, qv, cv,
      |  round(list_sum(list_transform(range(1, 17), i -> qv[i] * cv[i]))
      |      / (sqrt(list_sum(list_transform(range(1, 17), i -> qv[i] * qv[i])))
      |       * sqrt(list_sum(list_transform(range(1, 17), i -> cv[i] * cv[i])))), 6) AS ascore
      |  FROM q, c WHERE query_id <> neighbor_id),
      |cand AS (SELECT query_id, neighbor_id, qv, cv,
      |  row_number() OVER (PARTITION BY query_id ORDER BY ascore DESC, neighbor_id) AS ark FROM ap),
      |rer AS (SELECT query_id, neighbor_id,
      |  round(list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i]))
      |      / (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])))
      |       * sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))), 6) AS score
      |  FROM cand WHERE ark <= 20),
      |ranked AS (SELECT query_id, neighbor_id, score,
      |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INTEGER) AS rk
      |  FROM rer)
      |SELECT query_id, neighbor_id, score, rk FROM ranked WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  /** d68's demo WordPiece vocabulary: full single-character coverage
    * (so clean alphanumeric text never falls to `[UNK]`) plus a few
    * multi-character pieces that exercise greedy longest-match-first.
    * Public so the AccuracySpec gate re-derives the exact same
    * tokenizer the conformance query runs.
    */
  val wordPieceVocab: Seq[String] =
    (('a' to 'z') ++ ('0' to '9')).map(_.toString) ++
      (('a' to 'z') ++ ('0' to '9')).map(c => s"##$c") ++
      Seq("scan", "##ner", "tab", "##le", "sp", "##ark", "join", "merge",
        "the", "key", "##ey")

  /** d24's exact decontamination answer — shared verbatim by d24b,
    * whose bloom-prefilter → exact-rescore composition must produce
    * the SAME rows (no false negatives ⇒ restricting the exact join to
    * bloom-flagged docs loses nothing; the hash match proves it).
    */
  private lazy val d24OracleSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, ${sqlHash("g0", "")} AS h FROM (
       |    SELECT doc_id, unnest(${sqlNgrams("(" + sqlTokens + ")", 3)}) AS g0
       |    FROM documents)),
       |bench AS (SELECT DISTINCT h FROM g WHERE doc_id % 97 = 0),
       |train AS (SELECT DISTINCT doc_id, h FROM g WHERE doc_id % 97 <> 0)
       |SELECT doc_id, count(*) AS n_shared
       |FROM train JOIN bench USING (h)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** d86's oracle: BPE learn-then-apply entirely in DuckDB SQL. The
    * LEARN half replays [[graft.operators.CurationOps.learnBpeMerges]]
    * over the word-count-collapsed vocab for 8 rounds (d85's
    * chained-CTE regime with the chr(1)/chr(2)-delimited `replace`
    * re-segmentation, rounds generated programmatically like d72's
    * pagerank). The APPLY half is Sennrich's priority loop as a
    * recursive CTE per (doc, token): state = the delimiter-wrapped
    * symbol string; each step finds the LOWEST-rank merge whose pair
    * is present (a CASE over the 8 one-row merge CTEs) and replaces
    * every occurrence left-to-right (`replace` scanning semantics ==
    * the kernel's merge-all-occurrences walk); no pair present → stop.
    * Delimiters make pair matches whole-symbol-exact, and an `aaa` ×
    * `(a,a)` overlap consumes left-to-right identically in both
    * engines.
    */
  private lazy val bpeEncodeOracle: String = {
    val nm = 8
    val ext = "chr(1) || '([^' || chr(1) || chr(2) || ']*)' || chr(2)"
    // pattern/replacement coalesce to a chr(3) sentinel when round i
    // admitted NO merge (pair exhaustion before round nm — the Spark
    // learner just returns fewer merges): m$i is then the one all-NULL
    // row an aggregate over empty input yields, contains(s, chr(3)) is
    // false, and replace(str, chr(3), chr(3)) is the identity — the
    // oracle degrades exactly like the kernel's shorter merge list
    // instead of collapsing every downstream cross join to zero rows
    def pat(i: Int) =
      s"coalesce(chr(1) || m$i.a || chr(2) || chr(1) || m$i.b || chr(2), chr(3))"
    def rep(i: Int) = s"coalesce(chr(1) || m$i.a || m$i.b || chr(2), chr(3))"
    val learn = new StringBuilder(
      s"""l1 AS (SELECT cnt, regexp_extract_all(w, '[\\s\\S]') AS l FROM wc),
         |s1 AS (SELECT cnt, array_to_string(list_transform(l, x -> chr(1) || x || chr(2)), '') AS str FROM l1)""".stripMargin)
    (1 to nm).foreach { i =>
      // the argmax lands via an aggregate (not LIMIT 1) so an EMPTY
      // pair table still yields exactly one (NULL, NULL) row — the
      // sentinel arm above needs the row to exist to cross-join on
      learn.append(s""",
        |p$i AS (SELECT l[i] AS a, l[i+1] AS b, sum(cnt) AS freq
        |  FROM l$i, unnest(range(1, len(l))) AS t(i) GROUP BY 1, 2),
        |m$i AS MATERIALIZED (
        |  SELECT max(CASE WHEN rn = 1 THEN a END) AS a,
        |         max(CASE WHEN rn = 1 THEN b END) AS b
        |  FROM (SELECT a, b, row_number() OVER (ORDER BY freq DESC, a, b) AS rn FROM p$i))""".stripMargin)
      if (i < nm) learn.append(s""",
        |s${i + 1} AS (SELECT cnt, replace(str, ${pat(i)}, ${rep(i)}) AS str FROM s$i, m$i),
        |l${i + 1} AS (SELECT cnt, regexp_extract_all(str, $ext, 1) AS l FROM s${i + 1})""".stripMargin)
    }
    val pats = (1 to nm).map(i =>
      s"        WHEN contains(s, ${pat(i)}) THEN $i").mkString("\n")
    val reps = (1 to nm).map(i =>
      s"        WHEN $i THEN replace(s, ${pat(i)}, ${rep(i)})").mkString("\n")
    val mjoin = (1 to nm).map(i => s"m$i").mkString(", ")
    s"""WITH RECURSIVE
       |tok0 AS (SELECT unnest($sqlTokens) AS w FROM documents),
       |wc AS (SELECT w, count(*) AS cnt FROM tok0 WHERE w <> '' GROUP BY w),
       |$learn,
       |w AS (
       |  SELECT doc_id, unnest(toks) AS word,
       |         unnest(generate_series(1, len(toks))) AS pos
       |  FROM (SELECT doc_id,
       |               list_filter($sqlTokens, t -> t <> '') AS toks
       |        FROM documents)),
       |seg AS (
       |  SELECT doc_id, pos,
       |    array_to_string(list_transform(regexp_extract_all(word, '[\\s\\S]'),
       |      x -> chr(1) || x || chr(2)), '') AS s,
       |    false AS stop
       |  FROM w
       |  UNION ALL
       |  SELECT doc_id, pos,
       |    CASE bl
       |$reps
       |      ELSE s END AS s,
       |    (bl IS NULL) AS stop
       |  FROM (
       |    SELECT seg.*,
       |      CASE
       |$pats
       |      END AS bl
       |    FROM seg, $mjoin WHERE NOT stop), $mjoin),
       |tokp AS (
       |  SELECT doc_id, pos, regexp_extract_all(s, $ext, 1) AS pieces
       |  FROM seg WHERE stop),
       |docp AS (
       |  SELECT doc_id, flatten(list(pieces ORDER BY pos)) AS allp,
       |         count(*) AS n_tok
       |  FROM tokp GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(p.n_tok, 0) AS INTEGER) AS n_tokens,
       |  CAST(coalesce(len(p.allp), 0) AS INTEGER) AS n_pieces,
       |  md5(array_to_string(coalesce(p.allp, CAST([] AS VARCHAR[])), ' ')) AS pieces_fp
       |FROM documents d LEFT JOIN docp p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** d49's oracle: the exact brute-force semantic decontamination
    * answer (6dp-rounded cosine, argmax with smallest-bench-id ties,
    * threshold on the rounded value). d49b deliberately does NOT
    * share it — at sf0.1 the IVF prefilter's recall is < 1 (the
    * nprobe trade-off working as designed), so the prefiltered row
    * set is model-dependent; d49b hashes the exact-flag + precision
    * decision relation instead.
    */
  private val semanticDeconOracle: String =
    """WITH b AS (SELECT vec_id AS bench_id, embedding AS bv FROM embeddings WHERE vec_id % 50 = 0),
      |c AS (SELECT vec_id, embedding AS cv FROM embeddings WHERE vec_id % 50 <> 0),
      |scored AS (
      |  SELECT c.vec_id, b.bench_id,
      |    round(list_sum(list_transform(range(1, 65), i -> cv[i] * bv[i]))
      |      / (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))
      |       * sqrt(list_sum(list_transform(range(1, 65), i -> bv[i] * bv[i])))), 6) AS cos
      |  FROM c, b),
      |ranked AS (SELECT vec_id, bench_id, cos,
      |  row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, bench_id) AS rk
      |  FROM scored)
      |SELECT vec_id, bench_id, cos AS max_cos FROM ranked
      |WHERE rk = 1 AND cos >= 0.3
      |ORDER BY vec_id""".stripMargin

  /** d105's oracle: unigram-LM learn-then-apply entirely in DuckDB SQL
    * — the third tokenizer-family graduation after d68 (greedy
    * recursive CTE) and d86 (priority-loop recursive CTE). The LEARN
    * half replays the query's vocabulary derivation over the SAME
    * word-count table (top-80 words by (cnt DESC, w) with ML
    * log-probs over total token mass; the full character set with ML
    * log-probs over total char mass; max on collision), log-probs
    * rounded at 4dp via the [[Qf.dround]] IEEE expression on BOTH
    * sides so the DP sums are bit-identical doubles. The APPLY half is
    * exact Viterbi as a recursive CTE over DISTINCT words (the DP only
    * depends on the word — encode once, join back per (doc, pos)):
    * state carries the `best`/`back` arrays as lists, each step scores
    * the candidate window `j ∈ [i−maxLen, i)` with a list
    * comprehension (vocab lookup = `lpl[list_position(pl, piece)]`,
    * NULL-coalesced to the single-code-point unk channel at −20.0),
    * and `list_position(sc, max(sc))` lands the argmax on the FIRST
    * occurrence — the kernel's strict-`>`-ascending-`j` tie-break
    * (longest last piece) exactly. Reconstruction is a second
    * recursive CTE walking `back` from `m` to 0. Code-unit vs
    * code-point positions agree because [[UnigramUtil]] requires no
    * surrogate handling on this corpus (ASCII; the `oneCp` channel is
    * mirrored by the `len = 1` arm).
    */
  private lazy val unigramEncodeOracle: String = {
    // the same IEEE rounding expression dround/droundD compute —
    // sign(x)*floor(abs(x)*1e4 + 0.5)/1e4, NOT DuckDB round() (which
    // can disagree on representation boundaries)
    def r4(x: String) = s"sign($x) * floor(abs($x) * 10000.0 + 0.5) / 10000.0"
    s"""WITH RECURSIVE
       |tok0 AS (SELECT unnest($sqlTokens) AS w FROM documents),
       |wc AS (SELECT w, count(*) AS cnt FROM tok0 GROUP BY w),
       |topw AS (SELECT w AS p, ${r4("ln(cnt / t)")} AS lp
       |  FROM wc, (SELECT CAST(sum(cnt) AS DOUBLE) AS t FROM wc)
       |  ORDER BY cnt DESC, w LIMIT 80),
       |cc AS (SELECT c, sum(cnt) AS n FROM (
       |    SELECT unnest(regexp_extract_all(w, '[\\s\\S]')) AS c, cnt FROM wc)
       |  WHERE length(c) = 1 GROUP BY c),
       |chl AS (SELECT c AS p, ${r4("ln(n / t)")} AS lp
       |  FROM cc, (SELECT CAST(sum(n) AS DOUBLE) AS t FROM cc)),
       |vocab AS (SELECT p, max(lp) AS lp
       |  FROM (SELECT * FROM topw UNION ALL SELECT * FROM chl) GROUP BY p),
       |vlist AS (SELECT list(p ORDER BY p) AS pl, list(lp ORDER BY p) AS lpl,
       |  greatest(max(length(p)), 2) AS maxlen FROM vocab),
       |words AS (SELECT DISTINCT w AS word FROM wc WHERE w <> ''),
       |dp AS (
       |  SELECT word, length(word) AS m, 0 AS i,
       |         [CAST(0.0 AS DOUBLE)] AS best, [0] AS back, pl, lpl, maxlen
       |  FROM words, vlist
       |  UNION ALL
       |  SELECT word, m, i,
       |         list_append(best, list_aggregate(sc, 'max')) AS best,
       |         list_append(back,
       |           lo + list_position(sc, list_aggregate(sc, 'max')) - 1) AS back,
       |         pl, lpl, maxlen
       |  FROM (
       |    SELECT word, m, i + 1 AS i, best, back, pl, lpl, maxlen,
       |           greatest(0, i + 1 - maxlen) AS lo,
       |           [coalesce(
       |              best[j + 1] + lpl[list_position(pl, substr(word, j + 1, (i + 1) - j))],
       |              CASE WHEN (i + 1) - j = 1 THEN best[j + 1] + (-20.0)
       |                   ELSE CAST('-infinity' AS DOUBLE) END)
       |            FOR j IN range(greatest(0, i + 1 - maxlen), i + 1)] AS sc
       |    FROM dp WHERE i < m)),
       |dpf AS (SELECT word, m, back FROM dp WHERE i = m),
       |rec AS (
       |  SELECT word, m AS p, CAST([] AS VARCHAR[]) AS pieces, back FROM dpf
       |  UNION ALL
       |  SELECT word, back[p + 1] AS p,
       |         list_prepend(substr(word, back[p + 1] + 1, p - back[p + 1]),
       |           pieces) AS pieces,
       |         back
       |  FROM rec WHERE p > 0),
       |wenc AS (SELECT word, pieces FROM rec WHERE p = 0),
       |w AS (SELECT doc_id, unnest(toks) AS word,
       |             unnest(generate_series(1, len(toks))) AS pos
       |      FROM (SELECT doc_id,
       |                   list_filter($sqlTokens, t -> t <> '') AS toks
       |            FROM documents)),
       |tokp AS (SELECT doc_id, pos, e.pieces FROM w JOIN wenc e USING (word)),
       |docp AS (SELECT doc_id, flatten(list(pieces ORDER BY pos)) AS allp,
       |                count(*) AS n_tok
       |         FROM tokp GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(p.n_tok, 0) AS INTEGER) AS n_tokens,
       |  CAST(coalesce(len(p.allp), 0) AS INTEGER) AS n_pieces,
       |  md5(array_to_string(coalesce(p.allp, CAST([] AS VARCHAR[])), ' ')) AS pieces_fp
       |FROM documents d LEFT JOIN docp p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** d106's oracle: the unigram-LM EM TRAINER replayed in DuckDB SQL —
    * the d85/s20 chained-CTE regime applied to Kudo's EM. Seed = the
    * char set + top-200 substrings (len 2-4) with ML log-probs over
    * the seed mass; then `emRounds` generated blocks, each enumerating
    * ALL segmentations of every distinct word as a recursive CTE
    * (brute force — the unit spec pins forward-backward ≡ brute-force,
    * and the 4dp rounding of each round's expected counts + log-probs
    * on BOTH sides absorbs the operation-order float divergence), the
    * per-word partition via max + log-sum-exp, expected counts
    * `exp(lp − z)·c` summed per piece, and the multinomial M-step with
    * the −30 single-char floor and dead-multi shrinkage. Final prune:
    * every single char + the top (finalSize − singles) multis by
    * (lp DESC, p), renormalized. The APPLY half is the d105 Viterbi
    * oracle verbatim over the learned vocabulary. Every per-round
    * table is MATERIALIZED (the d86 lesson: inlined CTE chains
    * re-evaluate exponentially) and the vocab lookup inside the
    * segmentation recursion is a plain JOIN against the materialized
    * previous-round vocab — carrying the vocab as list columns per
    * path row made the recursion quadratic in memory.
    */
  private lazy val unigramLearnOracle: String = {
    val emRounds = 3
    val seedMaxLen = 4
    val seedSize = 200
    val finalSize = 160
    def r4(x: String) = s"sign($x) * floor(abs($x) * 10000.0 + 0.5) / 10000.0"
    val rounds = new StringBuilder
    (1 to emRounds).foreach { r =>
      val prev = s"v${r - 1}"
      rounds.append(s""",
        |seg$r AS (
        |  SELECT w AS word, c, 0 AS pos, CAST(0.0 AS DOUBLE) AS lp,
        |         CAST([] AS VARCHAR[]) AS pieces
        |  FROM wc
        |  UNION ALL
        |  SELECT s.word, s.c, s.pos + ll.l AS pos, s.lp + vv.lp AS lp,
        |         list_append(s.pieces, vv.p) AS pieces
        |  FROM seg$r s
        |  JOIN (SELECT unnest(range(1, ${seedMaxLen + 1})) AS l) ll
        |    ON s.pos + ll.l <= length(s.word)
        |  JOIN $prev vv ON vv.p = substr(s.word, s.pos + 1, ll.l)
        |  WHERE s.pos < length(s.word)),
        |full$r AS MATERIALIZED (SELECT word, c, lp, pieces FROM seg$r WHERE pos = length(word)),
        |zm$r AS MATERIALIZED (SELECT word, max(lp) AS mx FROM full$r GROUP BY word),
        |z$r AS MATERIALIZED (SELECT f.word, zm.mx + ln(sum(exp(f.lp - zm.mx))) AS z
        |  FROM full$r f JOIN zm$r zm USING (word) GROUP BY f.word, zm.mx),
        |occ$r AS MATERIALIZED (SELECT word, c, lp, unnest(pieces) AS p FROM full$r),
        |e$r AS MATERIALIZED (SELECT p, ${r4("sum(exp(o.lp - z.z) * o.c)")} AS e
        |  FROM occ$r o JOIN z$r z USING (word) GROUP BY p),
        |v$r AS MATERIALIZED (
        |  SELECT p, lp FROM (
        |    SELECT v.p,
        |      CASE WHEN coalesce(e.e, 0) > 0 THEN ${r4("ln(e.e / t.t)")}
        |           WHEN length(v.p) = 1 THEN -30.0
        |           ELSE NULL END AS lp
        |    FROM $prev v
        |    LEFT JOIN e$r e ON v.p = e.p,
        |    (SELECT CAST(sum(e) AS DOUBLE) AS t FROM e$r) t)
        |  WHERE lp IS NOT NULL)""".stripMargin)
    }
    s"""WITH RECURSIVE
       |tok0 AS (SELECT unnest($sqlTokens) AS w FROM documents),
       |wc AS MATERIALIZED (SELECT w, count(*) AS c FROM tok0 WHERE w <> '' GROUP BY w),
       |chars AS MATERIALIZED (SELECT c2 AS p, sum(c) AS n FROM (
       |    SELECT unnest(regexp_extract_all(w, '[\\s\\S]')) AS c2, c FROM wc)
       |  WHERE length(c2) = 1 GROUP BY c2),
       |subs0 AS (
       |  SELECT substr(w, i + 1, l) AS p, c
       |  FROM wc, (SELECT unnest(range(2, ${seedMaxLen + 1})) AS l) ls,
       |       LATERAL (SELECT unnest(range(0, length(w) - ls.l + 1)) AS i) ii
       |  WHERE length(w) >= ls.l),
       |subs AS MATERIALIZED (SELECT p, sum(c) AS n FROM subs0 GROUP BY p
       |  ORDER BY n DESC, p LIMIT $seedSize),
       |seedu AS MATERIALIZED (SELECT p, n FROM chars UNION ALL SELECT p, n FROM subs),
       |v0 AS MATERIALIZED (SELECT p, ${r4("ln(n / t.t)")} AS lp
       |  FROM seedu, (SELECT CAST(sum(n) AS DOUBLE) AS t FROM seedu) t)
       |${rounds.toString},
       |singles AS (SELECT p, lp FROM v$emRounds WHERE length(p) = 1),
       |kept AS (
       |  SELECT p, lp FROM singles
       |  UNION ALL
       |  SELECT p, lp FROM (
       |    SELECT p, lp, row_number() OVER (ORDER BY lp DESC, p) AS rn
       |    FROM v$emRounds WHERE length(p) > 1)
       |  WHERE rn <= (SELECT greatest(0, $finalSize - count(*)) FROM singles)),
       |vf AS MATERIALIZED (SELECT p, ${r4("lp - nm.nm")} AS lp
       |  FROM kept, (SELECT ln(sum(exp(lp))) AS nm FROM kept) nm),
       |vlist AS MATERIALIZED (SELECT list(p ORDER BY p) AS pl, list(lp ORDER BY p) AS lpl,
       |  greatest(max(length(p)), 2) AS maxlen FROM vf),
       |words AS (SELECT DISTINCT w AS word FROM wc),
       |dp AS (
       |  SELECT word, length(word) AS m, 0 AS i,
       |         [CAST(0.0 AS DOUBLE)] AS best, [0] AS back, pl, lpl, maxlen
       |  FROM words, vlist
       |  UNION ALL
       |  SELECT word, m, i,
       |         list_append(best, list_aggregate(sc, 'max')) AS best,
       |         list_append(back,
       |           lo + list_position(sc, list_aggregate(sc, 'max')) - 1) AS back,
       |         pl, lpl, maxlen
       |  FROM (
       |    SELECT word, m, i + 1 AS i, best, back, pl, lpl, maxlen,
       |           greatest(0, i + 1 - maxlen) AS lo,
       |           [coalesce(
       |              best[j + 1] + lpl[list_position(pl, substr(word, j + 1, (i + 1) - j))],
       |              CASE WHEN (i + 1) - j = 1 THEN best[j + 1] + (-20.0)
       |                   ELSE CAST('-infinity' AS DOUBLE) END)
       |            FOR j IN range(greatest(0, i + 1 - maxlen), i + 1)] AS sc
       |    FROM dp WHERE i < m)),
       |dpf AS (SELECT word, m, back FROM dp WHERE i = m),
       |rec AS (
       |  SELECT word, m AS p, CAST([] AS VARCHAR[]) AS pieces, back FROM dpf
       |  UNION ALL
       |  SELECT word, back[p + 1] AS p,
       |         list_prepend(substr(word, back[p + 1] + 1, p - back[p + 1]),
       |           pieces) AS pieces,
       |         back
       |  FROM rec WHERE p > 0),
       |wenc AS MATERIALIZED (SELECT word, pieces FROM rec WHERE p = 0),
       |w AS (SELECT doc_id, unnest(toks) AS word,
       |             unnest(generate_series(1, len(toks))) AS pos
       |      FROM (SELECT doc_id,
       |                   list_filter($sqlTokens, t -> t <> '') AS toks
       |            FROM documents)),
       |tokp AS (SELECT doc_id, pos, e.pieces FROM w JOIN wenc e USING (word)),
       |docp AS (SELECT doc_id, flatten(list(pieces ORDER BY pos)) AS allp,
       |                count(*) AS n_tok
       |         FROM tokp GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(p.n_tok, 0) AS INTEGER) AS n_tokens,
       |  CAST(coalesce(len(p.allp), 0) AS INTEGER) AS n_pieces,
       |  md5(array_to_string(coalesce(p.allp, CAST([] AS VARCHAR[])), ' ')) AS pieces_fp
       |FROM documents d LEFT JOIN docp p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** d68's oracle: greedy longest-match-first WordPiece as a DuckDB
    * recursive CTE — one segmentation step per recursion round, the
    * vocabulary inlined as a list literal (derived from the SAME
    * [[wordPieceVocab]] the Spark kernel runs). The step's best match
    * is a list comprehension over the vocab filtered to pieces that
    * match at the cursor (raw surface at word start, `##`-prefixed
    * continuation after — [[graft.functions.WordPieceUtil.encodeWord]]'s
    * exact lookup contract, including the maxPiece candidate-length
    * bound at BOTH cursors), reduced with `list_aggregate('max')` to
    * the longest consumed length; no match → the whole word falls to
    * `[UNK]` (BERT's is_bad contract), as does a word over 200 chars.
    */
  private val wordPieceOracle: String = {
    val vlit = wordPieceVocab
      .map(v => "'" + v.replace("'", "''") + "'").mkString("[", ", ", "]")
    val maxPiece = wordPieceVocab
      .map(v => if (v.startsWith("##")) v.length - 2 else v.length).max
    s"""WITH RECURSIVE
       |w AS (
       |  SELECT doc_id,
       |         unnest(toks) AS word,
       |         unnest(generate_series(1, len(toks))) AS pos
       |  FROM (SELECT doc_id,
       |               list_filter($sqlTokens, t -> t <> '') AS toks
       |        FROM documents)),
       |seg AS (
       |  SELECT doc_id, pos, word, length(word) AS wl,
       |         1 AS cur,
       |         CAST([] AS VARCHAR[]) AS pieces,
       |         (length(word) > 200) AS failed,
       |         (length(word) > 200) AS stop
       |  FROM w
       |  UNION ALL
       |  SELECT doc_id, pos, word, wl,
       |         cur + coalesce(bl, 0) AS cur,
       |         CASE WHEN bl IS NULL THEN pieces
       |              ELSE list_append(pieces,
       |                CASE WHEN cur = 1 THEN substr(word, 1, bl)
       |                     ELSE '##' || substr(word, cur, bl) END) END AS pieces,
       |         (bl IS NULL) AS failed,
       |         (bl IS NULL OR cur + bl > wl) AS stop
       |  FROM (
       |    SELECT *,
       |      list_aggregate(
       |        [CASE WHEN cur = 1 THEN length(v) ELSE length(v) - 2 END
       |         FOR v IN $vlit
       |         IF CASE WHEN cur = 1
       |                 THEN length(v) <= $maxPiece
       |                      AND substr(word, cur, length(v)) = v
       |                 ELSE length(v) >= 3 AND substr(v, 1, 2) = '##'
       |                      AND length(v) - 2 <= $maxPiece
       |                      AND substr(word, cur, length(v) - 2) = substr(v, 3)
       |            END], 'max') AS bl
       |    FROM seg WHERE NOT stop)),
       |tokp AS (
       |  SELECT doc_id, pos,
       |         CASE WHEN failed THEN ['[UNK]'] ELSE pieces END AS pieces
       |  FROM seg WHERE stop),
       |docp AS (
       |  SELECT doc_id, flatten(list(pieces ORDER BY pos)) AS allp
       |  FROM tokp GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(coalesce(len(p.allp), 0) AS INTEGER) AS n_pieces,
       |  CAST(coalesce(len(list_filter(p.allp, x -> x = '[UNK]')), 0) AS INTEGER) AS n_unk,
       |  md5(array_to_string(coalesce(p.allp, CAST([] AS VARCHAR[])), ' ')) AS pieces_fp
       |FROM documents d LEFT JOIN docp p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** The bigram-LM store state d102 and d107 both probe — corpus 60%
    * admitted at creation, 40% folded by one marked advance, then
    * compacted (compaction persists the derived model sidecar) — built
    * ONCE per (session, fixture dir) through [[cachedModel]] and
    * probed by both scorers: build-once/probe-many, the amortization
    * the at-rest store exists for. Ledger MUTATION semantics stay
    * independently covered: d90 exercises write/advance/replay/compact
    * on its own store, d91 retraction on another.
    */
  private def sharedLmLedger(s: org.apache.spark.sql.SparkSession,
      dir: String, docs: org.apache.spark.sql.DataFrame): String =
    cachedModel(s, s"bigram-lm-ledger:$dir") {
      import graft.operators.CurationOps
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val path = Registry.scratchDir(s"/tmp/graft_conformance/dlm_shared_$tag")
      CurationOps.writeBigramLedger(docs.filter(col("doc_id") % 10 < 6), "text", path)
      CurationOps.advanceBigramLedger(docs.filter(col("doc_id") % 10 >= 6),
        "text", path, batchId = Some("gen-2"))
      // compaction persists the derived model sidecar — ONE model
      // write amortized across both scorers' probes
      CurationOps.compactBigramLedger(s, path, targetFiles = 2)
      path
    }

  /** The d34 from-scratch bigram-LM scorer's per-doc output
    * `(doc_id, n_bigrams, avg_nll_raw)` over the full documents table,
    * computed ONCE per (session, fixture) and persisted: d34 (the
    * scorer's own conformance row), d67 (perplexity buckets) and d124
    * (mixture reweighting) all consume the SAME scores — CCNet's
    * actual staging, where the reference-model pass materializes once
    * and every downstream selector reads the compact scored table.
    */
  private def sharedLmScores(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    cachedModel(s, s"bigram-lm-scores:$dir") {
      val df = graft.operators.CurationOps.bigramLmScore(
        table(s, dir, "documents"), "doc_id", "text").persist()
      df.count() // materialize while the cache slot is held
      df
    }

  /** Trained ANN models memoized per fixture dir: an index is BUILT once
    * and PROBED many times, so repeated invocations (the bench's paired
    * passes; a user's query stream) should pay the probe, not a retrain —
    * the same amortization s02/s03 get from their persisted bucketed
    * index. Keys embed the training params; fixture dirs are immutable
    * for a run (same contract as Registry's plan cache). d33's semDedup
    * deliberately does NOT cache: dedup is a one-shot batch pass.
    */
  // Keyed by SESSION: some cached values are persist()ed DataFrames
  // bound to the session that built them — a process that runs the
  // inventory under a second session must retrain rather than receive a
  // frame pinned to the first (possibly stopped) one. A WeakHashMap
  // CANNOT provide the eviction here: the cached DataFrames strongly
  // reference their own SparkSession, so value → key keeps every entry
  // reachable forever (the classic WeakHashMap value-cycle leak).
  // Instead: an access-ordered bounded map — beyond 16 distinct
  // sessions the least-recently-used session's entry is dropped and
  // its persisted frames unpersisted (eviction of a still-live session
  // only costs a retrain on next use; 16 covers any realistic in-JVM
  // session count, including the per-run sessions d36/d36b/d36c
  // create, which age out by access order).
  private val modelCache =
    new java.util.LinkedHashMap[org.apache.spark.sql.SparkSession,
        scala.collection.concurrent.TrieMap[String, ModelSlot]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[org.apache.spark.sql.SparkSession,
            scala.collection.concurrent.TrieMap[String, ModelSlot]]): Boolean = {
        val evict = size() > 16
        if (evict) e.getValue.values.foreach { slot =>
          slot.value match {
            case df: org.apache.spark.sql.DataFrame =>
              try df.unpersist(blocking = false) catch { case _: Throwable => () }
            case _ => ()
          }
        }
        evict
      }
    }
  /** One cache cell: the slot object is the per-key lock, so `train`
    * runs AT MOST ONCE per (session, key) — TrieMap.getOrElseUpdate
    * alone is not atomic (two racing threads could both train, double-
    * persisting the s07/s08 code tables and leaking one copy). Losing
    * a putIfAbsent race only discards an empty slot, never a model.
    */
  private final class ModelSlot { @volatile var value: Any = null }

  /** The BPE merge sequence is PREFIX-STABLE: greedy argmax with a
    * fixed tie order means learning N merges yields the same first k
    * for every k ≤ N. So d85 (3 merges) and d86 (8) share ONE cached
    * 8-round learn — the d102/d107 cachedModel regime; d85 reads the
    * prefix. Bounded: ≤ 8 rows.
    */
  private def cachedBpeMerges(s: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(Int, String, String, Long)] =
    cachedModel(s, s"bpe-merges:8:$dir") {
      graft.operators.CurationOps
        .learnBpeMerges(table(s, dir, "documents"), "text", 8)
        .orderBy("rk").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toIndexedSeq
    }
  private def cachedModel[M](s: org.apache.spark.sql.SparkSession, key: String)(train: => M): M = {
    val perSession = modelCache.synchronized {
      var m = modelCache.get(s)
      if (m == null) { m = scala.collection.concurrent.TrieMap.empty; modelCache.put(s, m) }
      m
    }
    val slot = {
      val fresh = new ModelSlot
      perSession.putIfAbsent(key, fresh).getOrElse(fresh)
    }
    slot.synchronized {
      if (slot.value == null) slot.value = train
      slot.value.asInstanceOf[M]
    }
  }

  /** The exact brute-force referent shared by every ANN decision
    * relation probing the same (corpus predicate) — one sweep per
    * session, the d102/d107 cachedModel regime (the referent is
    * conformance apparatus like the shared PQ/IVFPQ code tables, and
    * it is queries×k rows — model-sized by construction).
    */
  private def cachedExactTopK(s: org.apache.spark.sql.SparkSession,
      dir: String, key: String,
      corpusFilter: Option[org.apache.spark.sql.Column] = None)
      : org.apache.spark.sql.DataFrame = {
    val (schema, rows) = cachedModel(s, s"exacttopk:$key:$dir") {
      val emb = table(s, dir, "embeddings")
      val df = SimilarityOps.bruteForceTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        corpusFilter.fold(emb)(emb.filter), "vec_id", "embedding", k = 5)
      (df.schema, df.collect().toIndexedSeq)
    }
    import scala.jdk.CollectionConverters._
    s.createDataFrame(rows.asJava, schema)
  }

  /** The Spark half of [[sqlExactTopkRecallOracle]]: hash the exact
    * brute-force top-k and carry the corpus-level recall@k of the
    * approximate answer against it on every row, at HALF the family's
    * AccuracySpec gate (the established 2× headroom — recall is
    * (model, corpus-shape)-dependent, the d49b lesson: verify the
    * verdict at all three SFs, never hash the raw number). An index
    * that stops retrieving flips the whole table red; the tight bound
    * stays in AccuracySpec.
    */
  private def annRecallRelation(exact: org.apache.spark.sql.DataFrame,
      approx: org.apache.spark.sql.DataFrame,
      minRecall: Double): org.apache.spark.sql.DataFrame = {
    val flagged = exact.join(
      approx.select(col("query_id"), col("neighbor_id"), lit(1).as("__hit")),
      Seq("query_id", "neighbor_id"), "left")
    // one model-sized verdict row, broadcast back onto the exact side.
    // NOTE: this is MICRO-averaged corpus-level recall over all exact
    // rows (hits / (queries × k)), not a per-query macro recall — fine
    // at 8 uniform queries × k=5, but don't read it as per-query.
    val verdict = flagged.agg(
      (sum(coalesce(col("__hit"), lit(0))) / count(lit(1)) >= minRecall)
        .as("recall_ok"))
    flagged.crossJoin(broadcast(verdict))
      .select(col("query_id"), col("neighbor_id"), col("score"), col("rk"),
        col("recall_ok"))
      // queries × k rows by construction: a single-partition local sort
      // skips the range-partition sampling job a global orderBy pays
      // (the established s08/s09/s19 rationale).
      .coalesce(1).sortWithinPartitions("query_id", "rk")
  }

  val all: Seq[NamedQuery] = Seq(
    // ---------------------------------------------------------------- text analysis
    q("d01_text_stats",
      s"""SELECT doc_id, lang, source,
         |  CAST(length(text) AS INTEGER) AS n_chars_actual,
         |  CAST(len($sqlTokens) AS INTEGER) AS n_tokens,
         |  round(length(replace(text, ' ', '')) / len($sqlTokens), 4) AS avg_token_len
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"), col("lang"), col("source"),
        length(col("text")).cast("int").as("n_chars_actual"),
        TextOps.tokenCount(col("text")).as("n_tokens"),
        Qf.dround(TextOps.avgTokenLength(col("text")), 4).as("avg_token_len"))
        .orderBy("doc_id")
    },

    q("d02_quality_score",
      s"""SELECT doc_id,
         |  CAST(len(list_filter($sqlTokens, t -> t IN ($stopList))) AS INTEGER) AS n_stop,
         |  round(len(list_filter($sqlTokens, t -> t IN ($stopList))) / len($sqlTokens), 4) AS stop_ratio,
         |  round(0.5 * (1 - (len(list_filter($sqlTokens, t -> t IN ($stopList))) / len($sqlTokens)))
         |      + 0.5 * least(1.0, len($sqlTokens) / 100.0), 4) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        TextOps.stopwordCount(col("text")).as("n_stop"),
        Qf.dround(TextOps.stopwordRatio(col("text")), 4).as("stop_ratio"),
        Qf.dround(TextOps.qualityScore(col("text")), 4).as("quality"))
        .orderBy("doc_id")
    },

    q("d03_lang_id",
      s"""SELECT doc_id,
         |  round(len(list_filter($sqlTokens, t -> t IN ($stopList))) / len($sqlTokens), 4) AS en_ratio,
         |  CASE WHEN len(list_filter($sqlTokens, t -> t IN ($stopList))) >= 3 THEN 'en'
         |       WHEN len(list_filter($sqlTokens, t -> t IN ($stopList))) >= 1 THEN 'en_maybe'
         |       ELSE 'und' END AS lang_guess
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        Qf.dround(TextOps.stopwordRatio(col("text")), 4).as("en_ratio"),
        TextOps.langIdHeuristic(col("text")).as("lang_guess"))
        .orderBy("doc_id")
    },

    q("d04_fingerprint",
      """SELECT doc_id,
        |  md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      table(s, dir, "documents").select(
        col("doc_id"),
        TextOps.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- dedup
    q("d05_dedup_exact_stats",
      """SELECT count(*) AS n_docs,
        |  count(DISTINCT md5(text)) AS n_unique,
        |  count(*) - count(DISTINCT md5(text)) AS n_dupes
        |FROM documents""".stripMargin) { (s, dir) =>
      table(s, dir, "documents").agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text"))).as("n_unique"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dupes"))
    },

    q("d06_dedup_exact_rows",
      """SELECT md5(text) AS digest, min(doc_id) AS rep_id, count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY digest""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .groupBy(md5(col("text")).as("digest"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_copies"))
        .orderBy("digest")
    },

    q("d07_minhash_sig",
      s"""WITH sh AS (SELECT doc_id, $sqlHashedShingles AS hs FROM documents)
         |SELECT doc_id,
         |  $sqlMh8
         |FROM sh ORDER BY doc_id""".stripMargin) { (s, dir) =>
      DedupOps.minHashSignatures(table(s, dir, "documents"), "doc_id", "text", 8, 5)
        .orderBy("doc_id")
    },

    q("d08_lsh_pairs", {
      def bucket(b: Int) = (0 until 4).map(r => s"CAST(mh${b * 4 + r} AS VARCHAR)")
        .mkString("md5(", " || '_' || ", ")")
      s"""WITH sh AS (SELECT doc_id, $sqlHashedShingles AS hs FROM documents),
         |sig AS (SELECT doc_id, $sqlMh8 FROM sh),
         |bands AS (
         |  SELECT doc_id, 0 AS band, ${bucket(0)} AS bucket FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, ${bucket(1)} AS bucket FROM sig)
         |SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n_bands
         |FROM bands a JOIN bands b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |ORDER BY n_bands DESC, d1, d2 LIMIT 100""".stripMargin
    }) { (s, dir) =>
      DedupOps.lshCandidatePairs(table(s, dir, "documents"), "doc_id", "text",
        numHashes = 8, bandSize = 4, shingleSize = 5)
        .orderBy(col("n_bands").desc, col("d1"), col("d2"))
        .limit(100)
    },

    // ---------------------------------------------------------------- cross-corpus dedup
    // incremental-ingest shape: which docs of a NEW batch (doc_id%10=0)
    // collide with the EXISTING corpus (the rest) — bipartite banding
    // join, new side broadcast; at steady state the corpus bands are a
    // persisted, incrementally-maintained table.
    q("d38_cross_dedup", sqlCrossDedupOracle) { (s, dir) =>
      val docs = table(s, dir, "documents")
      DedupOps.crossDedupPairs(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", numHashes = 8, bandSize = 4, shingleSize = 5)
        .orderBy("new_id", "corpus_id")
    },

    // ---------------------------------------------------------------- persisted signature ledger
    // d38's cross-dedup with the corpus side AT REST: signatures are
    // written once (writeSignatureLedger), then the batch probes them
    // without re-reading or re-shingling corpus text — the near-dup
    // counterpart of the d39 digest ledger, and the steady-state
    // contract crossDedupPairs documents. The oracle is d38's, file-
    // blind (recomputes minhash for BOTH sub-corpora from text), so
    // the hash match proves the at-rest signature round-trip changed
    // nothing.
    q("d48_cross_dedup_at_rest", sqlCrossDedupOracle) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d48_sig_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      // two generations + a replayed append + compaction: the oracle is
      // file- and duplication-blind, so the probe passes only if the
      // whole maintenance cycle lost and invented nothing
      val gen2 = docs.filter((col("doc_id") % 10) > 5)
      DedupOps.writeSignatureLedger(docs.filter((col("doc_id") % 10).between(1, 5)),
        "doc_id", "text", path)
      DedupOps.appendToSignatureLedger(gen2, "doc_id", "text", path,
        batchId = Some("gen-2"))
      // crash-and-retry replay: exactly-once marker no-op (unmarked
      // replay tolerance stays covered by the family's unit spec)
      DedupOps.appendToSignatureLedger(gen2, "doc_id", "text", path,
        batchId = Some("gen-2"))
      DedupOps.compactSignatureLedger(s, path, targetFiles = 4)
      DedupOps.crossDedupAgainstSignatures(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", path)
        .orderBy("new_id", "corpus_id")
    },

    // ---------------------------------------------------------------- semantic decontamination
    // the embedding-space companion of d24's n-gram decontamination:
    // a corpus document is contaminated when its embedding's cosine
    // against ANY benchmark item reaches the threshold — catching the
    // paraphrases/translations n-gram overlap misses. The benchmark
    // side (vec_id % 50, a model-sized suite) broadcasts; the corpus
    // streams past it through the fused dot kernel; per-doc arg-max
    // with a smallest-bench-id tie-break. Exact brute-force form (the
    // oracle mirrors it pair-for-pair); the ANN-prefiltered variant is
    // the same rescore over probeBucketedIndex candidates.
    q("d49_semantic_decontamination", semanticDeconOracle) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      graft.operators.CurationOps.semanticDecontamination(
        emb.filter(col("vec_id") % 50 =!= 0), "vec_id", "embedding",
        emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
        threshold = 0.3)
        .orderBy("vec_id")
    },

    // ---------------------------------------------------------------- ANN-prefiltered semantic decon
    // d49's scale path as real code: bench coarse-quantized into IVF
    // cells, corpus probes its nprobe nearest cells, exact rescore on
    // the candidates — no bench broadcast, no corpus × bench pair set.
    // The flagged SET is model-dependent (nprobe recall < 1 is the
    // design trade), so it is never hashed — the hash-matched DECISION
    // RELATION (the r15 d119 regime) is, per corpus document: the
    // EXACT contamination flag (the oracle replays d49's brute force)
    // and `prec_ok` = the precision-1 contract (IVF-flagged ⇒ exactly
    // contaminated; sound at any scale because the rescore is the same
    // 6dp-rounded cosine against the same threshold). Recall stays in
    // the AccuracySpec gate at its pinned fixture (≥ 0.8, measured 1.0
    // there) — a tuning property of (k, nprobe) vs corpus shape, like
    // d33's.
    q("d49b_semantic_decon_ivf",
      """WITH b AS (SELECT vec_id AS bench_id, embedding AS bv FROM embeddings WHERE vec_id % 50 = 0),
        |c AS (SELECT vec_id, embedding AS cv FROM embeddings WHERE vec_id % 50 <> 0),
        |hit AS (
        |  SELECT DISTINCT c.vec_id FROM c, b
        |  WHERE round(list_sum(list_transform(range(1, 65), i -> cv[i] * bv[i]))
        |      / (sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))
        |       * sqrt(list_sum(list_transform(range(1, 65), i -> bv[i] * bv[i])))), 6) >= 0.3)
        |SELECT c.vec_id, (h.vec_id IS NOT NULL) AS exact_contam, TRUE AS prec_ok
        |FROM c LEFT JOIN hit h ON c.vec_id = h.vec_id
        |ORDER BY c.vec_id""".stripMargin) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      val bench = emb.filter(col("vec_id") % 50 === 0)
      val corpus = emb.filter(col("vec_id") % 50 =!= 0)
      val model = cachedModel(s, s"ivf-bench:k8:i3:$dir")(
        IvfIndex.train(bench, "embedding", k = 8, iters = 3))
      val ivf = graft.operators.CurationOps.semanticDecontaminationIvf(
          corpus, "vec_id", "embedding",
          bench, "vec_id", "embedding", threshold = 0.3, model, nprobe = 3)
        .select(col("vec_id")).withColumn("__ivf", lit(true))
      // the model-free exact flag — d49's own exact operator over the
      // same split and threshold (bench broadcasts, corpus streams)
      val exact = graft.operators.CurationOps.semanticDecontamination(
          corpus, "vec_id", "embedding",
          bench, "vec_id", "embedding", threshold = 0.3)
        .select(col("vec_id")).withColumn("__ex", lit(true))
      corpus.select(col("vec_id"))
        .join(ivf, Seq("vec_id"), "left")
        .join(exact, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("__ex"), lit(false)).as("exact_contam"),
          (coalesce(col("__ex"), lit(false)) || !coalesce(col("__ivf"), lit(false)))
            .as("prec_ok"))
        .orderBy("vec_id")
    },

    // ---------------------------------------------------------------- DSIR importance weighting
    // Xie et al. 2023: rank raw documents by target-likeness via the
    // hashed-n-gram likelihood ratio between a target slice (the
    // deterministic doc_id % 97 holdout, as in d24/d49) and the raw
    // corpus. Both "LMs" are 1024-bucket count tables — model-sized
    // broadcasts; the corpus streams once per side through the fused
    // gram kernel. ln-ratio association is pinned to the oracle's
    // expression tree.
    q("d55_dsir_weights",
      s"""WITH $sqlDsirCtes
         |SELECT doc_id, round(sum(lr), 4) AS log_weight
         |FROM f JOIN lr USING (f) WHERE doc_id % 97 <> 0
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      graft.operators.CurationOps.dsirLogWeights(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", buckets = 1024)
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- DSIR resampling (Gumbel top-k)
    // the selection step over d55: sample-without-replacement ∝
    // exp(log_weight) ≡ top-n by log_weight + Gumbel noise (the
    // Gumbel-max trick) — a bounded-heap top-n, not a sequential
    // sampler. Noise is deterministic (md5 of id‖salt), so the oracle
    // redraws the identical sample.
    q("d56_dsir_resample",
      s"""WITH $sqlDsirCtes,
         |w AS (SELECT doc_id, round(sum(lr), 4) AS log_weight
         |  FROM f JOIN lr USING (f) WHERE doc_id % 97 <> 0 GROUP BY doc_id)
         |SELECT doc_id, log_weight,
         |  round(log_weight - ln(-ln(
         |    (${sqlHash("CAST(doc_id AS VARCHAR)", "dsir")} + 0.5) / 4294967296.0)), 4)
         |    AS gumbel_key
         |FROM w ORDER BY gumbel_key DESC, doc_id LIMIT 100""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val w = graft.operators.CurationOps.dsirLogWeights(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", buckets = 1024)
      graft.operators.CurationOps.gumbelTopK(w, "doc_id", "log_weight", n = 100)
    },

    // ---------------------------------------------------------------- script profile
    // writing-system detection features: per-script character counts
    // via Unicode script classes — the signal language-ID models and
    // mojibake/mixed-script filters run on. Composed from codegen'd
    // regexp_replace over the SAME Unicode Script property both
    // engines implement (Java \\p{IsX} ≡ RE2 \\p{X}; parity probed:
    // 5/6/2/5/2 on the mixed fixture). The synthetic corpus is ASCII,
    // so the fixture synthesizes mixed-script text from doc_id — the
    // m03/d47 generator pattern.
    q("d59_script_profile",
      s"""WITH t AS (SELECT doc_id,
         |  'hello ' || ['привет', '你好', 'مرحبا', 'data42'][CAST(doc_id % 4 AS INTEGER) + 1]
         |    || ' w' || CAST(doc_id % 7 AS VARCHAR) AS s
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(length(regexp_replace(s, '[^\\p{Latin}]', '', 'g')) AS INTEGER) AS n_latin,
         |  CAST(length(regexp_replace(s, '[^\\p{Cyrillic}]', '', 'g')) AS INTEGER) AS n_cyrillic,
         |  CAST(length(regexp_replace(s, '[^\\p{Han}]', '', 'g')) AS INTEGER) AS n_han,
         |  CAST(length(regexp_replace(s, '[^\\p{Arabic}]', '', 'g')) AS INTEGER) AS n_arabic,
         |  CAST(length(regexp_replace(s, '[^0-9]', '', 'g')) AS INTEGER) AS n_digit,
         |  CAST((CASE WHEN length(regexp_replace(s, '[^\\p{Latin}]', '', 'g')) > 0 THEN 1 ELSE 0 END
         |      + CASE WHEN length(regexp_replace(s, '[^\\p{Cyrillic}]', '', 'g')) > 0 THEN 1 ELSE 0 END
         |      + CASE WHEN length(regexp_replace(s, '[^\\p{Han}]', '', 'g')) > 0 THEN 1 ELSE 0 END
         |      + CASE WHEN length(regexp_replace(s, '[^\\p{Arabic}]', '', 'g')) > 0 THEN 1 ELSE 0 END)
         |    AS INTEGER) AS n_scripts
         |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val id = col("doc_id")
      val txt = concat(lit("hello "),
        element_at(array(lit("привет"), lit("你好"), lit("مرحبا"), lit("data42")),
          (id % 4 + 1).cast("int")),
        lit(" w"), (id % 7).cast("string"))
      def cnt(re: String) = length(regexp_replace(col("__s"), re, ""))
      val scripts = Seq(
        "n_latin" -> "[^\\p{IsLatin}]", "n_cyrillic" -> "[^\\p{IsCyrillic}]",
        "n_han" -> "[^\\p{IsHan}]", "n_arabic" -> "[^\\p{IsArabic}]")
      table(s, dir, "documents").select(id, txt.as("__s"))
        .select(Seq(id) ++ scripts.map { case (n, re) => cnt(re).as(n) } ++ Seq(
          cnt("[^0-9]").as("n_digit"),
          scripts.map { case (_, re) => when(cnt(re) > 0, 1).otherwise(0) }
            .reduce(_ + _).as("n_scripts")): _*)
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- duplicated-span detection
    // ExactSubstr dedup (Lee et al. 2022) — duplication at ARBITRARY
    // offsets, which whole-doc digests and chunk-aligned passage dedup
    // both miss. Overlapping k-token window hashes stand in for the
    // paper's suffix array (window recurrence ≡ substring recurrence
    // ≥ k tokens); recurring windows merge into maximal spans via the
    // same gaps-and-islands rule the oracle writes with lag()/sum().
    // k = 4 on the synthetic corpus yields 643 spans with genuine
    // multi-window merging; real deployments use k ≈ 50.
    q("d53_dup_spans",
      s"""WITH ${sqlDupSpanCtes(4)}
         |SELECT doc_id, CAST(s AS INTEGER) AS span_start,
         |  CAST(e AS INTEGER) AS span_end, nw AS n_windows
         |FROM sp ORDER BY doc_id, span_start""".stripMargin) { (s, dir) =>
      DedupOps.duplicatedSpans(table(s, dir, "documents"), "doc_id", "text", k = 4)
        .orderBy("doc_id", "span_start")
    },

    // ---------------------------------------------------------------- per-document duplication ratio
    // the corpus-health metric the ExactSubstr paper reports: what
    // fraction of each document's tokens sit inside a duplicated span.
    // Pure composition over d53's spans — one extra per-doc agg.
    q("d60_dup_ratio",
      s"""WITH ${sqlDupSpanCtes(4)},
         |agg AS (SELECT doc_id, CAST(sum(e - s) AS BIGINT) AS dup_tokens
         |  FROM sp GROUP BY doc_id)
         |SELECT d.doc_id, CAST(len($sqlTokens) AS INTEGER) AS n_tokens,
         |  coalesce(a.dup_tokens, 0) AS dup_tokens,
         |  round(coalesce(a.dup_tokens, 0) / len($sqlTokens), 4) AS dup_frac
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val dup = DedupOps.duplicatedSpans(docs, "doc_id", "text", k = 4)
        .groupBy(col("doc_id"))
        .agg(sum(col("span_end") - col("span_start")).as("dup_tokens"))
      docs.select(col("doc_id"),
          graft.operators.TextOps.tokenCount(col("text")).cast("int").as("n_tokens"))
        .join(dup, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
          Qf.dround(coalesce(col("dup_tokens"), lit(0L)) / col("n_tokens"), 4).as("dup_frac"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- duplicated-span scrub
    // the paper's dedup POLICY over d53's report: every duplicated
    // span is cut from every copy except the (id, pos)-minimal
    // canonical one, so exactly one occurrence of each duplicated
    // substring survives. Canonical selection is a partial-agg
    // min(struct(id, pos)) per hash — a boilerplate string in a
    // million docs is a hot reduce key, never a million-row window
    // sort. Untouched docs round-trip trim(text) exactly (split on
    // single space keeps empty tokens, so rejoin is lossless).
    q("d54_dup_span_scrub", {
      val kk = 4
      s"""WITH toks AS (SELECT doc_id, ($sqlTokens) AS t FROM documents),
         |gl AS (SELECT doc_id, list_transform(
         |    ${sqlNgrams("t", kk)}, x -> ${sqlHash("x", "")}) AS hs FROM toks),
         |g AS (SELECT doc_id, unnest(hs) AS h, unnest(range(0, len(hs))) AS pos FROM gl),
         |hm AS (SELECT h, count(*) AS cnt, min(doc_id) AS mdoc FROM g GROUP BY h),
         |hm2 AS (SELECT g.h, hm.cnt, hm.mdoc, min(g.pos) AS mpos
         |  FROM g JOIN hm ON g.h = hm.h AND g.doc_id = hm.mdoc GROUP BY 1, 2, 3),
         |scrub AS (SELECT g.doc_id, g.pos FROM g JOIN hm2 ON g.h = hm2.h
         |  WHERE hm2.cnt >= 2 AND NOT (g.doc_id = hm2.mdoc AND g.pos = hm2.mpos)),
         |m AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos)
         |    OVER (PARTITION BY doc_id ORDER BY pos) <= $kk THEN 0 ELSE 1 END AS brk
         |  FROM scrub),
         |isl AS (SELECT doc_id, pos, sum(brk)
         |    OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
         |  FROM m),
         |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + $kk AS e
         |  FROM isl GROUP BY doc_id, grp),
         |tok AS (SELECT doc_id, unnest(t) AS tk, unnest(range(0, len(t))) AS pos FROM toks),
         |kept AS (SELECT tk.doc_id, tk.pos, tk.tk FROM tok tk
         |  WHERE NOT EXISTS (SELECT 1 FROM sp
         |    WHERE sp.doc_id = tk.doc_id AND tk.pos >= sp.s AND tk.pos < sp.e)),
         |agg AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS clean_text,
         |  count(*) AS n_kept FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
         |  CAST(len($sqlTokens) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      DedupOps.scrubDuplicatedSpans(table(s, dir, "documents"), "doc_id", "text", k = 4)
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- incremental span scrub (at rest)
    // d53/d54's INGEST LOOP: the span-hash ledger holds every window
    // hash the corpus has admitted; a new batch cuts windows the
    // corpus already contains and follows the within-batch canonical
    // rule for fresh ones. The conformance run writes the ledger from
    // one slice, appends another (plus a crash-and-retry REPLAY of
    // that append), compacts (staged swap), then scrubs a probe slice.
    // The oracle is FILE-BLIND — it recomputes the corpus hash set and
    // the scrub from TEXT — so the hash match proves the whole
    // write/append/replay/compact cycle lost and invented nothing.
    q("d58_span_ledger_scrub", {
      val kk = 4
      s"""WITH toks AS (SELECT doc_id, ($sqlTokens) AS t FROM documents),
         |gl AS (SELECT doc_id, t, list_transform(
         |    ${sqlNgrams("t", kk)}, x -> ${sqlHash("x", "")}) AS hs FROM toks),
         |g AS (SELECT doc_id, unnest(hs) AS h, unnest(range(0, len(hs))) AS pos FROM gl),
         |led AS (SELECT DISTINCT h FROM g WHERE doc_id % 10 <> 0),
         |gb AS (SELECT doc_id, h, pos FROM g WHERE doc_id % 10 = 0),
         |inled AS (SELECT gb.doc_id, gb.pos FROM gb JOIN led USING (h)),
         |fresh AS (SELECT gb.doc_id, gb.h, gb.pos FROM gb
         |  WHERE NOT EXISTS (SELECT 1 FROM led WHERE led.h = gb.h)),
         |hm AS (SELECT h, count(*) AS cnt, min(doc_id) AS mdoc FROM fresh GROUP BY h),
         |hm2 AS (SELECT f.h, hm.cnt, hm.mdoc, min(f.pos) AS mpos
         |  FROM fresh f JOIN hm ON f.h = hm.h AND f.doc_id = hm.mdoc GROUP BY 1, 2, 3),
         |bscrub AS (SELECT f.doc_id, f.pos FROM fresh f JOIN hm2 ON f.h = hm2.h
         |  WHERE hm2.cnt >= 2 AND NOT (f.doc_id = hm2.mdoc AND f.pos = hm2.mpos)),
         |scrub AS (SELECT * FROM inled UNION ALL SELECT * FROM bscrub),
         |m AS (SELECT doc_id, pos, CASE WHEN pos - lag(pos)
         |    OVER (PARTITION BY doc_id ORDER BY pos) <= $kk THEN 0 ELSE 1 END AS brk
         |  FROM scrub),
         |isl AS (SELECT doc_id, pos, sum(brk)
         |    OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS grp
         |  FROM m),
         |sp AS (SELECT doc_id, min(pos) AS s, max(pos) + $kk AS e
         |  FROM isl GROUP BY doc_id, grp),
         |tok AS (SELECT doc_id, unnest(t) AS tk, unnest(range(0, len(t))) AS pos
         |  FROM toks WHERE doc_id % 10 = 0),
         |kept AS (SELECT tk.doc_id, tk.pos, tk.tk FROM tok tk
         |  WHERE NOT EXISTS (SELECT 1 FROM sp
         |    WHERE sp.doc_id = tk.doc_id AND tk.pos >= sp.s AND tk.pos < sp.e)),
         |agg AS (SELECT doc_id, string_agg(tk, ' ' ORDER BY pos) AS clean_text,
         |  count(*) AS n_kept FROM kept GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text,
         |  CAST(len($sqlTokens) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
         |FROM documents d LEFT JOIN agg a USING (doc_id)
         |WHERE d.doc_id % 10 = 0 ORDER BY d.doc_id""".stripMargin
    }) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d58_led_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      val gen2 = docs.filter((col("doc_id") % 10) > 5)
      DedupOps.writeSpanHashLedger(docs.filter((col("doc_id") % 10).between(1, 5)),
        "doc_id", "text", k = 4, path)
      DedupOps.appendToSpanHashLedger(gen2, "doc_id", "text", k = 4, path,
        batchId = Some("gen-2"))
      // replay: exactly-once marker no-op (unmarked tolerance is
      // unit-covered)
      DedupOps.appendToSpanHashLedger(gen2, "doc_id", "text", k = 4, path,
        batchId = Some("gen-2"))
      DedupOps.compactSpanHashLedger(s, path, targetFiles = 4)
      DedupOps.scrubAgainstSpanLedger(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", path)
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- per-domain crawl cap
    // C4-style per-host contribution cap: crawl pipelines bound how
    // many documents one domain may contribute (boilerplate farms
    // otherwise dominate). The host key comes from PARSING the URL
    // (TextOps.urlHost — the same shared parser as the d47 canonical
    // key), and the cap is the bounded-heap per-key top-k (first N by
    // doc id, deterministic), NOT a row_number window — a mega-domain
    // streams through ≤N-element partial buffers instead of sorting
    // its whole partition. The fixture synthesizes 5 hosts from
    // doc_id, same m03/d47 generator pattern.
    q("d52_domain_cap",
      """WITH u AS (SELECT doc_id,
        |  lower('WWW.Site' || CAST(doc_id % 5 AS VARCHAR) || '.Example.COM') AS host
        |  FROM documents),
        |r AS (SELECT doc_id, host,
        |  CAST(row_number() OVER (PARTITION BY host ORDER BY doc_id) AS INTEGER) AS rk
        |  FROM u)
        |SELECT host, doc_id, rk FROM r WHERE rk <= 30
        |ORDER BY host, rk""".stripMargin) { (s, dir) =>
      import graft.operators.{SimilarityOps, TextOps}
      val url = concat(lit("HTTPS://"), lit("WWW.Site"), (col("doc_id") % 5).cast("string"),
        lit(".Example.COM"), lit("/Dir"), (col("doc_id") % 7).cast("string"))
      val hosts = table(s, dir, "documents")
        .select(col("doc_id"), TextOps.urlHost(url).as("host"))
      SimilarityOps.perKeyTopK(
        hosts.withColumn("__ord", col("doc_id").cast("double")),
        keys = Seq("host"), idCol = "doc_id", scoreCol = "__ord",
        asc = true, k = 30)
        .select(col("host"), col("doc_id"), col("rk"))
        .dumpSorted("host", "rk")
    },

    // ---------------------------------------------------------------- length winsorization
    // the outlier-trimming curation stage: per-source EXACT p05/p95 of
    // token counts (the distributed histogram-selection plan — the SQL
    // a user would write routes onto it via the optimizer rule; here
    // the operator form), broadcast back onto the corpus, every doc
    // tagged and clipped. Composition proof: the percentile machinery
    // feeding a pipeline stage, not just a report.
    q("d51_length_winsorize",
      s"""WITH t AS (SELECT doc_id, source,
         |  CAST(len($sqlTokens) AS DOUBLE) AS n_tok FROM documents),
         |qs AS (SELECT source,
         |  quantile_cont(n_tok, 0.05) AS lo, quantile_cont(n_tok, 0.95) AS hi
         |  FROM t GROUP BY source)
         |SELECT doc_id, t.source, CAST(n_tok AS BIGINT) AS n_tok,
         |  round(least(greatest(n_tok, lo), hi), 4) AS clipped,
         |  CAST(CASE WHEN n_tok < lo OR n_tok > hi THEN 1 ELSE 0 END AS INTEGER) AS is_outlier
         |FROM t JOIN qs ON t.source = qs.source
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.PercentileOps
      val t = table(s, dir, "documents").select(col("doc_id"), col("source"),
        graft.operators.TextOps.tokenCount(col("text")).cast("double").as("n_tok"))
      val qs = PercentileOps.exactQuantilesSelect(t, Seq("source"), Seq(
        ("n_tok", col("n_tok"), Seq(("lo", 0.05, false), ("hi", 0.95, false)))))
      t.join(broadcast(qs), Seq("source"))
        .select(col("doc_id"), col("source"), col("n_tok").cast("long").as("n_tok"),
          Qf.dround(least(greatest(col("n_tok"), col("lo")), col("hi")), 4).as("clipped"),
          (col("n_tok") < col("lo") || col("n_tok") > col("hi"))
            .cast("int").as("is_outlier"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- hybrid retrieval (RRF)
    // the standard lexical+dense hybrid: BM25 top-20 (d25's scorer)
    // and cosine top-20 for one dense query vector, fused by
    // Reciprocal Rank Fusion (score = Σ 1/(60 + rank)) — rank-based,
    // so the two retrievers' incomparable score scales never need
    // calibration. Both rankings are (rounded score DESC, id) — exact
    // cross-engine — and the fused top-10 re-ranks on the rounded RRF
    // sum with the same id tie-break. The oracle recomputes both
    // retrievers and the fusion from scratch in SQL.
    q("d50_hybrid_rrf", {
      val terms = Seq("spark", "hash", "window", "merge").map(t => s"'$t'").mkString(", ")
      s"""WITH lens AS (SELECT doc_id, CAST(len($sqlTokens) AS DOUBLE) AS dl FROM documents),
         |c AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lens),
         |tf AS (
         |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM (
         |    SELECT doc_id, unnest($sqlTokens) AS term FROM documents)
         |  WHERE term IN ($terms) GROUP BY 1, 2),
         |dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
         |bmr AS (SELECT doc_id,
         |  round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1)
         |    * (tf * (1.2 + 1)) / (tf + 1.2 * ((1 - 0.75) + (0.75 * dl) / avgdl))), 4) AS s
         |  FROM tf JOIN dfq USING (term) JOIN lens USING (doc_id), c GROUP BY doc_id),
         |lex AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS DOUBLE) AS rnk
         |        FROM bmr QUALIFY rnk <= 20),
         |qv AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
         |dn0 AS (SELECT vec_id AS doc_id,
         |  round(list_sum(list_transform(range(1, 65), i -> embedding[i] * v[i]))
         |    / (sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i] * embedding[i])))
         |     * sqrt(list_sum(list_transform(range(1, 65), i -> v[i] * v[i])))), 6) AS s
         |  FROM embeddings, qv WHERE vec_id <> 0),
         |den AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS DOUBLE) AS rnk
         |        FROM dn0 QUALIFY rnk <= 20),
         |rrf AS (SELECT doc_id, round(sum(1.0 / (60 + rnk)), 6) AS rrf_score
         |        FROM (SELECT * FROM lex UNION ALL SELECT * FROM den) GROUP BY doc_id)
         |SELECT doc_id, rrf_score,
         |  CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INTEGER) AS rk
         |FROM rrf ORDER BY rrf_score DESC, doc_id LIMIT 10""".stripMargin
    }) { (s, dir) =>
      import graft.operators.{CurationOps, SimilarityOps}
      val emb = table(s, dir, "embeddings")
      val lex = SimilarityOps.perKeyTopK(
        CurationOps.bm25Scores(table(s, dir, "documents"), "doc_id", "text",
          Seq("spark", "hash", "window", "merge"))
          .select(col("doc_id"), Qf.dround(col("bm25_raw"), 4).as("s")),
        keys = Nil, idCol = "doc_id", scoreCol = "s", asc = false, k = 20)
      val den = SimilarityOps.bruteForceTopK(
        emb.filter(col("vec_id") === 0), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 20)
        .select(col("neighbor_id").as("doc_id"), col("rk"))
      SimilarityOps.rrfFuse(
        Seq(lex.select(col("doc_id"), col("rk")), den),
        keys = Nil, idCol = "doc_id", rankCol = "rk", k = 10)
        .dumpSortedBy(col("rrf_score").desc, col("doc_id"))
    },

    // ---------------------------------------------------------------- persisted dedup ledger
    // incremental-ingest exact dedup AT REST (d38's cross-dedup shape
    // made durable): a parquet digest store of everything ever admitted;
    // each new batch anti-joins the ledger, dedups within itself, and
    // appends only survivors — digests cross the network, never
    // payloads. The oracle mirrors rowFingerprint's netstring encoding
    // (length:value, NULL → \x01) byte for byte.
    q("d39_dedup_ledger",
      """WITH fp AS (SELECT doc_id,
        |  md5(CASE WHEN text IS NULL THEN chr(1)
        |       ELSE CAST(length(text) AS VARCHAR) || ':' || text END) AS dg
        |  FROM documents),
        |led AS (SELECT DISTINCT dg FROM fp WHERE doc_id % 3 <> 0),
        |fresh AS (SELECT f.doc_id, f.dg FROM fp f
        |          LEFT JOIN led l ON f.dg = l.dg WHERE l.dg IS NULL),
        |keep AS (SELECT dg, min(doc_id) AS doc_id FROM fresh GROUP BY dg)
        |SELECT k.doc_id, CAST(length(d.text) AS INTEGER) AS n_chars
        |FROM keep k JOIN documents d ON k.doc_id = d.doc_id
        |ORDER BY k.doc_id""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      // pid-scoped like d41/d45/q66: a concurrent JVM's overwrite of a
      // shared path would race this query's lazy ledger read
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d39_ledger_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      DedupOps.writeLedger(docs.filter(col("doc_id") % 3 =!= 0), "doc_id", Seq("text"), path)
      DedupOps.dedupAgainstLedger(docs, "doc_id", Seq("text"), path)
        .select(col("doc_id"), length(col("text")).cast("int").as("n_chars"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- ledger forget (right-to-be-forgotten)
    // the purge path of the d39 ingest loop: removed digests leave the
    // ledger in one staged swap and the SAME content becomes
    // re-admittable by the next batch — the oracle re-derives the
    // ledger as (admitted digests EXCEPT purged digests) and replays
    // the admission decision, so the hash match proves the removal
    // subtracted exactly the purge list and nothing else.
    q("d71_ledger_forget",
      """WITH fp AS (SELECT doc_id,
        |  md5(CASE WHEN text IS NULL THEN chr(1)
        |       ELSE CAST(length(text) AS VARCHAR) || ':' || text END) AS dg
        |  FROM documents),
        |led0 AS (SELECT DISTINCT dg FROM fp WHERE doc_id % 3 <> 0),
        |rm AS (SELECT DISTINCT dg FROM fp WHERE doc_id % 2 = 0),
        |led AS (SELECT dg FROM led0 EXCEPT SELECT dg FROM rm),
        |fresh AS (SELECT f.doc_id, f.dg FROM fp f
        |          LEFT JOIN led l ON f.dg = l.dg WHERE l.dg IS NULL),
        |keep AS (SELECT dg, min(doc_id) AS doc_id FROM fresh GROUP BY dg)
        |SELECT k.doc_id, CAST(length(d.text) AS INTEGER) AS n_chars
        |FROM keep k JOIN documents d ON k.doc_id = d.doc_id
        |ORDER BY k.doc_id""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d71_forget_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      DedupOps.writeLedger(docs.filter(col("doc_id") % 3 =!= 0), "doc_id", Seq("text"), path)
      DedupOps.removeFromLedger(docs.filter(col("doc_id") % 2 === 0), Seq("text"), path)
      DedupOps.dedupAgainstLedger(docs, "doc_id", Seq("text"), path)
        .select(col("doc_id"), length(col("text")).cast("int").as("n_chars"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- ledger compaction
    // the maintenance half of the d39 ingest loop: each append lands a
    // new small file set, so a long-lived ledger accretes thousands of
    // tiny files and the anti-join scan fans out over all of them.
    // compactLedger rewrites the file set (duplicate digests collapsed
    // to min admitting id, range-partitioned on digest, staged-rename
    // swap) — this query proves the COMPACTED ledger makes byte-
    // identical admission decisions: two generations are written and
    // appended (gen2 re-admits nothing but shares digests with probe
    // rows), compacted in place, then the full corpus dedups against
    // the compacted store. The oracle knows nothing of files — it
    // dedups against the union of both generations' digests, so the
    // check passes only if compaction lost or invented nothing.
    q("d45_ledger_compact",
      """WITH fp AS (SELECT doc_id,
        |  md5(CASE WHEN text IS NULL THEN chr(1)
        |       ELSE CAST(length(text) AS VARCHAR) || ':' || text END) AS dg
        |  FROM documents),
        |led AS (SELECT DISTINCT dg FROM fp WHERE doc_id % 3 = 1 OR doc_id % 3 = 2),
        |fresh AS (SELECT f.doc_id, f.dg FROM fp f
        |          LEFT JOIN led l ON f.dg = l.dg WHERE l.dg IS NULL),
        |keep AS (SELECT dg, min(doc_id) AS doc_id FROM fresh GROUP BY dg)
        |SELECT k.doc_id, CAST(length(d.text) AS INTEGER) AS n_chars
        |FROM keep k JOIN documents d ON k.doc_id = d.doc_id
        |ORDER BY k.doc_id""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d45_ledger_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      DedupOps.writeLedger(docs.filter(col("doc_id") % 3 === 1), "doc_id", Seq("text"), path)
      DedupOps.appendToLedger(docs.filter(col("doc_id") % 3 === 2), "doc_id", Seq("text"), path)
      DedupOps.compactLedger(s, path, targetFiles = 4)
      DedupOps.dedupAgainstLedger(docs, "doc_id", Seq("text"), path)
        .select(col("doc_id"), length(col("text")).cast("int").as("n_chars"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- URL canonicalization
    // the dedup key every web-corpus pipeline computes before content
    // ever loads: fragment dropped, scheme/host lowercased, default
    // port stripped, trailing slashes trimmed, tracking params
    // (utm_*/fbclid/gclid; 'ref' is opt-in via trackingParams — some
    // sites use it to ADDRESS content) removed, surviving params
    // byte-sorted, and percent-encoding normalized (unreserved escapes
    // decode, '%7Ea' ≡ '~a'; others uppercase, '%2fc' ≡ '%2Fc').
    // Schemeless rows (doc_id % 11 = 0) pass through VERBATIM — the
    // keep-garbage policy. The fixture has no URL column, so both
    // sides SYNTHESIZE one per row from doc_id (same m03/m04 pattern:
    // generator is fixture plumbing); the oracle then builds the
    // canonical form from the ground-truth COMPONENTS while the Spark
    // side must PARSE the assembled string — the hash match proves the
    // parser recovers every rule exactly.
    q("d47_url_canonical",
      s"""WITH $sqlUrlFixtureCtes
         |SELECT doc_id, url, canonical, lh AS host FROM canon ORDER BY doc_id""".stripMargin) { (s, dir) =>
      syntheticUrls(table(s, dir, "documents"))
        .withColumn("canonical", graft.operators.TextOps.canonicalUrl(col("url")))
        .withColumn("host", graft.operators.TextOps.urlHost(col("url")))
        .select("doc_id", "url", "canonical", "host")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- canonical-URL dedup
    // the CommonCrawl/C4 "keep one copy per URL" stage: canonical keys
    // from the shared RFC 3986 canonicalizer collapse the
    // scheme-case / default-port / tracking-param / percent-encoding
    // variants of one resource, and the copy kept per key is the
    // argmax-(quality, lowest-id) document — a partial-aggregatable
    // max(struct), so a URL crawled a million times is a hot REDUCE
    // key, never a window sort. The shuffle carries (canonical, score,
    // id) — never text.
    q("d57_url_dedup",
      s"""WITH $sqlUrlFixtureCtes,
         |qual AS (SELECT doc_id,
         |  round(0.5 * (1 - (len(list_filter($sqlTokens, t -> t IN ($stopList))) / len($sqlTokens)))
         |      + 0.5 * least(1.0, len($sqlTokens) / 100.0), 4) AS q
         |  FROM documents),
         |r AS (SELECT c.canonical, c.doc_id, q,
         |    count(*) OVER (PARTITION BY canonical) AS n_dups,
         |    row_number() OVER (PARTITION BY canonical ORDER BY q DESC, c.doc_id) AS rk
         |  FROM canon c JOIN qual USING (doc_id))
         |SELECT canonical, doc_id, q AS quality, n_dups FROM r WHERE rk = 1
         |ORDER BY canonical""".stripMargin) { (s, dir) =>
      import graft.operators.TextOps
      val docs = syntheticUrls(table(s, dir, "documents").select(col("doc_id"), col("text")))
        .select(col("doc_id"), TextOps.canonicalUrl(col("url")).as("canonical"),
          Qf.dround(TextOps.qualityScore(col("text")), 4).as("q"))
      docs.groupBy(col("canonical"))
        .agg(max(struct(col("q").as("q"), (-col("doc_id")).as("nid"))).as("__m"),
          count(lit(1)).as("n_dups"))
        .select(col("canonical"), (-col("__m.nid")).as("doc_id"),
          col("__m.q").as("quality"), col("n_dups"))
        .dumpSorted("canonical")
    },

    // ---------------------------------------------------------------- distinct-count sketch ledger
    // at-rest per-key HLL sketches (built-in Datasketches hll_* family)
    // advanced batch-over-batch — the distinct-count companion to the
    // d39/d41 stats ledger: "how many UNIQUE documents has ingest seen
    // per language" in O(batch), no corpus re-read, no per-digest state.
    // Sketch ESTIMATES have no cross-engine oracle (DuckDB's HLL is a
    // different implementation) and are never hashed — the hash-matched
    // DECISION RELATION (the r15 d119 regime) is the ledger's exact
    // n_docs, the exact distinct count (oracle-expressible), and the
    // per-key verdict that the merged-ledger estimate landed within
    // 10% of exact (2× the AccuracySpec gate's 5%; the datasketches
    // HLL is deterministic → stable verdict). The tight bounds —
    // estimate within 5%, merge within 2% of a single-pass sketch —
    // stay in AccuracySpec; CurationOpsSpec keeps the three-batch
    // advance + crash self-heal.
    q("d46_distinct_ledger",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(DISTINCT text) AS BIGINT) AS n_exact,
        |  TRUE AS est_ok
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d46_sketch_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      graft.operators.CurationOps.writeSketchLedger(docs.filter(col("doc_id") % 2 === 0), "lang", col("text"), path)
      graft.operators.CurationOps.advanceSketchLedger(docs.filter(col("doc_id") % 2 === 1), "lang", col("text"), path)
      val exact = docs.groupBy(col("lang"))
        .agg(countDistinct(col("text")).as("n_exact"))
      graft.operators.CurationOps.sketchEstimates(s, path)
        .join(exact, Seq("lang"))
        .select(col("lang"), col("n_docs"), col("n_exact"),
          (abs(col("approx_distinct").cast("double") - col("n_exact").cast("double"))
            <= lit(0.10) * col("n_exact").cast("double")).as("est_ok"))
        .dumpSorted("lang")
    },

    // ---------------------------------------------------------------- unicode normalization
    // NFC canonicalization via a codegen'd expression over the JDK's
    // java.text.Normalizer — the pass that makes composed é and
    // e+COMBINING ACUTE fingerprint identically before any dedup. The
    // fixture text is ASCII, so the query GRAFTS a decomposed sequence
    // onto every row ('e' + chr(769)); DuckDB's nfc_normalize is the
    // oracle, and the n_raw/n_norm pair proves real composition
    // happened (the char count shrinks by one).
    q("d40_unicode_nfc",
      """SELECT doc_id,
        |  nfc_normalize(substr(text, 1, 24) || 'e' || chr(769)) AS norm,
        |  CAST(length(substr(text, 1, 24) || 'e' || chr(769)) AS INTEGER) AS n_raw,
        |  CAST(length(nfc_normalize(substr(text, 1, 24) || 'e' || chr(769))) AS INTEGER) AS n_norm
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.functions.TextStatsExpression.unicodeNormalize
      val grafted = concat(substring(col("text"), 1, 24), lit("e"), lit("\u0301"))
      table(s, dir, "documents").select(
        col("doc_id"),
        unicodeNormalize(grafted).as("norm"),
        length(grafted).cast("int").as("n_raw"),
        length(unicodeNormalize(grafted)).cast("int").as("n_norm"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- incremental stats ledger
    // Corpus bookkeeping at O(batch) cost: per-source (docs, tokens,
    // chars) aggregates persisted at rest, each ingested batch folded in
    // by union + re-sum — the corpus itself is read once, ever. The
    // oracle recomputes over ALL documents from scratch; the hash match
    // proves merge(ledger, delta) == full recompute exactly.
    q("d41_stats_ledger",
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len($sqlTokens)) AS BIGINT) AS n_tokens,
         |  CAST(sum(length(text)) AS BIGINT) AS n_chars
         |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d41_stats_pid${ProcessHandle.current.pid}" +
          s"_${dir.hashCode.toHexString}")
      graft.operators.CurationOps.writeStatsLedger(docs.filter(col("doc_id") % 5 =!= 0), "source", "text", path)
      graft.operators.CurationOps.mergeStatsLedger(docs.filter(col("doc_id") % 5 === 0), "source", "text", path)
        .dumpSorted("source")
    },

    // ---------------------------------------------------------------- train/val/test split
    // deterministic hash-bucket split assignment: membership-independent
    // (a doc keeps its split as the corpus grows — no held-out leakage
    // across ingests), engine/partitioning/retry-reproducible, zero
    // shuffle. The oracle re-derives the same md5 ppm bucket.
    q("d42_split_assign", {
      val h = s"${sqlHash("CAST(doc_id AS VARCHAR)", "split")} % 1000000"
      s"""SELECT doc_id,
         |  CASE WHEN doc_id IS NULL THEN NULL
         |       WHEN $h < 800000 THEN 'train'
         |       WHEN $h < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"),
          graft.operators.CurationOps.splitAssign(col("doc_id"),
            Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- overlapping chunking
    // RAG/embedding-pipeline splitter: 32-token windows every 16 tokens
    // (50% overlap). Starts are 1, 17, 33, ... while they land on a
    // token; chunk_id orders them. Per-row codegen transform + explode —
    // no shuffle; the chunker feeds the embedding/ANN stages.
    q("d44_chunk_overlap",
      """WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS tok FROM documents),
        |x AS (SELECT doc_id, unnest(range(1, len(tok) + 1, 16)) AS s, tok FROM d)
        |SELECT doc_id, CAST((s - 1) // 16 AS INTEGER) AS chunk_id,
        |  array_to_string(list_slice(tok, s, s + 31), ' ') AS chunk
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), posexplode(
          TextOps.chunkWithOverlap(col("text"), chunkSize = 32, stride = 16))
          .as(Seq("__p", "chunk")))
        .select(col("doc_id"), col("__p").cast("int").as("chunk_id"), col("chunk"))
        .orderBy("doc_id", "chunk_id")
    },

    // ---------------------------------------------------------------- corpus snapshot diff
    // added/removed/changed/unchanged between two corpus generations by
    // content digest — payloads never shuffle, only (id, md5). The two
    // generations are deterministic slices of `documents` (old: id%7≠0;
    // new: id%5≠0 with id%11=0 texts rewritten) so the oracle can diff
    // the raw text with IS DISTINCT FROM; the digest compare must
    // classify identically (rowFingerprint is NULL-injective).
    q("d43_corpus_diff",
      """WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT doc_id,
        |        CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END AS text
        |      FROM documents WHERE doc_id % 5 <> 0)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text IS DISTINCT FROM n.text THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
      val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 11 === 0, upper(col("text"))).otherwise(col("text")))
      DedupOps.corpusDiff(oldSnap, newSnap, "doc_id", Seq("text"))
        .orderBy("doc_id")
    },

    q("d09_simhash", {
      val bits = (0 until 16).map { j =>
        s"""(CASE WHEN list_sum(list_transform(tok,
           |    t -> CASE WHEN ((${sqlHash("t", "")} >> $j) & 1) = 1 THEN 1 ELSE -1 END)) > 0
           |  THEN ${1 << j} ELSE 0 END)""".stripMargin
      }.mkString(" + ")
      s"""WITH d AS (SELECT doc_id, $sqlTokens AS tok FROM documents)
         |SELECT doc_id, CAST($bits AS INTEGER) AS simhash
         |FROM d ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      DedupOps.simHash16Df(table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    q("d10_ngram_jaccard",
      """WITH d AS (SELECT doc_id, list_distinct(string_split(trim(text), ' ')) AS tok FROM documents)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  round(len(list_intersect(a.tok, b.tok)) / len(list_distinct(list_concat(a.tok, b.tok))), 4) AS jaccard
        |FROM d a JOIN d b ON a.doc_id % 97 = 0 AND b.doc_id > a.doc_id
        |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      // tokenize + sort each side ONCE before the pair join; the per-pair
      // kernel is then a zero-allocation sorted merge-count
      // (IntersectCountS) instead of array_intersect + array_union's two
      // hash-set builds per pair — the r1 bench hotspot (60s → ~s).
      // |∩|/(|a|+|b|−|∩|) ≡ |∩|/|∪| on sets, so the oracle is unchanged.
      //
      // EXACT duplicate collapse (r8, the same argument as the r7 LSH
      // collapse): jaccard is a function of the token SETS alone, so the
      // merge-count kernel runs once per DISTINCT (set_a, set_b) pair —
      // grouped by the sorted-array VALUE, no digest, no collision risk
      // — and member pairs expand back through two linear equi-joins on
      // that value, with the id predicate applied on the expanded rows.
      // A boilerplate-saturated corpus (many identical token sets) now
      // scores each set pair once instead of once per document pair;
      // the only quadratic object left is the OUTPUT.
      val tok = array_sort(array_distinct(graft.operators.TextOps.tokens(col("text"))))
      val a = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("d1"), tok.as("__ta"))
      val b = docs.select(col("doc_id").as("d2"), tok.as("__tb"))
      // anchor side is id-sampled (~1/97 of the corpus) → its distinct
      // sets broadcast; every distinct b-set scores against them once.
      // BROADCAST BOUND: the build side carries full token ARRAYS (not
      // digests) for the distinct anchor sets — bounded here by the
      // 1/97 sample, and inherent to this CONFORMANCE query's declared
      // all-pairs-rescore semantics, not to the operator; the
      // production near-dup path is LSH candidates → sortedJaccard
      // (d13), which never broadcasts token sets.
      // The expansion joins are NULL-SAFE: the oracle's pair join has no
      // predicate on tok, so a NULL-text document still pairs (with NULL
      // jaccard) — a plain equi-join on the set value would drop it.
      val rep = b.select(col("__tb")).distinct()
        .join(broadcast(a.select(col("__ta")).distinct()))
        .select(col("__ta"), col("__tb"),
          Qf.dround(graft.operators.DedupOps.sortedJaccard(col("__ta"), col("__tb")), 4)
            .as("jaccard"))
      rep.as("r")
        .join(broadcast(a).as("aa"), col("r.__ta") <=> col("aa.__ta"))
        .join(b.as("bb"), col("r.__tb") <=> col("bb.__tb"))
        .filter(col("d2") > col("d1"))
        .select(col("d1"), col("d2"), col("jaccard"))
        .orderBy("d1", "d2")
    },

    // ---------------------------------------------------------------- containment rescoring
    // Asymmetric CONTAINMENT |∩|/min(|A|,|B|) (Broder 1997) next to
    // Jaccard on the SAME d08 LSH candidate pairs: the doc-inside-doc
    // signal a Jaccard-only gate structurally misses (small doc pasted
    // into a big one → tiny Jaccard, containment ~1). Candidates come
    // from banding — never all-pairs — and the merge-count kernel runs
    // ONCE per pair (both measures derive from the one |∩| column).
    // 100 TB: identical bound to d10 — the quadratic object is the
    // candidate set, and the token arrays ship only to candidate rows.
    q("d113_containment_rescore", {
      def bucket(b: Int) = (0 until 4).map(r => s"CAST(mh${b * 4 + r} AS VARCHAR)")
        .mkString("md5(", " || '_' || ", ")")
      s"""WITH sh AS (SELECT doc_id, $sqlHashedShingles AS hs FROM documents),
         |sig AS (SELECT doc_id, $sqlMh8 FROM sh),
         |bands AS (
         |  SELECT doc_id, 0 AS band, ${bucket(0)} AS bucket FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, ${bucket(1)} AS bucket FROM sig),
         |pairs AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |tok AS (SELECT doc_id, list_distinct(string_split(trim(text), ' ')) AS t
         |        FROM documents),
         |scored AS (
         |  SELECT p.d1, p.d2,
         |    round(len(list_intersect(ta.t, tb.t)) / least(len(ta.t), len(tb.t)), 4)
         |      AS containment,
         |    round(len(list_intersect(ta.t, tb.t))
         |      / (len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t))), 4)
         |      AS jaccard
         |  FROM pairs p
         |  JOIN tok ta ON ta.doc_id = p.d1
         |  JOIN tok tb ON tb.doc_id = p.d2)
         |SELECT * FROM scored WHERE containment >= 0.5
         |ORDER BY d1, d2""".stripMargin
    }) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val pairs = DedupOps.lshCandidatePairs(docs, "doc_id", "text",
        numHashes = 8, bandSize = 4, shingleSize = 5).select("d1", "d2")
      val tok = docs.select(col("doc_id"),
        array_sort(array_distinct(graft.operators.TextOps.tokens(col("text")))).as("__t"))
      pairs
        .join(tok.select(col("doc_id").as("d1"), col("__t").as("__ta")), "d1")
        .join(tok.select(col("doc_id").as("d2"), col("__t").as("__tb")), "d2")
        // one kernel pass per pair; both measures derive from |∩|
        .withColumn("__ic",
          graft.functions.VectorExpressions.intersectCountSorted(col("__ta"), col("__tb")))
        .select(col("d1"), col("d2"),
          Qf.dround(col("__ic") / least(size(col("__ta")), size(col("__tb"))), 4)
            .as("containment"),
          Qf.dround(col("__ic") /
            (size(col("__ta")) + size(col("__tb")) - col("__ic")), 4)
            .as("jaccard"))
        .filter(col("containment") >= 0.5)
        .orderBy("d1", "d2")
    },

    // ---------------------------------------------------------------- similarity search
    q("s01_cosine_topk",
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    round(list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i]))
        |      / (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])))
        |       * sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))), 6) AS score
        |  FROM q, c WHERE query_id <> neighbor_id),
        |ranked AS (SELECT query_id, neighbor_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INTEGER) AS rk
        |  FROM scored)
        |SELECT query_id, neighbor_id, score, rk FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      SimilarityOps.bruteForceTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5)
        .dumpSorted("query_id", "rk")
    },

    // ---------------------------------------------------------------- kNN label agreement
    // Intrinsic embedding QA: fraction of each probe vector's k nearest
    // neighbors sharing its label. Probe sample broadcast, corpus
    // streamed once through the bounded heap; neighbor labels attach by
    // broadcasting the (probe × k) table against the corpus' 2-column
    // label projection — the corpus never shuffles (see
    // SimilarityOps.knnLabelAgreement).
    q("s24_knn_label_agreement",
      """WITH q AS (SELECT vec_id AS query_id, label AS ql, embedding AS qv
        |           FROM embeddings WHERE vec_id % 5 = 0),
        |c AS (SELECT vec_id AS neighbor_id, label AS nl, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, ql, neighbor_id, nl,
        |    round(list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i]))
        |      / (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])))
        |       * sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))), 6) AS score
        |  FROM q, c WHERE query_id <> neighbor_id),
        |ranked AS (SELECT query_id, ql, nl, score,
        |  row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk
        |  FROM scored)
        |SELECT query_id, ql AS query_label,
        |  round(avg(CASE WHEN nl = ql THEN 1.0 ELSE 0.0 END), 4) AS knn_agree
        |FROM ranked WHERE rk <= 10
        |GROUP BY query_id, ql ORDER BY query_id""".stripMargin) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      SimilarityOps.knnLabelAgreement(
        emb.filter(col("vec_id") % 5 === 0), "vec_id", "embedding", "label",
        emb, "vec_id", "embedding", "label", k = 10)
        .orderBy("query_id")
    },

    // ---------------------------------------------------------------- bitext mining
    // Margin-based parallel-corpus mining (Artetxe & Schwenk 2019, the
    // LASER/CCMatrix miner): en docs as source, de docs as target in
    // the shared embedding space (lang from documents, vector from
    // embeddings, joined on id). Ratio margin over forward ∪ backward
    // top-4 candidates, argmax target per source. The oracle replays
    // the whole margin algebra in CTEs — hash match pins candidates,
    // averages, ratio, and the tie-break.
    q("s23_bitext_margin", {
      def cos(a: String, b: String) =
        s"""round(list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))
           |  / (sqrt(list_sum(list_transform(range(1, 65), i -> $a[i] * $a[i])))
           |   * sqrt(list_sum(list_transform(range(1, 65), i -> $b[i] * $b[i])))), 6)""".stripMargin
      s"""WITH e AS (SELECT d.lang, v.vec_id, v.embedding
         |           FROM documents d JOIN embeddings v ON v.vec_id = d.doc_id),
         |s AS (SELECT vec_id AS src_id, embedding AS sv FROM e WHERE lang = 'en'),
         |t AS (SELECT vec_id AS tgt_id, embedding AS tv FROM e WHERE lang = 'de'),
         |sc AS (SELECT src_id, tgt_id, ${cos("sv", "tv")} AS score FROM s, t),
         |fr AS (SELECT src_id, tgt_id, score,
         |  row_number() OVER (PARTITION BY src_id ORDER BY score DESC, tgt_id) AS rk FROM sc),
         |br AS (SELECT src_id, tgt_id, score,
         |  row_number() OVER (PARTITION BY tgt_id ORDER BY score DESC, src_id) AS rk FROM sc),
         |fa AS (SELECT src_id, avg(score) AS fa FROM fr WHERE rk <= 4 GROUP BY 1),
         |ba AS (SELECT tgt_id, avg(score) AS ba FROM br WHERE rk <= 4 GROUP BY 1),
         |cand AS (SELECT src_id, tgt_id, score FROM fr WHERE rk <= 4
         |         UNION SELECT src_id, tgt_id, score FROM br WHERE rk <= 4),
         |m AS (SELECT c.src_id, c.tgt_id, c.score,
         |        round(c.score / ((fa.fa + ba.ba) / 2), 4) AS margin
         |      FROM cand c JOIN fa USING (src_id) JOIN ba USING (tgt_id)),
         |best AS (SELECT src_id, tgt_id, score, margin,
         |  row_number() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rk FROM m)
         |SELECT src_id, tgt_id, score, margin FROM best WHERE rk = 1
         |ORDER BY src_id""".stripMargin
    }) { (s, dir) =>
      val byLang = table(s, dir, "documents").select(col("doc_id"), col("lang"))
        .join(table(s, dir, "embeddings"), col("vec_id") === col("doc_id"))
      SimilarityOps.marginBitextMine(
        byLang.filter(col("lang") === "en"), "vec_id", "embedding",
        byLang.filter(col("lang") === "de"), "vec_id", "embedding", k = 4)
        .orderBy("src_id")
    },

    q("s02_ann_buckets", {
      val planes = SimilarityOps.hyperplanes(4, 64)
      val planeCols = planes.zipWithIndex.map { case (p, j) =>
        s"[${p.mkString(", ")}]::DOUBLE[] AS pl$j"
      }.mkString(",\n  ")
      val bits = (0 until 4).map { j =>
        s"(CASE WHEN list_sum(list_transform(range(1, 65), i -> embedding[i] * pl$j[i])) > 0 THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH p AS (SELECT
         |  $planeCols)
         |SELECT vec_id, CAST($bits AS INTEGER) AS bucket
         |FROM embeddings, p ORDER BY vec_id""".stripMargin
    }) { (s, dir) =>
      val planes = SimilarityOps.hyperplanes(4, 64)
      table(s, dir, "embeddings")
        .select(col("vec_id"),
          SimilarityOps.hyperplaneBucket(col("embedding"), planes).as("bucket"))
        .orderBy("vec_id")
    },

    q("s03_ann_topk", sqlAnnTopkOracle) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      SimilarityOps.annTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5, numPlanes = 4, dim = 64)
        .dumpSorted("query_id", "rk")
    },

    // ---------------------------------------------------------------- maintained ANN index
    // the at-rest index's INGEST LOOP: build from half the corpus,
    // append the other half (plus a crash-and-retry REPLAY of that
    // append), compact (collapses the duplicate rows, one file per
    // bucket, staged swap), then probe. The oracle is s03's — file-
    // and maintenance-blind, bucketing the whole corpus from scratch —
    // so the hash match proves the append/replay/compact cycle lost
    // and invented nothing. The index is self-describing: a probe or
    // append with drifted (numPlanes, dim) fails loudly (unit-tested).
    q("s12_ann_index_maintained", sqlAnnTopkOracle) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/s12_idx_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      val odds = emb.filter(col("vec_id") % 2 === 1)
      SimilarityOps.writeBucketedIndex(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", 4, 64, path)
      SimilarityOps.appendToBucketedIndex(odds, "vec_id", "embedding", 4, 64, path,
        batchId = Some("odds-1"))
      // replay: exactly-once marker no-op (unmarked tolerance is
      // unit-covered via compaction's duplicate collapse)
      SimilarityOps.appendToBucketedIndex(odds, "vec_id", "embedding", 4, 64, path,
        batchId = Some("odds-1"))
      SimilarityOps.compactBucketedIndex(s, path)
      SimilarityOps.probeBucketedIndex(s, path,
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        "vec_id", "embedding", numPlanes = 4, dim = 64, k = 5)
        .dumpSorted("query_id", "rk")
    },

    // ---------------------------------------------------------------- ANN index deletes
    // the missing CRUD op of the maintained index: delete ids WITHOUT a
    // rewrite — O(batch) tombstone rows in the reserved bucket=-1
    // partition (real buckets are ≥ 0, so probes' partition pruning
    // never selects it for scoring), applied by every probe as a
    // broadcast anti-join, made physical at compaction. The oracle is
    // the same file-blind from-scratch ANN SQL with the candidate set
    // restricted to the surviving ids — the hash match proves the
    // tombstones subtract exactly the deleted ids and nothing else,
    // THROUGH the live (uncompacted) path. Compact-equals-live is
    // pinned separately in OperatorsSpec.
    q("s17_ann_index_deletes", annTopkOracle("vec_id % 2 = 0")) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/s17_del_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      SimilarityOps.writeBucketedIndex(emb, "vec_id", "embedding", 4, 64, path)
      SimilarityOps.deleteFromBucketedIndex(s, path,
        emb.filter(col("vec_id") % 2 =!= 0).select(col("vec_id")),
        "vec_id", "embedding")
      SimilarityOps.probeBucketedIndex(s, path,
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        "vec_id", "embedding", numPlanes = 4, dim = 64, k = 5)
        .dumpSorted("query_id", "rk")
    },

    // ---------------------------------------------------------------- IVFPQ index maintenance cycle
    // the s17 CRUD story completed for the SECOND at-rest ANN family:
    // build the IVFPQ index from the even half, append the odd half
    // with the frozen model, tombstone-delete every vec_id % 3 == 0
    // (plus a crash-and-retry replay of the delete), compact (dead
    // codes and the tombstone partition physically disappear, each
    // cell rewritten to one sized file), then probe. The model-
    // dependent answer is never hashed; PlanShapeSpec pins
    // row-identity with the live annTopK over the surviving corpus
    // before AND after compaction, plus the partition-pruned probe
    // shape. r16: hash-matched via the s04 decision relation — the
    // exact side is the brute-force top-k over the SURVIVING corpus
    // (the delete predicate is oracle-replayable) + the recall
    // verdict at half the s08-family gate.
    q("s19_ivfpq_maintenance", exactTopkRecallOracle("vec_id % 3 <> 0")) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      val model = cachedModel(s, s"ivfpq:res:kc8:m8:k32:i5:$dir")(
        graft.operators.IvfPq.train(emb, "embedding",
          kc = 8, m = 8, k = 32, iters = 5, residual = true))
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/s19_ivfpq_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      graft.operators.IvfPq.writeIndex(
        emb.filter(col("vec_id") % 2 === 0), "vec_id", "embedding", model, path)
      graft.operators.IvfPq.appendToIndex(
        emb.filter(col("vec_id") % 2 =!= 0), "vec_id", "embedding", path,
        preloadedModel = Some(model)) // bit-identical to the stored model
      val dead = emb.filter(col("vec_id") % 3 === 0).select(col("vec_id"))
      graft.operators.IvfPq.deleteFromIndex(s, path, dead, "vec_id")
      graft.operators.IvfPq.deleteFromIndex(s, path, dead, "vec_id") // replay
      graft.operators.IvfPq.compactIndex(s, path)
      val queries = emb.filter(col("vec_id") < 8)
      annRecallRelation(
        cachedExactTopK(s, dir, "mod3", Some(col("vec_id") % 3 =!= 0)),
        graft.operators.IvfPq.probeIndex(s, path,
          queries, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 5, nprobe = 6, rerank = 100,
          preloadedModel = Some(model)), // loadModel round-trips bit-exactly
        minRecall = 0.425) // half the 0.85 s08-family gate
    },

    // ---------------------------------------------------------------- int8 scalar-quantized search
    // the faiss-SQ8 regime: approximate ranking on 4×-smaller int8
    // codes (integer dot products, scales cancel in cosine), 4k
    // candidates per query, exact float re-rank. Quantization is
    // engine-specific and never hashed; the AccuracySpec gate bounds
    // recall vs brute force and pins score parity on common pairs
    // (proving the re-rank is the exact cosine).
    // r16 graduation: hash-matched via the s04 decision relation —
    // exact side + corpus-level recall verdict at half the 0.9 gate.
    q("s13_sq8_topk", sqlExactTopkRecallOracle) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      annRecallRelation(
        cachedExactTopK(s, dir, "full"),
        SimilarityOps.quantizedTopK(queries, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 5),
        minRecall = 0.45) // half the 0.9 AccuracySpec gate
    },

    // ---------------------------------------------------------------- SQ8 index at rest
    // s13's at-rest form: codes stored as first-class parquet columns,
    // so the approximate pass scans (id, q) ALONE — column pruning
    // delivers the 4× scan-byte cut (PlanShapeSpec pins the pruned
    // ReadSchema), and the re-rank fetches only candidates' floats.
    // Rows are identical to s13 by construction (AccuracySpec pins it).
    // r16: hash-matched via the s04 decision relation — exact side +
    // corpus-level recall verdict at half the s13-family gate.
    q("s14_sq8_at_rest", sqlExactTopkRecallOracle) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/s14_sq8_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      SimilarityOps.writeQuantizedCorpus(emb, "vec_id", "embedding", path)
      val queries = emb.filter(col("vec_id") < 8)
      annRecallRelation(
        cachedExactTopK(s, dir, "full"),
        SimilarityOps.quantizedTopKAtRest(s, path,
          queries, "vec_id", "embedding", "vec_id", k = 5),
        minRecall = 0.45) // half the 0.9 s13-family gate
    },

    // ---------------------------------------------------------------- multimodal plumbing
    q("m01_multimodal_meta",
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |  CAST(octet_length(CAST(text AS BLOB)) % 640 AS INTEGER) AS width,
        |  CAST(octet_length(CAST(text AS BLOB)) % 480 AS INTEGER) AS height,
        |  3 AS channels,
        |  CASE WHEN octet_length(CAST(text AS BLOB)) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
        |  md5(text) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val withBin = table(s, dir, "documents")
        .withColumn("__bin", col("text").cast("binary"))
      val meta = MultimodalOps.fakeImageMeta(col("__bin"))
      withBin.select(
        col("doc_id"),
        length(col("__bin")).cast("int").as("n_bytes"),
        meta.getField("width").as("width"),
        meta.getField("height").as("height"),
        meta.getField("channels").as("channels"),
        meta.getField("format").as("format"),
        md5(col("text")).as("content_hash"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- corpus curation: stratified sample
    // per-stratum deterministic sampling (balance languages in a training
    // mix): hash-mod with a per-lang quota — df.stat.sampleBy is RNG-based
    // and never portable; this is the reproducible form (same trick as q45)
    q("d14_stratified_sample",
      s"""SELECT doc_id, lang FROM documents
         |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100
         |      < CASE lang WHEN 'en' THEN 50 ELSE 10 END
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val quota = when(col("lang") === "en", 50).otherwise(10)
      table(s, dir, "documents")
        .filter(DedupOps.md5Hash32(col("doc_id").cast("string"), "") % 100 < quota)
        .select(col("doc_id"), col("lang"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- corpus curation: best-k per group
    q("d15_quality_topk",
      s"""WITH scored AS (
         |  SELECT doc_id, lang, source,
         |    round(0.5 * (1 - (len(list_filter($sqlTokens, t -> t IN ($stopList))) / len($sqlTokens)))
         |        + 0.5 * least(1.0, len($sqlTokens) / 100.0), 4) AS quality
         |  FROM documents),
         |ranked AS (
         |  SELECT doc_id, lang, source, quality,
         |    CAST(row_number() OVER (PARTITION BY lang, source
         |      ORDER BY quality DESC, doc_id) AS INTEGER) AS rk
         |  FROM scored)
         |SELECT doc_id, lang, source, quality, rk FROM ranked WHERE rk <= 3
         |ORDER BY lang, source, rk""".stripMargin) { (s, dir) =>
      // best-k per STRATUM: strata are corpus-sized groups, so ranking
      // runs through the bounded-heap aggregate (partial ≤k buffers),
      // not a window that sorts each stratum in full
      val scored = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          Qf.dround(TextOps.qualityScore(col("text")), 4).as("quality"))
      SimilarityOps.perKeyTopK(scored, Seq("lang", "source"), "doc_id", "quality",
          asc = false, k = 3)
        .select(col("doc_id"), col("lang"), col("source"), col("quality"), col("rk"))
        .dumpSorted("lang", "source", "rk")
    },

    // ---------------------------------------------------------------- corpus analysis: length histogram
    q("d16_length_histogram",
      s"""SELECT CAST(len($sqlTokens) // 50 AS BIGINT) AS bin,
         |  CAST(len($sqlTokens) // 50 * 50 AS BIGINT) AS bin_lo,
         |  count(*) AS n_docs,
         |  CAST(min(len($sqlTokens)) AS INTEGER) AS min_tokens,
         |  CAST(max(len($sqlTokens)) AS INTEGER) AS max_tokens
         |FROM documents GROUP BY 1, 2 ORDER BY bin""".stripMargin) { (s, dir) =>
      val n = TextOps.tokenCount(col("text"))
      table(s, dir, "documents")
        .select(floor(n / 50).as("bin"), (floor(n / 50) * 50).as("bin_lo"), n.as("__n"))
        .groupBy(col("bin"), col("bin_lo"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("__n")).cast("int").as("min_tokens"),
          max(col("__n")).cast("int").as("max_tokens"))
        .dumpSorted("bin")
    },

    // ---------------------------------------------------------------- multimodal feature extraction
    // fused one-pass byte histogram (ByteHistogram native expression) as
    // the deterministic stand-in for image/audio feature extraction —
    // integer counts, so the result is oracle-exact. Shape: explode the
    // 16-bucket vector + partial-agg pivot (evaluating the histogram once
    // per row; 16 getItem projections would re-run it 16× under
    // CollapseProject).
    q("m02_multimodal_features", {
      val hs = (0 until 16).map(b =>
        s"CAST(len(list_filter(codes, c -> c // 16 = $b)) AS INTEGER) AS h$b").mkString(",\n  ")
      // byte-based oracle (hex(encode(..)) 2-char slices → byte ints) so it
      // agrees with the Spark side's UTF-8 byte histogram on NON-ASCII text
      // too; a per-character ascii() oracle diverges on any multi-byte char
      s"""SELECT doc_id,
         |  $hs
         |FROM (SELECT doc_id,
         |        list_transform(range(1, octet_length(encode(text)) + 1),
         |                       i -> CAST('0x' || substr(hx, 2*i-1, 2) AS INTEGER)) AS codes
         |      FROM (SELECT doc_id, hex(encode(text)) AS hx, text FROM documents))
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val hist = graft.functions.VectorExpressions.byteHistogram(col("text").cast("binary"), 16)
      val aggs = (0 until 16).map(b =>
        max(when(col("b") === b, col("cnt"))).cast("int").as(s"h$b"))
      table(s, dir, "documents")
        .select(col("doc_id"), posexplode(hist).as(Seq("b", "cnt")))
        .groupBy(col("doc_id"))
        .agg(aggs.head, aggs.tail: _*)
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- multimodal REAL image decode
    // genuine PNG/JPEG payloads (synthesized per row with the JDK's own
    // ImageIO encoder — dimensions derive from doc_id) pushed through the
    // decodePartitioned seam with the REAL javax.imageio decoder. The
    // oracle knows width/height/channels/format BY CONSTRUCTION, so the
    // actual header+pixel parse is hash-checked end to end. The generator
    // UDF is fixture plumbing, not a hot-path operator: production rows
    // arrive with the binary column already populated.
    q("m03_image_decode",
      """SELECT doc_id,
        |  CAST(8 + doc_id % 32 AS INTEGER) AS width,
        |  CAST(8 + doc_id % 16 AS INTEGER) AS height,
        |  3 AS channels,
        |  CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // payload content depends only on doc_id % 32 (which also fixes
      // w/h/format), so the generator draws from 32 distinct images —
      // memoized per executor; the oracle checks dims+format either way
      val gen = udf((m: Long) => MultimodalOps.syntheticImageCached(
        m, (8 + m % 32).toInt, (8 + m % 16).toInt,
        if (m % 2 == 0) "png" else "jpg"))
      val imgs = table(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id") % 32).as("img"))
      MultimodalOps.decodePartitioned(imgs, "img", MultimodalOps.imageIoHeader)
        .select(col("doc_id"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.channels").as("channels"),
          col("meta.format").as("format"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- multimodal REAL audio metadata
    // genuine WAV payloads (16-bit PCM synthesized per row with the JDK's
    // own javax.sound.sampled writer — header fields derive from doc_id)
    // pushed through the audioMetaPartitioned seam with the REAL
    // javax.sound.sampled header parser. The oracle knows sample rate /
    // channels / frames BY CONSTRUCTION, so the RIFF header parse is
    // hash-checked end to end without the parser ever seeing the answer.
    q("m04_audio_meta",
      """SELECT doc_id,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |       WHEN 2 THEN 22050 ELSE 44100 END AS INTEGER) AS sample_rate,
        |  CAST(1 + doc_id % 2 AS INTEGER) AS channels,
        |  16 AS bits,
        |  CAST(100 + doc_id % 32 AS BIGINT) AS frames,
        |  'wav' AS container
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // every header field is a function of m = doc_id % 32, so the
      // generator draws from 32 distinct payloads — memoized per executor
      val gen = udf((m: Long) => MultimodalOps.syntheticWavCached(
        m,
        (m % 4) match { case 0 => 8000; case 1 => 16000; case 2 => 22050; case _ => 44100 },
        (1 + m % 2).toInt, (100 + m).toInt))
      val wavs = table(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id") % 32).as("wav"))
      MultimodalOps.audioMetaPartitioned(wavs, "wav")
        .select(col("doc_id"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.channels").as("channels"),
          col("meta.bits").as("bits"),
          col("meta.frames").as("frames"),
          col("meta.container").as("container"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- multimodal: video container metadata
    // ISO-BMFF (MP4) box-header walk — moov/mvhd duration+timescale,
    // trak count, first tkhd width/height (16.16 fixed point) — via the
    // partitioned seam; frame decode is out of scope by design (mdat is
    // opaque). Every field is a function of m = doc_id % 42, so the
    // fixture generator draws from 42 distinct hand-written box
    // layouts, memoized per executor, and the oracle re-derives the
    // fields arithmetically: the check passes only if the generator's
    // byte layout and the parser's walk agree on every field.
    q("m05_video_meta",
      """SELECT doc_id,
        |  CAST(1000 + doc_id % 7 * 500 AS BIGINT) AS duration_ms,
        |  1000 AS timescale,
        |  CAST(640 + doc_id % 3 * 320 AS INTEGER) AS width,
        |  CAST(360 + doc_id % 3 * 180 AS INTEGER) AS height,
        |  CAST(1 + doc_id % 2 AS INTEGER) AS n_tracks,
        |  'mp4' AS container
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val gen = udf((m: Long) => MultimodalOps.syntheticMp4Cached(
        m, 1000 + (m % 7) * 500, 1000,
        (640 + (m % 3) * 320).toInt, (360 + (m % 3) * 180).toInt,
        (1 + m % 2).toInt))
      val mp4s = table(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id") % 42).as("mp4"))
      MultimodalOps.videoMetaPartitioned(mp4s, "mp4")
        .select(col("doc_id"),
          col("meta.duration_ms").as("duration_ms"),
          col("meta.timescale").as("timescale"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.n_tracks").as("n_tracks"),
          col("meta.container").as("container"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- as-of join (custom operator)
    q("q35_asof_join",
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, max(event_id) AS click_id FROM ev WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.purchase_id, p.user_id, c.click_id
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.purchase_id""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
      AsOfJoin.backward(purchases, clicks, "user_id", "ts", "ts", Seq("click_id"))
        .select(col("purchase_id"), col("user_id"), col("click_id"))
        .orderBy("purchase_id")
    },

    // ---------------------------------------------------------------- as-of join: forward direction
    q("q50_asof_forward",
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, max(event_id) AS click_id FROM ev WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.purchase_id, p.user_id, c.click_id
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
        |ORDER BY p.purchase_id""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
      AsOfJoin.forward(purchases, clicks, "user_id", "ts", "ts", Seq("click_id"))
        .select(col("purchase_id"), col("user_id"), col("click_id"))
        .orderBy("purchase_id")
    },

    // ---------------------------------------------------------------- as-of join: tolerance window
    q("q51_asof_tolerance",
      """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events),
        |p AS (SELECT event_id AS purchase_id, user_id, ts FROM ev WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, max(event_id) AS click_id FROM ev WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.purchase_id, p.user_id,
        |  CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL 1 HOUR THEN c.click_id END AS click_id
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.purchase_id""".stripMargin) { (s, dir) =>
      val ev = table(s, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("click_id"))
      AsOfJoin.backward(purchases, clicks, "user_id", "ts", "ts", Seq("click_id"),
          tolerance = Some(3600.0))
        .select(col("purchase_id"), col("user_id"), col("click_id"))
        .orderBy("purchase_id")
    },

    // ---------------------------------------------------------------- simhash near-dup pairs (banded hamming join)
    q("d12_simhash_pairs", {
      val bits = (0 until 16).map { j =>
        s"""(CASE WHEN list_sum(list_transform(tok,
           |    t -> CASE WHEN ((${sqlHash("t", "")} >> $j) & 1) = 1 THEN 1 ELSE -1 END)) > 0
           |  THEN ${1 << j} ELSE 0 END)""".stripMargin
      }.mkString(" + ")
      s"""WITH d AS (SELECT doc_id, $sqlTokens AS tok FROM documents),
         |h AS (SELECT doc_id, CAST($bits AS INTEGER) AS simhash FROM d)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         |FROM h a JOIN h b ON (a.simhash >> 8) = (b.simhash >> 8) AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
         |ORDER BY hamming, d1, d2 LIMIT 100""".stripMargin
    }) { (s, dir) =>
      // band on the high 8 simhash bits: candidate pairs share a band
      // (one equi-join shuffle), then exact Hamming rescoring — the
      // SimHash analog of the MinHash LSH pipeline. simHashPairs joins
      // one representative per distinct hash (exact; mega-bucket safe)
      DedupOps.simHashPairs(table(s, dir, "documents"), "doc_id", "text",
        maxHamming = 6, bandShift = 8)
        .orderBy(col("hamming"), col("d1"), col("d2"))
        .limit(100)
    },

    // ---------------------------------------------------------------- embedding-cosine near-dup (dedup family)
    q("d11_embedding_neardup", {
      val planes = SimilarityOps.hyperplanes(4, 64)
      val planeCols = planes.zipWithIndex.map { case (p, j) =>
        s"[${p.mkString(", ")}]::DOUBLE[] AS pl$j"
      }.mkString(",\n  ")
      val bits = (0 until 4).map { j =>
        s"(CASE WHEN list_sum(list_transform(range(1, 65), i -> embedding[i] * pl$j[i])) > 0 THEN ${1 << j} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH p AS (SELECT
         |  $planeCols),
         |e AS (SELECT vec_id, embedding, CAST($bits AS INTEGER) AS bucket FROM embeddings, p),
         |pairs AS (
         |  SELECT a.vec_id AS d1, b.vec_id AS d2,
         |    round(list_sum(list_transform(range(1, 65), i -> a.embedding[i] * b.embedding[i]))
         |      / (sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i] * a.embedding[i])))
         |       * sqrt(list_sum(list_transform(range(1, 65), i -> b.embedding[i] * b.embedding[i])))), 6) AS score
         |  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT d1, d2, score FROM pairs WHERE score >= 0.25
         |ORDER BY score DESC, d1, d2 LIMIT 100""".stripMargin
    }) { (s, dir) =>
      val planes = SimilarityOps.hyperplanes(4, 64)
      val e = table(s, dir, "embeddings").select(col("vec_id"), col("embedding"),
        SimilarityOps.hyperplaneBucket(col("embedding"), planes).as("bucket"))
      // EXACT duplicate collapse (r8, the semDedup r7 treatment): the
      // bucket AND the cosine are functions of the vector VALUE alone,
      // so the bucket self-join and the dot-product kernel run over one
      // row per DISTINCT vector (grouped by value — no digest), the
      // score threshold prunes at the representative level, and member
      // pairs expand back through two linear equi-joins on the vector
      // value with the id ordering applied on expanded rows. Both
      // directions survive at the representative level (no d1<d2 there),
      // so each expanded (d1, d2) pair matches exactly one rep row —
      // original multiplicity, hash-identical output.
      val dv = e.select(col("embedding"), col("bucket")).distinct()
      val rep = dv.select(col("embedding").as("__ea"), col("bucket"))
        .join(dv.select(col("embedding").as("__eb"), col("bucket")), Seq("bucket"))
        .select(col("__ea"), col("__eb"),
          Qf.dround(SimilarityOps.cosine(col("__ea"), col("__eb")), 6).as("score"))
        .filter(col("score") >= 0.25)
      rep.join(e.select(col("vec_id").as("d1"), col("embedding").as("__ea")), Seq("__ea"))
        .join(e.select(col("vec_id").as("d2"), col("embedding").as("__eb")), Seq("__eb"))
        .filter(col("d1") < col("d2"))
        .select(col("d1"), col("d2"), col("score"))
        .orderBy(col("score").desc, col("d1"), col("d2"))
        .limit(100)
    },

    // ---------------------------------------------------------------- end-to-end near-dup pipeline
    // the full production dedup flow in ONE plan: MinHash signatures →
    // LSH banding → candidate pairs (bucketed equi-join, never all-pairs)
    // → exact Jaccard rescoring on candidates only → threshold
    q("d13_dedup_pipeline", {
      def bucket(b: Int) = (0 until 4).map(r => s"CAST(mh${b * 4 + r} AS VARCHAR)")
        .mkString("md5(", " || '_' || ", ")")
      s"""WITH sh AS (SELECT doc_id, $sqlHashedShingles AS hs FROM documents),
         |sig AS (SELECT doc_id, $sqlMh8 FROM sh),
         |bands AS (
         |  SELECT doc_id, 0 AS band, ${bucket(0)} AS bucket FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, ${bucket(1)} AS bucket FROM sig),
         |cand AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |tok AS (SELECT doc_id, list_distinct($sqlTokens) AS t FROM documents)
         |SELECT d1, d2,
         |  round(len(list_intersect(ta.t, tb.t))
         |    / (len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t))), 4) AS jaccard
         |FROM cand JOIN tok ta ON ta.doc_id = d1 JOIN tok tb ON tb.doc_id = d2
         |WHERE len(list_intersect(ta.t, tb.t))
         |    / (len(ta.t) + len(tb.t) - len(list_intersect(ta.t, tb.t))) >= 0.5
         |ORDER BY d1, d2""".stripMargin
    }) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val cand = DedupOps.lshCandidatePairs(docs, "doc_id", "text",
        numHashes = 8, bandSize = 4, shingleSize = 5)
        .select(col("d1"), col("d2"))
      val tok = docs.select(col("doc_id"),
        array_sort(array_distinct(graft.operators.TextOps.tokens(col("text")))).as("__t"))
      val j = DedupOps.sortedJaccard(col("__ta"), col("__tb"))
      cand
        .join(tok.select(col("doc_id").as("d1"), col("__t").as("__ta")), Seq("d1"))
        .join(tok.select(col("doc_id").as("d2"), col("__t").as("__tb")), Seq("d2"))
        .filter(j >= 0.5)
        .select(col("d1"), col("d2"), Qf.dround(j, 4).as("jaccard"))
        .orderBy("d1", "d2")
    },

    // ---------------------------------------------------------------- subword tokenization
    // the "BPE-ish regex" token counter: letter runs / digit runs /
    // punctuation runs as separate subtokens (the pre-tokenizer split
    // every BPE implementation starts from), vs whitespace tokens.
    // "fertility" = subtokens per whitespace token. Pure per-row regex —
    // scan-speed, zero shuffle; ASCII classes so RE2 (oracle) and Java
    // regex (Spark) agree exactly.
    q("d20_token_regex",
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]+', 0)) AS INTEGER) AS n_subtokens,
         |  CAST(len($sqlTokens) AS INTEGER) AS n_ws_tokens,
         |  round(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]+', 0))
         |      / len($sqlTokens), 4) AS fertility
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val sub = size(expr("regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]+', 0)"))
      table(s, dir, "documents").select(
        col("doc_id"),
        sub.as("n_subtokens"),
        TextOps.tokenCount(col("text")).as("n_ws_tokens"),
        Qf.dround(sub / TextOps.tokenCount(col("text")), 4).as("fertility"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- column profiling
    // corpus profiling (the ANALYZE-style pass a pipeline runs before
    // curation): per-column row/null/distinct counts and min/max. ONE
    // scan: every measure folds into a single aggregate row, exploded
    // into per-column rows afterwards — not one scan per column.
    q("d21_profile", {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      cols.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null, count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_value, CAST(max($c) AS VARCHAR) AS max_value
           |FROM documents""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    }) { (s, dir) =>
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val docs = table(s, dir, "documents")
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).as(s"__cnt_$c"),
          countDistinct(col(c)).as(s"__nd_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))
      } :+ count(lit(1)).as("__n")
      val one = docs.agg(aggs.head, aggs.tail: _*)
      val perCol = array(cols.map { c =>
        struct(lit(c).as("col_name"), col("__n").as("n_rows"),
          (col("__n") - col(s"__cnt_$c")).as("n_null"),
          col(s"__nd_$c").as("n_distinct"),
          col(s"__min_$c").as("min_value"), col(s"__max_$c").as("max_value"))
      }: _*)
      one.select(explode(perCol).as("p")).select(col("p.*")).dumpSorted("col_name")
    },

    // ---------------------------------------------------------------- dedup cluster assignment
    // LSH candidate pairs → connected components → every doc labeled with
    // its duplicate-cluster id (min doc_id of the component). The oracle
    // re-derives the same components with a recursive transitive-closure
    // CTE — fine at oracle scale, while the Spark side runs the
    // shuffle-bounded min-label-propagation loop that survives 100 TB.
    q("d17_dedup_clusters", {
      def bucket(b: Int) = (0 until 4).map(r => s"CAST(mh${b * 4 + r} AS VARCHAR)")
        .mkString("md5(", " || '_' || ", ")")
      s"""WITH RECURSIVE sh AS (SELECT doc_id, $sqlHashedShingles AS hs FROM documents),
         |sig AS (SELECT doc_id, $sqlMh8 FROM sh),
         |bands AS (
         |  SELECT doc_id, 0 AS band, ${bucket(0)} AS bucket FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, ${bucket(1)} AS bucket FROM sig),
         |cand AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |e AS (SELECT d1 AS u, d2 AS v FROM cand UNION SELECT d2, d1 FROM cand),
         |r(u, v) AS (SELECT u, v FROM e UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u),
         |lab AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM r GROUP BY u)
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM lab ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = table(s, dir, "documents")
      // star-contracted edges: same components as the pairwise candidate
      // graph (bucket clique ≡ bucket star for connectivity), Σ|bucket|
      // edges instead of Σ|bucket|², and depth-1 buckets converge the CC
      // loop in fewer rounds
      val cand = DedupOps.lshStarEdges(docs, "doc_id", "text",
        numHashes = 8, bandSize = 4, shingleSize = 5)
      val labels = DedupOps.connectedComponents(cand, "d1", "d2")
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      // cluster size via partial-agg + same-key join, NOT count-over-
      // window: an unbounded-frame window BUFFERS each cluster in one
      // task, and dup clusters are exactly where a pathological corpus
      // concentrates (10⁹ copies of one page = one giant partition)
      val sizes = labels.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- TF-IDF
    // classic salience scoring: per-doc term frequency × inverse document
    // frequency, top-3 terms per doc. All partial-agg shuffles on small
    // (doc_id, token) / (token) keys; the corpus size joins in as a
    // broadcast 1-row aggregate, never a driver-side constant.
    q("d18_tfidf",
      s"""WITH tok AS (SELECT doc_id, unnest($sqlTokens) AS token FROM documents),
         |tfs AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfs AS (SELECT token, count(*) AS df FROM tfs GROUP BY 1),
         |n AS (SELECT count(*) AS ndocs FROM documents),
         |scored AS (
         |  SELECT doc_id, token, tf, df, round(tf * ln(ndocs / df), 4) AS tfidf
         |  FROM tfs JOIN dfs USING (token), n),
         |ranked AS (SELECT doc_id, token, tf, df, tfidf,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS INTEGER) AS rk
         |  FROM scored)
         |SELECT doc_id, token, tf, df, tfidf, rk FROM ranked WHERE rk <= 3
         |ORDER BY doc_id, rk""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = table(s, dir, "documents")
      val tf = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val dfq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val ndocs = docs.agg(count(lit(1)).as("ndocs"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token"))
      tf.join(dfq, Seq("token"))
        .crossJoin(broadcast(ndocs))
        .withColumn("tfidf", Qf.dround(col("tf") * log(col("ndocs") / col("df")), 4))
        .withColumn("rk", row_number().over(w).cast("int"))
        .filter(col("rk") <= 3)
        .select(col("doc_id"), col("token"), col("tf"), col("df"), col("tfidf"), col("rk"))
        .orderBy("doc_id", "rk")
    },

    // ---------------------------------------------------------------- corpus vocabulary
    // vocabulary building: corpus-wide term + document frequencies, top
    // 100 terms. One explode + one partial-agg shuffle on the token key;
    // the top-k is TakeOrdered (per-partition heaps), not a global sort.
    q("d19_vocab",
      s"""WITH tok AS (SELECT doc_id, unnest($sqlTokens) AS token FROM documents)
         |SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
         |FROM tok GROUP BY token
         |ORDER BY tf DESC, token LIMIT 100""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy(col("tf").desc, col("token"))
        .limit(100)
    },

    // ---------------------------------------------------------------- exact L2 top-k
    q("s05_l2_topk",
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    round(sqrt(list_sum(list_transform(range(1, 65), i -> (qv[i] - cv[i]) * (qv[i] - cv[i])))), 6) AS dist
        |  FROM q, c WHERE query_id <> neighbor_id),
        |ranked AS (SELECT query_id, neighbor_id, dist,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY dist, neighbor_id) AS INTEGER) AS rk
        |  FROM scored)
        |SELECT query_id, neighbor_id, dist, rk FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      SimilarityOps.l2TopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5)
        .dumpSorted("query_id", "rk")
    },

    // ---------------------------------------------------------------- heavy hitters
    // Exact top-k tokens (count + rank): a partial-agg over (token) then a
    // TakeOrdered of k rows — SQL-expressible, so fully oracle-checked.
    // The row_number window runs over the ALREADY-LIMITED k rows (one
    // 20-row partition), not the vocabulary.
    q("d22_heavy_hitters",
      s"""WITH tok AS (SELECT unnest($sqlTokens) AS token FROM documents),
         |cnt AS (SELECT token, count(*) AS exact FROM tok GROUP BY token
         |        ORDER BY exact DESC, token LIMIT 20)
         |SELECT token, exact,
         |  CAST(row_number() OVER (ORDER BY exact DESC, token) AS INTEGER) AS rk
         |FROM cnt ORDER BY rk""".stripMargin) { (s, dir) =>
      val top = table(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("token")).limit(20)
      top.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("exact").desc, col("token"))))
        .dumpSorted("rk")
    },

    // CMS-estimate variant. The estimate itself has no cross-engine
    // oracle (no CMS in DuckDB) and is never hashed — the hash-matched
    // DECISION RELATION (the r15 d119 regime) is the exact top-20
    // (d22's own SQL) plus the per-token verdict of the CMS guarantee:
    // one-sided overcount, est ∈ [exact, exact + ε·N] with ε = 0.001
    // and N = the total token mass (oracle-expressible). The sketch is
    // seeded/deterministic → stable verdict; AccuracySpec keeps the
    // same bound as a named gate.
    q("d22b_heavy_hitters_est",
      s"""WITH tok AS (SELECT unnest($sqlTokens) AS token FROM documents),
         |cnt AS (SELECT token, count(*) AS exact FROM tok GROUP BY token
         |        ORDER BY exact DESC, token LIMIT 20)
         |SELECT token, exact, TRUE AS cms_ok
         |FROM cnt ORDER BY exact DESC, token""".stripMargin) { (s, dir) =>
      val eps = 0.001
      val toks = table(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("token"))
      val total = toks.filter(col("token").isNotNull).count()
      graft.operators.SketchOps.heavyHitters(toks, col("token"), k = 20,
          eps = eps)
        .select(col("token"), col("exact"),
          (col("est") >= col("exact") &&
            col("est") <= col("exact") + lit(eps) * lit(total.toDouble))
            .as("cms_ok"))
        .dumpSortedBy(col("exact").desc, col("token"))
    },

    // ---------------------------------------------------------------- IVF ANN
    // r16 graduation via the d33/d37 DECISION-RELATION regime: the IVF
    // answer itself is model-dependent (k-means centroids + pruning —
    // not oracle-replayable) and is never hashed. What IS hashed: the
    // EXACT side (s01's brute-force top-k, which the oracle replays
    // verbatim) plus `recall_ok`, the corpus-level recall@5 of the IVF
    // answer against that exact referent, carried on every row at
    // HALF the AccuracySpec gate (0.3 vs the 0.6 gate — the
    // established 2× headroom, because recall is (k, nprobe,
    // corpus-shape)-dependent: the d49b lesson says verify at all
    // three SFs and never hash the raw number). An IVF index that
    // stops retrieving flips the whole table red; the AccuracySpec
    // gate keeps the tight bound. The PRODUCTION operator stays
    // [[IvfIndex.annTopK]] — the exact sweep here is the referent the
    // decision relation needs, not the serving path.
    q("s04_ivf_topk", sqlExactTopkRecallOracle) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      val model = cachedModel(s, s"ivf:k8:i3:$dir")(
        IvfIndex.train(emb, "embedding", k = 8, iters = 3))
      val queries = emb.filter(col("vec_id") < 8)
      annRecallRelation(
        cachedExactTopK(s, dir, "full"),
        IvfIndex.annTopK(queries, "vec_id", "embedding",
          emb, "vec_id", "embedding", model, k = 5, nprobe = 3),
        minRecall = 0.3) // half the 0.6 AccuracySpec gate
    },

    // ---------------------------------------------------------------- HNSW graph ANN
    // the navigable-small-world family (Malkov & Yashunin 2016) — the
    // industry-default high-recall ANN, completing the portfolio next
    // to LSH/IVF/PQ/IVFPQ/SQ8/MRL. Per-partition graphs (the sharded-
    // HNSW serving architecture): queries broadcast, each shard
    // answers from its local graph, bounded-heap global merge — no
    // all-pairs anywhere, probe shuffle is queries × k × shards.
    // Deterministic by construction (levels from an id hash, not an
    // RNG), so two runs answer identically; recall vs s01 brute force
    // is AccuracySpec-gated ≥ 0.9.
    // r16 graduation: hash-matched via the s04 decision relation —
    // exact side + corpus-level recall verdict at half the 0.9 gate.
    q("s22_hnsw_topk", sqlExactTopkRecallOracle) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 8)
      annRecallRelation(
        cachedExactTopK(s, dir, "full"),
        graft.operators.HnswIndex.annTopK(queries, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 5,
          m = 16, efConstruction = 100, efSearch = 64),
        minRecall = 0.45) // half the 0.9 AccuracySpec gate
    },

    // ---------------------------------------------------------------- repetition quality rules
    // Gopher-style repetition battery: the degenerate looping text that
    // length/stopword heuristics (d02) miss shows up as a high
    // most-frequent-bigram share or duplicate-trigram share. Two
    // explode + (id, gram) partial-agg pipelines — shuffles carry gram
    // hashes, never documents.
    q("d23_repetition",
      s"""WITH tok AS (SELECT doc_id, $sqlTokens AS t FROM documents),
         |base AS (SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_unique FROM tok),
         |bi AS (
         |  SELECT doc_id, g, count(*) AS c FROM (
         |    SELECT doc_id, unnest(${sqlNgrams("t", 2)}) AS g FROM tok) GROUP BY 1, 2),
         |bia AS (SELECT doc_id, max(c) AS top_bi, sum(c) AS n_bi FROM bi GROUP BY 1),
         |tri AS (
         |  SELECT doc_id, g, count(*) AS c FROM (
         |    SELECT doc_id, unnest(${sqlNgrams("t", 3)}) AS g FROM tok) GROUP BY 1, 2),
         |tria AS (SELECT doc_id, sum(c) AS n_tri, count(*) AS nd_tri FROM tri GROUP BY 1)
         |SELECT base.doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
         |  round(n_unique / n_tokens, 4) AS unique_ratio,
         |  round(top_bi / n_bi, 4) AS top_bigram_frac,
         |  round((n_tri - nd_tri) / n_tri, 4) AS dup_trigram_frac
         |FROM base LEFT JOIN bia USING (doc_id) LEFT JOIN tria USING (doc_id)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.CurationOps.repetitionStats(
        table(s, dir, "documents"), "doc_id", "text")
        .withColumn("n_tokens", col("n_tokens").cast("int"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- benchmark decontamination
    // n-gram decontamination: training docs sharing any n-token gram with
    // the benchmark slice (deterministic doc_id % 97 holdout). The gram
    // join runs on md5 hashes; the benchmark gram set is model-sized and
    // broadcast — the corpus side never shuffles. Real pipelines use
    // n = 8-13; the synthetic word-salad corpus shares no 8-grams at all
    // (a vacuous 0 = 0 check), so the conformance entry uses n = 3, which
    // yields a few hundred genuine overlaps at sf0.01.
    q("d24_decontamination", d24OracleSql) { (s, dir) =>
      val docs = table(s, dir, "documents")
      graft.operators.CurationOps.ngramOverlap(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "doc_id", "text", n = 3)
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- bloom-filter decontamination
    // constant-memory variant of d24 for benchmark gram sets too wide
    // to broadcast exactly — run as the full PREFILTER → EXACT-RESCORE
    // composition (the d120 shape): the bloom routes the corpus, only
    // flagged docs pay the exact gram join, and the FINAL answer is
    // the exact one. That makes the query hash-matchable against d24's
    // own oracle: the bloom has NO false negatives, so restricting the
    // exact join to flagged docs loses nothing — a dropped true
    // positive would make the hashes differ, so the oracle match IS
    // the flagged ⊇ exact proof, per run. The AccuracySpec gate
    // additionally bounds false-positive docs (fpp budget).
    q("d24b_decontamination_bloom", d24OracleSql) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val train = docs.filter(col("doc_id") % 97 =!= 0)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val flagged = graft.operators.CurationOps.ngramOverlapBloom(
        train, bench, "doc_id", "text", n = 3, expectedGrams = 200000L)
      graft.operators.CurationOps.ngramOverlap(
        train.join(flagged.select(col("doc_id")), Seq("doc_id"), "left_semi"),
        bench, "doc_id", "text", n = 3)
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- BM25 keyword search
    // the retrieval half of corpus tooling: BM25 scores for a fixed term
    // set, top 50. df/N/avgdl are model-sized broadcast sides; tf is the
    // standard inverted-index explode + partial-agg. avgdl sums integral
    // doubles (< 2^53), so the corpus average is order-independent and
    // the rounded scores hash-match cross-engine.
    q("d25_bm25", {
      val terms = Seq("spark", "hash", "window", "merge").map(t => s"'$t'").mkString(", ")
      s"""WITH lens AS (SELECT doc_id, CAST(len($sqlTokens) AS DOUBLE) AS dl FROM documents),
         |c AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM lens),
         |tf AS (
         |  SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM (
         |    SELECT doc_id, unnest($sqlTokens) AS term FROM documents)
         |  WHERE term IN ($terms) GROUP BY 1, 2),
         |dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
         |SELECT doc_id,
         |  round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1)
         |    * (tf * (1.2 + 1)) / (tf + 1.2 * ((1 - 0.75) + (0.75 * dl) / avgdl))), 4) AS bm25
         |FROM tf JOIN dfq USING (term) JOIN lens USING (doc_id), c
         |GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 50""".stripMargin
    }) { (s, dir) =>
      graft.operators.CurationOps.bm25Scores(
        table(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "hash", "window", "merge"))
        .select(col("doc_id"), Qf.dround(col("bm25_raw"), 4).as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id"))
        .limit(50)
    },

    // ---------------------------------------------------------------- PII scrubbing
    // redaction pass: mask emails and long digit runs, count what was
    // masked. The corpus itself is synthetic word-salad, so the PII is
    // derived IN-QUERY from doc_id (deterministic, oracle-checkable) —
    // the operator (pattern list + scrub + counts) is the deliverable.
    q("d26_pii_scrub",
      s"""WITH synth AS (
         |  SELECT doc_id,
         |    substr(text, 1, 40) || ' contact user' || doc_id ||
         |    '@example.com ref ' || doc_id * 7919 AS raw
         |  FROM documents)
         |SELECT doc_id,
         |  regexp_replace(regexp_replace(raw,
         |    '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
         |    '[0-9]{3,}', '<NUM>', 'g') AS scrubbed,
         |  CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS INTEGER) AS n_emails,
         |  CAST(len(regexp_extract_all(regexp_replace(raw,
         |    '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
         |    '[0-9]{3,}')) AS INTEGER) AS n_nums
         |FROM synth ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val raw = concat(substring(col("text"), 1, 40),
        lit(" contact user"), col("doc_id"), lit("@example.com ref "),
        col("doc_id") * 7919)
      val (nEmails, nNums) = graft.operators.CurationOps.piiCounts(raw)
      table(s, dir, "documents")
        .select(col("doc_id"),
          graft.operators.CurationOps.piiScrub(raw).as("scrubbed"),
          nEmails.as("n_emails"), nNums.as("n_nums"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- weighted sampling
    // probability-proportional-to-size Bernoulli sample on a stable hash:
    // keep iff hash(doc_id) mod M < weight·scale. Pure integer
    // arithmetic — reproducible across engines AND partitionings (which
    // `df.sample` is not), pushed to the scan as a per-row predicate.
    q("d27_weighted_sample",
      s"""SELECT doc_id, n_chars
         |FROM documents
         |WHERE ${sqlHash("CAST(doc_id AS VARCHAR)", "")} % 1000000
         |      < least(1000000, n_chars * 300)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      table(s, dir, "documents")
        .filter(graft.operators.CurationOps.weightedKeep(
          col("doc_id"), col("n_chars"), 300))
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- token-budget corpus mixing
    // epoch mixing: each source downsampled to a ~800-token budget via a
    // per-source fixed-point rate (integer ppm — no float rounding to
    // diverge cross-engine) and the stable-hash membership predicate.
    // The rate table is model-sized and broadcast; the corpus streams
    // past it without shuffling.
    q("d31_corpus_mix",
      s"""WITH t AS (SELECT source, doc_id, CAST(len($sqlTokens) AS BIGINT) AS n_tok FROM documents),
         |r AS (SELECT source, least(1000000, (800 * 1000000) // sum(n_tok)) AS keep_ppm
         |      FROM t GROUP BY source),
         |k AS (SELECT t.source, doc_id, n_tok, keep_ppm
         |      FROM t JOIN r USING (source)
         |      WHERE ${sqlHash("CAST(doc_id AS VARCHAR)", "")} % 1000000 < keep_ppm)
         |SELECT source, CAST(any_value(keep_ppm) AS BIGINT) AS keep_ppm,
         |  count(*) AS n_docs_kept, CAST(sum(n_tok) AS BIGINT) AS n_tokens_kept
         |FROM k GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      graft.operators.CurationOps.corpusMix(
        table(s, dir, "documents"), "doc_id", "text", "source", budgetTokens = 800)
        .groupBy(col("source"))
        .agg(first(col("keep_ppm")).as("keep_ppm"),
          count(lit(1)).as("n_docs_kept"), sum(col("n_tok")).as("n_tokens_kept"))
        .dumpSorted("source")
    },

    // ---------------------------------------------------------------- context-window packing
    // training-sequence packing: greedy fixed-budget bins in id order
    // WITHIN each source shard (exclusive running token sum ÷ context).
    // Packing is inherently sequential, so the scale-honest form
    // parallelizes across shards — one sort-based window per shard, no
    // global sort.
    q("d28_doc_packing",
      s"""WITH t AS (SELECT source, doc_id, CAST(len($sqlTokens) AS BIGINT) AS n_tok FROM documents),
         |c AS (SELECT source, doc_id, n_tok,
         |  sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS cum
         |  FROM t)
         |SELECT source, CAST(floor(cum / 2048) AS INTEGER) AS bin,
         |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM c GROUP BY 1, 2 ORDER BY source, bin""".stripMargin) { (s, dir) =>
      graft.operators.CurationOps.packBins(
        table(s, dir, "documents"), "source", "doc_id", "text", contextLen = 2048)
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("source", "bin")
    },

    // ---------------------------------------------------------------- passage-level exact dedup
    // chunk-granularity dedup (Lee et al.'s "deduplicating training
    // data" pass): 10-token passages, each distinct passage survives
    // only at its first (doc_id, pos) occurrence corpus-wide, text
    // rebuilt from the survivors. Winner selection is a map-side-
    // combining min(struct) aggregation, NOT a row_number window — a
    // boilerplate passage with a billion copies would funnel one window
    // task; the partial agg never does.
    q("d30_passage_dedup",
      s"""WITH tok AS (SELECT doc_id, $sqlTokens AS t FROM documents),
         |ch0 AS (SELECT doc_id, t,
         |  unnest(range(0, CAST(ceil(len(t) / 10.0) AS BIGINT))) AS p FROM tok),
         |ch AS (SELECT doc_id, CAST(p AS INTEGER) AS pos,
         |  array_to_string(t[(p*10+1):least(p*10+10, len(t))], ' ') AS chunk FROM ch0),
         |h AS (SELECT doc_id, pos, chunk, ${sqlHash("chunk", "")} AS hh FROM ch),
         |r AS (SELECT doc_id, pos, chunk,
         |  row_number() OVER (PARTITION BY hh ORDER BY doc_id, pos) AS rn FROM h)
         |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_chunks,
         |  CAST(count(*) FILTER (WHERE rn = 1) AS INTEGER) AS n_kept,
         |  string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE rn = 1) AS text_dedup
         |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.CurationOps.passageDedup(
        table(s, dir, "documents"), "doc_id", "text", w = 10)
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- end-to-end curation funnel
    // the full FILTERING funnel in one plan (complement of d13's pairing
    // funnel): language gate → quality threshold → repetition gate →
    // exact dedup (min-id winner per normalized fingerprint) →
    // benchmark decontamination (3-gram anti-join) → per-source yield.
    // Every stage is a per-row kernel or model-sized-side join; the two
    // data shuffles are the dedup winner agg and the final source agg.
    q("d32_curation_pipeline",
      s"""WITH base AS (
         |  SELECT doc_id, source, text, $sqlTokens AS tok FROM documents
         |  WHERE lang = 'en' AND doc_id % 97 <> 0),
         |ql AS (SELECT *,
         |  0.5 * (1 - (len(list_filter(tok, t -> t IN ($stopList))) / len(tok)))
         |    + 0.5 * least(1.0, len(tok) / 100.0) AS quality FROM base),
         |f1 AS (SELECT * FROM ql WHERE quality >= 0.6),
         |f2 AS (SELECT * FROM f1 WHERE len(list_distinct(tok)) / len(tok) >= 0.35),
         |fp AS (SELECT *, md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fpr FROM f2),
         |win AS (SELECT fpr, min(doc_id) AS wdoc FROM fp GROUP BY 1),
         |dd AS (SELECT fp.* FROM fp JOIN win ON fp.fpr = win.fpr AND fp.doc_id = win.wdoc),
         |bg AS (
         |  SELECT DISTINCT ${sqlHash("g0", "")} AS h FROM (
         |    SELECT unnest(${sqlNgrams("(" + sqlTokens + ")", 3)}) AS g0
         |    FROM documents WHERE doc_id % 97 = 0)),
         |dg AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_id, ${sqlHash("g0", "")} AS h FROM (
         |      SELECT doc_id, unnest(${sqlNgrams("tok", 3)}) AS g0 FROM dd))
         |  WHERE h IN (SELECT h FROM bg)),
         |clean AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM dg))
         |SELECT source, count(*) AS n_docs, CAST(sum(len(tok)) AS BIGINT) AS n_tokens
         |FROM clean GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      import graft.operators.CurationOps
      val docs = table(s, dir, "documents")
      val st = graft.functions.NgramExpressions.repetitionStats(col("text"))
      val filtered = docs
        .filter(col("lang") === "en" && col("doc_id") % 97 =!= 0)
        .filter(TextOps.qualityScore(col("text")) >= 0.6)
        .filter((st.getField("n_unique") / st.getField("n_tokens")) >= 0.35)
        .withColumn("__fp", TextOps.fingerprint(col("text")))
      val winners = filtered.groupBy(col("__fp")).agg(min(col("doc_id")).as("doc_id"))
      val deduped = filtered.join(winners, Seq("__fp", "doc_id"))
      val contaminated = CurationOps.ngramOverlap(
        deduped, docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", n = 3)
        .select(col("doc_id"))
      deduped.join(contaminated, Seq("doc_id"), "left_anti")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"))
        .dumpSorted("source")
    },

    // ---------------------------------------------------------------- byte-entropy quality proxy
    // Shannon entropy of the UTF-8 byte distribution (bits/byte): the
    // quality signal repetition heuristics miss from the other direction
    // — near-0 for degenerate loops, ~4.2 for English, ~8 for binary
    // noise. Spark folds the fused 256-bucket histogram per row (scan
    // speed, zero shuffle); the oracle re-derives counts via group-by.
    q("d29_byte_entropy",
      """WITH codes AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, octet_length(encode(text)) + 1),
        |      i -> CAST('0x' || substr(hx, 2*i-1, 2) AS INTEGER))) AS b,
        |    octet_length(encode(text)) AS n
        |  FROM (SELECT doc_id, hex(encode(text)) AS hx, text FROM documents)),
        |cnt AS (SELECT doc_id, b, count(*) AS c, any_value(n) AS n FROM codes GROUP BY 1, 2)
        |SELECT doc_id, round(-sum((c / n) * ln(c / n)) / ln(2), 4) AS byte_entropy
        |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      table(s, dir, "documents").select(col("doc_id"),
        Qf.dround(TextOps.byteEntropy(col("text")), 4).as("byte_entropy"))
        // entropy is NULL for empty/null text; the oracle's group-by emits
        // no row there, so drop those rows to keep the row sets identical
        .filter(col("byte_entropy").isNotNull)
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- embedding cluster cohesion
    // per-label centroid + cohesion over the embedding corpus: member
    // count, centroid L2 norm, mean member→centroid cosine. Centroid
    // components are rounded to 6 decimals on BOTH sides so the cosine
    // pass scores against bit-identical centroids regardless of
    // summation order. (For unit-normalized embeddings avg_cos ≈
    // centroid_norm — a free internal consistency check.)
    q("s06_label_cohesion",
      """WITH x AS (
        |  SELECT label, vec_id, u.i AS i, CAST(u.v AS DOUBLE) AS v
        |  FROM (SELECT label, vec_id,
        |          unnest(list_transform(range(1, len(embedding) + 1),
        |            j -> {'i': j, 'v': embedding[j]})) AS u
        |        FROM embeddings)),
        |cen AS (SELECT label, i, round(avg(v), 6) AS c FROM x GROUP BY 1, 2),
        |cn AS (SELECT label, sqrt(sum(c * c)) AS cnorm FROM cen GROUP BY 1),
        |dots AS (
        |  SELECT label, vec_id, sum(v * c) AS dot, sqrt(sum(v * v)) AS vnorm
        |  FROM x JOIN cen USING (label, i) GROUP BY 1, 2)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_members,
        |  round(any_value(cnorm), 4) AS centroid_norm,
        |  round(avg(dot / (vnorm * cnorm)), 4) AS avg_cos
        |FROM dots JOIN cn USING (label)
        |GROUP BY label ORDER BY label""".stripMargin) { (s, dir) =>
      SimilarityOps.centroidCohesion(table(s, dir, "embeddings"), "label", "embedding")
        .select(col("label"), col("n_members"),
          Qf.dround(col("centroid_norm_raw"), 4).as("centroid_norm"),
          Qf.dround(col("avg_cos_raw"), 4).as("avg_cos"))
        .dumpSorted("label")
    },

    // ---------------------------------------------------------------- product-quantization ANN
    // PQ asymmetric-distance top-k with exact re-rank (model-dependent,
    // never hashed; AccuracySpec gates recall@5 against the exact s05
    // answer). 64 floats/vector compress to 8 codes; candidates score
    // via broadcast per-query lookup tables, then the top-100 ADC pool
    // re-ranks with exact distances — the scale path where the float
    // corpus no longer fits executor memory.
    // r16 graduation: hash-matched via the s04 decision relation —
    // exact side + corpus-level recall verdict at half the 0.7 gate.
    q("s07_pq_topk", sqlExactTopkRecallOracle) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      val model = cachedModel(s, s"pq:m8:k32:i5:$dir")(
        graft.operators.PqIndex.train(emb, "embedding", m = 8, k = 32, iters = 5))
      val codes = cachedModel(s, s"pq:m8:k32:i5:codes:$dir") {
        val c = graft.operators.PqIndex.codeTable(emb, "vec_id", "embedding", model).persist()
        c.count(); c
      }
      val queries = emb.filter(col("vec_id") < 8)
      annRecallRelation(
        cachedExactTopK(s, dir, "full"),
        graft.operators.PqIndex.annTopK(queries, "vec_id", "embedding",
          emb, "vec_id", "embedding", model, k = 5, rerank = 100,
          prebuiltCodes = Some(codes)),
        minRecall = 0.35) // half the 0.7 AccuracySpec gate
    },

    // ---------------------------------------------------------------- IVF×PQ composed ANN
    // the full composition (model-dependent, never hashed; AccuracySpec
    // gates recall@5 ≥ 0.85 AND asserts the candidate pruning): coarse
    // cells prune to nprobe/kc of the corpus, PQ codes rank inside the
    // probed cells, exact re-rank on the small pool. Fixes s07's
    // full-corpus ADC scan — the query never touches codes outside its
    // probed cells. Codebooks quantize per-cell RESIDUALS (IVFADC,
    // Jégou §V); the r6 probe measured recall on this corpus to be
    // PRUNING-bound (recall = probed-cell ceiling in 17/20 configs —
    // see SCALE.md), so the gate raise 0.7 → 0.85 comes from nprobe
    // 4 → 6 while residual coding holds parity at identical budgets.
    // r16 graduation: hash-matched via the s04 decision relation —
    // exact side + corpus-level recall verdict at half the 0.85 gate.
    q("s08_ivfpq_topk", sqlExactTopkRecallOracle) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      val model = cachedModel(s, s"ivfpq:res:kc8:m8:k32:i5:$dir")(
        graft.operators.IvfPq.train(emb, "embedding",
          kc = 8, m = 8, k = 32, iters = 5, residual = true))
      val codes = cachedModel(s, s"ivfpq:res:kc8:m8:k32:i5:codes:$dir") {
        val c = graft.operators.IvfPq.codeTable(emb, "vec_id", "embedding", model).persist()
        c.count(); c
      }
      val queries = emb.filter(col("vec_id") < 8)
      annRecallRelation(
        cachedExactTopK(s, dir, "full"),
        graft.operators.IvfPq.annTopK(queries, "vec_id", "embedding",
          emb, "vec_id", "embedding", model, k = 5, nprobe = 6, rerank = 100,
          prebuiltCodes = Some(codes)),
        minRecall = 0.425) // half the 0.85 AccuracySpec gate
    },

    // ---------------------------------------------------------------- filtered vector search
    // metadata predicate + vector top-k (the "filtered ANN" production
    // shape: search only candidates passing a structured filter). The
    // filter applies BEFORE scoring, so it pushes into the candidate
    // scan — at rest with a label-partitioned layout it prunes
    // partitions; the ranking is the bounded-heap aggregate either way.
    q("s10_filtered_topk",
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings WHERE label = 3),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |    round(list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i]))
        |      / (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])))
        |       * sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))), 6) AS score
        |  FROM q JOIN c ON query_id <> neighbor_id),
        |ranked AS (SELECT query_id, neighbor_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INTEGER) AS rk
        |  FROM scored)
        |SELECT query_id, neighbor_id, score, rk FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      SimilarityOps.bruteForceTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb.filter(col("label") === 3), "vec_id", "embedding", k = 5)
        .dumpSorted("query_id", "rk")
    },

    // ---------------------------------------------------------------- hard-negative mining
    // contrastive near-miss impostors: per anchor, the top-5
    // highest-cosine neighbors with a DIFFERENT label. Label inequality
    // sits in the join condition (same-label pairs never reach the dot
    // product); ranking is the bounded-heap aggregate, not a window.
    q("s11_hard_negatives",
      """WITH q AS (SELECT vec_id AS query_id, label AS anchor_label, embedding AS qv
        |           FROM embeddings WHERE vec_id < 8),
        |c AS (SELECT vec_id AS neighbor_id, label AS cl, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, anchor_label, neighbor_id,
        |    round(list_sum(list_transform(range(1, 65), i -> qv[i] * cv[i]))
        |      / (sqrt(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])))
        |       * sqrt(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])))), 6) AS score
        |  FROM q JOIN c ON query_id <> neighbor_id AND anchor_label <> cl),
        |ranked AS (SELECT query_id, anchor_label, neighbor_id, score,
        |  CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS INTEGER) AS rk
        |  FROM scored)
        |SELECT query_id, anchor_label, neighbor_id, score, rk FROM ranked WHERE rk <= 5
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      SimilarityOps.hardNegatives(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding", "label",
        emb, "vec_id", "embedding", "label", k = 5)
        .dumpSorted("query_id", "rk")
    },

    // ---------------------------------------------------------------- persisted IVFPQ index probe
    // the at-rest deployment of s08: code table written PARTITIONED BY
    // cell + model parquet, probe = literal partition filter over the
    // index directories (model-dependent answer, never hashed;
    // PlanShapeSpec pins row-identity with the in-flight s08 form AND
    // the partition-pruned scan shape). r16: hash-matched via the s04
    // decision relation — exact side + corpus-level recall verdict at
    // half the s08-family gate.
    q("s09_ivfpq_index", sqlExactTopkRecallOracle) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      val model = cachedModel(s, s"ivfpq:res:kc8:m8:k32:i5:$dir")(
        graft.operators.IvfPq.train(emb, "embedding",
          kc = 8, m = 8, k = 32, iters = 5, residual = true))
      val path = cachedModel(s, s"ivfpq:res:atrest:$dir") {
        val p = s"/tmp/graft_conformance/s09_index_${dir.hashCode.toHexString}"
        graft.operators.IvfPq.writeIndex(emb, "vec_id", "embedding", model, p)
        p
      }
      // the probe service shape: the (tiny) at-rest model is loaded ONCE
      // and reused across query batches — round-trip parity with the
      // in-memory model is pinned by IvfPqSpec's writeIndex/loadModel
      // bit-exactness test; the codes scan stays per-probe (that is the
      // partition-pruned read the PlanShapeSpec gates)
      val loaded = cachedModel(s, s"ivfpq:res:atrest:model:$dir")(
        graft.operators.IvfPq.loadModel(s, path))
      val queries = emb.filter(col("vec_id") < 8)
      annRecallRelation(
        cachedExactTopK(s, dir, "full"),
        graft.operators.IvfPq.probeIndex(s, path,
          queries, "vec_id", "embedding",
          emb, "vec_id", "embedding", k = 5, nprobe = 6, rerank = 100,
          preloadedModel = Some(loaded)),
        minRecall = 0.425) // half the 0.85 s08-family gate
    },

    // ---------------------------------------------------------------- semantic dedup (SemDeDup)
    // k-means + within-cluster cosine pruning. Cluster ids and the
    // exact drop set are model-dependent (recall < 1 by design), so
    // neither is hashed — the hash-matched DECISION RELATION (the r15
    // d119 regime) is, per vector: the EXACT has-lower-id-duplicate
    // flag (the oracle replays the all-pairs sweep at 6dp-rounded
    // cosine), `prec_ok` = the precision-1 contract (dropped ⇒ an
    // exact partner exists; rounding-safe: a semDedup drop means
    // unrounded cos ≥ τ, and 6dp rounding moves < 5e-7, so the exact
    // flag cannot round below τ). Recall is deliberately NOT hashed:
    // it is a tuning property of (k, nprobe) vs corpus shape (0.95 at
    // the gate's sf0.001, below 0.85 at sf0.1's k=48), so it stays
    // where tuning bounds live — the AccuracySpec gate at its pinned
    // fixture. The scale
    // story vs d11's LSH: candidate pairs are Σ(cluster²), never
    // all-pairs — the exact flag here is conformance apparatus (the
    // oracle must see a model-free truth), not the operator's path.
    q("d33_semdedup",
      """WITH n AS MATERIALIZED (SELECT vec_id, embedding AS v,
        |  sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i] * embedding[i]))) AS nr
        |  FROM embeddings),
        |a AS (SELECT vec_id AS ida, v AS va, nr AS na FROM n),
        |b AS (SELECT vec_id AS idb, v AS vb, nr AS nb FROM n),
        |pr AS (
        |  SELECT idb FROM a JOIN b ON ida < idb
        |  WHERE round(list_sum(list_transform(range(1, 65), i -> va[i] * vb[i]))
        |      / (na * nb), 6) >= 0.4),
        |d AS (SELECT DISTINCT idb FROM pr)
        |SELECT e.vec_id, (d.idb IS NOT NULL) AS has_dup, TRUE AS prec_ok
        |FROM embeddings e LEFT JOIN d ON e.vec_id = d.idb
        |ORDER BY e.vec_id""".stripMargin) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      // k derives from a target cluster size (≈42 ⇒ k=12 at the gate's
      // sf0.001) so the within-cluster quadratic work stays bounded as
      // the corpus grows — k ∝ n, not a fixed constant
      val sem = SimilarityOps.semDedupAuto(emb, "vec_id", "embedding",
        targetClusterSize = 42, iters = 5, nprobe = 3, tau = 0.4)
      // the model-free exact flag: ∃ lower id at rounded cos ≥ τ. The
      // bench side broadcasts (model-sized embedding table); cosine is
      // the same fused kernel, rounded like the oracle.
      // norms hoisted out of the pair loop (bit-identical: norm(v) is
      // the same expression on the same input either way; the pair
      // predicate keeps the dot/(na*nb) tree cosine() builds)
      val a = emb.select(col("vec_id").as("__ida"), col("embedding").as("__va"),
        SimilarityOps.norm(col("embedding")).as("__na"))
      // the streamed side of the all-pairs nested-loop referent rides
      // the embeddings scan's ONE file split — round-robin it across
      // the session width so the quadratic sweep runs on every core
      // (1.7 s single-task stage at sf0.1, the whole query's wall;
      // same pairs, distinct() after — result unchanged)
      val b = emb.select(col("vec_id").as("__idb"), col("embedding").as("__vb"),
        SimilarityOps.norm(col("embedding")).as("__nb"))
        .repartition(s.sparkContext.defaultParallelism)
      val dup = broadcast(a).join(b, col("__ida") < col("__idb"))
        .filter(Qf.dround(
          graft.functions.VectorExpressions.dotF(col("__va"), col("__vb"))
            / (col("__na") * col("__nb")), 6) >= 0.4)
        .select(col("__idb").as("vec_id")).distinct()
        .withColumn("__dup", lit(true))
      sem.join(dup, Seq("vec_id"), "left")
        .select(col("vec_id"),
          coalesce(col("__dup"), lit(false)).as("has_dup"),
          (col("keep") || coalesce(col("__dup"), lit(false))).as("prec_ok"))
        .orderBy("vec_id")
    },

    // ---------------------------------------------------------------- edit-distance similarity join
    // PassJoin-style pigeonhole blocking (segments ⋈ substrings) + exact
    // levenshtein rescore — the entity-resolution primitive (near-same
    // product/author/entity names) without the all-pairs sweep. The
    // oracle IS the all-pairs sweep: identical output proves the
    // blocking loses nothing.
    q("d35_fuzzy_name_join",
      """WITH names AS (SELECT DISTINCT p_name FROM part WHERE p_name IS NOT NULL)
        |SELECT a.p_name AS a, b.p_name AS b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM names a JOIN names b ON a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 2
        |ORDER BY a, b""".stripMargin) { (s, dir) =>
      graft.operators.FuzzyJoin.editDistanceSelfJoin(table(s, dir, "part"), "p_name", k = 2)
        .dumpSorted("a", "b")
    },

    // ---------------------------------------------------------------- optimizer-rewritten fuzzy join
    // the NAIVE SQL a user writes (cartesian levenshtein filter), run
    // through the injected LevenshteinJoinRewrite rule: the optimizer
    // swaps in the PassJoin blocking plan. The oracle runs the same
    // naive SQL in DuckDB — identical hashes prove the rewrite is
    // semantics-preserving end to end (GraftSparkExtensionsSpec asserts
    // the plan contains no cartesian product).
    q("d36_fuzzy_join_sql",
      """SELECT a.p_name AS a, b.p_name AS b
        |FROM (SELECT DISTINCT p_name FROM part) a
        |JOIN (SELECT DISTINCT p_name FROM part) b
        |  ON levenshtein(a.p_name, b.p_name) <= 2 AND a.p_name < b.p_name
        |ORDER BY a, b""".stripMargin) { (s, dir) =>
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        s2.experimental.extraOptimizations :+ graft.plans.LevenshteinJoinRewrite
      table(s2, dir, "part").createOrReplaceTempView("part_fz")
      s2.sql("""SELECT a.p_name AS a, b.p_name AS b
        |FROM (SELECT DISTINCT p_name FROM part_fz) a
        |JOIN (SELECT DISTINCT p_name FROM part_fz) b
        |  ON levenshtein(a.p_name, b.p_name) <= 2 AND a.p_name < b.p_name
        |ORDER BY a, b""".stripMargin)
    },

    // the THRESHOLDED built-in Spark >= 3.5 documents as the fast path:
    // levenshtein(a, b, t) returns the distance when <= t, else -1, so
    // `>= 0` is the distance-bound test. Without the rewrite this form
    // too plans as a cartesian nested loop. DuckDB has no 3-arg
    // levenshtein — the oracle runs the semantically-identical 2-arg
    // bound, which is the point: identical hashes prove the bounded form
    // rewrites to the same PassJoin plan and the same rows.
    q("d36b_fuzzy_join_bounded",
      """SELECT a.p_name AS a, b.p_name AS b
        |FROM (SELECT DISTINCT p_name FROM part) a
        |JOIN (SELECT DISTINCT p_name FROM part) b
        |  ON levenshtein(a.p_name, b.p_name) <= 2 AND a.p_name < b.p_name
        |ORDER BY a, b""".stripMargin) { (s, dir) =>
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        s2.experimental.extraOptimizations :+ graft.plans.LevenshteinJoinRewrite
      table(s2, dir, "part").createOrReplaceTempView("part_fzb")
      s2.sql("""SELECT a.p_name AS a, b.p_name AS b
        |FROM (SELECT DISTINCT p_name FROM part_fzb) a
        |JOIN (SELECT DISTINCT p_name FROM part_fzb) b
        |  ON levenshtein(a.p_name, b.p_name, 2) >= 0 AND a.p_name < b.p_name
        |ORDER BY a, b""".stripMargin)
    },

    // the EQUALITY form — `levenshtein(a,b) = 1` is the typo join users
    // write; `= d` implies `≤ d`, so d drives the PassJoin blocking and
    // the equality survives as the residual rescore. The oracle runs the
    // same naive SQL in DuckDB.
    q("d36c_fuzzy_join_eq",
      """SELECT a.p_name AS a, b.p_name AS b
        |FROM (SELECT DISTINCT p_name FROM part) a
        |JOIN (SELECT DISTINCT p_name FROM part) b
        |  ON levenshtein(a.p_name, b.p_name) = 1 AND a.p_name < b.p_name
        |ORDER BY a, b""".stripMargin) { (s, dir) =>
      val s2 = s.newSession()
      s2.experimental.extraOptimizations =
        s2.experimental.extraOptimizations :+ graft.plans.LevenshteinJoinRewrite
      table(s2, dir, "part").createOrReplaceTempView("part_fzc")
      s2.sql("""SELECT a.p_name AS a, b.p_name AS b
        |FROM (SELECT DISTINCT p_name FROM part_fzc) a
        |JOIN (SELECT DISTINCT p_name FROM part_fzc) b
        |  ON levenshtein(a.p_name, b.p_name) = 1 AND a.p_name < b.p_name
        |ORDER BY a, b""".stripMargin)
    },

    // ---------------------------------------------------------------- model-based quality filter
    // the classifier stage of the standard LLM data pipeline: fused-
    // kernel features → logistic regression on a stable-hash split with
    // heuristic weak labels → per-document score. The probability is
    // model-dependent (L-BFGS line-search internals are not
    // SQL-replayable) and never hashed — the hash-matched DECISION
    // RELATION (the r15 d119 regime) is the deterministic half the
    // oracle CAN replay exactly (the stable-hash split and the weak
    // label — the d42/d02 expressions) plus `auc_ok`, the corpus-level
    // holdout-AUC verdict (≥ 0.75, headroom under the AccuracySpec
    // gate's 0.8) carried on every row: a classifier that stops
    // learning flips the whole table red.
    q("d37_quality_classifier", {
      val h = s"${sqlHash("CAST(doc_id AS VARCHAR)", "mlsplit")} % 100"
      s"""SELECT doc_id,
         |  ($h < 70) AS is_train,
         |  CAST((0.5 * (1 - (len(list_filter($sqlTokens, t -> t IN ($stopList))) / len($sqlTokens)))
         |      + 0.5 * least(1.0, len($sqlTokens) / 100.0)) >= 0.74 AS INTEGER) AS weak_label,
         |  TRUE AS auc_ok
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import graft.operators.MlOps
      val feats = MlOps.featureFrame(table(s, dir, "documents"), "doc_id", "text")
      // train once per corpus (train-once/score-many, like the ANN models)
      val model = cachedModel(s, s"lrquality:$dir")(MlOps.trainQuality(feats))
      val scored = MlOps.scoreWith(model, feats, "doc_id")
      // holdout AUC exactly as the AccuracySpec gate computes it
      // (pairwise, ties half) — the holdout is a bounded evaluation
      // set (≤ 30% of the conformance fixture), collected like every
      // model-sized frame; guard loudly rather than melt the driver
      val hold = scored.filter(!col("is_train"))
        .select(col("weak_label"), col("p_good"))
        .limit(100001).collect()
      require(hold.length <= 100000,
        "d37 holdout exceeds 100k rows — evaluate AUC distributed " +
          "(rank-sum form) before scaling this fixture")
      // Mann-Whitney rank-sum form, O(n log n) — the spec-pinned
      // tie-exact equivalent of the pairwise definition (MlOps)
      val auc = MlOps.aucRankSum(hold.map(r => (r.getInt(0), r.getDouble(1))))
      scored
        .select(col("doc_id"), col("is_train"), col("weak_label"),
          lit(auc >= 0.75).as("auc_ok"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- bigram-LM quality scoring
    // CCNet-style fluency signal: Laplace-smoothed bigram cross-entropy
    // of each document under the corpus's own statistics. Bigrams never
    // leave their row (per-row transform, no lag window); counts are
    // partial-agg shuffles on token keys; vocab size broadcasts.
    q("d34_lm_score",
      """WITH lst AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
        |big AS (
        |  SELECT doc_id, unnest(list_zip(l[:len(l)-1], l[2:])) AS z
        |  FROM lst WHERE len(l) >= 2),
        |pairs AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM big),
        |c2 AS (SELECT w1, w2, count(*) AS n2 FROM pairs GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS n1 FROM pairs GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS vocab
        |      FROM (SELECT unnest(l) AS tok FROM lst)),
        |scored AS (
        |  SELECT p.doc_id, -ln((c2.n2 + 1.0) / (c1.n1 + v.vocab)) AS nll
        |  FROM pairs p JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
        |  round(avg(nll), 4) AS avg_nll
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      sharedLmScores(s, dir)
        .select(col("doc_id"), col("n_bigrams"),
          Qf.dround(col("avg_nll_raw"), 4).as("avg_nll"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- BPE merge-pair statistics
    // one tokenizer-training iteration (Sennrich et al. 2016): adjacent
    // character-pair counts weighted by word frequency — the argmax is
    // the next BPE merge. The corpus collapses to its VOCAB first (the
    // only corpus-sized shuffle); the pair explosion runs over distinct
    // words, so a 100 TB corpus pays vocab-sized cost past the count.
    q("d61_bpe_pairs",
      s"""WITH w AS (SELECT unnest($sqlTokens) AS w FROM documents),
         |f AS (SELECT w, count(*) AS freq FROM w WHERE w <> '' GROUP BY w),
         |p AS (SELECT unnest(list_transform(range(1, length(w)), i -> substr(w, CAST(i AS INTEGER), 2))) AS pair, freq
         |  FROM f WHERE length(w) >= 2)
         |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM p GROUP BY pair
         |ORDER BY cnt DESC, pair LIMIT 50""".stripMargin) { (s, dir) =>
      graft.operators.CurationOps.bpePairStats(
        table(s, dir, "documents"), "text", topN = 50)
    },

    // ---------------------------------------------------------------- HTML text extraction
    // the stage every web-crawl pipeline runs first: markup off,
    // content out, link density as the boilerplate signal. All per-row
    // regexp kernels — zero shuffle, scan speed at 100 TB. The corpus
    // is plain text, so the fixture synthesizes nav/footer-wrapped HTML
    // from doc_id + text (the d59/m03 generator pattern); the regex
    // classes used ('<[^>]*>', TextOps.AnchorPattern — shared verbatim
    // both sides) mean the same thing to java.util.regex and RE2.
    q("d62_html_extract",
      s"""WITH h AS (SELECT doc_id,
        |  '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title></head><body>'
        |  || '<nav><a href="/home">Home</a> <a href="/about">About Us</a>'
        |  || CASE WHEN doc_id % 3 = 0 THEN ' <a href="/more">More Links Here</a>' ELSE '' END
        |  || '</nav><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text || '</p>'
        |  || CASE WHEN doc_id % 2 = 0 THEN '<div class="footer"><a href="/contact">Contact</a> (c) Site</div>' ELSE '' END
        |  || '</body></html>' AS html FROM documents),
        |x AS (SELECT doc_id, html,
        |  trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'), ' +', ' ', 'g')) AS clean_text,
        |  coalesce(list_sum(list_transform(
        |    regexp_extract_all(html, '${TextOps.AnchorPattern}', 2), x -> length(x))), 0) AS anchor_chars
        |  FROM h)
        |SELECT doc_id, clean_text,
        |  CAST(len(string_split(html, '<')) - 1 AS INTEGER) AS n_tags,
        |  CAST(len(string_split(html, '<a ')) - 1 AS INTEGER) AS n_links,
        |  CAST(anchor_chars AS INTEGER) AS anchor_chars,
        |  round(anchor_chars / length(clean_text), 4) AS link_density
        |FROM x ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val id = col("doc_id")
      val html = concat(
        lit("<html><head><title>Doc "), id.cast("string"), lit("</title></head><body>"),
        lit("<nav><a href=\"/home\">Home</a> <a href=\"/about\">About Us</a>"),
        when(id % 3 === 0, lit(" <a href=\"/more\">More Links Here</a>")).otherwise(lit("")),
        lit("</nav><h1>Doc "), id.cast("string"), lit("</h1><p>"), col("text"), lit("</p>"),
        when(id % 2 === 0,
          lit("<div class=\"footer\"><a href=\"/contact\">Contact</a> (c) Site</div>"))
          .otherwise(lit("")),
        lit("</body></html>"))
      table(s, dir, "documents").select(id, html.as("__html"))
        .select(id,
          TextOps.stripHtml(col("__html")).as("clean_text"),
          (size(split(col("__html"), "<")) - 1).cast("int").as("n_tags"),
          (size(split(col("__html"), "<a ")) - 1).cast("int").as("n_links"),
          TextOps.anchorTextChars(col("__html")).cast("int").as("anchor_chars"),
          Qf.dround(TextOps.anchorTextChars(col("__html")).cast("double")
            / length(TextOps.stripHtml(col("__html"))), 4).as("link_density"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- classifier threshold sweep
    // the operating-point curve between training the quality filter
    // (d37) and deploying it (d32): one precision/recall/F1 row per
    // candidate cutoff. The corpus collapses to ≤101 per-bucket count
    // rows FIRST; the cumulative windows run over that model-sized
    // frame only (see MlOps.thresholdSweep). Scores are the d02
    // heuristic, labels a deterministic stopword-count rule, so the
    // oracle re-derives the whole curve.
    q("d63_threshold_sweep",
      s"""WITH s AS (SELECT
         |  round(0.5 * (1 - (len(list_filter($sqlTokens, t -> t IN ($stopList))) / len($sqlTokens)))
         |      + 0.5 * least(1.0, len($sqlTokens) / 100.0), 2) AS thr,
         |  CASE WHEN len(list_filter($sqlTokens, t -> t IN ($stopList))) >= 2 THEN 1 ELSE 0 END AS lab
         |  FROM documents),
         |b AS (SELECT thr, sum(lab) AS pos, count(*) - sum(lab) AS neg FROM s GROUP BY thr),
         |c AS (SELECT thr,
         |    sum(pos) OVER (ORDER BY thr DESC ROWS UNBOUNDED PRECEDING) AS tp,
         |    sum(neg) OVER (ORDER BY thr DESC ROWS UNBOUNDED PRECEDING) AS fp,
         |    sum(pos) OVER () - sum(pos) OVER (ORDER BY thr DESC ROWS UNBOUNDED PRECEDING) AS fn
         |  FROM b)
         |SELECT thr, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
         |  round(tp / (tp + fp), 4) AS prec,
         |  round(tp / (tp + fn), 4) AS rec,
         |  CASE WHEN tp = 0 THEN 0.0 ELSE round(
         |    2 * (tp / (tp + fp)) * (tp / (tp + fn))
         |      / ((tp / (tp + fp)) + (tp / (tp + fn))), 4) END AS f1
         |FROM c ORDER BY thr DESC""".stripMargin) { (s, dir) =>
      val scored = table(s, dir, "documents").select(
        TextOps.qualityScore(col("text")).as("__score"),
        (TextOps.stopwordCount(col("text")) >= 2).cast("int").as("__lab"))
      graft.operators.MlOps.thresholdSweep(scored, "__score", "__lab", decimals = 2)
        .select(col("thr"), col("tp"), col("fp"), col("fn"),
          col("precision").as("prec"), col("recall").as("rec"), col("f1"))
        .dumpSortedBy(col("thr").desc)
    },

    // ---------------------------------------------------------------- Matryoshka truncated-prefix search
    // MRL retrieval (Kusupati et al. 2022): approximate ranking on the
    // first 16 of 64 dims (¼ of the vector bytes — stored as its own
    // column at rest, the scan reads a quarter, the s14 column-pruning
    // regime), 4k candidates per query, exact full-dim re-rank.
    // Truncation has no engine-specific state, so unlike SQ8/LSH this
    // two-pass pipeline is fully deterministic — the oracle re-derives
    // BOTH stages and the result hash-matches.
    q("s15_matryoshka_topk", sqlMatryoshkaOracle) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      SimilarityOps.matryoshkaTopK(
        emb.filter(col("vec_id") < 8), "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5, prefixDim = 16, candFactor = 4)
        .dumpSorted("query_id", "rk")
    },

    // ---------------------------------------------------------------- MRL corpus at rest
    // s15's at-rest form: the 16-dim prefix stored as a first-class
    // parquet column, so the approximate pass scans (id, prefix) ALONE
    // — column pruning is the 4× scan-byte cut (PlanShapeSpec pins the
    // pruned ReadSchema), and the re-rank fetches only candidates'
    // float rows. The oracle is s15's — file-blind, truncating from
    // scratch — so the hash match proves the at-rest layout changed
    // nothing. Self-describing: a probe with drifted prefixDim fails
    // loudly (unit-tested).
    q("s16_matryoshka_at_rest", sqlMatryoshkaOracle) { (s, dir) =>
      val emb = table(s, dir, "embeddings")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/s16_mrl_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      SimilarityOps.writeMatryoshkaCorpus(emb, "vec_id", "embedding",
        prefixDim = 16, path)
      SimilarityOps.matryoshkaTopKAtRest(s, path,
        emb.filter(col("vec_id") < 8), "vec_id", "embedding", "vec_id",
        k = 5, prefixDim = 16, candFactor = 4)
        .dumpSorted("query_id", "rk")
    },

    // ---------------------------------------------------------------- video frame-hash dedup
    // the video-dedup recipe over sampled frames: payloads pair when
    // they share a frame hash (LSH-style bucket join — pairs meet only
    // inside a shared hash, never corpus × corpus), scored by Jaccard
    // of distinct-frame-hash sets. Frames are the deterministic
    // byte-chunk stand-in (every 2nd 8-byte chunk of the payload — the
    // m01 text-as-binary fixture), so the oracle re-derives the exact
    // same frames from the text and the result hash-matches; a real
    // keyframe decoder swaps into the sampleFrames seam without
    // touching anything downstream.
    q("m06_frame_dedup",
      """WITH fr AS (SELECT doc_id, text,
        |  unnest(range(0, greatest(CAST(floor(length(text) / 16) AS BIGINT), 1))) AS p
        |  FROM documents),
        |h AS (SELECT DISTINCT doc_id, md5(substr(text, CAST(p * 16 + 1 AS INTEGER), 8)) AS fh FROM fr),
        |sz AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
        |pr AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS c
        |  FROM h a JOIN h b ON a.fh = b.fh AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |j AS (SELECT a_id, b_id, c, round(c / (sa.n + sb.n - c), 4) AS jaccard
        |  FROM pr JOIN sz sa ON sa.doc_id = pr.a_id JOIN sz sb ON sb.doc_id = pr.b_id)
        |SELECT a_id, b_id, CAST(c AS INTEGER) AS n_common, jaccard
        |FROM j WHERE jaccard >= 0.5 ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
        .withColumn("__bin", col("text").cast("binary"))
      MultimodalOps.frameDedupPairs(docs, "doc_id", "__bin",
        frameBytes = 8, everyK = 2, minJaccard = 0.5)
        .orderBy("a_id", "b_id")
    },

    // ---------------------------------------------------------------- frame-signature ledger
    // m06's steady-state ingest form: corpus frame hashes at rest (the
    // d48 signature-ledger regime for the video modality) — admission
    // hashes each payload once, later batches probe stored (id, n, fh)
    // rows without re-reading any corpus payload. The query runs the
    // whole maintenance cycle (create from gen-1, append gen-2, replay
    // the same append crash-and-retry style, compact) before probing;
    // the oracle is file- and duplication-blind (recomputes both
    // sides' frame-hash sets from text), so the hash match proves the
    // at-rest round-trip and the maintenance cycle lost and invented
    // nothing.
    q("m08_frame_ledger",
      """WITH fr AS (SELECT doc_id, text,
        |  unnest(range(0, greatest(CAST(floor(length(text) / 16) AS BIGINT), 1))) AS p
        |  FROM documents),
        |h AS (SELECT DISTINCT doc_id, md5(substr(text, CAST(p * 16 + 1 AS INTEGER), 8)) AS fh FROM fr),
        |sz AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
        |pr AS (SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, count(*) AS c
        |  FROM h a JOIN h b ON a.fh = b.fh
        |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0 GROUP BY 1, 2),
        |j AS (SELECT new_id, corpus_id, c, round(c / (sa.n + sb.n - c), 4) AS jaccard
        |  FROM pr JOIN sz sa ON sa.doc_id = pr.new_id JOIN sz sb ON sb.doc_id = pr.corpus_id)
        |SELECT new_id, corpus_id, CAST(c AS INTEGER) AS n_common, jaccard
        |FROM j WHERE jaccard >= 0.5 ORDER BY new_id, corpus_id""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
        .withColumn("__bin", col("text").cast("binary"))
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/m08_frames_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      val gen2 = docs.filter((col("doc_id") % 10) > 5)
      MultimodalOps.writeFrameLedger(docs.filter((col("doc_id") % 10).between(1, 5)),
        "doc_id", "__bin", frameBytes = 8, everyK = 2, path)
      MultimodalOps.appendToFrameLedger(gen2, "doc_id", "__bin", 8, 2, path,
        batchId = Some("gen-2"))
      // crash-and-retry replay: exactly-once marker no-op (unmarked
      // tolerance is unit-covered in OperatorsSpec)
      MultimodalOps.appendToFrameLedger(gen2, "doc_id", "__bin", 8, 2, path,
        batchId = Some("gen-2"))
      MultimodalOps.compactFrameLedger(s, path, targetFiles = 4)
      MultimodalOps.frameDedupAgainstLedger(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "__bin", path,
        frameBytes = 8, everyK = 2, minJaccard = 0.5)
        // pair output is small by construction — single-partition sort
        // (the s08 rationale) instead of a range-partitioned global sort
        .coalesce(1).sortWithinPartitions("new_id", "corpus_id")
    },

    // ---------------------------------------------------------------- frame-ledger forget
    // right-to-be-forgotten for the video family (the d71 regime):
    // forgotten payloads' frame hashes leave the at-rest ledger — exact
    // here, every row is id-attributed — and later probes stop pairing
    // against them. The oracle recomputes cross pairs from text with
    // the forgotten slice excluded, so the hash match proves the purge
    // removed exactly the right rows and nothing else; re-admission
    // (forget → append → pairs return) is unit-pinned.
    q("m09_frame_forget",
      """WITH fr AS (SELECT doc_id, text,
        |  unnest(range(0, greatest(CAST(floor(length(text) / 16) AS BIGINT), 1))) AS p
        |  FROM documents),
        |h AS (SELECT DISTINCT doc_id, md5(substr(text, CAST(p * 16 + 1 AS INTEGER), 8)) AS fh FROM fr),
        |sz AS (SELECT doc_id, count(*) AS n FROM h GROUP BY doc_id),
        |pr AS (SELECT a.doc_id AS new_id, b.doc_id AS corpus_id, count(*) AS c
        |  FROM h a JOIN h b ON a.fh = b.fh
        |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0 AND b.doc_id % 3 <> 1
        |  GROUP BY 1, 2),
        |j AS (SELECT new_id, corpus_id, c, round(c / (sa.n + sb.n - c), 4) AS jaccard
        |  FROM pr JOIN sz sa ON sa.doc_id = pr.new_id JOIN sz sb ON sb.doc_id = pr.corpus_id)
        |SELECT new_id, corpus_id, CAST(c AS INTEGER) AS n_common, jaccard
        |FROM j WHERE jaccard >= 0.5 ORDER BY new_id, corpus_id""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
        .withColumn("__bin", col("text").cast("binary"))
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/m09_frames_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      MultimodalOps.writeFrameLedger(docs.filter((col("doc_id") % 10).between(1, 5)),
        "doc_id", "__bin", frameBytes = 8, everyK = 2, path)
      MultimodalOps.appendToFrameLedger(docs.filter((col("doc_id") % 10) > 5),
        "doc_id", "__bin", 8, 2, path)
      MultimodalOps.removeFromFrameLedger(
        docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 3 === 1)
          .select(col("doc_id")), "doc_id", path)
      MultimodalOps.frameDedupAgainstLedger(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "__bin", path,
        frameBytes = 8, everyK = 2, minJaccard = 0.5)
        // pair output is small by construction — single-partition sort
        // (the s08 rationale) instead of a range-partitioned global sort
        .coalesce(1).sortWithinPartitions("new_id", "corpus_id")
    },

    // ---------------------------------------------------------------- cross-document boilerplate scrub
    // the CCNet/RefinedWeb paragraph-frequency stage: a chunk appearing
    // in ≥ maxDf DISTINCT documents is boilerplate (headers, footers,
    // license blocks) and is cut from every document that carries it —
    // the complement of d30's passage dedup, which keeps one copy.
    // Chunking and the 32-bit md5 chunk key are the same fused
    // wordChunks kernel d30 proves parity for; the doc-frequency table
    // is corpus-vocab-sized and the scrub is one join back.
    q("d64_boilerplate_scrub", {
      val w = 12
      s"""WITH tok AS (SELECT doc_id, $sqlTokens AS t FROM documents),
         |ch0 AS (SELECT doc_id, t,
         |  unnest(range(0, CAST(ceil(len(t) / $w.0) AS BIGINT))) AS p FROM tok),
         |ch AS (SELECT doc_id, CAST(p AS INTEGER) AS pos,
         |  array_to_string(t[(p*$w+1):least(p*$w+$w, len(t))], ' ') AS chunk FROM ch0),
         |h AS (SELECT doc_id, pos, chunk, ${sqlHash("chunk", "")} AS hh FROM ch),
         |df AS (SELECT hh, count(DISTINCT doc_id) AS d FROM h GROUP BY hh),
         |j AS (SELECT h.doc_id, h.pos, h.chunk, df.d < 2 AS keep
         |  FROM h JOIN df USING (hh))
         |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_lines,
         |  CAST(count(*) FILTER (WHERE keep) AS INTEGER) AS n_kept,
         |  string_agg(chunk, ' ' ORDER BY pos) FILTER (WHERE keep) AS text_clean
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      graft.operators.CurationOps.boilerplateLines(
        table(s, dir, "documents"), "doc_id", "text", w = 12, maxDf = 2)
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- word-list content gate
    // the C4 §2.2 policy-list filter as a per-source report: drop any
    // document whose TOKENS intersect the list (token-exact — no
    // substring Scunthorpe hits), count the surviving token budget per
    // source. One scan, per-row kernel, one source-keyed agg; the list
    // is a plan literal. The fixture list pairs a common corpus word
    // with an absent one, so both the hit and miss paths are exercised.
    q("d65_content_filter",
      s"""WITH f AS (SELECT source,
         |  list_has_any($sqlTokens, ['slow', 'deprecated']) AS hit,
         |  len($sqlTokens) AS nt FROM documents)
         |SELECT source, CAST(count(*) AS INTEGER) AS n_docs,
         |  CAST(count(*) FILTER (WHERE hit) AS INTEGER) AS n_dropped,
         |  round(count(*) FILTER (WHERE hit) / count(*), 4) AS drop_ratio,
         |  CAST(coalesce(sum(nt) FILTER (WHERE NOT hit), 0) AS BIGINT) AS n_tokens_kept
         |FROM f GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      val hit = TextOps.containsAnyWord(col("text"), Seq("slow", "deprecated"))
      table(s, dir, "documents")
        .select(col("source"), hit.as("__hit"),
          TextOps.tokenCount(col("text")).cast("long").as("__nt"))
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("int").as("n_docs"),
          sum(when(col("__hit"), 1).otherwise(0)).cast("int").as("n_dropped"),
          Qf.dround(sum(when(col("__hit"), 1).otherwise(0)) / count(lit(1)), 4)
            .as("drop_ratio"),
          coalesce(sum(when(!col("__hit"), col("__nt"))), lit(0L)).as("n_tokens_kept"))
        .dumpSorted("source")
    },

    // ---------------------------------------------------------------- cluster-assignment ledger
    // d17's INGEST LOOP: near-dup cluster assignments maintained at
    // rest. The conformance run builds the ledger from the even half,
    // advances the odd half (plus a crash-and-retry REPLAY of that
    // advance), compacts, and reads the assignments — against a
    // file-blind oracle that clusters the WHOLE corpus from scratch
    // (d17's recursive-closure chain, extended to label singletons by
    // themselves). The hash match proves incremental banding + label
    // lifting + remap reach exactly the from-scratch connectivity and
    // min-id labels, and that the replay invented nothing.
    q("d66_cluster_ledger", {
      def bucket(b: Int) = (0 until 4).map(r => s"CAST(mh${b * 4 + r} AS VARCHAR)")
        .mkString("md5(", " || '_' || ", ")")
      s"""WITH RECURSIVE sh AS (SELECT doc_id, $sqlHashedShingles AS hs FROM documents),
         |sig AS (SELECT doc_id, $sqlMh8 FROM sh),
         |bands AS (
         |  SELECT doc_id, 0 AS band, ${bucket(0)} AS bucket FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, ${bucket(1)} AS bucket FROM sig),
         |cand AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |e AS (SELECT d1 AS u, d2 AS v FROM cand UNION SELECT d2, d1 FROM cand),
         |r(u, v) AS (SELECT u, v FROM e UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u),
         |lab AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM r GROUP BY u),
         |al AS (SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster_id
         |  FROM (SELECT DISTINCT doc_id FROM documents) d LEFT JOIN lab l USING (doc_id))
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM al ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d66_cl_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      val odd = docs.filter(col("doc_id") % 2 =!= 0)
      DedupOps.writeClusterLedger(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", path)
      // marked advance + replay (d90's regime): the retry takes the
      // exactly-once fast-path and must invent nothing — the UNMARKED
      // append-tolerant replay stays covered by OperatorsSpec and
      // LedgerManifestSpec, which re-advance without a batchId
      DedupOps.advanceClusterLedger(odd, "doc_id", "text", path,
        batchId = Some("odd-1"))
      DedupOps.advanceClusterLedger(odd, "doc_id", "text", path,
        batchId = Some("odd-1")) // replay: no-op via the marker
      DedupOps.compactClusterLedger(s, path)
      val labels = DedupOps.readClusterAssignments(s, path)
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      // sizes via partial-agg + same-key join, not count-over-window —
      // the d17 rationale (a mega-cluster must not buffer in one task)
      val sizes = labels.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- perplexity buckets (CCNet)
    // CCNet's head/middle/tail split: per-LANGUAGE perplexity terciles
    // of the bigram-LM score (d34's), every document bucketed, token
    // budget per (lang, bucket) — the table a data-mixing plan reads.
    // Composition: the d34 scorer feeds the d51 percentile-broadcast
    // regime (exact per-group quantiles via the histogram-selection
    // plan, model-sized broadcast back). Bucket boundaries compare
    // 4dp-ROUNDED nll against 4dp-rounded tercile on BOTH sides, so
    // the cut is ulp-safe cross-engine (d34 pins nll parity at 4dp,
    // d51 pins the interpolation).
    q("d67_perplexity_buckets",
      s"""WITH lst AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
         |big AS (
         |  SELECT doc_id, unnest(list_zip(l[:len(l)-1], l[2:])) AS z
         |  FROM lst WHERE len(l) >= 2),
         |pairs AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM big),
         |c2 AS (SELECT w1, w2, count(*) AS n2 FROM pairs GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS n1 FROM pairs GROUP BY 1),
         |v AS (SELECT count(DISTINCT tok) AS vocab
         |      FROM (SELECT unnest(l) AS tok FROM lst)),
         |nll AS (
         |  SELECT p.doc_id, -ln((c2.n2 + 1.0) / (c1.n1 + v.vocab)) AS nl
         |  FROM pairs p JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v),
         |sc AS (SELECT n.doc_id, d.lang, len(string_split(trim(d.text), ' ')) AS n_tok,
         |  round(avg(n.nl), 4) AS nll_r
         |  FROM nll n JOIN documents d USING (doc_id) GROUP BY 1, 2, 3),
         |qs AS (SELECT lang,
         |  round(quantile_cont(nll_r, 1.0/3), 4) AS lo,
         |  round(quantile_cont(nll_r, 2.0/3), 4) AS hi
         |  FROM sc GROUP BY lang),
         |b AS (SELECT sc.lang,
         |  CASE WHEN nll_r <= lo THEN 'head'
         |       WHEN nll_r <= hi THEN 'middle' ELSE 'tail' END AS bucket, n_tok
         |  FROM sc JOIN qs ON sc.lang = qs.lang)
         |SELECT lang, bucket, CAST(count(*) AS INTEGER) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import graft.operators.{CurationOps, PercentileOps}
      val docs = table(s, dir, "documents")
      // CCNet's actual staging: the LM scores MATERIALIZE once (they are
      // reused by the terciles, the bucket assignment, and any later
      // filter), and the quantile + join passes read the compact scored
      // table — composing lazily instead re-ran the two-corpus-scan
      // scorer once per downstream pass (measured 3.6 s vs 1.3 s warm)
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d67_ppl_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      val scored = sharedLmScores(s, dir)
        .select(col("doc_id"), Qf.dround(col("avg_nll_raw"), 4).as("nll_r"))
        .join(docs.select(col("doc_id"), col("lang"),
          TextOps.tokenCount(col("text")).cast("long").as("n_tok")), Seq("doc_id"))
      scored.write.mode("overwrite").parquet(path)
      // read back with the writer's own schema (all-nullable, what
      // inference returns for parquet) — skips the per-run footer
      // schema-inference job on a path we just wrote
      val sc = s.read.schema(org.apache.spark.sql.types.StructType(
        scored.schema.fields.map(_.copy(nullable = true)))).parquet(path)
      val qs = PercentileOps.exactQuantilesSelect(sc, Seq("lang"),
        Seq(("nll_r", col("nll_r"), Seq(("lo", 1.0 / 3, false), ("hi", 2.0 / 3, false)))))
      sc.join(broadcast(qs), Seq("lang"))
        .select(col("lang"),
          when(col("nll_r") <= Qf.dround(col("lo"), 4), "head")
            .when(col("nll_r") <= Qf.dround(col("hi"), 4), "middle")
            .otherwise("tail").as("bucket"),
          col("n_tok"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).cast("int").as("n_docs"),
          sum(col("n_tok")).as("n_tokens"))
        .dumpSorted("lang", "bucket")
    },

    // ---------------------------------------------------------------- leak-free eval set (capstone)
    // the eval-set construction recipe with its leakage guard in one
    // plan: a stable-hash ~10% candidate sample, then every candidate
    // that shares an LSH band bucket with ANY remaining train document
    // (d38's near-dup criterion — catches the paraphrase-level leaks
    // exact dedup misses) is ejected. Reported per language: candidates,
    // leaks ejected, final eval size. Shapes: one signature pass over
    // the corpus, the banded join meets only inside shared buckets, the
    // guard is an anti-join — the same scale story as d38.
    q("d77_eval_set_guard", {
      def bucket(b: Int) = (0 until 4).map(r => s"CAST(mh${b * 4 + r} AS VARCHAR)")
        .mkString("md5(", " || '_' || ", ")")
      def isEvalOf(c: String) =
        s"${sqlHash(s"CAST($c AS VARCHAR)", "eval")} % 100 < 10"
      s"""WITH sh AS (SELECT doc_id, $sqlHashedShingles AS hs FROM documents),
         |sig AS (SELECT doc_id, $sqlMh8 FROM sh),
         |bands AS (
         |  SELECT doc_id, 0 AS band, ${bucket(0)} AS bucket FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, ${bucket(1)} AS bucket FROM sig),
         |leak AS (
         |  SELECT DISTINCT a.doc_id FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.bucket = b.bucket
         |  WHERE ${isEvalOf("a.doc_id")}
         |    AND NOT (${isEvalOf("b.doc_id")})),
         |ev AS (SELECT doc_id, lang FROM documents WHERE ${isEvalOf("doc_id")})
         |SELECT lang, CAST(count(*) AS INTEGER) AS n_candidates,
         |  CAST(count(l.doc_id) AS INTEGER) AS n_leaked,
         |  CAST(count(*) - count(l.doc_id) AS INTEGER) AS n_eval
         |FROM ev LEFT JOIN leak l USING (doc_id)
         |GROUP BY lang ORDER BY lang""".stripMargin
    }) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val isEval = DedupOps.md5Hash32(col("doc_id").cast("string"), "eval") % 100 < 10
      val ev = docs.filter(isEval)
      val leaks = DedupOps.crossDedupPairs(
        ev, docs.filter(!isEval), "doc_id", "text",
        numHashes = 8, bandSize = 4, shingleSize = 5)
        .select(col("new_id").as("doc_id")).distinct()
        .withColumn("__leak", lit(1))
      ev.join(leaks, Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("int").as("n_candidates"),
          sum(coalesce(col("__leak"), lit(0))).cast("int").as("n_leaked"),
          (count(lit(1)) - sum(coalesce(col("__leak"), lit(0)))).cast("int").as("n_eval"))
        .dumpSorted("lang")
    },

    // ---------------------------------------------------------------- quantile-histogram ledger
    // incremental per-key QUANTILES over a growing corpus — the
    // distribution companion to d41 (mergeable sums) and d46
    // (mergeable distinct sketches): "p50/p90/p99 document length per
    // language, across everything ingest has admitted" without
    // re-reading the corpus. Rows are (key, value >> shift, count) —
    // fixed power-of-two buckets merge by count addition and are
    // DETERMINISTIC (probe depends only on data + shift, so
    // incremental ≡ from-scratch and the oracle re-derives the same
    // bounds from scratch in SQL — blind to the three-generation
    // cycle, the exactly-once replay, and the compaction the query
    // runs). The probe returns the bucket [lo, hi] containing the
    // percentile_disc value — error bound 2^shift value units,
    // explicit and user-chosen.
    q("d78_quantile_ledger",
      """WITH v AS (SELECT lang, CAST(length(text) AS BIGINT) AS len FROM documents),
        |h AS (SELECT lang, len // 16 AS b, count(*) AS c FROM v GROUP BY 1, 2),
        |cum AS (SELECT lang, b, sum(c) OVER (PARTITION BY lang ORDER BY b) AS endc,
        |        sum(c) OVER (PARTITION BY lang) AS n FROM h),
        |p AS (SELECT unnest([0.5, 0.9, 0.99]) AS prob),
        |sel AS (SELECT lang, prob, min(b) AS b FROM cum, p
        |        WHERE endc >= ceil(prob * n) GROUP BY 1, 2)
        |SELECT lang, prob, CAST(b * 16 AS BIGINT) AS lo,
        |  CAST(b * 16 + 15 AS BIGINT) AS hi
        |FROM sel ORDER BY lang, prob""".stripMargin) { (s, dir) =>
      import graft.operators.CurationOps
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("len"))
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d78_qh_pid${ProcessHandle.current.pid}" +
          s"_${dir.hashCode.toHexString}")
      CurationOps.writeQuantileLedger(
        docs.filter(col("doc_id") % 10 < 6), "lang", "len", shift = 4, path)
      CurationOps.advanceQuantileLedger(
        docs.filter(col("doc_id") % 10 === 6), "lang", "len", 4, path,
        batchId = Some("gen-2"))
      val g3 = docs.filter(col("doc_id") % 10 > 6)
      CurationOps.advanceQuantileLedger(g3, "lang", "len", 4, path,
        batchId = Some("gen-3"))
      CurationOps.advanceQuantileLedger(g3, "lang", "len", 4, path,
        batchId = Some("gen-3")) // crash-and-retry replay: exactly-once no-op
      CurationOps.compactQuantileLedger(s, path, targetFiles = 2)
      CurationOps.quantilesFromLedger(s, path, Seq(0.5, 0.9, 0.99))
        .dumpSorted("lang", "prob")
    },

    // ---------------------------------------------------------------- KLL quantile-sketch ledger
    // the mergeable-quantile family member d78 deliberately refuses:
    // DOUBLE measures with no meaningful integer scaling (here: mean
    // word length per document — a ratio). Deterministic MRL/KLL level
    // stack (alternating-parity collapse, no RNG) so the ledger cycle
    // replays bit-exactly; rank error is O(log(n/k)/k), AccuracySpec-
    // gated at ≤0.035 rank error vs the exact quantile, with min/max
    // exact. The ESTIMATE has no cross-engine oracle (the same reason
    // q29's HLL and q40b's approx_percentile values are never hashed)
    // — what hash-matches is the DECISION RELATION (the r15 d119
    // regime): per (key, prob), the ledger's exact n (replayed by the
    // oracle as a per-key count) and the verdict that the estimate's
    // RANK landed within 0.07 of the target rank (2× the AccuracySpec
    // gate's 0.035; deterministic sketch → stable verdict). The rank
    // check runs Spark-side against the same corpus frame — the
    // oracle asserts the verdict as a literal, so a sketch that ever
    // drifted out of its MRL bound flips the hash red. Retraction =
    // REBUILD — the d71 family boundary: sums subtract, sketches
    // don't.
    q("d110_kll_ledger",
      """WITH m AS (SELECT lang FROM documents)
        |SELECT lang, prob, CAST(count(*) AS BIGINT) AS n, TRUE AS rank_ok
        |FROM m, (SELECT unnest(CAST([0.25, 0.5, 0.9, 0.99] AS DOUBLE[])) AS prob) p
        |GROUP BY lang, prob ORDER BY lang, prob""".stripMargin) { (s, dir) =>
      import graft.operators.KllSketch
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          (length(col("text")).cast("double") /
            greatest(size(split(trim(col("text")), " +")), lit(1)).cast("double"))
            .as("mwl"))
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d110_kll_pid${ProcessHandle.current.pid}" +
          s"_${dir.hashCode.toHexString}")
      KllSketch.writeKllLedger(
        docs.filter(col("doc_id") % 10 < 6), "lang", "mwl", k = 128, path = path)
      KllSketch.advanceKllLedger(
        docs.filter(col("doc_id") % 10 === 6), "lang", "mwl", 128, path,
        batchId = Some("gen-2"))
      val g3 = docs.filter(col("doc_id") % 10 > 6)
      KllSketch.advanceKllLedger(g3, "lang", "mwl", 128, path,
        batchId = Some("gen-3"))
      KllSketch.advanceKllLedger(g3, "lang", "mwl", 128, path,
        batchId = Some("gen-3")) // crash-and-retry replay: exactly-once no-op
      KllSketch.compactKllLedger(s, path)
      val est = KllSketch.quantilesFromKllLedger(s, path, Seq(0.25, 0.5, 0.9, 0.99))
        .select(col("key").as("lang"), col("prob"), col("est"), col("n"))
      // rank check against the same corpus frame: below = |{v ≤ est}|
      // per key, target = ceil(p·n) — the AccuracySpec gate's exact
      // arithmetic, at 2× its bound. est rows are model-sized (keys ×
      // probs) → broadcast; the corpus streams past once.
      docs.select(col("lang"), col("mwl"))
        .join(broadcast(est), Seq("lang"))
        .groupBy(col("lang"), col("prob"))
        .agg(first(col("n")).as("n"),
          sum(when(col("mwl") <= col("est"), 1L).otherwise(0L)).as("__below"))
        .select(col("lang"), col("prob"), col("n"),
          (abs(col("__below") - ceil(col("prob") * col("n")))
            <= lit(0.07) * col("n")).as("rank_ok"))
        .dumpSorted("lang", "prob")
    },

    // ---------------------------------------------------------------- vocab-count ledger
    // EXACT heavy hitters over a growing corpus: per-key token counts
    // at rest, merged by addition — an advance tokenizes only the
    // BATCH (at 100 TB the corpus re-tokenize is the cost that
    // matters). The CMS (d22b) stays the fixed-size point-lookup
    // option; this is the exact companion that also answers top-k,
    // which a CMS cannot enumerate. The probe is the bounded-heap
    // per-key top-k (d52's discipline — no whole-vocab window sort).
    // Oracle re-derives counts + ranks from scratch, blind to the
    // cycle (write + 2 advances + exactly-once replay + compact).
    q("d79_vocab_ledger",
      """WITH t AS (SELECT lang, unnest(string_split(trim(text), ' ')) AS token FROM documents),
        |c AS (SELECT lang, token, count(*) AS tc FROM t WHERE token <> '' GROUP BY 1, 2),
        |r AS (SELECT lang, token, tc,
        |      row_number() OVER (PARTITION BY lang ORDER BY tc DESC, token) AS rk FROM c)
        |SELECT lang, CAST(rk AS INTEGER) AS rk, token, CAST(tc AS BIGINT) AS tc
        |FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      import graft.operators.{SketchOps, TextOps}
      val docs = table(s, dir, "documents")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d79_vocab_pid${ProcessHandle.current.pid}" +
          s"_${dir.hashCode.toHexString}")
      SketchOps.writeVocabLedger(
        docs.filter(col("doc_id") % 10 < 6), "lang", TextOps.tokens(col("text")), path)
      SketchOps.advanceVocabLedger(
        docs.filter(col("doc_id") % 10 === 6), "lang", TextOps.tokens(col("text")),
        path, batchId = Some("gen-2"))
      val g3 = docs.filter(col("doc_id") % 10 > 6)
      SketchOps.advanceVocabLedger(g3, "lang", TextOps.tokens(col("text")), path,
        batchId = Some("gen-3"))
      SketchOps.advanceVocabLedger(g3, "lang", TextOps.tokens(col("text")), path,
        batchId = Some("gen-3")) // crash-and-retry replay: exactly-once no-op
      SketchOps.compactVocabLedger(s, path, targetFiles = 2)
      SketchOps.topTokensFromLedger(s, path, k = 5)
        .dumpSorted("lang", "rk")
    },

    // ---------------------------------------------------------------- ledger retraction (right-to-be-forgotten, mergeable families)
    // the d71 regime extended to the COUNT-mergeable ledgers: counts
    // merge by addition in both directions, so forgetting is exact
    // SUBTRACTION of the forgotten rows' contribution (the caller
    // supplies them — counts are not id-attributed, the documented
    // boundary), with emptied rows leaving the store and any
    // would-go-negative retraction failing loudly. Each oracle
    // re-derives the probe from scratch over (admitted − forgotten)
    // documents, blind to the write/advance/retract cycle — the hash
    // match proves the subtraction removed exactly the forgotten
    // rows' contribution and nothing else.
    q("d80_quantile_ledger_forget",
      """WITH v AS (SELECT lang, CAST(length(text) AS BIGINT) AS len
        |  FROM documents WHERE doc_id % 3 <> 0),
        |h AS (SELECT lang, len // 16 AS b, count(*) AS c FROM v GROUP BY 1, 2),
        |cum AS (SELECT lang, b, sum(c) OVER (PARTITION BY lang ORDER BY b) AS endc,
        |        sum(c) OVER (PARTITION BY lang) AS n FROM h),
        |p AS (SELECT unnest([0.5, 0.9, 0.99]) AS prob),
        |sel AS (SELECT lang, prob, min(b) AS b FROM cum, p
        |        WHERE endc >= ceil(prob * n) GROUP BY 1, 2)
        |SELECT lang, prob, CAST(b * 16 AS BIGINT) AS lo,
        |  CAST(b * 16 + 15 AS BIGINT) AS hi
        |FROM sel ORDER BY lang, prob""".stripMargin) { (s, dir) =>
      import graft.operators.CurationOps
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("len"))
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d80_qhf_pid${ProcessHandle.current.pid}" +
          s"_${dir.hashCode.toHexString}")
      CurationOps.writeQuantileLedger(
        docs.filter(col("doc_id") % 10 < 6), "lang", "len", shift = 4, path)
      CurationOps.advanceQuantileLedger(
        docs.filter(col("doc_id") % 10 >= 6), "lang", "len", 4, path,
        batchId = Some("gen-2"))
      CurationOps.retractFromQuantileLedger(
        docs.filter(col("doc_id") % 3 === 0), "lang", "len", 4, path,
        batchId = Some("purge-1"))
      CurationOps.quantilesFromLedger(s, path, Seq(0.5, 0.9, 0.99))
        .dumpSorted("lang", "prob")
    },

    q("d81_vocab_ledger_forget",
      """WITH t AS (SELECT lang, unnest(string_split(trim(text), ' ')) AS token
        |  FROM documents WHERE doc_id % 3 <> 0),
        |c AS (SELECT lang, token, count(*) AS tc FROM t WHERE token <> '' GROUP BY 1, 2),
        |r AS (SELECT lang, token, tc,
        |      row_number() OVER (PARTITION BY lang ORDER BY tc DESC, token) AS rk FROM c)
        |SELECT lang, CAST(rk AS INTEGER) AS rk, token, CAST(tc AS BIGINT) AS tc
        |FROM r WHERE rk <= 5 ORDER BY lang, rk""".stripMargin) { (s, dir) =>
      import graft.operators.{SketchOps, TextOps}
      val docs = table(s, dir, "documents")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d81_vocf_pid${ProcessHandle.current.pid}" +
          s"_${dir.hashCode.toHexString}")
      SketchOps.writeVocabLedger(
        docs.filter(col("doc_id") % 10 < 6), "lang", TextOps.tokens(col("text")), path)
      SketchOps.advanceVocabLedger(
        docs.filter(col("doc_id") % 10 >= 6), "lang", TextOps.tokens(col("text")),
        path, batchId = Some("gen-2"))
      SketchOps.retractFromVocabLedger(
        docs.filter(col("doc_id") % 3 === 0), "lang", TextOps.tokens(col("text")),
        path, batchId = Some("purge-1"))
      SketchOps.topTokensFromLedger(s, path, k = 5)
        .dumpSorted("lang", "rk")
    },

    q("d82_stats_ledger_forget",
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len($sqlTokens)) AS BIGINT) AS n_tokens,
         |  CAST(sum(length(text)) AS BIGINT) AS n_chars
         |FROM documents WHERE doc_id % 3 <> 0
         |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      import graft.operators.CurationOps
      val docs = table(s, dir, "documents")
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d82_stf_pid${ProcessHandle.current.pid}" +
          s"_${dir.hashCode.toHexString}")
      CurationOps.writeStatsLedger(
        docs.filter(col("doc_id") % 5 =!= 0), "source", "text", path)
      CurationOps.advanceStatsLedger(
        docs.filter(col("doc_id") % 5 === 0), "source", "text", path,
        batchId = Some("gen-2"))
      CurationOps.retractFromStatsLedger(
        docs.filter(col("doc_id") % 3 === 0), "source", "text", path,
        batchId = Some("purge-1"))
      graft.operators.LedgerGuard.readLedger(s, path).dumpSorted("source")
    },

    // ---------------------------------------------------------------- incremental TF-IDF (ledger-backed)
    // d18's scoring with the corpus-wide pass moved to rest: df lives
    // in a vocab ledger built over per-doc DISTINCT tokens, N in the
    // stats ledger — an ingest batch scores its keywords in
    // O(batch + vocab) without re-reading the corpus (at 100 TB the
    // df/N recompute is the cost that matters). The oracle re-derives
    // df/N from scratch over all documents and scores the same probe
    // slice — blind to the two-generation ledger cycle — so the hash
    // match proves ledger-backed df/N equals the from-scratch pass.
    q("d83_incremental_tfidf",
      s"""WITH tok AS (SELECT doc_id, unnest($sqlTokens) AS token FROM documents),
         |tfs0 AS (SELECT doc_id, token, count(*) AS tf FROM tok
         |         WHERE token <> '' GROUP BY 1, 2),
         |dfs AS (SELECT token, count(*) AS df FROM tfs0 GROUP BY 1),
         |n AS (SELECT count(*) AS ndocs FROM documents),
         |tfs AS (SELECT * FROM tfs0 WHERE doc_id % 7 = 0),
         |scored AS (
         |  SELECT doc_id, token, tf, df, round(tf * ln(ndocs / df), 4) AS tfidf
         |  FROM tfs JOIN dfs USING (token), n),
         |ranked AS (SELECT doc_id, token, tf, df, tfidf,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS INTEGER) AS rk
         |  FROM scored)
         |SELECT doc_id, token, tf, df, tfidf, rk FROM ranked WHERE rk <= 3
         |ORDER BY doc_id, rk""".stripMargin) { (s, dir) =>
      import graft.operators.{CurationOps, SketchOps, TextOps}
      val docs = table(s, dir, "documents")
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val dfPath = Registry.scratchDir(s"/tmp/graft_conformance/d83_df_$tag")
      val stPath = Registry.scratchDir(s"/tmp/graft_conformance/d83_st_$tag")
      val dtok = array_distinct(TextOps.tokens(col("text")))
      val keyed = docs.withColumn("corpus", lit("all"))
      // DF-vocab and stats chains touch DISJOINT stores — overlap them
      // (program order holds within each store; both legs awaited)
      Qf.concurrently(
        () => {
          SketchOps.writeVocabLedger(keyed.filter(col("doc_id") % 10 < 6),
            "corpus", dtok, dfPath, tokenizerId = "ws-distinct")
          SketchOps.advanceVocabLedger(keyed.filter(col("doc_id") % 10 >= 6),
            "corpus", dtok, dfPath, tokenizerId = "ws-distinct",
            batchId = Some("gen-2"))
        },
        () => {
          CurationOps.writeStatsLedger(
            docs.filter(col("doc_id") % 10 < 6), "source", "text", stPath)
          CurationOps.advanceStatsLedger(
            docs.filter(col("doc_id") % 10 >= 6), "source", "text", stPath,
            batchId = Some("gen-2"))
        })
      SketchOps.tfidfAgainstLedgers(docs.filter(col("doc_id") % 7 === 0),
        "doc_id", TextOps.tokens(col("text")), dfPath, stPath, k = 3)
        .orderBy("doc_id", "rk")
    },

    // ---------------------------------------------------------------- PII scrubbing
    // the redaction pass every RELEASED training corpus runs (Dolma/
    // BigScience regime): emails, IPv4s, international phones →
    // placeholder tokens, with per-class counts reported BEFORE
    // rewriting (redaction observability). The rules are written in
    // the common java.util.regex ∩ RE2 subset and the oracle runs the
    // IDENTICAL pattern text (interpolated from the same constants)
    // through DuckDB's RE2 — the hash match proves both engines find
    // the same spans. The fixture plants one known email + IP + phone
    // per row derived from doc_id, so every rule is exercised on
    // known-positive content, not vacuously green. Per-row codegen
    // kernels, zero shuffle at any corpus size.
    q("d84_pii_scrub", {
      import graft.operators.TextOps
      val aug = "coalesce(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)" +
        " || '@example.com or 10.' || CAST(doc_id % 256 AS VARCHAR)" +
        " || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR)" +
        " || ' tel +1 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)"
      s"""WITH a AS (SELECT doc_id, $aug AS aug FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(aug, '${TextOps.PiiEmailPattern}')) AS INTEGER) AS n_email,
         |  CAST(len(regexp_extract_all(aug, '${TextOps.PiiIpv4Pattern}')) AS INTEGER) AS n_ip,
         |  CAST(len(regexp_extract_all(aug, '${TextOps.PiiPhonePattern}')) AS INTEGER) AS n_phone,
         |  regexp_replace(regexp_replace(regexp_replace(aug,
         |    '${TextOps.PiiEmailPattern}', '<EMAIL>', 'g'),
         |    '${TextOps.PiiIpv4Pattern}', '<IP>', 'g'),
         |    '${TextOps.PiiPhonePattern}', '<PHONE>', 'g') AS scrubbed
         |FROM a ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import graft.operators.TextOps
      val aug = concat(
        coalesce(col("text"), lit("")), lit(" contact user"),
        col("doc_id").cast("string"), lit("@example.com or 10."),
        (col("doc_id") % 256).cast("string"), lit(".0."),
        ((col("doc_id") * 7) % 256).cast("string"), lit(" tel +1 555-"),
        (col("doc_id") % 9000 + 1000).cast("string"))
      table(s, dir, "documents")
        .select(col("doc_id"), aug.as("aug"))
        .select(col("doc_id"),
          TextOps.piiCounts(col("aug")).as("__p"),
          TextOps.scrubPii(col("aug")).as("scrubbed"))
        .select(col("doc_id"), col("__p.n_email").as("n_email"),
          col("__p.n_ip").as("n_ip"), col("__p.n_phone").as("n_phone"),
          col("scrubbed"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- BPE vocabulary learning
    // the tokenizer-training loop d61's one-round pair stats feed
    // (Sennrich 2016): k ordered merges learned from the corpus. Scale
    // discipline = the word-count collapse: one corpus pass builds the
    // vocab-sized (word, count) table; every round is a zip-pair count
    // over THAT + a 1-row argmax + a vocab-sized rewrite. The oracle
    // replays three rounds as chained CTEs (the d72 chained-round
    // regime): pair argmax with the same (freq desc, lhs, rhs) byte
    // tie order, then the merge applied as a delimiter-wrapped string
    // replace — left-to-right non-overlapping, provably the same
    // rewrite as the engine's replace-last fold — so the hash match
    // pins both the argmax order and the merge semantics per round.
    q("d85_bpe_learn",
      """WITH tok AS (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS cnt FROM tok WHERE w <> '' GROUP BY w),
        |l1 AS (SELECT cnt, regexp_extract_all(w, '[\s\S]') AS l FROM wc),
        |p1 AS (SELECT l[i] AS a, l[i+1] AS b, sum(cnt) AS freq
        |       FROM l1, unnest(range(1, len(l))) AS t(i) GROUP BY 1, 2),
        |m1 AS (SELECT a, b, freq FROM p1 ORDER BY freq DESC, a, b LIMIT 1),
        |s2 AS (SELECT cnt, replace(
        |         array_to_string(list_transform(l, x -> chr(1) || x || chr(2)), ''),
        |         chr(1) || m1.a || chr(2) || chr(1) || m1.b || chr(2),
        |         chr(1) || m1.a || m1.b || chr(2)) AS str
        |       FROM l1, m1),
        |l2 AS (SELECT cnt, regexp_extract_all(str,
        |         chr(1) || '([^' || chr(1) || chr(2) || ']*)' || chr(2), 1) AS l FROM s2),
        |p2 AS (SELECT l[i] AS a, l[i+1] AS b, sum(cnt) AS freq
        |       FROM l2, unnest(range(1, len(l))) AS t(i) GROUP BY 1, 2),
        |m2 AS (SELECT a, b, freq FROM p2 ORDER BY freq DESC, a, b LIMIT 1),
        |s3 AS (SELECT cnt, replace(str,
        |         chr(1) || m2.a || chr(2) || chr(1) || m2.b || chr(2),
        |         chr(1) || m2.a || m2.b || chr(2)) AS str
        |       FROM s2, m2),
        |l3 AS (SELECT cnt, regexp_extract_all(str,
        |         chr(1) || '([^' || chr(1) || chr(2) || ']*)' || chr(2), 1) AS l FROM s3),
        |p3 AS (SELECT l[i] AS a, l[i+1] AS b, sum(cnt) AS freq
        |       FROM l3, unnest(range(1, len(l))) AS t(i) GROUP BY 1, 2),
        |m3 AS (SELECT a, b, freq FROM p3 ORDER BY freq DESC, a, b LIMIT 1)
        |SELECT CAST(1 AS INTEGER) AS rk, a AS lhs, b AS rhs, CAST(freq AS BIGINT) AS freq FROM m1
        |UNION ALL SELECT 2, a, b, CAST(freq AS BIGINT) FROM m2
        |UNION ALL SELECT 3, a, b, CAST(freq AS BIGINT) FROM m3 ORDER BY rk""".stripMargin) { (s, dir) =>
      {
        // prefix of the shared 8-merge learn (prefix-stability note at
        // cachedBpeMerges) — identical rows to a 3-merge learn
        import s.implicits._
        cachedBpeMerges(s, dir).filter(_._1 <= 3)
          .toDF("rk", "lhs", "rhs", "freq")
          .dumpSorted("rk")
      }
    },

    // ---------------------------------------------------------------- TRUE WordPiece learning
    // the likelihood objective (Schuster & Nakajima 2012) d85's raw-
    // frequency argmax is NOT: each round merges the pair maximizing
    // freq(ab)/(freq(a)·freq(b)) over the CURRENT segmentation. Same
    // word-count-collapse scale shape as d85; the oracle replays three
    // rounds as chained CTEs with per-round symbol-frequency tables in
    // the denominator, same (score desc, lhs, rhs) tie order, same
    // delimiter-wrapped replace for the merge. All-integer output keeps
    // the cross-engine hash exact; scores are doubles from exact longs
    // (< 2^53), ordered identically by both engines.
    q("d109_wordpiece_learn",
      """WITH tok AS (SELECT unnest(string_split(trim(text), ' ')) AS w FROM documents),
        |wc AS (SELECT w, count(*) AS cnt FROM tok WHERE w <> '' GROUP BY w),
        |l1 AS (SELECT cnt, regexp_extract_all(w, '[\s\S]') AS l FROM wc),
        |u1 AS (SELECT l[i] AS sym, sum(cnt) AS f
        |       FROM l1, unnest(range(1, len(l) + 1)) AS t(i) GROUP BY 1),
        |p1 AS (SELECT l[i] AS a, l[i+1] AS b, sum(cnt) AS freq
        |       FROM l1, unnest(range(1, len(l))) AS t(i) GROUP BY 1, 2),
        |m1 AS (SELECT a, b, freq, fa.f AS lf, fb.f AS rf
        |       FROM p1 JOIN u1 fa ON fa.sym = p1.a JOIN u1 fb ON fb.sym = p1.b
        |       ORDER BY CAST(freq AS DOUBLE) / (CAST(fa.f AS DOUBLE) * CAST(fb.f AS DOUBLE)) DESC,
        |         a, b LIMIT 1),
        |t2 AS (SELECT cnt, replace(
        |         array_to_string(list_transform(l, x -> chr(1) || x || chr(2)), ''),
        |         chr(1) || m1.a || chr(2) || chr(1) || m1.b || chr(2),
        |         chr(1) || m1.a || m1.b || chr(2)) AS str
        |       FROM l1, m1),
        |l2 AS (SELECT cnt, regexp_extract_all(str,
        |         chr(1) || '([^' || chr(1) || chr(2) || ']*)' || chr(2), 1) AS l FROM t2),
        |u2 AS (SELECT l[i] AS sym, sum(cnt) AS f
        |       FROM l2, unnest(range(1, len(l) + 1)) AS t(i) GROUP BY 1),
        |p2 AS (SELECT l[i] AS a, l[i+1] AS b, sum(cnt) AS freq
        |       FROM l2, unnest(range(1, len(l))) AS t(i) GROUP BY 1, 2),
        |m2 AS (SELECT a, b, freq, fa.f AS lf, fb.f AS rf
        |       FROM p2 JOIN u2 fa ON fa.sym = p2.a JOIN u2 fb ON fb.sym = p2.b
        |       ORDER BY CAST(freq AS DOUBLE) / (CAST(fa.f AS DOUBLE) * CAST(fb.f AS DOUBLE)) DESC,
        |         a, b LIMIT 1),
        |t3 AS (SELECT cnt, replace(str,
        |         chr(1) || m2.a || chr(2) || chr(1) || m2.b || chr(2),
        |         chr(1) || m2.a || m2.b || chr(2)) AS str
        |       FROM t2, m2),
        |l3 AS (SELECT cnt, regexp_extract_all(str,
        |         chr(1) || '([^' || chr(1) || chr(2) || ']*)' || chr(2), 1) AS l FROM t3),
        |u3 AS (SELECT l[i] AS sym, sum(cnt) AS f
        |       FROM l3, unnest(range(1, len(l) + 1)) AS t(i) GROUP BY 1),
        |p3 AS (SELECT l[i] AS a, l[i+1] AS b, sum(cnt) AS freq
        |       FROM l3, unnest(range(1, len(l))) AS t(i) GROUP BY 1, 2),
        |m3 AS (SELECT a, b, freq, fa.f AS lf, fb.f AS rf
        |       FROM p3 JOIN u3 fa ON fa.sym = p3.a JOIN u3 fb ON fb.sym = p3.b
        |       ORDER BY CAST(freq AS DOUBLE) / (CAST(fa.f AS DOUBLE) * CAST(fb.f AS DOUBLE)) DESC,
        |         a, b LIMIT 1)
        |SELECT CAST(1 AS INTEGER) AS rk, a AS lhs, b AS rhs, CAST(freq AS BIGINT) AS freq,
        |  CAST(lf AS BIGINT) AS lhs_freq, CAST(rf AS BIGINT) AS rhs_freq FROM m1
        |UNION ALL SELECT 2, a, b, CAST(freq AS BIGINT), CAST(lf AS BIGINT), CAST(rf AS BIGINT) FROM m2
        |UNION ALL SELECT 3, a, b, CAST(freq AS BIGINT), CAST(lf AS BIGINT), CAST(rf AS BIGINT) FROM m3
        |ORDER BY rk""".stripMargin) { (s, dir) =>
      graft.operators.CurationOps.learnWordPieceMerges(
        table(s, dir, "documents"), "text", numMerges = 3)
        .dumpSorted("rk")
    },

    // ---------------------------------------------------------------- corpus card FROM LEDGERS (capstone)
    // the ledger-compositionality capstone: the per-source corpus card
    // — volumes, length quantiles, top token — assembled ENTIRELY from
    // at-rest state (stats + quantile + vocab ledgers, each advanced
    // across two generations) with the corpus never re-read at card
    // time. At 100 TB this is the difference between "the dashboard
    // reruns the corpus" and "the dashboard reads three model-sized
    // parquet stores". The oracle re-derives every field from scratch
    // over documents — blind to the six ledger writes/advances — so
    // the hash match proves the composed at-rest state carries exactly
    // the corpus's truth.
    q("d87_card_from_ledgers",
      """WITH st AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY source),
        |v AS (SELECT source, CAST(length(text) AS BIGINT) AS len FROM documents),
        |h AS (SELECT source, len // 16 AS b, count(*) AS c FROM v GROUP BY 1, 2),
        |cum AS (SELECT source, b, sum(c) OVER (PARTITION BY source ORDER BY b) AS endc,
        |        sum(c) OVER (PARTITION BY source) AS n FROM h),
        |p AS (SELECT unnest([0.5, 0.99]) AS prob),
        |sel AS (SELECT source, prob, min(b) AS b FROM cum, p
        |        WHERE endc >= ceil(prob * n) GROUP BY 1, 2),
        |pv AS (SELECT source,
        |  CAST(max(CASE WHEN prob = 0.5 THEN b * 16 END) AS BIGINT) AS p50_lo,
        |  CAST(max(CASE WHEN prob = 0.5 THEN b * 16 + 15 END) AS BIGINT) AS p50_hi,
        |  CAST(max(CASE WHEN prob = 0.99 THEN b * 16 END) AS BIGINT) AS p99_lo,
        |  CAST(max(CASE WHEN prob = 0.99 THEN b * 16 + 15 END) AS BIGINT) AS p99_hi
        |  FROM sel GROUP BY source),
        |t AS (SELECT source, unnest(string_split(trim(text), ' ')) AS token FROM documents),
        |c AS (SELECT source, token, count(*) AS tc FROM t WHERE token <> '' GROUP BY 1, 2),
        |r AS (SELECT source, token, tc,
        |      row_number() OVER (PARTITION BY source ORDER BY tc DESC, token) AS rk FROM c),
        |tk AS (SELECT source, token AS top_token, CAST(tc AS BIGINT) AS top_tc
        |       FROM r WHERE rk = 1)
        |SELECT source, n_docs, n_tokens, n_chars, p50_lo, p50_hi, p99_lo, p99_hi,
        |  top_token, top_tc
        |FROM st JOIN pv USING (source) JOIN tk USING (source)
        |ORDER BY source""".stripMargin) { (s, dir) =>
      import graft.operators.{CurationOps, SketchOps, TextOps}
      val docs = table(s, dir, "documents")
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val stP = Registry.scratchDir(s"/tmp/graft_conformance/d87_st_$tag")
      val qhP = Registry.scratchDir(s"/tmp/graft_conformance/d87_qh_$tag")
      val vcP = Registry.scratchDir(s"/tmp/graft_conformance/d87_vc_$tag")
      val g1 = docs.filter(col("doc_id") % 10 < 6)
      val g2 = docs.filter(col("doc_id") % 10 >= 6)
      def lens(df: org.apache.spark.sql.DataFrame) =
        df.select(col("source"), length(col("text")).cast("long").as("len"))
      // three DISJOINT stores (stats / quantile-hist / vocab): the
      // write→advance chains are independent — overlap them (program
      // order holds within each store; Qf.concurrently awaits all)
      Qf.concurrently(
        () => {
          CurationOps.writeStatsLedger(g1, "source", "text", stP)
          CurationOps.advanceStatsLedger(g2, "source", "text", stP,
            batchId = Some("g2"))
        },
        () => {
          CurationOps.writeQuantileLedger(lens(g1), "source", "len", shift = 4, qhP)
          CurationOps.advanceQuantileLedger(lens(g2), "source", "len", 4, qhP,
            batchId = Some("g2"))
        },
        () => {
          SketchOps.writeVocabLedger(g1, "source", TextOps.tokens(col("text")), vcP)
          SketchOps.advanceVocabLedger(g2, "source", TextOps.tokens(col("text")),
            vcP, batchId = Some("g2"))
        })
      // card time: THREE at-rest reads, zero corpus access
      val st = graft.operators.LedgerGuard.readLedger(s, stP)
      val qs = CurationOps.quantilesFromLedger(s, qhP, Seq(0.5, 0.99))
      val pv = qs.groupBy(col("source")).agg(
        max(when(col("prob") === 0.5, col("lo"))).as("p50_lo"),
        max(when(col("prob") === 0.5, col("hi"))).as("p50_hi"),
        max(when(col("prob") === 0.99, col("lo"))).as("p99_lo"),
        max(when(col("prob") === 0.99, col("hi"))).as("p99_hi"))
      val tk = SketchOps.topTokensFromLedger(s, vcP, k = 1)
        .select(col("source"), col("token").as("top_token"), col("tc").as("top_tc"))
      st.join(pv, Seq("source")).join(tk, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
          col("p50_lo"), col("p50_hi"), col("p99_lo"), col("p99_hi"),
          col("top_token"), col("top_tc"))
        .dumpSorted("source")
    },

    // ---------------------------------------------------------------- registrable domain (public-suffix join)
    // the per-domain key a crawl pipeline should REALLY cap/blocklist
    // on: eTLD+1 via the publicsuffix.org matching algorithm, with the
    // rule list as broadcast DATA (plain + `*.` wildcard + `!`
    // exception rules, comment/blank lines dropped). Hosts synthesized
    // from doc_id cover every rule class: nested plain rules, wildcard
    // match, exception cancelling a wildcard, unknown TLD (default `*`
    // rule), host-IS-public-suffix (NULL registrable), case folding.
    // The oracle re-implements the published algorithm from the same
    // RAW rule strings — blind to the Spark-side parse/join shape.
    q("d88_registrable_domain",
      """WITH rules(rule) AS (VALUES ('com'),('example.com'),('net'),('uk'),
        |  ('co.uk'),('jp'),('ac.jp'),('*.kawasaki.jp'),('!city.kawasaki.jp'),
        |  ('*.ck'),('!www.ck'),('// comment line'),('')),
        |pr AS (SELECT
        |  CASE WHEN rule LIKE '!%' THEN 2 WHEN rule LIKE '*.%' THEN 1 ELSE 0 END AS kind,
        |  CASE WHEN rule LIKE '!%' THEN substr(rule, 2)
        |       WHEN rule LIKE '*.%' THEN substr(rule, 3) ELSE rule END AS key
        |  FROM rules WHERE rule <> '' AND rule NOT LIKE '//%'),
        |pr2 AS (SELECT kind, key, greatest(1,
        |  CASE WHEN kind = 2 THEN len(string_split(key, '.')) - 1
        |       WHEN kind = 1 THEN len(string_split(key, '.')) + 1
        |       ELSE len(string_split(key, '.')) END) AS psn FROM pr),
        |hosts AS (SELECT DISTINCT lower(CASE doc_id % 8
        |  WHEN 0 THEN 'a' || CAST(doc_id % 50 AS VARCHAR) || '.example.com'
        |  WHEN 1 THEN 'b' || CAST(doc_id % 50 AS VARCHAR) || '.co.uk'
        |  WHEN 2 THEN 'WWW.c' || CAST(doc_id % 50 AS VARCHAR) || '.COM'
        |  WHEN 3 THEN 'd' || CAST(doc_id % 50 AS VARCHAR) || '.site'
        |              || CAST(doc_id % 3 AS VARCHAR) || '.ck'
        |  WHEN 4 THEN CASE doc_id % 2 WHEN 0 THEN 'www.ck' ELSE 'sub.www.ck' END
        |  WHEN 5 THEN 'e' || CAST(doc_id % 50 AS VARCHAR) || '.zz'
        |  WHEN 6 THEN CASE doc_id % 2 WHEN 0 THEN 'co.uk' ELSE 'x.kawasaki.jp' END
        |  ELSE CASE doc_id % 2 WHEN 0 THEN 'city.kawasaki.jp'
        |       ELSE 'y.x.kawasaki.jp' END END) AS host FROM documents),
        |hh AS (SELECT host, string_split(host, '.') AS labs,
        |       len(string_split(host, '.')) AS n FROM hosts),
        |cand AS (SELECT host, n, k, array_to_string(labs[n-k+1:n], '.') AS suf
        |         FROM hh, unnest(generate_series(1, n)) u(k)),
        |m AS (SELECT c.host,
        |        CASE WHEN r.kind = 2 THEN 1 ELSE 0 END AS exc,
        |        CASE WHEN r.kind = 1 THEN c.k + 1 ELSE c.k END AS mlabs, r.psn
        |      FROM cand c JOIN pr2 r ON c.suf = r.key
        |        AND (r.kind <> 1 OR c.n > c.k)),
        |sel AS (SELECT host, psn FROM (SELECT host, psn, row_number() OVER
        |        (PARTITION BY host ORDER BY exc DESC, mlabs DESC) AS rk FROM m)
        |        WHERE rk = 1),
        |fin AS (SELECT h.host, h.n, h.labs, coalesce(s.psn, 1) AS psn
        |        FROM hh h LEFT JOIN sel s USING (host))
        |SELECT host, array_to_string(labs[n-psn+1:n], '.') AS public_suffix,
        |  CASE WHEN n > psn THEN array_to_string(labs[n-psn:n], '.') END
        |    AS registrable_domain
        |FROM fin ORDER BY host""".stripMargin) { (s, dir) =>
      import s.implicits._
      import graft.operators.DomainOps
      val rules = Seq("com", "example.com", "net", "uk", "co.uk", "jp", "ac.jp",
        "*.kawasaki.jp", "!city.kawasaki.jp", "*.ck", "!www.ck",
        "// comment line", "").toDF("rule")
      val i = col("doc_id")
      val host = when(i % 8 === 0, concat(lit("a"), (i % 50).cast("string"), lit(".example.com")))
        .when(i % 8 === 1, concat(lit("b"), (i % 50).cast("string"), lit(".co.uk")))
        .when(i % 8 === 2, concat(lit("WWW.c"), (i % 50).cast("string"), lit(".COM")))
        .when(i % 8 === 3, concat(lit("d"), (i % 50).cast("string"), lit(".site"),
          (i % 3).cast("string"), lit(".ck")))
        .when(i % 8 === 4, when(i % 2 === 0, "www.ck").otherwise("sub.www.ck"))
        .when(i % 8 === 5, concat(lit("e"), (i % 50).cast("string"), lit(".zz")))
        .when(i % 8 === 6, when(i % 2 === 0, "co.uk").otherwise("x.kawasaki.jp"))
        .otherwise(when(i % 2 === 0, "city.kawasaki.jp").otherwise("y.x.kawasaki.jp"))
      DomainOps.registrableDomains(
        table(s, dir, "documents").select(host.as("host")), "host", rules)
        .dumpSorted("host")
    },

    // ---------------------------------------------------------------- LSH parameter tuning (S-curve argmin)
    // stop hand-picking band shapes: the full (bands, rows) tuning grid
    // under a 16-hash budget at thresholds 0.5 and 0.8 — FP/FN
    // integrals of the banding collision curve 1-(1-s^r)^b by 200-point
    // midpoint quadrature (MMDS §3.4 / datasketch optimal_param), with
    // the per-threshold argmin flagged. The oracle re-derives the same
    // quadrature from generate_series; argmin margins (~1e-3) are far
    // above cross-engine float-fold noise.
    q("d89_lsh_tuning",
      """WITH cand AS (SELECT b, r
        |  FROM unnest(generate_series(1, 16)) tb(b),
        |       unnest(generate_series(1, 16)) tr(r) WHERE b * r <= 16),
        |th AS (SELECT unnest([0.5, 0.8]) AS threshold),
        |ks AS (SELECT unnest(generate_series(0, 199)) AS k),
        |g AS (SELECT threshold, b, r,
        |  sum(1 - pow(1 - pow((k + 0.5) * threshold / 200, r), b))
        |    * threshold / 200 AS fp,
        |  sum(pow(1 - pow(threshold + (k + 0.5) * (1 - threshold) / 200, r), b))
        |    * (1 - threshold) / 200 AS fn
        |  FROM cand, th, ks GROUP BY 1, 2, 3)
        |SELECT threshold, b, r, round(fp, 6) AS fp, round(fn, 6) AS fn,
        |  round(0.5 * fp + 0.5 * fn, 6) AS cost,
        |  CAST(CASE WHEN row_number() OVER (PARTITION BY threshold
        |    ORDER BY 0.5 * fp + 0.5 * fn, b DESC, r) = 1 THEN 1 ELSE 0 END
        |    AS INTEGER) AS best
        |FROM g ORDER BY threshold, b, r""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy("threshold")
        .orderBy(col("cost"), col("b").desc, col("r"))
      DedupOps.lshParamGrid(s, 16, Seq(0.5, 0.8))
        .withColumn("best", when(row_number().over(w) === 1, 1).otherwise(0))
        .select(col("threshold"), col("b"), col("r"),
          Qf.dround(col("fp"), 6).as("fp"), Qf.dround(col("fn"), 6).as("fn"),
          Qf.dround(col("cost"), 6).as("cost"), col("best"))
        .dumpSorted("threshold", "b", "r")
    },

    // ---------------------------------------------------------------- bigram-LM ledger (language model at rest)
    // d34's CCNet fluency signal with the corpus-wide count pass moved
    // to rest: the (w1, w2, n) aggregate — tail rows included, so V
    // rides along — lives in a ledger advanced per ingest batch; a
    // probe batch scores in O(batch + model) with NO corpus re-read.
    // The oracle re-derives c2/c1/V from scratch over all documents
    // and scores the same probe slice — blind to the two-generation
    // write/advance/replay/compact cycle — so the hash match proves
    // the at-rest LM equals the from-scratch pass.
    q("d90_bigram_ledger_score",
      """WITH lst AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
        |big AS (
        |  SELECT doc_id, unnest(list_zip(l[:len(l)-1], l[2:])) AS z
        |  FROM lst WHERE len(l) >= 2),
        |pairs AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM big),
        |c2 AS (SELECT w1, w2, count(*) AS n2 FROM pairs GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS n1 FROM pairs GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS vocab
        |      FROM (SELECT unnest(l) AS tok FROM lst)),
        |scored AS (
        |  SELECT p.doc_id, -ln((c2.n2 + 1.0) / (c1.n1 + v.vocab)) AS nll
        |  FROM pairs p JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
        |  WHERE p.doc_id % 7 = 0)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
        |  round(avg(nll), 4) AS avg_nll
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.CurationOps
      val docs = table(s, dir, "documents")
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val path = Registry.scratchDir(s"/tmp/graft_conformance/d90_lm_$tag")
      CurationOps.writeBigramLedger(docs.filter(col("doc_id") % 10 < 6), "text", path)
      CurationOps.advanceBigramLedger(docs.filter(col("doc_id") % 10 >= 6),
        "text", path, batchId = Some("gen-2"))
      CurationOps.advanceBigramLedger(docs.filter(col("doc_id") % 10 >= 6),
        "text", path, batchId = Some("gen-2")) // replay: no-op
      CurationOps.compactBigramLedger(s, path, targetFiles = 2)
      CurationOps.bigramScoreFromLedger(docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", path)
        .select(col("doc_id"), col("n_bigrams"),
          Qf.dround(col("avg_nll_raw"), 4).as("avg_nll"))
        .orderBy("doc_id")
    },

    // the right-to-be-forgotten face of the at-rest LM: retraction by
    // exact count subtraction (a fully-departed token shrinks V too).
    // The oracle recomputes the LM from scratch over admitted −
    // forgotten documents and scores the surviving probe slice — the
    // hash match proves subtraction ≡ never-having-admitted.
    q("d91_bigram_ledger_forget",
      """WITH kept AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
        |lst AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM kept),
        |big AS (
        |  SELECT doc_id, unnest(list_zip(l[:len(l)-1], l[2:])) AS z
        |  FROM lst WHERE len(l) >= 2),
        |pairs AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM big),
        |c2 AS (SELECT w1, w2, count(*) AS n2 FROM pairs GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS n1 FROM pairs GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS vocab
        |      FROM (SELECT unnest(l) AS tok FROM lst)),
        |scored AS (
        |  SELECT p.doc_id, -ln((c2.n2 + 1.0) / (c1.n1 + v.vocab)) AS nll
        |  FROM pairs p JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v
        |  WHERE p.doc_id % 7 = 0)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
        |  round(avg(nll), 4) AS avg_nll
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.CurationOps
      val docs = table(s, dir, "documents")
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val path = Registry.scratchDir(s"/tmp/graft_conformance/d91_lm_$tag")
      CurationOps.writeBigramLedger(docs, "text", path)
      CurationOps.retractFromBigramLedger(docs.filter(col("doc_id") % 3 === 0),
        "text", path, batchId = Some("purge-1"))
      CurationOps.bigramScoreFromLedger(
        docs.filter(col("doc_id") % 7 === 0 && col("doc_id") % 3 =!= 0),
        "doc_id", "text", path)
        .select(col("doc_id"), col("n_bigrams"),
          Qf.dround(col("avg_nll_raw"), 4).as("avg_nll"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- mixture plan (token-budget water-filling)
    // the per-source allocation table a data-mixing run is configured
    // from: budget split ∝ weight with a max-epochs cap per source,
    // capping redistributing surplus to the uncapped — water-filling,
    // solved in closed form by one sorted prefix scan over the
    // MIXTURE-sized table. Token counts come from the stats ledger
    // (two generations), so plan time reads one model-sized store and
    // never the corpus. The oracle re-derives counts from documents
    // and replays the same closed form in SQL windows; with integral
    // weights/capacities every intermediate is exact, so the plans
    // hash-match bit-for-bit.
    // ---------------------------------------------------------------- feedback mixture reweighting (DoReMi step)
    // the third face of mixture planning (d92 water-fills a budget from
    // static weights, d101 α-smooths counts; this derives the weights
    // from FEEDBACK): one exponentiated-gradient step of the DoReMi
    // group-DRO update over a measurable proxy loss — each source's
    // mean bigram-LM NLL under the corpus's own statistics (d34's
    // scorer as the reference model). Harder-than-average sources gain
    // mixture mass, the share prior keeps a tiny source bounded. The
    // oracle replays the d34 scorer per doc (4dp — the pinned parity
    // boundary), the per-source means, and the exp-reweight arithmetic
    // — hash match.
    q("d124_mixture_reweight",
      """WITH lst AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
        |big AS (
        |  SELECT doc_id, unnest(list_zip(l[:len(l)-1], l[2:])) AS z
        |  FROM lst WHERE len(l) >= 2),
        |pairs AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM big),
        |c2 AS (SELECT w1, w2, count(*) AS n2 FROM pairs GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS n1 FROM pairs GROUP BY 1),
        |v AS (SELECT count(DISTINCT tok) AS vocab
        |      FROM (SELECT unnest(l) AS tok FROM lst)),
        |scored AS (
        |  SELECT p.doc_id, -ln((c2.n2 + 1.0) / (c1.n1 + v.vocab)) AS nll
        |  FROM pairs p JOIN c2 USING (w1, w2) JOIN c1 USING (w1), v),
        |perdoc AS (SELECT doc_id, round(avg(nll), 4) AS nll_r
        |  FROM scored GROUP BY doc_id),
        |bysrc AS (SELECT d.source, count(*) AS n_docs, avg(p.nll_r) AS nll_s
        |  FROM perdoc p JOIN documents d USING (doc_id) GROUP BY 1),
        |tot AS (SELECT sum(nll_s * n_docs) / sum(n_docs) AS mean,
        |  CAST(sum(n_docs) AS DOUBLE) AS ndocs FROM bysrc),
        |w AS (SELECT source, n_docs, nll_s, nll_s - mean AS excess,
        |  n_docs / ndocs * exp(1.0 * (nll_s - mean)) AS wraw FROM bysrc, tot),
        |z AS (SELECT sum(wraw) AS z FROM w)
        |SELECT source, CAST(n_docs AS INTEGER) AS n_docs,
        |  round(nll_s, 4) AS avg_nll, round(excess, 4) AS excess,
        |  round(wraw / z, 4) AS weight
        |FROM w, z ORDER BY source""".stripMargin) { (s, dir) =>
      graft.operators.CurationOps.mixtureReweightScored(
        table(s, dir, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source", sharedLmScores(s, dir), eta = 1.0)
        .dumpSorted("source")
    },

    q("d92_mixture_plan",
      """WITH tc AS (
        |  SELECT source, CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |b AS (SELECT sum(n_tokens) * 4 // 5 AS budget FROM tc),
        |w AS (SELECT source, n_tokens,
        |        CAST(CAST(substr(source, 4) AS INTEGER) % 7 + 1 AS DOUBLE) AS weight,
        |        1.0 * n_tokens AS capacity
        |      FROM tc),
        |o AS (SELECT *, capacity / weight AS r FROM w),
        |sc AS (SELECT o.*, CAST(budget AS DOUBLE) AS bud,
        |        coalesce(sum(capacity) OVER win1, 0) AS cumc,
        |        coalesce(sum(weight) OVER win1, 0) AS cumw,
        |        sum(capacity) OVER () AS totc,
        |        sum(weight) OVER () AS totw,
        |        lag(r) OVER (ORDER BY r, source) AS rprev
        |       FROM o, b
        |       WINDOW win1 AS (ORDER BY r, source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |lam AS (SELECT max(CASE WHEN (bud - cumc) / (totw - cumw) <= r
        |                     AND (rprev IS NULL OR rprev <= (bud - cumc) / (totw - cumw))
        |                THEN (bud - cumc) / (totw - cumw) END) AS lamstar FROM sc),
        |p AS (SELECT sc.*, lamstar,
        |        CASE WHEN totc <= bud THEN capacity
        |             ELSE least(lamstar * weight, capacity) END AS alloc_raw
        |      FROM sc, lam)
        |SELECT source, weight, n_tokens,
        |  CAST(round(capacity, 0) AS BIGINT) AS capacity_tokens,
        |  round(alloc_raw, 4) AS alloc_tokens,
        |  round(CASE WHEN n_tokens > 0 THEN alloc_raw / n_tokens ELSE 0.0 END, 6) AS epochs,
        |  CAST(alloc_raw >= capacity AS INTEGER) AS capped,
        |  CAST(greatest(bud - totc, 0) AS BIGINT) AS budget_shortfall
        |FROM p ORDER BY source""".stripMargin) { (s, dir) =>
      import graft.operators.CurationOps
      val docs = table(s, dir, "documents")
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val stP = Registry.scratchDir(s"/tmp/graft_conformance/d92_st_$tag")
      CurationOps.writeStatsLedger(docs.filter(col("doc_id") % 10 < 6),
        "source", "text", stP)
      CurationOps.advanceStatsLedger(docs.filter(col("doc_id") % 10 >= 6),
        "source", "text", stP, batchId = Some("g2"))
      // plan time: one model-sized at-rest read, zero corpus access;
      // the budget scalar is a 1-row collect over the mixture-sized
      // ledger (a plan-time driver constant, not a data loop)
      val tok = graft.operators.LedgerGuard.readLedger(s, stP)
        .select(col("source"), col("n_tokens"))
      val budget = tok.agg(sum(col("n_tokens"))).first.getLong(0) * 4 / 5
      val src = tok.withColumn("weight",
        (substring(col("source"), 4, 8).cast("int") % 7 + 1).cast("double"))
      CurationOps.mixturePlan(src, "source", "n_tokens", "weight",
          budget, maxEpochs = 1.0)
        .select(col("mix_key").as("source"), col("weight"), col("n_tokens"),
          col("capacity_tokens"),
          Qf.dround(col("alloc_raw"), 4).as("alloc_tokens"),
          Qf.dround(col("epochs_raw"), 6).as("epochs"),
          col("capped"), col("budget_shortfall"))
        .dumpSorted("source")
    },

    // ---------------------------------------------------------------- distribution drift at rest
    // the monitoring query every at-scale pipeline runs per ingest:
    // KS / total-variation / PSI between two corpora's length
    // distributions (here: pre/post a whitespace-normalization
    // change), computed ENTIRELY from two at-rest quantile-histogram
    // ledgers — keys × occupied buckets of work, zero corpus access
    // at drift time. The oracle re-derives both histograms from
    // documents and replays the same formulas in SQL windows, blind
    // to ledger A's two-generation build cycle.
    q("d93_histogram_drift",
      """WITH a AS (SELECT source, length(text) // 16 AS qb, count(*) AS c
        |           FROM documents GROUP BY 1, 2),
        |bb AS (SELECT source, length(replace(text, ' ', '')) // 16 AS qb, count(*) AS c
        |       FROM documents GROUP BY 1, 2),
        |u AS (SELECT coalesce(a.source, bb.source) AS source,
        |        coalesce(a.qb, bb.qb) AS qb,
        |        coalesce(a.c, 0) AS ca, coalesce(bb.c, 0) AS cb
        |      FROM a FULL OUTER JOIN bb ON a.source = bb.source AND a.qb = bb.qb),
        |s AS (SELECT *, sum(ca) OVER (PARTITION BY source ORDER BY qb) AS cuma,
        |        sum(cb) OVER (PARTITION BY source ORDER BY qb) AS cumb,
        |        sum(ca) OVER (PARTITION BY source) AS na,
        |        sum(cb) OVER (PARTITION BY source) AS nb FROM u)
        |SELECT source, CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
        |  round(CASE WHEN max(na) = 0 OR max(nb) = 0 THEN 1.0
        |    ELSE max(abs(CAST(cuma AS DOUBLE)/nullif(na,0) - CAST(cumb AS DOUBLE)/nullif(nb,0))) END, 6) AS ks,
        |  round(CASE WHEN max(na) = 0 OR max(nb) = 0 THEN 1.0
        |    ELSE 0.5 * sum(abs(CAST(ca AS DOUBLE)/nullif(na,0) - CAST(cb AS DOUBLE)/nullif(nb,0))) END, 6) AS tv,
        |  round(sum(CASE WHEN ca > 0 AND cb > 0 THEN
        |    (CAST(ca AS DOUBLE)/nullif(na,0) - CAST(cb AS DOUBLE)/nullif(nb,0)) *
        |    ln((CAST(ca AS DOUBLE) * nb) / (CAST(cb AS DOUBLE) * na)) END), 4) AS psi,
        |  CAST(sum(CASE WHEN (ca > 0) <> (cb > 0) THEN 1 ELSE 0 END) AS BIGINT) AS n_onesided
        |FROM s GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
      import graft.operators.CurationOps
      val docs = table(s, dir, "documents")
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val pA = Registry.scratchDir(s"/tmp/graft_conformance/d93_a_$tag")
      val pB = Registry.scratchDir(s"/tmp/graft_conformance/d93_b_$tag")
      val lenA = docs.select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("len"))
      val lenB = docs.select(col("source"),
        expr("length(replace(text, ' ', ''))").cast("long").as("len"))
      // ledger A built across two generations (the at-rest realism);
      // ledger B in one — drift compares the resulting stores only.
      // The two stores are disjoint: overlap the chains.
      Qf.concurrently(
        () => {
          CurationOps.writeQuantileLedger(lenA.filter(col("doc_id") % 10 < 6),
            "source", "len", shift = 4, pA)
          CurationOps.advanceQuantileLedger(lenA.filter(col("doc_id") % 10 >= 6),
            "source", "len", 4, pA, batchId = Some("g2"))
        },
        () => CurationOps.writeQuantileLedger(lenB, "source", "len", shift = 4, pB))
      CurationOps.histogramDrift(s, pA, pB)
        .select(col("source"), col("n_a"), col("n_b"),
          Qf.dround(col("ks_raw"), 6).as("ks"),
          Qf.dround(col("tv_raw"), 6).as("tv"),
          Qf.dround(col("psi_raw"), 4).as("psi"),
          col("n_onesided"))
        .dumpSorted("source")
    },

    // ---------------------------------------------------------------- lexical drift (JSD)
    // d93 drifts NUMERIC distributions; this drifts the VOCABULARY:
    // pairwise Jensen-Shannon divergence (bits) between per-source
    // unigram distributions — the diagnostic behind mixture-weight
    // choices (d92/d101). Computed with the inner-join decomposition
    // (one-sided tokens contribute exactly ln2 · residual mass), so the
    // pair-union vocabulary never materializes; the oracle replays the
    // identical algebra over a shared-token join.
    q("d112_source_unigram_jsd",
      """WITH tok AS (SELECT source AS g, unnest(string_split(trim(text), ' ')) AS t
        |             FROM documents),
        |counts AS (SELECT g, t, CAST(count(*) AS DOUBLE) AS c FROM tok GROUP BY 1, 2),
        |dist AS (SELECT g, t, c / sum(c) OVER (PARTITION BY g) AS p FROM counts),
        |pairs AS (
        |  SELECT a.g AS src1, b.g AS src2,
        |    sum(a.p * ln(2*a.p/(a.p+b.p)) + b.p * ln(2*b.p/(a.p+b.p))) AS both_term,
        |    sum(a.p) AS shp, sum(b.p) AS shq
        |  FROM dist a JOIN dist b ON a.t = b.t AND a.g < b.g
        |  GROUP BY 1, 2),
        |groups AS (SELECT DISTINCT g FROM counts),
        |ap AS (SELECT a.g AS src1, b.g AS src2 FROM groups a JOIN groups b ON a.g < b.g)
        |SELECT ap.src1, ap.src2,
        |  round((0.5*coalesce(both_term, 0)
        |    + 0.5*ln(2)*((1-coalesce(shp, 0))+(1-coalesce(shq, 0)))) / ln(2), 4) AS js_bits
        |FROM ap LEFT JOIN pairs p ON p.src1 = ap.src1 AND p.src2 = ap.src2
        |ORDER BY ap.src1, ap.src2""".stripMargin) { (s, dir) =>
      graft.operators.CurationOps.sourceUnigramJsd(
        table(s, dir, "documents"), "source", "text")
        .dumpSorted("src1", "src2")
    },

    // ---------------------------------------------------------------- lexical drift AT REST
    // d112's JSD with BOTH sides at rest: two vocab-count ledgers (two
    // ingest windows of the corpus), drifted per source with zero
    // corpus access — the lexical sibling of d93's histogram drift.
    // Ledger A is built across two generations plus a REPLAYED advance
    // (exactly-once batchId); the oracle recomputes both distributions
    // from documents, blind to the ledger cycle, so the hash match
    // proves the at-rest path lost and invented nothing.
    q("d114_vocab_ledger_jsd",
      """WITH ta AS (SELECT source AS g, unnest(string_split(trim(text), ' ')) AS t
        |            FROM documents WHERE doc_id % 10 < 6),
        |tb AS (SELECT source AS g, unnest(string_split(trim(text), ' ')) AS t
        |       FROM documents WHERE doc_id % 10 >= 6),
        |ca AS (SELECT g, t, CAST(count(*) AS DOUBLE) AS c FROM ta GROUP BY 1, 2),
        |cb AS (SELECT g, t, CAST(count(*) AS DOUBLE) AS c FROM tb GROUP BY 1, 2),
        |da AS (SELECT g, t, c / sum(c) OVER (PARTITION BY g) AS p FROM ca),
        |db AS (SELECT g, t, c / sum(c) OVER (PARTITION BY g) AS p FROM cb),
        |sh AS (SELECT da.g,
        |    sum(da.p * ln(2*da.p/(da.p+db.p)) + db.p * ln(2*db.p/(da.p+db.p))) AS both_term,
        |    sum(da.p) AS shp, sum(db.p) AS shq
        |  FROM da JOIN db ON da.g = db.g AND da.t = db.t GROUP BY 1),
        |keys AS (SELECT DISTINCT g FROM ca UNION SELECT DISTINCT g FROM cb)
        |SELECT keys.g AS source,
        |  round((0.5*coalesce(both_term, 0)
        |    + 0.5*ln(2)*((1-coalesce(shp, 0))+(1-coalesce(shq, 0)))) / ln(2), 4) AS js_bits
        |FROM keys LEFT JOIN sh ON sh.g = keys.g ORDER BY source""".stripMargin) { (s, dir) =>
      import graft.operators.SketchOps
      val docs = table(s, dir, "documents")
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val pA = Registry.scratchDir(s"/tmp/graft_conformance/d114_a_$tag")
      val pB = Registry.scratchDir(s"/tmp/graft_conformance/d114_b_$tag")
      val tok = graft.operators.TextOps.tokens(col("text"))
      val gen2 = docs.filter(col("doc_id") % 10 >= 3 && col("doc_id") % 10 < 6)
      // pA's write→advance→replay chain and pB's write touch DISJOINT
      // stores — overlap them (Qf.concurrently awaits both legs)
      Qf.concurrently(
        () => {
          SketchOps.writeVocabLedger(docs.filter(col("doc_id") % 10 < 3),
            "source", tok, pA)
          SketchOps.advanceVocabLedger(gen2, "source", tok, pA, batchId = Some("g2"))
          // replayed delivery of the same batch: exactly-once marker no-ops
          SketchOps.advanceVocabLedger(gen2, "source", tok, pA, batchId = Some("g2"))
        },
        () => SketchOps.writeVocabLedger(docs.filter(col("doc_id") % 10 >= 6),
          "source", tok, pB))
      SketchOps.vocabLedgerJsd(s, pA, pB).dumpSorted("source")
    },

    // ---------------------------------------------------------------- bloom membership ledger
    // At-rest Bloom prefilter in front of the exact digest ledger:
    // might_contain=false is a PROOF of novelty (no false negatives), so
    // "definitely new" documents skip the exact join entirely at 100 TB.
    // Ledger built over the admitted half across two advances plus a
    // replayed delivery; the probe classifies the full corpus. The raw
    // bloom BITS stay engine-specific (which non-members false-positive
    // is bit-layout), so the verdict column itself is never hashed —
    // what hash-matches is the DECISION RELATION (the r14-verdict d24b
    // regime): per document, the exact membership (oracle replays the
    // digest join) and the per-row no-false-negative verdict
    // `nfn_ok = NOT (member AND NOT might_contain)` — TRUE everywhere
    // iff flagged ⊇ member set, which the oracle asserts as a literal.
    // A bloom that ever dropped a member flips a row to false and the
    // hash goes red. FP-budget and bit-exact incremental merge remain
    // AccuracySpec gates (they are about the bits, not the decision).
    q("d119_bloom_ledger_probe",
      """WITH f AS (SELECT doc_id,
        |  CASE WHEN text IS NULL THEN NULL
        |       ELSE md5(CAST(length(text) AS VARCHAR) || ':' || text) END AS dg
        |  FROM documents),
        |adm AS (SELECT DISTINCT dg FROM f WHERE doc_id % 2 = 0 AND dg IS NOT NULL)
        |SELECT f.doc_id,
        |  (a.dg IS NOT NULL) AS is_member,
        |  TRUE AS nfn_ok
        |FROM f LEFT JOIN adm a ON f.dg = a.dg
        |ORDER BY f.doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.DedupOps
      val docs = table(s, dir, "documents")
      val digest = DedupOps.md5Hash32(col("text"), "")
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val path = Registry.scratchDir(s"/tmp/graft_conformance/d119_$tag")
      val admitted = docs.filter(col("doc_id") % 2 === 0)
      DedupOps.writeBloomLedger(admitted.filter(col("doc_id") % 4 === 0),
        digest, "md5-32", expectedItems = 10000L, fpp = 0.01, path = path)
      val g2 = admitted.filter(col("doc_id") % 4 =!= 0)
      DedupOps.advanceBloomLedger(g2, digest, "md5-32", 10000L, 0.01, path,
        batchId = Some("g2"))
      DedupOps.advanceBloomLedger(g2, digest, "md5-32", 10000L, 0.01, path,
        batchId = Some("g2")) // replayed delivery: exactly-once no-op
      val probe = DedupOps.probeBloomLedger(docs, "doc_id", digest, path,
        "md5-32", 10000L, 0.01)
      // exact member relation, same digest family as the ledger admits
      // (NULL text → NULL digest → non-member, both engines)
      val admDg = admitted.select(digest.as("__dg")).distinct()
        .withColumn("__m", lit(true))
      docs.select(col("doc_id"), digest.as("__dg"))
        .join(probe, Seq("doc_id"))
        .join(admDg, Seq("__dg"), "left")
        .select(col("doc_id"),
          coalesce(col("__m"), lit(false)).as("is_member"),
          (!(coalesce(col("__m"), lit(false)) && !col("might_contain")))
            .as("nfn_ok"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- bloom-prefiltered exact dedup
    // The d119 prefilter COMPOSED with the d39 exact ledger, proving the
    // accelerant changes the PLAN and not the ANSWER: rows whose bloom
    // probe says false are provably novel (no false negatives) and skip
    // the digest anti-join; rows flagged true take the exact path. The
    // two branches are text-disjoint (same text → same digest → same
    // branch), so in-batch min-id dedup per branch composes exactly.
    // The oracle is d39's plain-semantics SQL over the same split —
    // hash-matching it certifies the fast path end-to-end.
    q("d120_bloom_prefiltered_dedup",
      """WITH fp AS (SELECT doc_id,
        |  md5(CASE WHEN text IS NULL THEN chr(1)
        |       ELSE CAST(length(text) AS VARCHAR) || ':' || text END) AS dg
        |  FROM documents),
        |led AS (SELECT DISTINCT dg FROM fp WHERE doc_id % 3 <> 0),
        |fresh AS (SELECT f.doc_id, f.dg FROM fp f
        |          LEFT JOIN led l ON f.dg = l.dg WHERE l.dg IS NULL),
        |keep AS (SELECT dg, min(doc_id) AS doc_id FROM fresh GROUP BY dg)
        |SELECT k.doc_id, CAST(length(d.text) AS INTEGER) AS n_chars
        |FROM keep k JOIN documents d ON k.doc_id = d.doc_id
        |ORDER BY k.doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.DedupOps
      val docs = table(s, dir, "documents")
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val pathD = Registry.scratchDir(s"/tmp/graft_conformance/d120_dg_$tag")
      val pathB = Registry.scratchDir(s"/tmp/graft_conformance/d120_bl_$tag")
      val admitted = docs.filter(col("doc_id") % 3 =!= 0)
      val h = DedupOps.md5Hash32(col("text"), "")
      // digest ledger and bloom ledger are DISJOINT stores over the
      // same admitted slice — overlap the two writes
      Qf.concurrently(
        () => DedupOps.writeLedger(admitted, "doc_id", Seq("text"), pathD),
        () => DedupOps.writeBloomLedger(admitted, h, "md5-32", 10000L, 0.01, pathB))
      val flagged = docs.join(
        DedupOps.probeBloomLedger(docs, "doc_id", h, pathB, "md5-32",
          10000L, 0.01), "doc_id")
      // bloom-true → the exact ledger anti-join; bloom-false → provably
      // novel, in-batch dedup only
      val checked = DedupOps.dedupAgainstLedger(
        flagged.filter(col("might_contain")).drop("might_contain"),
        "doc_id", Seq("text"), pathD)
      val fast = DedupOps.exactDedup(
        flagged.filter(!col("might_contain")).drop("might_contain"),
        "doc_id", Seq("text"))
      checked.unionByName(fast)
        .select(col("doc_id"), length(col("text")).cast("int").as("n_chars"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- content-defined chunking
    // Shift-robust chunk boundaries (LBFS/FastCDC): a boundary falls
    // where the trailing 8-char window's hash lands on the 2^6 mask, so
    // an edit re-chunks only its neighborhood — the primitive behind
    // chunk-level dedup of partially-overlapping documents/code. The
    // oracle replays the identical boundary rule + digests in SQL.
    q("d121_cdc_chunks",
      """WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
        |pos AS (SELECT doc_id, text, unnest(range(8, length(text) + 1)) AS i FROM d),
        |hit AS (SELECT doc_id, i FROM pos
        |  WHERE CAST('0x' || substr(md5(substr(text, i - 7, 8)), 1, 8) AS BIGINT) % 64 = 0),
        |b AS (SELECT doc_id, i FROM hit
        |      UNION SELECT doc_id, length(text) FROM d),
        |seq AS (SELECT doc_id, i AS e,
        |  lag(i, 1, 0) OVER (PARTITION BY doc_id ORDER BY i) AS s,
        |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) AS INTEGER) AS idx
        |  FROM b)
        |SELECT q.doc_id, q.idx, CAST(q.e - q.s AS INTEGER) AS len,
        |  md5(substr(d.text, q.s + 1, q.e - q.s)) AS digest
        |FROM seq q JOIN d ON d.doc_id = q.doc_id
        |ORDER BY q.doc_id, q.idx""".stripMargin) { (s, dir) =>
      table(s, dir, "documents").filter(length(col("text")) > 0)
        .select(col("doc_id"),
          explode(graft.operators.TextOps.cdcChunks(col("text"))).as("c"))
        .select(col("doc_id"), col("c.idx").as("idx"),
          col("c.len").as("len"), col("c.digest").as("digest"))
        .orderBy("doc_id", "idx")
    },

    // ---------------------------------------------------------------- CDC chunk dedup
    // Chunk-level cross-document dedup on the CDC chunks: digests shared
    // by >= 2 documents are the PARTIAL overlaps exact doc-dedup misses
    // and fixed windows only catch when alignment cooperates.
    q("d122_cdc_chunk_dedup",
      """WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
        |pos AS (SELECT doc_id, text, unnest(range(8, length(text) + 1)) AS i FROM d),
        |hit AS (SELECT doc_id, i FROM pos
        |  WHERE CAST('0x' || substr(md5(substr(text, i - 7, 8)), 1, 8) AS BIGINT) % 64 = 0),
        |b AS (SELECT doc_id, i FROM hit
        |      UNION SELECT doc_id, length(text) FROM d),
        |seq AS (SELECT doc_id, i AS e,
        |  lag(i, 1, 0) OVER (PARTITION BY doc_id ORDER BY i) AS s FROM b),
        |chunks AS (SELECT q.doc_id, CAST(q.e - q.s AS INTEGER) AS len,
        |    md5(substr(d.text, q.s + 1, q.e - q.s)) AS digest
        |  FROM seq q JOIN d ON d.doc_id = q.doc_id)
        |SELECT digest, CAST(min(len) AS INTEGER) AS len,
        |  count(*) AS n_occurrences,
        |  count(DISTINCT doc_id) AS n_docs
        |FROM chunks GROUP BY digest HAVING count(DISTINCT doc_id) >= 2
        |ORDER BY digest""".stripMargin) { (s, dir) =>
      table(s, dir, "documents").filter(length(col("text")) > 0)
        .select(col("doc_id"),
          explode(graft.operators.TextOps.cdcChunks(col("text"))).as("c"))
        .groupBy(col("c.digest").as("digest"))
        .agg(min(col("c.len")).as("len"),
          count(lit(1)).as("n_occurrences"),
          countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_docs") >= 2)
        .orderBy("digest")
    },

    // ---------------------------------------------------------------- CDC chunk ledger
    // The CDC family AT REST: admitted documents' chunk digests live in
    // a d39-style ledger (built across two generations), and a batch
    // scores its per-document CHUNK NOVELTY — the fraction of its
    // distinct chunks never seen in the corpus — without re-chunking a
    // single admitted document. This is the incremental partial-overlap
    // admission signal (a quote-farm page scores near 0, genuinely new
    // content near 1). The oracle recomputes both sides' chunks from
    // text, blind to the ledger cycle.
    q("d123_cdc_chunk_ledger",
      """WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
        |pos AS (SELECT doc_id, text, unnest(range(8, length(text) + 1)) AS i FROM d),
        |hit AS (SELECT doc_id, i FROM pos
        |  WHERE CAST('0x' || substr(md5(substr(text, i - 7, 8)), 1, 8) AS BIGINT) % 64 = 0),
        |b AS (SELECT doc_id, i FROM hit
        |      UNION SELECT doc_id, length(text) FROM d),
        |seq AS (SELECT doc_id, i AS e,
        |  lag(i, 1, 0) OVER (PARTITION BY doc_id ORDER BY i) AS s FROM b),
        |chunks AS (SELECT DISTINCT q.doc_id,
        |    md5(substr(d.text, q.s + 1, q.e - q.s)) AS digest
        |  FROM seq q JOIN d ON d.doc_id = q.doc_id),
        |led AS (SELECT DISTINCT digest FROM chunks WHERE doc_id % 3 <> 0),
        |scored AS (SELECT c.doc_id,
        |    count(*) AS n_chunks,
        |    CAST(sum(CASE WHEN l.digest IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_fresh
        |  FROM chunks c LEFT JOIN led l ON c.digest = l.digest
        |  GROUP BY c.doc_id)
        |SELECT doc_id, n_chunks, n_fresh,
        |  round(CAST(n_fresh AS DOUBLE) / n_chunks, 4) AS novelty
        |FROM scored ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.{DedupOps, LedgerGuard}
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val path = Registry.scratchDir(s"/tmp/graft_conformance/d123_$tag")
      val docs = table(s, dir, "documents").filter(length(col("text")) > 0)
      def chunkRows(df: org.apache.spark.sql.DataFrame) = df
        .select(col("doc_id"),
          explode(graft.operators.TextOps.cdcChunks(col("text"))).as("c"))
        // the chunk uid feeds the ledger's min-id bookkeeping only
        // (membership is all the probe needs; distinct below makes
        // novelty per-DIGEST)
        .select(col("doc_id"), col("c.digest").as("digest"),
          (col("doc_id") * 10000 + col("c.idx")).as("uid"))
      val admitted = docs.filter(col("doc_id") % 3 =!= 0)
      // two generations, append-only (the d39 ingest-loop shape)
      DedupOps.writeLedger(chunkRows(admitted.filter(col("doc_id") % 2 === 0)),
        "uid", Seq("digest"), path)
      DedupOps.appendToLedger(chunkRows(admitted.filter(col("doc_id") % 2 =!= 0)),
        "uid", Seq("digest"), path)
      // probe: per-doc distinct chunk digests vs the at-rest set — the
      // admitted corpus is NEVER re-chunked here
      val batch = chunkRows(docs).select(col("doc_id"),
        DedupOps.rowFingerprint(Seq(col("digest"))).as("__fp"),
        col("digest")).distinct()
      val ledgerFps = LedgerGuard.readLedger(s, path)
        .select(col("digest").as("__fp"))
      batch.join(ledgerFps, Seq("__fp"), "left_anti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_fresh"))
        .join(batch.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks")),
          Seq("doc_id"), "right")
        .select(col("doc_id"), col("n_chunks"),
          coalesce(col("n_fresh"), lit(0L)).as("n_fresh"),
          Qf.dround(coalesce(col("n_fresh"), lit(0L)).cast("double") / col("n_chunks"), 4)
            .as("novelty"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- epoch reshuffle
    // Deterministic training-order permutation: position = global rank
    // of md5(salt:id). No RNG, no stored permutation — any worker or
    // engine recomputes the identical order from (salt, id); the global
    // row_number is the q17b distributed form (range-partitioned local
    // ranks + driver-folded slice offsets), never one fat window
    // partition. The oracle IS the definition: row_number over the same
    // md5 — hash match pins the whole permutation.
    q("d115_epoch_shuffle",
      """WITH h AS (SELECT doc_id,
        |  md5('epoch-7:' || CAST(doc_id AS VARCHAR)) AS hk FROM documents)
        |SELECT CAST(row_number() OVER (ORDER BY hk, doc_id) AS BIGINT) AS pos,
        |  doc_id, hk
        |FROM h ORDER BY pos""".stripMargin) { (s, dir) =>
      graft.operators.CurationOps.epochShuffle(
        table(s, dir, "documents"), "doc_id", "epoch-7")
        .orderBy("pos")
    },

    // ---------------------------------------------------------------- bottom-k sample ledger
    // Deterministic sampling without an RNG: the k smallest md5
    // priorities ARE the sample (the bottom-k sketch on a hash
    // priority), so membership is a pure function of (salt, id) and the
    // at-rest state is k rows. Ledger built across two advances plus a
    // replayed delivery; the oracle recomputes the bottom-k from
    // documents directly, blind to the ledger cycle — the merge
    // property bottom-k(A∪B) = bottom-k(bottom-k(A)∪bottom-k(B)) is
    // exactly what the hash match proves.
    q("d117_bottomk_sample_ledger",
      """WITH h AS (SELECT doc_id,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 's17'), 1, 8) AS BIGINT) AS pr
        |  FROM documents)
        |SELECT doc_id, pr FROM h ORDER BY pr, doc_id LIMIT 32""".stripMargin) { (s, dir) =>
      import graft.operators.CurationOps
      val docs = table(s, dir, "documents")
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val path = Registry.scratchDir(s"/tmp/graft_conformance/d117_$tag")
      CurationOps.writeSampleLedger(docs.filter(col("doc_id") % 3 === 0),
        "doc_id", "s17", 32, path)
      val g2 = docs.filter(col("doc_id") % 3 =!= 0)
      CurationOps.advanceSampleLedger(g2, "doc_id", "s17", 32, path,
        batchId = Some("g2"))
      CurationOps.advanceSampleLedger(g2, "doc_id", "s17", 32, path,
        batchId = Some("g2")) // replayed delivery: exactly-once no-op
      graft.operators.LedgerGuard.readLedger(s, path)
        .select(col("doc_id"), col("pr")).dumpSorted("pr", "doc_id")
    },

    // ---------------------------------------------------------------- weighted sample (E-S)
    // Efraimidis-Spirakis weighted sampling WITHOUT REPLACEMENT on
    // hash-derived uniforms: key = u^(1/w), top-k — weight-proportional
    // and still a pure function of (salt, id, w). Weights here are doc
    // lengths (the sample leans long) — the oracle replays the identical
    // key algebra.
    q("d118_weighted_sample",
      """WITH h AS (SELECT doc_id,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'w18'), 1, 8) AS BIGINT) AS hh,
        |  length(text) AS w FROM documents),
        |k AS (SELECT doc_id, pow((hh + 1) / 4294967296.0, 1.0 / w) AS key FROM h),
        |r AS (SELECT doc_id, key,
        |  CAST(row_number() OVER (ORDER BY key DESC, doc_id) AS INTEGER) AS rk FROM k)
        |SELECT doc_id, round(key, 6) AS pr, rk FROM r WHERE rk <= 24
        |ORDER BY rk""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
        .withColumn("__w", length(col("text")).cast("double"))
      graft.operators.CurationOps.bottomKSample(docs, "doc_id", "w18", 24,
        weightCol = Some("__w"))
        .dumpSorted("rk")
    },

    // ---------------------------------------------------------------- calibration / ECE
    // Reliability diagram + expected calibration error for a scorer
    // used as an admission probability (the d63 sweep's companion:
    // "where to cut" vs "can the scores be trusted"). Scores = the d02
    // quality score (rounded, so both engines bin identically); labels
    // = a deterministic length proxy. One map-side-combined aggregation
    // to <= 10 rows; ECE broadcast back over the bin table.
    q("d116_calibration_ece", {
      val quality =
        s"""round(0.5 * (1 - (len(list_filter($sqlTokens, t -> t IN ($stopList))) / len($sqlTokens)))
           |  + 0.5 * least(1.0, len($sqlTokens) / 100.0), 4)""".stripMargin
      s"""WITH s AS (SELECT doc_id, $quality AS score,
         |  CASE WHEN length(text) > 400 THEN 1 ELSE 0 END AS label FROM documents),
         |b AS (SELECT CAST(least(floor(score * 10), 9) AS INTEGER) AS bin,
         |    count(*) AS n, round(avg(score), 4) AS conf,
         |    round(avg(CAST(label AS DOUBLE)), 4) AS acc
         |  FROM s GROUP BY 1),
         |g AS (SELECT bin, n, conf, acc, round(abs(acc - conf), 4) AS gap FROM b)
         |SELECT bin, n, conf, acc, gap,
         |  round(sum(n * gap) OVER () / sum(n) OVER (), 4) AS ece
         |FROM g ORDER BY bin""".stripMargin
    }) { (s, dir) =>
      val scored = table(s, dir, "documents").select(
        Qf.dround(TextOps.qualityScore(col("text")), 4).as("score"),
        (length(col("text")) > 400).cast("int").as("label"))
      graft.operators.MlOps.calibrationBins(scored, "score", "label", bins = 10)
        .dumpSorted("bin")
    },

    // ---------------------------------------------------------------- leakage-safe split
    // d42's stable split decides per-document — two near-copies of one
    // page can straddle the train/test wall and quietly inflate every
    // evaluation. Here the split is decided ONCE per duplicate family
    // (by the family's min-id representative) and members inherit it;
    // the family key is whatever grouping the pipeline already has
    // (content digest, d17/d66 cluster label, canonical URL — this
    // fixture uses a shared 3-token prefix). The oracle re-derives
    // families + rep hashes in SQL — a Spark-side grouping drift would
    // change reps and hash-mismatch.
    q("d94_leakage_safe_split", {
      val h = s"${sqlHash("CAST(rep AS VARCHAR)", "split")} % 1000000"
      s"""WITH k AS (SELECT doc_id,
         |  array_to_string(list_slice(string_split(trim(text), ' '), 1, 3), ' ') AS fam
         |  FROM documents),
         |g AS (SELECT fam, min(doc_id) AS rep FROM k GROUP BY 1)
         |SELECT k.doc_id,
         |  CASE WHEN $h < 800000 THEN 'train'
         |       WHEN $h < 900000 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM k JOIN g USING (fam) ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import graft.operators.CurationOps
      val fam = expr("array_join(slice(split(trim(text), ' '), 1, 3), ' ')")
      CurationOps.leakageSafeSplit(
        table(s, dir, "documents").withColumn("fam", fam),
        "doc_id", Seq("fam"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- compression-ratio quality signal
    // deflate-ratio filtering (the RedPajama-v2-class signal):
    // byteEntropy sees only the byte histogram; deflate sees
    // REPETITION, which is what boilerplate/spam actually have. No SQL
    // oracle (DuckDB has no zlib surface and the value is
    // deterministic-per-zlib-build, not cross-engine) → rows-only +
    // the AccuracySpec gate: inflate∘deflate losslessness on 2000
    // ScalaCheck strings, repetitive ≪ prose ≪ high-entropy band
    // separation, empty→null, partitioning invariance.
    q("d95_compression_ratio", null) { (s, dir) =>
      val docs = table(s, dir, "documents")
      docs.select(col("doc_id"),
          graft.functions.CompressionExpression.deflatedSize(col("text"))
            .as("deflated_bytes"),
          octet_length(col("text")).cast("long").as("raw_bytes"),
          Qf.dround(TextOps.compressionRatio(col("text")), 4).as("ratio"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- 60-bit SimHash + complete Hamming join
    // the production-width simhash family: d09/d12's 16-bit form trades
    // recall for bucket size (single high band); at 60 bits Manku's
    // multi-block pigeonhole is affordable and COMPLETE — candidates ⊇
    // true pairs, exact bit_count rescore, so the banded join's output
    // IS the brute-force join's. The oracle is that brute force: it
    // re-derives every simhash bit from the tokens (md5-prefix token
    // hashes, sign > 0) and compares all O(n²) distinct pairs — any
    // banding recall loss would drop rows and hash-mismatch.
    q("d96_simhash60_pairs",
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS th FROM t),
        |bits AS (SELECT doc_id, j,
        |    sum(CASE WHEN (th >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, range(60) r(j) GROUP BY 1, 2),
        |sh AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0
        |    THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY 1)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
        |ORDER BY d1, d2""".stripMargin) { (s, dir) =>
      import graft.operators.DedupOps
      DedupOps.hammingPairs(
        DedupOps.simHash60Df(table(s, dir, "documents"), "doc_id", "text"),
        "doc_id", "simhash", maxHamming = 6, bits = 60)
        .orderBy("d1", "d2")
    },

    // ---------------------------------------------------------------- simhash ledger (at-rest 60-bit signatures)
    // d96's steady-state ingest form (the d48 regime for the simhash
    // family): admission simhashes each document ONCE (per-row kernel,
    // one scan), later batches probe stored (id, simhash) rows through
    // the COMPLETE bipartite Hamming join — corpus text never re-read.
    // The query runs the whole maintenance cycle (create gen-1, append
    // gen-2, replay the append crash-and-retry style, compact) before
    // probing; the oracle is file- and duplication-blind (re-derives
    // both sides' simhashes from text + brute-force cross join), so
    // the hash match proves the cycle lost and invented nothing.
    q("d97_simhash_ledger",
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS th FROM t),
        |bits AS (SELECT doc_id, j,
        |    sum(CASE WHEN (th >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, range(60) r(j) GROUP BY 1, 2),
        |sh AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0
        |    THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY 1)
        |SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        |FROM sh a JOIN sh b ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
        |ORDER BY new_id, corpus_id""".stripMargin) { (s, dir) =>
      import graft.operators.DedupOps
      val docs = table(s, dir, "documents")
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val path = Registry.scratchDir(s"/tmp/graft_conformance/d97_sh_$tag")
      val gen2 = docs.filter((col("doc_id") % 10) > 5)
      DedupOps.writeSimHashLedger(docs.filter((col("doc_id") % 10).between(1, 5)),
        "doc_id", "text", path)
      DedupOps.appendToSimHashLedger(gen2, "doc_id", "text", path,
        batchId = Some("gen-2"))
      // crash-and-retry replay: exactly-once marker no-op (unmarked
      // tolerance is unit-covered)
      DedupOps.appendToSimHashLedger(gen2, "doc_id", "text", path,
        batchId = Some("gen-2"))
      DedupOps.compactSimHashLedger(s, path, targetFiles = 4)
      DedupOps.crossDedupAgainstSimHashes(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", path,
        maxHamming = 6)
        .orderBy("new_id", "corpus_id")
    },

    // ---------------------------------------------------------------- simhash-ledger forget
    // right-to-be-forgotten for the simhash family (the m09 regime):
    // rows are id-attributed, so the purge is EXACT — forgotten docs'
    // signatures leave the store and probes stop pairing against
    // them. The oracle recomputes cross pairs from text with the
    // forgotten slice excluded, blind to the write/forget cycle.
    q("d98_simhash_forget",
      """WITH t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS th FROM t),
        |bits AS (SELECT doc_id, j,
        |    sum(CASE WHEN (th >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, range(60) r(j) GROUP BY 1, 2),
        |sh AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0
        |    THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY 1)
        |SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
        |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        |FROM sh a JOIN sh b
        |  ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0 AND b.doc_id % 3 <> 0
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
        |ORDER BY new_id, corpus_id""".stripMargin) { (s, dir) =>
      import graft.operators.DedupOps
      val docs = table(s, dir, "documents")
      val tag = s"pid${ProcessHandle.current.pid}_${dir.hashCode.toHexString}"
      val path = Registry.scratchDir(s"/tmp/graft_conformance/d98_sh_$tag")
      DedupOps.writeSimHashLedger(docs.filter(col("doc_id") % 10 =!= 0),
        "doc_id", "text", path)
      DedupOps.removeFromSimHashLedger(
        docs.filter(col("doc_id") % 3 === 0).select("doc_id"), "doc_id", path,
        batchId = Some("purge-1"))
      DedupOps.crossDedupAgainstSimHashes(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", path,
        maxHamming = 6)
        .orderBy("new_id", "corpus_id")
    },

    // ---------------------------------------------------------------- balanced sample (exact k per stratum)
    // eval-set / few-shot-pool construction: EXACTLY k docs per
    // stratum, deterministically — docs ranked inside each stratum by
    // their stable hash (so membership is reproducible across engines,
    // partitionings and corpus growth: a kept doc stays kept until k
    // better-hashed docs exist). d14's rate sample can't promise exact
    // counts; the window form row_number-sorts whole strata (the q17
    // skew trap). This runs the bounded-heap per-key top-k: each
    // stratum streams through ≤k-element partial buffers, map-side
    // combined — no stratum-wide sort anywhere.
    q("d99_balanced_sample", {
      val h = sqlHash("CAST(doc_id AS VARCHAR)", "bal")
      s"""WITH scored AS (SELECT lang, doc_id, $h AS hs FROM documents),
         |r AS (SELECT lang, doc_id, hs,
         |  row_number() OVER (PARTITION BY lang ORDER BY hs, doc_id) AS rk FROM scored)
         |SELECT lang, doc_id, CAST(rk AS INTEGER) AS rk FROM r WHERE rk <= 20
         |ORDER BY lang, rk""".stripMargin
    }) { (s, dir) =>
      val scored = table(s, dir, "documents").select(col("lang"), col("doc_id"),
        DedupOps.md5Hash32(col("doc_id").cast("string"), "bal")
          .cast("double").as("hs"))
      SimilarityOps.perKeyTopK(scored, Seq("lang"), "doc_id", "hs",
          asc = true, k = 20)
        .select(col("lang"), col("doc_id"), col("rk"))
        .dumpSorted("lang", "rk")
    },

    // ---------------------------------------------------------------- simhash near-dup clusters
    // d17's clustering composition on the 60-bit family: COMPLETE
    // Hamming pairs (so unlike d17's banded-LSH graph the edge set is
    // exactly the ≤-threshold graph) → connected components → min-id
    // labels + sizes. Docs with no within-budget neighbor don't appear
    // (the d17 contract). The oracle re-derives simhashes, brute-forces
    // the pair graph, and closes it with a recursive CTE — label and
    // size must match per doc, hash-checked.
    q("d100_simhash_clusters",
      """WITH RECURSIVE t AS (SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
        |h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS th FROM t),
        |bits AS (SELECT doc_id, j,
        |    sum(CASE WHEN (th >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM h, range(60) r2(j) GROUP BY 1, 2),
        |sh AS (SELECT doc_id, CAST(sum(CASE WHEN s > 0
        |    THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY 1),
        |cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE bit_count(xor(a.simhash, b.simhash)) <= 6),
        |e AS (SELECT d1 AS u, d2 AS v FROM cand UNION SELECT d2, d1 FROM cand),
        |r(u, v) AS (SELECT u, v FROM e UNION SELECT r.u, e.v FROM r JOIN e ON r.v = e.u),
        |lab AS (SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM r GROUP BY u)
        |SELECT doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
        |FROM lab ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.DedupOps
      val docs = table(s, dir, "documents")
      val pairs = DedupOps.hammingPairs(
        DedupOps.simHash60Df(docs, "doc_id", "text"),
        "doc_id", "simhash", maxHamming = 6, bits = 60)
      val labels = DedupOps.connectedComponents(pairs, "d1", "d2")
        .select(col("node").as("doc_id"), col("label").as("cluster_id"))
      // sizes via partial-agg + join, never count-over-window (the d17
      // rationale: dup clusters are where pathological corpora pile up)
      val sizes = labels.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
      labels.join(sizes, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- temperature-scaled source sampling
    // the multilingual α-smoothing mixture (XLM-R/mT5, α = 0.5 via
    // exact-cross-engine sqrt): raw shares flatten to p^α, each source
    // keeps rows at min(1, B·q/T) — small sources upweighted, budget
    // respected in expectation. The oracle re-derives shares (float
    // normalizer summed in KEY order both sides — bit-identical),
    // integer ppm rates, AND the per-source kept-doc counts through
    // the same stable-hash membership predicate — so the hash match
    // pins the rate table and row-level membership together.
    q("d101_temperature_mix", {
      val h = s"${sqlHash("CAST(d.doc_id AS VARCHAR)", "")} % 1000000"
      s"""WITH tc AS (SELECT source, CAST(sum(len(string_split(trim(text), ' '))) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY 1),
         |qq AS (SELECT source, n_tokens, sqrt(CAST(n_tokens AS DOUBLE)) AS sm FROM tc),
         |s AS (SELECT *, sum(sm) OVER (ORDER BY source
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS qsum FROM qq),
         |b AS (SELECT sum(n_tokens) * 2 // 5 AS budget FROM tc),
         |r AS (SELECT source, n_tokens, sm / qsum AS q,
         |    CASE WHEN n_tokens = 0 THEN 0
         |         ELSE least(1000000, CAST(round(least(1.0,
         |           CAST(budget AS DOUBLE) * (sm / qsum) / n_tokens) * 1000000, 0) AS BIGINT))
         |    END AS keep_ppm
         |  FROM s, b),
         |k AS (SELECT d.source, count(*) AS n_kept
         |  FROM documents d JOIN r ON d.source = r.source
         |  WHERE $h < r.keep_ppm GROUP BY 1)
         |SELECT r.source, r.n_tokens, round(r.q, 6) AS q, r.keep_ppm,
         |  coalesce(k.n_kept, 0) AS n_kept
         |FROM r LEFT JOIN k ON r.source = k.source
         |ORDER BY r.source""".stripMargin
    }) { (s, dir) =>
      import graft.operators.CurationOps
      val docs = table(s, dir, "documents")
      val counts = docs.groupBy(col("source"))
        .agg(sum(TextOps.tokenCount(col("text")).cast("long")).as("__tot"))
      val budget = counts.agg(sum(col("__tot"))).first.getLong(0) * 2 / 5
      val rates = CurationOps.temperatureSampleRates(counts, "source", "__tot",
        budget, alpha = 0.5)
      val kept = docs.join(broadcast(rates.select(col("source"), col("keep_ppm"))),
          Seq("source"))
        .filter(pmod(DedupOps.md5Hash32(col("doc_id").cast("string"), ""),
          lit(1000000L)) < col("keep_ppm"))
        .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      rates.join(kept, Seq("source"), "left")
        .select(col("source"), col("n_tokens"), Qf.dround(col("q"), 6).as("q"),
          col("keep_ppm"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
        .dumpSorted("source")
    },

    // ---------------------------------------------------------------- interpolated LM scoring (same ledger)
    // Jelinek-Mercer over the d90 store: λ2·p_ML(w2|w1) + λ1·p_uni(w2)
    // + λ0/V — rare-but-fluent continuations score through the unigram
    // channel, unseen tokens hit the uniform floor. The unigram counts
    // are the ledger's per-w1 row sums (the tail rows earn their keep a
    // second time). Oracle re-derives all four tables from documents
    // and replays the same multiply-add order — hash match.
    q("d102_interpolated_lm",
      """WITH lst AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
        |tok AS (SELECT doc_id, unnest(l) AS w FROM lst),
        |uni AS (SELECT w, count(*) AS nu FROM tok GROUP BY 1),
        |nv AS (SELECT CAST(sum(nu) AS DOUBLE) AS bigN,
        |         CAST(count(*) AS DOUBLE) AS vocab FROM uni),
        |big AS (SELECT doc_id, unnest(list_zip(l[:len(l)-1], l[2:])) AS z
        |        FROM lst WHERE len(l) >= 2),
        |pairs AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM big),
        |c2 AS (SELECT w1, w2, count(*) AS n2 FROM pairs GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS n1 FROM pairs GROUP BY 1),
        |scored AS (
        |  SELECT p.doc_id,
        |    -ln(0.7 * coalesce(CAST(c2.n2 AS DOUBLE) / c1.n1, 0.0)
        |      + 0.25 * coalesce(CAST(u.nu AS DOUBLE) / nv.bigN, 0.0)
        |      + 0.05 / nv.vocab) AS nll
        |  FROM pairs p
        |  LEFT JOIN c2 ON p.w1 = c2.w1 AND p.w2 = c2.w2
        |  LEFT JOIN c1 ON p.w1 = c1.w1
        |  LEFT JOIN uni u ON p.w2 = u.w, nv
        |  WHERE p.doc_id % 7 = 0)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
        |  round(avg(nll), 4) AS avg_nll
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.CurationOps
      val docs = table(s, dir, "documents")
      // d102 and d107 probe the SAME store state (write 60%, advance
      // 40%) with different scorers — the ledger is built ONCE per
      // (session, fixture) and both pay only their probe, the build-
      // once/probe-many amortization the store exists for (mutation
      // semantics are d90/d91's coverage). The build's compaction
      // persisted the derived model tables: the probes bind them and
      // recompute nothing (same hashes either way — the LM spec pins
      // sidecar ≡ recomputed).
      val path = sharedLmLedger(s, dir, docs)
      CurationOps.bigramScoreInterpolated(docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", path)
        .select(col("doc_id"), col("n_bigrams"),
          Qf.dround(col("avg_nll_raw"), 4).as("avg_nll"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- Kneser-Ney scoring (same ledger)
    // the THIRD scorer off the one d90 store (Laplace d91,
    // Jelinek-Mercer d102, interpolated Kneser-Ney this — Chen &
    // Goodman 1998 §2.7, the smoothing the CCNet-class scorers
    // actually deploy): absolute discount on seen bigrams, freed mass
    // routed to the CONTINUATION distribution N1+(·,w2)/N1+(··) — the
    // "Francisco stays cheap outside San Francisco" property raw
    // frequency can't express. Every model quantity is a row-sum or
    // distinct-count over the ledger's (w1, w2, n) rows; a small
    // uniform floor keeps unseen-everything finite. The oracle
    // re-derives all five tables from documents and replays the exact
    // discount/backoff arithmetic — hash match.
    q("d107_kneser_ney",
      """WITH lst AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
        |tok AS (SELECT doc_id, unnest(l) AS w FROM lst),
        |vv AS (SELECT CAST(count(DISTINCT w) AS DOUBLE) AS vocab FROM tok),
        |big AS (SELECT doc_id, unnest(list_zip(l[:len(l)-1], l[2:])) AS z
        |        FROM lst WHERE len(l) >= 2),
        |pairs AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM big),
        |c2 AS (SELECT w1, w2, count(*) AS n2 FROM pairs GROUP BY 1, 2),
        |by1 AS (SELECT w1, sum(n2) AS n1, CAST(count(*) AS DOUBLE) AS n1fw
        |        FROM c2 GROUP BY 1),
        |by2 AS (SELECT w2, CAST(count(*) AS DOUBLE) AS n1bw FROM c2 GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS DOUBLE) AS n1tot FROM c2),
        |scored AS (
        |  SELECT p.doc_id,
        |    -ln((1.0 - 0.05) * (CASE WHEN by1.n1 IS NOT NULL
        |        THEN greatest(coalesce(CAST(c2.n2 AS DOUBLE), 0.0) - 0.75, 0.0) / by1.n1
        |             + 0.75 * by1.n1fw / by1.n1 * coalesce(by2.n1bw / tt.n1tot, 0.0)
        |        ELSE coalesce(by2.n1bw / tt.n1tot, 0.0) END)
        |      + 0.05 / vv.vocab) AS nll
        |  FROM pairs p
        |  LEFT JOIN c2 ON p.w1 = c2.w1 AND p.w2 = c2.w2
        |  LEFT JOIN by1 ON p.w1 = by1.w1
        |  LEFT JOIN by2 ON p.w2 = by2.w2, tt, vv
        |  WHERE p.doc_id % 7 = 0)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_bigrams,
        |  round(avg(nll), 4) AS avg_nll
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.CurationOps
      val docs = table(s, dir, "documents")
      // one shared build with d102 (see its note): same store state,
      // different scorer — this query pays only the KN probe
      val path = sharedLmLedger(s, dir, docs)
      CurationOps.bigramScoreKneserNey(docs.filter(col("doc_id") % 7 === 0),
        "doc_id", "text", path)
        .select(col("doc_id"), col("n_bigrams"),
          Qf.dround(col("avg_nll_raw"), 4).as("avg_nll"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- code-fence extraction
    // the code-corpus curation primitive (the StarCoder-class pipelines
    // extract fenced blocks + language tags from markdown/web text
    // before any code-specific filtering): per document, the fenced
    // ``` blocks — count, ordered language tags (untagged → '?'), code
    // characters, and an order-faithful content fingerprint. One scan,
    // one regexp kernel per row (non-greedy [\s\S]*? so blocks never
    // merge across a following fence); an unclosed fence is NOT a
    // block (class-3 fixture pins it). Both engines speak the same
    // RE2-compatible pattern, so the extraction is hash-checked, not
    // gated. The fixture appends deterministic fence classes: two
    // blocks (tagged + untagged), no fences, one multi-line block, a
    // broken unclosed fence, and back-to-back adjacent blocks.
    q("d108_code_fences", {
      val fixSql =
        """CASE doc_id % 5
          |      WHEN 0 THEN E' intro ```python\nprint(1)\n``` mid ```\nplain\n``` end'
          |      WHEN 1 THEN ''
          |      WHEN 2 THEN E' ```scala\nval x = 1\nval y = 2\n```'
          |      WHEN 3 THEN ' broken ``` fence without close'
          |      ELSE E' tight ```c\nx;\n``````go\ny()\n```' END""".stripMargin
      s"""WITH f AS (SELECT doc_id, text || $fixSql AS t FROM documents),
         |m AS (SELECT doc_id,
         |  regexp_extract_all(t, '```(\\w*)\\n([\\s\\S]*?)```', 1) AS langs,
         |  regexp_extract_all(t, '```(\\w*)\\n([\\s\\S]*?)```', 2) AS bodies
         |  FROM f)
         |SELECT doc_id, CAST(len(bodies) AS INTEGER) AS n_blocks,
         |  coalesce(array_to_string(list_transform(langs,
         |    x -> CASE WHEN x = '' THEN '?' ELSE x END), ','), '') AS langs,
         |  CAST(coalesce(list_sum(list_transform(bodies, b -> length(b))), 0) AS INTEGER) AS code_chars,
         |  md5(coalesce(array_to_string(bodies, chr(1)), '')) AS bodies_fp
         |FROM m ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val fix = concat(col("text"),
        when(col("doc_id") % 5 === 0,
          lit(" intro ```python\nprint(1)\n``` mid ```\nplain\n``` end"))
        .when(col("doc_id") % 5 === 1, lit(""))
        .when(col("doc_id") % 5 === 2, lit(" ```scala\nval x = 1\nval y = 2\n```"))
        .when(col("doc_id") % 5 === 3, lit(" broken ``` fence without close"))
        .otherwise(lit(" tight ```c\nx;\n``````go\ny()\n```")))
      val pat = lit("```(\\w*)\\n([\\s\\S]*?)```")
      table(s, dir, "documents")
        .select(col("doc_id"),
          regexp_extract_all(fix, pat, lit(1)).as("__langs"),
          regexp_extract_all(fix, pat, lit(2)).as("__bodies"))
        .select(col("doc_id"),
          size(col("__bodies")).as("n_blocks"),
          concat_ws(",", transform(col("__langs"),
            x => when(x === "", lit("?")).otherwise(x))).as("langs"),
          coalesce(aggregate(col("__bodies"), lit(0),
            (a, b) => a + length(b)), lit(0)).as("code_chars"),
          md5(concat_ws("\u0001", col("__bodies"))).as("bodies_fp"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- license-tag gate
    // the code-corpus curation stage between crawl and train: SPDX
    // identifiers + canonical license-header phrases, classified
    // copyleft > permissive > cc > other > none (one GPL header
    // poisons permissive-only use regardless of other stamps — the
    // %11 overlay exercises exactly that precedence). Deterministic
    // doc_id-derived augmentation so every class occurs; the oracle
    // replays the same literal patterns, so classification + gate are
    // hash-checked. Pure regexp composition per row — zero shuffle.
    q("d111_license_gate", {
      // single line: it interpolates into a stripMargin'd SQL template,
      // where an embedded "||" at start-of-line would lose a pipe
      val augSql = Seq(
        "text || CASE doc_id % 9",
        "WHEN 0 THEN E'\\n# SPDX-License-Identifier: MIT\\n'",
        "WHEN 1 THEN E'\\nSPDX-License-Identifier: Apache-2.0\\nLicensed under the Apache License, Version 2.0\\n'",
        "WHEN 2 THEN E'\\nSPDX-License-Identifier: GPL-3.0-only\\n'",
        "WHEN 3 THEN E'\\nRedistribution and use in source and binary forms, with or without modification\\n'",
        "WHEN 4 THEN E'\\nPermission is hereby granted, free of charge, to any person\\n'",
        "WHEN 5 THEN E'\\nThis work is licensed under a Creative Commons Attribution 4.0 License\\n'",
        // the r12 ADVICE policy edges, exercised both ways: CC0 is a
        // public-domain dedication → permissive (NOT cc), while
        // BSD-4-Clause's advertising clause drops it to other
        "WHEN 6 THEN E'\\nSPDX-License-Identifier: CC0-1.0\\n'",
        "WHEN 7 THEN E'\\nSPDX-License-Identifier: BSD-4-Clause\\n'",
        "ELSE '' END",
        "|| CASE WHEN doc_id % 11 = 0 THEN E'\\nThis file is part of a GNU General Public License project\\n' ELSE '' END")
        .mkString(" ")
      s"""WITH a AS (SELECT doc_id, $augSql AS t FROM documents),
         |x AS (SELECT doc_id, t,
         |  regexp_extract_all(t, 'SPDX-License-Identifier:[ \\t]*([A-Za-z0-9.+-]+)', 1) AS l
         |  FROM a),
         |c AS (SELECT doc_id, l,
         |  CASE
         |    WHEN regexp_matches(t, 'GNU (Affero )?(Lesser )?General Public License')
         |      OR len(list_filter(l, s -> regexp_matches(s, '^(GPL|AGPL|LGPL)'))) > 0
         |      OR len(list_filter(l, s -> regexp_matches(s, '^(MPL|EPL|EUPL|CDDL)'))) > 0
         |    THEN 'copyleft'
         |    WHEN contains(t, 'Permission is hereby granted, free of charge')
         |      OR contains(t, 'Redistribution and use in source and binary forms')
         |      OR contains(t, 'Licensed under the Apache License')
         |      OR len(list_filter(l, s -> regexp_matches(s, '^(MIT|Apache|ISC|Zlib|Unlicense|0BSD|CC0)')
         |            OR (regexp_matches(s, '^BSD') AND NOT regexp_matches(s, '^BSD-4-Clause')))) > 0
         |    THEN 'permissive'
         |    WHEN contains(t, 'Creative Commons')
         |      OR len(list_filter(l, s -> regexp_matches(s, '^CC'))) > 0
         |    THEN 'cc'
         |    WHEN len(l) > 0 THEN 'other'
         |    ELSE 'none' END AS license_class
         |  FROM x)
         |SELECT doc_id, coalesce(array_to_string(l, ';'), '') AS spdx,
         |  CAST(len(l) AS INTEGER) AS n_spdx, license_class,
         |  license_class = 'permissive' AS allowed
         |FROM c ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      import graft.operators.TextOps
      val aug = concat(
        col("text"),
        when(col("doc_id") % 9 === 0, "\n# SPDX-License-Identifier: MIT\n")
          .when(col("doc_id") % 9 === 1,
            "\nSPDX-License-Identifier: Apache-2.0\nLicensed under the Apache License, Version 2.0\n")
          .when(col("doc_id") % 9 === 2, "\nSPDX-License-Identifier: GPL-3.0-only\n")
          .when(col("doc_id") % 9 === 3,
            "\nRedistribution and use in source and binary forms, with or without modification\n")
          .when(col("doc_id") % 9 === 4,
            "\nPermission is hereby granted, free of charge, to any person\n")
          .when(col("doc_id") % 9 === 5,
            "\nThis work is licensed under a Creative Commons Attribution 4.0 License\n")
          .when(col("doc_id") % 9 === 6, "\nSPDX-License-Identifier: CC0-1.0\n")
          .when(col("doc_id") % 9 === 7, "\nSPDX-License-Identifier: BSD-4-Clause\n")
          .otherwise(""),
        when(col("doc_id") % 11 === 0,
          "\nThis file is part of a GNU General Public License project\n").otherwise(""))
      table(s, dir, "documents")
        .select(col("doc_id"), aug.as("t"))
        .select(col("doc_id"),
          concat_ws(";", TextOps.spdxTags(col("t"))).as("spdx"),
          size(TextOps.spdxTags(col("t"))).as("n_spdx"),
          TextOps.licenseClass(col("t")).as("license_class"),
          TextOps.licenseGate(col("t")).as("allowed"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- ABTT top component (power iteration)
    // All-but-the-Top post-processing, first half (Mu & Viswanath
    // 2018): the corpus mean + dominant direction of the centered
    // embeddings, two power-iteration rounds from the exact 1/√64
    // start. Every per-dim quantity is rounded at each step (the
    // groupCentroids contract) so summation-order ulps never compound
    // through the normalization. The oracle replays both rounds as
    // chained CTEs — the d72/d85 chained-round regime — and the hash
    // match pins mean, component, and the deterministic sign fix.
    q("s20_abtt_component",
      """WITH e AS (SELECT embedding AS v FROM embeddings),
        |d AS (SELECT CAST(i AS INTEGER) AS i FROM range(1, 65) t(i)),
        |mu AS (SELECT i, round(avg(v[i]), 6) AS m FROM e, d GROUP BY i),
        |mv0 AS (SELECT sum(m * 0.125) AS mdv FROM mu),
        |c0 AS (SELECT v, list_sum(list_transform(range(1, 65), j -> v[j] * 0.125)) - mv0.mdv AS c
        |       FROM e, mv0),
        |s0 AS (SELECT i, sum(v[i] * c) AS xy, sum(c) AS sc FROM c0, d GROUP BY i),
        |y0 AS (SELECT s0.i, round(xy - m * sc, 6) AS y FROM s0 JOIN mu ON s0.i = mu.i),
        |n0 AS (SELECT sqrt(sum(y * y)) AS nrm FROM y0),
        |v1 AS (SELECT i, round(y / nrm, 6) AS w FROM y0, n0),
        |l1 AS (SELECT list(w ORDER BY i) AS vl FROM v1),
        |mv1 AS (SELECT sum(m * w) AS mdv FROM mu JOIN v1 USING (i)),
        |c1 AS (SELECT v, list_sum(list_transform(range(1, 65), j -> v[j] * vl[j])) - mv1.mdv AS c
        |       FROM e, l1, mv1),
        |s1 AS (SELECT i, sum(v[i] * c) AS xy, sum(c) AS sc FROM c1, d GROUP BY i),
        |y1 AS (SELECT s1.i, round(xy - m * sc, 6) AS y FROM s1 JOIN mu ON s1.i = mu.i),
        |n1 AS (SELECT sqrt(sum(y * y)) AS nrm FROM y1),
        |v2 AS (SELECT i, round(y / nrm, 6) AS w FROM y1, n1),
        |sgn AS (SELECT CASE WHEN (SELECT w FROM v2 ORDER BY abs(w) DESC, i LIMIT 1) < 0
        |          THEN -1.0 ELSE 1.0 END AS f)
        |SELECT v2.i - 1 AS pos, mu.m AS mu, v2.w * sgn.f + 0.0 AS comp
        |FROM v2 JOIN mu ON v2.i = mu.i, sgn
        |ORDER BY pos""".stripMargin) { (s, dir) =>
      SimilarityOps.topComponent(table(s, dir, "embeddings"), "embedding",
        iters = 2)
    },

    // ---------------------------------------------------------------- payment-card PII (Luhn)
    // the d84 family's fourth rule: maximal digit[-sep-digit] runs,
    // 13-19 digits, LUHN-validated — the checksum conditional a pure
    // regex pass cannot express, which is why the oracle extracts the
    // runs with RE2 and replays Luhn as list math. OVER-LONG runs
    // (>19 digits) are greedily segmented at group boundaries (see
    // PiiUtil.nextSegment — adjacent cards separated by one space/dash
    // merge into one run and must still redact), which the oracle
    // replays as a per-run recursive-CTE greedy walk over a
    // (start-group → longest-valid-segment) table. The fixture appends
    // deterministic cards per doc: two valid test numbers (space- and
    // dash-separated), a Luhn-failing 16er, a too-short 12er, a
    // too-long 20er (contiguous — no boundaries, stays an ID), and the
    // adjacent-cards pair a whole-run-only rule silently leaks — each
    // class must classify correctly on top of whatever stray digit
    // runs the corpus text already has.
    q("d103_card_scrub", {
      val fixSql =
        """CASE doc_id % 6
          |      WHEN 0 THEN ' pay 4539 1488 0343 6467 and 6011-0009-9013-9424'
          |      WHEN 1 THEN ' ref 1234 5678 9012 3456'
          |      WHEN 2 THEN ' id 123456789012 end'
          |      WHEN 3 THEN ' big 12345678901234567890'
          |      WHEN 4 THEN ' duo 4539 1488 0343 6467 6011-0009-9013-9424'
          |      ELSE '' END""".stripMargin
      def luhn(sx: String) =
        s"""list_sum(list_transform(range(1, length($sx) + 1), k ->
           |      CASE WHEN k % 2 = 0
           |        THEN CASE WHEN 2 * CAST(substr($sx, length($sx) - k + 1, 1) AS INTEGER) > 9
           |             THEN 2 * CAST(substr($sx, length($sx) - k + 1, 1) AS INTEGER) - 9
           |             ELSE 2 * CAST(substr($sx, length($sx) - k + 1, 1) AS INTEGER) END
           |        ELSE CAST(substr($sx, length($sx) - k + 1, 1) AS INTEGER) END)) % 10 = 0""".stripMargin
      val seg = "array_to_string(g[c.i:c.j], '')"
      s"""WITH RECURSIVE f AS (SELECT doc_id, text || $fixSql AS t FROM documents),
         |runs AS (SELECT doc_id, rid, l[rid] AS r
         |  FROM (SELECT doc_id, regexp_extract_all(t, '\\d([ -]?\\d)*') AS l FROM f),
         |       UNNEST(range(1, len(l) + 1)) AS u(rid)),
         |ds AS (SELECT doc_id, rid, r, replace(replace(r, ' ', ''), '-', '') AS d FROM runs),
         |ok1 AS (SELECT doc_id, length(d) AS nd FROM ds
         |  WHERE length(d) BETWEEN 13 AND 19 AND ${luhn("d")}),
         |og AS (SELECT doc_id, rid, regexp_split_to_array(r, '[ -]') AS g,
         |         len(regexp_split_to_array(r, '[ -]')) AS ng
         |       FROM ds WHERE length(d) > 19),
         |bestj AS (
         |  SELECT o.doc_id, o.rid, c.i, max(c.j) AS j, max_by(length($seg), c.j) AS nd
         |  FROM og o,
         |       LATERAL (SELECT ui.i, uj.j FROM UNNEST(range(1, o.ng + 1)) ui(i),
         |                UNNEST(range(1, o.ng + 1)) uj(j) WHERE uj.j >= ui.i) c(i, j)
         |  WHERE length($seg) BETWEEN 13 AND 19 AND ${luhn(seg)}
         |  GROUP BY 1, 2, 3),
         |greedy AS (
         |  SELECT doc_id, rid, ng, 1 AS pos, CAST(NULL AS INTEGER) AS card_nd FROM og
         |  UNION ALL
         |  SELECT g2.doc_id, g2.rid, g2.ng,
         |         CAST(coalesce(b.j + 1, g2.pos + 1) AS INTEGER) AS pos,
         |         CAST(b.nd AS INTEGER) AS card_nd
         |  FROM greedy g2
         |  LEFT JOIN bestj b ON b.doc_id = g2.doc_id AND b.rid = g2.rid AND b.i = g2.pos
         |  WHERE g2.pos <= g2.ng),
         |ok2 AS (SELECT doc_id, card_nd AS nd FROM greedy WHERE card_nd IS NOT NULL),
         |ok AS (SELECT * FROM ok1 UNION ALL SELECT * FROM ok2)
         |SELECT f.doc_id, CAST(coalesce(count(ok.nd), 0) AS INTEGER) AS n_cards,
         |  CAST(coalesce(sum(ok.nd), 0) AS INTEGER) AS n_card_digits
         |FROM f LEFT JOIN ok ON f.doc_id = ok.doc_id
         |GROUP BY f.doc_id ORDER BY f.doc_id""".stripMargin
    }) { (s, dir) =>
      val fix = concat(col("text"),
        when(col("doc_id") % 6 === 0,
          lit(" pay 4539 1488 0343 6467 and 6011-0009-9013-9424"))
        .when(col("doc_id") % 6 === 1, lit(" ref 1234 5678 9012 3456"))
        .when(col("doc_id") % 6 === 2, lit(" id 123456789012 end"))
        .when(col("doc_id") % 6 === 3, lit(" big 12345678901234567890"))
        .when(col("doc_id") % 6 === 4,
          lit(" duo 4539 1488 0343 6467 6011-0009-9013-9424"))
        .otherwise(lit("")))
      table(s, dir, "documents")
        .select(col("doc_id"), TextOps.cardCounts(fix).as("__c"))
        .select(col("doc_id"), col("__c.n_cards").as("n_cards"),
          col("__c.n_card_digits").as("n_card_digits"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- mean-pooled document embeddings
    // the late-chunking aggregation: document vectors as the
    // L2-normalized mean of their chunks' embeddings (here: vec_id %
    // 50 groups stand in for a doc's chunks). groupCentroids is the
    // 100 TB shape — posexplode partial aggregates carry (group × dim)
    // scalars, never vectors — and the centroid components are ROUNDED
    // before normalization so cross-engine summation-order ulps can't
    // leak into the output (the s20 discipline).
    q("s21_doc_embedding",
      """WITH c AS (SELECT vec_id % 50 AS doc_id, embedding AS v FROM embeddings),
        |d AS (SELECT CAST(i AS INTEGER) AS i FROM range(1, 65) t(i)),
        |m AS (SELECT doc_id, i, round(avg(v[i]), 6) AS c FROM c, d GROUP BY 1, 2),
        |n AS (SELECT doc_id, sqrt(sum(c * c)) AS nrm FROM m GROUP BY 1)
        |SELECT m.doc_id, m.i - 1 AS pos, round(m.c / n.nrm, 6) AS comp
        |FROM m JOIN n ON m.doc_id = n.doc_id
        |ORDER BY m.doc_id, pos""".stripMargin) { (s, dir) =>
      val chunks = table(s, dir, "embeddings")
        .select((col("vec_id") % 50).as("doc_id"), col("embedding"))
      val cen = SimilarityOps.groupCentroids(chunks, "doc_id", "embedding")
        .withColumn("__nrm",
          sqrt(aggregate(col("centroid"), lit(0.0), (a, x) => a + x * x)))
      cen.select(col("doc_id"), posexplode(col("centroid")).as(Seq("pos", "__c")))
        .join(cen.select(col("doc_id"), col("__nrm")), Seq("doc_id"))
        .select(col("doc_id"), col("pos"),
          Qf.dround(col("__c") / col("__nrm"), 6).as("comp"))
        .orderBy("doc_id", "pos")
    },

    // ---------------------------------------------------------------- FIM example construction
    // fill-in-the-middle pretraining transform (Bavarian et al. 2022):
    // split each document into (prefix, middle, suffix) at two
    // DETERMINISTIC hash-derived token cuts and emit the PSM layout
    // `<PRE>prefix<SUF>suffix<MID>middle` — the same doc always yields
    // the same example across engines, partitionings and retries (the
    // d42 stable-hash discipline applied to an augmentation that is
    // usually left to run-time RNG, where it silently breaks replay).
    // Per-row codegen (hash + slice + join), zero shuffle; docs under
    // 3 tokens can't split and pass through as plain text.
    q("d104_fim_transform", {
      val h1 = sqlHash("CAST(doc_id AS VARCHAR)", "f1")
      val h2 = sqlHash("CAST(doc_id AS VARCHAR)", "f2")
      s"""WITH d AS (SELECT doc_id, string_split(trim(text), ' ') AS l FROM documents),
         |c AS (SELECT doc_id, l, len(l) AS n,
         |    1 + $h1 % (len(l) - 2) AS c1 FROM d WHERE len(l) >= 3),
         |c2t AS (SELECT *, c1 + 1 + $h2 % (n - c1 - 1) AS c2 FROM c)
         |SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
         |  '<PRE>' || array_to_string(list_slice(l, 1, c1), ' ') ||
         |  '<SUF>' || array_to_string(list_slice(l, c2 + 1, n), ' ') ||
         |  '<MID>' || array_to_string(list_slice(l, c1 + 1, c2), ' ') AS psm
         |FROM c2t
         |UNION ALL
         |SELECT doc_id, CAST(len(l) AS INTEGER) AS n_tokens,
         |  array_to_string(l, ' ') AS psm
         |FROM d WHERE len(l) < 3
         |ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val docs = table(s, dir, "documents")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("__l"))
        .withColumn("__n", size(col("__l")))
      val h1 = DedupOps.md5Hash32(col("doc_id").cast("string"), "f1")
      val h2 = DedupOps.md5Hash32(col("doc_id").cast("string"), "f2")
      val split = docs.filter(col("__n") >= 3)
        .withColumn("__c1", lit(1) + pmod(h1, (col("__n") - 2).cast("long")).cast("int"))
        .withColumn("__c2", col("__c1") + lit(1) +
          pmod(h2, (col("__n") - col("__c1") - 1).cast("long")).cast("int"))
        .select(col("doc_id"), col("__n").cast("int").as("n_tokens"),
          concat(lit("<PRE>"),
            array_join(slice(col("__l"), lit(1), col("__c1")), " "),
            lit("<SUF>"),
            array_join(slice(col("__l"), col("__c2") + 1, col("__n") - col("__c2")), " "),
            lit("<MID>"),
            array_join(slice(col("__l"), col("__c1") + 1, col("__c2") - col("__c1")), " "))
            .as("psm"))
      val tiny = docs.filter(col("__n") < 3)
        .select(col("doc_id"), col("__n").cast("int").as("n_tokens"),
          array_join(col("__l"), " ").as("psm"))
      split.unionByName(tiny).orderBy("doc_id")
    },

    // ---------------------------------------------------------------- corpus export (capstone)
    // the END of the pipeline: stable-hash split assignment (d42's) →
    // context-window packing within each split (d28's) → the packed
    // manifest WRITTEN to split-partitioned parquet at rest → read
    // back → per-(split, bin) accounting. The oracle re-derives split
    // + packing + counts from scratch in SQL, so the hash match proves
    // the whole export path — including the file round-trip — is
    // deterministic end to end.
    q("d76_corpus_export", {
      val h = s"${sqlHash("CAST(doc_id AS VARCHAR)", "split")} % 1000000"
      s"""WITH t AS (SELECT doc_id, CAST(len($sqlTokens) AS BIGINT) AS n_tok,
         |  CASE WHEN $h < 800000 THEN 'train'
         |       WHEN $h < 900000 THEN 'val' ELSE 'test' END AS split
         |  FROM documents),
         |c AS (SELECT split, doc_id, n_tok,
         |  sum(n_tok) OVER (PARTITION BY split ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok AS cum
         |  FROM t)
         |SELECT split, CAST(floor(cum / 2048) AS INTEGER) AS bin,
         |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM c GROUP BY 1, 2 ORDER BY split, bin""".stripMargin
    }) { (s, dir) =>
      import graft.operators.CurationOps
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/d76_exp_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      val withSplit = table(s, dir, "documents")
        .withColumn("split", CurationOps.splitAssign(col("doc_id"),
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
      val packed = CurationOps.packBins(withSplit, "split", "doc_id", "text",
        contextLen = 2048)
      packed.write.mode("overwrite").partitionBy("split").parquet(path)
      // explicit schema: data columns match the files by name, the
      // `split` partition column resolves from the directory level —
      // skips the partition-discovery schema-inference job
      s.read.schema(org.apache.spark.sql.types.StructType(
          packed.schema.fields.map(_.copy(nullable = true)))).parquet(path)
        .groupBy(col("split"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
        .orderBy("split", "bin")
    },

    // ---------------------------------------------------------------- embedding QA
    // the vector-ingest health report every embedding pipeline runs
    // before indexing: null / NaN / zero-norm counts (the rows that
    // poison cosine math downstream) + the norm distribution (mean and
    // EXACT median via the histogram-selection percentile plan — the
    // d51 regime with a constant group key). One scan for the flags +
    // moments; the median adds the percentile plan's bounded passes.
    q("s18_embedding_qa",
      """WITH n AS (SELECT vec_id,
        |  CASE WHEN embedding IS NULL THEN NULL
        |       ELSE sqrt(list_sum(list_transform(range(1, 65), i -> embedding[i] * embedding[i])))
        |  END AS nrm,
        |  CASE WHEN embedding IS NULL THEN 1 ELSE 0 END AS is_null,
        |  CASE WHEN embedding IS NOT NULL
        |        AND len(list_filter(embedding, x -> isnan(x))) > 0 THEN 1 ELSE 0 END AS is_nan
        |  FROM embeddings)
        |SELECT CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(is_null) AS INTEGER) AS n_null,
        |  CAST(sum(is_nan) AS INTEGER) AS n_nan,
        |  CAST(count(*) FILTER (WHERE nrm = 0) AS INTEGER) AS n_zero,
        |  round(avg(nrm), 4) AS norm_mean,
        |  round(quantile_cont(nrm, 0.5), 4) AS norm_p50,
        |  round(min(nrm), 4) AS norm_min,
        |  round(max(nrm), 4) AS norm_max
        |FROM n""".stripMargin) { (s, dir) =>
      import graft.operators.PercentileOps
      val n = table(s, dir, "embeddings").select(
        when(col("embedding").isNull, lit(null).cast("double"))
          .otherwise(SimilarityOps.norm(col("embedding"))).as("nrm"),
        col("embedding").isNull.cast("int").as("is_null"),
        (col("embedding").isNotNull &&
          exists(col("embedding"), x => isnan(x))).cast("int").as("is_nan"),
        lit(1).as("__qa_g"))
      val agg = n.groupBy(col("__qa_g")).agg(
        count(lit(1)).as("n_vecs"),
        sum(col("is_null")).cast("int").as("n_null"),
        sum(col("is_nan")).cast("int").as("n_nan"),
        sum(when(col("nrm") === 0, 1).otherwise(0)).cast("int").as("n_zero"),
        Qf.dround(avg(col("nrm")), 4).as("norm_mean"),
        Qf.dround(min(col("nrm")), 4).as("norm_min"),
        Qf.dround(max(col("nrm")), 4).as("norm_max"))
      val med = PercentileOps.exactQuantilesSelect(n, Seq("__qa_g"),
        Seq(("nrm", col("nrm"), Seq(("norm_p50", 0.5, false)))))
      agg.join(med, Seq("__qa_g"))
        .select(col("n_vecs"), col("n_null"), col("n_nan"), col("n_zero"),
          col("norm_mean"), Qf.dround(col("norm_p50"), 4).as("norm_p50"),
          col("norm_min"), col("norm_max"))
    },

    // ---------------------------------------------------------------- Zipf fit
    // corpus-health statistic: the power-law slope of the token
    // frequency distribution (ln freq vs ln rank, least squares over
    // the top-1000 vocab) — natural corpora sit near -1; synthetic or
    // template-heavy corpora drift, which makes the slope a cheap
    // generation-leak detector. Shapes: one corpus-sized vocab agg →
    // bounded-heap top-1000 → regression over a 1000-row frame (the
    // single-partition window is bucket-bounded, the d63 discipline);
    // regr_* parity with DuckDB is already pinned by q68.
    q("d75_zipf_fit",
      s"""WITH f AS (SELECT w, count(*) AS c FROM (
         |  SELECT unnest($sqlTokens) AS w FROM documents) WHERE w <> '' GROUP BY w),
         |top AS (SELECT w, c FROM f ORDER BY c DESC, w LIMIT 1000),
         |r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rk FROM top)
         |SELECT round(regr_slope(ln(c), ln(rk)), 4) AS zipf_slope,
         |  round(regr_intercept(ln(c), ln(rk)), 4) AS zipf_intercept,
         |  round(regr_r2(ln(c), ln(rk)), 4) AS r2,
         |  CAST(count(*) AS INTEGER) AS n_points
         |FROM r""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val f = table(s, dir, "documents")
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .filter(col("w") =!= "")
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(1000) // TakeOrdered heap
      val r = f.withColumn("rk",
        row_number().over(Window.orderBy(col("c").desc, col("w"))))
      r.agg(
        Qf.dround(regr_slope(log(col("c")), log(col("rk"))), 4).as("zipf_slope"),
        Qf.dround(regr_intercept(log(col("c")), log(col("rk"))), 4).as("zipf_intercept"),
        Qf.dround(regr_r2(log(col("c")), log(col("rk"))), 4).as("r2"),
        count(lit(1)).cast("int").as("n_points"))
    },

    // ---------------------------------------------------------------- C4 line filter
    // the T5 paper's line-level cleaning rules: a line survives iff it
    // has ≥ 5 words AND ends in terminal punctuation — the single most
    // cited heuristic in web-corpus curation. The corpus is one-line,
    // so the fixture synthesizes multi-line pages: 8-token lines, each
    // line's terminal mark cycling none/./! by (doc_id + line) % 3 —
    // both engines build the page from the same token slices, and the
    // oracle re-applies the line rules in SQL.
    q("d74_c4_line_filter", {
      val w = 8
      s"""WITH tok AS (SELECT doc_id, $sqlTokens AS t FROM documents),
         |ln AS (SELECT doc_id, t,
         |  unnest(range(0, CAST(ceil(len(t) / $w.0) AS BIGINT))) AS p FROM tok),
         |lines AS (SELECT doc_id, CAST(p AS INTEGER) AS pos,
         |  array_to_string(t[(p*$w+1):least(p*$w+$w, len(t))], ' ')
         |    || ['', '.', '!'][CAST((doc_id + p) % 3 AS INTEGER) + 1] AS line
         |  FROM ln),
         |f AS (SELECT doc_id, pos, line,
         |  len(string_split(trim(line), ' ')) >= 5
         |    AND substr(trim(line), -1, 1) IN ('.', '!', '?', '"') AS keep
         |  FROM lines)
         |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_lines,
         |  CAST(count(*) FILTER (WHERE keep) AS INTEGER) AS n_kept,
         |  coalesce(string_agg(trim(line), chr(10) ORDER BY pos) FILTER (WHERE keep), '')
         |    AS kept
         |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin
    }) { (s, dir) =>
      val w = 8
      // same page construction, Spark side: 8-token slices + the cycling
      // terminal mark, joined with newlines (the fused fixture kernel —
      // byte-identical to the transform/slice lambda form, so the timed
      // path measures the OPERATOR, not interpreted fixture HOFs) —
      // then the OPERATOR under test re-splits and filters
      val page = graft.functions.LineFilterExpressions.synthC4Page(
        col("text"), col("doc_id"), w)
      table(s, dir, "documents")
        .select(col("doc_id"), TextOps.c4LineFilter(page, minWords = 5).as("__f"))
        .select(col("doc_id"),
          col("__f.n_lines").as("n_lines"),
          col("__f.n_kept").as("n_kept"),
          col("__f.kept").as("kept"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- mojibake repair
    // ftfy's core fix as a codegen kernel: undo UTF-8-bytes-read-as-
    // cp1252 mis-decodes ("café"→"cafÃ©", "’"→"â€™") — the most common
    // encoding corruption in web crawls, including doubly-pasted
    // layers. The fixture corrupts unicode snippets with the SAME
    // transform the wild applies (utf8 bytes, cp1252 decode), 0/1/2
    // layers by doc_id. Byte-level charset surgery is engine-specific
    // → rows-only; the OperatorsSpec gate pins exact recovery of both
    // layers, untouchability of clean/ASCII/non-cp1252 text, and a
    // 2000-case ScalaCheck round-trip property.
    //
    // Oracle (r16 graduation): byte-level charset surgery is engine-
    // specific, but the DECISION RELATION is exactly replayable — the
    // fixture corrupts KNOWN literals, so `repaired == original` is a
    // round-trip IDENTITY the oracle emits as its exact side:
    // `repaired_md5` is DuckDB's md5 of the ORIGINAL snippet (Spark's
    // is md5 of the actual repair output — equal iff the repair
    // recovered every byte), `was_corrupted` re-derives from the
    // doc_id corruption pattern (the ASCII snippet is a sloppy-cp1252
    // fixed point, so it never differs on the wire), and
    // `repaired_ok` is the all-rows verdict. Deterministic per doc_id
    // and snippet — not corpus-shape-dependent — so hashing it is
    // safe at every SF (the d49b rule).
    q("d73_mojibake_repair",
      """WITH base AS (SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INTEGER)
        |    WHEN 0 THEN 'café du marché'
        |    WHEN 1 THEN 'naïve — déjà vu'
        |    WHEN 2 THEN '日本語テキスト'
        |    WHEN 3 THEN 'Привет мир'
        |    ELSE 'plain ascii only' END AS orig
        |  FROM documents)
        |SELECT doc_id,
        |  (doc_id % 3 <> 0 AND doc_id % 5 <> 4) AS was_corrupted,
        |  TRUE AS repaired_ok,
        |  md5(orig) AS repaired_md5
        |FROM base ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val snippets = array(lit("café du marché"), lit("naïve — déjà vu"),
        lit("日本語テキスト"), lit("Привет мир"), lit("plain ascii only"))
      val corrupt = udf((t: String) => graft.functions.MojibakeUtil.sloppyDecode(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      val base = table(s, dir, "documents")
        .select(col("doc_id"),
          element_at(snippets, (col("doc_id") % 5 + 1).cast("int")).as("__orig"))
      base
        .select(col("doc_id"), col("__orig"),
          when(col("doc_id") % 3 === 0, col("__orig"))
            .when(col("doc_id") % 3 === 1, corrupt(col("__orig")))
            .otherwise(corrupt(corrupt(col("__orig")))).as("__wire"))
        .select(col("doc_id"),
          (col("__wire") =!= col("__orig")).as("was_corrupted"),
          (graft.functions.TokenizeExpressions.repairMojibake(col("__wire"))
            === col("__orig")).as("repaired_ok"),
          md5(graft.functions.TokenizeExpressions.repairMojibake(col("__wire")))
            .as("repaired_md5"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- host PageRank
    // the link-structure quality prior crawl pipelines mix into their
    // scores: fixed-iteration PageRank over the host graph (every node
    // has out-edges by fixture construction, so no dangling mass). The
    // oracle replays the SAME five synchronous rounds as chained CTEs —
    // fixed iteration counts are what make distributed PageRank
    // deterministic enough to hash-match cross-engine (per-node sums
    // only, no ordering decisions; 4dp rounding absorbs ulp drift).
    q("d72_host_pagerank", {
      val iters = 5
      val dmp = 0.85
      val base = (1 - dmp) / 20 // printed via shortest-roundtrip, parses to the same double
      val rounds = (1 to iters).map { i =>
        s"""r$i AS (SELECT n.node,
           |  $base + $dmp * coalesce(sum(p.r / dg.deg), 0) AS r
           |  FROM nodes n
           |  LEFT JOIN e ON e.dst = n.node
           |  LEFT JOIN dg ON dg.src = e.src
           |  LEFT JOIN r${i - 1} p ON p.node = e.src
           |  GROUP BY n.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH e AS (
         |  SELECT DISTINCT doc_id % 20 AS src, (doc_id * 7 + 3) % 20 AS dst
         |  FROM documents WHERE doc_id % 20 <> (doc_id * 7 + 3) % 20),
         |nodes AS (SELECT DISTINCT src AS node FROM e
         |          UNION SELECT DISTINCT dst FROM e),
         |dg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         |r0 AS (SELECT node, 1.0 / 20 AS r FROM nodes),
         |$rounds
         |SELECT CAST(node AS INTEGER) AS host, round(r, 4) AS pagerank
         |FROM r$iters ORDER BY host""".stripMargin
    }) { (s, dir) =>
      val e = table(s, dir, "documents").select(
        (col("doc_id") % 20).as("src"),
        ((col("doc_id") * 7 + 3) % 20).as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.operators.GraphOps.pageRank(e, "src", "dst", iters = 5, damping = 0.85)
        .select(col("node").cast("int").as("host"),
          Qf.dround(col("rank"), 4).as("pagerank"))
        .dumpSorted("host")
    },

    // ---------------------------------------------------------------- corpus card
    // the one-scan dataset datasheet: size, vocabulary-of-metadata,
    // exact-dup rate, language mix, mean quality — the header block of
    // a dataset card, computed in a SINGLE multi-aggregate pass (the
    // distinct aggregates expand inside one scan; nothing materializes
    // per-doc). Mean-of-doubles is summation-order dependent at the
    // ulp level, so the mean is rounded at 4dp where ~1e-12 partial-sum
    // drift cannot reach.
    q("d70_corpus_card",
      s"""SELECT
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(len($sqlTokens)) AS BIGINT) AS n_tokens,
         |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
         |  CAST(count(DISTINCT lang) AS INTEGER) AS n_langs,
         |  CAST(count(DISTINCT source) AS INTEGER) AS n_sources,
         |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts,
         |  round(count(*) FILTER (WHERE lang = 'en') / count(*), 4) AS en_frac,
         |  round(avg(0.5 * (1 - (len(list_filter($sqlTokens, t -> t IN ($stopList))) / len($sqlTokens)))
         |      + 0.5 * least(1.0, len($sqlTokens) / 100.0)), 4) AS mean_quality
         |FROM documents""".stripMargin) { (s, dir) =>
      table(s, dir, "documents").agg(
        count(lit(1)).as("n_docs"),
        sum(TextOps.tokenCount(col("text")).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"),
        countDistinct(col("lang")).cast("int").as("n_langs"),
        countDistinct(col("source")).cast("int").as("n_sources"),
        countDistinct(md5(col("text"))).as("n_unique_texts"),
        Qf.dround(sum(when(col("lang") === "en", 1).otherwise(0)) / count(lit(1)), 4)
          .as("en_frac"),
        Qf.dround(avg(TextOps.qualityScore(col("text"))), 4).as("mean_quality"))
    },

    // ---------------------------------------------------------------- image perceptual hash
    // near-dup keying for the IMAGE modality: 64-bit aHash over REAL
    // javax.imageio-decoded pixels (8×8 grayscale downscale, mean
    // threshold) — the content-level key that byte hashing (m01) can't
    // provide, grouping re-encodes/rescales of the same picture. The
    // fixture draws 8 distinct gradient images across the corpus (the
    // m03 generator pattern, structured content because perceptual
    // hashing is designed for it). Decode+scale is engine-specific →
    // rows-only; the AccuracySpec gate pins codec invariance, scale
    // invariance, and separation.
    q("m07_image_phash", null) { (s, dir) =>
      val gen = udf((m: Long) => MultimodalOps.syntheticGradientImageCached(
        m, 32, 24, if (m % 2 == 0) "png" else "jpg"))
      val imgs = table(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id") % 8).as("img"))
      val hashed = MultimodalOps.aHashPartitioned(imgs, "img")
      // same-hash grouping via partial-agg + join (the d17/d66 rationale)
      val counts = hashed.groupBy(col("ahash")).agg(count(lit(1)).as("n_copies"))
      hashed.join(counts, Seq("ahash"))
        .select(col("doc_id"), hex(col("ahash")).as("phash"), col("n_copies"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- image near-dup pairs
    // the image modality's pair query: m07's perceptual hash feeding
    // d96's COMPLETE Hamming join (64-bit aHash banded on its low 63
    // bits — still complete, see hammingPairs' doc). maxHamming = 8 is
    // m07's pinned codec/scale-invariance budget, so re-encodes of one
    // image always pair. 64 distinct gradients (not m07's 8) keep the
    // fixture's copy depth realistic — near-dup pair output is
    // quadratic in copies per image by SEMANTICS, and 8 images ×
    // thousands of copies measures that blowup, not the operator. No
    // SQL oracle (the oracle can't decode images) → rows-only + the
    // m10 gate: pairs ≡ brute force over real decoded aHashes.
    q("m10_image_neardup", null) { (s, dir) =>
      // format keyed by DOC (not image): every gradient circulates as
      // both PNG and JPEG, so cross-codec re-encodes of one picture —
      // the pairs the 8-bit budget exists for — are really in the data
      val gen = udf((m: Long, f: String) =>
        MultimodalOps.syntheticGradientImageCached(m, 32, 24, f))
      val imgs = table(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id") % 64,
          when(col("doc_id") % 2 === 0, "png").otherwise("jpg")).as("img"))
      graft.operators.DedupOps.hammingPairs(
        MultimodalOps.aHashPartitioned(imgs, "img"),
        "doc_id", "ahash", maxHamming = 8, bits = 63)
        .orderBy("d1", "d2")
    },

    // ---------------------------------------------------------------- audio content fingerprint
    // the audio modality's content-level key (m07's twin): 32-bit
    // spectral band-energy hash over REAL JDK-decoded PCM — frame FFT,
    // 32 log-spaced bands in 300-3000 Hz, threshold at the band mean
    // (Haitsma & Kalker 2002 lineage). The fixture circulates 16
    // distinct 3-tone contents, each rendered at BOTH 8 kHz and 16 kHz
    // and at two volumes — so the same-fingerprint grouping the query
    // reports exercises resample AND volume invariance in-band (tone
    // frequencies sit on exact FFT bins at both rates, making the
    // invariance exact by construction; the AccuracySpec gate pins it
    // plus distinct-content separation). Decode+FFT is engine-specific
    // → rows-only. Payload bytes never shuffle: the fingerprint seam
    // replaces the binary column inside its input partition.
    q("m11_audio_fingerprint", null) { (s, dir) =>
      val gen = udf((m: Long, sr: Int, vol: Double) =>
        MultimodalOps.syntheticToneWavCached(m, sr, 4096, vol))
      val wavs = table(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id") % 16,
          when(col("doc_id") % 2 === 0, 8000).otherwise(16000),
          when(col("doc_id") % 4 < 2, 1.0).otherwise(0.5)).as("wav"))
      val fps = MultimodalOps.audioFingerprintPartitioned(wavs, "wav")
      // same-fingerprint grouping via partial-agg + join (the m07/d17
      // rationale — never count-over-window on a duplicity-skewed key)
      val counts = fps.groupBy(col("afp")).agg(count(lit(1)).as("n_copies"))
      fps.join(counts, Seq("afp"))
        .select(col("doc_id"), hex(col("afp")).as("afp_hex"), col("n_copies"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- audio near-dup pairs
    // the audio modality's pair query (m10's twin, completing content
    // near-dup parity across all three modalities): m11's spectral
    // fingerprint feeding the COMPLETE banded Hamming join at a 4-bit
    // budget over 32 bits. The fixture circulates 64 base tone
    // contents plus a controlled NEAR variant of each (2 of 3 tones
    // shared ⇒ fingerprint Hamming exactly 2), so near-miss pairs are
    // really in the data, not only exact copies — near-dup pair output
    // is quadratic in copies per content BY SEMANTICS (the m10 note).
    // maxHamming = 2 IS the semantics here: one moved tone band (2 bit
    // flips); a 4-bit budget would admit every pair sharing a single
    // band of three — co-occurrence, not near-duplication. No SQL
    // oracle (the oracle can't decode audio) → rows-only + the m12
    // gate: pairs ≡ brute force over real fingerprints.
    q("m12_audio_neardup", null) { (s, dir) =>
      val gen = udf((m: Long, near: Boolean) =>
        if (near) MultimodalOps.syntheticToneWavNearCached(m, 8000, 4096, 1.0)
        else MultimodalOps.syntheticToneWavCached(m, 8000, 4096, 1.0))
      val wavs = table(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id") % 64,
          col("doc_id") % 128 >= 64).as("wav"))
      graft.operators.DedupOps.hammingPairs(
        MultimodalOps.audioFingerprintPartitioned(wavs, "wav"),
        "doc_id", "afp", maxHamming = 2, bits = 32)
        .orderBy("d1", "d2")
    },

    // ---------------------------------------------------------------- audio-fingerprint ledger
    // the audio modality's at-rest ingest form, completing per-modality
    // ledger parity (text d48/d97, video m08/m09, audio this): corpus
    // fingerprints at rest — admission decodes + FFTs each payload
    // once, later batches probe stored (id, afp) rows without
    // re-reading any corpus payload. The query runs the whole
    // maintenance cycle (create gen-1, append gen-2, crash-and-retry
    // replay of the append, compact, FORGET a slice) before probing
    // with the complete 2-bit bipartite Hamming join. Decode+FFT is
    // engine-specific → rows-only; the AccuracySpec gate pins
    // probe ≡ brute force over the surviving corpus's real
    // fingerprints, replay no-op, forget subtraction, and re-admission.
    q("m13_audio_fp_ledger", null) { (s, dir) =>
      val gen = udf((m: Long, near: Boolean) =>
        if (near) MultimodalOps.syntheticToneWavNearCached(m, 8000, 4096, 1.0)
        else MultimodalOps.syntheticToneWavCached(m, 8000, 4096, 1.0))
      val wavs = table(s, dir, "documents")
        .select(col("doc_id"), gen(col("doc_id") % 64,
          col("doc_id") % 128 >= 64).as("wav"))
      val path = Registry.scratchDir(
        s"/tmp/graft_conformance/m13_afp_${ProcessHandle.current.pid}_${dir.hashCode.toHexString}")
      val corpus = wavs.filter(col("doc_id") % 10 =!= 0)
      val gen2 = corpus.filter(col("doc_id") % 10 > 5)
      MultimodalOps.writeAudioFpLedger(
        corpus.filter((col("doc_id") % 10).between(1, 5)), "doc_id", "wav", path)
      MultimodalOps.appendToAudioFpLedger(gen2, "doc_id", "wav", path,
        batchId = Some("gen-2"))
      // replay: exactly-once marker no-op — skips the per-payload FFT
      // re-fingerprint (unmarked tolerance is the m13 AccuracySpec gate)
      MultimodalOps.appendToAudioFpLedger(gen2, "doc_id", "wav", path,
        batchId = Some("gen-2"))
      MultimodalOps.compactAudioFpLedger(s, path, targetFiles = 4)
      MultimodalOps.removeFromAudioFpLedger(
        corpus.filter(col("doc_id") % 3 === 1).select(col("doc_id")),
        "doc_id", path)
      MultimodalOps.audioNearDupAgainstLedger(
        wavs.filter(col("doc_id") % 10 === 0), "doc_id", "wav", path,
        maxHamming = 2)
        .orderBy("new_id", "corpus_id")
    },

    // ---------------------------------------------------------------- n-gram novelty
    // the memorization-risk / content-originality metric: what fraction
    // of a document's 3-gram occurrences appear in NO other document
    // (gram-level novelty — the complement of d60's span-duplication
    // ratio, which only sees verbatim runs ≥ k). Grams flow as the
    // fused 32-bit md5 kernel's hashes (d24's regime — shuffles carry
    // 8-byte hashes, never text); the doc-frequency table is
    // corpus-vocab-sized and the join-back is the d30/d64 2-scan shape.
    q("d69_ngram_novelty",
      s"""WITH tok AS (SELECT doc_id, $sqlTokens AS t FROM documents),
         |g AS (SELECT doc_id, ${sqlHash("g0", "")} AS h FROM (
         |  SELECT doc_id, unnest(${sqlNgrams("t", 3)}) AS g0 FROM tok)),
         |df AS (SELECT h, count(DISTINCT doc_id) AS d FROM g GROUP BY h),
         |per AS (SELECT g.doc_id, count(*) AS n_grams,
         |  count(*) FILTER (WHERE df.d = 1) AS n_novel
         |  FROM g JOIN df USING (h) GROUP BY g.doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(p.n_grams, 0) AS INTEGER) AS n_grams,
         |  CAST(coalesce(p.n_novel, 0) AS INTEGER) AS n_novel,
         |  CASE WHEN coalesce(p.n_grams, 0) = 0 THEN 0.0
         |       ELSE round(p.n_novel / p.n_grams, 4) END AS novelty
         |FROM documents d LEFT JOIN per p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docs = table(s, dir, "documents")
      val g = docs.select(col("doc_id"),
        explode(graft.functions.NgramExpressions.wordGramMd5s(col("text"), 3)).as("h"))
      val df = g.distinct().groupBy(col("h")).agg(count(lit(1)).as("__d"))
      val per = g.join(df, Seq("h"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("__d") === 1, 1L).otherwise(0L)).as("n_novel"))
      docs.select(col("doc_id")).join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).cast("int").as("n_grams"),
          coalesce(col("n_novel"), lit(0L)).cast("int").as("n_novel"),
          when(coalesce(col("n_grams"), lit(0L)) === 0, lit(0.0))
            .otherwise(Qf.dround(col("n_novel") / col("n_grams"), 4)).as("novelty"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- BPE tokenizer apply
    // the encode side of d85's learned merges (Sennrich 2016 apply:
    // per token, repeatedly merge the present adjacent pair with the
    // LOWEST rank — the priority loop, which diverges from naive
    // in-list-order application when a later merge manufactures a
    // symbol an earlier merge's pair names; the unit test pins that
    // divergence case). This query is self-contained train-then-apply:
    // 8 merges learned from the corpus (bounded 8-row collect), then
    // the codegen kernel encodes every document with the merge table
    // as a reference object. The oracle replays BOTH halves in DuckDB
    // ([[bpeEncodeOracle]]: d85's chained-CTE learn × 8 rounds + the
    // priority-loop apply as a recursive CTE) → full hash-match; the
    // AccuracySpec d86 gate additionally pins lossless per-token
    // reconstruction and piece-closure membership corpus-wide.
    q("d86_bpe_encode", bpeEncodeOracle) { (s, dir) =>
      val docs = table(s, dir, "documents")
      // the shared 8-merge learn (cachedBpeMerges) — bounded: ≤ 8 rows
      val merges = cachedBpeMerges(s, dir).map(t => (t._2, t._3))
      val p = graft.functions.TokenizeExpressions.bpeEncode(col("text"), merges)
      docs.select(col("doc_id"), p.as("__p"))
        .select(col("doc_id"),
          size(col("__p")).as("n_tokens"),
          size(flatten(col("__p"))).as("n_pieces"),
          // flattened fingerprint is faithful: pieces never cross
          // tokens, so piece order + content determine the encoding
          md5(concat_ws(" ", flatten(col("__p")))).as("pieces_fp"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- unigram-LM tokenizer apply
    // the THIRD major subword family (Kudo 2018's SentencePiece
    // unigram model — T5/LLaMA-lineage tokenizers), closing the set
    // next to BPE (d86) and WordPiece (d68): encoding is exact Viterbi
    // over a (piece, logprob) vocabulary — the max-likelihood
    // segmentation, not greedy matching. Self-contained
    // train-then-apply like d86: the vocabulary is the corpus's top-80
    // words plus its full single-character set with ML log-probs (ONE
    // bounded model-sized collect), then the codegen kernel encodes
    // every document with the vocab riding as a reference object.
    // Log-probs are rounded at 4dp via the droundD IEEE expression
    // (the d34/s20 parity discipline) so the oracle's recursive-CTE
    // Viterbi ([[unigramEncodeOracle]]) sums bit-identical doubles →
    // full hash-match; the AccuracySpec gate additionally pins
    // lossless reconstruction + closed vocabulary corpus-wide, and
    // the unit spec pins Viterbi ≡ brute-force enumeration.
    q("d105_unigram_encode", unigramEncodeOracle) { (s, dir) =>
      val docs = table(s, dir, "documents")
      // ONE corpus-scale pass: tokenize + count words. Everything else
      // (total mass, top-80 words, char vocabulary) derives from this
      // vocab-sized frame — the char counts come from exploding the
      // DISTINCT words weighted by n, never from re-walking the corpus.
      val wc = docs
        .select(explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .persist()
      // total mass, top-80 words and the char vocabulary in ONE driver
      // job: a three-leg union over the persisted vocab-sized table,
      // one model-sized collect (the r15 4-sequential-jobs shape paid
      // a driver-barrier latency per job — under host contention that
      // multiplied into the bench tail). The legs share wc's shuffle:
      // a concurrent first materialization re-reduces cached
      // partitions at worst; the corpus map pass runs once.
      val legT = wc.agg(sum(col("n")).as("n"))
        .select(lit("T").as("k"), lit("").as("p"), col("n"))
      val legW = wc.orderBy(col("n").desc, col("w")).limit(80)
        .select(lit("W").as("k"), col("w").as("p"), col("n"))
      val legC = wc
        .select(explode(split(col("w"), "")).as("c"), col("n"))
        .filter(length(col("c")) === 1)
        .groupBy(col("c")).agg(sum(col("n")).as("n"))
        .select(lit("C").as("k"), col("c").as("p"), col("n"))
      val model = legT.unionAll(legW).unionAll(legC).collect()
      wc.unpersist()
      val totW = model.find(_.getString(0) == "T").get.getLong(2).toDouble
      val topWords = model.filter(_.getString(0) == "W")
        .map(r => (r.getString(1), Qf.droundD(math.log(r.getLong(2) / totW), 4)))
      val chars = model.filter(_.getString(0) == "C")
        .map(r => (r.getString(1), r.getLong(2)))
      require(chars.length <= 512,
        s"d105 vocab: ${chars.length} distinct characters — the char " +
          "fallback set must stay model-sized; use a byte-level vocab " +
          "for arbitrary-charset corpora")
      val totC = chars.map(_._2).sum.toDouble
      val pieces = (topWords ++ chars.map { case (c, n) =>
        (c, Qf.droundD(math.log(n / totC), 4)) })
        .groupBy(_._1).map { case (p, vs) => (p, vs.map(_._2).max) }.toSeq
        .sortBy(_._1)
      val enc = graft.functions.TokenizeExpressions.unigramEncode(
        col("text"), pieces)
      docs.select(col("doc_id"), enc.as("__p"))
        .select(col("doc_id"),
          size(col("__p")).as("n_tokens"),
          size(flatten(col("__p"))).as("n_pieces"),
          // faithful fingerprint: pieces never cross tokens (the d86
          // rationale), so order + content pin the encoding
          md5(concat_ws(" ", flatten(col("__p")))).as("pieces_fp"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- unigram-LM vocabulary LEARNING (EM)
    // the training half of d105 — the learn/apply pairing BPE has with
    // d85/d86, completing tokenizer-training coverage for all three
    // subword families: seed (chars + frequent substrings), exact
    // forward-backward EM over the word-count table (expected counts
    // over ALL segmentations, corpus never re-read after the one
    // vocab-collapsing pass), probability pruning, then the Viterbi
    // apply kernel encodes the corpus with the LEARNED vocabulary.
    // EM here runs the 4dp-rounded oracle-parity mode
    // (roundDecimals = Some(4)): each round's expected counts and
    // log-probs round via the droundD IEEE expression on both sides,
    // so [[unigramLearnOracle]]'s chained-CTE replay (brute-force
    // segmentation enumeration per round + the same M-step) produces
    // bit-identical vocabularies → full hash-match. The AccuracySpec
    // gate keeps pinning the EXACT trainer (monotone corpus LL,
    // lossless reconstruction, closure), and the unit spec pins
    // forward-backward ≡ brute-force enumeration.
    q("d106_unigram_learn", unigramLearnOracle) { (s, dir) =>
      import graft.operators.CurationOps
      val docs = table(s, dir, "documents")
      val (pieces, _) = CurationOps.learnUnigramVocab(docs, "text",
        seedMaxLen = 4, seedSize = 200, emRounds = 3, finalSize = 160,
        roundDecimals = Some(4))
      val enc = graft.functions.TokenizeExpressions.unigramEncode(
        col("text"), pieces)
      docs.select(col("doc_id"), enc.as("__p"))
        .select(col("doc_id"),
          size(col("__p")).as("n_tokens"),
          size(flatten(col("__p"))).as("n_pieces"),
          md5(concat_ws(" ", flatten(col("__p")))).as("pieces_fp"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------- WordPiece tokenizer apply
    // the encode side of subword tokenization (d61 counts the training
    // statistics; this runs a finished vocabulary over the corpus):
    // BERT's greedy longest-match-first WordPiece as ONE codegen'd
    // Catalyst expression, the vocabulary riding as a model-sized
    // reference object. The oracle re-derives the segmentation in
    // DuckDB as a recursive CTE over the SAME vocab literal
    // ([[wordPieceOracle]]) → full hash-match; the AccuracySpec gate
    // additionally pins the reconstruction invariant (strip ##,
    // concat == the input sans spaces) and closed-vocabulary
    // membership corpus-wide, and unit tests pin the greedy/UNK
    // semantics exactly.
    q("d68_wordpiece", wordPieceOracle) { (s, dir) =>
      val p = graft.functions.TokenizeExpressions.wordPieceEncode(
        col("text"), wordPieceVocab)
      table(s, dir, "documents")
        .select(col("doc_id"), p.as("__p"))
        .select(col("doc_id"),
          size(col("__p")).as("n_pieces"),
          // array_remove, not a filter() lambda: HOFs evaluate
          // interpreted and break the projection's codegen (§7.3)
          (size(col("__p")) - size(array_remove(col("__p"), "[UNK]")))
            .as("n_unk"),
          md5(concat_ws(" ", col("__p"))).as("pieces_fp"))
        .orderBy("doc_id")
    }
  )
}
