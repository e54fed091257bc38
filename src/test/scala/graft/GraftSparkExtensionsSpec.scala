package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.net.FakeRedisServer

/** Config-only deployment path: a session built with the extension gets
  * the SQL surface with zero registration calls in user code.
  */
class GraftSparkExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val server = new FakeRedisServer()
  private var port: Int = _

  override def beforeAll(): Unit = {
    (1 to 5).foreach(i => server.put(s"ext:$i", s"v$i"))
    server.putHash("exthash:1", Map("f" -> "1"))
    port = server.start()
  }

  override def afterAll(): Unit = server.stop()

  private def extendedSession(): SparkSession = {
    // force a NEW session over the (possibly shared) context so the
    // extension applies — getOrCreate would return a previous spec's
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftSparkExtensions()(_))
      .getOrCreate()
  }

  test("extension injects scalar kernels and Redis TVFs into a fresh session") {
    val spark = extendedSession()
    spark.conf.set(functions.RedduckFunctions.HostConf, "127.0.0.1")
    spark.conf.set(functions.RedduckFunctions.PortConf, port.toString)

    // scalar kernels available in plain SQL, no registration call
    val dot = spark.sql(
      "SELECT dot_f(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val h = spark.sql("SELECT md5_hash32('abc') AS h").head().getLong(0)
    val expected = spark.sql(
      "SELECT CAST(conv(substring(md5('abc'), 1, 8), 16, 10) AS BIGINT) AS h").head().getLong(0)
    assert(h == expected)

    // text kernels available in plain SQL
    val rep = spark.sql(
      "SELECT repetition_stats('a b a b').n_tokens AS nt, repetition_stats('a b a b').top_bigram_n AS tb")
      .head()
    assert(rep.getInt(0) == 4 && rep.getLong(1) == 2L) // "a b" twice of [a b, b a, a b]
    val grams = spark.sql("SELECT word_gram_md5s('x y z', 2) AS g").head().getSeq[Long](0)
    val gramsExpected = spark.sql(
      "SELECT array(md5_hash32('x y'), md5_hash32('y z')) AS g").head().getSeq[Long](0)
    assert(grams == gramsExpected)
    assert(spark.sql("SELECT normalize_text('  A   b ') AS t").head().getString(0) == "a b")
    assert(spark.sql("SELECT text_stats('the cat') AS s").head()
      .getStruct(0).getAs[Int]("n_stop") == 1)
    assert(spark.sql("SELECT size(shingle_hash32s('abcdef', 5, 100)) AS n").head().getInt(0) == 2)

    // table-valued sources parse as-is
    assert(spark.sql("SELECT count(*) FROM redis_scan('ext:*')").head().getLong(0) == 5L)
    assert(spark.sql("SELECT value FROM redis_kv('ext:*') WHERE key = 'ext:3'")
      .head().getString(0) == "v3")
    assert(spark.sql("SELECT fields['f'] FROM redis_hash('exthash:*')")
      .head().getString(0) == "1")

    // composed text kernels: the SQL names build the SAME trees as the
    // Scala API (round-tripped through the Column shims)
    assert(spark.sql("SELECT strip_html('<p>a <b>b</b></p>') AS t")
      .head().getString(0) == "a b")
    assert(spark.sql("SELECT anchor_text_chars('<a href=\"/x\">abc</a><p>zz</p>') AS n")
      .head().getInt(0) == 3)
    assert(spark.sql("SELECT canonical_url('HTTPS://Ex.COM:443/p?utm_source=1') AS u")
      .head().getString(0) == "https://ex.com/p")
    assert(spark.sql("SELECT url_host('https://A.B.c/q') AS h")
      .head().getString(0) == "a.b.c")
    val q = spark.sql("SELECT round(quality_score('the cat sat'), 4) AS q").head().getDouble(0)
    val qApi = spark.range(1)
      .select(graft.queries.Qf.dround(
        graft.operators.TextOps.qualityScore(org.apache.spark.sql.functions.lit("the cat sat")), 4))
      .head().getDouble(0)
    assert(q == qApi)
    assert(spark.sql("SELECT scrub_pii('mail a@ex.com at 1.2.3.4 or +1 555-1234') AS s")
      .head().getString(0) == "mail <EMAIL> at <IP> or <PHONE>")
    val pc = spark.sql("SELECT pii_counts('a@ex.com 1.2.3.4') AS p").head().getStruct(0)
    assert(pc.getAs[Int]("n_email") == 1 && pc.getAs[Int]("n_ip") == 1 &&
      pc.getAs[Int]("n_phone") == 0)
    assert(spark.sql("SELECT wordpiece_encode('table', ARRAY('table', 'tab', '##le')) AS p")
      .head().getSeq[String](0) == Seq("table"))
    val e = intercept[Exception](
      spark.sql("SELECT wordpiece_encode('x', 'notanarray')").collect())
    assert(e.getMessage.contains("ARRAY of strings"), e.getMessage)
    assert(spark.sql("SELECT bpe_encode('abc bd', ARRAY('ab c', 'a b')) AS p")
      .head().getSeq[scala.collection.Seq[String]](0).map(_.toSeq) ==
      Seq(Seq("abc"), Seq("b", "d"))) // the priority-loop divergence case via SQL
    val eb = intercept[Exception](
      spark.sql("SELECT bpe_encode('x', ARRAY('nospace'))").collect())
    assert(eb.getMessage.contains("one space"), eb.getMessage)

    // round-10 kernels
    val c4 = spark.sql(
      "SELECT c4_line_filter('one two three four five.\nshort') AS f").head().getStruct(0)
    assert(c4.getAs[Int]("n_lines") == 2 && c4.getAs[Int]("n_kept") == 1 &&
      c4.getAs[String]("kept") == "one two three four five.")
    assert(spark.sql("SELECT c4_line_filter('a b.', 2) AS f").head()
      .getStruct(0).getAs[Int]("n_kept") == 1) // explicit minWords
    assert(spark.sql("SELECT contains_any_word('the class is full', ARRAY('bad', 'ass')) AS h")
      .head().getBoolean(0) == false) // token-exact: no Scunthorpe hit
    assert(spark.sql("SELECT contains_any_word('bad word', ARRAY('bad')) AS h")
      .head().getBoolean(0))
    val fm = spark.sql(
      "SELECT frame_md5s(CAST('aaaaaaaabbbbbbbbaaaaaaaacccccccc' AS BINARY), 8, 2) AS f")
      .head().getSeq[String](0)
    // sampled frames at offsets 0 and 16 are both 'aaaaaaaa' → distinct set of 1
    assert(fm == Seq(spark.sql("SELECT md5('aaaaaaaa')").head().getString(0)))
    val fm2 = spark.sql(
      "SELECT frame_md5s(CAST('aaaaaaaabbbbbbbbccccccccdddddddd' AS BINARY), 8, 2) AS f")
      .head().getSeq[String](0)
    assert(fm2 == fm2.sorted && fm2.size == 2) // frames 'aaaaaaaa' + 'cccccccc'
    val scr = spark.sql(
      "SELECT scrub_spans('a b c d e', merge_spans(array(1, 2), 2)) AS s").head().getStruct(0)
    assert(scr.getAs[String]("clean_text") == "a e" && scr.getAs[Long]("n_removed") == 3L)

    // simhash60: the SQL name builds the same fused kernel
    val sh = spark.sql("SELECT simhash60('a b a b c') AS h").head().getLong(0)
    val shApi = spark.range(1).toDF("x").withColumn("t",
        org.apache.spark.sql.functions.lit("a b a b c"))
      .transform(d => graft.operators.DedupOps.simHash60Df(d, "x", "t"))
      .head().getLong(1)
    assert(sh == shApi && sh >= 0 && sh < (1L << 60))

    // card rule: SQL surface matches the kernel (Luhn conditional incl.)
    val cc = spark.sql(
      "SELECT card_counts('pay 4539 1488 0343 6467 not 1234 5678 9012 3456') AS c")
      .head().getStruct(0)
    assert(cc.getAs[Int]("n_cards") == 1 && cc.getAs[Int]("n_card_digits") == 16)
    assert(spark.sql("SELECT scrub_cards('x 6011-0009-9013-9424 y') AS s")
      .head().getString(0) == "x <CARD> y")
    // the 2-arg form honors a custom token; a wrong arity fails loudly
    // instead of silently scrubbing with the default
    assert(spark.sql("SELECT scrub_cards('x 6011-0009-9013-9424 y', '[PAN]') AS s")
      .head().getString(0) == "x [PAN] y")
    val arityErr = intercept[Exception](
      spark.sql("SELECT scrub_cards('a', '<X>', 'extra') AS s").collect())
    assert(arityErr.getMessage.contains("scrub_cards"), arityErr.getMessage)
    // adjacent cards one separator apart (an over-long run) still redact
    assert(spark.sql("SELECT scrub_cards('4111111111111111 4012888888881881') AS s")
      .head().getString(0) == "<CARD> <CARD>")

    // audio_fingerprint: the SQL name runs the same decode+FFT kernel
    val wavLit = graft.operators.MultimodalOps.syntheticToneWav(2L, 8000, 2048)
    val afpSql = spark.range(1).toDF("x")
      .withColumn("b", org.apache.spark.sql.functions.lit(wavLit))
      .createOrReplaceTempView("__afp_t")
    val afp = spark.sql("SELECT audio_fingerprint(b) AS f FROM __afp_t").head().getLong(0)
    assert(afp == graft.operators.MultimodalOps.audioFingerprint32(wavLit) && afp != 0L)

    // unigram_encode: the SQL name builds the same Viterbi kernel; a
    // malformed vocab entry fails loudly
    val ue = spark.sql(
      "SELECT unigram_encode('abc zq', ARRAY('-1.0 a', '-1.5 bc', '-3.5 ab', '-2.0 c')) AS p")
      .head().getSeq[scala.collection.Seq[String]](0)
    assert(ue == Seq(Seq("a", "bc"), Seq("z", "q")), ue.toString)
    val ueErr = intercept[Exception](
      spark.sql("SELECT unigram_encode('a', ARRAY('nodouble piece')) AS p").collect())
    assert(ueErr.getMessage.contains("not a double"), ueErr.getMessage)

    // deflated_size: the SQL name builds the same kernel as the Column API
    val ds = spark.sql("SELECT deflated_size('click here to win now ' || repeat('click here to win now ', 59)) AS n")
      .head().getLong(0)
    val dsApi = spark.range(1)
      .select(graft.functions.CompressionExpression.deflatedSize(
        org.apache.spark.sql.functions.lit("click here to win now " * 60)))
      .head().getLong(0)
    assert(ds == dsApi && ds > 0 && ds < 22 * 60 / 10,
      s"template text should crush: $ds") // ratio well under 0.1
  }

  test("frame_dedup table function builds the m06 pair plan over an at-rest corpus") {
    val spark = extendedSession()
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fd-tvf").toString + "/corpus"
    Seq((1L, "aaaaaaaabbbbbbbbccccccccdddddddd"),
      (2L, "aaaaaaaabbbbbbbbccccccccdddddddd"),
      (3L, "qqqqqqqqrrrrrrrrsssssssstttttttt"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("bin"))
      .write.parquet(dir)
    val got = spark.sql(
      s"SELECT * FROM frame_dedup('$dir', 'doc_id', 'bin', 8, 2, 0.5) ORDER BY a_id, b_id")
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(got == Seq((1L, 2L, 2, 1.0)))
  }

  test("optimizer rule rewrites the naive levenshtein join: no cartesian, identical rows") {
    val spark = extendedSession()
    import spark.implicits._
    val names = Seq("cold bolt", "old bolt", "cold gear", "blue rod", "red rod",
      "old bolt", null, "widget", "widgets", "wídget",
      // short strings (len <= k): pigeonhole blocking alone would drop
      // e.g. "ab"↔"cd" (lev=2, no shared substring) — the length-blocked
      // short path must route them
      "ab", "cd", "", "x")
    names.toDF("n").createOrReplaceTempView("lhs")
    names.reverse.toDF("m").createOrReplaceTempView("rhs")
    val q =
      """SELECT n, m FROM lhs JOIN rhs ON levenshtein(n, m) <= 2 AND n <> m"""
    val df = spark.sql(q)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("Cartesian") && !phys.contains("BroadcastNestedLoop"),
      s"naive nested-loop survived the rewrite:\n$phys")
    val rewritten = df.collect().map(r => (r.getString(0), r.getString(1))).sorted
    // ground truth from a plain session WITHOUT the rule (duplicates and
    // all: the rewrite must preserve multiplicity exactly)
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val plain = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    val naive = {
      val l = plain.createDataFrame(names.map(Tuple1(_))).toDF("n")
      val r = plain.createDataFrame(names.reverse.map(Tuple1(_))).toDF("m")
      l.createOrReplaceTempView("lhs2"); r.createOrReplaceTempView("rhs2")
      plain.sql("SELECT n, m FROM lhs2 JOIN rhs2 ON levenshtein(n, m) <= 2 AND n <> m")
        .collect().map(x => (x.getString(0), x.getString(1))).sorted
    }
    assert(rewritten.toSeq == naive.toSeq)
  }

  test("levenshtein rewrite matches <, reversed >=, and swapped-side forms") {
    val spark = extendedSession()
    import spark.implicits._
    Seq("cold bolt", "old bolt", "blue rod", "red rod", "widget")
      .toDF("n").createOrReplaceTempView("fz")
    def rows(q: String): Seq[(String, String)] = {
      val df = spark.sql(q)
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("Cartesian") && !phys.contains("BroadcastNestedLoop"),
        s"not rewritten: $q\n$phys")
      df.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    }
    val base = rows(
      "SELECT a.n, b.n FROM fz a JOIN fz b ON levenshtein(a.n, b.n) <= 2")
    // strict < with k+1 bound ≡ ≤ k; literal-first comparison; swapped
    // sides (levenshtein args from right table first)
    assert(rows("SELECT a.n, b.n FROM fz a JOIN fz b ON levenshtein(a.n, b.n) < 3") == base)
    assert(rows("SELECT a.n, b.n FROM fz a JOIN fz b ON 2 >= levenshtein(a.n, b.n)") == base)
    assert(rows("SELECT a.n, b.n FROM fz a JOIN fz b ON levenshtein(b.n, a.n) <= 2") == base)
    // literal-first strict form: 3 > lev ≡ lev <= 2
    assert(rows("SELECT a.n, b.n FROM fz a JOIN fz b ON 3 > levenshtein(a.n, b.n)") == base)
    // EQUALITY form (the typo join): lev = 1 blocks at k=1, the equality
    // survives as a residual filter — strictly tighter than base
    val eq1 = rows("SELECT a.n, b.n FROM fz a JOIN fz b ON levenshtein(a.n, b.n) = 1")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vals = Seq("cold bolt", "old bolt", "blue rod", "red rod", "widget")
    val naiveEq1 = (for (x <- vals; y <- vals if lev(x, y) == 1) yield (x, y)).sorted
    assert(eq1 == naiveEq1 && eq1.nonEmpty)
    assert(rows("SELECT a.n, b.n FROM fz a JOIN fz b ON 1 = levenshtein(a.n, b.n)") == eq1)
    // bound AND equality on the same call: the bound drives, the
    // equality stays residual — still no nested loop
    assert(rows(
      "SELECT a.n, b.n FROM fz a JOIN fz b ON levenshtein(a.n, b.n) <= 2 AND levenshtein(a.n, b.n) = 1") == eq1)
  }

  test("levenshtein rewrite still fires when user columns start with __ (guard is by exact internal name)") {
    val spark = extendedSession()
    import spark.implicits._
    Seq(("cold bolt", "m1"), ("old bolt", "m2"), ("widget", "m3"))
      .toDF("n", "__meta").createOrReplaceTempView("fzm")
    val df = spark.sql(
      "SELECT a.n, b.n, a.__meta FROM fzm a JOIN fzm b ON levenshtein(a.n, b.n) <= 2")
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("Cartesian") && !phys.contains("BroadcastNestedLoop"),
      s"a user __-prefixed column disabled the rewrite:\n$phys")
    assert(df.count() > 0)
  }

  test("levenshtein rewrite matches the thresholded 3-arg form (Spark >= 3.5 bounded levenshtein)") {
    val spark = extendedSession()
    import spark.implicits._
    Seq("cold bolt", "old bolt", "blue rod", "red rod", "widget", "ab", "cd")
      .toDF("n").createOrReplaceTempView("fz3")
    def rows(q: String): Seq[(String, String)] = {
      val df = spark.sql(q)
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("Cartesian") && !phys.contains("BroadcastNestedLoop"),
        s"not rewritten: $q\n$phys")
      df.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    }
    val base = rows(
      "SELECT a.n, b.n FROM fz3 a JOIN fz3 b ON levenshtein(a.n, b.n) <= 2")
    // lev3(a,b,t) returns the distance when <= t, else -1; the pure
    // distance-bound comparisons are >= 0, > -1, and <> -1
    assert(rows("SELECT a.n, b.n FROM fz3 a JOIN fz3 b ON levenshtein(a.n, b.n, 2) >= 0") == base)
    assert(rows("SELECT a.n, b.n FROM fz3 a JOIN fz3 b ON levenshtein(a.n, b.n, 2) > -1") == base)
    assert(rows("SELECT a.n, b.n FROM fz3 a JOIN fz3 b ON levenshtein(a.n, b.n, 2) <> -1") == base)
    // literal-first mirrors of the same tests
    assert(rows("SELECT a.n, b.n FROM fz3 a JOIN fz3 b ON 0 <= levenshtein(a.n, b.n, 2)") == base)
    assert(rows("SELECT a.n, b.n FROM fz3 a JOIN fz3 b ON -1 < levenshtein(a.n, b.n, 2)") == base)
    // the BETWEEN-style compound: >= 0 drives the rewrite, <= 1 stays a
    // residual filter — a strictly tighter result than base
    val tight = rows(
      "SELECT a.n, b.n FROM fz3 a JOIN fz3 b ON levenshtein(a.n, b.n, 2) >= 0 AND levenshtein(a.n, b.n, 2) <= 1")
    val naive1 = rows("SELECT a.n, b.n FROM fz3 a JOIN fz3 b ON levenshtein(a.n, b.n) <= 1")
    assert(tight == naive1)
  }

  /** Same query on a session WITHOUT the extension — the built-in
    * buffering aggregates — as ground truth for the percentile rewrite.
    */
  private def plainSession(): SparkSession = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq).sortBy(_.mkString("|"))

  test("percentile rewrite: the built-in percentile family routes onto the window plan, bit-identical") {
    val spark = extendedSession()
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("li")
    val q =
      """SELECT l_returnflag,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS p25,
        |  percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50c,
        |  percentile(l_extendedprice, 0.9) AS p90,
        |  median(l_quantity) AS med,
        |  percentile(l_quantity, 0.5) + 1.0 AS shifted
        |FROM li GROUP BY l_returnflag""".stripMargin
    val df = spark.sql(q)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("percentile") && !phys.contains("ObjectHashAggregate"),
      s"built-in buffering aggregate survived the rewrite:\n$phys")
    val rewritten = rowsOf(df)
    // global aggregate (no GROUP BY) and empty input: built-in emits one
    // all-NULL row globally, zero rows grouped — the rewrite must too
    val globalQ = "SELECT percentile(l_quantity, 0.5) AS m FROM li"
    val emptyGlobalQ = "SELECT percentile(l_quantity, 0.5) AS m FROM li WHERE l_quantity < -1"
    val emptyGroupQ =
      "SELECT l_returnflag, median(l_quantity) AS m FROM li WHERE l_quantity < -1 GROUP BY l_returnflag"
    val (g1, e1, ge1) = (rowsOf(spark.sql(globalQ)), rowsOf(spark.sql(emptyGlobalQ)),
      rowsOf(spark.sql(emptyGroupQ)))
    assert(!spark.sql(globalQ).queryExecution.executedPlan.toString.contains("percentile"))

    val plain = plainSession()
    plain.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("li")
    assert(rewritten == rowsOf(plain.sql(q)))
    assert(g1 == rowsOf(plain.sql(globalQ)))
    assert(e1 == rowsOf(plain.sql(emptyGlobalQ)) && e1.size == 1 && e1.head == Seq(null))
    assert(ge1 == rowsOf(plain.sql(emptyGroupQ)) && ge1.isEmpty)
  }

  test("percentile rewrite: NULL group keys and all-NULL groups match the built-in") {
    val spark = extendedSession()
    import spark.implicits._
    val rows = Seq(
      (Option("a"), Option(1.0)), (Option("a"), Option(2.0)), (Option("a"), Option(5.0)),
      (Option.empty[String], Option(10.0)), (Option.empty[String], Option(20.0)),
      (Option("z"), Option.empty[Double]), (Option("z"), Option.empty[Double]))
    rows.toDF("g", "v").createOrReplaceTempView("pnull")
    val q =
      """SELECT g, percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS d5,
        |       percentile(v, 0.5) AS c5
        |FROM pnull GROUP BY g""".stripMargin
    val df = spark.sql(q)
    assert(!df.queryExecution.executedPlan.toString.contains("percentile"))
    val got = rowsOf(df)
    val plain = plainSession()
    plain.createDataFrame(rows).toDF("g", "v").createOrReplaceTempView("pnull")
    assert(got == rowsOf(plain.sql(q)))
    assert(got.size == 3) // a, NULL, and the all-NULL z all present
  }

  test("percentile rewrite: disc over int/long children matches the built-in's DOUBLE typing and values") {
    // pins the typing premise the rewrite relies on: in this Spark
    // version the built-in percentile_disc returns DOUBLE for every
    // numeric child (NOT the child's type), so the histogram plan's
    // double output needs no cast back. If a Spark upgrade ever changes
    // PercentileDisc.dataType, this fails loudly instead of the rewrite
    // silently re-typing user schemas.
    val spark = extendedSession()
    import spark.implicits._
    val rows = Seq(("a", 1, 1L), ("a", 2, 2L), ("a", 3, 3L), ("b", 7, 7L))
    rows.toDF("g", "vi", "vl").createOrReplaceTempView("ptyp")
    val q =
      """SELECT g, percentile_disc(0.5) WITHIN GROUP (ORDER BY vi) AS di,
        |       percentile_disc(0.5) WITHIN GROUP (ORDER BY vl) AS dl
        |FROM ptyp GROUP BY g""".stripMargin
    val df = spark.sql(q)
    assert(!df.queryExecution.executedPlan.toString.contains("percentile"))
    val got = rowsOf(df)
    val plain = plainSession()
    plain.createDataFrame(rows).toDF("g", "vi", "vl").createOrReplaceTempView("ptyp")
    val pdf = plain.sql(q)
    assert(pdf.schema("di").dataType == org.apache.spark.sql.types.DoubleType &&
      pdf.schema("dl").dataType == org.apache.spark.sql.types.DoubleType,
      s"built-in percentile_disc no longer returns DOUBLE: ${pdf.schema} — " +
        "the rewrite must now cast its result back to the child type")
    assert(df.schema == pdf.schema)
    assert(got == rowsOf(pdf))
  }

  test("percentile rewrite: whole-partition window percentiles route onto the join-back plan") {
    val spark = extendedSession()
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("liw")
    val q =
      """SELECT l_orderkey, l_linenumber,
        |  percentile(l_extendedprice, 0.5) OVER (PARTITION BY l_returnflag) AS p50,
        |  percentile_disc(0.9) WITHIN GROUP (ORDER BY l_extendedprice)
        |    OVER (PARTITION BY l_returnflag) AS p90d,
        |  median(l_quantity) OVER (PARTITION BY l_returnflag) AS med,
        |  median(l_quantity) OVER () AS gmed
        |FROM liw""".stripMargin
    val df = spark.sql(q)
    val phys = df.queryExecution.executedPlan.toString
    // the substituted plan legitimately contains WINDOW operators — the
    // bucket-table cumulative sums and the candidates-only row_number,
    // all model-sized — so the gate is the absence of any percentile
    // aggregate, the per-partition value-map buffering being replaced
    assert(!phys.contains("percentile"),
      s"window percentile survived the rewrite: $phys")
    val plain = plainSession()
    plain.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("liw")
    assert(rowsOf(df) == rowsOf(plain.sql(q)))
  }

  test("percentile rewrite: NULL window partition keys group like the built-in") {
    val spark = extendedSession()
    import spark.implicits._
    val rows = Seq((Option("a"), Option(1.0)), (Option("a"), Option(3.0)),
      (Option.empty[String], Option(10.0)), (Option.empty[String], Option(30.0)),
      (Option("z"), Option.empty[Double]))
    rows.toDF("g", "v").createOrReplaceTempView("pw")
    val q = "SELECT g, v, percentile(v, 0.5) OVER (PARTITION BY g) AS p FROM pw"
    val df = spark.sql(q)
    assert(!df.queryExecution.executedPlan.toString.contains("percentile"))
    val plain = plainSession()
    plain.createDataFrame(rows).toDF("g", "v").createOrReplaceTempView("pw")
    assert(rowsOf(df) == rowsOf(plain.sql(q)))
  }

  test("percentile rewrite: a stack of window specs rewrites linearly over the shared base") {
    val spark = extendedSession()
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("liw3")
    // three DIFFERENT whole-partition specs => a 3-deep Window stack
    // (with pruning Projects interposed); naive per-node rewriting
    // embeds the child subtree per level multiplicatively (64 scans
    // measured); the stack peel shares ONE base: 3 scans per layer
    // (histogram, sentinel-row aggregate, candidates) + 1 row leg = 10
    // — linear in layers, which is the property under test
    val q =
      """SELECT l_orderkey,
        |  percentile(l_extendedprice, 0.5) OVER (PARTITION BY l_returnflag) AS pa,
        |  percentile(l_extendedprice, 0.5) OVER (PARTITION BY l_linestatus) AS pb,
        |  percentile(l_extendedprice, 0.5) OVER (PARTITION BY l_linenumber) AS pc
        |FROM liw3""".stripMargin
    val df = spark.sql(q)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("percentile"), s"stacked window percentiles survived: $phys")
    val scans = "FileScan parquet".r.findAllIn(phys).length
    assert(scans == 10, s"expected 3*layers+1 = 10 scans of the base, found $scans: $phys")
    val plain = plainSession()
    plain.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("liw3")
    assert(rowsOf(df) == rowsOf(plain.sql(q)))
  }

  test("percentile rewrite negative: non-deterministic inputs stay built-in (subtree is duplicated)") {
    val spark = extendedSession()
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lind")
    // rand() in the child: the rewrite re-evaluates the child per scan,
    // so a rewritten plan could pair rows with quantiles from a
    // different draw — must stay on the single-evaluation built-in path
    // (Spark rejects non-deterministic ARGUMENTS outright, so the
    // non-determinism must live in a child projection)
    val aggQ =
      """SELECT percentile(r, 0.5) AS p
        |FROM (SELECT l_returnflag, l_quantity + rand(0) AS r FROM lind)
        |GROUP BY l_returnflag""".stripMargin
    val winQ =
      """SELECT percentile(r, 0.5) OVER (PARTITION BY l_returnflag) AS p
        |FROM (SELECT l_returnflag, l_quantity + rand(0) AS r FROM lind)""".stripMargin
    for (q <- Seq(aggQ, winQ)) {
      val phys = spark.sql(q).queryExecution.executedPlan.toString
      assert(phys.contains("percentile"), s"non-deterministic query was rewritten: $q -- $phys")
    }
  }

    test("percentile rewrite negative: running (ordered) and mixed window functions stay built-in") {
    val spark = extendedSession()
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("liw2")
    val running =
      """SELECT percentile(l_quantity, 0.5)
        |  OVER (PARTITION BY l_returnflag ORDER BY l_orderkey) AS p FROM liw2""".stripMargin
    // mixing with a DIFFERENT spec is fine: the analyzer splits window
    // functions into one Window node per spec, so the percentile node
    // rewrites while row_number keeps its Window — both must answer
    // correctly side by side
    val mixed =
      """SELECT percentile(l_quantity, 0.5) OVER (PARTITION BY l_returnflag) AS p,
        |  row_number() OVER (PARTITION BY l_returnflag ORDER BY l_orderkey) AS rn
        |FROM liw2""".stripMargin
    val plain = plainSession()
    plain.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("liw2")
    val runDf = spark.sql(running)
    assert(runDf.queryExecution.executedPlan.toString.contains("percentile"),
      "running percentile must stay on the built-in window path")
    assert(rowsOf(runDf) == rowsOf(plain.sql(running)))
    val mixDf = spark.sql(mixed)
    val mixPhys = mixDf.queryExecution.executedPlan.toString
    assert(!mixPhys.contains("percentile") && mixPhys.contains("row_number()"),
      s"mixed-spec split not handled as expected: $mixPhys")
    assert(rowsOf(mixDf) == rowsOf(plain.sql(mixed)))
  }

    test("percentile rewrite negative: mixed aggregates and frequency != 1 stay built-in") {
    val spark = extendedSession()
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lin")
    val mixed =
      """SELECT l_returnflag, sum(l_quantity) AS sq,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS p50
        |FROM lin GROUP BY l_returnflag""".stripMargin
    val freq =
      "SELECT percentile(l_quantity, 0.5, l_linenumber) AS p FROM lin GROUP BY l_returnflag"
    for (q <- Seq(mixed, freq)) {
      val df = spark.sql(q)
      assert(df.queryExecution.executedPlan.toString.contains("percentile"),
        s"ineligible query was rewritten away from the built-in: $q")
      assert(rowsOf(df).nonEmpty)
    }
    val got = Seq(mixed, freq).map(q => rowsOf(spark.sql(q)))
    val plain = plainSession()
    plain.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lin")
    assert(got == Seq(mixed, freq).map(q => rowsOf(plain.sql(q))))
  }

  test("percentile rewrite: array-percentage forms route onto the histogram plan, bit-identical") {
    val spark = extendedSession()
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lia")
    // grouped, global, duplicate fractions, arithmetic above the array,
    // and the window shape — all on the substituted plan
    val q =
      """SELECT l_returnflag,
        |  percentile(l_extendedprice, array(0.25, 0.5, 0.9)) AS ps,
        |  percentile(l_quantity, array(0.5, 0.5)) AS dup,
        |  element_at(percentile(l_quantity, array(0.1, 0.9)), 2) - 1.0 AS hi
        |FROM lia GROUP BY l_returnflag""".stripMargin
    val globalQ = "SELECT percentile(l_quantity, array(0.2, 0.8)) AS ps FROM lia"
    // empty input: the built-in returns a NULL ARRAY, not an array of NULLs
    val emptyQ = "SELECT percentile(l_quantity, array(0.5)) AS ps FROM lia WHERE l_quantity < -1"
    val winQ =
      """SELECT l_orderkey,
        |  percentile(l_extendedprice, array(0.25, 0.75)) OVER (PARTITION BY l_returnflag) AS ps
        |FROM lia""".stripMargin
    for (qq <- Seq(q, globalQ, emptyQ, winQ)) {
      val phys = spark.sql(qq).queryExecution.executedPlan.toString
      assert(!phys.contains("percentile") && !phys.contains("ObjectHashAggregate"),
        s"array-percentage form survived the rewrite: $qq\n$phys")
    }
    val got = Seq(q, globalQ, emptyQ, winQ).map(qq => rowsOf(spark.sql(qq)))
    assert(got(2) == Seq(Seq(null))) // NULL array, one global row
    val plain = plainSession()
    plain.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lia")
    assert(got == Seq(q, globalQ, emptyQ, winQ).map(qq => rowsOf(plain.sql(qq))))
    // schema parity incl. element nullability (built-in: containsNull = false)
    assert(spark.sql(q).schema("ps").dataType == plain.sql(q).schema("ps").dataType)
  }

  test("percentile rewrite: nested percentile aggregates rewrite inner-first, both substituted") {
    val spark = extendedSession()
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lin2")
    // an eligible Aggregate ABOVE another eligible percentile Aggregate:
    // the outer must defer one fixed-point pass (re-embedding an
    // unrewritten inner would multiply its scans), then rewrite over the
    // inner's substituted plan — both end up on the histogram plan
    val q =
      """SELECT percentile(p50, 0.5) AS pp
        |FROM (SELECT l_returnflag, percentile(l_extendedprice, 0.5) AS p50
        |      FROM lin2 GROUP BY l_returnflag, l_linestatus)""".stripMargin
    val df = spark.sql(q)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("percentile") && !phys.contains("ObjectHashAggregate"),
      s"nested percentile aggregates not fully rewritten:\n$phys")
    val plain = plainSession()
    plain.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lin2")
    assert(rowsOf(df) == rowsOf(plain.sql(q)))
  }

  test("percentile rewrite: DESC within-group (disc + cont), mixed directions, bit-identical") {
    val spark = extendedSession()
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lid")
    // both directions in ONE aggregate (each call carries its own
    // mirror-rank math), plus a ties-heavy measure (l_quantity) where
    // disc's element pick is direction-sensitive
    val q =
      """SELECT l_returnflag,
        |  percentile_disc(0.4) WITHIN GROUP (ORDER BY l_extendedprice DESC) AS d40,
        |  percentile_disc(0.4) WITHIN GROUP (ORDER BY l_extendedprice) AS a40,
        |  percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice DESC) AS c25,
        |  percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity DESC) AS t50,
        |  percentile_cont(0.0) WITHIN GROUP (ORDER BY l_quantity DESC) AS c0,
        |  percentile_cont(1.0) WITHIN GROUP (ORDER BY l_quantity DESC) AS c1
        |FROM lid GROUP BY l_returnflag""".stripMargin
    val winQ =
      """SELECT l_orderkey,
        |  percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice DESC)
        |    OVER (PARTITION BY l_returnflag) AS c25
        |FROM lid""".stripMargin
    for (qq <- Seq(q, winQ)) {
      val phys = spark.sql(qq).queryExecution.executedPlan.toString
      assert(!phys.contains("percentile") && !phys.contains("ObjectHashAggregate"),
        s"DESC within-group form survived the rewrite: $qq\n$phys")
    }
    val got = Seq(q, winQ).map(qq => rowsOf(spark.sql(qq)))
    val plain = plainSession()
    plain.read.parquet("/root/testdata/sf0.001/lineitem.parquet").createOrReplaceTempView("lid")
    assert(got == Seq(q, winQ).map(qq => rowsOf(plain.sql(qq))))
  }

  test("report-form TVFs build the same plans as the Scala operators: temperature_mix, mixture_plan, histogram_drift") {
    val spark = extendedSession()
    import spark.implicits._
    import graft.operators.CurationOps
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("graft-tvf").toString
    // a small at-rest corpus with sources and text
    val docs = (1L to 120L).map(i =>
      (i, s"src${i % 3}", ("w " * (i % 9 + 1).toInt).trim)).toDF("id", "src", "text")
    docs.write.mode("overwrite").parquet(s"$base/docs")
    val viaSql = spark.sql(
      s"SELECT id FROM temperature_mix('$base/docs', 'id', 'text', 'src', 150L, 0.5) ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    val viaApi = CurationOps.temperatureMix(
        spark.read.parquet(s"$base/docs"), "id", "text", "src", 150L, 0.5)
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaApi && viaSql.nonEmpty)

    val srcs = Seq(("a", 100L, 1.0), ("b", 50L, 5.0), ("c", 400L, 2.0))
      .toDF("k", "toks", "w")
    srcs.write.mode("overwrite").parquet(s"$base/srcs")
    val planSql = spark.sql(
      s"SELECT mix_key, capacity_tokens, capped FROM mixture_plan('$base/srcs', 'k', 'toks', 'w', 300L, 2.0) ORDER BY mix_key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    val planApi = CurationOps.mixturePlan(srcs, "k", "toks", "w", 300L, 2.0)
      .select("mix_key", "capacity_tokens", "capped").orderBy("mix_key")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(planSql == planApi && planSql.nonEmpty)

    CurationOps.writeQuantileLedger(docs, "src", "id", shift = 4, s"$base/qa")
    CurationOps.writeQuantileLedger(
      docs.withColumn("id", col("id") * 2), "src", "id", shift = 4, s"$base/qb")
    val driftSql = spark.sql(
      s"SELECT * FROM histogram_drift('$base/qa', '$base/qb') ORDER BY src")
      .collect().map(_.toSeq).toSeq
    val driftApi = CurationOps.histogramDrift(spark, s"$base/qa", s"$base/qb")
      .orderBy("src").collect().map(_.toSeq).toSeq
    assert(driftSql == driftApi && driftSql.nonEmpty)
    // malformed arity fails loudly at the TVF boundary
    val e = intercept[Exception](spark.sql(
      s"SELECT * FROM histogram_drift('$base/qa')").collect())
    assert(e.getMessage.contains("histogram_drift"), e.getMessage)
  }
}
