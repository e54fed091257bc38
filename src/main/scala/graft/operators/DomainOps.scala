package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Public-suffix / registrable-domain resolution — the key a crawl
  * pipeline should REALLY group on for per-domain caps, licensing and
  * blocklists. `TextOps.urlHost` yields the raw host; but `a.blogspot.com`
  * and `b.blogspot.com` are different REGISTRANTS while `www.example.com`
  * and `example.com` are the same one. The publicsuffix.org list encodes
  * that boundary, and its matching algorithm
  * (https://publicsuffix.org/list/ — plain rules, `*.` wildcard rules,
  * `!` exception rules; the prevailing match is the exception rule if any,
  * else the rule with the most labels, defaulting to `*`) is what this
  * operator implements, Spark-first:
  *
  *   - the rule list is DATA (a DataFrame column of raw PSL lines), not
  *     code — callers ship whatever PSL snapshot they trust; it is
  *     model-sized (~10k rules) and ALWAYS broadcast, so resolution adds
  *     no shuffle over the host side;
  *   - hosts collapse to DISTINCT values first (the d10/d12 rep-collapse
  *     discipline: a 100 TB crawl has billions of rows but only millions
  *     of distinct hosts), each distinct host emits its ≤ `maxLabels`
  *     label-wise suffixes, and one broadcast hash join meets the rules;
  *   - the prevailing rule per host is a `max(struct(...))` aggregate
  *     (exception flag, then matched-label count — the wildcard's `*`
  *     counts as a label, per spec), so the whole resolve is
  *     scan → explode(≤12) → broadcast join → partial-agg shuffle on the
  *     distinct-host table, never on the corpus.
  *
  * Reference behavior: the reference engine exposes per-host grouping only
  * (`duckdb-redis-olap-scanner` has no PSL support); this is part of the
  * beyond-the-reference curation surface (SURVEY §2.E).
  */
object DomainOps {

  /** Parse raw public-suffix rules into the join-ready form
    * `(key, kind, ps_labels)`:
    *
    *   - `kind` 0 = plain rule, 1 = wildcard (`*.foo`), 2 = exception
    *     (`!bar.foo`);
    *   - `key` is the literal label suffix a host suffix must equal for
    *     the rule to match (the rule minus its `*.`/`!` prefix);
    *   - `ps_labels` is the public-suffix label count the rule implies
    *     when it prevails: its own labels for a plain rule, key+1 for a
    *     wildcard (the `*` matches one concrete label), key−1 for an
    *     exception (the exception CANCELS its leftmost label), clamped
    *     to ≥1 (a 1-label exception rule is outside the PSL grammar —
    *     every `!` rule must shadow a wildcard — but a malformed list
    *     must not produce an empty public suffix).
    *
    * Comment lines (`//`) and blank lines are dropped, matching the PSL
    * file format, so a raw snapshot can be loaded verbatim.
    */
  def parsePublicSuffixRules(rules: DataFrame, ruleCol: String = "rule"): DataFrame = {
    val raw = trim(lower(col(ruleCol)))
    val kind = when(raw.startsWith("!"), lit(2))
      .when(raw.startsWith("*."), lit(1))
      .otherwise(lit(0))
    val key = when(kind === 2, substring(raw, 2, Int.MaxValue))
      .when(kind === 1, substring(raw, 3, Int.MaxValue))
      .otherwise(raw)
    val klabs = size(split(key, "\\."))
    rules
      .where(raw =!= "" && !raw.startsWith("//"))
      .select(
        key.as("key"),
        kind.as("kind"),
        greatest(
          lit(1),
          when(kind === 2, klabs - 1).when(kind === 1, klabs + 1).otherwise(klabs))
          .as("ps_labels"))
  }

  /** Resolve the public suffix and registrable domain (eTLD+1) for the
    * DISTINCT hosts of `hosts(hostCol)` against a raw PSL rule table.
    * Output: `(host, public_suffix, registrable_domain)`;
    * `registrable_domain` is NULL when the host IS a public suffix
    * (per spec there is no registrable domain to attribute — callers
    * capping per-registrant must decide policy for such rows
    * explicitly rather than silently merging them under one key).
    *
    * `maxLabels` bounds the per-host suffix fan-out (DNS names have ≤127
    * labels but real hosts have ~2-6; rules deeper than `maxLabels`
    * cannot match past the cap).
    */
  def registrableDomains(
      hosts: DataFrame,
      hostCol: String,
      rules: DataFrame,
      ruleCol: String = "rule",
      maxLabels: Int = 12): DataFrame = {
    val parsed = parsePublicSuffixRules(rules, ruleCol)
    val hh = hosts
      .select(lower(trim(col(hostCol).cast("string"))).as("host"))
      .where(col("host").isNotNull)
      .distinct()
      .withColumn("__labs", split(col("host"), "\\."))
      .withColumn("__n", size(col("__labs")))
    val cand = hh
      .withColumn("__k", explode(sequence(lit(1), least(col("__n"), lit(maxLabels)))))
      .withColumn(
        "__suf",
        array_join(slice(col("__labs"), col("__n") - col("__k") + 1, col("__k")), "."))
    // one broadcast join against the model-sized rule table; a wildcard
    // rule additionally needs a concrete label in front of its key
    val m = cand
      .join(
        broadcast(parsed),
        cand("__suf") === parsed("key") &&
          (parsed("kind") =!= 1 || cand("__n") > cand("__k")),
        "left")
      .withColumn("__exc", when(col("kind") === 2, 1).otherwise(0))
      .withColumn("__mlabs", when(col("kind") === 1, col("__k") + 1).otherwise(col("__k")))
    // prevailing rule: exception first, else most matched labels (the
    // wildcard's * counts); no-match hosts fall to the default rule `*`
    // (public suffix = rightmost label)
    val sel = m
      .groupBy(col("host"))
      .agg(
        first(col("__n")).as("__n"),
        first(col("__labs")).as("__labs"),
        max(when(col("key").isNotNull,
          struct(col("__exc"), col("__mlabs"), col("ps_labels")))).as("__sel"))
      .withColumn("__psn", coalesce(col("__sel.ps_labels"), lit(1)))
    sel.select(
      col("host"),
      array_join(slice(col("__labs"), col("__n") - col("__psn") + 1, col("__psn")), ".")
        .as("public_suffix"),
      when(
        col("__n") > col("__psn"),
        array_join(slice(col("__labs"), col("__n") - col("__psn"), col("__psn") + 1), "."))
        .as("registrable_domain"))
  }

  /** Corpus convenience: append `public_suffix` / `registrable_domain`
    * columns to `df` by resolving its DISTINCT `hostCol` values and
    * joining the mapping back on host. The resolve never touches the
    * corpus rows (distinct-host collapse); the join back is a plain
    * equi-join on host that Spark broadcasts when the mapping is small
    * enough — at crawl scale prefer grouping directly on the mapping
    * output if the downstream op is itself host-keyed.
    */
  def withRegistrableDomain(
      df: DataFrame,
      hostCol: String,
      rules: DataFrame,
      ruleCol: String = "rule",
      maxLabels: Int = 12): DataFrame = {
    val mapping = registrableDomains(df.select(col(hostCol)), hostCol, rules, ruleCol, maxLabels)
    // the mapping's host key is case-folded; join through the same fold so
    // a mixed-case hostCol still resolves (instead of silently missing)
    df.join(mapping, lower(trim(df(hostCol))) === mapping("host"), "left")
      .drop(mapping("host"))
  }
}
