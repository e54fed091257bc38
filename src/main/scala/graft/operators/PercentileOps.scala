package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT percentiles (interpolated, `quantile_cont`
  * semantics) without materializing groups in memory.
  *
  * Spark's built-in `percentile` aggregate buffers every (value → count)
  * of a group in one executor hash map — at 100 TB a single popular group
  * holds ~10⁸ entries and OOMs, and even at bench scale the map churn
  * dominates GC. This operator computes the same result with bounded
  * memory from three shuffle-friendly steps:
  *
  *  1. `groupBy(keys, value).count()` — the shuffle carries DISTINCT
  *     (key, value) pairs with counts (map-side combined);
  *  2. one window over the group ordered by value gives each distinct
  *     value its 0-based index range [start, end) (sort-based, spills
  *     gracefully — never a hash map); the group total n joins in from
  *     a broadcast model-sized aggregate (one row per group);
  *  3. for each requested quantile q, target rank t = (n−1)·q; the values
  *     at ⌊t⌋/⌈t⌉ are picked with conditional `max(when(...))` aggregates
  *     and interpolated exactly like Spark's built-in:
  *     v_lo·(⌈t⌉−t) + v_hi·(t−⌊t⌋) (v_lo when t is integral).
  *
  * NULL handling matches the built-in aggregate EXACTLY: NULL values are
  * excluded from the ranks, but a group whose values are all NULL still
  * emits its row (with NULL quantiles) — `groupBy` group membership never
  * depends on the measure. This parity is what lets the optimizer rule
  * [[graft.plans.PercentileAggregateRewrite]] substitute these plans for
  * the built-in percentile aggregates transparently.
  */
object PercentileOps {

  /** One output row per key: `keys ++ quantile columns` (named by the
    * caller via `qs`: name → q in [0,1]).
    */
  def exactQuantiles(df: DataFrame, keys: Seq[String],
      valueCol: Column, qs: Seq[(String, Double)]): DataFrame =
    exactQuantilesMulti(df, keys, Seq(("m", valueCol, qs)))

  /** Quantiles over SEVERAL value columns in ONE pass over `df`: the
    * measures are unpivoted to `(keys, measure, value)` rows first, so
    * the distinct-count shuffle, the ranking window and the final pick
    * aggregation each run once for all measures together — not once per
    * measure (which would scan and shuffle the fact table N times and
    * join the results back).
    *
    * `measures`: (measureName, valueColumn, quantiles). Quantile output
    * names must be globally unique across measures; output is one row
    * per key with every requested quantile column.
    */
  def exactQuantilesMulti(df: DataFrame, keys: Seq[String],
      measures: Seq[(String, Column, Seq[(String, Double)])]): DataFrame =
    exactQuantilesWindowed(df, keys,
      measures.map { case (m, c, qs) => (m, c, qs.map { case (n, q) => (n, q, false) }) })

  /** The window form with a per-quantile `disc` flag: `disc = false`
    * interpolates (`percentile` / `quantile_cont` semantics); `disc =
    * true` returns the ELEMENT at 0-based rank ⌈q·n⌉−1 (SQL-standard
    * `percentile_disc`, no interpolation). Discrete ranks ride the same
    * machinery — a disc quantile's target rank is integral, so the
    * lo/hi interpolation below degenerates to the picked element. This
    * is the plan [[graft.plans.PercentileAggregateRewrite]] substitutes
    * for the built-in buffering aggregates.
    */
  def exactQuantilesWindowed(df: DataFrame, keys: Seq[String],
      measures: Seq[(String, Column, Seq[(String, Double, Boolean)])]): DataFrame = {
    val keyCols = keys.map(col)
    // unpivot: one row per (input row × measure). NULL measure values are
    // KEPT through the count shuffle (one `__v IS NULL` row per group —
    // it is what keeps an all-NULL group's row alive, like the built-in
    // aggregate does) but excluded from the ranks: the window orders
    // NULLs last so non-NULL indices are unaffected, and the group total
    // __n counts non-NULL rows only.
    val unpivoted = df
      .select(keyCols ++ measures.map { case (m, c, _) => c.cast("double").as(s"__in_$m") }: _*)
      .unpivot(
        ids = keyCols.toArray,
        values = measures.map { case (m, _, _) => col(s"__in_$m").as(m) }.toArray,
        variableColumnName = "__m", valueColumnName = "__v")
    val counts = unpivoted
      .groupBy(keyCols ++ Seq(col("__m"), col("__v")): _*)
      .agg(count(lit(1)).as("__cnt"))
    val grp = keyCols :+ col("__m")
    val wOrd = Window.partitionBy(grp: _*).orderBy(col("__v").asc_nulls_last)
    // group totals via a tiny broadcast aggregate, NOT a second
    // unbounded window: a whole-partition WindowExec pass over every
    // distinct value costs as much as the ranking window itself, while
    // this aggregate is one row per (keys, measure). Re-aggregating
    // `counts` (Σ of the per-value counts) instead of `unpivoted` lets
    // Catalyst reuse the distinct-count exchange — the fact table is
    // scanned and shuffled ONCE for the whole computation.
    // the totals join must be NULL-SAFE on the key columns (<=>): a
    // plain equi-join would silently drop every NULL-keyed group, while
    // groupBy (and the built-in percentile) keep NULL as a group
    // __n counts NON-NULL values only (sum skips the unmatched when);
    // an all-NULL group gets __n NULL → t NULL → NULL output, while its
    // row survives via the NULL-value count row — built-in semantics
    val totals = counts.groupBy(grp: _*)
      .agg(sum(when(col("__v").isNotNull, col("__cnt"))).as("__n"))
      .select(keys.map(c => col(c).as(s"__t_$c")) ++
        Seq(col("__m").as("__t_m"), col("__n")): _*)
    val totalsCond = keys.map(c => col(c) <=> col(s"__t_$c"))
      .foldLeft(col("__m") <=> col("__t_m"))(_ && _)
    val ranked = counts
      .withColumn("__end", sum(col("__cnt")).over(wOrd)) // 1-based end of this value's run
      .withColumn("__start", col("__end") - col("__cnt")) // 0-based first index
      .join(broadcast(totals), totalsCond) // per (keys, measure) total
      .drop((keys.map(c => s"__t_$c") :+ "__t_m"): _*)
    val aggs = measures.flatMap { case (m, _, qs) =>
      qs.flatMap { case (name, q, disc) =>
        // __n is this row's own (keys, measure) group total, so the target
        // rank t is row-local; the when(__m === m) guards pivot the fused
        // frame back apart during the single final aggregation.
        // disc: 0-based rank ⌈q·n⌉−1 clamped to [0, n−1] — always
        // integral, so the interpolation below returns the element
        val t =
          if (disc) greatest(lit(0.0), least(col("__n") - 1, ceil(col("__n") * lit(q)) - 1))
          else (col("__n") - 1) * lit(q)
        val i0 = floor(t)
        val i1 = ceil(t)
        val isM = col("__m") === lit(m)
        Seq(
          max(when(isM && col("__start") <= i0 && i0 < col("__end"), col("__v"))).as(s"__${name}_lo"),
          max(when(isM && col("__start") <= i1 && i1 < col("__end"), col("__v"))).as(s"__${name}_hi"),
          max(when(isM, t)).as(s"__${name}_t"))
      }
    }
    val picked = ranked.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    val outCols = keyCols ++ measures.flatMap { case (_, _, qs) => qs.map { case (name, _, _) =>
      val (lo, hi, t) = (col(s"__${name}_lo"), col(s"__${name}_hi"), col(s"__${name}_t"))
      // Spark Percentile.getPercentile: lower when the rank is integral,
      // else lower·(higher−rank) + higher·(rank−lower)
      when(floor(t) === ceil(t), lo)
        .otherwise(lo * (ceil(t) - t) + hi * (t - floor(t)))
        .as(name)
    } }
    picked.select(outCols: _*)
  }

  /** Exact quantiles by histogram selection as ONE declarative plan —
    * no unconditional driver collects: the two-job form below pulls the
    * histogram and the candidates to the driver, which bounds group
    * cardinality by driver memory; this form keeps everything
    * distributed, so it is the plan the optimizer rule
    * [[graft.plans.PercentileAggregateRewrite]] substitutes for the
    * built-in aggregates.
    *
    *  scan 1: per (group, measure, bucket) counts
    *          ([[graft.functions.DoubleSortableBucket]] — the shuffle
    *          carries only OCCUPIED buckets, never the value set);
    *  bucket math: one window over the bucket table (thousands of rows,
    *          not the data) gives each bucket its cumulative rank range
    *          [__start, __endc); group totals __n broadcast-join in;
    *  needed: buckets holding any requested rank — a per-bucket filter,
    *          model-sized output;
    *  scan 2: rescan broadcast-semi-joined against `needed` — only
    *          candidate values survive (a ~1/2^(64-shift) mantissa
    *          slice of one binade per rank); a window over CANDIDATES
    *          (partitioned by bucket) assigns exact global ranks
    *          (__start + within-bucket row_number), and the usual
    *          conditional-max pick + interpolation finishes.
    *
    * A pathological point-mass bucket makes scan 2's candidate set
    * large, but the ranking window sorts and spills distributed — there
    * is no driver cliff, hence no `maxCandidates` guard here.
    *
    * NULL parity with the built-ins (pinned by sbt tests): NULL values
    * are excluded from ranks; all-NULL groups and NULL group keys emit
    * their row; empty input yields zero rows grouped, one NULL row
    * global.
    */
  def exactQuantilesSelect(df: DataFrame, keys: Seq[String],
      measures: Seq[(String, Column, Seq[(String, Double, Boolean)])],
      shift: Int = 44): DataFrame =
    exactQuantilesSelectRev(df, keys,
      measures.map { case (m, c, qs) =>
        (m, c, qs.map { case (n, q, d) => (n, q, d, false) })
      }, shift)

  /** [[exactQuantilesSelect]] with a per-quantile REVERSE flag —
    * `rev = true` ranks from the HIGH end (`WITHIN GROUP (ORDER BY c
    * DESC)`). The machinery is unchanged: a reverse rank r from the top
    * of an n-element multiset is the forward rank n−1−r, so only the
    * pick indices change —
    *   disc: element at forward rank n−1−(⌈q·n⌉−1);
    *   cont: t = (n−1)·q as usual, lo-pick at n−1−⌊t⌋, hi-pick at
    *         n−1−⌈t⌉, SAME interpolation weights (the identity
    *         w⌊t⌋·(⌈t⌉−t) + w⌈t⌉·(t−⌊t⌋) over the descending multiset w
    *         equals lo·(⌈t⌉−t) + hi·(t−⌊t⌋) with lo = v[n−1−⌊t⌋],
    *         hi = v[n−1−⌈t⌉] — exact, ties included, because the
    *         multiset is shared and only indices mirror).
    */
  def exactQuantilesSelectRev(df: DataFrame, keys: Seq[String],
      measures: Seq[(String, Column, Seq[(String, Double, Boolean, Boolean)])],
      shift: Int = 44): DataFrame = {
    val keyCols = keys.map(col)
    val unpivotedAll = df
      .select(keyCols ++ measures.map { case (m, c, _) => c.cast("double").as(s"__in_$m") }: _*)
      .unpivot(
        ids = keyCols.toArray,
        values = measures.map { case (m, _, _) => col(s"__in_$m").as(m) }.toArray,
        variableColumnName = "__m", valueColumnName = "__v")
    val grp = keyCols :+ col("__m")
    val bucketExpr = org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.DoubleSortableBucket(
        org.apache.spark.sql.GraftSqlShims.expression(col("__v")), shift))

    // scan 1: occupied-bucket histogram. NULL values land in bucket NULL
    // (kept so an all-NULL group still surfaces as a group).
    val hist = unpivotedAll
      .groupBy(grp :+ bucketExpr.as("__b"): _*)
      .agg(count(lit(1)).as("__c"))

    // cumulative rank range per bucket AND the group total __n from ONE
    // window pass over the bucket table (same partitioning + ordering,
    // two frames → one WindowExec; signed bucket order = value order;
    // NULL buckets last so they never perturb non-NULL ranks; an
    // all-NULL group's __n is NULL — sum skips the unmatched when)
    val wB = Window.partitionBy(grp: _*).orderBy(col("__b").asc_nulls_last)
    val wAll = wB.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val nonNullC = when(col("__b").isNotNull, col("__c"))
    val cum = hist
      .withColumn("__endc", sum(nonNullC).over(wB))
      .withColumn("__n", sum(nonNullC).over(wAll))
      .withColumn("__start", col("__endc") - col("__c"))

    // per-quantile target ranks as expressions of the group total __n:
    // (lo-pick index, hi-pick index, t for the interpolation weights)
    def rankExprs(q: Double, disc: Boolean, rev: Boolean): (Column, Column, Column) = {
      if (disc) {
        val rd = greatest(lit(0.0), least(col("__n") - 1, ceil(col("__n") * lit(q)) - 1))
        val idx = if (rev) col("__n") - 1 - rd else rd
        (idx, idx, idx) // integral t → the pick returns the element
      } else {
        val t = (col("__n") - 1) * lit(q)
        if (rev) (col("__n") - 1 - floor(t), col("__n") - 1 - ceil(t), t)
        else (floor(t), ceil(t), t)
      }
    }

    // needed buckets: any requested rank falls inside [__start, __endc)
    val neededCond = measures.flatMap { case (m, _, qs) =>
      qs.map { case (_, q, disc, rev) =>
        val (i0, i1, _) = rankExprs(q, disc, rev)
        (col("__m") === lit(m)) &&
          ((i0 >= col("__start") && i0 < col("__endc")) ||
            (i1 >= col("__start") && i1 < col("__endc")))
      }
    }.reduce(_ || _)
    // `needed` keeps the NULL-bucket rows too (`__b IS NULL`): they
    // match no candidate in the join below (the bucket of a non-NULL
    // value never equals NULL), but they guarantee ≥1 row per
    // (group, measure) — a group with data always has a needed bucket
    // (every requested rank falls in one), and an all-NULL group has
    // exactly its NULL-bucket row — which is what lets the sentinel
    // rows derive from THIS model-sized table instead of re-deriving
    // the whole histogram lineage a second time.
    val needed = cum.filter(col("__b").isNull || neededCond)
      .select(keys.map(k => col(k).as(s"__nk_$k")) ++
        Seq(col("__m").as("__n_m"), col("__b").as("__n_b"),
          col("__start"), col("__n")): _*)

    // scan 2: candidates only — semi-join against `needed`, then EXACT
    // global rank = bucket start + within-bucket row_number (the
    // ranking window sees candidates, never the full value set).
    // `needed` is broadcast EXPLICITLY: it is OUTPUT-shaped — one row
    // per (group, measure, needed bucket) ≤ groups × picks × 2 (+ one
    // NULL-bucket row per group with NULLs), the same cardinality the
    // query RETURNS, so if it doesn't fit in a broadcast the query's
    // own result doesn't fit on the driver either (huge-group shapes
    // belong to [[exactQuantilesWindowed]]/[[exactQuantilesMulti]]).
    // Without the hint the planner has no usable stats for the
    // window-derived side and — measured on q67d — BROADCASTS THE
    // UNPIVOTED FACT STREAM instead (the column-pruned scan estimate
    // undercuts the threshold), a driver-side collect of rows ×
    // measures that would OOM outright at real scale.
    val candCond = keys.map(k => col(k) <=> col(s"__nk_$k"))
      .foldLeft(col("__m") === col("__n_m") && bucketExpr === col("__n_b"))(_ && _)
    val wC = Window.partitionBy((grp :+ col("__n_b")): _*).orderBy(col("__v"))
    val cands = unpivotedAll.filter(col("__v").isNotNull)
      .join(broadcast(needed), candCond)
      .withColumn("__g", col("__start") + row_number().over(wC) - 1)
      .select(grp ++ Seq(col("__v"), col("__n"), col("__g")): _*)
    // one sentinel row per (group, measure) — rank −1 never matches a
    // pick, so groups with NO candidate rows (all-NULL measures) still
    // surface from the final aggregation with NULL quantiles, and __n
    // rides along so the `t` aggregate stays NULL-correct. Derived
    // from `needed` (≥1 row per group — see above), so group presence
    // costs a model-sized aggregate, not a second histogram pass.
    val ranked = cands.unionByName(needed
      .groupBy(keys.map(k => col(s"__nk_$k")) :+ col("__n_m"): _*)
      .agg(max(col("__n")).as("__n"))
      .select(keys.map(k => col(s"__nk_$k").as(k)) ++
        Seq(col("__n_m").as("__m"), lit(null).cast("double").as("__v"),
          col("__n"), lit(-1L).as("__g")): _*))

    // pick + interpolate, exactly like the window form
    val aggs = measures.flatMap { case (m, _, qs) =>
      qs.flatMap { case (name, q, disc, rev) =>
        val (i0, i1, t) = rankExprs(q, disc, rev)
        val isM = col("__m") === lit(m)
        Seq(
          max(when(isM && col("__g") === i0, col("__v"))).as(s"__${name}_lo"),
          max(when(isM && col("__g") === i1, col("__v"))).as(s"__${name}_hi"),
          max(when(isM, t)).as(s"__${name}_t"))
      }
    }
    val picked = ranked.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
    val outCols = measures.flatMap { case (_, _, qs) => qs.map { case (name, _, _, _) =>
      val (lo, hi, t) = (col(s"__${name}_lo"), col(s"__${name}_hi"), col(s"__${name}_t"))
      when(floor(t) === ceil(t), lo)
        .otherwise(lo * (ceil(t) - t) + hi * (t - floor(t)))
        .as(name)
    } }

    // grouped: one row per group (sentinel rows carry groups with no
    // candidates); global: groupBy() emits exactly one row on every
    // input including empty — both match the built-in aggregate
    picked.select(keyCols ++ outCols: _*)
  }

  /** Exact quantiles by two-job HISTOGRAM SELECTION — the scale path
    * when values are near-unique (prices, latencies): the window form
    * above shuffles every distinct (key, value) pair, which for a
    * near-unique measure is the whole fact table; this form shuffles
    * nothing wider than the OCCUPIED histogram buckets.
    *
    *  job 1: bucket every value by the top bits of its order-preserving
    *          IEEE-754 long ([[graft.functions.DoubleSortableBucket]] —
    *          monotonic WITHOUT a min/max pre-pass), count per
    *          (group, measure, bucket): partial-agg map-side-combined,
    *          the shuffle carries only occupied buckets;
    *  driver: cumulative bucket counts locate, for every requested rank
    *          ⌊t⌋/⌈t⌉, the bucket holding it (model-sized math: occupied
    *          buckets × groups — the quantile REPORT shape bounds
    *          `groups` the same way any displayed GROUP BY does; for
    *          huge group cardinality use [[exactQuantilesMulti]]);
    *  job 2: rescan filtering to the needed (group, measure, bucket)
    *          triples — a semi-filter the scan's codegen evaluates per
    *          row — and collect ONLY those candidates (one
    *          mantissa-slice of one binade per needed bucket).
    *
    * The picked ranks interpolate exactly like the window form
    * (`quantile_cont` semantics), so results are bit-identical (an sbt
    * test pins this, ties/NULLs/edge quantiles included). `disc = true`
    * switches to SQL-standard `percentile_disc` semantics (element at
    * rank ⌈q·n⌉-1, no interpolation) on the same two-job machinery —
    * q67b conformance-checks it against DuckDB's `quantile_disc` and an
    * sbt test pins it row-equal to Spark's built-in aggregate. Guard: if a
    * needed bucket holds more than `maxCandidates` values (pathological
    * point-mass), falls back to the window form rather than risk the
    * driver — the histogram itself reveals this before any collect.
    *
    * `shift` trades shuffle width for candidate size: 44 keeps 20
    * significant bits — ~256 buckets per binade, so candidates are a
    * ~1/256 mantissa slice of one binade while the histogram stays a
    * few thousand occupied buckets per group.
    */
  def exactQuantilesHist(df: DataFrame, keys: Seq[String],
      measures: Seq[(String, Column, Seq[(String, Double)])],
      shift: Int = 44, maxCandidates: Int = 4000000,
      disc: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val keyCols = keys.map(col)
    // NULL values are kept through the histogram job (their bucket is
    // NULL — DoubleSortableBucket is null-propagating) so an all-NULL
    // group still surfaces as a group and emits its row with NULL
    // quantiles, exactly like the built-in aggregate; job 2's candidate
    // scan filters to non-NULL values only.
    val unpivotedAll = df
      .select(keyCols ++ measures.map { case (m, c, _) => c.cast("double").as(s"__in_$m") }: _*)
      .unpivot(
        ids = keyCols.toArray,
        values = measures.map { case (m, _, _) => col(s"__in_$m").as(m) }.toArray,
        variableColumnName = "__m", valueColumnName = "__v")
    val unpivoted = unpivotedAll.filter(col("__v").isNotNull)
    val grp = keyCols :+ col("__m")
    val bucketExpr = org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.DoubleSortableBucket(
        org.apache.spark.sql.GraftSqlShims.expression(col("__v")), shift))

    // the composite-key rendering the candidate filter (job 2) matches
    // on is computed by SPARK on BOTH sides: job 1 carries the
    // cast-based rendering of each group key alongside the typed
    // values, so driver-side toString (which disagrees with Spark's
    // cast for timestamp/decimal keys — java.sql.Timestamp renders a
    // trailing '.0') never enters the comparison
    val sep = "\u0001"
    val nullSentinel = "\u0000NULL"
    val gRenderExpr = concat_ws(sep,
      grp.map(c => coalesce(c.cast("string"), lit(nullSentinel))): _*)

    // job 1: histogram counts (shuffle carries only occupied buckets)
    val hist = unpivotedAll
      .groupBy(grp :+ bucketExpr.as("__b"): _*)
      .agg(count(lit(1)).as("__c"))
      .withColumn("__gr", gRenderExpr)
      .collect()

    // driver: cumulative counts → group totals, needed buckets, ranks
    val nKeys = keys.length
    def gkey(r: org.apache.spark.sql.Row): Seq[Any] = (0 until nKeys + 1).map(r.get)
    // per group: (bucket, count) ascending — signed bucket order = value
    // order. NULL-bucket rows (all-NULL measures) carry group presence
    // only: they never join the rank math.
    val histNN = hist.filter(r => !r.isNullAt(nKeys + 1))
    val histByG = histNN.groupBy(gkey).map { case (g, rs) =>
      g -> rs.map(r => (r.getLong(nKeys + 1), r.getLong(nKeys + 2))).sortBy(_._1)
    }
    val emptyGroups = hist.iterator.map(gkey).toSet -- histByG.keySet
    val needed = scala.collection.mutable.Set[(Seq[Any], Long)]()
    val targets = scala.collection.mutable.Map[Seq[Any], Seq[(String, Double, Long, Long)]]()
    histByG.foreach { case (g, sorted) =>
      val n = sorted.map(_._2).sum
      val cum = sorted.scanLeft(0L)(_ + _._2) // cum(i) = ranks before bucket i
      def bucketOf(rank: Long): Long = {
        val i = cum.indexWhere(_ > rank) - 1 // last cum entry ≤ rank
        sorted(i)._1
      }
      val mName = g.last.asInstanceOf[String]
      val qs = measures.find(_._1 == mName).get._3
      targets(g) = qs.map { case (name, q) =>
        if (disc) {
          // SQL-standard percentile_disc: the smallest ELEMENT whose
          // cume_dist >= q — 0-based rank ceil(q·n)-1, never an
          // interpolation. Same histogram machinery, one rank, i0 == i1
          // so the pick below returns the element verbatim.
          val rd = math.min(n - 1, math.max(0L, math.ceil(q * n).toLong - 1))
          needed += ((g, bucketOf(rd)))
          (name, rd.toDouble, rd, rd)
        } else {
          val t = (n - 1) * q
          val i0 = math.floor(t).toLong
          val i1 = math.ceil(t).toLong
          needed += ((g, bucketOf(i0)))
          needed += ((g, bucketOf(i1)))
          (name, t, i0, i1)
        }
      }
    }
    if (needed.exists { case (g, b) => histByG(g).find(_._1 == b).get._2 > maxCandidates })
      // pathological point-mass: hand off to the buffering-but-safe form
      return if (disc) discFallback(df, keys, measures)
             else exactQuantilesMulti(df, keys, measures)

    // job 2: collect candidate values of the needed buckets only. The
    // composite key joins on an unprintable separator (cannot occur in
    // sane key columns); both sides of the match use SPARK's rendering
    // — the group part was carried from job 1 (`__gr`), the bucket is a
    // long (Scala and Spark agree on long-to-string). NULL key columns
    // need a sentinel on BOTH sides: concat_ws silently SKIPS null
    // inputs (shifting the composite key), so every column is coalesced
    // to a NUL-prefixed sentinel — without this a NULL group key never
    // matches, no candidates arrive, and valueAt throws.
    val renderByG = hist.iterator
      .map(r => gkey(r) -> r.getString(nKeys + 3)).toMap
    val neededKeys = needed.map { case (g, b) => renderByG(g) + sep + b }.toSeq
    val gkeyExpr = concat_ws(sep,
      (grp :+ bucketExpr.as("__b")).map(c => coalesce(c.cast("string"), lit(nullSentinel))): _*)
    val candRows = unpivoted
      .filter(gkeyExpr.isin(neededKeys: _*))
      .select(grp ++ Seq(bucketExpr.as("__b"), col("__v")): _*)
      .collect()
    val candByBucket = candRows.groupBy(r => (gkey(r), r.getLong(nKeys + 1)))
      .map { case (k, rs) => k -> rs.map(_.getDouble(nKeys + 2)).sorted }

    // driver: in-bucket offsets → picked values → interpolation
    def valueAt(g: Seq[Any], rank: Long): Double = {
      val sorted = histByG(g)
      val cum = sorted.scanLeft(0L)(_ + _._2)
      val i = cum.indexWhere(_ > rank) - 1
      val b = sorted(i)._1
      candByBucket((g, b))((rank - cum(i)).toInt)
    }
    val outRows = targets.toSeq.map { case (g, qs) =>
      g -> qs.map { case (name, t, i0, i1) =>
        val lo = valueAt(g, i0)
        val v = if (i0 == i1) lo else {
          val hi = valueAt(g, i1)
          lo * (i1 - t) + hi * (t - i0)
        }
        name -> v
      }.toMap
    } ++ emptyGroups.toSeq.map(g => g -> Map.empty[String, Double]) // all-NULL groups: row with NULL quantiles
    // one output row per KEY (measures fused back side by side)
    val allQNames = measures.flatMap(_._3.map(_._1))
    val byKey = outRows.groupBy(_._1.init)
    val rows = byKey.toSeq.map { case (k, gs) =>
      val vals = gs.flatMap(_._2).toMap
      org.apache.spark.sql.Row.fromSeq(k ++ allQNames.map(n => vals.get(n).map(Double.box).orNull))
    }
    // global aggregation over EMPTY input: the built-in aggregate (and
    // the select/windowed siblings) returns ONE row of NULL quantiles,
    // not zero rows — keep the three forms row-set-identical
    val rowsOut =
      if (keys.isEmpty && rows.isEmpty)
        Seq(org.apache.spark.sql.Row.fromSeq(allQNames.map(_ => null)))
      else rows
    val outSchema = org.apache.spark.sql.types.StructType(
      df.select(keyCols: _*).schema.fields ++
        allQNames.map(n => org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.DoubleType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rowsOut, 1), outSchema)
  }

  /** Point-mass fallback for `disc = true`: Spark's built-in
    * `percentile_disc` aggregate (buffers per-group value maps — safe,
    * just not the scale path; only reached when one histogram bucket
    * exceeds `maxCandidates`).
    *
    * No row filtering: the built-in aggregate keeps a group whose
    * measures are all NULL (emitting NULL quantiles), and since r7 the
    * histogram and window forms do too — all three forms agree on the
    * row SET, so the point-mass guard tripping can never change it.
    */
  private def discFallback(df: DataFrame, keys: Seq[String],
      measures: Seq[(String, Column, Seq[(String, Double)])]): DataFrame = {
    val keyCols = keys.map(col)
    val base = df.select(
      keyCols ++ measures.map { case (m, c, _) => c.cast("double").as(s"__in_$m") }: _*)
    val aggs = measures.flatMap { case (m, _, qs) =>
      qs.map { case (name, q) =>
        expr(s"percentile_disc($q) WITHIN GROUP (ORDER BY `__in_$m`)").as(name)
      }
    }
    base.groupBy(keyCols: _*).agg(aggs.head, aggs.tail: _*)
  }
}
