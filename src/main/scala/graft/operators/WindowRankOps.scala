package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed ranking windows for LOW-CARDINALITY partition keys — the
  * classic window skew trap. `rank() OVER (PARTITION BY flag ORDER BY
  * ...)` clusters by `flag`, so a 3-value key runs THREE tasks no
  * matter how many executors the cluster has, and at 100 TB one task
  * sorts ~33 billion rows. This operator computes the same
  * rank/dense_rank/row_number/ntile values with parallelism equal to
  * the shuffle width:
  *
  *  1. `repartitionByRange` on (partition cols ++ order cols) assigns
  *     every row a SLICE id — a group's rows span contiguous slices in
  *     global order;
  *  2. the same window functions run partitioned by (slice, group) —
  *     `np × groups` balanced partitions instead of `groups` skewed
  *     ones — giving LOCAL row numbers / ranks / dense ranks
  *     (whole-stage-codegen `WindowExec`, no custom row walk);
  *  3. per-(slice, group) boundary stats come from one aggregation
  *     over the ranked rows (`min_by`/`max_by` on the local row
  *     number pick the slice's first/last order key; the trailing-tie
  *     size is `n − max(local rank) + 1`), and the driver folds them
  *     in slice order into per-slice OFFSETS — rows before, distinct
  *     keys before, and, for a tie group straddling a slice boundary,
  *     the global rank where the straddling tie began. The
  *     `.collect()` is this slices × groups stats table (model-sized),
  *     never data;
  *  4. a broadcast join applies the offsets: `rank = local rank +
  *     rows-before`, except rows continuing a boundary-straddling tie,
  *     which take the recorded tie-start rank; `dense_rank = local
  *     dense + distinct-before − (1 if the slice's first key
  *     continues)`; `ntile` derives from the global row number and the
  *     group total.
  *
  * The ranked slices are computed once (lazy local checkpoint shared
  * by the stats pass and the output pass — materialized inside the
  * caller's own action; a long-lived job would persist a staging
  * table instead). Exactness is pinned against the built-in window on
  * tie-heavy fixtures (ties straddling slice boundaries included) and
  * by the q17b conformance oracle, which is q17's verbatim.
  *
  * Boundary comparisons are null-safe; partition columns join
  * null-safely.
  */
object WindowRankOps {

  /** Auto-route threshold: below this ESTIMATED input size every
    * `partitioned*` entry point returns the built-in window's plan
    * instead — identical values and schema (the distributed forms are
    * exactness-pinned against the built-ins), none of the machinery
    * (range shuffle, checkpoint, stats collect, broadcast join). The
    * skew trap this family exists for is a 100 TB problem; under a
    * couple of GB a single task sorts the largest group in seconds and
    * the machinery costs more than it saves, so small inputs should
    * pay NOTHING extra (q15b/q16b/q17b/q46b ≈ their built-in twins at
    * conformance scale) while big ones keep the 10× crossover win
    * (SCALE.md). The size comes from Catalyst's plan statistics
    * (file-size based for scans — free, no extra job); set the conf to
    * 0 to force the distributed path (the spec does), or raise it to
    * route more through the built-in.
    */
  private[graft] val MinBytesKey = "spark.graft.window.distributedMinBytes"
  private[graft] val DefaultMinBytes: Long = 2L * 1024 * 1024 * 1024

  /** True when `df` is small enough (plan-stats estimate under the
    * [[MinBytesKey]] threshold) that the built-in window wins.
    */
  private[graft] def routesToBuiltin(df: DataFrame): Boolean = {
    val min = BigInt(df.sparkSession.conf
      .get(MinBytesKey, DefaultMinBytes.toString).toLong)
    min > 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes < min
  }

  private def builtinW(partCols: Seq[String], order: Seq[(String, Boolean)]) =
    Window.partitionBy(partCols.map(col): _*)
      .orderBy(order.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }: _*)

  /** The pre-checkpoint fragment: range-slice assignment + LOCAL
    * window numbers per (slice, group) — every window here partitions
    * by (`__pid`, partCols), never by the low-cardinality key alone
    * (PlanShapeSpec pins it on this fragment, because the checkpoint
    * hides it from the output plan).
    */
  private[graft] def slicedLocalRanks(df: DataFrame, partCols: Seq[String],
      order: Seq[(String, Boolean)], np: Int,
      withReverse: Boolean = false): DataFrame = {
    val sortCols = partCols.map(col) ++ order.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc
    }
    val w = Window.partitionBy((col("__pid") +: partCols.map(col)): _*)
      .orderBy(order.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }: _*)
    val base = df.repartitionByRange(np, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(w).cast("long"))
      .withColumn("__lrk", rank().over(w).cast("long"))
      .withColumn("__ldr", dense_rank().over(w).cast("long"))
    if (!withReverse) base
    else {
      // local rank with every order direction FLIPPED (asc↔desc also
      // flips Spark's null placement consistently): peers are the same
      // set in both directions, so the reverse rank is the distance
      // from the group's end — [[partitionedDistribution]] turns it
      // into the last-peer position cume_dist needs
      val wRev = Window.partitionBy((col("__pid") +: partCols.map(col)): _*)
        .orderBy(order.map { case (c, asc) =>
          if (asc) col(c).desc else col(c).asc }: _*)
      base.withColumn("__lrkR", rank().over(wRev).cast("long"))
    }
  }

  /** The pre-checkpoint running fragment (see [[slicedLocalRanks]] —
    * same gate-ability rationale): slice assignment + LOCAL running /
    * moving sums per (slice, group); every window partitions by
    * (`__pid`, partCols).
    */
  private[graft] def slicedLocalRunning(df: DataFrame, partCols: Seq[String],
      order: Seq[(String, Boolean)], valueCol: String, movingK: Int,
      np: Int): DataFrame = {
    val sortCols = partCols.map(col) ++ order.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc
    }
    val w = Window.partitionBy((col("__pid") +: partCols.map(col)): _*)
      .orderBy(order.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }: _*)
    val v = col(valueCol).cast("long")
    df.repartitionByRange(np, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(w).cast("long"))
      .withColumn("__lrun",
        sum(v).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__lmov",
        sum(v).over(w.rowsBetween(-(movingK - 1).toLong, Window.currentRow)))
  }

  /** Running + moving SUMS over a low-cardinality partition key at
    * full shuffle width — the running-aggregate face of the same skew
    * trap [[partitionedRanks]] solves for ranking. `valueCol` must be
    * integral (LONG sums — exact, so the distributed re-association of
    * additions is bit-identical to the sequential built-in; for
    * floating measures, scale to integer units first, e.g. cents — the
    * float fold ORDER would otherwise drift ulps across slice
    * boundaries). Returns `df` + `running_total` (unbounded-preceding
    * row frame) + `moving_sum<k>` (last `movingK` rows incl. current).
    *
    * Shape: range slices + per-slice local windows (codegen, np ×
    * groups balanced partitions), per-slice totals and tail values
    * folded on the driver (bounded by slices × groups ×
    * `movingK`), broadcast back: `running = local running + previous
    * slices' total`; a row fewer than `movingK` rows into its slice
    * completes its frame from the PREVIOUS slice's broadcast tail
    * values — so frames straddling slice boundaries are exact, and a
    * group's first rows see the same clipped frames the built-in
    * produces.
    */
  def partitionedRunning(df: DataFrame, partCols: Seq[String],
      order: Seq[(String, Boolean)], valueCol: String, movingK: Int): DataFrame = {
    require(partCols.nonEmpty && order.nonEmpty && movingK >= 1,
      "need partition cols, order cols, movingK >= 1")
    require(Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(df.schema(valueCol).dataType),
      s"$valueCol must be integral (exact long sums); scale floats to integer units first")
    val reserved = Set("__pid", "__lrn", "__lcnt", "__lrun", "__lmov",
      "running_total", s"moving_sum$movingK")
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty,
      s"input columns collide with partitionedRunning's internals/outputs: ${clash.mkString(", ")}")
    if (routesToBuiltin(df)) {
      val w = builtinW(partCols, order)
      val vb = col(valueCol).cast("long")
      return df.select(df.columns.map(col) ++ Seq(
        sum(vb).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("running_total"),
        sum(vb).over(w.rowsBetween(-(movingK - 1).toLong, Window.currentRow))
          .as(s"moving_sum$movingK")): _*)
    }
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val v = col(valueCol).cast("long")
    val local = slicedLocalRunning(df, partCols, order, valueCol, movingK, np)
      .localCheckpoint(false)

    // per-slice totals + the last (movingK-1) values in order — the
    // driver fold input, bounded by slices × groups × movingK
    val tailK = movingK - 1
    val statRows = local.groupBy((col("__pid") +: partCols.map(col)): _*)
      .agg(sum(v).as("__tot"), count(lit(1)).as("__n"),
        reverse(slice(reverse(sort_array(
          collect_list(struct(col("__lrn"), v.as("__v"))))), 1, math.max(tailK, 1)))
          .as("__tail"))
      .collect()

    case class SliceStat(pid: Int, part: Seq[Any], tot: Long, n: Long, tail: Seq[Long])
    val stats = statRows.map { r =>
      val part = (1 to partCols.size).map(r.get)
      val base = 1 + partCols.size
      val tail = r.getSeq[Row](base + 2).map(_.getLong(1))
      SliceStat(r.getInt(0), part, r.getLong(base), r.getLong(base + 1),
        if (tailK == 0) Seq.empty else tail)
    }
    case class RunAdj(pid: Int, part: Seq[Any], offset: Long, prevTail: Seq[Long])
    val adjs = scala.collection.mutable.ArrayBuffer.empty[RunAdj]
    stats.groupBy(_.part).foreach { case (part, rows) =>
      val ordered = rows.sortBy(_.pid)
      var offset = 0L
      var prevTail = Seq.empty[Long]
      ordered.foreach { s =>
        adjs += RunAdj(s.pid, part, offset, prevTail)
        offset += s.tot
        // the group's trailing (movingK-1) values after this slice:
        // this slice's tail, left-padded from the previous one when
        // the slice itself is shorter than the frame
        prevTail =
          if (s.tail.size >= tailK) s.tail.takeRight(tailK)
          else (prevTail ++ s.tail).takeRight(tailK)
      }
    }

    val schema = df.schema
    val pIdx = partCols.map(schema.fieldIndex)
    val adjSchema = StructType(
      Seq(StructField("__apid", IntegerType, nullable = false)) ++
        pIdx.map(i => schema.fields(i)).zipWithIndex.map { case (f, i) =>
          StructField(s"__p$i", f.dataType, f.nullable) } ++
        Seq(StructField("__offset", LongType, nullable = false),
          StructField("__prevTail", ArrayType(LongType, containsNull = false),
            nullable = false)))
    val adjRows = new java.util.ArrayList[Row]()
    adjs.foreach { a =>
      adjRows.add(Row.fromSeq(Seq(a.pid) ++ a.part ++ Seq(a.offset, a.prevTail)))
    }
    val adjDf = spark.createDataFrame(adjRows, adjSchema)
    val joinCond = (local("__pid") === adjDf("__apid")) && partCols.zipWithIndex
      .map { case (c, i) => local(c) <=> adjDf(s"__p$i") }
      .reduce(_ && _)
    val joined = local.join(broadcast(adjDf), joinCond)
    // a row < movingK rows into its slice completes its frame from the
    // previous slice's tail: take the LAST (movingK - lrn) tail values
    val need = greatest(lit(movingK.toLong) - col("__lrn"), lit(0L)).cast("int")
    val extras = slice(col("__prevTail"),
      greatest(size(col("__prevTail")) - need + 1, lit(1)),
      least(need, size(col("__prevTail"))))
    joined.select(
      schema.fieldNames.map(local(_)) ++ Seq(
        (col("__lrun") + col("__offset")).as("running_total"),
        (col("__lmov") + coalesce(aggregate(extras, lit(0L), _ + _), lit(0L)))
          .as(s"moving_sum$movingK")): _*)
  }

  /** The pre-checkpoint shift fragment (see [[slicedLocalRanks]] —
    * same gate-ability rationale): slice assignment + LOCAL
    * lag/lead-by-`k` of the value struct per (slice, group); every
    * window partitions by (`__pid`, partCols).
    */
  private[graft] def slicedLocalShift(df: DataFrame, partCols: Seq[String],
      order: Seq[(String, Boolean)], valueCols: Seq[String], k: Int,
      np: Int): DataFrame = {
    val sortCols = partCols.map(col) ++ order.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc
    }
    val w = Window.partitionBy((col("__pid") +: partCols.map(col)): _*)
      .orderBy(order.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }: _*)
    val valStruct = struct(valueCols.map(col): _*)
    df.repartitionByRange(np, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(w).cast("long"))
      .withColumn("__llag", lag(valStruct, k).over(w))
      .withColumn("__llead", lead(valStruct, k).over(w))
  }

  /** Distributed `lag`/`lead` over a low-cardinality partition key —
    * the shift face of the skew trap ([[partitionedRanks]],
    * [[partitionedRunning]], [[partitionedDistribution]]). Returns
    * `df` + two STRUCT columns `lag<k>` and `lead<k>` holding
    * `valueCols` shifted by `k` rows within each group (null at the
    * group's edges, like the built-in); callers project the fields
    * they need.
    *
    * Shape: range slices + per-slice local lag/lead (codegen, np ×
    * groups balanced partitions); a row fewer than `k` rows into its
    * slice takes its lag from the group's trailing `k` values across
    * all PREVIOUS slices, a row fewer than `k` rows from its slice's
    * end takes its lead from the leading `k` values across all
    * FOLLOWING slices — both carried as driver-folded, broadcast
    * head/tail arrays (bounded by slices × groups × `k`), exactly the
    * [[partitionedRunning]] boundary-tail discipline in both
    * directions.
    *
    * `order` should be a TOTAL order of each group (include a
    * tiebreaker column): with duplicate sort keys the built-in window
    * is itself nondeterministic about which peer is "previous", and
    * range slicing may split peers across slices in a different
    * arbitrary order.
    */
  def partitionedShift(df: DataFrame, partCols: Seq[String],
      order: Seq[(String, Boolean)], valueCols: Seq[String], k: Int): DataFrame = {
    require(partCols.nonEmpty && order.nonEmpty && valueCols.nonEmpty && k >= 1,
      "need partition cols, order cols, value cols, k >= 1")
    val reserved = Set("__pid", "__lrn", "__llag", "__llead", s"lag$k", s"lead$k")
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty,
      s"input columns collide with partitionedShift's internals/outputs: ${clash.mkString(", ")}")
    if (routesToBuiltin(df)) {
      val w = builtinW(partCols, order)
      val vs = struct(valueCols.map(col): _*)
      return df.select(df.columns.map(col) ++ Seq(
        lag(vs, k).over(w).as(s"lag$k"),
        lead(vs, k).over(w).as(s"lead$k")): _*)
    }
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val local = slicedLocalShift(df, partCols, order, valueCols, k, np)
      .localCheckpoint(false)
    val valStruct = struct(valueCols.map(col): _*)

    // per-(slice, group) head/tail-k values, one agg, tiny result
    val sorted = sort_array(collect_list(struct(col("__lrn"), valStruct.as("__v"))))
    val statRows = local.groupBy((col("__pid") +: partCols.map(col)): _*)
      .agg(count(lit(1)).as("__n"),
        slice(sorted, 1, k).as("__head"),
        reverse(slice(reverse(sorted), 1, k)).as("__tail"))
      .collect()

    case class Stat(pid: Int, part: Seq[Any], n: Long, head: Seq[Row], tail: Seq[Row])
    val stats = statRows.map { r =>
      val base = 1 + partCols.size
      Stat(r.getInt(0), (1 to partCols.size).map(r.get), r.getLong(base),
        r.getSeq[Row](base + 1).map(_.getStruct(1)),
        r.getSeq[Row](base + 2).map(_.getStruct(1)))
    }
    case class Adj(pid: Int, part: Seq[Any], n: Long, prevTail: Seq[Row], nextHead: Seq[Row])
    val adjs = scala.collection.mutable.ArrayBuffer.empty[Adj]
    stats.groupBy(_.part).foreach { case (part, rows) =>
      val ordered = rows.sortBy(_.pid)
      // group's trailing k values before each slice (forward walk)...
      var carry = Seq.empty[Row]
      val prevTails = ordered.map { s =>
        val out = carry; carry = (carry ++ s.tail).takeRight(k); out
      }
      // ...and leading k values after it (reverse walk)
      carry = Seq.empty[Row]
      val nextHeads = ordered.reverse.map { s =>
        val out = carry; carry = (s.head ++ carry).take(k); out
      }.reverse
      ordered.zip(prevTails.zip(nextHeads)).foreach { case (s, (pt, nh)) =>
        adjs += Adj(s.pid, part, s.n, pt, nh)
      }
    }

    val schema = df.schema
    val pIdx = partCols.map(schema.fieldIndex)
    val valType = StructType(valueCols.map(c => schema(schema.fieldIndex(c))))
    val adjSchema = StructType(
      Seq(StructField("__apid", IntegerType, nullable = false)) ++
        pIdx.map(i => schema.fields(i)).zipWithIndex.map { case (f, i) =>
          StructField(s"__p$i", f.dataType, f.nullable) } ++
        Seq(StructField("__an", LongType, nullable = false),
          StructField("__prevTail", ArrayType(valType, containsNull = false),
            nullable = false),
          StructField("__nextHead", ArrayType(valType, containsNull = false),
            nullable = false)))
    val adjRows = new java.util.ArrayList[Row]()
    adjs.foreach { a =>
      adjRows.add(Row.fromSeq(Seq(a.pid) ++ a.part ++ Seq(a.n, a.prevTail, a.nextHead)))
    }
    val adjDf = spark.createDataFrame(adjRows, adjSchema)
    val joinCond = (local("__pid") === adjDf("__apid")) && partCols.zipWithIndex
      .map { case (c, i) => local(c) <=> adjDf(s"__p$i") }
      .reduce(_ && _)
    val joined = local.join(broadcast(adjDf), joinCond)
    // row k' = __lrn rows into its slice: lag comes from prevTail's
    // (size − (k − k'))-th element once k' ≤ k; lead symmetric from
    // nextHead once the slice's end is fewer than k rows away
    val lagIdx = (size(col("__prevTail")) - (lit(k.toLong) - col("__lrn"))).cast("int")
    val lagBoundary = when(lagIdx >= 1, element_at(col("__prevTail"), lagIdx))
    val leadIdx = (col("__lrn") - col("__an") + lit(k.toLong)).cast("int")
    val leadBoundary = when(leadIdx <= size(col("__nextHead")),
      element_at(col("__nextHead"), leadIdx))
    joined.select(
      schema.fieldNames.map(local(_)) ++ Seq(
        when(col("__lrn") > k, col("__llag")).otherwise(lagBoundary).as(s"lag$k"),
        when(col("__lrn") <= col("__an") - k, col("__llead"))
          .otherwise(leadBoundary).as(s"lead$k")): _*)
  }

  /** `df` + (`rnk`, `drnk`, `rn`, ntile column named `ntileCol`) over
    * `PARTITION BY partCols ORDER BY order` — order entries are
    * (column name, ascending?).
    */
  def partitionedRanks(df: DataFrame, partCols: Seq[String],
      order: Seq[(String, Boolean)], ntileN: Int,
      ntileCol: String = "ntile"): DataFrame = {
    require(partCols.nonEmpty && order.nonEmpty && ntileN >= 1,
      "need partition cols, order cols, ntileN >= 1")
    val reserved = Set("__pid", "__lrn", "__lrk", "__ldr", "rnk", "drnk", "rn", ntileCol)
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty,
      s"input columns collide with partitionedRanks' internals/outputs: ${clash.mkString(", ")}")
    if (routesToBuiltin(df)) {
      val w = builtinW(partCols, order)
      return df.select(df.columns.map(col) ++ Seq(
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        row_number().over(w).cast("long").as("rn"),
        ntile(ntileN).over(w).cast("long").as(ntileCol)): _*)
    }
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val sortCols = partCols.map(col) ++ order.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc
    }
    val keyStruct = struct(order.zipWithIndex.map { case ((c, _), i) =>
      col(c).as(s"_k$i") }: _*)

    // slice assignment + local window, all codegen; one computation
    // shared by the stats pass and the output pass (the checkpoint
    // hides this fragment from the output plan, so the PlanShapeSpec
    // gate inspects it via [[slicedLocalRanks]] directly)
    val local = slicedLocalRanks(df, partCols, order, np).localCheckpoint(false)

    // ---- per-(slice, group) boundary stats: one agg, tiny result ----
    val statRows: Array[Row] = local.groupBy((col("__pid") +: partCols.map(col)): _*)
      .agg(
        count(lit(1)).as("__n"),
        max(col("__ldr")).as("__nd"),
        min_by(keyStruct, col("__lrn")).as("__firstKey"),
        max_by(keyStruct, col("__lrn")).as("__lastKey"),
        max(col("__lrk")).as("__lrkLast"))
      .collect() // bounded: slices x groups rows, never data

    // ---- driver fold: per-slice offsets in slice order, per group ----
    case class Stat(pid: Int, part: Seq[Any], n: Long, nd: Long,
        firstKey: Row, lastKey: Row, cntLast: Long)
    val stats = statRows.map { r =>
      val part = (1 to partCols.size).map(r.get)
      val base = 1 + partCols.size
      Stat(r.getInt(0), part, r.getLong(base), r.getLong(base + 1),
        r.getStruct(base + 2), r.getStruct(base + 3),
        r.getLong(base) - r.getLong(base + 4) + 1)
    }
    case class Adj(pid: Int, part: Seq[Any], cumRows: Long, cumDist: Long,
        contTie: Boolean, tieStart: Long, firstKey: Row, total: Long)
    val adjs = scala.collection.mutable.ArrayBuffer.empty[Adj]
    stats.groupBy(_.part).foreach { case (part, rows) =>
      val ordered = rows.sortBy(_.pid)
      val total = ordered.map(_.n).sum
      var cumRows = 0L
      var cumDist = 0L
      var lastKey: Row = null
      var tieStart = 0L
      ordered.foreach { s =>
        val contTie = lastKey != null && s.firstKey == lastKey
        adjs += Adj(s.pid, part, cumRows, cumDist, contTie, tieStart,
          s.firstKey, total)
        tieStart =
          if (contTie && s.firstKey == s.lastKey) tieStart // one continuing tie
          else cumRows + (s.n - s.cntLast) + 1 // global rank of lastKey's first row
        cumDist += s.nd - (if (contTie) 1L else 0L)
        cumRows += s.n
        lastKey = s.lastKey
      }
    }

    // ---- offset table as a broadcast relation, null-safe join ----
    val schema = df.schema
    val pIdx = partCols.map(schema.fieldIndex)
    val oIdx = order.map(o => schema.fieldIndex(o._1))
    val keyType = StructType(oIdx.map(i => schema.fields(i))
      .zipWithIndex.map { case (f, i) => StructField(s"_k$i", f.dataType, f.nullable) })
    val adjSchema = StructType(
      Seq(StructField("__apid", IntegerType, nullable = false)) ++
        pIdx.map(i => schema.fields(i)).zipWithIndex.map { case (f, i) =>
          StructField(s"__p$i", f.dataType, f.nullable) } ++
        Seq(
          StructField("__cumRows", LongType, nullable = false),
          StructField("__cumDist", LongType, nullable = false),
          StructField("__contTie", BooleanType, nullable = false),
          StructField("__tieStart", LongType, nullable = false),
          StructField("__firstKey", keyType, nullable = true),
          StructField("__total", LongType, nullable = false)))
    val adjRows = new java.util.ArrayList[Row]()
    adjs.foreach { a =>
      adjRows.add(Row.fromSeq(
        Seq(a.pid) ++ a.part ++ Seq(a.cumRows, a.cumDist, a.contTie,
          a.tieStart, a.firstKey, a.total)))
    }
    val adjDf = spark.createDataFrame(adjRows, adjSchema)
    val joinCond = (local("__pid") === adjDf("__apid")) && partCols.zipWithIndex
      .map { case (c, i) => local(c) <=> adjDf(s"__p$i") }
      .reduce(_ && _)
    val joined = local.join(broadcast(adjDf), joinCond)
    val isCont = col("__contTie") && (keyStruct <=> col("__firstKey"))
    val rnG = col("__cumRows") + col("__lrn")
    // ntile(q) over group total N: the first N % q tiles take
    // ceil(N/q) rows, the rest floor(N/q) — from the global row number
    val q = lit(ntileN.toLong)
    val kfl = floor(col("__total") / q)
    val m = col("__total") % q
    val tile = when(rnG <= m * (kfl + 1), ceil(rnG / (kfl + 1)))
      .otherwise(m + ceil((rnG - m * (kfl + 1)) / kfl))
    joined.select(
      schema.fieldNames.map(local(_)) ++ Seq(
        when(isCont, col("__tieStart")).otherwise(col("__cumRows") + col("__lrk"))
          .cast("long").as("rnk"),
        (col("__cumDist") + col("__ldr") -
          when(col("__contTie"), lit(1L)).otherwise(lit(0L))).cast("long").as("drnk"),
        rnG.cast("long").as("rn"),
        tile.cast("long").as(ntileCol)): _*)
  }

  /** Distribution windows (`percent_rank`/`cume_dist`/`ntile`) over a
    * low-cardinality partition key at full shuffle width — the third
    * face of the skew trap ([[partitionedRanks]] ranking,
    * [[partitionedRunning]] running aggregates). Returns `df` +
    * (`rnk`, `rn`, ntile column, `pct_rank`, `cume_dist`).
    *
    * `percent_rank = (rank − 1) / (N − 1)` (0 when N = 1) needs only
    * the global rank. `cume_dist` is the LAST-peer position over N —
    * computed from a REVERSE-direction rank: peers are the same set
    * under both orders, so `last-peer position = N − rank_rev + 1` for
    * any preorder (null peers included), and
    * `cume_dist = (N − rank_rev + 1) / N`. Both numerators are exact
    * integers folded from per-slice boundary stats (the forward fold
    * is [[partitionedRanks]]'s; the reverse fold is its mirror —
    * slices walked in descending order with first/last keys swapped),
    * with ONE double division at the end — bit-identical to the
    * built-in window's output, no rounding tolerance needed. The
    * reverse local rank costs a second in-partition sort of each
    * (slice, group) — still np × groups balanced partitions, never a
    * per-key cluster.
    */
  def partitionedDistribution(df: DataFrame, partCols: Seq[String],
      order: Seq[(String, Boolean)], ntileN: Int,
      ntileCol: String = "ntile"): DataFrame = {
    require(partCols.nonEmpty && order.nonEmpty && ntileN >= 1,
      "need partition cols, order cols, ntileN >= 1")
    val reserved = Set("__pid", "__lrn", "__lrk", "__ldr", "__lrkR",
      "rnk", "rn", "pct_rank", "cume_dist", ntileCol)
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty,
      s"input columns collide with partitionedDistribution's internals/outputs: ${clash.mkString(", ")}")
    if (routesToBuiltin(df)) {
      val w = builtinW(partCols, order)
      return df.select(df.columns.map(col) ++ Seq(
        rank().over(w).cast("long").as("rnk"),
        row_number().over(w).cast("long").as("rn"),
        ntile(ntileN).over(w).cast("long").as(ntileCol),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume_dist")): _*)
    }
    val spark = df.sparkSession
    val np = spark.sessionState.conf.numShufflePartitions
    val keyStruct = struct(order.zipWithIndex.map { case ((c, _), i) =>
      col(c).as(s"_k$i") }: _*)
    val local = slicedLocalRanks(df, partCols, order, np, withReverse = true)
      .localCheckpoint(false)

    // ---- per-(slice, group) boundary stats (one agg, tiny result):
    // trailing-tie size n − max(lrk) + 1 feeds the forward fold,
    // LEADING-tie size n − max(lrkR) + 1 the reverse one
    val statRows: Array[Row] = local.groupBy((col("__pid") +: partCols.map(col)): _*)
      .agg(
        count(lit(1)).as("__n"),
        min_by(keyStruct, col("__lrn")).as("__firstKey"),
        max_by(keyStruct, col("__lrn")).as("__lastKey"),
        max(col("__lrk")).as("__lrkLast"),
        max(col("__lrkR")).as("__lrkRLast"))
      .collect() // bounded: slices x groups rows, never data

    case class Stat(pid: Int, part: Seq[Any], n: Long, firstKey: Row,
        lastKey: Row, cntLast: Long, cntFirst: Long)
    val stats = statRows.map { r =>
      val base = 1 + partCols.size
      val n = r.getLong(base)
      Stat(r.getInt(0), (1 to partCols.size).map(r.get), n,
        r.getStruct(base + 1), r.getStruct(base + 2),
        n - r.getLong(base + 3) + 1, n - r.getLong(base + 4) + 1)
    }
    case class Adj(pid: Int, part: Seq[Any], cumRows: Long, contTie: Boolean,
        tieStart: Long, firstKey: Row, cumRowsR: Long, contTieR: Boolean,
        tieStartR: Long, lastKey: Row, total: Long)
    val adjs = scala.collection.mutable.ArrayBuffer.empty[Adj]
    stats.groupBy(_.part).foreach { case (part, rows) =>
      val ordered = rows.sortBy(_.pid)
      val total = ordered.map(_.n).sum
      // forward fold — [[partitionedRanks]]'s, minus dense-rank
      var cumRows = 0L; var lastKey: Row = null; var tieStart = 0L
      val fwd = ordered.map { s =>
        val contTie = lastKey != null && s.firstKey == lastKey
        val a = (s.pid, cumRows, contTie, tieStart)
        tieStart =
          if (contTie && s.firstKey == s.lastKey) tieStart
          else cumRows + (s.n - s.cntLast) + 1
        cumRows += s.n; lastKey = s.lastKey
        a
      }
      // reverse fold — the mirror: slices in DESCENDING pid order, the
      // key that may straddle backwards is the slice's forward
      // firstKey (= reverse-direction last key)
      var cumRowsR = 0L; var lastKeyR: Row = null; var tieStartR = 0L
      val rev = ordered.reverse.map { s =>
        val contTieR = lastKeyR != null && s.lastKey == lastKeyR
        val a = (s.pid, cumRowsR, contTieR, tieStartR)
        tieStartR =
          if (contTieR && s.firstKey == s.lastKey) tieStartR
          else cumRowsR + (s.n - s.cntFirst) + 1
        cumRowsR += s.n; lastKeyR = s.firstKey
        a
      }.map(a => a._1 -> a).toMap
      ordered.zip(fwd).foreach { case (s, (pid, cr, ct, ts)) =>
        val (_, crR, ctR, tsR) = rev(pid)
        adjs += Adj(pid, part, cr, ct, ts, s.firstKey, crR, ctR, tsR,
          s.lastKey, total)
      }
    }

    // ---- offset table as a broadcast relation, null-safe join ----
    val schema = df.schema
    val pIdx = partCols.map(schema.fieldIndex)
    val oIdx = order.map(o => schema.fieldIndex(o._1))
    val keyType = StructType(oIdx.map(i => schema.fields(i))
      .zipWithIndex.map { case (f, i) => StructField(s"_k$i", f.dataType, f.nullable) })
    val adjSchema = StructType(
      Seq(StructField("__apid", IntegerType, nullable = false)) ++
        pIdx.map(i => schema.fields(i)).zipWithIndex.map { case (f, i) =>
          StructField(s"__p$i", f.dataType, f.nullable) } ++
        Seq(
          StructField("__cumRows", LongType, nullable = false),
          StructField("__contTie", BooleanType, nullable = false),
          StructField("__tieStart", LongType, nullable = false),
          StructField("__firstKey", keyType, nullable = true),
          StructField("__cumRowsR", LongType, nullable = false),
          StructField("__contTieR", BooleanType, nullable = false),
          StructField("__tieStartR", LongType, nullable = false),
          StructField("__lastKey", keyType, nullable = true),
          StructField("__total", LongType, nullable = false)))
    val adjRows = new java.util.ArrayList[Row]()
    adjs.foreach { a =>
      adjRows.add(Row.fromSeq(
        Seq(a.pid) ++ a.part ++ Seq(a.cumRows, a.contTie, a.tieStart,
          a.firstKey, a.cumRowsR, a.contTieR, a.tieStartR, a.lastKey, a.total)))
    }
    val adjDf = spark.createDataFrame(adjRows, adjSchema)
    val joinCond = (local("__pid") === adjDf("__apid")) && partCols.zipWithIndex
      .map { case (c, i) => local(c) <=> adjDf(s"__p$i") }
      .reduce(_ && _)
    val joined = local.join(broadcast(adjDf), joinCond)
    val rnk = when(col("__contTie") && (keyStruct <=> col("__firstKey")),
      col("__tieStart")).otherwise(col("__cumRows") + col("__lrk"))
    val rnkR = when(col("__contTieR") && (keyStruct <=> col("__lastKey")),
      col("__tieStartR")).otherwise(col("__cumRowsR") + col("__lrkR"))
    val rnG = col("__cumRows") + col("__lrn")
    val q = lit(ntileN.toLong)
    val kfl = floor(col("__total") / q)
    val m = col("__total") % q
    val tile = when(rnG <= m * (kfl + 1), ceil(rnG / (kfl + 1)))
      .otherwise(m + ceil((rnG - m * (kfl + 1)) / kfl))
    joined.select(
      schema.fieldNames.map(local(_)) ++ Seq(
        rnk.cast("long").as("rnk"),
        rnG.cast("long").as("rn"),
        tile.cast("long").as(ntileCol),
        when(col("__total") === 1L, lit(0.0))
          .otherwise((rnk - 1L).cast("double") / (col("__total") - 1L))
          .as("pct_rank"),
        ((col("__total") - rnkR + 1L).cast("double") / col("__total"))
          .as("cume_dist")): _*)
  }
}
