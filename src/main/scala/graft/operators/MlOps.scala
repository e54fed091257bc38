package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based corpus quality filtering — the classifier stage of the
  * standard LLM data pipeline (a linear model scores every document;
  * low scorers drop). Production pipelines label with curated reference
  * corpora; here the weak labels distill the deterministic d02 heuristic
  * so the whole stage is self-contained and reproducible, and the
  * holdout AUC gate proves the plumbing learns (AccuracySpec).
  *
  * Scale shape: feature extraction is the fused per-row kernels
  * (TextStats / RepetitionStats / ByteHistogram) — scan speed, zero
  * shuffle; Spark ML's logistic regression trains by treeAggregate
  * (model-sized gradient partials reach the driver, the corpus never
  * moves); scoring broadcasts the coefficient vector back as a per-row
  * transform. Train/holdout split is the stable md5 hash — reproducible
  * across engines, partitionings and retries, like every sampling
  * decision in this engine.
  */
object MlOps {

  /** Holdout AUC in the Mann-Whitney rank-sum form, O(n log n):
    * AUC = (R⁺ − P(P+1)/2) / (P·N) with AVERAGE ranks over tied
    * scores — provably equal to the pairwise ties-count-half
    * definition (each tied positive/negative pair contributes exactly
    * ½ through the averaged rank; the unit spec pins the equality on
    * tie-heavy samples), without the n² sweep that melts a driver at
    * the d37 guard's 100k bound. Input: (label ∈ {0,1}, score) pairs.
    * Degenerate one-class inputs return 0.0 (nothing to rank against).
    */
  def aucRankSum(pairs: Array[(Int, Double)]): Double = {
    val pos = pairs.count(_._1 == 1).toLong
    val neg = pairs.length - pos
    if (pos == 0 || neg == 0) return 0.0
    val sorted = pairs.sortBy(_._2)
    var rPos = 0.0
    var i = 0
    while (i < sorted.length) {
      // j starts PAST i so the outer loop always advances: a NaN score
      // (NaN == NaN is false) becomes a singleton tie block instead of
      // pinning j == i forever. Scores are sigmoid-finite in d37, but
      // the guard must not depend on that precondition.
      var j = i + 1
      while (j < sorted.length && sorted(j)._2 == sorted(i)._2) j += 1
      val avgRank = (i + 1 + j) / 2.0 // mean of 1-based ranks i+1..j
      var k = i
      while (k < j) { if (sorted(k)._1 == 1) rPos += avgRank; k += 1 }
      i = j
    }
    (rPos - pos * (pos + 1) / 2.0) / (pos.toDouble * neg)
  }

  /** Per-document feature vector from the fused text kernels:
    * token count (log-scaled), stopword ratio, unique-token ratio,
    * top-bigram share, byte entropy, mean token length.
    */
  def qualityFeatures(textCol: Column): Column = {
    val st = graft.functions.TextStatsExpression.textStats(textCol,
      TextOps.DefaultStopwords)
    val rep = graft.functions.NgramExpressions.repetitionStats(textCol)
    val nTok = st.getField("n_tokens").cast("double")
    array(
      log(nTok + 1.0),
      st.getField("n_stop").cast("double") / greatest(nTok, lit(1.0)),
      rep.getField("n_unique").cast("double") / greatest(nTok, lit(1.0)),
      coalesce(rep.getField("top_bigram_n").cast("double"), lit(0.0))
        / greatest(nTok - 1.0, lit(1.0)),
      coalesce(TextOps.byteEntropy(textCol), lit(0.0)),
      st.getField("n_chars_nospace").cast("double") / greatest(nTok, lit(1.0)))
  }

  /** Train on a stable-hash split with weak labels (heuristic quality ≥
    * `labelThreshold` — the default sits at the fixture corpus's median
    * score, so classes stay balanced), score EVERY document. Output: (idCol, is_train,
    * weak_label, p_good). Deterministic given the fixed `maxIter` and
    * input partitioning (L-BFGS partials combine in partition order).
    */
  def scoreQuality(docs: DataFrame, idCol: String, textCol: String,
      labelThreshold: Double = 0.74, trainFraction: Int = 70,
      maxIter: Int = 20): DataFrame = {
    val feats = featureFrame(docs, idCol, textCol, labelThreshold, trainFraction)
    scoreWith(trainQuality(feats, maxIter), feats, idCol)
  }

  /** The labeled feature frame both halves share. */
  def featureFrame(docs: DataFrame, idCol: String, textCol: String,
      labelThreshold: Double = 0.74, trainFraction: Int = 70): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    docs
      .filter(col(textCol).isNotNull && length(trim(col(textCol))) > 0)
      .select(col(idCol),
        qualityFeatures(col(textCol)).as("__arr"),
        (TextOps.qualityScore(col(textCol)) >= labelThreshold)
          .cast("double").as("weak_label"),
        (pmod(DedupOps.md5Hash32(col(idCol).cast("string"), "mlsplit"), lit(100))
          < trainFraction).as("is_train"))
      .withColumn("features", array_to_vector(col("__arr")))
  }

  /** Fit the classifier on the train split — train once, score many
    * batches (the model is driver-resident and broadcast at scoring).
    */
  def trainQuality(feats: DataFrame, maxIter: Int = 20)
      : org.apache.spark.ml.classification.LogisticRegressionModel = {
    import org.apache.spark.ml.classification.LogisticRegression
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(0.01)
      .setLabelCol("weak_label").setFeaturesCol("features")
      .fit(feats.filter(col("is_train")))
  }

  /** Score a (possibly different) batch with a fitted model. */
  def scoreWith(model: org.apache.spark.ml.classification.LogisticRegressionModel,
      feats: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    model.transform(feats)
      .select(col(idCol), col("is_train"), col("weak_label").cast("int").as("weak_label"),
        element_at(vector_to_array(col("probability")), 2).as("p_good"))
  }

  /** Operating-point sweep for a "keep if score ≥ t" filter: one
    * precision/recall/F1 row per candidate threshold — the curve an
    * operator reads to CHOOSE the quality-filter cutoff (the step
    * between training a classifier, d37, and deploying it, d32).
    *
    * Scale shape: the corpus collapses to per-threshold-bucket
    * (positives, negatives) counts first — one aggregation with map-side
    * combine on at most `10^decimals + 1` keys — and only then do the
    * descending-cumulative windows run, over that BUCKET-sized frame.
    * The single-partition window is deliberate and safe: its input is
    * the bucket table (≤101 rows at the default 2 decimals), never the
    * corpus — the same model-sized-window discipline as d50's fusion.
    * Output per bucket `thr` (scores rounded to `decimals`): `tp`/`fp`
    * = kept true/false positives at cutoff `thr`, `fn` = positives
    * lost, precision/recall/f1 rounded to 4.
    */
  def thresholdSweep(scored: DataFrame, scoreCol: String, labelCol: String,
      decimals: Int = 2): DataFrame =
    sweepFromBuckets(scored
      .groupBy(graft.queries.Qf.dround(col(scoreCol), decimals).as("thr"))
      .agg(sum(col(labelCol).cast("long")).as("__pos"),
        (count(lit(1)) - sum(col(labelCol).cast("long"))).as("__neg")))

  /** Reliability diagram + expected calibration error (Naeini et al.
    * 2015 / Guo et al. 2017) — the companion readout to
    * [[thresholdSweep]]: a sweep picks the operating point, this says
    * whether the scores can be TRUSTED as probabilities (a quality
    * classifier that says 0.9 but is right 60% of the time poisons any
    * downstream budget math that treats scores as admission
    * probabilities). Equal-width bins over [0,1] (score 1.0 folds into
    * the top bin, the standard convention); per bin: count, mean
    * confidence, observed accuracy, |acc − conf| gap; every row also
    * carries ECE = Σ (n_b/N)·gap_b.
    *
    * Scale shape: the corpus collapses to ≤ `bins` rows in ONE
    * aggregation with map-side combine; the ECE total attaches by
    * broadcasting the 1-row sum over the bin table — no windows, no
    * second corpus pass. Bin counts and sums are additive, so the same
    * shape maintains incrementally at rest (the d63 bucket-ledger
    * regime). Gap/ECE derive from the ROUNDED per-bin columns, making
    * the numbers replayable cross-engine.
    *
    * Domain: scores are probabilities in [0,1]. A score above 1 folds
    * into the top bin by the same `least` that folds 1.0 — visible, not
    * silent, because that bin's `conf` (the mean RAW score) then
    * exceeds 1; a negative score lands in a negative bin id, equally
    * visible. Clamp or fix the scorer upstream.
    */
  def calibrationBins(scored: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10, decimals: Int = 4): DataFrame = {
    require(bins >= 1, "bins must be >= 1")
    val bin = least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("int")
    val perBin = scored
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        graft.queries.Qf.dround(avg(col(scoreCol)), decimals).as("conf"),
        graft.queries.Qf.dround(avg(col(labelCol).cast("double")), decimals)
          .as("acc"))
      .withColumn("gap",
        graft.queries.Qf.dround(abs(col("acc") - col("conf")), decimals))
    val ece = perBin.agg(
      graft.queries.Qf.dround(
        sum(col("n") * col("gap")) / sum(col("n")), decimals).as("ece"))
    perBin.crossJoin(broadcast(ece))
  }

  /** The curve from already-maintained per-bucket counts `(thr, __pos,
    * __neg)` — the INCREMENTAL entry point: bucket counts are additive,
    * so an ingest loop keeps them at rest (the d41 stats-ledger regime,
    * one ≤101-row generation per advance) and re-derives the whole
    * operating-point curve in O(buckets) on demand, never rescanning
    * the corpus. Streaming parity is pinned in EventStreamsSpec:
    * summing per-micro-batch bucket counts and sweeping equals the
    * one-shot batch sweep. Duplicate `thr` rows (e.g. one per batch)
    * are merged here, so callers can feed the raw accreted ledger.
    */
  def sweepFromBuckets(bucketCounts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = bucketCounts.groupBy(col("thr"))
      .agg(sum(col("__pos")).as("__pos"), sum(col("__neg")).as("__neg"))
    val desc = Window.orderBy(col("thr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.orderBy(col("thr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = buckets.select(col("thr"),
      sum(col("__pos")).over(desc).as("tp"),
      sum(col("__neg")).over(desc).as("fp"),
      (sum(col("__pos")).over(whole) - sum(col("__pos")).over(desc)).as("fn"))
    val p = col("tp").cast("double") / (col("tp") + col("fp"))
    val r = col("tp").cast("double") / (col("tp") + col("fn"))
    // tp+fp ≥ 1 by construction (the cumulative frame contains its own
    // non-empty bucket), so precision is always defined; f1's 0/0 at
    // tp = 0 is pinned to 0 explicitly — engines disagree on double
    // division by zero, a hash-match must not depend on it.
    cum.select(col("thr"), col("tp"), col("fp"), col("fn"),
      graft.queries.Qf.dround(p, 4).as("precision"),
      graft.queries.Qf.dround(r, 4).as("recall"),
      graft.queries.Qf.dround(
        when(col("tp") === 0, lit(0.0)).otherwise(lit(2.0) * p * r / (p + r)), 4).as("f1"))
  }
}
