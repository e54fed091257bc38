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
}
