package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines.
  *
  * All of these are pure `Column` expressions built from codegen'd
  * built-ins — they stay inside WholeStageCodegen, shuffle nothing, and
  * scale embarrassingly (per-row, no state). At 100 TB these run at scan
  * speed; the only cluster concern is upstream partition sizing.
  */
object TextOps {

  /** Whitespace tokens of a (already single-spaced) document. */
  def tokens(text: Column): Column = split(trim(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("int")

  /** Tiny default stopword list used by the quality/language heuristics. */
  val DefaultStopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "is")

  def stopwordCount(text: Column, stopwords: Seq[String] = DefaultStopwords): Column = {
    val stopArr = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(stopArr, t))).cast("int")
  }

  /** Fraction of tokens that are stopwords (0 when empty). */
  def stopwordRatio(text: Column, stopwords: Seq[String] = DefaultStopwords): Column =
    stopwordCount(text, stopwords) / tokenCount(text)

  /** Heuristic quality score in [0,1]: rewards natural stopword density
    * and document length. Deliberately simple + deterministic (oracle-
    * checkable); swap in a model-based scorer via the same Column shape.
    */
  def qualityScore(text: Column): Column =
    lit(0.5) * (lit(1.0) - stopwordRatio(text)) +
      lit(0.5) * least(lit(1.0), tokenCount(text) / lit(100.0))

  /** n-gram-free language-ID heuristic: stopword hits per language.
    * Production systems use char-n-gram profiles; the operator shape
    * (per-row scalar over the token array) is identical.
    */
  def langIdHeuristic(text: Column): Column = {
    val hits = stopwordCount(text)
    when(hits >= 3, "en").when(hits >= 1, "en_maybe").otherwise("und")
  }

  /** Normalized-content fingerprint: md5 over lowercased, space-collapsed
    * text. Identical fingerprints ⇒ exact near-duplicate after
    * normalization (casing/whitespace-insensitive dedup key).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), " +", " "))

  /** Average token length (chars) — a cheap quality signal. */
  def avgTokenLength(text: Column): Column =
    length(regexp_replace(text, " ", "")) / size(tokens(text))
}
