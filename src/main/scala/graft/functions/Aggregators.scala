package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (`Aggregator[IN, BUF, OUT]`) — the engine's
  * user-defined-aggregate extension point (the reference's host engine
  * exposes the analogous DuckDB aggregate-function API; SURVEY §2.C).
  *
  * Aggregators merge partial buffers map-side like built-ins, so they
  * scale the same way: the shuffle carries one small buffer per
  * (partition, group), never rows.
  */
object Aggregators {

  /** Weighted mean: sum(x·w)/sum(w) with null-safe inputs. */
  final case class WSum(var sum: Double, var wsum: Double)

  object WeightedMean extends Aggregator[(Double, Double), WSum, Double] {
    override def zero: WSum = WSum(0.0, 0.0)
    override def reduce(b: WSum, a: (Double, Double)): WSum = {
      b.sum += a._1 * a._2; b.wsum += a._2; b
    }
    override def merge(x: WSum, y: WSum): WSum = {
      x.sum += y.sum; x.wsum += y.wsum; x
    }
    override def finish(r: WSum): Double = if (r.wsum == 0.0) Double.NaN else r.sum / r.wsum
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form usable in untyped `agg(...)`. */
  def weightedMean(x: Column, w: Column): Column =
    udaf(WeightedMean).apply(x, w)

  /** Bounded top-k-per-group: the aggregate that replaces the
    * `row_number() OVER (PARTITION BY g ORDER BY score) <= k` window for
    * per-group rankings. The window form SORTS every group's full row
    * set (O(n log n) per group, whole-group spill); this buffer never
    * holds more than k (score, id) pairs, partial-aggregates map-side,
    * and the shuffle carries one ≤k-element buffer per (partition,
    * group) — the per-group analog of `TakeOrderedAndProject`.
    *
    * Ordering: best-first by score (`asc` false ⇒ higher is better),
    * ties broken by id ascending — identical to the window form's
    * `orderBy(score.desc, id)` so results are drop-in row-equal
    * (pinned by test).
    */
  final case class ScoredId(score: Double, id: Long)
  final case class TopKBuf(var items: List[ScoredId])

  final class TopKByScore(k: Int, asc: Boolean)
      extends Aggregator[ScoredId, TopKBuf, TopKBuf] {
    require(k >= 1, "k must be >= 1")
    private def better(a: ScoredId, b: ScoredId): Boolean = {
      // Spark's double ordering (SQLOrderingUtil.compareDoubles): NaN
      // sorts ABOVE +Infinity and -0.0 ties 0.0. Raw </> would treat NaN
      // as worse than everything (all comparisons false) and diverge
      // from the row_number window this aggregate is row-equal to.
      val c = if (a.score == b.score) 0 else java.lang.Double.compare(a.score, b.score)
      if (c != 0) { if (asc) c < 0 else c > 0 }
      else a.id < b.id
    }

    private def insert(items: List[ScoredId], x: ScoredId): List[ScoredId] = {
      // items kept best-first; worst element is last — O(k) insert with
      // an O(1) reject of rows worse than a full buffer's tail
      if (items.lengthCompare(k) >= 0 && better(items.last, x)) items
      else {
        val (pre, post) = items.span(better(_, x))
        (pre ::: (x :: post)).take(k)
      }
    }

    override def zero: TopKBuf = TopKBuf(Nil)
    override def reduce(b: TopKBuf, a: ScoredId): TopKBuf = {
      b.items = insert(b.items, a); b
    }
    override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
      x.items = y.items.foldLeft(x.items)(insert); x
    }
    override def finish(r: TopKBuf): TopKBuf = r
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  final case class ScoredSid(score: Double, id: String)
  final case class TopKSBuf(var items: List[ScoredSid])

  /** [[TopKByScore]] for STRING ids (tokens, urls, hosts). Ties compare
    * ids in UTF-8 BINARY order — `UTF8String`'s, the order the
    * row-equal window's `order by id` uses — not Java's UTF-16
    * code-unit order, which diverges on astral-plane characters.
    */
  final class TopKByScoreS(k: Int, asc: Boolean)
      extends Aggregator[ScoredSid, TopKSBuf, TopKSBuf] {
    require(k >= 1, "k must be >= 1")
    private def better(a: ScoredSid, b: ScoredSid): Boolean = {
      val c = if (a.score == b.score) 0 else java.lang.Double.compare(a.score, b.score)
      if (c != 0) { if (asc) c < 0 else c > 0 }
      else org.apache.spark.unsafe.types.UTF8String.fromString(a.id)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b.id)) < 0
    }
    private def insert(items: List[ScoredSid], x: ScoredSid): List[ScoredSid] = {
      if (items.lengthCompare(k) >= 0 && better(items.last, x)) items
      else {
        val (pre, post) = items.span(better(_, x))
        (pre ::: (x :: post)).take(k)
      }
    }
    override def zero: TopKSBuf = TopKSBuf(Nil)
    override def reduce(b: TopKSBuf, a: ScoredSid): TopKSBuf = {
      b.items = insert(b.items, a); b
    }
    override def merge(x: TopKSBuf, y: TopKSBuf): TopKSBuf = {
      x.items = y.items.foldLeft(x.items)(insert); x
    }
    override def finish(r: TopKSBuf): TopKSBuf = r
    override def bufferEncoder: Encoder[TopKSBuf] = Encoders.product[TopKSBuf]
    override def outputEncoder: Encoder[TopKSBuf] = Encoders.product[TopKSBuf]
  }

  /** [[topKByScore]] with string ids. */
  def topKByScoreStr(k: Int, asc: Boolean)(score: Column, id: Column): Column =
    udaf(new TopKByScoreS(k, asc)).apply(score, id).getField("items")

  /** `topKByScore(k, asc)(score, id)` → struct with an
    * `items: array<struct<score, id>>` field, best-first. Explode
    * `.getField("items")` + posexplode for (rank, id) rows.
    */
  def topKByScore(k: Int, asc: Boolean)(score: Column, id: Column): Column =
    udaf(new TopKByScore(k, asc)).apply(score, id).getField("items")

  /** Register for SQL: `SELECT weighted_mean(x, w)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("weighted_mean", udaf(WeightedMean))
}
