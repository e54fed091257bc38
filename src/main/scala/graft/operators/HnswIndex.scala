package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HNSW graph ANN (Malkov & Yashunin 2016) — the industry-default
  * navigable-small-world family, completing the ANN portfolio next to
  * LSH (s02), IVF (s04), PQ (s07), IVFPQ (s08), SQ8 (s13) and MRL
  * (s15).
  *
  * Spark shape — per-partition graphs, NOT one global graph: a graph
  * whose inserts mutate shared neighbor lists cannot build as a
  * distributed fold, so each input partition builds its own in-memory
  * HNSW over the vectors it holds (the standard sharded-HNSW serving
  * architecture), a probe broadcasts the query set, every shard
  * answers with its local graph-searched top-k, and a bounded-heap
  * global merge keeps the best k — recall can only be HIGHER than a
  * single graph of the same parameters, because the union of shard
  * searches explores more of the corpus, at the cost of
  * shards × ef distance evaluations per query. At 1000 executors the
  * probe is one broadcast + one model-sized (queries × k × shards)
  * shuffle; graph memory is O(rows_per_partition · M) per executor.
  *
  * Determinism (the ledger/replay discipline every approximate
  * operator here follows): HNSW's level assignment is the only random
  * choice — it is derived from a 64-bit avalanche hash of the vector
  * id instead of an RNG, so the same rows in the same partitions build
  * byte-identical graphs and a re-run answers identically. Neighbor
  * selection is plain nearest-M (Algorithm 3 of the paper; the
  * diversity heuristic of Algorithm 4 is a recall refinement, not a
  * correctness requirement — the AccuracySpec gate measures what this
  * choice delivers).
  */
final class HnswGraph(M: Int, efConstruction: Int) {
  require(M >= 2 && M <= 64, s"M must be in [2, 64], got $M")
  require(efConstruction >= M, s"efConstruction must be >= M")

  private val mMax0 = 2 * M // level-0 lists are 2M wide, per the paper
  private val mL = 1.0 / math.log(M.toDouble)

  private val ids = new scala.collection.mutable.ArrayBuffer[Long]()
  private val vecs = new scala.collection.mutable.ArrayBuffer[Array[Float]]()
  private val norms = new scala.collection.mutable.ArrayBuffer[Double]()
  // neighbors(node)(level) = growable int list
  private val nbrs =
    new scala.collection.mutable.ArrayBuffer[Array[scala.collection.mutable.ArrayBuffer[Int]]]()
  private var entry: Int = -1
  private var topLevel: Int = -1
  // vector dimensionality, pinned by the first insert: a malformed
  // embedding must fail LOUDLY here, not silently score a truncated
  // dot product as a plausible-but-wrong distance (the repo's
  // fail-loud discipline)
  private var dim: Int = -1

  def size: Int = ids.length

  /** Deterministic "random" level: avalanche-hash the id to a uniform
    * in (0, 1), then the paper's floor(-ln(u)·mL).
    */
  private def levelOf(id: Long): Int = {
    var h = id
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    val u = ((h >>> 11).toDouble + 1.0) / 9007199254740993.0 // (0, 1]
    math.min((-math.log(u) * mL).toInt, 30)
  }

  /** Cosine DISTANCE (1 − cos); zero-norm vectors sit at distance 1. */
  private def dist(q: Array[Float], qNorm: Double, node: Int): Double = {
    val v = vecs(node)
    var dot = 0.0
    var i = 0
    // equal lengths are guaranteed by the insert/search dim gates
    val n = q.length
    while (i < n) { dot += q(i).toDouble * v(i).toDouble; i += 1 }
    val denom = qNorm * norms(node)
    if (denom == 0.0) 1.0 else 1.0 - dot / denom
  }

  private def vecNorm(v: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  /** Greedy single-step descent at one level: move to the closest
    * neighbor until no improvement.
    */
  private def greedy(q: Array[Float], qNorm: Double, start: Int, level: Int): Int = {
    var cur = start
    var curD = dist(q, qNorm, cur)
    var improved = true
    while (improved) {
      improved = false
      val ns = nbrs(cur)(level)
      var i = 0
      while (i < ns.length) {
        val d = dist(q, qNorm, ns(i))
        if (d < curD || (d == curD && ns(i) < cur)) {
          cur = ns(i); curD = d; improved = true
        }
        i += 1
      }
    }
    cur
  }

  /** Beam search at one level (Algorithm 2): returns up to `ef` nodes
    * ordered by (distance, insertion index) — the deterministic
    * tie-break.
    */
  private def searchLayer(q: Array[Float], qNorm: Double, start: Int,
      level: Int, ef: Int): Array[(Double, Int)] = {
    val visited = new java.util.HashSet[Integer]()
    val ordD = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
    // candidates: nearest-first; results: farthest-first (bounded ef)
    val cand = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ordD.reverse)
    val res = scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ordD)
    val d0 = dist(q, qNorm, start)
    visited.add(start)
    cand.enqueue((d0, start))
    res.enqueue((d0, start))
    while (cand.nonEmpty) {
      val (cd, c) = cand.dequeue()
      if (cd > res.head._1 && res.size >= ef) {
        cand.clear() // nearest candidate is worse than the worst kept: done
      } else {
        val ns = nbrs(c)(level)
        var i = 0
        while (i < ns.length) {
          val nb = ns(i)
          if (!visited.contains(nb)) {
            visited.add(nb)
            val d = dist(q, qNorm, nb)
            if (res.size < ef || d < res.head._1 ||
                (d == res.head._1 && nb < res.head._2)) {
              cand.enqueue((d, nb))
              res.enqueue((d, nb))
              if (res.size > ef) res.dequeue()
            }
          }
          i += 1
        }
      }
    }
    res.dequeueAll.reverse.toArray // nearest-first
  }

  def insert(id: Long, v: Array[Float]): Unit = {
    if (dim < 0) dim = v.length
    else require(v.length == dim,
      s"HNSW insert id=$id: vector has ${v.length} dims, index holds $dim-dim " +
        "vectors — mixed dimensionality would silently corrupt distances")
    val node = ids.length
    val l = levelOf(id)
    ids += id
    vecs += v
    norms += vecNorm(v)
    nbrs += Array.fill(l + 1)(new scala.collection.mutable.ArrayBuffer[Int](mMax0))
    if (entry < 0) { entry = node; topLevel = l; return }
    val qNorm = norms(node)
    var ep = entry
    // descend through levels above the new node's
    var lev = topLevel
    while (lev > l) { ep = greedy(v, qNorm, ep, lev); lev -= 1 }
    // connect at each level from min(l, topLevel) down to 0
    lev = math.min(l, topLevel)
    while (lev >= 0) {
      val found = searchLayer(v, qNorm, ep, lev, efConstruction)
      val cap = if (lev == 0) mMax0 else M
      val selected = found.take(M).map(_._2)
      val nl = nbrs(node)(lev)
      selected.foreach { s =>
        nl += s
        val sl = nbrs(s)(lev)
        sl += node
        if (sl.length > cap) {
          // shrink: keep the `cap` nearest to s (deterministic tie on index)
          val sv = vecs(s)
          val sNorm = norms(s)
          val kept = sl.map(n => (dist(sv, sNorm, n), n))
            .sorted(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
            .take(cap).map(_._2)
          sl.clear(); sl ++= kept
        }
      }
      ep = if (found.nonEmpty) found(0)._2 else ep
      lev -= 1
    }
    if (l > topLevel) { entry = node; topLevel = l }
  }

  /** Top-k by cosine SIMILARITY (descending), deterministic id
    * tie-break; self-exclusion is the caller's business.
    */
  def search(q: Array[Float], k: Int, efSearch: Int): Seq[(Long, Double)] = {
    if (entry < 0) return Nil
    require(q.length == dim,
      s"HNSW search: query has ${q.length} dims, index holds $dim-dim vectors")
    val qNorm = vecNorm(q)
    var ep = entry
    var lev = topLevel
    while (lev > 0) { ep = greedy(q, qNorm, ep, lev); lev -= 1 }
    val found = searchLayer(q, qNorm, ep, 0, math.max(efSearch, k))
    found.iterator.map { case (d, n) => (ids(n), 1.0 - d) }
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(k)
  }
}

object HnswIndex {

  /** ANN top-k via per-partition HNSW graphs: queries broadcast,
    * candidates stream once per partition into a local graph, each
    * shard answers its graph-searched top-k, bounded-heap global
    * merge. Output `(query_id, neighbor_id, score, rk)` — the shared
    * ANN shape (s01/s02/s04...); self-matches excluded like
    * [[SimilarityOps.bruteForceTopK]].
    */
  def annTopK(queries: DataFrame, qId: String, qVec: String,
      candidates: DataFrame, cId: String, cVec: String, k: Int,
      m: Int = 16, efConstruction: Int = 100, efSearch: Int = 64,
      scoreDecimals: Int = 6): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    // query set is small by the ANN-op contract (same as every probe op)
    val qArr = queries.select(col(qId).cast("long"), col(qVec))
      .as[(Long, Array[Float])].collect()
    // fail loudly HERE, not as an NPE inside every shard task: a NULL
    // candidate vector is skipped (below), but a NULL query vector has
    // no defined answer
    qArr.find(_._2 == null).foreach { case (qid, _) =>
      throw new IllegalArgumentException(
        s"hnswTopK: query id $qid has a NULL vector — filter or impute " +
          "query embeddings (NULL candidates are skipped; NULL queries cannot be)")
    }
    require(qArr.length <= 10000,
      s"hnswTopK probes ${qArr.length} queries — the query set is " +
        "broadcast and must stay model-sized; batch larger probe sets")
    // ContextCleaner reclaims this broadcast when the returned plan is
    // garbage-collected (the handle lives only in the task closure) — a
    // probe service looping over batches does not accrete blocks as
    // long as it drops the result frames
    val qb = spark.sparkContext.broadcast(qArr)
    val perShard = candidates.select(col(cId).cast("long"), col(cVec))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val g = new HnswGraph(m, efConstruction)
        it.foreach { case (id, v) => if (v != null) g.insert(id, v) }
        if (g.size == 0) Iterator.empty
        else qb.value.iterator.flatMap { case (qid, qv) =>
          g.search(qv, k + 1, math.max(efSearch, k + 1))
            .filter(_._1 != qid).take(k)
            .map { case (nid, s) => (qid, nid, s) }
        }
      }
      .toDF("query_id", "neighbor_id", "score")
      .select(col("query_id"), col("neighbor_id"),
        graft.queries.Qf.dround(col("score"), scoreDecimals).as("score"))
    SimilarityOps.perKeyTopK(perShard, "score", asc = false, k)
  }
}
