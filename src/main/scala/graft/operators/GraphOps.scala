package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists (beyond the dedup pipeline's
  * connected components): the crawl-curation signals that operate on
  * the LINK STRUCTURE of a corpus rather than its text.
  */
object GraphOps {

  /** Edge-count gate below which [[pageRank]] iterates driver-side: a
    * graph this size is one task's worth of data, and the distributed
    * loop's per-round shuffles are pure scheduling cost (same rationale
    * and magnitude as DedupOps.SmallGraphEdges for the CC local-DSU
    * path). 200k (src, dst) pairs ≈ a few MB on the driver.
    */
  val SmallPageRankEdges: Long = 200000L

  /** Fixed-iteration PageRank (Brin & Page 1998) over a directed edge
    * list — the host-authority prior crawl pipelines mix into quality
    * scores. `rank_{t+1}(v) = (1-d)/N + d · Σ_{u→v} rank_t(u)/deg(u)`,
    * `iters` synchronous rounds from the uniform start.
    *
    * Scale shape: the edge list is the big table and it is touched once
    * per round — each iteration is one join of edges against the
    * (node-sized) rank table plus one dst-keyed aggregation, i.e. one
    * shuffle per round, the standard distributed PageRank. Out-degrees
    * compute once. `N` is a scalar count. The fixed iteration count
    * keeps results DETERMINISTIC (cross-engine to double precision —
    * only per-node sums, no ordering decisions), which is what lets a
    * SQL oracle replay it; convergence-threshold stopping would couple
    * termination to float noise. For many rounds at scale, checkpoint
    * the rank table every ~10 iterations to cut lineage — at the
    * conformance depth (5) the plain loop is the right plan.
    *
    * Contract: every node must have ≥ 1 out-edge (no dangling-mass
    * redistribution here — pre-add self-loops or filter sinks upstream
    * if your graph has them; the d72 fixture guarantees it by
    * construction). The contract is ENFORCED, not just documented: a
    * graph with sink nodes would silently leak rank mass (the inner
    * join on out-degree drops their contribution) and produce
    * plausible-looking but wrong ranks, so violation throws — the
    * check is one count over the node set, noise next to the
    * per-iteration joins.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      smallGraphEdges: Long = SmallPageRankEdges): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // persist the loop-invariant frames: the sink check, the n count
    // and every iteration's joins all read e/nodes/deg — without the
    // persists each of those is a separate job re-running the upstream
    // distinct/union from scratch ("out-degrees compute once" must hold
    // as EXECUTION, not just as a logical plan). Released before
    // return: the result frame re-derives lazily if the caller
    // evaluates after that, which is the usual collect-immediately
    // pattern; long-lived callers persist the result themselves.
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .distinct().persist()
    val nEdges = e.count() // also materializes the cache for either path
    // the local path's hash-map keys need ONE runtime type: with
    // mixed-width src/dst columns (int vs long) the distributed path's
    // joins coerce but boxed Integer(1) != Long(1) here — take the
    // distributed route for that (rare) shape instead of guessing casts
    val uniformKeyType =
      e.schema.fields(0).dataType == e.schema.fields(1).dataType
    if (nEdges <= smallGraphEdges && uniformKeyType) {
      // Small-graph fast path (the connectedComponents local-DSU
      // precedent): the distributed loop's 2 shuffles × `iters` rounds
      // explode under AQE into ~30 stage-materialization jobs — pure
      // driver-barrier cost when the whole graph fits in one task. The
      // node set, out-degrees and the dangling check derive locally
      // from the collected edges too (three fewer jobs than the
      // distributed preamble). Deterministic by construction: edges
      // iterate in (dst, src) canonical order, so every per-node sum
      // has a fixed operand order (the distributed path's order
      // differs anyway; both sides of the oracle compare round at 4dp,
      // the established float-parity regime). Node values pass through
      // UNTOUCHED, so the output schema matches the distributed path.
      val spark = edges.sparkSession
      val nodeType = e.schema.fields.head.copy(name = "node")
      val edgeRows = e.collect().map(r => (r.get(0), r.get(1)))
        .sortBy { case (s, d) => (String.valueOf(d), String.valueOf(s)) }
      e.unpersist(false)
      val degL = new java.util.HashMap[Any, Long]()
      edgeRows.foreach { case (s, _) => degL.merge(s, 1L, (a, b) => a + b) }
      val nodeRows = edgeRows.flatMap(p => Seq(p._1, p._2)).distinct
      val nDanglingL = nodeRows.count(v => !degL.containsKey(v))
      if (nDanglingL > 0)
        throw new IllegalArgumentException(
          s"pageRank: $nDanglingL node(s) have no out-edge — their rank " +
            "mass would silently leak each iteration and totals drift " +
            "below 1. Pre-add self-loops or filter sinks upstream (or " +
            "redistribute dangling mass) before calling pageRank")
      val n = nodeRows.length.toLong
      val baseL = (1 - damping) / n
      var r = nodeRows.map(v => v -> 1.0 / n).toMap
      var it = 0
      while (it < iters) {
        val contrib = new java.util.HashMap[Any, Double]()
        edgeRows.foreach { case (s, d) =>
          contrib.merge(d, r(s) / degL.get(s), (a, b) => a + b)
        }
        r = nodeRows.map { v =>
          v -> (baseL + damping * Option(contrib.get(v)).getOrElse(0.0))
        }.toMap
        it += 1
      }
      val outSchema = org.apache.spark.sql.types.StructType(Seq(
        nodeType,
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.DoubleType, nullable = false)))
      import scala.jdk.CollectionConverters._
      return spark.createDataFrame(
        nodeRows.map(v =>
          org.apache.spark.sql.Row(v, r(v))).toSeq.asJava, outSchema)
    }
    val nodes = e.select(col("__s").as("node"))
      .union(e.select(col("__d").as("node"))).distinct().persist()
    val nDangling = nodes
      .join(e.select(col("__s").as("node")).distinct(), Seq("node"), "left_anti")
      .count()
    if (nDangling > 0) {
      e.unpersist(false); nodes.unpersist(false)
      throw new IllegalArgumentException(
        s"pageRank: $nDangling node(s) have no out-edge — their rank mass " +
          "would silently leak each iteration and totals drift below 1. " +
          "Pre-add self-loops or filter sinks upstream (or redistribute " +
          "dangling mass) before calling pageRank")
    }
    val n = nodes.count()
    val deg = e.groupBy(col("__s")).agg(count(lit(1)).as("__deg"))
    val base = (1 - damping) / n
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("__r"))
    var i = 0
    while (i < iters) {
      val contrib = e
        .join(deg, Seq("__s"))
        .join(ranks.select(col("node").as("__s"), col("__r")), Seq("__s"))
        .select(col("__d").as("node"), (col("__r") / col("__deg")).as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("__in"), lit(0.0))).as("__r"))
      i += 1
    }
    // materialize the result OFF the caches (one computation), then
    // release them — the returned frame is its own checkpointed lineage
    val out = ranks.select(col("node"), col("__r").as("rank"))
      .localCheckpoint(true)
    e.unpersist(false); nodes.unpersist(false)
    out
  }
}
