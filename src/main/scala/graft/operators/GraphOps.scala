package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists (beyond the dedup pipeline's
  * connected components): the crawl-curation signals that operate on
  * the LINK STRUCTURE of a corpus rather than its text.
  */
object GraphOps {

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
      iters: Int, damping: Double = 0.85): DataFrame = {
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
