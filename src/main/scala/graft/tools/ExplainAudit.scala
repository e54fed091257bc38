package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted plans for representative queries and grep-able
  * evidence of pushdown / pruning / broadcast / codegen.
  * Usage: runMain graft.tools.ExplainAudit [sfDir]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq(
      "q02_filter_project",   // pushdown + pruning
      "q01_pricing_summary",  // partial agg
      "q05_local_supplier_volume", // broadcast + shuffle joins
      "q18_topk",             // TakeOrderedAndProject
      "s01_cosine_topk",      // native expr + broadcast
      "r03_redis_scan_pushdown", // DSv2 glob pushdown
      "r02_redis_scan_topk",  // DSv2 pushed topN (ORDER BY key LIMIT n)
      "s02_ann_buckets",      // fused DotProductFD (no interpreted HOF)
      "d10_ngram_jaccard",    // sorted merge-count kernel (IntersectCountS)
      "q40_percentiles",      // distributed exact quantiles (no group buffering)
      "q45_hash_sample",      // deterministic sample as pushed scan predicate
      "d23_repetition",       // fused per-row kernel: zero shuffles
      "d30_passage_dedup",    // min(struct) winner agg, no window skew trap
      "d31_corpus_mix",       // broadcast rate table, corpus never shuffles
      "s07_pq_topk",          // PQ codes + broadcast LUTs + exact re-rank
      "d18_tfidf",            // exchange reuse between tf and df branches
      "d34_lm_score",         // single score join, c1 derived from c2
      "d33_semdedup",         // auto-k cluster join
      "s08_ivfpq_topk",       // cell-pruned ADC + heap top-k
      "q61_sessionization",   // one user_id shuffle for both windows + agg
      "q60_runtime_bloom_join", // injected runtime filter
      "d24b_decontamination_bloom") // shared BloomMightContain kernel, fused probe
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
    }
    spark.stop()
  }
}
