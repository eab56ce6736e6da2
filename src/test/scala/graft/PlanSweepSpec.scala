package graft

/** Whole-registry scale-killer sweep: every registered BATCH query's
  * physical plan is screened for the operators that stop scaling at
  * 100× — an un-broadcast cartesian product, a nested-loop join
  * outside the explicitly-audited sites, a global range sort where
  * none is expected. The targeted PlanSpec cases pin the plans we
  * designed; this sweep pins the ABSENCE of the plans nobody designs
  * on purpose, for every query added in any future round, so a new
  * registration can't quietly ship an all-pairs join.
  *
  * Streaming twins are skipped (executedPlan is undefined for a
  * streaming Dataset pre-start; their stateful shapes are asserted in
  * StreamingSpec instead).
  */
class PlanSweepSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose plans legitimately contain a BroadcastNestedLoopJoin:
    * every site broadcasts an O(k)-row side (audited in SCALE.md /
    * VERDICT r08 "Scale-killer sweep"). A NEW query planning a BNLJ
    * must either get a hash-join shape or be added here with the same
    * audit.
    */
  private val bnljAudited = Set(
    "similarity_topk",      // corpus × broadcast(query centroids/rows)
    "similarity_recall",    // scores the brute-force method among others
    "dedup_embedding",      // capped exactness baseline (requires <=100k)
    "skyline_pareto",       // candidate-set anti-join, tiny both sides
    "market_basket",        // 1-row broadcast(nBaskets) scalar attach
    "mixture_sample",       // 1-row broadcast(totals) scalar attach
    "kmv_set_algebra",      // 1-row broadcast(n_common) scalar attach
    "kmeans_assign", "kmeans_assign2", "kmeans_update", "kmeans_sse",
    "embedding_centroids",  // broadcast(k centroids) fan-out
    "cluster_balanced_sample",
    "dedup_semantic", "dedup_canonical", "dedup_clusters",
    "dedup_weights", "split_leakage_safe", "curate_corpus",
    "similarity_ivf", "similarity_ivf_mp", "similarity_ivf_train",
    "similarity_lsh", "similarity_lsh_mp", "similarity_rrf",
    "decontaminate",
    "split_temporal",       // 1-row broadcast(bounds) attach
    "negative_sample",      // broadcast(L labels) ≠-join builds the pool
    "hard_negatives")       // broadcast(anchors) scoring θ-join

  /** Queries that legitimately plan a range partitioning (explicit
    * sorted output or range-clustered write).
    */
  private val rangeAudited = Set(
    "zorder_value",         // range-partitioned sorted write layout
    "corpus_shuffle",       // md5-order dense rank (bounded rank table)
    // The packing family's two-phase global prefix sum IS a parallel
    // range sort (TeraSort shape): range-partition by doc order, sum
    // within partitions, add broadcast per-partition offsets. That is
    // the scalable formulation — the killer alternative is the
    // single-partition window it replaced.
    "seq_pack", "pack_emit", "tokenize_pack",
    // TPC-H queries carry the spec's ORDER BY over already-reduced
    // outputs (post-aggregation, O(groups) rows).
    "tpch_q4", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q11", "tpch_q12",
    "tpch_q13", "tpch_q15", "tpch_q16", "tpch_q20", "tpch_q22")

  /** One plan string per batch query, constructed once for all three
    * screens (some query constructors run small setup jobs — kmeans
    * training, BPE merges — so re-planning per test would triple the
    * sweep's cost).
    */
  private lazy val plans: Map[String, String] =
    SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("streaming_"))
      .map { name =>
        name -> SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
      }.toMap

  test("no registered batch query plans a CartesianProduct") {
    val offenders = plans.collect {
      case (name, p) if p.contains("CartesianProduct") => name
    }.toSeq.sorted
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }

  test("BroadcastNestedLoopJoin appears only in audited queries") {
    val offenders = plans.collect {
      case (name, p) if !bnljAudited(name) &&
        p.contains("BroadcastNestedLoopJoin") => name
    }.toSeq.sorted
    assert(offenders.isEmpty,
      s"unaudited nested-loop joins in: $offenders — broadcast an O(k) side" +
        " and add to the audit list, or fix the join to a hash shape")
  }

  test("global range sorts appear only in audited queries") {
    val offenders = plans.collect {
      case (name, p) if !rangeAudited(name) &&
        p.contains("Exchange rangepartitioning") => name
    }.toSeq.sorted
    assert(offenders.isEmpty,
      s"unaudited global sorts in: $offenders — a global orderBy on a" +
        " data-sized set is a scale killer; sort within partitions or" +
        " bound the sorted set and add to the audit list")
  }
}
