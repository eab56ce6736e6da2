package graft

/** Whole-registry screen for GLOBAL RANGE SORTS — the one scale-killer
  * the exact-equality cartesian/BNLJ gate in [[PlanSpec]] doesn't
  * cover. An `Exchange rangepartitioning` on a data-sized set is a
  * full parallel sort; that's either a deliberate layout decision
  * (audited below) or an accidental `orderBy` someone left on a
  * result, and the two must not be confusable. Streaming twins are
  * skipped (executedPlan is undefined pre-start; StreamingSpec covers
  * their shapes).
  */
class PlanSweepSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Queries whose range partitioning is a designed, priced decision. */
  private val rangeAudited = Set(
    // zorder_value was audited here through round 12 (range-partitioned
    // sorted write layout) but its registered plan no longer carries a
    // range exchange — pruned round 13 when this list became
    // self-pruning (the tightness test below).
    "corpus_shuffle",       // md5-order dense rank (bounded rank table)
    // The packing family's two-phase global prefix sum IS a parallel
    // range sort (TeraSort shape): range-partition by doc order, sum
    // within partitions, add broadcast per-partition offsets. That is
    // the scalable formulation — the killer alternative is the
    // single-partition window it replaced.
    "seq_pack", "pack_emit", "tokenize_pack",
    // Round 12: curriculum/token-budget moved onto the same two-phase
    // grouped prefix sum (Packing.groupedCumSum) — the range exchange
    // here REPLACES the per-source/per-stage total-order window that
    // was the scale-killer (VERDICT r11 items 3-4).
    "curriculum_order", "token_budget_sample",
    // dsir_resample was audited here round 13 (two-phase prefix sum)
    // but its registered budget (200 ≤ takeCap) now plans as
    // TakeOrderedAndProject — no range exchange; pruned round 14. The
    // prefix-sum fallback above the cap stays covered by the packing
    // entries (same groupedCumSum shape).
    // TPC-H queries carry the spec's ORDER BY over already-reduced
    // outputs (post-aggregation, O(groups) rows).
    "tpch_q4", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q11", "tpch_q12",
    "tpch_q13", "tpch_q15", "tpch_q16", "tpch_q20", "tpch_q22")

  test("the range audit list is tight: every entry still range-partitions") {
    // self-pruning (the PlanSpec BNLJ-list discipline): an audit entry
    // whose plan no longer contains a range exchange is stale cover —
    // a future accidental global orderBy on that query would pass the
    // sweep unexamined.
    val stale = rangeAudited.toSeq.sorted.filter { name =>
      !SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan
        .toString.contains("Exchange rangepartitioning")
    }
    assert(stale.isEmpty,
      s"stale range-audit entries (no range exchange anymore): $stale —" +
        " prune them from rangeAudited")
  }

  test("global range sorts appear only in audited queries") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) =>
        name.startsWith("streaming_") || rangeAudited(name) }
      .collect { case (name, fn)
        if fn(spark, sf).queryExecution.executedPlan.toString
          .contains("Exchange rangepartitioning") => name }
    assert(offenders.isEmpty,
      s"unaudited global sorts in: $offenders — a global orderBy on a" +
        " data-sized set is a scale killer; sort within partitions or" +
        " bound the sorted set and add to the audit list")
  }
}
