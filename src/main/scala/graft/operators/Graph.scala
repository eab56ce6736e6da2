package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge-list DataFrames.
  *
  * PageRank here is INTEGER-SCALED: ranks live in a fixed-point `Long`
  * domain (`scale` = 1.0) and every step is integer arithmetic —
  * `rank DIV deg` per edge, exact `Long` sums, `(85 * s) DIV 100` for
  * the damping. Floating-point PageRank is summation-order-dependent
  * (a different partitioning yields different last-ulp ranks, so no two
  * engines — or two RUNS — agree bit-for-bit); integer arithmetic is
  * associative/commutative exactly, so the result is a pure function of
  * the graph, reproducible on any engine and verifiable against a SQL
  * oracle by hash. The quantization error is ~1/scale per hop —
  * irrelevant at scale=1e9 — and, unlike FP error, deterministic.
  *
  * Scale posture: each iteration is the canonical two-shuffle plan
  * (ranks re-key to the edge src distribution, contributions reduce by
  * dst) with map-side partial sums; edges and degrees are computed once,
  * persisted, and reused across iterations. Lineage is cut with
  * `localCheckpoint` every few rounds so long runs don't accumulate a
  * thousand-stage plan (same pattern as Dedup.connectedComponents).
  */
object Graph {

  /** @param edges directed edge list with string columns (src, dst);
    *              pass both directions for an undirected walk.
    *              Dangling nodes (no out-edges) keep the teleport mass
    *              only, matching the classic simplified formulation.
    */
  def pagerank(
      edges: DataFrame,
      iterations: Int,
      scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 0 && scale % 20 == 0, "need scale % 20 == 0 for an exact 0.15 term")
    val e = edges.select(col("src").cast("string"), col("dst").cast("string"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg")).persist()
    val teleport = scale / 20 * 3 // exact 0.15 * scale

    var ranks = nodes.withColumn("rank", lit(scale))
    for (i <- 1 to iterations) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .groupBy("dst")
        .agg(sum(expr("rank DIV deg")).as("contrib"))
      ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(
          nodes("node"),
          (lit(teleport) +
            expr("(85 * coalesce(contrib, CAST(0 AS BIGINT))) DIV 100")).as("rank"))
      if (i % 4 == 0) ranks = ranks.localCheckpoint()
    }
    // materialize the result, then release the per-call caches — a
    // long-lived session invoking pagerank repeatedly must not pin
    // three dead DataFrames in executor storage per call
    val out = ranks.localCheckpoint()
    e.unpersist(); nodes.unpersist(); deg.unpersist()
    out
  }
}
