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
  * Scale posture (round 17 — the CSR step): the walks iterate over a
  * per-call ADJACENCY table — `(src, dsts array, deg)`, one row per
  * node, built by a single `collect_list` aggregate that plans NO
  * exchange when the input is the src-bucketed edge artifact — instead
  * of the flat edge list. Each iteration's join then probes |V| rows,
  * not |E| (the sf10 trade graph: 1.6M vs 110M), `rank DIV deg`
  * executes once per NODE, and the edge-sized work that remains is the
  * post-join `explode` feeding the map-combining dst aggregate — a
  * straight-line generate inside the same codegen stage, no hash table
  * in sight. Per-iteration shuffle is the node-sized ranks exchange
  * plus the |V|-bounded aggregation partials; the edge side never
  * moves. Hub caveat at extreme scale: one row holds a node's whole
  * neighbor list, so a 10⁸-degree hub is a GB-row — chunk such rows
  * (several rows per src carrying the TRUE total deg) before the loop;
  * contributions are exact integer sums, so chunking is
  * semantics-free. Lineage is cut with `localCheckpoint` every few
  * rounds so long runs don't accumulate a thousand-stage plan (same
  * pattern as Dedup.connectedComponents).
  */
object Graph {

  /** @param edges directed edge list with (src, dst) columns of ANY
    *              equality-comparable type; pass both directions for an
    *              undirected walk. Dangling nodes (no out-edges) keep
    *              the teleport mass only, matching the classic
    *              simplified formulation.
    *
    *              Key-type note: every iteration shuffles on the node
    *              id twice, so id compactness is runtime — callers
    *              with composite string names should pass a compact
    *              struct/long key and render names AFTER the loop
    *              (GraphQueries does: struct(tinyint, long) through
    *              the iterations, 'c'||k only at the output boundary —
    *              measured ~25% off the whole query vs string keys).
    */
  def pagerank(
      edges: DataFrame,
      iterations: Int,
      scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 0 && scale % 20 == 0, "need scale % 20 == 0 for an exact 0.15 term")
    // the adjacency (CSR) table: one row per node with its full
    // out-neighbor array. On the src-bucketed edge artifact the
    // aggregate plans NO exchange; on a generic input it costs the one
    // src-keyed shuffle the old degree window paid anyway. List order
    // is partition-arrival order — irrelevant: everything downstream
    // is an exact integer SUM over the elements.
    val adj = edges.select(col("src"), col("dst"))
      .groupBy("src").agg(collect_list(col("dst")).as("dsts"))
      .withColumn("deg", size(col("dsts")).cast("long"))
      .persist()
    val nodes = adj.select(col("src").as("node"))
      .union(adj.select(explode(col("dsts")).as("node"))).distinct().persist()
    val teleport = scale / 20 * 3 // exact 0.15 * scale

    var ranks = nodes.withColumn("rank", lit(scale))
    for (i <- 1 to iterations) {
      // SHUFFLE_HASH building the RANKS side: the persisted adjacency
      // satisfies hash(src) (from its own aggregate / the bucketed
      // scan), so the iteration exchanges only the node-sized ranks
      // table and probes |V| adjacency rows (sort-merge would re-sort
      // per iteration; broadcast would collect ranks per iteration on
      // the driver). Each node's share `rank DIV deg` is computed ONCE,
      // then the explode fans it out to the neighbors map-side,
      // straight into the partial dst aggregate — the edge-sized path
      // is one generate + combine inside a single codegen stage.
      val contrib = adj.join(
          ranks.hint("shuffle_hash"), adj("src") === ranks("node"))
        .select(expr("rank DIV deg").as("c"), explode(col("dsts")).as("dst"))
        .groupBy("dst")
        .agg(sum(col("c")).as("contrib"))
      ranks = nodes.join(contrib, nodes("node") === contrib("dst"), "left")
        .select(
          nodes("node"),
          (lit(teleport) +
            expr("(85 * coalesce(contrib, CAST(0 AS BIGINT))) DIV 100")).as("rank"))
      if (i % 4 == 0) ranks = ranks.localCheckpoint()
    }
    // materialize the result, then release the per-call caches — a
    // long-lived session invoking pagerank repeatedly must not pin
    // dead DataFrames in executor storage per call
    val out = ranks.localCheckpoint()
    adj.unpersist(); nodes.unpersist()
    out
  }

  /** Personalized PageRank: the teleport mass returns ONLY to the seed
    * set, so rank measures proximity to the seeds — the similarity /
    * recommendation walk (vs [[pagerank]]'s global importance). Same
    * fixed-point integer recurrence (bit-deterministic under any
    * partitioning): rank⁰ = scale·[seed], rankᵗ = 0.15·scale·[seed] +
    * ⌊0.85·Σ inbound rankᵗ⁻¹/deg⌋.
    *
    * Unlike [[pagerank]] — where every node starts at `scale` — the
    * personalized walk is FRONTIER-SPARSE: mass exists only within t
    * hops of the seeds, and a rank-0 node contributes exactly 0 to
    * every inbound sum. The loop therefore carries only the nonzero
    * rows: each iteration is the edges×ranks join (both sides already
    * hash-partitioned on their key — no exchange), ONE keyed shuffle
    * (the dst aggregate, with tiny zero-contribution anchor rows
    * unioned in so a seed with no inbound mass still surfaces), and
    * one BROADCAST of the seed set to fold the teleport term in. The
    * full node universe re-attaches once, after the loop — not once
    * per iteration. Result-identical to the dense recurrence; on the
    * sf1 trade graph the sparse loop cut isolated runtime ~40%.
    *
    * `seeds` must be a 1-column frame coercible to the edge node type.
    */
  def personalizedPagerank(
      edges: DataFrame,
      seeds: DataFrame,
      iterations: Int,
      scale: Long = 1000000000L): DataFrame = {
    require(iterations >= 0 && scale % 20 == 0,
      "need scale % 20 == 0 for an exact 0.15 term")
    // tiny by contract (the teleport target set); materialized once so
    // the per-iteration broadcast + anchor union don't recompute its
    // upstream, and so out-of-graph seeds cost nothing in the loop
    val seedSet = seeds.toDF("node").distinct().localCheckpoint()
    // same per-call adjacency as [[pagerank]] — exchange-free on the
    // bucketed artifact, |V| probe rows per iteration
    val adj = edges.select(col("src"), col("dst"))
      .groupBy("src").agg(collect_list(col("dst")).as("dsts"))
      .withColumn("deg", size(col("dsts")).cast("long"))
      .persist()
    val nodes = adj.select(col("src").as("node"))
      .union(adj.select(explode(col("dsts")).as("node"))).distinct().persist()
    val teleport = scale / 20 * 3
    val seedFlag = seedSet.withColumn("_seed", lit(true))

    var ranks = seedSet.withColumn("rank", lit(scale))
    for (i <- 1 to iterations) {
      // same shuffle-hash-build-the-ranks-side posture as [[pagerank]]
      // (the frontier is even smaller here — it grows from the seeds)
      val scored = adj.join(
          ranks.hint("shuffle_hash"), adj("src") === ranks("node"))
        .select(expr("rank DIV deg").as("c"), explode(col("dsts")).as("dst"))
        .select(col("dst"), col("c"))
      // zero anchors guarantee every seed has an aggregate row even
      // with no inbound mass; map-side partial agg absorbs them free
      val anchored = scored.unionByName(
        seedSet.select(col("node").as("dst"), lit(0L).as("c")))
      val contrib = anchored.groupBy("dst").agg(sum(col("c")).as("contrib"))
      ranks = contrib
        .join(broadcast(seedFlag), contrib("dst") === seedFlag("node"), "left")
        .select(contrib("dst").as("node"),
          (when(col("_seed"), lit(teleport)).otherwise(lit(0L)) +
            expr("(85 * contrib) DIV 100")).as("rank"))
        // rank-0 rows (non-seeds whose inbound sum floors to 0) carry
        // no mass — drop them so the frontier stays minimal
        .where(col("rank") > 0)
      if (i % 4 == 0) ranks = ranks.localCheckpoint()
    }
    // one universe re-attach: absent node = rank 0 (identical to the
    // dense recurrence); inner universe is the GRAPH's node set, so
    // out-of-graph seeds drop here exactly as before
    val out = nodes.join(ranks, Seq("node"), "left")
      .select(col("node"), coalesce(col("rank"), lit(0L)).as("rank"))
      .localCheckpoint()
    adj.unpersist(); nodes.unpersist()
    out
  }

  /** Per-node triangle counts via degree-ordered edge orientation —
    * the standard distributed formulation (Suri & Vassilvitskii's MR
    * "last reducer" fix): orient every undirected edge from its
    * lower-(degree, id) endpoint to its higher one, enumerate wedges
    * only from each node's ORIENTED out-neighborhood, and close them
    * against the oriented edge list. Orientation bounds every node's
    * out-degree by O(√m) regardless of its real degree, so a celebrity
    * hub generates O(m) wedges instead of O(deg²) — the skew guard is
    * structural, not a sampled cap.
    *
    * Plan shape: wedge join keyed on the apex, closure join keyed on
    * (lo, hi) — two keyed exchanges over edge-sized inputs, then one
    * corner-explode group-count. All counts are exact integers, so the
    * result hash-verifies against any engine.
    *
    * @param edges undirected edge list with Long columns (u, v) in any
    *              orientation; self-loops and duplicates are dropped.
    * @param assumeCanonical the input is ALREADY canonical (u < v,
    *              distinct) — e.g. the persisted co-purchase edge
    *              artifact, which stores exactly that. Skips the
    *              canonicalize+distinct exchange; semantics identical
    *              (canonicalization is idempotent), asserted by
    *              GraphSpec's artifact-equivalence case.
    * @return (node, deg, tri_count) for every node of the graph,
    *         tri_count = triangles containing the node (0 included).
    */
  def triangles(edges: DataFrame, assumeCanonical: Boolean = false): DataFrame = {
    val e = (if (assumeCanonical)
        edges.select(col("u").as("lo"), col("v").as("hi"))
      else edges
        .select(least(col("u"), col("v")).as("lo"), greatest(col("u"), col("v")).as("hi"))
        .where(col("lo") =!= col("hi"))
        .distinct())
      .persist()
    val deg = e.select(col("lo").as("node")).union(e.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg")).persist()

    // total order (deg, id): src is the strictly smaller endpoint
    val dLo = deg.select(col("node").as("lo"), col("deg").as("deg_lo"))
    val dHi = deg.select(col("node").as("hi"), col("deg").as("deg_hi"))
    val loFirst = col("deg_lo") < col("deg_hi") ||
      (col("deg_lo") === col("deg_hi") && col("lo") < col("hi"))
    val oriented = e.join(dLo, "lo").join(dHi, "hi")
      .select(
        when(loFirst, col("lo")).otherwise(col("hi")).as("src"),
        when(loFirst, struct(col("deg_hi").as("d"), col("hi").as("n")))
          .otherwise(struct(col("deg_lo").as("d"), col("lo").as("n"))).as("dst"))
      .persist()

    // wedges (apex → two ordered out-neighbors), closed by an oriented
    // edge between them; struct(deg, id) comparison = the same total
    // order, so each triangle materializes exactly once
    val w1 = oriented.select(col("src").as("apex"), col("dst").as("x"))
    val w2 = oriented.select(col("src").as("apex"), col("dst").as("y"))
    val closing = oriented.select(col("src").as("bsrc"), col("dst").as("bdst"))
    val tris = w1.join(w2, "apex").where(col("x") < col("y"))
      .join(closing, col("x").getField("n") === col("bsrc") &&
        col("y") === col("bdst"))
      .select(col("apex"), col("x").getField("n").as("b"),
        col("y").getField("n").as("c"))

    val perCorner = tris
      .select(explode(array(col("apex"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("tri_count"))
    val out = deg.join(perCorner, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("tri_count"), lit(0L)).as("tri_count"))
      .localCheckpoint()
    e.unpersist(); deg.unpersist(); oriented.unpersist()
    out
  }

  /** Multi-source BFS: exact minimum hop distance from any seed, up to
    * `maxHops`. Frontier-at-a-time (the textbook distributed BFS): each
    * level expands the CURRENT frontier through the edge list, then an
    * anti-join against the visited set prunes re-discovered nodes — so
    * a node is emitted exactly once, at its first (= minimum) level,
    * and cycles never loop. Work per level is one src-keyed join plus
    * one node-keyed distinct/anti-join — all bounded by |frontier
    * adjacency|, never the transitive closure; the visited set is
    * `localCheckpoint`ed each level so the loop's lineage stays O(1)
    * like [[pagerank]] / Dedup.connectedComponents. Levels run until
    * `maxHops`; an exhausted frontier short-circuits via the cheap
    * `isEmpty` probe on the (already materialized) next level.
    *
    * @param edges directed (src, dst) — pass both directions for an
    *              undirected walk; any equality-comparable node type.
    * @param seeds one `node` column; distance 0 rows, deduplicated.
    * @param assumePartitioned the input is ALREADY hash-distributed on
    *              src (the bucketed edge artifact). Since the round-17
    *              adjacency build, the collect_list aggregate makes the
    *              layout decision itself (no exchange on a bucketed
    *              input, one src-keyed shuffle otherwise), so the flag
    *              is documentation of the input's provenance rather
    *              than a plan switch.
    * @return (node, dist) — one row per reached node.
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      assumePartitioned: Boolean = false): DataFrame = {
    require(maxHops >= 0, "maxHops must be >= 0")
    // per-call adjacency (the [[pagerank]] CSR step): the collect_list
    // aggregate plans no exchange on a src-bucketed input and exactly
    // the one src-keyed shuffle `assumePartitioned=false` used to pay
    // via repartition — the flag is now informational only. Every
    // level's expansion join then probes |V| rows, not |E|, and the
    // persisted layout satisfies hash(src) either way, so only the
    // (small) frontier side ever shuffles.
    val e = edges.select(col("src"), col("dst"))
      .groupBy("src").agg(collect_list(col("dst")).as("dsts"))
      .persist()
    var visited = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint()
    val increments = scala.collection.mutable.ArrayBuffer(visited)
    var frontier = visited.select(col("node"))
    var h = 0
    var exhausted = false
    while (h < maxHops && !exhausted) {
      h += 1
      // each level's increment persists once and the visited set is the
      // running union of persisted increments — no O(V) re-checkpoint
      // per level, and the anti-join only rescans cached partitions
      // the frontier's lineage contains e (persist does not cut it the
      // way localCheckpoint did), so rename its column before joining
      // e again — disjoint output names sidestep the self-join
      // ambiguity without a lineage-cutting materialization
      val next = frontier.toDF("_fnode")
        .join(e, col("_fnode") === col("src"))
        .select(explode(col("dsts")).as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(h.toLong))
        .persist()
      exhausted = next.isEmpty
      increments += next
      visited = visited.union(next)
      frontier = next.select(col("node"))
    }
    val out = visited.localCheckpoint()
    e.unpersist()
    increments.drop(1).foreach(_.unpersist())
    out
  }


  /** k-core decomposition membership: the maximal subgraph in which
    * every node keeps degree ≥ k — the standard "dense backbone"
    * extraction (hub discovery, spam/bot nests, curriculum graph
    * pruning). Computed by the textbook iterative peel: drop nodes
    * with degree < k, recompute degrees within the survivors, repeat
    * until nothing drops. Peeling is monotone and deterministic — the
    * fixpoint is a pure function of the graph — so the result
    * hash-verifies against an UNROLLED SQL twin (the pagerank oracle
    * discipline), and extra unrolled rounds past convergence are
    * no-ops. `maxRounds` fail-louds if the fixpoint isn't reached —
    * the oracle's unroll depth is only valid if the engine converged
    * within it.
    *
    * Scale shape: each round is two semi-joins of the persisted edge
    * list against the CURRENT alive set plus one map-combining degree
    * aggregate. The alive set only shrinks (AQE flips the semi-joins
    * to broadcast as it does), and real graphs peel in a handful of
    * rounds; the returned degree is the degree WITHIN the core (the
    * last round's aggregate, which on convergence was computed against
    * exactly the final member set).
    *
    * @param edges both directions of an undirected graph, (src, dst)
    */
  def kcore(edges: DataFrame, k: Int, maxRounds: Int = 32): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val e = edges.select(col("src"), col("dst")).persist()
    // DELTA peel — the recompute form (two full-edge semi-joins + a
    // full degree aggregate PER ROUND) paid ~4.4 GB of shuffle on the
    // sf10 trade graph; the delta form touches the full edge list
    // exactly once (the initial degree aggregate) and each round only
    // the edges INTO the just-dropped set: deg(v) falls only when a
    // neighbor drops, so decrement-and-refilter visits exactly the
    // same per-round drop sets as the recompute peel (same fixpoint,
    // same within-core degrees, hash-identical to the unrolled oracle).
    var deg = e.groupBy(col("src"))
      .agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("node"), col("core_deg"))
      .localCheckpoint()
    var dropped = deg.filter(col("core_deg") < k).select("node")
      .localCheckpoint()
    deg = deg.filter(col("core_deg") >= k).localCheckpoint()
    var rounds = 1
    var droppedCount = dropped.count()
    // try/finally: a mid-peel failure (the maxRounds require, an
    // executor loss) must not leak the persisted edge list; and each
    // round explicitly releases the PREVIOUS round's checkpoint blocks
    // once its successors have materialized — a deep cascade would
    // otherwise hold maxRounds copies of the degree table in executor
    // storage until the driver GC got around to them.
    try {
      while (droppedCount > 0L) {
        rounds += 1
        require(rounds <= maxRounds,
          s"kcore: no fixpoint within $maxRounds rounds (oracle unroll depth)")
        // edges whose dst just died decrement their src — the dropped
        // set is small and shrinking, so the semi-join broadcasts (hint
        // gated by the measured count: a pathological first wave on a
        // 100 TB graph must not be forced through a driver broadcast)
        // and the edge list itself never reshuffles
        val dropKeys =
          if (droppedCount <= 5000000L) broadcast(dropped.toDF("dst"))
          else dropped.toDF("dst")
        val dec = e.join(dropKeys, Seq("dst"), "left_semi")
          .groupBy(col("src"))
          .agg(count(lit(1)).as("_dec"))
        val updated = deg.join(dec, deg("node") === dec("src"), "left")
          .select(deg("node"),
            (col("core_deg") - coalesce(col("_dec"), lit(0L))).as("core_deg"))
          .localCheckpoint()
        val (prevDeg, prevDropped) = (deg, dropped)
        dropped = updated.filter(col("core_deg") < k).select("node")
          .localCheckpoint()
        deg = updated.filter(col("core_deg") >= k).localCheckpoint()
        // deg/dropped are eager checkpoints of `updated`, so the
        // round's intermediate and the previous round's tables are now
        // unreachable — free their blocks instead of waiting for GC
        Seq(updated, prevDeg, prevDropped)
          .foreach(org.apache.spark.sql.GraftBridge.releaseLocalCheckpoint)
        droppedCount = dropped.count()
      }
    } finally e.unpersist()
    deg
  }
  /** Common-neighbor link prediction: for every node pair sharing at
    * least `minCommon` neighbors, the common-neighbor count plus the
    * Jaccard score common/(deg_x + deg_y − common) — the classic
    * "people you may know" / candidate-pair generator over an entity
    * graph.
    *
    * Counting runs by WEDGE enumeration at the shared neighbor (apex),
    * never by pairing the whole vertex set: each apex emits the ordered
    * pairs of its `apexCap` LOWEST-id neighbors map-side from one
    * sorted collect_set (same bounded-fanout posture as the triangle
    * incidence cap — an uncapped 1M-degree hub would alone emit 5·10¹¹
    * wedges). Degrees in the score stay UNCAPPED true degrees; the cap
    * only bounds which apexes can witness a pair, and is mirrored
    * verbatim in the SQL oracle so both engines see identical pairs.
    *
    * Shape: one keyed exchange to build capped adjacency, map-side
    * C(cap,2) pair fan-out, one hash-aggregate on (x,y), two broadcast
    * joins for degrees (the degree table is |V|-sized — broadcast holds
    * to ~10⁷ vertices; above that flip them to sort-merge with the same
    * semantics).
    */
  def commonNeighbors(edges: DataFrame, apexCap: Int = 8,
      minCommon: Long = 2L, assumeCanonical: Boolean = false): DataFrame = {
    require(apexCap >= 2 && apexCap <= 64, s"apexCap in [2,64], got $apexCap")
    val e = (if (assumeCanonical)
        edges.select(col("u").as("lo"), col("v").as("hi"))
      else edges
        .select(least(col("u"), col("v")).as("lo"), greatest(col("u"), col("v")).as("hi"))
        .where(col("lo") =!= col("hi"))
        .distinct())
      .persist()
    val adj = e.select(col("lo").as("apex"), col("hi").as("nb"))
      .union(e.select(col("hi").as("apex"), col("lo").as("nb")))
    val deg = adj.groupBy(col("apex").as("node"))
      .agg(count(lit(1)).as("deg")).persist()
    // ordered pairs via two codegen generators (posexplode + sliced
    // explode) — the nested-transform formulation evaluated
    // interpreted per pair (HOFs are CodegenFallback; the
    // market_basket profile measured that cost dominating)
    val pairs = adj.groupBy("apex")
      .agg(slice(sort_array(collect_set(col("nb"))), 1, apexCap).as("ns"))
      .select(col("ns"), posexplode(col("ns")))
      .select(col("col").as("x"),
        explode(slice(col("ns"), col("pos") + 2, size(col("ns")))).as("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("common"))
      .where(col("common") >= minCommon)
    val out = pairs
      .join(broadcast(deg.select(col("node").as("x"), col("deg").as("deg_x"))), "x")
      .join(broadcast(deg.select(col("node").as("y"), col("deg").as("deg_y"))), "y")
      .select(col("x"), col("y"), col("common"), col("deg_x"), col("deg_y"),
        (col("common").cast("double")
          / (col("deg_x") + col("deg_y") - col("common")).cast("double"))
          .as("jaccard"))
      .localCheckpoint()
    e.unpersist(); deg.unpersist()
    out
  }
}
