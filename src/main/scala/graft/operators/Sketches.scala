package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.KMinValues.k_min_values
import graft.functions.SpaceSaving.space_saving

/** Cardinality sketches — distinct counting WITHOUT the exact-distinct
  * shuffle. `count(DISTINCT x)` at 100 TB moves every distinct value
  * across the wire (Spark plans it as a two-phase expand+aggregate);
  * both sketches here ship O(k) or O(m) state per group per task
  * instead, with map-side partial aggregation, and trade that for a
  * quantified relative error (KMV ≈ 1/√(k−2), HLL ≈ 1.04/√m).
  *
  * Everything is keyed off `md5(salt:value)`, the same
  * engine-independent device as [[Sampling]]: the top 60 hash bits as
  * an exact long make every intermediate an INTEGER any engine can
  * recompute, so the DuckDB oracle verifies the sketches bit-for-bit —
  * register tables and all — not just "close enough".
  */
object Sketches {

  /** The value's md5 key as an exact long in [0, 2⁶⁰): top 15 hex
    * digits of `md5(salt:value)`. Uniform, deterministic, reproducible
    * on any engine, independent of partitioning.
    */
  def hash60(c: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), lit(":"), c.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** KMV (bottom-k) distinct estimate per group. One hash-aggregate
    * shuffle carrying ≤ k longs per (task, group); duplicates collapse
    * in the sketch buffer. Output per group:
    *   n_kept  — sketch fill (< k ⇒ the distinct count is exact)
    *   kth_hash — largest kept hash (the k-th smallest overall)
    *   est_distinct — (k−1)·2⁶⁰ / kth_hash, or n_kept when not full;
    *     one double divide over exact integers, rounded to 3.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int, salt: String = "kmv"): DataFrame = {
    // (k−1)·2⁶⁰: a small int times a power of two — exact as a double
    val numer = (k - 1).toDouble * (1L << 60).toDouble
    df.select(groupCols.map(col) :+ hash60(col(valueCol), salt).as("_h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(k_min_values(col("_h"), k).as("_s"))
      .select(groupCols.map(col) ++ Seq(
        col("_s.n_kept").as("n_kept"),
        col("_s.kth_hash").as("kth_hash"),
        round(
          when(col("_s.n_kept") < k, col("_s.n_kept").cast("double"))
            .otherwise(lit(numer) / col("_s.kth_hash").cast("double")),
          3).as("est_distinct")): _*)
  }

  /** Standard HLL bias constant α_m (Flajolet et al. 2007). */
  def hllAlpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** HyperLogLog distinct estimate per group, p-bit registers
    * (m = 2^p), built from pure integer column arithmetic — no custom
    * aggregate needed: register index is the low p hash bits, and the
    * rank ρ (leading zeros + 1 of the next 32 bits) falls out of the
    * length of the binary string form, so `groupBy(group, register)
    * .max(ρ)` then one more aggregate IS the sketch. Two hash-aggregate
    * shuffles, the second over ≤ m rows per group.
    *
    * This is the RAW estimator α_m·m²·2³³ / Σ 2^(33−ρ_j) with empty
    * registers contributing 2³³ (the sum is scaled by 2³³ so every term
    * is an exact integer — ρ ≤ 33), PLUS the small-range
    * linear-counting correction (Flajolet et al. 2007) as a separate
    * `est_corrected` column. The correction needs ln(), whose last-ulp
    * behavior differs across libms — but V (the empty-register count)
    * only takes m values, so m·ln(m/V) is a COMPILE-TIME table of m
    * doubles, interpolated into both engines as shortest-round-trip
    * literals: the correction stays engine-independent and the oracle
    * still verifies it bit-for-bit. The large-range (hash-collision)
    * correction is still omitted: it needs ln of a runtime value, and
    * it only matters past 2³²/30 ≈ 143 M distinct per group — far
    * beyond p=7's useful range (use a bigger p there).
    *
    * Null values are ignored (like count(DISTINCT) and like
    * [[kmvDistinct]], whose k_min_values buffer skips null hashes) —
    * otherwise the null hash would occupy a phantom register.
    *
    * Output: group cols, n_registers, sum_scaled (exact long),
    * est_distinct (raw), est_corrected (linear-counting when the raw
    * estimate ≤ 2.5·m and empty registers exist; raw otherwise). Both
    * one double divide / one table lookup, rounded to 3.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      p: Int = 7, salt: String = "hll"): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val emptyTerm = 1L << 33
    // α_m·m²·2³³ as one double constant, shared verbatim with the oracle
    val numer = hllAlpha(m) * m * m * emptyTerm.toDouble
    val h = hash60(col(valueCol), salt)
    // linear-counting table: index v = number of EMPTY registers ∈ [1, m]
    val linTable = typedLit(linearCountingTable(m).toSeq)
    df.where(col(valueCol).isNotNull)
      .select((groupCols.map(col) ++ Seq(
        h.bitwiseAND(lit((m - 1).toLong)).as("_reg"),
        shiftright(h, p).bitwiseAND(lit(4294967295L)).as("_sfx"))): _*)
      .withColumn("_rho",
        when(col("_sfx") === 0, lit(33L))
          .otherwise(lit(33L) - length(conv(col("_sfx").cast("string"), 10, 2))))
      .groupBy(groupCols.map(col) :+ col("_reg"): _*)
      .agg(max(col("_rho")).as("_maxrho"))
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_registers"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(33 - _maxrho AS INT))"))
          .as("_present_sum"))
      .withColumn("sum_scaled",
        col("_present_sum") + (lit(m.toLong) - col("n_registers")) * lit(emptyTerm))
      .withColumn("_raw", lit(numer) / col("sum_scaled").cast("double"))
      .withColumn("_v_empty", (lit(m.toLong) - col("n_registers")).cast("int"))
      .select(groupCols.map(col) ++ Seq(
        col("n_registers"),
        col("sum_scaled"),
        round(col("_raw"), 3).as("est_distinct"),
        round(
          when(col("_raw") <= lit(2.5 * m) && col("_v_empty") > 0,
            element_at(linTable, col("_v_empty")))
            .otherwise(col("_raw")),
          3).as("est_corrected")): _*)
  }

  /** m·ln(m/v) for v = 1..m — the linear-counting estimates, one per
    * possible empty-register count. Computed once on the driver; both
    * engines consume the same shortest-round-trip double literals.
    */
  def linearCountingTable(m: Int): Array[Double] =
    (1 to m).map(v => m * math.log(m.toDouble / v)).toArray

  /** Fixed-bin histogram quantiles — the scalable p50/p90/p99.
    * `percentile()`-style exact quantiles sort every group's values
    * (per-group memory ∝ group size — the scale killer); here each
    * value maps to one of `bins` fixed bins over [lo, hi) (clamped),
    * ONE map-side-combining hash aggregate counts (group, bin) rows,
    * and the quantile is located by a cumulative walk over ≤ `bins`
    * rows per group — mergeable, streaming-compatible, error bounded
    * by the bin width. Ranks use exact integer ceil-division
    * (`(total·p + 99) div 100`), so placement is engine-independent;
    * bin edges are the same double literals on both engines.
    *
    * Output per (group, percentile p): [bin_lo, bin_hi) bracketing the
    * rank-⌈total·p/100⌉ value, plus rank_cum (≤-bin cumulative count)
    * and total.
    */
  def histogramQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: String, lo: Double, hi: Double, bins: Int,
      percents: Seq[Int]): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins > 0 and hi > lo")
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100))
    val width = (hi - lo) / bins
    val bin = least(lit(bins - 1), greatest(lit(0),
      floor((col(valueCol) - lit(lo)) / lit(width)).cast("int")))
    val w = Window.partitionBy(groupCols.map(col): _*)
    // NaN must be excluded explicitly: Spark's non-ANSI cast would
    // silently bucket floor(NaN) into bin 0 while DuckDB errors on the
    // same cast — a cross-engine divergence AND a miscount.
    df.where(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .groupBy(groupCols.map(col) :+ bin.as("bin"): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(
        w.orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("n")).over(w))
      .withColumn("p", explode(typedLit(percents)))
      .withColumn("_target", expr("(total * p + 99) div 100"))
      .where(col("cum") >= col("_target") &&
        col("cum") - col("n") < col("_target"))
      .select(groupCols.map(col) ++ Seq(col("p"),
        (lit(lo) + col("bin") * lit(width)).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * lit(width)).as("bin_hi"),
        col("cum").as("rank_cum"), col("total")): _*)
  }

  /** KLL-sketch quantiles — the MERGEABLE rank sketch with a published
    * error bound ([[graft.functions.KllSketch]]: KLL compactor stack,
    * derandomized offset, no bottom sampler; ε = O(log²(n/k)/k) rank
    * error past fill) that [[histogramQuantiles]]'s fixed bins are the
    * bounded-domain special case of. Values quantize to integer cents
    * (the repo's 2-decimal convention) so the summary is pure longs.
    *
    * Scale/exactness contract: ONE map-side-combining aggregate — each
    * task ships one O(k·log) buffer per group, never rows; below the
    * level-0 fill (k per group) the summary is the complete sorted
    * multiset and rank selection is EXACT (the KMV discipline — every
    * oracle SF sits in that regime; k = 16384 vs 2 k values/group at
    * sf0.01), past it the ε bound applies and the spec pins it.
    * Quantile extraction is the stateless [[graft.functions
    * .KllQuantileAt]] walk — no post-aggregation window, so the SAME
    * plan runs as a Complete-mode streaming aggregate
    * (`streaming_quantile_kll`).
    */
  def kllQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int, percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100))
    val cents = round(col(valueCol) * 100).cast("long")
    val sketch = df
      .where(col(valueCol).isNotNull && !isnan(col(valueCol)))
      .groupBy(groupCols.map(col): _*)
      .agg(graft.functions.KllSketch.kll_sketch(cents, k).as("_s"))
    sketch
      .select(groupCols.map(col) :+ col("_s.n").as("total") :+
        explode(array(percents.map(p => struct(lit(p).as("p"),
          graft.functions.KllQuantileAt.kll_quantile_at(col("_s"), p)
            .as("value_cents"))): _*)).as("_q"): _*)
      .select(groupCols.map(col) ++ Seq(col("_q.p").as("p"),
        col("_q.value_cents").as("value_cents"), col("total")): _*)
  }

  /** KMV set algebra: estimate |A∪B|, |A∩B|, and Jaccard(A, B) from
    * bottom-k sketches of the two sets — WITHOUT materializing either
    * distinct set. The union sketch is the bottom-k of the merged hash
    * sets (KMV's defining mergeability); the classic estimator
    * (Beyer et al. 2007) then counts how many of the union's k minima
    * belong to both inputs: J ≈ n_common / k, |A∩B| ≈ J · |A∪B|.
    *
    * Scale contract: each side collapses to ≤ k hashes via map-side
    * partial sketches (the same wire bound as [[kmvDistinct]]); the
    * membership probes are broadcast semi-joins of a k-row table
    * against the per-side sketch — nothing corpus-sized ever shuffles.
    * Every count is an exact integer and the estimates are single
    * correctly-rounded double ops over them, so the whole output
    * hash-verifies against a SQL twin.
    *
    * Output (one row): k_used, kth_hash, n_common, union_est,
    * jaccard_est, inter_est.
    */
  def kmvSetAlgebra(a: DataFrame, b: DataFrame, valueCol: String,
      k: Int, salt: String = "kmv"): DataFrame = {
    val numer = (k - 1).toDouble * (1L << 60).toDouble
    def hashes(df: DataFrame) =
      df.where(col(valueCol).isNotNull)
        .select(hash60(col(valueCol), salt).as("_h")).distinct()
    val ha = hashes(a).persist()
    val hb = hashes(b).persist()
    // bottom-k of the union: mergeability means this equals the
    // bottom-k of (bottom-k(A) ∪ bottom-k(B)) — at cluster scale the
    // per-side sketches would feed this directly.
    val bottom = ha.union(hb).distinct()
      .orderBy(col("_h")).limit(k).persist()
    val inA = bottom.join(ha, Seq("_h"), "left_semi")
    val common = inA.join(hb, Seq("_h"), "left_semi")
    val stats = bottom.agg(
      count(lit(1)).as("k_used"), max(col("_h")).as("kth_hash"))
    val result = stats
      .crossJoin(broadcast(common.agg(count(lit(1)).as("n_common"))))
      .select(
        col("k_used"), col("kth_hash"), col("n_common"),
        when(col("k_used") < k, col("k_used").cast("double"))
          .otherwise(lit(numer) / col("kth_hash").cast("double"))
          .as("union_est"))
      .withColumn("jaccard_est",
        col("n_common").cast("double") / col("k_used").cast("double"))
      .withColumn("inter_est", round(col("jaccard_est") * col("union_est"), 3))
      .withColumn("union_est", round(col("union_est"), 3))
      .withColumn("jaccard_est", round(col("jaccard_est"), 6))
      // single row: materialize, then release the per-call caches
      .localCheckpoint()
    ha.unpersist(); hb.unpersist(); bottom.unpersist()
    result
  }

  /** Count-min sketch frequency estimation per group: a depth×width
    * grid of counters; item i hashes to one bucket per depth row and
    * its estimate is the MINIMUM of those depth cells — always ≥ the
    * true count, over by at most 2N/width with probability 1−2⁻ᵈᵉᵖᵗʰ
    * (Cormode & Muthukrishnan 2005).
    *
    * Scale contract: [[countMinCells]] standalone is ONE hash
    * aggregate over map-side-exploded (group, row, bucket) keys —
    * partial aggregation collapses every task's contribution to
    * ≤ depth·width counters per group, so the shuffle carries the
    * GRID, not the key space (the exact GROUP-BY-item alternative
    * ships every distinct item), and the single mergeable aggregate is
    * the plan the Complete-mode streaming twin requires.
    * [[countMinEstimates]] must ship the key space regardless (its
    * probe side computes exact per-item counts), so there it ships
    * exactly once and the grid sums the collapsed item counts. The
    * probe side joins the tiny cell table (groups·depth·width rows)
    * broadcast. Cells and estimates are exact integers keyed off
    * md5(salt+row:item), so the DuckDB oracle rebuilds the identical
    * grid bit-for-bit.
    *
    * For the registered query the probe set is the items whose TRUE
    * count ≥ `minTrue` (computed exactly — evaluation harness, not
    * sketch machinery); a production probe would be any candidate list.
    * Output: group cols, item, true_cnt, cms_est, over_by.
    */
  private def cmsBucket(salt: String, width: Int)(
      j: Column, it: Column): Column =
    conv(substring(
      md5(concat(lit(salt), j.cast("string"), lit(":"), it)), 1, 15),
      16, 10).cast("long") % width

  /** The CMS grid itself — (group, depth row `_j`, `_bucket`) → count.
    * ONE map-side-combining hash aggregate over exploded keys (the
    * shuffle carries ≤ depth·width counters per task per group, never
    * the key space), and the count aggregate is mergeable state: the
    * same plan runs as a Complete-mode streaming query, each trigger
    * folding new rows into the stored grid.
    */
  def countMinCells(df: DataFrame, groupCols: Seq[String], itemCol: String,
      depth: Int, width: Int, salt: String = "cms"): DataFrame = {
    require(depth >= 1 && width >= 1, "countMin needs depth, width >= 1")
    val bucket = cmsBucket(salt, width) _
    df.where(col(itemCol).isNotNull)
      .select(groupCols.map(col) :+ col(itemCol).cast("string").as("_item"): _*)
      .withColumn("_j", explode(typedLit((0 until depth).toList)))
      .groupBy(groupCols.map(col) ++ Seq(
        col("_j"), bucket(col("_j"), col("_item")).as("_bucket")): _*)
      .agg(count(lit(1)).as("_n"))
  }

  def countMinEstimates(df: DataFrame, groupCols: Seq[String],
      itemCol: String, depth: Int, width: Int, minTrue: Long,
      salt: String = "cms"): DataFrame = {
    require(depth >= 1 && width >= 1, "countMin needs depth, width >= 1")
    val bucket = cmsBucket(salt, width) _
    val depths = typedLit((0 until depth).toList)
    // The probe side needs exact per-(group, item) counts anyway, so
    // the key space ships exactly once and BOTH sides derive from it:
    // the grid cell count is the sum of its items' counts, so the
    // cells rebuild from the collapsed table instead of a second raw
    // scan ×depth-exploded (ReuseExchange runs the scan + aggregate
    // once), and the md5 bucket hash runs per ITEM, not per row.
    // [[countMinCells]] keeps the raw-row shape — it is the mergeable
    // single-aggregate plan the Complete-mode streaming twin requires
    // (chained stateful aggregates are unsupported), and standalone it
    // never justifies shipping the key space.
    val itemCounts = df.where(col(itemCol).isNotNull)
      .select(groupCols.map(col) :+ col(itemCol).cast("string").as("_item"): _*)
      .groupBy(groupCols.map(col) :+ col("_item"): _*)
      .agg(count(lit(1)).as("true_cnt"))
    val cells = itemCounts
      .withColumn("_j", explode(depths))
      .groupBy(groupCols.map(col) ++ Seq(
        col("_j"), bucket(col("_j"), col("_item")).as("_bucket")): _*)
      .agg(sum(col("true_cnt")).as("_n"))
    val probes = itemCounts.where(col("true_cnt") >= minTrue)
    probes
      .withColumn("_j", explode(depths))
      .withColumn("_bucket", bucket(col("_j"), col("_item")))
      .join(broadcast(cells), groupCols ++ Seq("_j", "_bucket"))
      .groupBy(groupCols.map(col) ++ Seq(col("_item"), col("true_cnt")): _*)
      .agg(min(col("_n")).as("cms_est"))
      .select(groupCols.map(col) ++ Seq(
        col("_item").as("item"), col("true_cnt"), col("cms_est"),
        (col("cms_est") - col("true_cnt")).as("over_by")): _*)
  }

  /** Exponentially time-decayed top-k — "trending now": each event
    * contributes weight 2^(−age_days), so yesterday counts half of
    * today and last month barely at all. Kept EXACT the repo way: the
    * weight is the dyadic integer `10⁶ >> age_days` (a bit shift both
    * engines implement identically — no pow(), no float), summed in
    * plain longs, so the decayed mass is a pure integer function of
    * the data. Age anchors to the corpus max timestamp's day (one
    * 1-row broadcast, the split_temporal device); events older than
    * ~20 days round to weight 0 exactly — the horizon IS the
    * quantization, documented.
    *
    * Shape: one map-combining aggregate over (key, age) cells, the
    * decay projection on the reduced table, one bounded top-k
    * (TakeOrderedAndProject), no global sort.
    */
  def decayedTopK(df: DataFrame, keyCol: Column, tsCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cell = df
      .select(keyCol.as("_k"), to_date(tsCol).as("_d"))
      .groupBy(col("_k"), col("_d"))
      .agg(count(lit(1)).as("_c"))
    val anchorDay = cell.agg(max(col("_d")).as("_mx"))
    cell.crossJoin(broadcast(anchorDay))
      .withColumn("_age", datediff(col("_mx"), col("_d")).cast("long"))
      .withColumn("_w",
        expr("shiftright(CAST(1000000 AS BIGINT), CAST(least(_age, 62) AS INT))") * col("_c"))
      .groupBy(col("_k"))
      .agg(sum(col("_w")).as("decayed_micro"),
        sum(col("_c")).as("raw_count"))
      .orderBy(col("decayed_micro").desc, col("_k"))
      .limit(k)
      .select(col("_k").as("key"),
        col("decayed_micro").cast("bigint").as("decayed_micro"),
        col("raw_count").cast("bigint").as("raw_count"))
  }

  /** Heavy hitters per group via the Space-Saving sketch: items whose
    * estimated count is ≥ `minCount`. One hash-aggregate shuffle
    * carrying ≤ `capacity` counters per (task, group) — the exact
    * GROUP-BY-item alternative shuffles every distinct item, which at
    * 100 TB means the full key cardinality on the wire. With `capacity`
    * ≥ the per-group distinct count the counters are exact (the
    * oracle-verified regime); below it, estimates overshoot by at most
    * N/capacity and the output is a superset of the true heavy hitters.
    */
  def heavyHitters(df: DataFrame, groupCols: Seq[String], itemCol: String,
      minCount: Long, capacity: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(space_saving(col(itemCol).cast("string"), capacity).as("_hh"))
      .select(groupCols.map(col) :+ explode(col("_hh")).as("_e"): _*)
      .select(groupCols.map(col) ++ Seq(
        col("_e.item").as("item"), col("_e.est").as("est")): _*)
      .where(col("est") >= minCount)

  /** Join-skew pre-flight: before running (or salting, or skipping) a
    * big equi-join, price its hot keys — per key heavy on BOTH sides,
    * the row counts and the implied per-key output mass
    * `fanout = cnt_a · cnt_b`, largest first. This is the diagnostic
    * that says WHICH keys make a 100 TB join melt and what
    * [[graft.operators.Partitioning.saltedJoin]] must absorb.
    *
    * Scale contract: each side collapses to ≤ `capacity` Space-Saving
    * counters per task BEFORE anything crosses the wire (never the key
    * space — the [[heavyHitters]] economics); the two ≤ capacity-row
    * top lists join in one broadcast and the final cut is a bounded
    * top-`topN` heap. With `capacity` ≥ the side's distinct count the
    * counts are exact (the oracle-verified regime); below it they
    * overshoot by ≤ N/capacity, so the fanout estimate stays an UPPER
    * bound on the true per-key output — the safe direction for a
    * planning signal.
    */
  def joinSkewProbe(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
      minCount: Long, capacity: Int, topN: Int): DataFrame = {
    def side(df: DataFrame, keyCol: String, out: String) =
      heavyHitters(df.select(col(keyCol)), Seq.empty, keyCol,
        minCount, capacity)
        .select(col("item").as("key"), col("est").as(out))
    side(a, aKey, "cnt_a")
      .join(broadcast(side(b, bKey, "cnt_b")), "key")
      .withColumn("fanout", col("cnt_a") * col("cnt_b"))
      .orderBy(col("fanout").desc, col("key").asc)
      .limit(topN)
  }
}
