package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines.
  *
  * Spark's `sample`/`randomSplit` are seed + PARTITION-LAYOUT dependent:
  * recompaction, AQE, or a different cluster silently reassigns rows
  * between train and test. Everything here keys off `md5(salt:id)`
  * instead — a pure function of the row, so membership is reproducible
  * on any engine, any partitioning, forever; md5 hex is uniform, so
  * lexicographic thresholds give unbiased fractions. Shuffle-free
  * except the per-group cap's window.
  */
object Sampling {

  private def hash(idCol: Column, salt: String): Column =
    md5(concat(lit(salt), lit(":"), idCol.cast("string")))

  /** Threshold hex string h such that P(md5 < h) = fraction. */
  def fractionThreshold(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"bad fraction $fraction")
    val scaled = (BigDecimal(fraction) * BigDecimal(BigInt(1) << 128)).toBigInt
      .min((BigInt(1) << 128) - 1)
    String.format("%032x", scaled.bigInteger)
  }

  /** Keep ~fraction of rows, membership decided only by (salt, id). */
  def deterministicSample(
      df: DataFrame, idCol: String, fraction: Double,
      salt: String = "sample"): DataFrame =
    df.where(hash(col(idCol), salt) < lit(fractionThreshold(fraction)))

  /** Weight-proportional Bernoulli sampling: keep a row with
    * probability min(1, weight / scaleWeight), membership a pure
    * function of (salt, id) like everything here. The uniform draw is
    * the row's 60-bit md5 prefix divided by 2⁶⁰ — an EXACT double
    * (integer ≤ 2⁶⁰ over a power of two), so the `u < w/scale`
    * comparison is two correctly-rounded IEEE ops with identical
    * inputs on any engine: reproducible, partitioning-independent,
    * and shuffle-free (a pushed-down filter, nothing else).
    */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, scaleWeight: Double,
      salt: String = "wsamp"): DataFrame = {
    require(scaleWeight > 0, s"bad scaleWeight $scaleWeight")
    val u = conv(substring(hash(col(idCol), salt), 1, 15), 16, 10)
      .cast("long").cast("double") / lit((1L << 60).toDouble)
    df.where(u < col(weightCol) / lit(scaleWeight))
  }

  /** Assign every row to a named split with the given weights —
    * the reproducible replacement for randomSplit. Weights are
    * normalized; bucket edges are cumulative thresholds over md5 space.
    */
  def assignSplit(
      df: DataFrame, idCol: String, weights: Seq[(String, Double)],
      salt: String = "split", splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0))
    val total = weights.map(_._2).sum
    val edges = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.dropRight(1).map(fractionThreshold)
    val h = hash(col(idCol), salt)
    val expr = weights.init.zip(edges).foldRight(
        lit(weights.last._1): Column) { case (((name, _), edge), rest) =>
      when(h < lit(edge), lit(name)).otherwise(rest)
    }
    df.withColumn(splitCol, expr)
  }

  /** Leakage-safe train/val/test split: rows arrive carrying a near-dup
    * CLUSTER label (from [[Dedup.connectedComponents]] over candidate
    * pairs), and the split hash is taken on the cluster — every member
    * of a near-dup family lands in the same split, so test-set
    * contamination by a training-set near-duplicate is structurally
    * impossible (a doc-level hash split scatters ~1−Σwᵢ² of multi-doc
    * clusters across splits). Same md5-threshold determinism as
    * [[assignSplit]]; split proportions are weighted by CLUSTER count,
    * which converges to the row weights when clusters are small.
    */
  def clusterAwareSplit(
      df: DataFrame, clusterCol: String, weights: Seq[(String, Double)],
      salt: String = "clsplit", splitCol: String = "split"): DataFrame =
    assignSplit(df, clusterCol, weights, salt, splitCol)

  /** The row's md5 key mapped to [0, 1): the top 60 bits of the hash as
    * an exact long, divided by 2⁶⁰. Every step is reproducible across
    * engines: the long→double cast and the divide by an exact power of
    * two round identically under IEEE 754.
    */
  def unitHash(idCol: Column, salt: String): Column =
    conv(substring(hash(idCol, salt), 1, 15), 16, 10)
      .cast("long").cast("double") / lit(1152921504606846976.0) // 2^60

  /** Temperature-weighted mixture sampling — the corpus-mixing step of a
    * pre-training pipeline: given groups (sources/languages) of very
    * different sizes, draw a ~`budgetFraction` sized corpus whose group
    * shares follow n^α (α = 1/2 here) instead of n, up-weighting small
    * groups without letting any group exceed its own size.
    *
    * Per group s:  w_s = ⌊√n_s⌋,  f_s = min(1, B·w_s / (W·n_s))
    * with B = ⌊N·budgetFraction⌋ and W = Σw — and a row is kept iff
    * `unitHash(id) < f_s`.
    *
    * Every quantity that feeds the threshold is an EXACT integer
    * (⌊√n⌋ is exact because IEEE sqrt is correctly rounded; the
    * products B·w and W·n are exact longs), so f_s is one double divide
    * — bit-identical in any engine, no accumulation-order hazard. The
    * group stats are a tiny aggregate broadcast back; membership itself
    * is the same partition-layout-independent md5 rule as
    * [[deterministicSample]]. Adds no shuffle over the data: the only
    * exchanges aggregate one row per group.
    */
  def temperatureMixture(
      df: DataFrame, idCol: String, groupCol: String,
      budgetFraction: Double, salt: String = "mix"): DataFrame = {
    require(budgetFraction > 0 && budgetFraction <= 1,
      s"bad budgetFraction $budgetFraction")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_w", floor(sqrt(col("_n").cast("double"))).cast("long"))
    val totals = counts.agg(sum(col("_n")).as("_total"), sum(col("_w")).as("_wsum"))
    val fracs = counts.crossJoin(broadcast(totals))
      .withColumn("_budget",
        floor(col("_total").cast("double") * budgetFraction).cast("long"))
      .withColumn("_f", least(lit(1.0),
        (col("_budget") * col("_w")).cast("double")
          / (col("_wsum") * col("_n")).cast("double")))
      .select(col(groupCol), col("_f"))
    df.join(broadcast(fracs), Seq(groupCol))
      .where(unitHash(col(idCol), salt) < col("_f"))
  }

  /** Keep at most `cap` rows per group, chosen in md5 order — a
    * deterministic "random" per-group downsample (class balancing,
    * per-domain caps). One shuffle on the group key.
    */
  def capPerGroup(
      df: DataFrame, groupCol: String, idCol: String, cap: Int,
      salt: String = "cap"): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hash(col(idCol), salt), col(idCol))
    df.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= cap)
      .drop("_rn")
  }

  /** Temporal train/test split with an embargo gap — the time-series
    * anti-leakage rule (de Prado's purged split, simplified to one
    * boundary): train ends at `trainPct`% of the observed time RANGE,
    * the following `embargoPct`% of the range is DISCARDED so
    * look-ahead features computed near the boundary can't leak label
    * information across it, and test is everything after the gap.
    *
    * Boundaries are exact integer-microsecond arithmetic on the
    * (min, max) timestamp pair, so every engine places every row
    * identically — no percentile estimation, no sampling. Cost: one
    * map-combining (min, max) aggregate, then a broadcast 1-row bounds
    * attach + a pushdown-friendly labeling projection; the data is
    * never shuffled.
    */
  def temporalSplit(
      df: DataFrame, tsCol: String,
      trainPct: Int = 80, embargoPct: Int = 5): DataFrame = {
    require(trainPct > 0 && embargoPct >= 0 && trainPct + embargoPct < 100,
      s"bad split percents: train=$trainPct embargo=$embargoPct")
    val us = unix_micros(col(tsCol))
    val bounds = df.agg(
      min(us).as("_mn"), max(us).as("_mx"))
    // integer DIV keeps the boundary placement exact on every engine
    // (float division puts a quotient within one ulp of an integer on
    // the wrong side of floor)
    df.crossJoin(broadcast(bounds))
      .withColumn("_cut1",
        col("_mn") + expr(s"(_mx - _mn) * $trainPct DIV 100"))
      .withColumn("_cut2",
        col("_mn") + expr(s"(_mx - _mn) * ${trainPct + embargoPct} DIV 100"))
      .withColumn("split",
        // NULL timestamps must NOT default into 'test' (an unknown-time
        // row in the evaluation set is exactly the leak this operator
        // exists to prevent) — label them for explicit downstream
        // handling instead
        when(us.isNull, "unknown")
          .when(us < col("_cut1"), "train")
          .when(us < col("_cut2"), "embargo")
          .otherwise("test"))
      .drop("_mn", "_mx", "_cut1", "_cut2")
  }

  /** Deterministic class-negative sampling for contrastive training:
    * each anchor row draws `k` partners (with replacement, standard
    * InfoNCE practice) uniformly from the pool of rows whose label
    * DIFFERS from the anchor's — rejection-free, because the pool is
    * materialized per excluded label and indexed densely, so the j-th
    * draw is just `md5(anchor, j) mod |pool|`. Same md5 determinism as
    * every sampler here: the draw is a pure function of (salt, anchor,
    * j), independent of layout, engine, and rerun.
    *
    * Cost shape: the pool table is (L−1) copies of the corpus for L
    * distinct labels — the CLASS-negative formulation, priced for
    * small L (supervised label sets); similarity-based hard negatives
    * at large L are the ANN side's job ([[Similarity]]). One window
    * rank per label partition, one broadcast size attach, one
    * (label, rank) hash join for the draws. The 60-bit-hash mod m
    * carries a ≤ m·2⁻⁶⁰ modulo bias — negligible and deterministic.
    *
    * Parallelism caveat (small-L pricing, stated fully): the pool rank
    * window partitions by the EXCLUDED label, so each of the L window
    * partitions sorts ~(L−1)/L·n rows in one task — the sort
    * parallelism is L, not the cluster. Fine at supervised label
    * counts; for huge corpora with tiny L, pre-assign dense per-label
    * indices arithmetically (ids dense ⇒ pool index is id minus the
    * count of same-label ids below it) instead of ranking.
    *
    * Degenerate input fails loud: an anchor whose cross-label pool is
    * empty (single-label input) raises rather than silently emitting
    * zero draws (`hash % 0` would null out and drop every row).
    */
  def negativeSample(
      df: DataFrame, idCol: String, labelCol: String, k: Int,
      salt: String = "neg"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val labels = df.select(col(labelCol).as("_alab")).distinct()
    // Eager degenerate-input guard: with one distinct label every
    // cross-label pool is empty and `hash % 0` nulls every draw — the
    // empty result would look like success. A lazy row-level
    // raise_error can't catch it (AQE's empty-relation propagation
    // prunes the projection along with the empty join). limit(2)
    // early-outs each partial distinct at two rows, so the probe costs
    // one cheap label-column pass next to the (L−1)·n pool build.
    require(labels.limit(2).count() >= 2,
      "negativeSample: input needs at least 2 distinct labels " +
        "(every cross-label pool is empty otherwise)")
    val pool = broadcast(labels)
      .join(df.select(col(idCol).as("_nid"), col(labelCol).as("_nlab")),
        col("_alab") =!= col("_nlab"))
    val ranked = pool.withColumn("_r",
      row_number().over(
        Window.partitionBy(col("_alab")).orderBy(col("_nid"))) - 1)
    // pool size per excluded label is just N − count(label): one tiny
    // aggregate instead of re-materializing the (L−1)·n pool subtree
    val counts = df.groupBy(col(labelCol).as("_alab"))
      .agg(count(lit(1)).as("_c"))
    val sizes = counts
      .crossJoin(broadcast(counts.agg(sum(col("_c")).as("_n"))))
      .select(col("_alab"), (col("_n") - col("_c")).as("_m"))
    val draws = df.select(col(idCol).as("anchor_id"), col(labelCol).as("_alab"))
      .join(broadcast(sizes), "_alab")
      .withColumn("j", explode(sequence(lit(1), lit(k))))
      .withColumn("_idx",
        Sketches.hash60(
          concat(col("anchor_id").cast("string"), lit(":"),
            col("j").cast("string")),
          salt) % col("_m"))
    draws.join(ranked, Seq("_alab"))
      .where(col("_idx") === col("_r"))
      .select(col("anchor_id"), col("j"),
        col("_nid").as("neg_id"),
        col("_alab").as("anchor_label"),
        col("_nlab").as("neg_label"))
  }
}
