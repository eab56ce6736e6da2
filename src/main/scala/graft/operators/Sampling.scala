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
}
