package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two row populations (train vs
  * serve, last week vs this week): per key, bucket the POOLED value
  * distribution into equal-frequency bins and compare the two sides'
  * bin masses by total-variation distance, TV = ½·Σ|pᵢ − qᵢ|.
  *
  * Why TV and not PSI/KL: the classic drift scores need ln(), and a
  * libm transcendental is the one thing this engine's bit-exact oracle
  * discipline can't carry across engines (last-ulp drift). TV needs no
  * logarithm AND clears the common denominator exactly:
  * Σ|pᵢ − qᵢ| = Σ|Aᵢ·tot_b − Bᵢ·tot_a| / (tot_a·tot_b) — the numerator
  * is an exact BIGINT, so the statistic is ONE terminal division.
  * (TV is also what ε-guarantees are usually stated in.)
  *
  * Scale shape: one (key, value) hash-aggregate collapses the raw rows
  * (map-side combining), the equal-frequency binning windows run over
  * the DISTINCT-value table per key (bounded by the value domain — the
  * feature_bins/auc discipline), and everything after is bins-sized.
  * A key present on only one side reports tv = NULL (division gated,
  * not NaN).
  */
object Drift {

  /** `flagCol` must be a non-null boolean: true → population A.
    * Output per key: n_bins, tot_a, tot_b, tv_num (= Σ|A·tot_b −
    * B·tot_a|, exact), tv (double in [0,1]).
    */
  def tvDrift(df: DataFrame, keyCol: Column, valueCol: Column,
      flagCol: Column, bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 1000, s"bins in [2,1000], got $bins")
    val v = df
      .groupBy(keyCol.as("_k"), valueCol.as("_v"))
      .agg(count_if(flagCol).as("ca"), count_if(!flagCol).as("cb"))
      .withColumn("cnt", col("ca") + col("cb"))
    val wBefore = Window.partitionBy("_k").orderBy("_v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wKey = Window.partitionBy("_k")
    val perBin = v
      .withColumn("cum", coalesce(sum(col("cnt")).over(wBefore), lit(0L)))
      .withColumn("tot", sum(col("cnt")).over(wKey))
      .withColumn("bin",
        least(lit((bins - 1).toLong), expr(s"(cum * $bins) DIV tot")))
      .groupBy(col("_k"), col("bin"))
      .agg(sum(col("ca")).as("A"), sum(col("cb")).as("B"))
    perBin
      .withColumn("tot_a", sum(col("A")).over(wKey))
      .withColumn("tot_b", sum(col("B")).over(wKey))
      .withColumn("term",
        abs(col("A") * col("tot_b") - col("B") * col("tot_a")))
      .groupBy(col("_k"))
      .agg(count(lit(1)).as("n_bins"),
        max(col("tot_a")).as("tot_a"), max(col("tot_b")).as("tot_b"),
        sum(col("term")).as("tv_num"))
      .withColumn("tv",
        when(col("tot_a") === 0 || col("tot_b") === 0, lit(null).cast("double"))
          .otherwise(col("tv_num").cast("double")
            / (lit(2L) * col("tot_a") * col("tot_b")).cast("double")))
  }
}
