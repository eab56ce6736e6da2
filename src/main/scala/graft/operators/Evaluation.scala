package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact classifier-evaluation metrics — the readouts a training-data
  * pipeline runs when it calibrates a quality/toxicity classifier over
  * the corpus before filtering with it.
  *
  * All three metrics are reformulated away from their textbook
  * "globally sort the scores and rank" shape, which at 100 TB means a
  * single-partition window over every row. Instead scores quantize to
  * integer cents and collapse to ONE row per distinct score value
  * first (a map-side-combining hash aggregate — the score domain, not
  * the row count, bounds what survives). The only ordered window then
  * runs over that distinct-score table: O(|score domain|) rows, the
  * same bounded-global-window device as Clustering's seed draw and
  * Packing's prefix sum. Every intermediate is an exact integer, so
  * the DuckDB oracle hash-matches bit-for-bit; the only doubles are
  * the final divisions.
  */
object Evaluation {

  private def cents(c: Column): Column =
    (c.cast("decimal(12,2)") * 100).cast("bigint")

  /** Exact ROC AUC by pair counting (the Mann-Whitney U identity):
    *   AUC · n⁺ · n⁻ = #(pos score > neg score) + ½ · #(pos = neg)
    * Per distinct score s: p_s positives, n_s negatives, and the
    * running count of negatives strictly below s gives
    *   pairs_won = Σ_s p_s · cum_neg(<s),  ties = Σ_s p_s · n_s —
    * both exact BIGINTs; auc = (2·pairs_won + ties) / (2·n⁺·n⁻) is one
    * terminal division (½-tie convention folded in by the ×2 trick, so
    * no fractional intermediates exist to round).
    */
  def aucExact(df: DataFrame, scoreCol: String, positive: Column): DataFrame = {
    // null scores are excluded (not rankable) — and keeping them would
    // diverge per engine: Spark's Window.orderBy sorts nulls first,
    // DuckDB's ORDER BY defaults nulls last
    val perScore = df
      .where(col(scoreCol).isNotNull)
      .select(cents(col(scoreCol)).as("_s"),
        when(positive, 1L).otherwise(0L).as("_y"))
      .groupBy(col("_s"))
      .agg(sum(col("_y")).as("_p"), sum(lit(1L) - col("_y")).as("_n"))
    // ordered window over DISTINCT scores only — bounded by the score
    // domain (here ≤ ~50k cents values), never by the row count
    val belowW = Window.orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    // p_s·cum_neg products and their sums reach n⁺·n⁻ — far past int64
    // at large row counts — so multiply in decimal(38,0) (the repo's
    // widening convention; DuckDB promotes to HUGEINT the same way).
    // The integer outputs narrow back to BIGINT where overflow is loud,
    // never silent; auc derives from the wide values directly.
    perScore
      .withColumn("_cumneg", coalesce(sum(col("_n")).over(belowW), lit(0L)))
      .agg(
        sum(col("_p")).as("n_pos"),
        sum(col("_n")).as("n_neg"),
        sum(col("_p").cast("decimal(38,0)") * col("_cumneg")).as("_pw"),
        sum(col("_p").cast("decimal(38,0)") * col("_n")).as("_t"))
      .select(col("n_pos"), col("n_neg"),
        col("_pw").cast("long").as("pairs_won"),
        col("_t").cast("long").as("ties"),
        ((lit(2).cast("decimal(38,0)") * col("_pw") + col("_t")).cast("double")
          / (lit(2).cast("decimal(38,0)") * col("n_pos") * col("n_neg"))
            .cast("double")).as("auc"))
  }

  /** Reliability-curve bins: fixed-width score buckets, per bucket the
    * exact event count, positive count, summed score cents, and the
    * two derived doubles (mean score, positive fraction) a calibration
    * plot needs. One hash aggregate, ≤ `bins` output rows.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, positive: Column,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    val rangeCents = math.round((hi - lo) * 100)
    // the width is materialized in whole cents; a non-divisible range
    // would silently drift the upper bin edges, so fail loudly instead
    require(rangeCents % bins == 0,
      s"[$lo, $hi) spans $rangeCents cents, not divisible into $bins equal" +
        " whole-cent bins — pick a representable range/bin count")
    val widthCents = rangeCents / bins
    val loCents = math.round(lo * 100)
    require(widthCents > 0,
      s"bin width must be ≥ 1 cent: [$lo, $hi) over $bins bins gives $widthCents")
    // integer DIV (not Column./, which is double division) keeps the
    // bin id exact on both engines
    val bin = least(lit(bins - 1L),
      greatest(lit(0L), expr(s"(_s - ${loCents}L) DIV ${widthCents}L")))
    df.where(col(scoreCol).isNotNull) // null scores excluded, as in aucExact
      .select(cents(col(scoreCol)).as("_s"),
        when(positive, 1L).otherwise(0L).as("_y"))
      .select(bin.cast("bigint").as("bin"), col("_s"), col("_y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("_y")).as("n_pos"),
        sum(col("_s")).as("sum_cents"))
      .withColumn("mean_score",
        col("sum_cents").cast("double") / (lit(100L) * col("n")).cast("double"))
      .withColumn("frac_pos",
        col("n_pos").cast("double") / col("n").cast("double"))
  }

  /** Exact two-sample Kolmogorov-Smirnov statistic between the score
    * distributions of two event populations:
    *   D = max_s |CDF_A(s) − CDF_B(s)|
    * evaluated only at the distinct score values (the CDF difference
    * is piecewise-constant between them). The comparison
    * cross-multiplies to integers — |cumA·n_B − cumB·n_A| — so the max
    * is over exact BIGINTs and D divides once at the end.
    */
  def ksStatistic(df: DataFrame, scoreCol: String, inA: Column): DataFrame = {
    val perScore = df
      .where(col(scoreCol).isNotNull) // null scores excluded, as in aucExact
      .select(cents(col(scoreCol)).as("_s"),
        when(inA, 1L).otherwise(0L).as("_a"))
      .groupBy(col("_s"))
      .agg(sum(col("_a")).as("_na"), sum(lit(1L) - col("_a")).as("_nb"))
    val upToW = Window.orderBy(col("_s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totW = Window.partitionBy()
    perScore
      .withColumn("_cuma", sum(col("_na")).over(upToW))
      .withColumn("_cumb", sum(col("_nb")).over(upToW))
      .withColumn("_ta", sum(col("_na")).over(totW))
      .withColumn("_tb", sum(col("_nb")).over(totW))
      .agg(
        max(col("_ta")).as("n_a"),
        max(col("_tb")).as("n_b"),
        // cum·total reaches n_a·n_b — widen before multiplying, as in
        // aucExact; BIGINT output narrows loudly, ks_d uses the wide max
        max(abs(col("_cuma").cast("decimal(38,0)") * col("_tb")
          - col("_cumb").cast("decimal(38,0)") * col("_ta")))
          .as("_mc"))
      .select(col("n_a"), col("n_b"),
        col("_mc").cast("long").as("max_cross"),
        (col("_mc").cast("double")
          / (col("n_a").cast("decimal(38,0)") * col("n_b")).cast("double"))
          .as("ks_d"))
  }
}
