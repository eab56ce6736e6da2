package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-journey analytics over an ordered event log: multi-touch
  * attribution and Markov transition estimation. The reference's
  * pipeline stops at sessionization (elb_logs.py:214-233); these are
  * the questions a marketing/product consumer asks of the same
  * sessionized log next, so they ship as first-class operators.
  *
  * Scale posture: everything per-user rides ONE hash exchange on the
  * user key. The conversion-segment windows partition by
  * (user, segment), and `HashPartitioning(user)` already satisfies
  * `ClusteredDistribution(user, segment)`, so Spark plans the cascade
  * as consecutive Window operators over a single shuffle — segment
  * boundaries only add a per-partition sort. The terminal channel /
  * transition aggregates are map-side-partial, so the second exchange
  * carries one row per (channel) or (src, dst), not per event.
  */
object Journey {

  /** Multi-touch attribution. Events are split per user into
    * conversion segments: each `convType` event closes the segment of
    * everything since the previous conversion. Touch events
    * (`touchTypes`) inside a closed segment share the conversion's
    * credit under three standard models:
    *
    *   - linear: 1/n to each of the n touches;
    *   - U-shaped (position-based): 40% first, 40% last, 20% spread
    *     over the middle (1.0 / 0.5-0.5 for 1- and 2-touch paths);
    *   - first/last-touch: whole credit to one end.
    *
    * Output, one row per touch channel: touch count, fractional
    * conversions under linear and U-shaped credit, first/last-touch
    * conversion counts, and linearly-attributed revenue (the
    * conversion event's `value` split like the linear credit).
    * Touches with no following conversion (open segments) earn
    * nothing and are dropped.
    *
    * Sums of per-touch fractional credits are rounded (6dp for
    * credit, 3dp for revenue): each addend is computed identically in
    * any engine, so only the reduction order can wobble the sum, and
    * rounding absorbs that ulp noise deterministically.
    */
  def attribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, valueCol: String,
      convType: String, touchTypes: Seq[String]): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(tsCol, idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val seg = events
      .withColumn("_cum",
        sum(when(col(typeCol) === convType, 1L).otherwise(0L)).over(byUser))
      // a conversion belongs to the segment it closes; a touch to the
      // segment the NEXT conversion will close
      .withColumn("_seg",
        when(col(typeCol) === convType, col("_cum")).otherwise(col("_cum") + 1))
      .withColumn("_is_touch",
        when(col(typeCol).isin(touchTypes.map(x => x: Any): _*), 1L)
          .otherwise(0L))
    val bySeg = Window.partitionBy(userCol, "_seg")
    val bySegOrd = Window.partitionBy(userCol, "_seg").orderBy(tsCol, idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val credited = seg
      .withColumn("_n", sum(col("_is_touch")).over(bySeg))
      .withColumn("_idx", sum(col("_is_touch")).over(bySegOrd))
      .withColumn("_conv_value",
        max(when(col(typeCol) === convType, col(valueCol))).over(bySeg))
      .filter(col("_is_touch") === 1L && col("_conv_value").isNotNull)
      .withColumn("_w_lin", lit(1.0d) / col("_n"))
      .withColumn("_w_pos",
        when(col("_n") === 1L, lit(1.0d))
          .when(col("_n") === 2L, lit(0.5d))
          .when(col("_idx") === 1L || col("_idx") === col("_n"), lit(0.4d))
          .otherwise(lit(0.2d) / (col("_n") - 2L)))
    credited
      .groupBy(col(typeCol).as("channel"))
      .agg(
        count(lit(1)).as("touches"),
        round(sum(col("_w_lin")), 6).as("conv_linear"),
        round(sum(col("_w_pos")), 6).as("conv_ushape"),
        sum(when(col("_idx") === 1L, 1L).otherwise(0L)).as("conv_first"),
        sum(when(col("_idx") === col("_n"), 1L).otherwise(0L)).as("conv_last"),
        round(sum(col("_conv_value") * col("_w_lin")), 3).as("rev_linear"))
  }

  /** First-order Markov transition matrix of the event-type chain:
    * per user, consecutive (src → dst) event pairs in (ts, id) order;
    * globally, the count and row-stochastic probability of each
    * transition. `p` is an exact-integer ratio evaluated in double —
    * correctly rounded, so engines agree bit-for-bit. The trailing
    * event of each user has no successor and is not a transition.
    */
  def markovTransitions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol, idCol)
    events
      .select(col(typeCol).as("src"),
        lead(col(typeCol), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n").cast("double") / sum(col("n")).over(Window.partitionBy("src")))
  }
}
