package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** A/B experiment readout over a deterministic 50/50 hash split:
    * users are assigned by the first hex digit of md5(salt:user) — a
    * stable, engine-portable coin that never needs an assignment
    * table — and the per-user metric is the count of `convType`
    * events. Output is ONE row: group sizes, metric means, variances
    * of the mean, and the Welch t statistic.
    *
    * All moments accumulate as exact integer sums (s, s²) through one
    * per-user aggregate and one global conditional aggregate; the
    * divisions and the sqrt happen once, on the final row, so the
    * statistic is bit-identical across engines and partitionings.
    */
  def abTest(events: DataFrame, userCol: String, typeCol: String,
      convType: String, salt: String = "ab"): DataFrame = {
    val variant = when(
      substring(md5(concat(lit(salt + ":"), col(userCol).cast("string"))), 1, 1)
        .isin("0", "1", "2", "3", "4", "5", "6", "7"), "A").otherwise("B")
    val perUser = events
      .groupBy(col(userCol))
      .agg(sum(when(col(typeCol) === convType, 1L).otherwise(0L)).as("x"))
      .withColumn("variant", variant)
    def side(v: String, c: Column) = sum(when(col("variant") === v, c).otherwise(0L))
    val s = perUser.agg(
      side("A", lit(1L)).as("n_a"), side("A", col("x")).as("s_a"),
      side("A", col("x") * col("x")).as("q_a"),
      side("B", lit(1L)).as("n_b"), side("B", col("x")).as("s_b"),
      side("B", col("x") * col("x")).as("q_b"))
    def meanOf(sc: String, nc: String) = col(sc).cast("double") / col(nc)
    def varMean(n: String, sm: String, q: String) =
      (col(n) * col(q) - col(sm) * col(sm)).cast("double") /
        (col(n).cast("double") * col(n) * (col(n) - 1))
    s.select(col("n_a"), col("n_b"),
      meanOf("s_a", "n_a").as("mean_a"), meanOf("s_b", "n_b").as("mean_b"),
      varMean("n_a", "s_a", "q_a").as("var_mean_a"),
      varMean("n_b", "s_b", "q_b").as("var_mean_b"),
      ((meanOf("s_a", "n_a") - meanOf("s_b", "n_b")) /
        sqrt(varMean("n_a", "s_a", "q_a") + varMean("n_b", "s_b", "q_b")))
        .as("t_welch"))
  }

  /** Daily active users and 7-day rolling actives (WAU) per observed
    * day, with the DAU/WAU stickiness ratio. The rolling distinct is
    * NOT a window over raw events (count-distinct windows don't
    * partial-aggregate); instead each (user, active-day) pair fans
    * out to the 7 calendar days it keeps the user "weekly active"
    * for, and a plain distinct + count per day does the rest — the
    * standard explode-then-dedup shape that scales linearly and
    * map-side combines. Days outside the observed set are dropped via
    * an equi-join with the day dimension (no unbounded calendar).
    */
  def dauWau(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ad = events
      .select(to_date(col(tsCol)).as("day"), col(userCol).as("u"))
      .distinct()
    val days = ad.select(col("day")).distinct()
    val fan = ad
      .select(col("u"), explode(sequence(lit(0), lit(6))).as("i"),
        col("day"))
      .select(col("u"), date_add(col("day"), col("i")).as("wday"))
      .distinct()
    val wau = fan.join(days, fan("wday") === days("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    val dau = ad.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau")).as("stickiness"))
  }

  /** Top-k most common length-`pathLen` opening journeys: each user's
    * first `pathLen` event types in (ts, id) order joined with '>',
    * counted across users, deterministic top-k by (count desc, path).
    * The path pivots through `pathLen` conditional MINs — no
    * collect_list ordering hazards, and the per-user collapse reuses
    * the rank window's user partitioning. Short histories keep their
    * prefix (concat_ws skips the missing steps).
    */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, pathLen: Int = 5,
      topK: Int = 20): DataFrame = {
    require(pathLen >= 1 && topK >= 1, s"need pathLen/topK >= 1")
    val w = Window.partitionBy(userCol).orderBy(tsCol, idCol)
    val steps = (1 to pathLen).map(i =>
      min(when(col("_rn") === i, col(typeCol))).as(s"_s$i"))
    events
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= pathLen)
      .groupBy(col(userCol))
      .agg(steps.head, steps.tail: _*)
      .select(concat_ws(">", (1 to pathLen).map(i => col(s"_s$i")): _*)
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(topK)
  }
}
