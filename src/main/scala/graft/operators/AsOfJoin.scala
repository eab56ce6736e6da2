package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, TimestampType}

/** Point-in-time (as-of) join: for every left row, attach ONE right row
  * with the same key chosen by time direction — pandas `merge_asof`
  * parity, three directions:
  *
  *  - [[asOf]] (backward): the most recent right row with
  *    `rightTime ≤ leftTime` — the lookup that keeps feature
  *    engineering leak-free (a training example may only see state
  *    that existed at its own timestamp). Right-time ties resolve
  *    toward the LARGEST tie-break.
  *  - [[asOfForward]]: the earliest right row with
  *    `rightTime ≥ leftTime`; ties toward the SMALLEST tie-break (the
  *    mirror).
  *  - [[asOfNearest]]: whichever of those two is closer in absolute
  *    event time (exact integer-microsecond compare); distance ties
  *    prefer the backward match — the only default a leak-averse
  *    pipeline can justify.
  *
  * Spark has no native as-of join. Rather than a custom
  * LogicalPlan/Strategy (preference order: compose builtins first,
  * SURVEY.md §7.3), all three share the union-sort formulation: tag
  * both sides, union, and carry the matched right-side ROW as one
  * struct via `last`/`first(ignoreNulls = true)` over a single
  * `partitionBy(key).orderBy(time, side, tieBreak)` window. Carrying a
  * struct (not per-column lasts) means a legitimately-null right
  * column never "sees through" to a different right row. The side
  * polarity decides equal-time semantics: whichever side sorts FIRST
  * at equal times is visible to the other's frame, so backward puts
  * rights first (≤ matches) and forward puts lefts first (≥ matches).
  *
  * Scale shape: ONE shuffle + sort over |left| + |right| rows — no
  * per-row range probe and no O(|left| × matches) join blowup; skew is
  * bounded per key like any window.
  */
object AsOfJoin {

  /** The shared tag-union scaffold: both sides projected onto
    * (key, _t, _side, _rtb, _rv, left columns), unioned, with the one
    * (key)-partitioned sort every direction uses. `leftSide` sets the
    * equal-time polarity (see class doc); `carryRightTime` prepends
    * the right row's own time as `_rt` inside the carried struct
    * (nearest needs it for the distance compare).
    */
  private def tagged(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: Column,
      rightValueCols: Seq[String],
      leftSide: Int,
      carryRightTime: Boolean): (DataFrame, WindowSpec) = {

    val leftCols = left.columns.toSeq
    val rvFields = rightValueCols.map(c => right.schema(c))
    val rvType = StructType(
      if (carryRightTime) StructField("_rt", TimestampType) +: rvFields
      else rvFields)
    val rvStruct =
      if (carryRightTime)
        struct(col(rightTime).cast("timestamp").as("_rt") +:
          rightValueCols.map(col): _*)
      else struct(rightValueCols.map(col): _*)

    val l = left.select(
      (col(key) +: col(leftTime).cast("timestamp").as("_t") +:
        lit(leftSide).as("_side") +:
        lit(null).cast("long").as("_rtb") +:
        lit(null).cast(rvType).as("_rv") +:
        leftCols.filterNot(_ == key).map(col)): _*)
    val r = right.select(
      (col(key) +: col(rightTime).cast("timestamp").as("_t") +:
        lit(1 - leftSide).as("_side") +:
        rightTieBreak.cast("long").as("_rtb") +:
        rvStruct.as("_rv") +:
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val sort = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_side").asc, col("_rtb").asc_nulls_last)
    (l.unionByName(r), sort)
  }

  private def project(
      picked: DataFrame, leftCols: Seq[String], rightValueCols: Seq[String],
      leftSide: Int): DataFrame =
    picked.where(col("_side") === leftSide)
      .select((leftCols.map(col) ++
        rightValueCols.map(c => col(s"_rv.$c").as(c))): _*)

  /** Backward as-of (see class doc). */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: Column,
      rightValueCols: Seq[String]): DataFrame = {
    // rights first at equal times (≤ matches); last over the PRECEDING
    // frame = latest right ≤ t, tie to largest _rtb
    val (u, sort) = tagged(left, right, key, leftTime, rightTime,
      rightTieBreak, rightValueCols, leftSide = 1, carryRightTime = false)
    val back = sort.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    project(u.withColumn("_rv", last(col("_rv"), ignoreNulls = true).over(back)),
      left.columns.toSeq, rightValueCols, leftSide = 1)
  }

  /** Forward as-of (see class doc). */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: Column,
      rightValueCols: Seq[String]): DataFrame = {
    // lefts first at equal times (≥ matches); first over the FOLLOWING
    // frame = earliest right ≥ t, tie to smallest _rtb
    val (u, sort) = tagged(left, right, key, leftTime, rightTime,
      rightTieBreak, rightValueCols, leftSide = 0, carryRightTime = false)
    val fwd = sort.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    project(u.withColumn("_rv", first(col("_rv"), ignoreNulls = true).over(fwd)),
      left.columns.toSeq, rightValueCols, leftSide = 0)
  }

  /** Nearest as-of (see class doc). Equal-time rights sort before the
    * left, so they are the BACKWARD candidate at distance 0 — which
    * also wins the tie — and the forward frame only sees strictly
    * later rights.
    */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: Column,
      rightValueCols: Seq[String]): DataFrame = {
    val (u, sort) = tagged(left, right, key, leftTime, rightTime,
      rightTieBreak, rightValueCols, leftSide = 1, carryRightTime = true)
    val back = sort.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = sort.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val diffB = abs(unix_micros(col("_t")) - unix_micros(col("_b._rt")))
    val diffF = abs(unix_micros(col("_t")) - unix_micros(col("_f._rt")))
    val picked = u
      .withColumn("_b", last(col("_rv"), ignoreNulls = true).over(back))
      .withColumn("_f", first(col("_rv"), ignoreNulls = true).over(fwd))
      .withColumn("_rv",
        when(col("_b").isNull, col("_f"))
          .when(col("_f").isNull, col("_b"))
          .when(diffB <= diffF, col("_b"))
          .otherwise(col("_f")))
    project(picked, left.columns.toSeq, rightValueCols, leftSide = 1)
  }
}
