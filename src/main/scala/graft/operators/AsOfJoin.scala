package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Point-in-time (as-of) join: for every left row, attach the single
  * most recent right row with the same key and `rightTime ≤ leftTime` —
  * the lookup that keeps feature engineering leak-free (a training
  * example may only see state that existed at its own timestamp).
  *
  * Spark has no native as-of join. Rather than a custom
  * LogicalPlan/Strategy (preference order: compose builtins first,
  * SURVEY.md §7.3), this is the union-sort formulation: tag both sides,
  * union, and carry the latest right-side ROW forward as one struct via
  * `last(ignoreNulls = true)` over a single
  * `partitionBy(key).orderBy(time, side, tieBreak)` window. Carrying a
  * struct (not per-column lasts) means a legitimately-null right column
  * never "sees through" to an older right row.
  *
  * Scale shape: ONE shuffle + sort over |left| + |right| rows — no
  * per-row range probe and no O(|left| × matches) join blowup; skew is
  * bounded per key like any window. Right rows at exactly the left
  * row's timestamp DO match (≤ semantics): the right side sorts before
  * the left at equal times. Right-side timestamp ties resolve toward
  * the largest `rightTieBreak`, keeping output deterministic.
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: Column,
      rightValueCols: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val rvType = StructType(rightValueCols.map(c => right.schema(c)))

    val l = left.select(
      (col(key) +: col(leftTime).cast("timestamp").as("_t") +: lit(1).as("_side") +:
        lit(null).cast("long").as("_rtb") +:
        lit(null).cast(rvType).as("_rv") +:
        leftCols.filterNot(_ == key).map(col)): _*)
    val r = right.select(
      (col(key) +: col(rightTime).cast("timestamp").as("_t") +: lit(0).as("_side") +:
        rightTieBreak.cast("long").as("_rtb") +:
        struct(rightValueCols.map(col): _*).as("_rv") +:
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_side").asc, col("_rtb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn("_rv", last(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select((leftCols.map(col) ++
        rightValueCols.map(c => col(s"_rv.$c").as(c))): _*)
  }

  /** Forward as-of: attach the EARLIEST right row with the same key and
    * `rightTime ≥ leftTime` — pandas `merge_asof(direction="forward")`.
    * Mirror image of [[asOf]]: the left row sorts BEFORE right rows at
    * equal times (so an exact-time right matches, ≥ semantics) and the
    * carried struct comes from `first(ignoreNulls)` over the FOLLOWING
    * frame of the same single (key)-partitioned sort. Right-time ties
    * resolve toward the SMALLEST tie-break (the mirror of backward's
    * largest). Same scale shape: one shuffle + sort over |L| + |R|.
    */
  def asOfForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: Column,
      rightValueCols: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val rvType = StructType(rightValueCols.map(c => right.schema(c)))

    val l = left.select(
      (col(key) +: col(leftTime).cast("timestamp").as("_t") +: lit(0).as("_side") +:
        lit(null).cast("long").as("_rtb") +:
        lit(null).cast(rvType).as("_rv") +:
        leftCols.filterNot(_ == key).map(col)): _*)
    val r = right.select(
      (col(key) +: col(rightTime).cast("timestamp").as("_t") +: lit(1).as("_side") +:
        rightTieBreak.cast("long").as("_rtb") +:
        struct(rightValueCols.map(col): _*).as("_rv") +:
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_side").asc, col("_rtb").asc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    l.unionByName(r)
      .withColumn("_rv", first(col("_rv"), ignoreNulls = true).over(w))
      .where(col("_side") === 0)
      .select((leftCols.map(col) ++
        rightValueCols.map(c => col(s"_rv.$c").as(c))): _*)
  }

  /** Nearest as-of: whichever of the backward and forward matches is
    * closer in absolute event time — pandas
    * `merge_asof(direction="nearest")`. Distance ties prefer the
    * BACKWARD match (the only state a leak-free feature pipeline may
    * default to). Both candidates come from the SAME
    * (key)-partitioned sort — rights sort before lefts at equal times,
    * so an exact-time right is the backward candidate at distance 0 —
    * and the matched right time rides inside the carried struct for
    * the exact integer-microsecond distance compare. Still one
    * shuffle + sort; the two window frames share the sort order.
    */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightTieBreak: Column,
      rightValueCols: Seq[String]): DataFrame = {

    val leftCols = left.columns.toSeq
    val rvtType = StructType(
      org.apache.spark.sql.types.StructField("_rt",
        org.apache.spark.sql.types.TimestampType) +:
        rightValueCols.map(c => right.schema(c)))

    val l = left.select(
      (col(key) +: col(leftTime).cast("timestamp").as("_t") +: lit(1).as("_side") +:
        lit(null).cast("long").as("_rtb") +:
        lit(null).cast(rvtType).as("_rvt") +:
        leftCols.filterNot(_ == key).map(col)): _*)
    val r = right.select(
      (col(key) +: col(rightTime).cast("timestamp").as("_t") +: lit(0).as("_side") +:
        rightTieBreak.cast("long").as("_rtb") +:
        struct(col(rightTime).cast("timestamp").as("_rt") +:
          rightValueCols.map(col): _*).as("_rvt") +:
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c))): _*)

    val sort = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_side").asc, col("_rtb").asc_nulls_last)
    val back = sort.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = sort.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val diffB = abs(unix_micros(col("_t")) - unix_micros(col("_b._rt")))
    val diffF = abs(unix_micros(col("_t")) - unix_micros(col("_f._rt")))
    l.unionByName(r)
      .withColumn("_b", last(col("_rvt"), ignoreNulls = true).over(back))
      .withColumn("_f", first(col("_rvt"), ignoreNulls = true).over(fwd))
      .where(col("_side") === 1)
      .withColumn("_rvt",
        when(col("_b").isNull, col("_f"))
          .when(col("_f").isNull, col("_b"))
          .when(diffB <= diffF, col("_b"))
          .otherwise(col("_f")))
      .select((leftCols.map(col) ++
        rightValueCols.map(c => col(s"_rvt.$c").as(c))): _*)
  }
}
