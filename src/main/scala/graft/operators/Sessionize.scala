package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands sessionization (reference `sessionize_logs`,
  * elb_logs.py:310-316): per-key time diff → boundary flag on gap >
  * `gapMinutes` → running-count session number → `"{ip}_s{n}"` id.
  *
  * One shuffle on the key column; both window functions (lag + running
  * sum) share the single `partitionBy(key).orderBy(time)` sort, so
  * Catalyst plans exactly one exchange + one sort. At cluster scale the
  * partitioning hashes on the key — skewed hot keys (one chatty IP) are
  * bounded by per-key row counts, not table size, and AQE handles the
  * long tail.
  *
  * Tie-break: pandas relies on stable sort order for duplicate (key,
  * time) pairs; a distributed engine has no "original order", so callers
  * pass a deterministic `tieBreak` column (any unique id) to make output
  * reproducible.
  */
object Sessionize {

  def sessionize(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      tieBreak: Column,
      gapMinutes: Int = 30,
      idCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(timeCol), tieBreak)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapMicros = gapMinutes.toLong * 60L * 1000000L

    df.withColumn("time_diff_micros",
        coalesce(
          unix_micros(col(timeCol)) - lag(unix_micros(col(timeCol)), 1).over(w),
          lit(0L)))
      .withColumn("new_session", col("time_diff_micros") > gapMicros)
      .withColumn("session_number",
        sum(col("new_session").cast("long")).over(run))
      .withColumn(idCol,
        concat(col(keyCol).cast("string"), lit("_s"), col("session_number")))
  }
}
