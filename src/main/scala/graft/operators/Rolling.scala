package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Per-key trailing time-window features (reference
  * `add_rolling_features`, elb_logs.py:271-292).
  *
  * pandas `rolling(window='5min', on='time')` uses a LEFT-OPEN,
  * right-closed interval `(t−Δ, t]`; Spark's `rangeBetween` is closed on
  * both ends, so we range over epoch MICROSECONDS with a `Δ−1 µs` lower
  * bound to exclude the exact left edge (SURVEY.md §2 op 37). The oracle
  * SQL mirrors the identical frame.
  *
  * Unlike the reference — which computes each rolling series into a
  * separate frame and merges it back on (key, time), fanning out on
  * duplicate pairs (SURVEY.md §2 op 31) — window functions compute in
  * place: no self-join, no fan-out, and both features share one
  * shuffle + sort because they use the same partition/order spec.
  */
object Rolling {

  /** Trailing `(t−micros, t]` frame per key, ordered by event time. */
  def trailing(keyCol: Column, timeCol: Column, micros: Long): WindowSpec =
    Window.partitionBy(keyCol)
      .orderBy(unix_micros(timeCol))
      .rangeBetween(-(micros - 1), 0)

  val FiveMinutes: Long = 5L * 60 * 1000000
  val OneHour: Long = 60L * 60 * 1000000

  /** The reference's exact pair: 5-min trailing request count + 1-h
    * trailing mean processing time.
    */
  def addRollingFeatures(
      df: DataFrame,
      keyCol: String = "client_ip",
      timeCol: String = "time",
      countCol: String = "request",
      avgCol: String = "total_processing_time"): DataFrame = {
    val w5 = trailing(col(keyCol), col(timeCol), FiveMinutes)
    val w1 = trailing(col(keyCol), col(timeCol), OneHour)
    df.withColumn("rolling_5min_request_count", count(col(countCol)).over(w5))
      .withColumn("rolling_1h_avg_processing", avg(col(avgCol)).over(w1))
  }
}
