package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: points against [start, end]
  * intervals, both sides numeric (callers convert dates/timestamps to
  * day/epoch numbers first).
  *
  * The naive formulation — `points JOIN intervals ON p BETWEEN s AND e`
  * — has no equi-key, so Spark plans a broadcast-nested-loop join:
  * O(|P|·|I|) comparisons and a full scan of the interval table per
  * point partition. That dies long before 100 TB.
  *
  * This operator bins the number line: every interval explodes to the
  * integer bins it covers, every point maps to exactly ONE bin, and the
  * join becomes an equi-join on the bin plus a residual containment
  * filter. Because a point has one bin, each (point, interval) match is
  * produced exactly once — no dedup pass. Cost: the interval side
  * inflates by avg(intervalWidth/binWidth + 1) rows (pick `binWidth`
  * near the typical interval length to keep that ~2×), and the
  * equi-join shuffles/broadcasts like any other join, AQE and all.
  * This is the standard bucketed interval-join trick used by scale-out
  * engines for time-range and genomics workloads.
  */
object RangeJoin {

  /** @param points    table with numeric `pointCol`
    * @param intervals table with numeric `startCol` <= `endCol`
    * @param binWidth  bin size in the same units as the point column
    */
  def intervalJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // the join keeps every column from both sides, so any shared name
    // would come back ambiguous — refuse up front rather than let a
    // downstream resolve error (or a silently shadowed column) surface
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points and intervals must have disjoint column names; shared: " +
        shared.toSeq.sorted.mkString(", "))
    // collision-proof temp key: probe until unused on either side
    val taken = points.columns.toSet ++ intervals.columns.toSet
    val bin = Iterator.from(0).map(i => if (i == 0) "_bin" else s"_bin$i")
      .find(!taken.contains(_)).get
    val binned = intervals.withColumn(bin,
      explode(sequence(
        floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    points
      .withColumn(bin, floor(col(pointCol) / binWidth).cast("long"))
      .join(binned, Seq(bin))
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(bin)
  }
}
