package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite (Deequ-style) — the
  * contract gate a pipeline runs on every new data drop before
  * publishing it downstream.
  *
  * A check is (name, violation-count expression); the whole suite
  * compiles to ONE wide aggregate over a single scan — no per-check
  * jobs, no joins, and the shuffle carries exactly one row regardless
  * of input size, so the pass costs one table scan at any scale. The
  * report is long-format `(check_name, violations, passed)` via the
  * same `stack()` device as [[Profiling.profile]].
  *
  * Referential-integrity checks need a second table, so they cannot
  * ride the single scan; [[refIntegrity]] emits a one-row report from
  * a left-anti join (broadcast when the dimension is small — at 100 TB
  * the dim side of an RI check is a key projection, orders of
  * magnitude smaller than the fact) that callers `unionByName` onto
  * the scan report.
  *
  * All metrics are exact integer counts — hash-stable across engines.
  */
object DataQuality {

  /** A named constraint: `violations` counts offending rows. */
  final case class Check(name: String, violations: Column)

  /** Rows with a NULL in `c`. */
  def complete(c: String): Check =
    Check(s"complete_$c", count_if(col(c).isNull))

  /** Duplicate rows beyond the first per `c` value (exact). */
  def unique(c: String): Check =
    Check(s"unique_$c", count(col(c)) - countDistinct(col(c)))

  /** Non-null rows outside [lo, hi]. */
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"range_$c", count_if(col(c) < lo || col(c) > hi))

  /** Non-null rows whose value is not in `allowed`. */
  def inSet(c: String, allowed: Seq[String]): Check =
    Check(s"set_$c", count_if(col(c).isNotNull && !col(c).isin(allowed: _*)))

  /** Non-null rows not matching the anchored regex. */
  def matches(c: String, regex: String): Check =
    Check(s"pattern_$c", count_if(col(c).isNotNull && !col(c).rlike(regex)))

  /** One-pass report: one row per check, exact violation counts.
    * Single wide hash aggregate; `passed` derived from the count so
    * the oracle recomputes it identically.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "need at least one check")
    val aggs = checks.map(ch => ch.violations.cast("long").as(s"_v_${ch.name}"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = checks.map(ch => s"'${ch.name}', `_v_${ch.name}`")
      .mkString(s"stack(${checks.size}, ", ", ", ")")
    one.select(expr(s"$stackExpr AS (check_name, violations)"))
      .select(col("check_name"), col("violations"),
        (col("violations") === 0L).as("passed"))
  }

  /** Referential integrity: fact rows whose `factKey` has no match in
    * `dim.dimKey`. Left-anti join (Catalyst broadcasts the dim key
    * projection when small), then a one-row count.
    */
  def refIntegrity(name: String, fact: DataFrame, factKey: String,
                   dim: DataFrame, dimKey: String): DataFrame = {
    val orphans = fact.join(
        broadcast(dim.select(col(dimKey).as(factKey)).distinct),
        Seq(factKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
    orphans.select(lit(name).as("check_name"), col("violations"),
      (col("violations") === 0L).as("passed"))
  }
}
