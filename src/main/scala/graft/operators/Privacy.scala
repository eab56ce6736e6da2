package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy auditing and anonymization for training-data release:
  * k-anonymity class audit, deterministic differentially-private
  * counts, and quasi-identifier pseudonymization/generalization.
  *
  * Everything here is engine-exact (integer arithmetic, md5-derived
  * determinism — same layout-independence argument as
  * [[Sampling]]'s md5 draws), so the DuckDB oracles reproduce results
  * bit-for-bit.
  */
object Privacy {

  /** k-anonymity audit: group rows by their quasi-identifier tuple and
    * histogram the equivalence-class sizes. A release is k-anonymous
    * iff the smallest class size ≥ k; the histogram shows how far the
    * table is from that and how many rows sit in violating classes.
    *
    * Two cascaded hash aggregations, both with map-side partials; the
    * second runs on the already-reduced class table (≤ #classes rows).
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[Column], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity needs at least one quasi-identifier")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qiCols: _*)
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(
        count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .select(
        col("class_size").as("k"),
        col("n_classes"), col("n_rows"),
        (col("class_size") >= k).cast("int").as("anonymous"))
  }

  /** l-diversity audit — k-anonymity's necessary companion: a class
    * can be large (k-anonymous) yet give the sensitive attribute away
    * because every member shares one value (the homogeneity attack,
    * Machanavajjhala et al. 2007). Group rows by the quasi-identifier
    * tuple, count DISTINCT sensitive values per class, histogram the
    * distinct counts; a release is l-diverse iff every class carries
    * ≥ l distinct sensitive values.
    *
    * Scale shape: distinctness collapses FIRST on (QI tuple,
    * sensitive) — one map-side-combining hash aggregate, so the wire
    * carries distinct combinations, never raw rows, and no Expand /
    * count(DISTINCT) rewrite appears; the per-class rollup and the
    * histogram then run on the already-reduced tables (≤ #classes
    * rows).
    */
  def lDiversity(df: DataFrame, qiCols: Seq[Column], sensitiveCol: Column,
      l: Int): DataFrame = {
    require(qiCols.nonEmpty, "l-diversity needs at least one quasi-identifier")
    require(l >= 2, s"l must be >= 2, got $l")
    val byQiSv = df.groupBy(qiCols :+ sensitiveCol.as("_sv"): _*)
      .agg(count(lit(1)).as("_c"))
    byQiSv
      .groupBy(byQiSv.columns.dropRight(2).map(col): _*)
      .agg(count(lit(1)).as("l_distinct"), sum(col("_c")).as("class_size"))
      .groupBy(col("l_distinct"))
      .agg(
        count(lit(1)).as("n_classes"),
        sum(col("class_size")).as("n_rows"))
      .select(
        col("l_distinct").as("l"),
        col("n_classes"), col("n_rows"),
        (col("l_distinct") >= l).cast("int").as("diverse"))
  }

  /** A capped two-sided-geometric noise term derived deterministically
    * from `md5(salt || ":" || key)`.
    *
    * Mechanism: u = (first 20 md5 bits) + 1 is uniform on {1..2²⁰};
    * G = max(20 − bitlen(u), 0) is geometric(½) capped at 19 (the
    * u = 2²⁰ point, probability 2⁻²⁰, folds into G = 0). The noise is
    * the difference of two independent G draws — the discrete Laplace
    * (two-sided geometric) mechanism with ε = ln 2, up to the 2⁻²⁰
    * cap. bitlen is computed as `length(bin(u))`, an exact string-of-
    * bits operation both engines implement identically, so the noise
    * involves NO floating-point transcendental (`ln`) whose last ulp
    * could differ across libm implementations — the classic source of
    * cross-engine drift in inverse-CDF sampling.
    *
    * Deterministic-noise caveat (documented, deliberate): a fixed salt
    * makes repeat queries return the same draw — which is exactly what
    * you want for a *released dataset* (noise is part of the release,
    * re-running the pipeline must not leak fresh draws); rotate the
    * salt per release epoch.
    */
  def twoSidedGeometric(key: Column, salt: String): Column = {
    def g(s: String): Column = {
      val u = conv(substring(md5(concat(lit(s), lit(":"), key)), 1, 5), 16, 10)
        .cast("bigint") + 1L
      greatest(lit(20) - length(bin(u)), lit(0))
    }
    (g(salt + "A") - g(salt + "B")).cast("bigint")
  }

  /** Differentially-private per-group counts: exact count plus a
    * two-sided-geometric draw keyed on the group value (ε = ln 2 for
    * the ±1-row neighboring-database relation on count queries),
    * clamped at zero. One hash aggregation; the noise is a scalar
    * projection over the already-reduced group table.
    */
  def dpNoisyCount(df: DataFrame, groupCol: String, salt: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("true_count"))
      .withColumn("noise", twoSidedGeometric(col(groupCol), salt))
      .withColumn("noisy_count", greatest(col("true_count") + col("noise"), lit(0L)))

  /** Pseudonymize + generalize a customer-shaped table:
    *  - direct identifier → salted md5 pseudonym (re-identification
    *    requires the salt; same input+salt → same pseudonym, so joins
    *    on the pseudonym still work downstream);
    *  - numeric QI → coarse band (`floor(value / bandWidth)`);
    *  - categorical QI pair → suppressed to NULL when its equivalence
    *    class has fewer than `k` members (the rows that would break
    *    k-anonymity lose the identifying detail, not the record).
    * The class-size pass is one window count over the QI partition —
    * a single hash shuffle on the QI key.
    */
  def piiAnonymize(
      df: DataFrame,
      idCol: String,
      nameCol: String,
      numCol: String,
      catCols: Seq[String],
      salt: String,
      bandWidth: Int,
      k: Int): DataFrame = {
    val classSize =
      count(lit(1)).over(Window.partitionBy(catCols.map(col): _*))
    val kept = catCols.map(c =>
      when(col("_class_size") >= k, col(c)).as(c))
    df.withColumn("_class_size", classSize)
      .select(
        Seq(
          col(idCol),
          substring(md5(concat(lit(salt), lit(":"), col(nameCol))), 1, 12)
            .as("pseudonym"),
          (floor(col(numCol) / bandWidth) * bandWidth).as(s"${numCol}_band"),
          col("_class_size").as("class_size")) ++ kept: _*)
  }
}
