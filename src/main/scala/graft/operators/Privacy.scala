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

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * third rung after [[kAnonymity]] and [[lDiversity]]: a class can be
    * large AND diverse yet still leak when its sensitive-value
    * DISTRIBUTION differs sharply from the table's (the skewness /
    * similarity attacks). For an ORDERED sensitive attribute the
    * paper's distance is the Earth Mover's Distance with unit ground
    * distance between adjacent values:
    *
    *   EMD(class, global) = (1/(m−1)) · Σ_{i=1..m−1} |P_c(≤v_i) − P(≤v_i)|
    *
    * over the m ordered distinct sensitive values. Kept cross-engine
    * exact the repo way: cumulative fractions are micro-quantized by
    * integer division (⌊cum·10⁶/n⌋ — no float ever forms), the EMD is
    * the integer mean of the absolute micro differences, and the
    * threshold compare is integer-vs-integer. Quantization error is
    * < 1 micro per term — irrelevant at any realistic t.
    *
    * Scale shape: raw rows collapse FIRST into (QI tuple, sensitive)
    * cells — one map-side-combining hash aggregate, the only pass over
    * the data. Everything after runs on bounded tables: the class list
    * (≤ #classes), the sensitive domain (≤ m — REQUIRE a bounded
    * ordered domain: band/bucket a raw numeric before calling, exactly
    * as [[kAnonymity]] bands balances), and the #classes × m grid that
    * the per-class cumulative needs (a class missing a value globally
    * present must still carry the flat cumulative there). The global
    * cumulative is a single-partition window over ≤ m rows and the
    * domain + total ride broadcasts.
    */
  def tCloseness(df: DataFrame, qiCols: Seq[Column],
      sensitiveOrderedCol: Column, tMicro: Long): DataFrame = {
    require(qiCols.nonEmpty, "t-closeness needs at least one quasi-identifier")
    require(tMicro > 0 && tMicro <= 1000000L,
      s"t threshold must be in (0, 1] micro, got $tMicro")
    val cell = df.groupBy(qiCols :+ sensitiveOrderedCol.as("_sv"): _*)
      .agg(count(lit(1)).as("_cnt"))
    val qiNames = cell.columns.dropRight(2).toSeq
    val cls = cell.groupBy(qiNames.map(col): _*)
      .agg(sum(col("_cnt")).as("_n_c"))
    val svs = cell.select(col("_sv")).distinct()
    // global per-value counts + cumulative + total: all ≤ m rows, so the
    // unpartitioned window and the 1-row total broadcast are bounded
    val glob = cell.groupBy(col("_sv")).agg(sum(col("_cnt")).as("_g"))
    val gcum = glob
      .withColumn("_cum_g", sum(col("_g")).over(
        Window.orderBy(col("_sv"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(glob.agg(sum(col("_g")).as("_n_tot"))))
    val grid = cls.crossJoin(broadcast(svs))
      .join(cell, qiNames :+ "_sv", "left")
      .withColumn("_c", coalesce(col("_cnt"), lit(0L)))
      .withColumn("_cum_c", sum(col("_c")).over(
        Window.partitionBy(qiNames.map(col): _*).orderBy(col("_sv"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val termed = grid.join(broadcast(gcum.drop("_g")), Seq("_sv"))
      .withColumn("_t", abs(
        expr("(_cum_c * 1000000) DIV _n_c") -
          expr("(_cum_g * 1000000) DIV _n_tot")))
    // the i = m term is identically 0 (both cumulatives hit exactly
    // 10⁶), so summing all m terms and dividing by m−1 is the paper sum
    val emd = when(count(lit(1)) > 1,
      expr("sum(_t) DIV (count(1) - 1)")).otherwise(lit(0L))
    termed.groupBy((qiNames :+ "_n_c").map(col): _*)
      .agg(emd.cast("bigint").as("emd_micro"))
      .select(qiNames.map(col) ++ Seq(
        col("_n_c").cast("bigint").as("class_size"),
        col("emd_micro"),
        (col("emd_micro") <= tMicro).cast("int").as("t_close")): _*)
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

  /** Differentially-private quantile via the EXPONENTIAL MECHANISM
    * (McSherry & Talwar 2007; Smith 2011 for the median): release a
    * value v from the bounded ordered domain with probability
    * ∝ exp(ε·u(v)/2), utility u(v) = −|#{x < v} − q·n| (sensitivity 1).
    * The noisy-max draw uses the Gumbel-max trick with the SAME
    * bit-quantized public draws as [[graft.operators.Dsir]]'s resample:
    * g = bit-quantized Gumbel/ln2 from md5(salt:v), and the argmax of
    *
    *   2·U(v) + qDen·g(v),
    *   U(v) = −max(0, qNum·n − qDen·(below+cnt), qDen·below − qNum·n)
    *
    * — the INTERVAL-rank utility: a value whose occupancy interval
    * [below, below+cnt] contains the q·n rank point scores 0 (a heavy
    * atom AT the quantile must dominate; the naive |below − q·n| form
    * under-rates it), and points outside score minus-distance to the
    * nearer end. All integers — argmax is scale-invariant, so
    * multiplying through by qDen keeps the fractional quantile exact —
    * and the construction realizes the
    * mechanism at ε = 4·ln 2, up to the documented 2⁻²⁰ draw
    * quantization. Deterministic for a fixed salt — the released value
    * is part of the release, exactly the [[twoSidedGeometric]]
    * argument; rotate the salt per epoch.
    *
    * Scale shape: one map-combining aggregate collapses rows to the
    * bounded value domain (band first, the [[tCloseness]] contract);
    * the cumulative, draws, and argmax all run on ≤ m rows.
    */
  def dpQuantile(df: DataFrame, valueCol: Column, qNum: Long, qDen: Long,
      salt: String): DataFrame = {
    require(qDen >= 2 && qNum >= 1 && qNum < qDen,
      s"quantile must be a proper fraction, got $qNum/$qDen")
    val vals = df.groupBy(valueCol.as("_v")).agg(count(lit(1)).as("_c"))
    val wPrev = Window.orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = vals.agg(sum(col("_c")).as("_n"))
    val scored = vals
      .withColumn("_below", coalesce(sum(col("_c")).over(wPrev), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("_u2",
        -greatest(lit(0L),
          lit(qNum) * col("_n") - lit(qDen) * (col("_below") + col("_c")),
          lit(qDen) * col("_below") - lit(qNum) * col("_n")))
      .withColumn("_r", conv(substring(md5(concat(lit(s"$salt:"),
        col("_v").cast("string"))), 1, 15), 16, 10).cast("long"))
      .withColumn("_z", greatest(lit(59L) - Dsir.ilog2(col("_r") + 1), lit(0L)))
      .withColumn("_g", lit(20L) -
        Dsir.ilog2(col("_z") * 1048576L + pmod(col("_r"), lit(1048576L)) + 1L))
      .withColumn("score", lit(2L) * col("_u2") + lit(qDen) * col("_g"))
    scored.orderBy(col("score").desc, col("_r"), col("_v")).limit(1)
      .select(col("_v").as("value"),
        col("_n").cast("bigint").as("n_total"),
        col("_u2").cast("bigint").as("utility_scaled"),
        col("score").cast("bigint").as("score"))
  }

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
