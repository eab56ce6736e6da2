package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalar int8 quantization of embedding columns — the standard 4×
  * storage/bandwidth reduction applied to vector corpora before ANN
  * serving (each float32 dimension becomes one byte plus a per-vector
  * (min, scale) pair).
  *
  * All arithmetic is INTEGER on a fixed-point domain: floats enter as
  * `round(x · 10⁴)` BIGINTs (the repo-wide convention from the
  * similarity oracles), the code is `((v − mn) · 255) DIV span`, and
  * the reconstruction is `mn + (code · span) DIV 255`. Integer DIV on
  * non-negative operands truncates identically on every engine, so the
  * codes — and therefore the reconstruction-error column — are a pure
  * function of the input, hash-verifiable against a SQL oracle.
  * (A float formulation would not be: `(v-mn)/span*255` rounds at
  * three data-dependent places, and `floor` of a correctly-rounded
  * quotient can land one integer too high.)
  *
  * Scale posture: one narrow projection, no shuffle — per-row min/max
  * are codegen array expressions, the per-element maps are lambda HOFs
  * evaluated once per vector. The output keeps only O(1) summary
  * columns per vector (codes collapse to sum + position-weighted sum),
  * so the result is a scan-shaped pipeline at any corpus size.
  */
object Quantize {

  /** @param df       input with an `array<float|double>` column
    * @param vecCol   embedding column name
    * @param idCols   passthrough identifier columns
    * @param fixedScale fixed-point multiplier for float→int entry
    * @return one row per input row: id columns, the quantization range
    *         (`mn_q`, `mx_q`), two exact code-array signatures
    *         (`code_sum`, position-weighted `code_wsum` — order
    *         sensitivity is what makes the pair a signature), and the
    *         total fixed-point reconstruction error `abs_err_q`.
    */
  def int8(
      df: DataFrame,
      vecCol: String,
      idCols: Seq[String],
      fixedScale: Int = 10000): DataFrame = {
    val prepared = df
      .withColumn("_qv", expr(
        s"transform($vecCol, x -> CAST(round(CAST(x AS DOUBLE) * $fixedScale) AS BIGINT))"))
      .withColumn("mn_q", array_min(col("_qv")))
      .withColumn("mx_q", array_max(col("_qv")))
      .withColumn("_codes", expr(
        """transform(_qv, v -> CASE WHEN mx_q = mn_q THEN CAST(0 AS BIGINT)
          |  ELSE ((v - mn_q) * 255) DIV (mx_q - mn_q) END)""".stripMargin))
    prepared.select(
      idCols.map(col) ++ Seq(
        col("mn_q"),
        col("mx_q"),
        expr("aggregate(_codes, CAST(0 AS BIGINT), (acc, x) -> acc + x)")
          .as("code_sum"),
        // 1-based position weights (matches SQL's 1-based list index)
        expr("""aggregate(transform(_codes, (c, i) -> c * CAST(i + 1 AS BIGINT)),
               |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin)
          .as("code_wsum"),
        expr("""aggregate(zip_with(_qv, _codes,
               |    (v, c) -> abs(v - (mn_q + (c * (mx_q - mn_q)) DIV 255))),
               |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin)
          .as("abs_err_q")): _*)
  }

  /** Per-dimension z-score standardization — the feature-scaling pass
    * that precedes distance-based training. Each dimension's moments
    * accumulate as exact fixed-point integers (n, Σx, Σx²), and the
    * z-score is the denominator-cleared identity
    * `(n·x − Σx) / sqrt(n·Σx² − (Σx)²)` — two exact BIGINTs into one
    * correctly-rounded division, so values are bit-identical across
    * engines and layouts (the naive `(x−μ)/σ` rounds at four
    * data-dependent places).
    *
    * Shape: posexplode → one (dim)-keyed map-side-combining aggregate
    * (output width = dims, not rows), then the moment table joins back
    * by dim — a broadcast at any realistic dimensionality.
    * Output: (id, dim — 1-based, z), population-σ convention.
    */
  def zscore(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val e = df.select(col(idCol),
      posexplode(Dedup.quantize(col(vecCol))).as(Seq("_d0", "_x")))
      .select(col(idCol), (col("_d0") + 1).cast("long").as("dim"), col("_x"))
    val m = e.groupBy(col("dim")).agg(
      count(lit(1)).as("_n"), sum(col("_x")).as("_s"),
      sum(col("_x") * col("_x")).as("_q"))
    // n·Σx² and (Σx)² wrap int64 beyond ~3×10⁵ vectors at the ×10⁴
    // quantization scale — widen the moments to decimal(38,0) before
    // multiplying (the corrExact convention; DuckDB's HUGEINT promotion
    // does the same on the oracle side). A constant dimension has
    // variance 0 → emit NULL rather than the NaN/Infinity a raw
    // division would produce.
    val varQ = (col("_n").cast("decimal(38,0)") * col("_q")
      - col("_s").cast("decimal(38,0)") * col("_s"))
    e.join(broadcast(m), "dim")
      .select(col(idCol), col("dim"),
        when(varQ <= 0, lit(null).cast("double"))
          .otherwise(
            (col("_n").cast("decimal(38,0)") * col("_x") - col("_s")).cast("double")
              / sqrt(varQ.cast("double")))
          .as("z"))
  }
}
