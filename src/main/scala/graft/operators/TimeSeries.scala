package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series feature operators over keyed event streams: sample
  * autocorrelation of a bucketed count series, and seasonal-profile
  * residual scoring (the "is this hour's value weird for this hour of
  * day" primitive behind every seasonality-aware anomaly monitor).
  *
  * Exactness discipline (repo-wide): every moment that feeds a float is
  * an exact BIGINT (counts, integer cents, their products), and the one
  * float expression is written identically in the DuckDB oracle, so both
  * engines evaluate the same IEEE ops on the same inputs — results
  * hash-match bit-for-bit.
  */
object TimeSeries {

  
  /** Theil–Sen robust trend estimate per key over an ALREADY-AGGREGATED
    * regular series (here: one point per day): the median of all
    * pairwise slopes — up to ~29% contaminated points cannot move it,
    * where OLS chases every outlier. The classic robust-trend monitor
    * for daily pipeline metrics.
    *
    * Exactness contract: each pairwise slope is ONE double division of
    * exact integers (correctly rounded, so both engines produce the
    * identical double), and the median picks values at fixed sorted
    * positions — an even pair count averages the middle two in one
    * expression. No order-dependent float accumulation anywhere.
    *
    * Scale shape: the input must be the AGGREGATED series (the raw
    * rows collapse in the caller's groupBy first), so the per-key
    * pairwise self-join is bounded by days², not data — at 10 years of
    * daily points that is ~6.7M pairs per key, a fine task, and the
    * equi-join on the key plus the window both ride one hash
    * partitioning.
    */
  def theilSenTrend(series: DataFrame, keyCol: String, xCol: String,
      yCol: String): DataFrame = {
    val a = series.select(col(keyCol).as("_k"), col(xCol).as("_xa"),
      col(yCol).as("_ya"))
    val b = series.select(col(keyCol).as("_k"), col(xCol).as("_xb"),
      col(yCol).as("_yb"))
    val pairs = a.join(b, Seq("_k"))
      .filter(col("_xa") < col("_xb"))
      .withColumn("_slope",
        (col("_yb") - col("_ya")).cast("double") /
          (col("_xb") - col("_xa")).cast("double"))
    val w = Window.partitionBy(col("_k")).orderBy(col("_slope"))
    val wk = Window.partitionBy(col("_k"))
    pairs
      .withColumn("_rn", row_number().over(w))
      .withColumn("_m", count(lit(1)).over(wk))
      // median = value at ⌈m/2⌉, averaged with ⌈m/2⌉+1 when m is even
      .filter(col("_rn") === expr("(_m + 1) DIV 2") ||
        col("_rn") === expr("_m DIV 2 + 1"))
      .groupBy(col("_k"))
      .agg(max(col("_m")).as("n_pairs"),
        ((min(col("_slope")) + max(col("_slope"))) / 2.0).as("slope"))
      .select(col("_k").as(keyCol),
        col("n_pairs").cast("bigint").as("n_pairs"), col("slope"))
  }

  /** Sample autocorrelation of a per-key count series at index lags
    * 1..maxLag (lag over the bucket-ordered ROW sequence, so gaps in the
    * bucket grid don't make the definition engine-dependent).
    *
    * Pearson r over the (x_t, x_{t−L}) pairs, computed from exact
    * integer moments: r = (n·Sxy − Sx·Sy) / (√(n·Sxx − Sx²)·√(n·Syy −
    * Sy²)), NULL when either variance term is zero. Bounds: with hourly
    * buckets, n ≤ 8.8e3/key-year and per-bucket counts ≤ ~1e6 keep
    * n·Sxy < 2⁶³ by a wide margin.
    *
    * Scale posture: one hash-aggregate to build the bucketed series
    * (map-side combine absorbs the raw rows), ONE window exchange keyed
    * by the series key computing all maxLag lag columns in a single
    * sort, then a second small aggregate over series-length rows. The
    * key-level window partition is series-length-sized (thousands of
    * buckets), never raw-row-sized, so a hot key costs O(buckets·maxLag)
    * on one task — flat at any raw-data scale.
    */
  def acf(df: DataFrame, keyCol: String, tsCol: String,
      bucket: String = "hour", maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1 && maxLag <= 32, s"maxLag must be in [1,32], got $maxLag")
    val series = df
      .groupBy(col(keyCol), date_trunc(bucket, col(tsCol)).as("bkt"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bkt"))
    val lagged = series.select(
      col(keyCol) +: col("x") +:
        (1 to maxLag).map(l => lag(col("x"), l).over(w).as(s"_lag$l")): _*)
    // stack to (key, lag, x, y) rows so one aggregate computes every lag
    val stacked = lagged.select(col(keyCol),
      expr(s"stack($maxLag, ${(1 to maxLag)
        .map(l => s"$l, x, _lag$l").mkString(", ")}) AS (lag, x, y)"))
      .where(col("y").isNotNull)
    stacked
      .groupBy(col(keyCol), col("lag"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x")).as("_sx"), sum(col("y")).as("_sy"),
        sum(col("x") * col("y")).as("_sxy"),
        sum(col("x") * col("x")).as("_sxx"),
        sum(col("y") * col("y")).as("_syy"))
      .withColumn("_vx", col("n_pairs") * col("_sxx") - col("_sx") * col("_sx"))
      .withColumn("_vy", col("n_pairs") * col("_syy") - col("_sy") * col("_sy"))
      // explicit zero-variance gate (constant series or a single pair):
      // don't lean on non-ANSI divide-by-zero NULL semantics agreeing
      // across engines — same discipline as Drift.tvDrift
      .withColumn("acf",
        when(col("_vx") === 0 || col("_vy") === 0, lit(null).cast("double"))
          .otherwise(
            (col("n_pairs") * col("_sxy") - col("_sx") * col("_sy")).cast("double")
              / (sqrt(col("_vx").cast("double")) * sqrt(col("_vy").cast("double")))))
      .select(col(keyCol), col("lag").cast("int").as("lag"),
        col("n_pairs"), col("acf"))
  }

  /** Seasonal-profile residuals: group rows into (key, season) cells —
    * e.g. (event_type, hour-of-day) — and score each row's integer
    * measure against its cell mean WITHOUT dividing: the deviation is
    * kept n-scaled (dev = v·n − Σv, exactly n·(v − mean)), so the
    * anomaly predicate |v − mean| > threshold becomes the exact integer
    * comparison |dev| > threshold·n. Returns the flagged rows with the
    * cell stats attached.
    *
    * Scale posture: the profile is one hash-aggregate collapsing to
    * |keys|·|seasons| rows (tiny), broadcast back onto the fact scan —
    * no window sort, no second shuffle of the raw rows; the only full
    * pass is the map-side partial agg + the scan that scores.
    */
  def seasonalOutliers(df: DataFrame, keyCol: Column, seasonCol: Column,
      valueCol: Column, thresholdUnits: Long): DataFrame =
    scoreSeasonal(df, seasonalCells(df, keyCol, seasonCol, valueCol),
      keyCol, seasonCol, valueCol, thresholdUnits)

  /** The (key, season) profile: count + exact sum per cell. Split out of
    * [[seasonalOutliers]] so a STREAM can score against a batch-built
    * profile (the stream-static twin) — the cells table is the natural
    * published artifact of this operator anyway.
    */
  def seasonalCells(df: DataFrame, keyCol: Column, seasonCol: Column,
      valueCol: Column): DataFrame =
    df.groupBy(keyCol.as("_k"), seasonCol.as("_s"))
      .agg(count(lit(1)).as("n_cell"), sum(valueCol).as("sum_cell"))

  /** Linear time-interpolation of missing values per key — the
    * imputation rung above [[Analytics]] forward-fill: a null at time t
    * between non-null neighbors (t₀,v₀) and (t₁,v₁) fills to
    * v₀ + (v₁−v₀)·(t−t₀)/(t₁−t₀); a null before the first / after the
    * last observation takes the nearest observed value; an all-null key
    * stays null. The pandas `interpolate(method="time")` contract.
    *
    * Determinism: neighbors and timestamps come from exact integers
    * (value units + epoch-µs), located with `last/first(ignoreNulls)`
    * over the key-ordered window; the interpolation itself is ONE float
    * expression written identically in the oracle (each factor cast
    * from an exact BIGINT, fixed operation order).
    *
    * Shape: one keyed exchange, four window functions stacked on the
    * same sort (prev/next value + timestamp), map-only finish. The
    * window partition is per-key series length — chunk like
    * [[Rolling.trailingChunked]] if one key dominates.
    */
  def interpolate(df: DataFrame, keyCol: Column, tsMicros: Column,
      valueCol: Column, tieCol: Column): DataFrame = {
    val back = Window.partitionBy(keyCol).orderBy(tsMicros, tieCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    val fwd = Window.partitionBy(keyCol).orderBy(tsMicros, tieCol)
      .rowsBetween(0, Window.unboundedFollowing)
    val obs = valueCol.isNotNull
    val out = df
      .withColumn("_t", tsMicros)
      .withColumn("_pv", last(when(obs, valueCol), ignoreNulls = true).over(back))
      .withColumn("_pt", last(when(obs, tsMicros), ignoreNulls = true).over(back))
      .withColumn("_nv", first(when(obs, valueCol), ignoreNulls = true).over(fwd))
      .withColumn("_nt", first(when(obs, tsMicros), ignoreNulls = true).over(fwd))
    out.withColumn("filled",
      when(obs, valueCol.cast("double"))
        .when(col("_pv").isNull, col("_nv").cast("double"))
        .when(col("_nv").isNull, col("_pv").cast("double"))
        // both neighbors at the SAME µs (duplicate-timestamp sandwich):
        // 0/0 would be NaN; define it as the previous value
        .when(col("_nt") === col("_pt"), col("_pv").cast("double"))
        .otherwise(col("_pv").cast("double")
          + (col("_nv") - col("_pv")).cast("double")
            * ((col("_t") - col("_pt")).cast("double")
              / (col("_nt") - col("_pt")).cast("double"))))
  }

  /** Score `df` against a prebuilt profile — stateless, so it runs
    * unchanged over a streaming DataFrame (stream-static broadcast
    * join + filter, Append mode, no state store).
    */
  def scoreSeasonal(df: DataFrame, cells: DataFrame, keyCol: Column,
      seasonCol: Column, valueCol: Column, thresholdUnits: Long): DataFrame =
    df.withColumn("_k", keyCol).withColumn("_s", seasonCol)
      .withColumn("_v", valueCol)
      .join(broadcast(cells), Seq("_k", "_s"))
      .withColumn("dev_scaled", col("_v") * col("n_cell") - col("sum_cell"))
      .where(abs(col("dev_scaled")) > lit(thresholdUnits) * col("n_cell"))
}
