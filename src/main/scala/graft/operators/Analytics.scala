package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable product-analytics operators over generic event/dimension
  * frames — the DataFrame-in/DataFrame-out cores behind
  * [[graft.queries.AnalyticsQueries]]. Each is shaped to ride ONE hash
  * partitioning where the semantics allow (cascaded unbounded windows
  * share an exchange; the terminal per-key collapse reuses it).
  */
object Analytics {

  /** Ordered-step funnel: step i's timestamp is the earliest event of
    * `steps(i)` STRICTLY AFTER step i−1 (leak-free rule: out-of-order
    * completions don't count). Returns one row per key with each
    * step's timestamp (null = not reached) and `stage` = number of
    * completed steps. One exchange: the window cascade and the
    * groupBy share the key partitioning.
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(keyCol))
    val withSteps = steps.zipWithIndex.foldLeft(events) {
      case (df, (step, i)) =>
        val cond =
          if (i == 0) col(typeCol) === step
          else col(typeCol) === step && col(tsCol) > col(s"_t$i")
        df.withColumn(s"_t${i + 1}", min(when(cond, col(tsCol))).over(w))
    }
    val stepCols = steps.indices.map(i => max(col(s"_t${i + 1}")).as(s"${steps(i)}_ts"))
    // fold ascending so the LAST when wrapped is the HIGHEST stage —
    // it ends up outermost, and funnel monotonicity (step i+1 reached
    // ⇒ step i reached) makes the chain total
    val stageCol = steps.indices.foldLeft(lit(0L): Column) {
      case (rest, i) => when(col(s"${steps(i)}_ts").isNotNull, (i + 1).toLong)
        .otherwise(rest)
    }
    withSteps.groupBy(col(keyCol))
      .agg(stepCols.head, stepCols.tail: _*)
      .withColumn("stage", stageCol)
  }

  /** SCD2 history from an ordered change stream: consecutive
    * same-value runs of `attrCol` compress to one row with
    * [valid_from, valid_to) and is_current on the open run. Change
    * detection (lag) and interval close (lead) share one
    * (key → order) sort. Comparison is null-safe (`<=>`, SQL
    * IS DISTINCT FROM): a run that transitions INTO a null attribute
    * value opens its own interval instead of silently merging into
    * the previous run, and the first row of a key is detected by
    * row_number rather than lag-is-null (which a null attr would
    * fake).
    */
  def scd2(rows: DataFrame, keyCol: String, attrCol: String,
      orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    rows
      .withColumn("_changed", row_number().over(w) === 1 ||
        !(lag(col(attrCol), 1).over(w) <=> col(attrCol)))
      .where(col("_changed"))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(
        Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)))
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_changed")
  }

  /** Peak concurrent intervals per day — the distributed sweep line:
    * intervals [stCol, enCol] (inclusive, epoch-micro longs built
    * in-function from timestamps) are clipped to each day they touch,
    * become +1/−1 boundary rows, and the running sum sweeps WITHIN
    * each day partition. Starts sort before ends at the same instant,
    * so touching intervals count as concurrent; the daily max is
    * invariant to ordering among equal boundaries.
    */
  def concurrencyPeak(intervals: DataFrame, stCol: String, enCol: String): DataFrame = {
    val clipped = intervals
      .withColumn("day", explode(expr(s"sequence(to_date($stCol), to_date($enCol))")))
      .withColumn("_day_us", unix_micros(col("day").cast("timestamp")))
      .withColumn("_cs", greatest(unix_micros(col(stCol)), col("_day_us")))
      .withColumn("_ce", least(unix_micros(col(enCol)), col("_day_us") + lit(86399999999L)))
    val bounds = clipped.select(col("day"), col("_cs").as("t"), lit(1L).as("delta"))
      .unionAll(clipped.select(col("day"), col("_ce").as("t"), lit(-1L).as("delta")))
    val w = Window.partitionBy(col("day")).orderBy(col("t"), col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bounds.withColumn("_r", sum(col("delta")).over(w))
      .groupBy(col("day")).agg(max(col("_r")).as("peak_concurrency"))
  }

  /** Calendar gap-fill with forward fill over a (key, day, count,
    * payload) daily table: densify each key's [first, last] day,
    * zero-fill the count, and carry the payload of the most recent
    * ACTIVE day — a running max-of-active-day window (monotone day
    * order = forward fill without IGNORE NULLS) plus an equi-join
    * re-attach of the payload.
    */
  def gapFillDaily(daily: DataFrame, keyCol: String, dayCol: String,
      countCol: String, payloadCol: String): DataFrame = {
    val calendar = daily.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("_d0"), max(col(dayCol)).as("_d1"))
      .withColumn(dayCol, explode(expr("sequence(_d0, _d1)")))
      .select(col(keyCol), col(dayCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val la = calendar
      .join(daily.select(col(keyCol), col(dayCol), col(countCol)),
        Seq(keyCol, dayCol), "left")
      .withColumn(countCol, coalesce(col(countCol), lit(0L)))
      .withColumn("last_active_day",
        max(when(col(countCol) > 0, col(dayCol))).over(w))
    // Left join: a calendar day with no prior active day (possible
    // only if the input carries count=0 rows, so last_active_day is
    // null) keeps its row with a null forward-fill instead of being
    // silently dropped.
    la.join(daily.select(col(keyCol).as("_k2"), col(dayCol).as("_d2"),
          col(payloadCol).as(s"ff_$payloadCol")),
        la(keyCol) === col("_k2") && la("last_active_day") === col("_d2"),
        "left")
      .select(col(keyCol), col(dayCol), col(countCol),
        col("last_active_day"), col(s"ff_$payloadCol"))
  }

  /** [[gapFillDaily]] in one window pass: the payload carry uses
    * `last(_, ignoreNulls = true)` over the same running window that
    * computes last_active_day, so the re-attach equi-join disappears —
    * one exchange on the key instead of a window exchange PLUS a join
    * (PlanSpec pins the difference). Results are identical whenever
    * active-day payloads are non-null (the contract of every current
    * caller; an active day carrying a NULL payload is where the two
    * forms diverge — this one skips past it to the previous active
    * day, the join form faithfully re-attaches the null).
    */
  def gapFillDailyFF(daily: DataFrame, keyCol: String, dayCol: String,
      countCol: String, payloadCol: String): DataFrame = {
    val calendar = daily.groupBy(col(keyCol))
      .agg(min(col(dayCol)).as("_d0"), max(col(dayCol)).as("_d1"))
      .withColumn(dayCol, explode(expr("sequence(_d0, _d1)")))
      .select(col(keyCol), col(dayCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar
      .join(daily.select(col(keyCol), col(dayCol), col(countCol),
        col(payloadCol)), Seq(keyCol, dayCol), "left")
      .withColumn(countCol, coalesce(col(countCol), lit(0L)))
      .withColumn("last_active_day",
        max(when(col(countCol) > 0, col(dayCol))).over(w))
      .withColumn(s"ff_$payloadCol",
        last(when(col(countCol) > 0, col(payloadCol)), ignoreNulls = true)
          .over(w))
      .select(col(keyCol), col(dayCol), col(countCol),
        col("last_active_day"), col(s"ff_$payloadCol"))
  }

  /** Rolling z-score outliers WITHOUT floating point: flags rows whose
    * value deviates from its trailing-window mean by more than k
    * standard deviations, computed entirely in integer arithmetic.
    *
    * (x−μ)² > k²σ² is multiplied through by n² (μ = S/n,
    * σ² = (nQ−S²)/n²) into (n·x − S)² > k²·(n·Q − S²) over integer
    * cents — exact, associative, and therefore identical on any
    * engine/partitioning, where a float mean/stddev window differs in
    * the last ulp run-to-run and can flip the comparison for boundary
    * rows. The cast chain value → DECIMAL(12,2) → ×100 → BIGINT is
    * lossless for 2-decimal inputs.
    *
    * One exchange: the three window aggregates share a single
    * (key, ts, tie) sort. `minN` suppresses early-window noise.
    *
    * Overflow contract: the largest intermediate is dev² = (n·x − S)²
    * ≤ (2·n·|x|max)², so staying under 2⁶³ needs
    * |x|max ≤ √(2⁶³)/(2n) ≈ 1.5e9/(lookback+1) cents — with the
    * default lookback 20 that is |x| ≤ ~7.2e7 cents (~$720k), far
    * above any event-value domain here but NOT the naive 10^10 a
    * 64-bit sum would suggest; callers with larger magnitudes must
    * rescale first (DuckDB errors on the same overflow where Spark's
    * non-ANSI long arithmetic would wrap silently).
    */
  /** CDC-style snapshot diff: classify every key as added / removed /
    * changed between two versions of a table. One full-outer hash join
    * on the key (the minimal possible shuffle for the semantics —
    * both sides partition by the same key, and at 100 TB bucketing
    * both snapshots on the key makes it exchange-free); attribute
    * comparison is a single null-safe struct equality, so adding
    * columns never changes the plan shape. Unchanged keys are dropped
    * (they are the overwhelming majority of a day-over-day diff).
    */
  def snapshotDiff(old: DataFrame, current: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs key columns")
    val attrs = old.columns.filterNot(keyCols.contains).toSeq
    require(attrs == current.columns.filterNot(keyCols.contains).toSeq,
      "snapshots must share a schema")
    val o = old.select(
      struct(keyCols.map(col): _*).as("_k"),
      struct(attrs.map(col): _*).as("_vo"))
    val c = current.select(
      struct(keyCols.map(col): _*).as("_k"),
      struct(attrs.map(col): _*).as("_vc"))
    o.join(c, Seq("_k"), "full_outer")
      .withColumn("change_type",
        when(col("_vo").isNull, lit("added"))
          .when(col("_vc").isNull, lit("removed"))
          .when(!(col("_vo") <=> col("_vc")), lit("changed")))
      .where(col("change_type").isNotNull)
      .select(keyCols.map(k => col(s"_k.$k").as(k)) :+ col("change_type"): _*)
  }

  /** MERGE-style changeset application — the write side of CDC (the
    * read side is [[snapshotDiff]]): fold a stream of keyed
    * insert/update/delete operations into a base snapshot and emit the
    * new snapshot. Per key only the LATEST op (by `seqCol`, ties by
    * `opCol` descending so 'U' beats 'I' at equal seq) matters — a
    * window row_number keeps it; the fold itself is ONE full-outer
    * hash join on the key (both sides partition identically, so at
    * 100 TB bucketing base and changelog on the key makes it
    * exchange-free — the Delta/Iceberg MERGE shape). Upserts replace
    * the whole payload struct, deletes drop the row (a delete for an
    * absent key is a no-op), untouched base rows pass through.
    */
  def applyChangeset(base: DataFrame, changes: DataFrame,
      keyCols: Seq[String], seqCol: String, opCol: String): DataFrame = {
    require(keyCols.nonEmpty, "applyChangeset needs key columns")
    val attrs = base.columns.filterNot(keyCols.contains).toSeq
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).desc)
    val latest = changes
      .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
    val b = base.select(
      struct(keyCols.map(col): _*).as("_k"), struct(attrs.map(col): _*).as("_vb"))
    val c = latest.select(
      struct(keyCols.map(col): _*).as("_k"), col(opCol).as("_op"),
      struct(attrs.map(col): _*).as("_vc"))
    b.join(c, Seq("_k"), "full_outer")
      .where(col("_op").isNull || col("_op") =!= "D")
      .withColumn("_v", when(col("_op").isNotNull, col("_vc")).otherwise(col("_vb")))
      .select(keyCols.map(k => col(s"_k.$k").as(k)) ++
        attrs.map(a => col(s"_v.$a").as(a)): _*)
  }

  /** Per-group covariance and Pearson correlation WITHOUT
    * order-dependent floating point: Spark's `covar_pop`/`corr` sum
    * doubles in partition order (different layout → different last
    * ulp), so they can't be hash-verified. Here the moments n, Σx, Σy,
    * Σxy, Σx², Σy² accumulate as EXACT decimals (inputs are 2-decimal
    * money/quantity values), and the final
    *   cov = (nΣxy − ΣxΣy) / n²
    *   corr = (nΣxy − ΣxΣy) / √((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    * are a handful of correctly-rounded double ops over those exact
    * integers — deterministic on any engine, any partitioning. One
    * map-side-combining shuffle carrying 6 decimals per group.
    */
  def corrExact(rows: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,2)")
    val y = col(yCol).cast("decimal(18,2)")
    val (n, sx, sy, sxy, sxx, syy) = (col("n"),
      col("_sx").cast("double"), col("_sy").cast("double"),
      col("_sxy").cast("double"), col("_sxx").cast("double"),
      col("_syy").cast("double"))
    val num = sxy * n - sx * sy
    rows.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("_sx"), sum(y).as("_sy"),
        sum(x * y).as("_sxy"), sum(x * x).as("_sxx"), sum(y * y).as("_syy"))
      .select(groupCols.map(col) ++ Seq(
        n,
        // n.cast(double) first: a LongType n*n wraps past ~3e9 rows
        // per group — inside the 100 TB posture this operator claims
        (num / (n.cast("double") * n)).as("cov_pop"),
        (num / sqrt((sxx * n - sx * sx) * (syy * n - sy * sy))).as("corr")): _*)
  }

  /** Per-key UNION coverage of possibly-overlapping intervals — "how
    * much time was actually covered" (active time dedup, SLA uptime,
    * sensor coverage): merge overlaps gaps-and-islands style and report
    * per key the merged-island count, raw interval count, covered
    * total, and first-to-last span. Touching intervals (next start ==
    * running max end) merge; a new island opens only on a strict gap.
    *
    * Exact integer time arithmetic end-to-end. One exchange: the two
    * windows and both aggregates all ride the key partitioning (the
    * island id is a running sum of new-island flags over the
    * (start, end)-sorted rows — duplicate sort keys are order-safe
    * because only the running max end feeds the flag).
    */
  def intervalUnion(intervals: DataFrame, keyCol: String, stCol: String,
      enCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(stCol), col("_en"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    intervals
      // operator-boundary validation: an inverted interval (en < st)
      // silently corrupts the island segmentation and can drive
      // covered_us negative — and because the oracle replays this very
      // logic, the hash gate could never catch it. Fail loudly instead
      // of normalizing: an inverted interval is upstream data damage,
      // not a representation choice. The guard rides the column every
      // window/aggregate reads, so the optimizer cannot prune it.
      .withColumn("_en",
        when(col(enCol).isNull || col(stCol).isNull, raise_error(
          concat(lit(s"intervalUnion: null interval bound ($stCol/$enCol) at $keyCol="),
            col(keyCol).cast("string"))))
          .when(col(enCol) >= col(stCol), col(enCol))
          .otherwise(raise_error(
            concat(lit(s"intervalUnion: inverted interval ($enCol < $stCol) at $keyCol="),
              col(keyCol).cast("string")))))
      .withColumn("_pmax", max(col("_en")).over(wPrev))
      .withColumn("_new",
        when(col("_pmax").isNull || col(stCol) > col("_pmax"), 1L)
          .otherwise(0L))
      .withColumn("_island", sum(col("_new")).over(wRun))
      .groupBy(col(keyCol), col("_island"))
      .agg(min(col(stCol)).as("_ist"), max(col("_en")).as("_ien"),
        count(lit(1)).as("_n"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_islands"),
        sum(col("_n")).as("n_intervals"),
        sum(col("_ien") - col("_ist")).as("covered_us"),
        (max(col("_ien")) - min(col("_ist"))).as("span_us"))
      .select(col(keyCol),
        col("n_islands").cast("bigint").as("n_islands"),
        col("n_intervals").cast("bigint").as("n_intervals"),
        col("covered_us").cast("bigint").as("covered_us"),
        col("span_us").cast("bigint").as("span_us"))
  }

  /** Categorical-association audit between two discrete columns — the
    * feature-selection primitive (which raw features carry signal about
    * a label / which metadata dimensions move together). Per observed
    * (x, y) cell:
    *   - exact supports n_xy, n_x, n_y, n_tot (the full contingency
    *     evidence — any downstream test statistic derives from these);
    *   - `pmi_q` = ⌊log₂⌋-quantized pointwise mutual information,
    *     ilog2(n_xy·n_tot) − ilog2(n_x·n_y) — the repo's
    *     transcendental-free log discipline ([[Dsir.ilog2]]): sign and
    *     magnitude of the lift in whole doublings, engine-exact;
    *   - `leverage_micro` = P(x,y) − P(x)·P(y) with every fraction
    *     micro-quantized by integer DIV before the product — bounded by
    *     ±10⁶ regardless of data size, so it stays overflow-safe where
    *     raw cross-products would not (n_xy·n_tot needs n_tot ≲ 3·10⁹
    *     for the BIGINT pmi_q product — sample or rescale counts past
    *     that; leverage has no such bound).
    *
    * Scale shape: ONE map-side-combining aggregate over raw rows builds
    * the cell table; the marginals reduce FROM the cells (never a
    * second data pass), join back broadcast, and the grand total rides
    * a 1-row broadcast.
    */
  def featureAssoc(rows: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val cell = rows.groupBy(xCol.as("_x"), yCol.as("_y"))
      .agg(count(lit(1)).as("n_xy"))
    val nx = cell.groupBy(col("_x")).agg(sum(col("n_xy")).as("n_x"))
    val ny = cell.groupBy(col("_y")).agg(sum(col("n_xy")).as("n_y"))
    val tot = cell.agg(sum(col("n_xy")).as("n_tot"))
    cell
      .join(broadcast(nx), "_x")
      .join(broadcast(ny), "_y")
      .crossJoin(broadcast(tot))
      .withColumn("pmi_q",
        // fail-LOUD overflow guard: past n_tot ≈ 3·10⁹ the n_xy·n_tot
        // product wraps silently under Spark's non-ANSI long arithmetic
        // while the DuckDB oracle errors on BIGINT overflow — two
        // different failure modes for the same bad input. One compare
        // per cell row (cells, not raw rows) makes both engines fail
        // the same way: loudly, here. Past the bound, sample or rescale
        // counts before calling (the scaladoc contract, now enforced).
        when(col("n_tot") > lit(3000000000L), raise_error(concat(
          lit("featureAssoc: n_tot="), col("n_tot").cast("string"),
          lit(" exceeds the 3e9 BIGINT-safe bound for pmi_q — sample or rescale counts"))))
          .otherwise((Dsir.ilog2(col("n_xy") * col("n_tot")) -
            Dsir.ilog2(col("n_x") * col("n_y"))).cast("bigint")))
      .withColumn("leverage_micro",
        (expr("(n_xy * 1000000) DIV n_tot") -
          expr("(((n_x * 1000000) DIV n_tot) * ((n_y * 1000000) DIV n_tot)) DIV 1000000"))
          .cast("bigint"))
      .select(col("_x"), col("_y"),
        col("n_xy").cast("bigint").as("n_xy"),
        col("n_x").cast("bigint").as("n_x"),
        col("n_y").cast("bigint").as("n_y"),
        col("n_tot").cast("bigint").as("n_tot"),
        col("pmi_q"), col("leverage_micro"))
  }

  /** Per-group ordinary-least-squares fit y = slope·x + intercept,
    * from the same exact decimal moments as [[corrExact]] — and for the
    * same reason: Spark's `regr_slope`/`regr_intercept` sum doubles in
    * partition order, so their last ulp is layout-dependent and can't
    * be hash-verified. The finish is a FIXED sequence of
    * correctly-rounded double ops over exact decimal moments:
    *   slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    *   intercept = (Σy − slope·Σx) / n
    *   r²        = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))
    * so both engines compute bit-identical doubles from bit-identical
    * integers. One map-side-combining shuffle carrying six exact
    * decimals per group — the distributed cost is identical to a plain
    * count(*), whatever the group cardinality.
    */
  def olsExact(rows: DataFrame, groupCols: Seq[String],
      xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(18,2)")
    val y = col(yCol).cast("decimal(18,2)")
    val (n, sx, sy, sxy, sxx, syy) = (col("n"),
      col("_sx").cast("double"), col("_sy").cast("double"),
      col("_sxy").cast("double"), col("_sxx").cast("double"),
      col("_syy").cast("double"))
    val num = sxy * n - sx * sy
    val denx = sxx * n - sx * sx
    val slope = num / denx
    rows.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("_sx"), sum(y).as("_sy"),
        sum(x * y).as("_sxy"), sum(x * x).as("_sxx"), sum(y * y).as("_syy"))
      .select(groupCols.map(col) ++ Seq(
        n,
        slope.as("slope"),
        ((sy - slope * sx) / n).as("intercept"),
        (num * num / (denx * (syy * n - sy * sy))).as("r2")): _*)
  }

  /** Burst compaction: collapse each run of events spaced ≤ `gapMicros`
    * apart (per key) to its FIRST event, annotated with the run length
    * — impression dedup / retry collapse for event pipelines. The
    * burst boundary is the same strict-gap rule as sessionization, so
    * the lag, the boundary prefix-sum, and the final per-burst
    * collapse all ride ONE (key → ts, tie) sort; the burst head is the
    * burst's unique boundary row, recovered by min-over-case (no
    * argmin — the oracle spells the identical aggregate). The
    * compaction is auditable: sum(burst_len) = input rows.
    */
  def burstCompact(rows: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, gapMicros: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    val flagged = rows
      .withColumn("_prev", lag(col(tsCol), 1).over(w))
      .withColumn("_keep", col("_prev").isNull ||
        unix_micros(col(tsCol)) - unix_micros(col("_prev")) > gapMicros)
      .withColumn("_burst", sum(when(col("_keep"), 1L).otherwise(0L)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged
      .groupBy(keyCols.map(col) :+ col("_burst"): _*)
      .agg(min(when(col("_keep"), col(tieCol))).as(tieCol),
        min(col(tsCol)).as(tsCol), count(lit(1)).as("burst_len"))
      .select(col(tieCol) +: keyCols.map(col) :+ col(tsCol) :+
        col("burst_len"): _*)
  }

  /** Rolling EXACT median over a row frame — the robust-statistics
    * sibling of [[anomalyZscore]]'s mean/stddev. Median is holistic
    * (no algebraic partial state), which is precisely why it's worth
    * shipping as an operator: Spark's `percentile` evaluates it
    * per-frame inside ONE key-partitioned window exchange, O(frame)
    * memory per row — not a global sort, not a per-key collect. Values
    * ride the exact integer-cents domain, so the interpolated midpoint
    * (k or k+0.5 cents) is an exactly-representable double and the
    * result hash-verifies against any engine's continuous-quantile
    * median (DuckDB: `median(BIGINT) OVER w`).
    */
  def rollingMedian(rows: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String, lookback: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, Window.currentRow)
    val x = (col(valCol).cast("decimal(12,2)") * 100).cast("long")
    rows
      .withColumn("_x", x)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("med_cents", percentile(col("_x"), lit(0.5)).over(w))
      .select(col(tieCol), col(keyCol), col(tsCol), col("n"), col("med_cents"))
  }

  def anomalyZscore(rows: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, valCol: String,
      lookback: Int, minN: Int, k: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, Window.currentRow)
    val x = (col(valCol).cast("decimal(12,2)") * 100).cast("long")
    val flagged = rows
      .withColumn("_x", x)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("_s", sum(col("_x")).over(w))
      .withColumn("_q", sum(col("_x") * col("_x")).over(w))
    val dev = col("n") * col("_x") - col("_s")
    val varN2 = col("n") * col("_q") - col("_s") * col("_s")
    flagged
      .where(col("n") >= minN && dev * dev > lit(k.toLong * k) * varN2)
      .select(col(tieCol), col(keyCol), col(tsCol), col(valCol), col("n"))
  }

  /** CUSUM change-point screening per key: the classic cumulative-sum
    * excursion against the key's own mean, kept EXACT by clearing the
    * mean's denominator — at step k the deviation is
    * `n·P_k − k·S` (P_k = prefix sum, S = total, n = count, all
    * integer cents), which is n× the usual `P_k − k·(S/n)` and never
    * touches floating point until the single normalizing division on
    * the per-key row. A level shift mid-series makes the deviation
    * ramp; stationary series oscillate near zero. Keys whose
    * normalized peak-to-trough excursion exceeds `threshold` (currency
    * units) are flagged.
    *
    * One key exchange: prefix/rank/total windows stack on the same
    * partition, and the per-key collapse reuses it.
    */
  def cusumExcursions(rows: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, centsCol: String, threshold: Double): DataFrame = {
    val ordw = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val runw = ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(keyCol)
    rows
      .withColumn("_p", sum(col(centsCol)).over(runw))
      .withColumn("_k", row_number().over(ordw).cast("long"))
      .withColumn("_s", sum(col(centsCol)).over(all))
      .withColumn("_n", count(lit(1)).over(all))
      // n·P − k·S multiplies two prefix-sum-scale longs, so it wraps
      // int64 once n²·|cents| clears 2⁶³ (~3×10⁷ rows/key at $100
      // values) — and a wrapped dev silently corrupts the max/min
      // extremes. Widen to decimal(38,0) BEFORE multiplying (the same
      // convention as corrExact), matching the oracle's HUGEINT
      // promotion; only the final extremes narrow back to BIGINT, where
      // overflow is loud (null here, error in DuckDB), never silent.
      .withColumn("_dev",
        col("_n").cast("decimal(38,0)") * col("_p")
          - col("_k").cast("decimal(38,0)") * col("_s"))
      .groupBy(col(keyCol))
      .agg(max(col("_n")).as("n"),
        max(col("_dev")).cast("long").as("max_dev"),
        min(col("_dev")).cast("long").as("min_dev"))
      .withColumn("excursion",
        (col("max_dev") - col("min_dev")).cast("double")
          / (lit(100L) * col("n")))
      .filter(col("excursion") > threshold)
  }
}
