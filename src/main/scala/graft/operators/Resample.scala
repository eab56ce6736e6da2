package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Poisson bootstrap — THE resampling scheme that survives 100 TB.
  *
  * Classic bootstrap draws n rows with replacement per replicate, which
  * needs a global index (a total order over the data) and materializes
  * B×n resampled rows. The Poisson approximation replaces the draw with
  * an independent per-row Poisson(1) weight per replicate (for large n
  * the multinomial row-counts converge to independent Poisson(1)), so
  * every replicate becomes a weighted aggregate over ONE scan — no
  * expansion, no global state, embarrassingly parallel.
  *
  * Determinism: the weight is an inverse-CDF lookup on a 60-bit uniform
  * from md5(salt:rowid:rep) — the repo's standard reproducible-draw
  * idiom (layout- and partitioning-independent, replayable in any
  * engine with md5). The CDF thresholds are Poisson(1) partial sums
  * scaled to 2⁶⁰ and truncated, embedded as literals so the Spark plan
  * and the SQL oracle compare against the SAME integers.
  */
object Resample {

  /** floor(P(Poisson(1) ≤ k) · 2⁶⁰) for k = 0..5; u ≥ the last → w = 6.
    * Computed once from the exact partial sums e⁻¹·Σ 1/i! via BigDecimal
    * (not double math) so the literals are reproducible from the
    * published formula.
    */
  val cdfThresholds: Seq[Long] = {
    val mc = new java.math.MathContext(50)
    // math.E as double would poison the tail digits — build e from the
    // series instead: e = Σ 1/i!, 30 terms is < 1e-32 away.
    val e = (0 to 30).map(i => BigDecimal(1, mc) /
      BigDecimal((1 to i).foldLeft(BigInt(1))(_ * _), mc)).sum
    val invE = BigDecimal(1, mc) / e
    val two60 = BigDecimal(BigInt(1) << 60)
    (0 to 5).map { k =>
      val cdf = invE * (0 to k).map(i => BigDecimal(1, mc) /
        BigDecimal((1 to i).foldLeft(BigInt(1))(_ * _), mc)).sum
      (cdf * two60).toBigInt.longValue
    }
  }

  /** The per-(row, rep) Poisson(1) weight as a Column (0..6). */
  def weight(idCol: Column, rep: Int, salt: String): Column = {
    val u = conv(substring(
      md5(concat(lit(s"$salt:"), idCol.cast("string"), lit(s":$rep"))),
      1, 15), 16, 10).cast("long")
    // fold from the LARGEST threshold inward so the final when-chain
    // tests the smallest first (a when chain matches outermost-first;
    // folding ascending would trap ~99.9% of draws at w=5)
    cdfThresholds.zipWithIndex.reverse.foldLeft(lit(6): Column) {
      case (acc, (thr, k)) => when(u < lit(thr), lit(k)).otherwise(acc)
    }
  }

  /** B bootstrap replicates of a weighted mean over `valueCol` (exact
    * integer units, e.g. cents) in ONE aggregate pass: the
    * [[graft.functions.BootSums]] fixed-buffer aggregate accumulates
    * all 2·B running sums (Σw, Σw·v) in one 2·B-long buffer — no row
    * explosion, one 512-byte partial per task across the exchange —
    * then a posexplode of the single result row to B rows.
    * mean = Σwv / Σw evaluated in double identically on both engines.
    * (The previous 2·B-sum-columns formulation blew Janino's method
    * limit at B = 32 and ran interpreted; the typed buffer is the
    * codegen-immune shape.) Adding reps scales the MAP side only.
    */
  /** `spread`: optional pre-aggregate round-robin repartition width.
    * The draw costs `reps` md5s per row inside the aggregate's update
    * loop, so the partial-agg stage is CPU-bound, and its parallelism
    * is pinned to the SCAN's split count — a single local parquet
    * file = one task doing every hash (measured: 3 tasks / 5.1 s
    * single-core at reps=32, sf0.1). On a real multi-file/multi-block
    * table the scan already fans out and `spread` should stay None
    * (the extra shuffle of the 2-column (id, value) projection buys
    * nothing); set it only when feeding from a source with fewer
    * splits than cores.
    */
  def bootstrapMeans(df: DataFrame, idCol: Column, valueCol: Column,
      reps: Int, salt: String = "boot", spread: Option[Int] = None): DataFrame = {
    require(reps >= 1 && reps <= 256, s"reps must be in [1,256], got $reps")
    // materialize each weight in a projection BEFORE aggregating: inside
    // a 2·reps-expression aggregate the md5→conv chain dodges common-
    // subexpression elimination (measured 9.6 s → the weights-first
    // shape at reps=32/sf0.1), while a projection computes each hash
    // exactly once per (row, rep)
    val narrow = df.select(idCol.cast("string").as("_id"),
      valueCol.cast("long").as("_v"))
    val base = spread.map(narrow.repartition(_)).getOrElse(narrow)
    val one = base.agg(graft.functions.BootSums
      .boot_sums(col("_id"), col("_v"), reps, salt, cdfThresholds).as("m"))
    val stacked = one
      .select(posexplode(arrays_zip(col("m.n"), col("m.wv")))
        .as(Seq("rep", "z")))
      .select(col("rep").cast("int").as("rep"),
        col("z.n").as("n_eff"), col("z.wv").as("wsum"))
    // explicit empty-replicate gate (every row drew weight 0 — P ≈ e⁻ⁿ,
    // only plausible on tiny inputs): NULL by decision, not by leaning
    // on either engine's double 0/0 behavior
    stacked.select(col("rep"), col("n_eff"), col("wsum"),
      when(col("n_eff") === 0, lit(null).cast("double"))
        .otherwise(col("wsum").cast("double") / col("n_eff").cast("double"))
        .as("mean_rep"))
  }
}
