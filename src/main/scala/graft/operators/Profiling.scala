package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.KMinValues.k_min_values

/** One-pass table profiling — the data-quality sweep a pipeline runs
  * before trusting a new drop: per column, row/null/distinct counts
  * and min/max rendered to strings.
  *
  * Plan shape: ONE wide aggregate over the scan, NO Expand. Multiple
  * exact `count(DISTINCT c)` in one aggregate would plan through
  * Spark's Expand — every input row fans out once per profiled column
  * and the exchange then carries every distinct value of every column,
  * the one shape in this engine that audibly breaks at 100 TB (a
  * unique key column alone would push its whole cardinality through
  * the shuffle). Instead each column's distinct count comes from the
  * engine's own KMV bottom-k sketch ([[graft.functions.KMinValues]]):
  * map-side partial sketches, ≤ k longs per (task, column) on the
  * wire, duplicates collapsed in the buffer.
  *
  * Exactness contract: a sketch that never fills (distinct ≤ k,
  * k = 262144 here) reports the EXACT distinct-hash count. Unlike the
  * oracle-verified sketch queries (which hash via md5 so DuckDB can
  * recompute the sketch itself), the profile only needs the COUNT to
  * match the oracle's exact `count(DISTINCT c)` — any deterministic
  * collision-free hash does, so it uses codegen'd `xxhash64` on the
  * native value (no string casts, ~none of md5's cost; collision
  * p ≈ k²/2⁶⁴ < 10⁻¹⁰ at fill). Past the fill the column reports the
  * (k−1)·2⁶³/kth bottom-k estimate over the sign-cleared hash (≈0.6 %
  * rel. error), rounded to a BIGINT — the documented exact→approx
  * switch.
  *
  * min/max cross the oracle boundary as strings: fractional numerics
  * render via DECIMAL(28,6) (both engines pad to scale — double
  * formatting would diverge), integers and timestamps via plain
  * string casts.
  */
object Profiling {

  /** Covers every column of the oracle-verified fixtures through sf0.1
    * (orders.o_orderkey ≈ 150 k distinct) on the exact path; 2 MiB of
    * longs per (task, column) partial. */
  val kmvK: Int = 1 << 18

  /** @param exact when true, a column whose distinct count crosses the
    *   sketch capacity raises a clear error instead of silently
    *   switching to the ≈0.6 % bottom-k estimate — the mode the
    *   oracle-verified query runs in, so a larger-sf correctness run
    *   fails loudly rather than hash-mismatching.
    * @param k sketch capacity. The default covers the oracle fixtures
    *   exactly through sf0.1; ESTIMATE-mode profiling of genuinely
    *   high-cardinality tables should pass a smaller k (32768 gives
    *   ≈0.6 % error at 1/8th the partial-buffer weight — measured 1.9×
    *   faster on 15 M-row orders, BASELINE.md round-9 sf10 table). */
  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = false,
      k: Int = kmvK): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    def render(c: Column, dt: DataType, agg: Column => Column): Column = dt match {
      case DoubleType | FloatType | _: DecimalType =>
        agg(c.cast("decimal(28,6)")).cast("string")
      case _ => agg(c).cast("string")
    }
    val aggs = cols.flatMap { name =>
      val c = col(name)
      val dt = schema(name).dataType
      // xxhash64(null-literal-free) returns the SEED for null inputs, so
      // gate nulls explicitly — count(DISTINCT c) skips them, the sketch
      // must too. shiftrightunsigned clears the sign so the bottom-k
      // estimator's uniform-[0, 2⁶³) assumption holds.
      val h = when(c.isNull, lit(null).cast("long"))
        .otherwise(shiftrightunsigned(xxhash64(c), 1))
      Seq(
        count(c).as(s"_nn_$name"),
        k_min_values(h, k).as(s"_kmv_$name"),
        render(c, dt, x => min(x)).as(s"_min_$name"),
        render(c, dt, x => max(x)).as(s"_max_$name"))
    } :+ count(lit(1)).as("_rows")
    // (k−1)·2⁶³ is a small int times a power of two — exact as a double
    val numer = (k - 1).toDouble * math.pow(2, 63)
    val one = df.agg(aggs.head, aggs.tail: _*)
      .select(col("_rows") +: cols.flatMap { name =>
        val overflow: Column =
          if (exact) raise_error(lit(s"profile(exact=true): column '$name' has" +
            s" more than k=$k distinct values — the sketch filled, so the" +
            " count would be a ~0.6% estimate and fail an exact oracle;" +
            " rerun with exact=false or raise k"))
          else round(lit(numer) / col(s"_kmv_$name.kth_hash").cast("double"), 0)
            .cast("long")
        Seq(col(s"_nn_$name"), col(s"_min_$name"), col(s"_max_$name"),
          when(col(s"_kmv_$name.n_kept") < k, col(s"_kmv_$name.n_kept"))
            .otherwise(overflow)
            .as(s"_nd_$name"),
          // the exact→estimate switch made legible per row: a larger
          // fixture that crosses the sketch fill flips this to false,
          // so an oracle mismatch reads as "estimated" instead of a
          // bare hash diff (the oracle computes count(DISTINCT) < k)
          (col(s"_kmv_$name.n_kept") < k).as(s"_ex_$name"))
      }: _*)
    val stackExpr = cols.map { c =>
      s"'$c', `_nn_$c`, `_nd_$c`, `_min_$c`, `_max_$c`, `_ex_$c`"
    }.mkString(s"stack(${cols.size}, ", ", ", ")")
    one.select(col("_rows").as("n_rows"),
        expr(s"$stackExpr AS (col_name, n_non_null, n_distinct, min_value, max_value, is_exact)"))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"),
        col("is_exact"))
  }
}
