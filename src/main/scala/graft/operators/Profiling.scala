package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiling — the data-quality sweep a pipeline runs
  * before trusting a new drop: per column, row/null/exact-distinct
  * counts and min/max rendered to strings.
  *
  * Plan shape: ONE wide aggregate over the scan. Multiple exact
  * `count(DISTINCT c)` in one aggregate plan through Spark's Expand
  * (each input row fans out once per profiled column), so the pass
  * costs ~n_cols × scan — still one job, no joins, and the shuffle
  * carries a single row. At 100 TB swap `countDistinct` for the KMV
  * sketch ([[Sketches.kmvDistinct]]) column-by-column if the Expand
  * multiplication matters; the output contract is unchanged.
  *
  * min/max cross the oracle boundary as strings: fractional numerics
  * render via DECIMAL(28,6) (both engines pad to scale — double
  * formatting would diverge), integers and timestamps via plain
  * string casts.
  */
object Profiling {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
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
      Seq(
        count(c).as(s"_nn_$name"),
        countDistinct(c).as(s"_nd_$name"),
        render(c, dt, x => min(x)).as(s"_min_$name"),
        render(c, dt, x => max(x)).as(s"_max_$name"))
    } :+ count(lit(1)).as("_rows")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackExpr = cols.map { c =>
      s"'$c', `_nn_$c`, `_nd_$c`, `_min_$c`, `_max_$c`"
    }.mkString(s"stack(${cols.size}, ", ", ", ")")
    one.select(col("_rows").as("n_rows"),
        expr(s"$stackExpr AS (col_name, n_non_null, n_distinct, min_value, max_value)"))
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_non_null")).as("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"))
  }
}
