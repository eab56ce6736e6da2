package graft

import org.apache.spark.sql.functions._

import graft.functions.VecOuterSum.vec_outer_sum

/** Matrix-buffer second-moment aggregate: hand-computed sums,
  * symmetric mirroring, partial/merge invariance, malformed-row drop.
  */
class VecOuterSumSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    Array(1L, 2L, 3L),
    Array(4L, 5L, 6L),
    Array(-1L, 0L, 2L))

  test("hand-computed n, sums, and full symmetric outer-product matrix") {
    val out = rows.toDF("q")
      .agg(vec_outer_sum(col("q"), 3).as("m"))
      .select("m.n", "m.sums", "m.xy")
      .as[(Long, Seq[Long], Seq[Long])].head()
    assert(out._1 == 3L)
    assert(out._2 == Seq(4L, 7L, 11L))
    // Σ x_i x_j computed by hand, row-major 3×3
    val exp = Seq(
      18L, 22L, 25L, // (1,4,-1)·{...}
      22L, 29L, 36L,
      25L, 36L, 49L)
    assert(out._3 == exp)
  }

  test("partial aggregation merges to the identical matrix") {
    def run(parts: Int) = rows.toDF("q").repartition(parts)
      .agg(vec_outer_sum(col("q"), 3).as("m"))
      .select("m.n", "m.sums", "m.xy")
      .as[(Long, Seq[Long], Seq[Long])].head()
    assert(run(1) == run(3))
  }

  test("rows with the wrong dimensionality or null are skipped, not corrupted") {
    val mixed = Seq(Some(Array(1L, 2L, 3L)), Some(Array(9L)), None)
      .toDF("q")
      .agg(vec_outer_sum(col("q"), 3).as("m"))
      .select("m.n").as[Long].head()
    assert(mixed == 1L)
  }
}
