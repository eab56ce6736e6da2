package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantize

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8: constant vector quantizes to all-zero codes with zero error") {
    val df = Seq((1L, Seq(0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val r = Quantize.int8(df, "embedding", Seq("vec_id"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    // (vec_id, mn_q, mx_q, code_sum, code_wsum, abs_err_q)
    assert(r == ((1L, 5000L, 5000L, 0L, 0L, 0L)))
  }

  test("int8: reconstruction error is bounded by span/255 + 1 per element") {
    val rnd = new scala.util.Random(11)
    val df = (1L to 200L)
      .map(i => (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val rows = Quantize.int8(df, "embedding", Seq("vec_id"))
      .select(col("vec_id"), col("mx_q") - col("mn_q"), col("abs_err_q"))
      .as[(Long, Long, Long)].collect()
    assert(rows.length == 200)
    for ((id, span, err) <- rows) {
      val perElem = span / 255 + 1
      assert(err <= 64 * perElem, s"vec $id: err=$err span=$span")
    }
  }

  test("zscore: hand-computed per-dim z, zero-variance dim yields NULL") {
    // dim 1: x = {10000, 30000} -> n=2 s=40000 q=1e9, var = 2e9-1.6e9 = 4e8,
    //   sqrt = 20000 -> z = (2x-40000)/20000 = -1 / +1
    // dim 2: constant 20000 -> variance 0 -> NULL (not NaN/Infinity)
    val df = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val r = Quantize.zscore(df, "vec_id", "embedding")
      .as[(Long, Long, Option[Double])].collect()
      .map { case (id, dim, z) => (id, dim) -> z }.toMap
    assert(r((1L, 1L)).contains(-1.0) && r((2L, 1L)).contains(1.0))
    assert(r((1L, 2L)).isEmpty && r((2L, 2L)).isEmpty,
      s"constant dim must be NULL, got ${r((1L, 2L))} / ${r((2L, 2L))}")
  }

  test("int8: codes stay in [0, 255] and extremes map to the range ends") {
    // spot-check through the signature columns: a 2-element vector
    // [mn, mx] has codes [0, 255] exactly -> sum 255, wsum 2*255
    val df = Seq((1L, Seq(-1.0f, 1.0f))).toDF("vec_id", "embedding")
    val r = Quantize.int8(df, "embedding", Seq("vec_id"))
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r._4 == 255L && r._5 == 510L,
      s"extremes must hit code 0 and 255: $r")
    assert(r._6 == 0L, s"range ends reconstruct exactly: $r")
  }
}
