package graft

import org.apache.spark.sql.functions._

import graft.operators.Evaluation

class EvaluationSpec extends SparkSpec {
  import spark.implicits._

  test("auc: hand-counted pairs with a tie — 7/8") {
    // pos scores {0.03, 0.02}, neg {0.01, 0.02}:
    //   pairs won = (3>1) + (3>2) + (2>1) = 3, ties = (2=2) = 1
    //   auc = (2·3 + 1) / (2·2·2) = 0.875
    val df = Seq((0.03, "purchase"), (0.02, "purchase"),
        (0.01, "view"), (0.02, "view"))
      .toDF("value", "event_type")
    val r = Evaluation.aucExact(df, "value", col("event_type") === "purchase")
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(r === ((2L, 2L, 3L, 1L, 0.875)))
  }

  test("auc: perfect separation gives 1.0, reversed gives 0.0") {
    val hi = Seq((0.9, "purchase"), (0.8, "purchase"), (0.1, "view"))
      .toDF("value", "event_type")
    val perfect = Evaluation.aucExact(hi, "value", col("event_type") === "purchase")
      .select("auc").as[Double].collect().head
    assert(perfect === 1.0)
    val reversed = Evaluation.aucExact(hi, "value", col("event_type") === "view")
      .select("auc").as[Double].collect().head
    assert(reversed === 0.0)
  }

  test("auc: label reversal complements exactly, ties included") {
    // pairs_won' = pairs_lost and ties are symmetric, so
    // auc(reversed) = 1 − auc holds EXACTLY (both derive from the same
    // integers, and the two divisions share a denominator)
    val rnd = new scala.util.Random(13)
    val df = (1 to 200).map { _ =>
      (math.rint(rnd.nextDouble() * 500) / 100.0,
        if (rnd.nextBoolean()) "purchase" else "view")
    }.toDF("value", "event_type")
    val fwd = Evaluation.aucExact(df, "value", col("event_type") === "purchase")
      .as[(Long, Long, Long, Long, Double)].collect().head
    val rev = Evaluation.aucExact(df, "value", col("event_type") === "view")
      .as[(Long, Long, Long, Long, Double)].collect().head
    // the integer identity is exact: won + won' + ties = n⁺·n⁻
    assert(fwd._3 + rev._3 + fwd._4 === fwd._1 * fwd._2,
      s"pair accounting broke: fwd=$fwd rev=$rev")
    assert(fwd._4 === rev._4, "tie count must be label-symmetric")
    assert(math.abs(fwd._5 + rev._5 - 1.0) < 1e-12, s"auc=${fwd._5} rev=${rev._5}")
    assert(fwd._5 > 0.0 && fwd._5 < 1.0)
  }

  test("calibration bins: width, clamp, and exact per-bin stats") {
    // width 50: 25.00 → bin 0 (pos), 75.00 → bin 1, 600.00 clamps to 9
    val df = Seq((25.0, "purchase"), (75.0, "view"), (600.0, "view"))
      .toDF("value", "event_type")
    val r = Evaluation.calibrationBins(df, "value",
        col("event_type") === "purchase", bins = 10, lo = 0.0, hi = 500.0)
      .select("bin", "n", "n_pos", "sum_cents", "mean_score", "frac_pos")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
      .map(x => x._1 -> x).toMap
    assert(r(0L) === ((0L, 1L, 1L, 2500L, 25.0, 1.0)))
    assert(r(1L) === ((1L, 1L, 0L, 7500L, 75.0, 0.0)))
    assert(r(9L) === ((9L, 1L, 0L, 60000L, 600.0, 0.0)))
  }

  test("ks: hand-computed max CDF gap, identical samples give 0") {
    // A = {1, 2}, B = {2, 3} (cents): F_A(1)=.5 F_B(1)=0 → D = 0.5
    val df = Seq((0.01, "purchase"), (0.02, "purchase"),
        (0.02, "view"), (0.03, "view"))
      .toDF("value", "event_type")
    val r = Evaluation.ksStatistic(df, "value", col("event_type") === "purchase")
      .as[(Long, Long, Long, Double)].collect().head
    assert(r === ((2L, 2L, 2L, 0.5)))
    val same = Seq((0.01, "purchase"), (0.01, "view"),
        (0.02, "purchase"), (0.02, "view"))
      .toDF("value", "event_type")
    val d0 = Evaluation.ksStatistic(same, "value", col("event_type") === "purchase")
      .select("ks_d").as[Double].collect().head
    assert(d0 === 0.0)
  }
}
