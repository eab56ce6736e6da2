package graft

import org.apache.spark.sql.functions._

import graft.operators.{Robust, Skyline}

class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("weighted median picks the smallest value reaching half the weight") {
    val df = Seq(
      ("a", 1L, 10L, 1L), ("a", 2L, 20L, 2L), ("a", 3L, 30L, 1L),
      ("b", 1L, 10L, 1L), ("b", 2L, 20L, 1L)
    ).toDF("k", "id", "v", "w")
    val r = Robust.weightedMedian(df, "k", "v", "w")
      .collect().map(x => x.getAs[String]("k") ->
        (x.getAs[Long]("med"), x.getAs[Long]("total_w"))).toMap
    // a: W=4; cum 10->1, 20->3 (2*3>=4) -> 20
    assert(r("a") === ((20L, 4L)))
    // b: W=2; cum 10->1, 2*1>=2 -> lower median 10
    assert(r("b") === ((10L, 2L)))
  }

  test("weighted median is invariant to input partitioning") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001").select(
      col("l_returnflag").as("flag"), col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice").cast("decimal(14,2)") * 100)
        .cast("bigint").as("cents"),
      round(col("l_quantity")).cast("bigint").as("w"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Robust.weightedMedian(d, "flag", "cents", "w")
        .collect().map(_.toSeq).toSet
    assert(run(df) === run(df.repartition(7)))
  }

  test("winsorized stats clamp the 5% tails algebraically") {
    // 20 rows, cents 100..2000: k=1, lo=rank2=200, hi=rank19=1900
    val df = (1 to 20).map(i => ("g", i.toLong, i * 100L))
      .toDF("grp", "id", "x")
    val r = Robust.winsorizedStats(df, "grp", "x", "id").collect().head
    assert(r.getAs[Long]("n") === 20L)
    assert(r.getAs[Long]("k") === 1L)
    assert(r.getAs[Long]("lo_cents") === 200L)
    assert(r.getAs[Long]("hi_cents") === 1900L)
    // wins sum = 1*(200+1900) + sum(200..1900 step 100) = 2100 + 18900
    assert(r.getAs[Double]("wins_mean") === 21000.0 / (100 * 20))
    assert(r.getAs[Double]("trim_mean") === 18900.0 / (100 * 18))
  }

  test("winsorized stats match a row-sort reference on random tied multisets") {
    // The histogram formulation must equal the definitional "sort the
    // rows, clamp k each side" computation for every multiset shape —
    // heavy ties (values drawn from a domain of 7) make rank intervals
    // span the k+1 / n−k cut points, the case rank arithmetic can get
    // subtly wrong.
    val rnd = new scala.util.Random(42)
    (1 to 30).foreach { trial =>
      val denom = Seq(2, 3, 5, 20)(rnd.nextInt(4))
      val groups = (0 until 1 + rnd.nextInt(3)).map { g =>
        val n = 1 + rnd.nextInt(40)
        g.toString -> Seq.fill(n)(rnd.nextInt(7) * 50L)
      }
      val rows = groups.flatMap { case (g, vs) =>
        vs.zipWithIndex.map { case (v, i) => (g, i.toLong, v) }
      }
      val got = Robust.winsorizedStats(
          rows.toDF("grp", "id", "x"), "grp", "x", "id", tailDenom = denom)
        .collect().map { r =>
          r.getAs[String]("grp") ->
            ((r.getAs[Long]("n"), r.getAs[Long]("k"),
              r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"),
              Option(r.getAs[java.lang.Double]("wins_mean")).map(_.toDouble),
              Option(r.getAs[java.lang.Double]("trim_mean")).map(_.toDouble)))
        }.toMap
      groups.foreach { case (g, vs) =>
        val sorted = vs.sorted
        val n = sorted.length
        val k = n / denom
        val lo = sorted(k)
        val hi = sorted(n - k - 1)
        val mid = sorted.slice(k, n - k)
        val expWins =
          if (mid.isEmpty) None
          else Some((k * (lo + hi) + mid.sum).toDouble / (100.0 * n))
        val expTrim =
          if (n > 2 * k) Some(mid.sum.toDouble / (100.0 * (n - 2 * k)))
          else None
        assert(got(g) === ((n.toLong, k.toLong, lo, hi, expWins, expTrim)),
          s"trial $trial group $g denom $denom vs ${sorted.mkString(",")}")
      }
    }
  }

  test("winsorized stats are invariant to input partitioning") {
    val df = Tables.events(spark, "/root/testdata/sf0.001").select(
      col("event_type"), col("event_id"),
      (col("value").cast("decimal(12,2)") * 100).cast("bigint").as("x"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Robust.winsorizedStats(d, "event_type", "x", "event_id")
        .collect().map(_.toSeq).toSet
    assert(run(df) === run(df.repartition(7)))
  }

  test("winsorized trim mean is null when the tails cover the group") {
    // n=1 with tailDenom=2 -> k=0 -> trim over all rows still defined;
    // force empty middle with n=2, tailDenom=2 -> k=1, middle empty
    val df = Seq(("g", 1L, 100L), ("g", 2L, 300L)).toDF("grp", "id", "x")
    val r = Robust.winsorizedStats(df, "grp", "x", "id", tailDenom = 2)
      .collect().head
    assert(r.isNullAt(r.fieldIndex("trim_mean")))
  }

  test("skyline keeps exactly the non-dominated rows, ties included") {
    val df = Seq(
      (1L, 5L, 5L), // dominated by 3
      (2L, 9L, 1L), // skyline
      (3L, 6L, 6L), // skyline
      (4L, 6L, 6L), // exact tie of 3 -> both survive
      (5L, 1L, 9L), // skyline
      (6L, 1L, 1L)  // dominated by everyone
    ).toDF("id", "d1", "d2")
    val kept = Skyline.pareto(df, Seq("d1", "d2"))
      .select("id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L, 4L, 5L))
  }

  test("skyline is invariant to input partitioning") {
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
      .groupBy("o_custkey")
      .agg(sum((col("o_totalprice").cast("decimal(14,2)") * 100)
        .cast("bigint")).as("spend"), count(lit(1)).as("n_orders"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Skyline.pareto(d, Seq("spend", "n_orders"))
        .select("o_custkey").as[Long].collect().toSet
    val base = run(df)
    assert(base.nonEmpty)
    assert(base === run(df.repartition(13)))
  }

  test("madOutliers: hand-computed lower medians and the 5-MAD screen") {
    // values 0,10,20,30,1000: lower med = 20 (first with 2·cw ≥ 5);
    // |v−20| = 20,10,0,10,980 → lower MAD = 10; flag |v−20| > 50 → 1000
    val df = Seq((1L, "k", 0L), (2L, "k", 10L), (3L, "k", 20L),
      (4L, "k", 30L), (5L, "k", 1000L)).toDF("id", "grp", "cents")
    val out = Robust.madOutliers(df, "grp", "cents", "id", factor = 5L)
      .select("id", "med", "abs_dev", "mad")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((5L, 20L, 980L, 10L)), out.mkString(","))
  }

  test("madOutliers: zero MAD (constant majority) flags every deviant, " +
      "and an untouched group flags nothing") {
    val df = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L),
      (4L, "a", 10L), (5L, "a", 100L),
      (6L, "b", 1L), (7L, "b", 2L), (8L, "b", 3L)).toDF("id", "grp", "cents")
    val got = Robust.madOutliers(df, "grp", "cents", "id", factor = 5L)
      .select("id").as[Long].collect().toSet
    // group a: med=10, MAD=0 → any nonzero deviation exceeds 5·0
    // group b: med=2, MAD=1 → max deviation 1 ≤ 5
    assert(got === Set(5L))
  }

  test("madOutliers is invariant to input partitioning") {
    val rnd = new scala.util.Random(23)
    val df = (1L to 500L).map(i => (i, s"g${i % 3}", rnd.nextInt(1000).toLong))
      .toDF("id", "grp", "cents")
    def run(d: org.apache.spark.sql.DataFrame) =
      Robust.madOutliers(d, "grp", "cents", "id").collect().toSet
    assert(run(df.repartition(1)) == run(df.repartition(17)))
  }
}
