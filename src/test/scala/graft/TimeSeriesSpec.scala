package graft

import org.apache.spark.sql.functions._

import graft.operators.{Resample, TimeSeries}

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def at(hourOffset: Int, i: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 ${hourOffset}%02d:00:${i % 60}%02d")

  test("acf of a perfectly linear hourly series is 1.0 at every lag") {
    // hour h carries h+1 events → counts 1..6; any lag pairs are x=y+L
    val rows = for (h <- 0 to 5; i <- 0 to h) yield ("k", at(h, i))
    val df = rows.toDF("event_type", "ts")
    val out = TimeSeries.acf(df, "event_type", "ts", "hour", maxLag = 2)
      .select("lag", "n_pairs", "acf").as[(Int, Long, Double)].collect()
      .map { case (l, n, r) => l -> ((n, r)) }.toMap
    assert(out(1)._1 == 5L && out(2)._1 == 4L)
    assert(math.abs(out(1)._2 - 1.0) < 1e-12, s"lag1 acf=${out(1)._2}")
    assert(math.abs(out(2)._2 - 1.0) < 1e-12, s"lag2 acf=${out(2)._2}")
  }

  test("acf of an alternating series is -1.0 at lag 1 and 1.0 at lag 2") {
    // counts 1,3,1,3,1,3 → perfect negative lag-1, perfect positive lag-2
    val rows = for (h <- 0 to 5; i <- 0 until (if (h % 2 == 0) 1 else 3))
      yield ("k", at(h, i))
    val out = TimeSeries.acf(rows.toDF("event_type", "ts"), "event_type", "ts",
        "hour", maxLag = 2)
      .select("lag", "acf").as[(Int, Double)].collect().toMap
    assert(math.abs(out(1) + 1.0) < 1e-12, s"lag1=${out(1)}")
    assert(math.abs(out(2) - 1.0) < 1e-12, s"lag2=${out(2)}")
  }

  test("acf is invariant under repartitioning (exact integer moments)") {
    val rnd = new scala.util.Random(11)
    val rows = for (h <- 0 to 23; i <- 0 until (1 + rnd.nextInt(5)))
      yield (s"t${h % 3}", at(h, i))
    val df = rows.toDF("event_type", "ts")
    val a = TimeSeries.acf(df.repartition(1), "event_type", "ts", "hour", 3)
      .orderBy("event_type", "lag").collect().toSeq
    val b = TimeSeries.acf(df.repartition(7), "event_type", "ts", "hour", 3)
      .orderBy("event_type", "lag").collect().toSeq
    assert(a == b)
  }

  test("seasonalOutliers flags exactly the rows past the scaled threshold") {
    val df = Seq(
      ("e1", "k", 0, 100L), ("e2", "k", 0, 100L),
      ("e3", "k", 0, 100L), ("e4", "k", 0, 700L),
      ("e5", "k", 1, 500L) // singleton cell: dev = 0, never flagged
    ).toDF("event_id", "event_type", "hod", "cents")
    val out = TimeSeries.seasonalOutliers(df, col("event_type"), col("hod"),
        col("cents"), thresholdUnits = 300L)
      .select("event_id", "dev_scaled").as[(String, Long)].collect().toMap
    // cell (k,0): n=4 sum=1000; dev(700)=1800 > 1200; dev(100)=-600 ≤ 1200
    assert(out == Map("e4" -> 1800L))
  }

  test("interpolate: interior gap is linear in time, head/tail clamp, " +
      "all-null key stays null") {
    val df = Seq(
      ("u", 0L, 1L, Some(100L)),
      ("u", 10L, 2L, None),
      ("u", 20L, 3L, None),
      ("u", 30L, 4L, Some(400L)),
      ("h", 0L, 5L, None),          // head null → next value
      ("h", 10L, 6L, Some(50L)),
      ("h", 20L, 7L, None),         // tail null → prev value
      ("z", 0L, 8L, None)           // all-null key → stays null
    ).toDF("k", "t", "id", "v")
    val out = TimeSeries.interpolate(df, col("k"), col("t"), col("v"), col("id"))
      .select("id", "filled").as[(Long, Option[Double])].collect().toMap
    assert(out(1).contains(100.0) && out(4).contains(400.0))
    assert(out(2).contains(200.0), s"t=10 → 100 + 300·(10/30): ${out(2)}")
    assert(out(3).contains(300.0))
    assert(out(5).contains(50.0) && out(7).contains(50.0))
    assert(out(8).isEmpty)
  }

  test("interpolate: duplicate-timestamp sandwich defines 0/0 as the prev value") {
    val df = Seq(
      ("u", 5L, 1L, Some(10L)),
      ("u", 5L, 2L, None),     // same µs as both neighbors
      ("u", 5L, 3L, Some(30L))
    ).toDF("k", "t", "id", "v")
    val out = TimeSeries.interpolate(df, col("k"), col("t"), col("v"), col("id"))
      .select("id", "filled").as[(Long, Option[Double])].collect().toMap
    assert(out(2).contains(10.0), s"NaN must not escape: ${out(2)}")
  }

  test("seasonalOutliers never divides: ties at the threshold stay excluded") {
    // dev = |v·n − Σ| exactly equal to thr·n must NOT flag (strict >)
    val df = Seq(("a", "k", 0, 0L), ("b", "k", 0, 200L))
      .toDF("event_id", "event_type", "hod", "cents")
    // n=2 sum=200: dev(a) = -200, |dev| = 200 = thr·n when thr=100
    val out = TimeSeries.seasonalOutliers(df, col("event_type"), col("hod"),
      col("cents"), thresholdUnits = 100L)
    assert(out.count() == 0)
  }
}

class DriftSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Drift

  private def run(rows: Seq[(String, Long, Boolean)]) =
    Drift.tvDrift(rows.toDF("k", "v", "a"), col("k"), col("v"), col("a"))
      .select("_k", "tot_a", "tot_b", "tv_num", "tv")
      .as[(String, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap

  test("identical distributions score tv = 0; disjoint score tv = 1") {
    val same = (1L to 100L).flatMap(v => Seq(("s", v % 10, true), ("s", v % 10, false)))
    // disjoint: A lives in [0,10), B in [100,110)
    val dis = (1L to 100L).map(v => ("d", v % 10, true)) ++
      (1L to 100L).map(v => ("d", 100 + v % 10, false))
    val out = run(same ++ dis)
    assert(out("s")._5.contains(0.0), s"identical: ${out("s")}")
    assert(out("d")._5.contains(1.0), s"disjoint: ${out("d")}")
  }

  test("a key present on one side only reports NULL, not NaN") {
    val out = run((1L to 20L).map(v => ("only_a", v, true)))
    assert(out("only_a")._5.isEmpty)
    assert(out("only_a")._2 == 20L && out("only_a")._3 == 0L)
  }

  test("tv is invariant under repartitioning and bounded by [0,1]") {
    val rnd = new scala.util.Random(29)
    val rows = (1 to 2000).map { _ =>
      ("k", rnd.nextInt(50).toLong + (if (rnd.nextBoolean()) 5 else 0),
        rnd.nextBoolean())
    }
    val df = rows.toDF("k", "v", "a")
    def one(d: org.apache.spark.sql.DataFrame) =
      Drift.tvDrift(d, col("k"), col("v"), col("a")).collect().toSeq
    val a = one(df.repartition(1))
    assert(a == one(df.repartition(13)))
    val tv = a.head.getAs[Double]("tv")
    assert(tv >= 0.0 && tv <= 1.0)
  }
}

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("cdf thresholds are the Poisson(1) partial sums scaled to 2^60") {
    val t = Resample.cdfThresholds
    assert(t.size == 6)
    assert(t == t.sorted, "thresholds must be monotone")
    // P(X=0)=1/e → first threshold ≈ 0.3678794·2^60
    assert(math.abs(t.head.toDouble / math.pow(2, 60) - math.exp(-1)) < 1e-12)
    // P(X≤5) ≈ 0.999406
    assert(math.abs(t.last.toDouble / math.pow(2, 60) - 0.9994058151824183) < 1e-12)
  }

  test("bootstrap weights are Poisson(1)-shaped and deterministic") {
    val df = (1L to 20000L).toDF("id")
    val w = df.select(Resample.weight(col("id"), rep = 0, salt = "t").as("w"))
      .groupBy("w").count().as[(Int, Long)].collect().toMap
    val n = 20000.0
    // P(0)=P(1)=1/e≈0.368: both within 3σ≈0.01
    assert(math.abs(w(0) / n - 0.3679) < 0.015, s"P(0)=${w(0) / n}")
    assert(math.abs(w(1) / n - 0.3679) < 0.015, s"P(1)=${w(1) / n}")
    assert(w.keys.max <= 6)
    // determinism: identical under different partitioning
    val w2 = df.repartition(13)
      .select(Resample.weight(col("id"), rep = 0, salt = "t").as("w"))
      .groupBy("w").count().as[(Int, Long)].collect().toMap
    assert(w == w2)
  }

  test("bootstrapMeans: replicate means concentrate around the true mean") {
    val df = (1L to 10000L).map(i => (i, i % 100)).toDF("id", "v")
    val out = Resample.bootstrapMeans(df, col("id"), col("v"), reps = 16)
      .select("rep", "n_eff", "mean_rep").as[(Int, Long, Double)].collect()
    assert(out.length == 16)
    assert(out.map(_._1).toSet == (0 until 16).toSet)
    // n_eff ≈ n within 5σ = 5·√10000 = 500
    assert(out.forall(r => math.abs(r._2 - 10000L) < 500), out.mkString(","))
    // true mean = 49.5; bootstrap se ≈ σ/√n ≈ 0.29 → all reps within 5σ
    assert(out.forall(r => math.abs(r._3 - 49.5) < 1.5), out.mkString(","))
  }

  test("BootSums' JVM draw is bit-identical to the Column md5 formulation") {
    // the fixed-buffer aggregate computes md5(salt:id:rep) draws in
    // plain JVM code (no 32-expression codegen span); this pins it to
    // the public Column formula over ids incl. negatives and a
    // string-ish numeric range, for several reps
    val ids = ((-50L to 50L) ++ (1_000_000L to 1_000_100L)).toSeq
    val fromCols = ids.toDF("id")
      .select(col("id"),
        Resample.weight(col("id"), rep = 0, salt = "t").as("w0"),
        Resample.weight(col("id"), rep = 7, salt = "t").as("w7"))
      .as[(Long, Int, Int)].collect().toSeq.sortBy(_._1)
    fromCols.foreach { case (id, w0, w7) =>
      assert(graft.functions.BootSums.jvmWeight("t", id.toString, 0,
        Resample.cdfThresholds) === w0.toLong, s"id=$id rep=0")
      assert(graft.functions.BootSums.jvmWeight("t", id.toString, 7,
        Resample.cdfThresholds) === w7.toLong, s"id=$id rep=7")
    }
  }

  test("bootstrapMeans runs as ONE aggregate pass — no row explosion") {
    val df = (1L to 100L).toDF("id").withColumn("v", col("id"))
    val plan = Resample.bootstrapMeans(df, col("id"), col("v"), reps = 8)
      .queryExecution.executedPlan.toString
    // the only Generate allowed is the post-aggregation stack unpivot of
    // the ONE result row; the data-sized side must see a single agg
    // exchange and no join/replication
    assert(!plan.contains("Join"), s"join leaked into the plan:\n$plan")
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected at most the one agg exchange:\n$plan")
  }

  // ------------------------------------------------------- Theil-Sen

  test("theilSenTrend shrugs off an outlier OLS would chase") {
    // y = 2x on 9 clean points; one wild outlier at x=9. Most pairwise
    // slopes are exactly 2.0, so the median slope is exactly 2.0 —
    // while the OLS slope over the same points is ~6.9.
    val pts = ((0L to 8L).map(x => ("a", x, 2L * x)) :+ (("a", 9L, 500L)))
      .toDF("k", "x", "y")
    val r = TimeSeries.theilSenTrend(pts, "k", "x", "y").head()
    assert(r.getLong(1) == 45L, "C(10,2) pairs")
    assert(r.getDouble(2) == 2.0, s"robust slope, got ${r.getDouble(2)}")
  }

  test("theilSenTrend: even pair count averages the middle two slopes") {
    // 4 points -> 6 pairs; slopes constructed so the sorted middle two
    // are 1.0 and 3.0 -> median 2.0
    // points: (0,0), (1,3), (2,4), (3,3)
    // pairwise slopes: 3, 2, 1, 1, 0, -1 -> sorted: -1,0,1,1,2,3
    // middle two (rn 3,4) = 1,1 -> median 1.0
    val pts = Seq(("a", 0L, 0L), ("a", 1L, 3L), ("a", 2L, 4L), ("a", 3L, 3L))
      .toDF("k", "x", "y")
    val r = TimeSeries.theilSenTrend(pts, "k", "x", "y").head()
    assert(r.getLong(1) == 6L)
    assert(r.getDouble(2) == 1.0, s"got ${r.getDouble(2)}")
  }

  test("theilSenTrend is layout-independent and per-key") {
    val pts = (0 until 200).map { i =>
      (s"k${i % 4}", (i / 4).toLong, ((i / 4) * (i % 4) + i % 3).toLong)
    }.toDF("k", "x", "y")
    val a = TimeSeries.theilSenTrend(pts, "k", "x", "y").collect().toSet
    val b = TimeSeries.theilSenTrend(pts.repartition(7), "k", "x", "y")
      .collect().toSet
    assert(a == b && a.size == 4)
  }
}
