package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchSpec extends SparkSpec {
  import spark.implicits._

  // 10k distinct ids, each duplicated a varying number of times —
  // repetition must be invisible to both sketches
  private lazy val corpus = spark.range(0, 10000)
    .select(lit("g").as("grp"), col("id"))
    .union(spark.range(0, 10000).where(col("id") % 3 === 0)
      .select(lit("g").as("grp"), col("id")))
    .union(spark.range(0, 100).select(lit("g").as("grp"), col("id")))

  test("kmv: under-filled sketch reports the exact distinct count") {
    val tiny = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("a", 3L), ("b", 9L))
      .toDF("grp", "v")
    val got = Sketches.kmvDistinct(tiny, Seq("grp"), "v", k = 64)
      .select("grp", "n_kept", "est_distinct")
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(("a", 3L, 3.0), ("b", 1L, 1.0)))
  }

  test("kmv: estimate lands inside the theoretical error band") {
    val est = Sketches.kmvDistinct(corpus, Seq("grp"), "id", k = 256)
      .select("est_distinct").as[Double].head()
    // relative stderr ≈ 1/√(k−2) ≈ 6.3%; allow 4σ
    assert(math.abs(est - 10000.0) / 10000.0 < 0.25, s"est=$est")
  }

  test("hll: register table and estimate are partition-layout independent") {
    val a = Sketches.hllDistinct(corpus.repartition(1), Seq("grp"), "id")
      .collect().toSeq
    val b = Sketches.hllDistinct(corpus.repartition(13), Seq("grp"), "id")
      .collect().toSeq
    assert(a === b)
    val est = a.head.getAs[Double]("est_distinct")
    // raw HLL stderr ≈ 1.04/√128 ≈ 9.2%; allow 4σ
    assert(math.abs(est - 10000.0) / 10000.0 < 0.37, s"est=$est")
  }

  test("histogram quantiles bracket the exact rank on a known distribution") {
    // values 0.1 .. 100.0 uniform: rank ⌈p·n/100⌉ value is p·100/100
    val vals = spark.range(1, 1001)
      .select(lit("g").as("grp"), (col("id") / 10.0).as("v"))
    val got = Sketches.histogramQuantiles(vals, Seq("grp"), "v",
        lo = 0.0, hi = 500.0, bins = 1000, percents = Seq(50, 90, 99))
      .select("p", "bin_lo", "bin_hi", "total")
      .as[(Int, Double, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(got.size === 3 && got.values.forall(_._4 == 1000L))
    for ((p, truth) <- Seq(50 -> 50.0, 90 -> 90.0, 99 -> 99.0)) {
      val (_, loE, hiE, _) = got(p)
      assert(loE <= truth && truth < hiE, s"p$p bracket [$loE,$hiE) misses $truth")
      assert(hiE - loE === 0.5) // one bin wide — error bounded by width
    }
  }

  test("kmv: duplicates collapse — repetition never shifts the sketch") {
    val once = Sketches.kmvDistinct(
      spark.range(0, 500).select(lit("g").as("grp"), col("id")),
      Seq("grp"), "id", k = 64).collect().toSeq
    val tripled = Sketches.kmvDistinct(
      spark.range(0, 1500).select(lit("g").as("grp"), (col("id") % 500).as("id")),
      Seq("grp"), "id", k = 64).collect().toSeq
    assert(once === tripled)
  }

  test("kmv plans as two-phase ObjectHashAggregate — map-side partial sketches") {
    // string match like PlanSpec — the AQE wrapper hides children from
    // TreeNode.collect until execution
    val plan = Sketches.kmvDistinct(corpus, Seq("grp"), "id", k = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_kminvalues"),
      s"expected a map-side partial sketch phase:\n$plan")
    assert(plan.sliding("ObjectHashAggregate".length).count(_ == "ObjectHashAggregate") >= 2,
      s"expected partial+final ObjectHashAggregate:\n$plan")
  }

  test("kmv set algebra: under-filled union sketch is exact set arithmetic") {
    // |A| = 30 (0..29), |B| = 20 (20..39) → |A∪B| = 40, |A∩B| = 10,
    // J = 0.25. k = 64 > 40, so the sketch never truncates and every
    // estimate must be the exact value.
    val a = spark.range(0, 30).select(col("id").as("v"))
    val b = spark.range(20, 40).select(col("id").as("v"))
    val row = Sketches.kmvSetAlgebra(a.toDF(), b.toDF(), "v", k = 64)
      .select("k_used", "n_common", "union_est", "jaccard_est", "inter_est")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(row === ((40L, 10L, 40.0, 0.25, 10.0)))
  }

  test("kmv set algebra: saturated estimate lands near truth") {
    val a = spark.range(0, 3000).select(col("id").as("v"))
    val b = spark.range(1500, 4500).select(col("id").as("v"))
    // truth: union 4500, inter 1500, J = 1/3
    val row = Sketches.kmvSetAlgebra(a.toDF(), b.toDF(), "v", k = 256)
      .select("union_est", "jaccard_est")
      .as[(Double, Double)].head()
    assert(math.abs(row._1 - 4500) < 900, s"union_est=${row._1}")
    assert(math.abs(row._2 - 1.0 / 3) < 0.12, s"jaccard_est=${row._2}")
  }

  // Zipf-ish stream: item i appears ~N/i times — a heavy head over a
  // long tail, far more distinct items than sketch capacity.
  private lazy val skewed = {
    val rows = (1 to 400).flatMap(i => Seq.fill(2000 / i)(s"item$i"))
    rows.toDF("item").withColumn("grp", lit("g"))
  }

  test("space-saving: exact regime (capacity ≥ distinct) equals GROUP BY counts") {
    val exact = skewed.groupBy("item").count()
      .as[(String, Long)].collect().toMap
    val hh = Sketches.heavyHitters(skewed, Seq("grp"), "item",
      minCount = 1L, capacity = 1000)
      .select("item", "est").as[(String, Long)].collect().toMap
    assert(hh == exact)
  }

  test("space-saving: approximate regime keeps every true heavy hitter with bounded overshoot") {
    val n = skewed.count()
    val m = 64
    val bound = n / m // εN with ε = 1/capacity
    val truth = skewed.groupBy("item").count()
      .as[(String, Long)].collect().toMap
    // repartition forces real partial-sketch merges across 8 tasks
    val hh = Sketches.heavyHitters(skewed.repartition(8), Seq("grp"), "item",
      minCount = 1L, capacity = m)
      .select("item", "est").as[(String, Long)].collect().toMap
    val mustKeep = truth.filter(_._2 > 2 * bound).keySet
    assert(mustKeep.subsetOf(hh.keySet),
      s"missing true heavy hitters: ${mustKeep -- hh.keySet}")
    for ((item, est) <- hh if truth.contains(item) && truth(item) > 2 * bound)
      assert(est >= truth(item) && est <= truth(item) + 2 * bound,
        s"$item est=$est true=${truth(item)} bound=$bound")
  }

  test("space-saving survives items larger than 64KB (writeUTF would throw)") {
    val big = "x" * 70000
    val df = (Seq.fill(5)(big) ++ Seq("small", "small")).toDF("item")
      .withColumn("grp", lit("g"))
      .repartition(4) // force partial-buffer serialization across tasks
    val hh = Sketches.heavyHitters(df, Seq("grp"), "item",
      minCount = 1L, capacity = 8)
      .select("item", "est").as[(String, Long)].collect().toMap
    assert(hh(big) === 5L && hh("small") === 2L)
  }

  test("space-saving plans as two-phase ObjectHashAggregate — bounded partials on the wire") {
    val plan = Sketches.heavyHitters(skewed, Seq("grp"), "item",
      minCount = 1L, capacity = 64)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_spacesaving"),
      s"expected a map-side partial sketch phase:\n$plan")
  }

  test("count-min: width-1 grid collapses every estimate to the group total") {
    val df = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c")
    val got = Sketches.countMinEstimates(
      df.map(("g", _)).toDF("grp", "item"), Seq("grp"), "item",
      depth = 2, width = 1, minTrue = 1L)
      .select("item", "true_cnt", "cms_est")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    // every item shares the single bucket, so est = total rows = 10
    assert(got.toSeq === Seq(("a", 5L, 10L), ("b", 3L, 10L), ("c", 2L, 10L)))
  }

  test("count-min: estimates dominate true counts and are layout-invariant") {
    val rows = (0 until 2000).map(i => ("g", s"u${i % 97}")).toDF("grp", "item")
    val got = Sketches.countMinEstimates(
      rows, Seq("grp"), "item", depth = 4, width = 64, minTrue = 1L)
    val pairs = got.select("true_cnt", "cms_est").as[(Long, Long)].collect()
    assert(pairs.length === 97)
    assert(pairs.forall { case (t, e) => e >= t }, "CMS must never undercount")
    val a = Sketches.countMinEstimates(rows.repartition(1), Seq("grp"),
      "item", 4, 64, 1L).collect().toSeq.sortBy(_.getAs[String]("item"))
    val b = Sketches.countMinEstimates(rows.repartition(13), Seq("grp"),
      "item", 4, 64, 1L).collect().toSeq.sortBy(_.getAs[String]("item"))
    assert(a === b)
  }

  test("join skew probe: only both-side keys survive, ordered by fanout, topN cut") {
    // a: h×5, x×3, w×2 | b: h×4, x×4, y×3 → shared keys h (5·4=20) and
    // x (3·4=12); w/y are one-sided and must not appear. topN=1 keeps
    // only the fan-out bomb.
    val a = (Seq.fill(5)("h") ++ Seq.fill(3)("x") ++ Seq.fill(2)("w"))
      .toDF("k")
    val b = (Seq.fill(4)("h") ++ Seq.fill(4)("x") ++ Seq.fill(3)("y"))
      .toDF("k")
    val all = Sketches.joinSkewProbe(a, "k", b, "k",
        minCount = 1L, capacity = 64, topN = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(all === Seq(("h", 5L, 4L, 20L), ("x", 3L, 4L, 12L)))
    val top1 = Sketches.joinSkewProbe(a, "k", b, "k", 1L, 64, topN = 1)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(top1 === Seq(("h", 5L, 4L, 20L)))
  }

  test("join skew probe: fanout ties break by key string order") {
    val a = Seq("b", "b", "a", "a", "c").toDF("k")
    val b = Seq("a", "b", "c", "c").toDF("k")
    // fanouts: a=2, b=2, c=2 → key asc order a, b, c
    val got = Sketches.joinSkewProbe(a, "k", b, "k", 1L, 64, topN = 10)
      .as[(String, Long, Long, Long)].collect().toSeq.map(_._1)
    assert(got === Seq("a", "b", "c"))
  }

  // ---------------------------------------------------- decayed top-k

  test("decayedTopK: recency beats raw volume at the dyadic decay") {
    import java.sql.Timestamp
    def t(day: Int) = Timestamp.valueOf(f"2026-01-$day%02d 12:00:00")
    // "old" fires 40 times 10 days before the anchor (weight 1e6>>10 =
    // 976 each -> 39,040); "fresh" fires twice on the anchor day
    // (2,000,000). Raw count says old; decay says fresh.
    val rows = Seq.fill(40)(("old", t(1))) ++ Seq.fill(2)(("fresh", t(11)))
    val df = rows.toDF("k", "ts")
    val out = Sketches.decayedTopK(df, col("k"), col("ts"), k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out(0) == (("fresh", 2000000L, 2L)), s"${out.toSeq}")
    assert(out(1) == (("old", 40L * (1000000L >> 10), 40L)))
  }

  test("decayedTopK: ancient events round to exactly zero weight") {
    import java.sql.Timestamp
    val rows = Seq(("a", Timestamp.valueOf("2020-01-01 00:00:00")),
      ("a", Timestamp.valueOf("2026-01-01 00:00:00")))
    val out = Sketches.decayedTopK(rows.toDF("k", "ts"), col("k"),
      col("ts"), 5).head()
    assert(out.getLong(1) == 1000000L, "only the anchor-day event weighs")
    assert(out.getLong(2) == 2L, "raw count still sees both")
  }

  test("KLL: exact under fill — equals brute-force rank select, any layout") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 3000).map(i =>
      (if (i % 2 == 0) "a" else "b", rnd.nextInt(100000) / 100.0))
    val df = rows.toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.kllQuantiles(d, Seq("g"), "v", k = 16384, Seq(1, 50, 90, 99))
        .collect().map(r => (r.getString(0), r.getInt(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
    val out = run(df)
    // brute force: r-th smallest cent value at r = ceil(total*p/100)
    val byG = rows.groupBy(_._1).view.mapValues(
      _.map(t => math.round(t._2 * 100)).sorted).toMap
    for ((g, vs) <- byG; p <- Seq(1, 50, 90, 99)) {
      val r = (vs.length.toLong * p + 99) / 100
      assert(out((g, p)) === ((vs(r.toInt - 1), vs.length.toLong)),
        s"exact rank select mismatch at ($g, p$p)")
    }
    // merge-order / partition-layout independence in the exact regime
    assert(run(df.repartition(17)) === out)
    assert(run(df.repartition(1)) === out)
  }

  test("KLL past fill: rank error stays inside the compactor bound") {
    // 200k uniform values through a k=512 sketch: deep compaction.
    // The MRL/KLL compactor analysis bounds rank error by
    // O(log²(n/k)/k)·n; assert the much looser 2% practical envelope —
    // a broken compactor (dropping mass, mis-weighting promotions)
    // misses it by an order of magnitude.
    val n = 200000
    val rows = (0 until n).map(i => ("a", ((i * 2654435761L) % n) / 100.0))
    val out = Sketches.kllQuantiles(rows.toDF("g", "v"), Seq("g"), "v",
        k = 512, Seq(10, 50, 90))
      .collect().map(r => r.getInt(1) -> r.getLong(2)).toMap
    val sorted = rows.map(t => math.round(t._2 * 100)).sorted
    for (p <- Seq(10, 50, 90)) {
      val want = sorted(((n.toLong * p + 99) / 100).toInt - 1)
      val gotRank = sorted.count(_ <= out(p))
      val wantRank = sorted.count(_ <= want)
      assert(math.abs(gotRank - wantRank) <= n * 0.02,
        s"p$p: rank drift ${math.abs(gotRank - wantRank)} > 2% of $n")
    }
  }

  test("KLL summary weight mass tracks n and n is exact") {
    import graft.functions.KllSketch
    val df = (1 to 50000).map(i => ("a", i / 100.0)).toDF("g", "v")
    val s = df.groupBy("g").agg(KllSketch.kll_sketch(
      round(col("v") * 100).cast("long"), 256).as("s"))
      .select(col("s.n"), expr("aggregate(s.items, 0L, (acc, x) -> acc + x.w)"))
      .head()
    assert(s.getLong(0) === 50000L, "true count is exact")
    // canonical pair compaction (odd levels retain their unpaired
    // item) conserves summary mass EXACTLY — weight == n always
    assert(s.getLong(1) === 50000L,
      s"summary weight ${s.getLong(1)} must equal n exactly")
  }
}
