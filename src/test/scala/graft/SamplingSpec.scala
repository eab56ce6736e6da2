package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  lazy val events = Tables.events(spark, "/root/testdata/sf0.001")

  test("split assignment is exhaustive, disjoint, near the weights, and repartition-stable") {
    val split = Sampling.assignSplit(events.select("event_id"), "event_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum === 1000)
    assert(counts("train") > 740 && counts("train") < 860, counts.toString)
    assert(counts("val") > 60 && counts("val") < 145, counts.toString)
    // identical assignment under a different partition layout
    val re = Sampling.assignSplit(
      events.select("event_id").repartition(17), "event_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.join(re.withColumnRenamed("split", "s2"), "event_id")
      .where($"split" =!= $"s2").count() === 0)
  }

  test("cluster-aware split never separates a near-dup family; doc-level split does") {
    import graft.operators.Dedup
    // 60 families of 3 near-identical docs each (ids i, i+1000, i+2000
    // share a cluster); distinctive vocab keeps families apart
    def txt(seed: Long) = (0 until 12).map(j => s"w${seed}x$j").mkString(" ")
    val docs = (0L until 60L).flatMap(i =>
      Seq((i, txt(i)), (i + 1000L, txt(i)), (i + 2000L, txt(i))))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidates(docs, "text", "doc_id")
    val cc = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
    val clustered = docs.select(col("doc_id"))
      .join(cc, col("doc_id") === cc("node"), "left")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val safe = Sampling.clusterAwareSplit(clustered, "cluster", weights)
    // no cluster spans two splits
    assert(safe.groupBy("cluster")
      .agg(countDistinct(col("split")).as("n")).where(col("n") > 1)
      .count() === 0)
    // the doc-level hash split DOES scatter families — the leakage the
    // cluster-aware operator exists to prevent
    val naive = Sampling.assignSplit(clustered, "doc_id", weights)
    assert(naive.groupBy("cluster")
      .agg(countDistinct(col("split")).as("n")).where(col("n") > 1)
      .count() > 0)
  }

  test("deterministic sample hits ~fraction and is a subset property of the id") {
    val s = Sampling.deterministicSample(events.select("event_id"), "event_id", 0.25)
    val n = s.count()
    assert(n > 190 && n < 310, n.toString)
    // same rows again
    assert(Sampling.deterministicSample(
      events.select("event_id"), "event_id", 0.25).exceptAll(s).count() === 0)
  }

  test("capPerGroup keeps at most cap rows per group, deterministically") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang")
    val capped = Sampling.capPerGroup(docs, "lang", "doc_id", 20)
    val sizes = capped.groupBy("lang").count().as[(String, Long)].collect()
    assert(sizes.forall(_._2 <= 20))
    val again = Sampling.capPerGroup(docs.repartition(13), "lang", "doc_id", 20)
    assert(capped.exceptAll(again).count() === 0)
  }

  test("temperatureMixture up-weights small groups and stays layout-stable") {
    // one big group (900) and one small (100): proportional sampling
    // keeps 50% of each; √n weighting must keep a HIGHER fraction of
    // the small group than of the big one, and never exceed 1
    val df = (Seq.tabulate(900)(i => (i.toLong, "big"))
      ++ Seq.tabulate(100)(i => (i + 1000L, "small"))).toDF("id", "src")
    val kept = Sampling.temperatureMixture(df, "id", "src", budgetFraction = 0.5)
    val frac = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    val fBig = frac("big") / 900.0
    val fSmall = frac("small") / 100.0
    assert(fSmall > fBig + 0.1, s"small=$fSmall big=$fBig")
    // overall budget in the right neighborhood (md5 draw is binomial)
    val total = frac.values.sum
    assert(total > 350 && total < 650, total.toString)
    // membership is a pure row property — identical under repartition
    val again = Sampling.temperatureMixture(
      df.repartition(13), "id", "src", budgetFraction = 0.5)
    assert(kept.exceptAll(again).count() === 0)
    assert(again.exceptAll(kept).count() === 0)
  }

  test("weightedSample: keep rate tracks the weight; saturated and zero weights are exact") {
    import org.apache.spark.sql.functions._
    val df = spark.range(0, 4000).select(col("id"),
      (col("id") % 4).cast("double").as("w")) // weights 0,1,2,3 over scale 2
    val kept = Sampling.weightedSample(df, "id", "w", scaleWeight = 2.0)
      .groupBy("w").count().as[(Double, Long)].collect().toMap
    assert(!kept.contains(0.0))                  // w=0 → never kept
    assert(kept(2.0) === 1000L)                  // w ≥ scale → always kept
    assert(kept(3.0) === 1000L)
    assert(math.abs(kept(1.0) - 500L) < 80)      // w/scale = 0.5 ± noise
    val again = Sampling.weightedSample(
      df.repartition(17), "id", "w", scaleWeight = 2.0)
    assert(Sampling.weightedSample(df, "id", "w", 2.0)
      .exceptAll(again).count() === 0)
    assert(again.exceptAll(
      Sampling.weightedSample(df, "id", "w", 2.0)).count() === 0)
  }

  test("temporalSplit: exact boundaries, embargo strictly between") {
    // 100 rows at seconds 0..99: span = 99s. cut1 = 0 + 99*80 DIV 100
    // = 79.2s -> 79,200,000 us; cut2 = 99*85 DIV 100 = 84.15s.
    val df = (0 until 100).map(i =>
        (i.toLong, new java.sql.Timestamp(i * 1000L)))
      .toDF("id", "ts")
    val out = Sampling.temporalSplit(df, "ts", trainPct = 80, embargoPct = 5)
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("split")))
      .toMap
    assert(out.values.toSet == Set("train", "embargo", "test"))
    assert(out(78L) == "train" && out(79L) == "train")  // 79.0s < 79.2s
    assert(out(80L) == "embargo")
    assert(out(84L) == "embargo")                       // 84.0s < 84.15s
    assert(out(85L) == "test")
    assert((0 until 100).forall(i => out(i.toLong) ==
      (if (i <= 79) "train" else if (i <= 84) "embargo" else "test")))
  }

  test("negativeSample: k cross-label draws per anchor, layout-independent") {
    val df = (0 until 60).map(i => (i.toLong, i % 3)).toDF("id", "lab")
    val out = Sampling.negativeSample(df, "id", "lab", k = 4, salt = "t")
    val rows = out.collect()
    assert(rows.length == 60 * 4)
    rows.foreach { r =>
      assert(r.getInt(r.fieldIndex("anchor_label")) !=
        r.getInt(r.fieldIndex("neg_label")))
    }
    // every anchor draws exactly j = 1..4
    val perAnchor = rows.groupBy(_.getLong(0))
    assert(perAnchor.forall(_._2.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3, 4)))
    val again = Sampling.negativeSample(
      df.repartition(7), "id", "lab", k = 4, salt = "t")
    assert(out.exceptAll(again).count() === 0)
    assert(again.exceptAll(out).count() === 0)
  }

  test("temporalSplit routes NULL timestamps to 'unknown', never 'test'") {
    val df = Seq(
      (1L, Some(new java.sql.Timestamp(0L))),
      (2L, Some(new java.sql.Timestamp(100000L))),
      (3L, Option.empty[java.sql.Timestamp])
    ).toDF("id", "ts")
    val out = Sampling.temporalSplit(df, "ts")
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("split")))
      .toMap
    assert(out(3L) == "unknown")
    assert(out(1L) == "train")
  }

  test("negativeSample fails loud on a single-label input") {
    val df = (0 until 10).map(i => (i.toLong, 1)).toDF("id", "lab")
    val e = intercept[IllegalArgumentException] {
      Sampling.negativeSample(df, "id", "lab", k = 2, salt = "t")
    }
    assert(e.getMessage.contains("2 distinct labels"))
  }
}
