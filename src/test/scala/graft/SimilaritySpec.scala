package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Multi-probe LSH: recall dominance over the single-table probe.
  * Multi-probe candidates are a SUPERSET of single-probe candidates
  * (the own bucket is always probed), and ranking is a deterministic
  * total order, so per-query hits can only improve — asserted here,
  * plus a strict aggregate improvement on the fixed test corpus.
  */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("multi-probe recall@5 dominates single-probe per query and strictly overall") {
    val recall = graft.queries.VecQueries.similarityRecall(spark, sf)
      .select("method", "query_id", "hits")
      .as[(String, Long, Long)].collect()
    val single = recall.collect { case ("lsh", q, h) => q -> h }.toMap
    val multi = recall.collect { case ("lsh_mp", q, h) => q -> h }.toMap
    assert(single.keySet === multi.keySet)
    single.foreach { case (q, h) =>
      assert(multi(q) >= h, s"multi-probe lost a hit on query $q")
    }
    assert(multi.values.sum > single.values.sum,
      "flipping one bit must recover at least one straddling neighbor on this corpus")
  }

  test("multi-probe results match single-probe when restricted to the own bucket") {
    val c = Tables.distributed(spark, sf, "embeddings").select("vec_id", "embedding")
    val qs = c.where(col("vec_id") < 10)
    val mp = Similarity.lshMultiProbeTopK(c, qs, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "cosine")
    val sp = Similarity.lshTopK(c, qs, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "cosine")
    // every single-probe neighbor with a cosine >= the query's 5th-best
    // multi-probe cosine must appear in the multi-probe result
    val fifth = mp.groupBy("query_id").agg(min("cosine").as("c5"))
    val missing = sp.join(fifth, "query_id")
      .where(col("cosine") > col("c5"))
      .join(mp, Seq("query_id", "neighbor_id"), "left_anti")
    assert(missing.count() === 0)
  }

  test("rrf: hand-computed fusion of two rankings, ties broken by neighbor_id") {
    import spark.implicits._
    // a: n1@1, n2@2 · b: n2@1, n3@2 (c = 60)
    //   n2 = 1/62 + 1/61, n1 = 1/61, n3 = 1/62 → order n2, n1, n3
    val a = Seq((1L, 10L, 1), (1L, 20L, 2)).toDF("query_id", "neighbor_id", "rank")
    val b = Seq((1L, 20L, 1), (1L, 30L, 2)).toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.rrfFuse(a, b, k = 5)
      .select("neighbor_id", "rrf", "fused_rank")
      .as[(Long, Double, Long)].collect().sortBy(_._3)
    assert(out.map(r => (r._1, r._3)).toSeq === Seq((20L, 1L), (10L, 2L), (30L, 3L)))
    assert(out(0)._2 === 1.0 / 62 + 1.0 / 61)
    assert(out(1)._2 === 1.0 / 61 && out(2)._2 === 1.0 / 62)
    // an exact rrf tie (same ranks swapped) resolves by neighbor_id asc
    val t1 = Seq((1L, 7L, 1), (1L, 5L, 2)).toDF("query_id", "neighbor_id", "rank")
    val t2 = Seq((1L, 5L, 1), (1L, 7L, 2)).toDF("query_id", "neighbor_id", "rank")
    val tied = Similarity.rrfFuse(t1, t2, k = 5)
      .select("neighbor_id", "fused_rank").as[(Long, Long)].collect().sortBy(_._2)
    assert(tied.toSeq === Seq((5L, 1L), (7L, 2L)))
  }

  test("trained IVF is the shippable default: recall@5 >= 0.8, beats random centroids") {
    val recall = graft.queries.VecQueries.similarityRecall(spark, sf)
      .select("method", "query_id", "hits")
      .as[(String, Long, Long)].collect()
    def mean(m: String): Double = {
      val hs = recall.collect { case (`m`, _, h) => h }
      hs.sum.toDouble / (5 * hs.length)
    }
    val trained = mean("ivf_train")
    assert(trained >= 0.8,
      f"ivf_train (16 cells, 2 Lloyd rounds, 12 probes) must clear the " +
        f"shippable-recall gate; got $trained%.2f")
    assert(trained > mean("ivf_mp8"),
      "the trained quantizer at 12 probes must beat random centroids at 8")
  }

  test("trained IVF neighbors are true cosine neighbors (subset of exact ranking)") {
    val c = Tables.distributed(spark, sf, "embeddings").select("vec_id", "embedding")
    val qs = c.where(col("vec_id") < 10)
    val trained = Similarity.ivfTrainedTopK(c, qs, "vec_id", "embedding",
      k = 5, nCentroids = 16, probes = 12, trainRounds = 2)
    // every reported pair must carry the exact cosine the brute-force
    // path computes for that pair (approximate RETRIEVAL, exact SCORING)
    val brute = Similarity.bruteForceTopK(c, qs, "vec_id", "embedding", k = 200)
      .select(col("query_id"), col("neighbor_id"), col("cosine").as("bc"))
    val joined = trained.join(brute, Seq("query_id", "neighbor_id"), "left")
    assert(joined.where(col("bc").isNull || col("bc") =!= col("cosine")).count() === 0)
    // ranks within a query are dense and 1-based
    val ranks = trained.groupBy("query_id")
      .agg(min("rank").as("lo"), max("rank").as("hi"), count(lit(1)).as("n"))
    assert(ranks.where(col("lo") =!= 1 || col("hi") =!= col("n")).count() === 0)
  }

  test("hardNegatives: cross-label only, even when a same-label twin is nearer") {
    // anchor 0 (label A) points along x. Its exact twin 1 shares the
    // label, so despite cosine 1.0 it must NOT appear; the nearest
    // label-B vectors are 2 (cos ~0.95) then 3 (orthogonal-ish).
    val vecs = Seq(
      (0L, Array(1f, 0f), "A"),
      (1L, Array(1f, 0f), "A"),       // same-label twin — excluded
      (2L, Array(0.9f, 0.3f), "B"),
      (3L, Array(0f, 1f), "B"),
      (4L, Array(-1f, 0f), "C")
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(
        vecs, vecs.where(col("vec_id") === 0L),
        "vec_id", "embedding", "label", k = 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(out.head.fieldIndex("neighbor_id"))).toSeq ==
      Seq(2L, 3L, 4L))
    assert(out.forall(r => r.getString(r.fieldIndex("neg_label")) != "A"))
    assert(out.forall(r => r.getString(r.fieldIndex("anchor_label")) == "A"))
    assert(out.map(_.getInt(out.head.fieldIndex("rank"))).toSeq == Seq(1, 2, 3))
  }

  test("pqTopK: an exact duplicate of the query achieves the minimal ADC " +
      "distance and ranks first") {
    val rnd = new scala.util.Random(31)
    def vec() = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val base = (0L until 40L).map(i => (i, vec()))
    // vector 11 duplicates query 1: same subvectors → same codes → its
    // ADC distance is Σ_s min_c d(q_s, c_s), the smallest any code
    // assignment can reach
    val rows = base.map { case (i, v) => if (i == 11L) (i, base(1)._2) else (i, v) }
    val df = rows.toDF("vec_id", "embedding")
    val out = Similarity.pqTopK(df, df.where(col("vec_id") === 1L),
        "vec_id", "embedding", k = 3)
      .orderBy("rank")
      .select("neighbor_id", "rank", "adc_dist")
      .as[(Long, Int, Long)].collect()
    assert(out.head._1 == 11L, s"duplicate must rank first: ${out.toSeq}")
    assert(out.head._3 <= out.last._3, "ranking must be ascending in ADC distance")
  }

  test("pqTopK is invariant under repartitioning") {
    val rnd = new scala.util.Random(32)
    val df = (0L until 60L).map(i => (i, Array.fill(64)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.pqTopK(d, d.where(col("vec_id") < 3L),
        "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank").collect().toSeq
    assert(run(df.repartition(1)) == run(df.repartition(9)))
  }

  test("trained pqTopK: determinism under repartitioning and the " +
      "duplicate-query ADC floor survive Lloyd training") {
    val rnd = new scala.util.Random(47)
    def vec() = Array.fill(64)(rnd.nextFloat() * 2f - 1f)
    val base = (0L until 60L).map(i => (i, vec()))
    val rows = base.map { case (i, v) => if (i == 13L) (i, base(2)._2) else (i, v) }
    val df = rows.toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.pqTopK(d, d.where(col("vec_id") === 2L),
        "vec_id", "embedding", k = 3, subspaces = 16, codebookSize = 32,
        trainRounds = 3)
        .orderBy("rank")
        .select("neighbor_id", "rank", "adc_dist")
        .as[(Long, Int, Long)].collect().toSeq
    val out = run(df.repartition(7))
    // trained codebooks keep the ADC-floor property: the duplicate's
    // codes equal the query's own argmin codes, so its ADC distance is
    // the per-subspace minimum sum — nothing ranks above it
    assert(out.head._1 == 13L, s"duplicate must rank first: $out")
    // repartitioning must not change training: the means are exact
    // integer sums and the requantization is order-free
    assert(run(df.repartition(1)) == out)
  }

  test("randomProjection: basis vectors land on the exact planeSign " +
      "matrix; projection is a linear map") {
    def basis(i: Int) = Array.tabulate(64)(k => if (k == i) 1f else 0f)
    val df = Seq((0L, basis(0)), (5L, basis(5)), (63L, basis(63)),
      (100L, Array.tabulate(64)(k => if (k == 0 || k == 5) 1f else 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, "vec_id", "embedding", outDims = 4)
      .select("vec_id", "proj").as[(Long, Seq[Long])].collect().toMap
    for (i <- Seq(0, 5, 63); j <- 0 until 4) {
      assert(out(i.toLong)(j) == Similarity.planeSign(j, i) * 10000L,
        s"basis $i plane $j")
    }
    // linearity: proj(e0 + e5) = proj(e0) + proj(e5), exactly
    (0 until 4).foreach(j =>
      assert(out(100L)(j) == out(0L)(j) + out(5L)(j)))
  }

  test("pqTopK rejects non-divisible subspace layouts") {
    val df = Seq((1L, Array.fill(64)(0f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.pqTopK(df, df, "vec_id", "embedding", k = 1, subspaces = 7)
    }
  }

  test("ivfPqTopK with probes = nCells equals the flat PQ scan exactly") {
    // routing only restricts WHICH codes are scored — never the scores:
    // probing every cell must reproduce pqTopK row-for-row (same
    // neighbors, ranks, and ADC distances)
    val rnd = new scala.util.Random(107)
    val df = (0L until 80L).map(i => (i, Array.fill(64)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val qs = df.where(col("vec_id") < 3L)
    val flat = Similarity.pqTopK(df, qs, "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val routed = Similarity.ivfPqTopK(df, qs, "vec_id", "embedding", k = 5,
        nCentroids = 8, probes = 8, trainRounds = 2)
      .orderBy("query_id", "rank").collect().toSeq
    assert(routed == flat)
  }

  test("ivfPqTopK partial probes: ADC distances agree with the flat scan on overlap") {
    val rnd = new scala.util.Random(211)
    val df = (0L until 80L).map(i => (i, Array.fill(64)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val qs = df.where(col("vec_id") < 3L)
    val flat = Similarity.pqTopK(df, qs, "vec_id", "embedding", k = 80)
      .select("query_id", "neighbor_id", "adc_dist")
    val routed = Similarity.ivfPqTopK(df, qs, "vec_id", "embedding", k = 5,
      nCentroids = 8, probes = 3, trainRounds = 2)
    // every routed pair exists in the exhaustive flat ranking with the
    // identical ADC distance (cell routing must not perturb scoring)
    val mismatched = routed.alias("r")
      .join(flat.alias("f"), Seq("query_id", "neighbor_id"), "left")
      .where(col("f.adc_dist").isNull || col("f.adc_dist") =!= col("r.adc_dist"))
    assert(mismatched.count() === 0)
  }
}
