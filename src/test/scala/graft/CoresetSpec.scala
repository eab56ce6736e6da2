package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Similarity}

/** k-center greedy + MMR diversification, verified against independent
  * plain-Scala reimplementations of the same public formulas.
  */
class CoresetSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def quant(v: Array[Float]): Array[Long] =
    v.map(x => math.round(x.toDouble * 10000))

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  test("kCenterCoreset matches a sequential reference greedy exactly") {
    val rnd = new scala.util.Random(17)
    val vecs = (0L until 25L).map(i => i -> Array.fill(64)(rnd.nextFloat())).toMap
    val df = vecs.toSeq.toDF("vec_id", "embedding")
    val k = 5

    // independent driver-side greedy on the identical integer domain
    val q = vecs.map { case (i, v) => i -> quant(v) }
    val seed = vecs.keys.toSeq.sortBy(i => (md5hex(s"kcenter:$i"), i)).head
    var centers = Vector((1, seed, 0L))
    var mind = q.map { case (i, v) => i -> d2(v, q(seed)) }
    for (t <- 2 to k) {
      val (cid, dist) = mind.toSeq.sortBy { case (i, d) => (-d, i) }.head
      centers :+= ((t, cid, dist))
      mind = mind.map { case (i, d) => i -> math.min(d, d2(q(i), q(cid))) }
    }

    val got = Clustering.kCenterCoreset(df, "vec_id", "embedding", k)
      .select("center_rank", "center_id", "dist_chosen")
      .as[(Int, Long, Long)].collect().sortBy(_._1).toVector
    assert(got == centers, s"got=$got want=$centers")
    // radius sequence is non-increasing after the seed
    val radii = got.drop(1).map(_._3)
    assert(radii == radii.sortBy(-_))
  }

  test("kCenterCoreset is invariant under repartitioning") {
    val rnd = new scala.util.Random(18)
    val df = (0L until 30L).map(i => (i, Array.fill(64)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Clustering.kCenterCoreset(d, "vec_id", "embedding", 4)
        .orderBy("center_rank").collect().toSeq
    assert(run(df.repartition(1)) == run(df.repartition(11)))
  }

  test("kCenterCoreset stops early when k exceeds the distinct-vector " +
      "count (no duplicate centers)") {
    // 3 distinct vectors, one duplicated: greedy must emit exactly 3
    // rows for k = 5 — once every point is covered at radius 0, more
    // picks would only duplicate existing centers (the round-10
    // early-stop contract; regression-pinned on the engine side, not
    // just via the oracle)
    val df = Seq(
      (0L, Array.fill(64)(0f)),
      (1L, Array.fill(64)(1f)),
      (2L, Array.fill(64)(0.5f)),
      (3L, Array.fill(64)(0.5f))).toDF("vec_id", "embedding")
    val got = Clustering.kCenterCoreset(df, "vec_id", "embedding", k = 5)
      .select("center_rank", "center_id", "dist_chosen")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 3, s"expected 3 centers, got ${got.toSeq}")
    assert(got.map(_._1).toSeq == Seq(1, 2, 3))
    assert(got.last._3 > 0L,
      "the last emitted pick must still cover new ground")
    // the duplicate pair contributes exactly one center
    assert(got.map(_._2).toSet.intersect(Set(2L, 3L)).size == 1)
  }

  test("mmrDiversify skips the near-duplicate in favor of the diverse candidate") {
    // q along e1; A and B equally relevant mirror images; A2 ~ duplicate
    // of A. Top-2 by pure relevance would take A then A2; MMR must take
    // A (tie → smaller id) then B.
    def vec(x: Double, y: Double) = {
      val a = Array.fill(64)(0f); a(0) = x.toFloat; a(1) = y.toFloat; a
    }
    val df = Seq(
      (0L, vec(1.0, 0.0)),     // query
      (1L, vec(0.95, 0.31)),   // A
      (2L, vec(0.95, 0.312)),  // A2 — near-dup of A
      (3L, vec(0.95, -0.31))   // B — same relevance as A, far from it
    ).toDF("vec_id", "embedding")
    val out = Similarity.mmrDiversify(df, df.where(col("vec_id") === 0L),
        "vec_id", "embedding", k = 2, poolSize = 3, lambda10 = 7)
      .orderBy("mmr_rank")
      .select("neighbor_id", "mmr_rank", "penalty")
      .as[(Long, Int, Long)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 3L), out.mkString(","))
    assert(out.head._3 == 0L, "first pick carries zero penalty")
    assert(out.last._3 > 0L, "second pick records its max-sim penalty")
  }

  test("mmrDiversify with lambda10=10 degenerates to pure relevance ranking") {
    val rnd = new scala.util.Random(19)
    val df = (0L until 20L).map(i => (i, Array.fill(64)(rnd.nextFloat())))
      .toDF("vec_id", "embedding")
    val mmr = Similarity.mmrDiversify(df, df.where(col("vec_id") === 0L),
        "vec_id", "embedding", k = 4, poolSize = 10, lambda10 = 10)
      .orderBy("mmr_rank").select("neighbor_id").as[Long].collect().toSeq
    val brute = Similarity.bruteForceTopK(df, df.where(col("vec_id") === 0L),
        "vec_id", "embedding", k = 4)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    // same floor'd-integer relevance order as exact cosine order on this
    // corpus; penalties are multiplied by zero so diversity can't move picks
    assert(mmr == brute, s"mmr=$mmr brute=$brute")
  }

  test("streaming seasonal twin emits exactly the batch anomalies") {
    val sf = "/root/testdata/sf0.001"
    val batch = graft.queries.FeatureQueries.seasonalAnomaly(spark, sf)
      .collect().map(_.toSeq).toSet
    val stream = graft.queries.FeatureQueries.streamingSeasonal(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(stream == batch)
    assert(batch.nonEmpty)
  }
}
