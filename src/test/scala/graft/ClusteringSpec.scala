package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // 30 deterministic 4-dim vectors in three well-separated blobs
  private lazy val vecs = Seq.tabulate(30) { i =>
    val blob = i % 3
    val base = Array(blob * 10.0f, blob * -5.0f, 3.0f - blob, 0.5f * blob)
    (i.toLong, base.zipWithIndex.map { case (x, j) =>
      x + ((i * 7 + j * 3) % 5) * 0.01f
    })
  }.toDF("vec_id", "embedding")

  test("assignment matches the brute-force nearest seed, ties to smaller cluster") {
    val cents = Clustering.seedCentroids(vecs, "vec_id", "embedding", 3)
    val got = Clustering.assign(vecs, "vec_id", "embedding", cents)
      .select("vec_id", "cluster", "dist2").as[(Long, Int, Long)]
      .collect().sortBy(_._1)

    // reference: quantize in plain Scala, exhaustive argmin
    val qs = vecs.select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap.view.mapValues(_.map(x => math.round(x * 10000.0).toLong))
    val cs = cents.select("cluster", "cq").as[(Int, Array[Long])].collect()
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    got.foreach { case (id, cl, dist2) =>
      val best = cs.map { case (cid, cq) => (d2(qs(id), cq), cid) }.min
      assert((dist2, cl) === best, s"vec $id")
    }
  }

  test("oversized corpus embedding fails loudly instead of corrupting the argmin") {
    val cents = Clustering.seedCentroids(vecs, "vec_id", "embedding", 3)
    // ‖q‖² after 1e4 quantization: (3e6·1e4)² per dim ≫ 2⁴¹
    val huge = Seq((99L, Array(3.0e6f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Clustering.assign(huge, "vec_id", "embedding", cents).collect()
    }
    assert(ex.getMessage.contains("corpus squared norm"))
  }

  test("the Lloyd step computes exact per-cluster quantized means") {
    val cents = Clustering.seedCentroids(vecs, "vec_id", "embedding", 3)
    val a = Clustering.assign(vecs, "vec_id", "embedding", cents)
    val upd = Clustering.lloydUpdate(a)
    val nClusters = a.select("cluster").distinct().count()
    assert(upd.count() === nClusters * 4) // (cluster, dim) rows
    // each dimension sees every vector exactly once
    val perDim = upd.groupBy("dim").agg(sum("n_vecs").as("s"))
      .select("s").as[Long].collect()
    assert(perDim.length === 4 && perDim.forall(_ === 30L))

    // exact means: recompute from the assignment + quantized vectors
    val assigned = a.select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val qs = vecs.select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap.view.mapValues(_.map(x => math.round(x * 10000.0).toLong))
    val got = upd.select("cluster", "dim", "n_vecs", "centroid")
      .as[(Int, Int, Long, Double)].collect()
    got.foreach { case (cl, dim, n, c) =>
      val members = qs.filter { case (id, _) => assigned(id) == cl }.toSeq
      assert(n === members.size.toLong, s"cluster $cl size")
      // mirror the engine's arithmetic: double divide, then round(.,6)
      val mean = members.map(_._2(dim)).sum.toDouble / (n * 10000).toDouble
      assert(c === BigDecimal.valueOf(mean)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"centroid ($cl, $dim)")
    }
  }

  test("Lloyd iterations never increase total distortion and stay layout-stable") {
    def totalDist(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("dist2")).as[Long].collect().head
    val one = Clustering.lloydIterate(vecs, "vec_id", "embedding",
      k = 3, iterations = 1)
    val three = Clustering.lloydIterate(vecs, "vec_id", "embedding",
      k = 3, iterations = 3)
    assert(totalDist(three) <= totalDist(one),
      "k-means distortion must be non-increasing across Lloyd rounds")
    // reproducible under a different partition layout
    val again = Clustering.lloydIterate(vecs.repartition(7), "vec_id",
      "embedding", k = 3, iterations = 3)
    assert(three.select("vec_id", "cluster", "dist2")
      .exceptAll(again.select("vec_id", "cluster", "dist2")).count() === 0)
  }

  test("kmeans_sse: within-cluster SSE is non-increasing across the pinned rounds") {
    val sse = graft.queries.ClusterQueries.kmeansSse(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sse.keySet === Set(1, 2))
    assert(sse(1)._1 === sse(2)._1, "every vector stays assigned in both rounds")
    assert(sse(2)._2 <= sse(1)._2,
      s"Lloyd round 2 must not increase SSE: ${sse(2)._2} vs ${sse(1)._2}")
    assert(sse(1)._2 > 0, "seed assignment has positive distortion on real data")
  }

  test("assignment plan broadcasts the centroids — no corpus-side sort-merge join") {
    val cents = Clustering.seedCentroids(vecs, "vec_id", "embedding", 3)
    val plan = Clustering.assign(vecs, "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"centroids must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle to join:\n$plan")
  }
}
