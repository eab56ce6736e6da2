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
}
