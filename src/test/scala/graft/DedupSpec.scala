package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) =
    spark.range(n).select(
      $"id".as("vec_id"),
      array(lit(1.0f), lit(0.0f)).as("embedding"))

  test("embeddingNearDups refuses inputs over the cartesian cap") {
    val e = intercept[IllegalArgumentException] {
      Dedup.embeddingNearDups(vecs(5), "vec_id", "embedding",
        threshold = 0.9, maxRows = 3)
    }
    assert(e.getMessage.contains("embeddingNearDupsLsh"))
  }

  test("embeddingNearDups under the cap still finds identical vectors") {
    val pairs = Dedup.embeddingNearDups(vecs(3), "vec_id", "embedding",
      threshold = 0.9).count()
    assert(pairs === 3) // all 3 unordered pairs of identical unit vectors
  }
}
