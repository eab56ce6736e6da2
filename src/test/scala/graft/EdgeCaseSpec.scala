package graft

import org.apache.spark.sql.functions._

import graft.operators.{Clustering, Dedup, Packing, RangeJoin, Sampling}

/** Degenerate-input behavior a library consumer will eventually hit:
  * empty tables, fewer rows than requested clusters, empty join sides.
  * Every operator must return an EMPTY (or complete) result with the
  * right schema — never throw, never hang.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val someDocs =
    Seq((1L, "a b c d e f g h i j"), (2L, "k l m n o p q r s t"))
      .toDF("doc_id", "text")
  private lazy val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  private lazy val someVecs = Seq(
    (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")

  test("dedup operators are empty-safe") {
    assert(Dedup.exact(noDocs, "text", "doc_id").count() === 0)
    assert(Dedup.minhashCandidates(noDocs, "text", "doc_id").count() === 0)
    assert(Dedup.incrementalDups(noDocs, someDocs, "text", "doc_id")
      .where(col("is_dup")).count() === 0, "empty base flags nothing")
    val allClean = Dedup.incrementalDups(noDocs, someDocs, "text", "doc_id")
    assert(allClean.count() === 2 &&
      allClean.where(col("dup_of") =!= -1L).count() === 0)
    assert(Dedup.incrementalDups(someDocs, noDocs, "text", "doc_id").count() === 0,
      "empty fresh batch yields an empty report")
  }

  test("packing and chunking are empty-safe") {
    val w = noDocs.select(col("doc_id"), lit(1L).as("w"))
    assert(Packing.globalOffsets(w, "doc_id", "w").count() === 0)
    assert(Packing.packAssignments(w, "doc_id", "w", budget = 512).count() === 0)
    assert(Packing.chunk(noDocs, "doc_id", "text", 10, 5).count() === 0)
  }

  test("k-means degrades gracefully when k exceeds the corpus") {
    val cents = Clustering.seedCentroids(someVecs, "vec_id", "embedding", k = 8)
    assert(cents.count() === 2, "only as many seeds as vectors exist")
    val a = Clustering.assign(someVecs, "vec_id", "embedding", cents)
    assert(a.count() === 2)
    // each vector IS a seed → distance 0 to its own centroid
    assert(a.where(col("dist2") =!= 0L).count() === 0)
    assert(Clustering.assign(noVecs, "vec_id", "embedding", cents).count() === 0)
  }

  test("sampling operators are empty-safe") {
    val empty = Seq.empty[(Long, String)].toDF("id", "src")
    assert(Sampling.temperatureMixture(empty, "id", "src", 0.5).count() === 0)
    assert(Sampling.deterministicSample(empty, "id", 0.5).count() === 0)
    assert(Sampling.capPerGroup(empty, "src", "id", 3).count() === 0)
  }

  test("interval join with an empty side is empty, not an error") {
    val pts = Seq((1L, 5L)).toDF("p_id", "p")
    val noIv = Seq.empty[(Long, Long, Long)].toDF("i_id", "s", "e")
    assert(RangeJoin.intervalJoin(pts, "p", noIv, "s", "e", 10).count() === 0)
    val noPts = Seq.empty[(Long, Long)].toDF("p_id", "p")
    val iv = Seq((1L, 0L, 10L)).toDF("i_id", "s", "e")
    assert(RangeJoin.intervalJoin(noPts, "p", iv, "s", "e", 10).count() === 0)
  }
}
