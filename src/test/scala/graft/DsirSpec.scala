package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance selection: target-vocabulary documents score
  * positive, off-distribution documents negative, and the integer-bit
  * LLR is partitioning-invariant.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target slice (ids 1-3) shares vocabulary with raw docs 4-5;
  // docs 6-7 are written in a disjoint vocabulary
  private def docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the rug"),
    (3L, "a cat and a dog sat"),
    (4L, "the cat and the dog"),
    (5L, "the dog sat on the mat"),
    (6L, "zorp qix flub wubble snark"),
    (7L, "flub snark zorp wubble qix zorp")
  ).toDF("doc_id", "text")

  test("target-like docs select, off-distribution docs do not") {
    val out = Dsir.dsirSelect(docs, "doc_id", "text", col("doc_id") <= 3)
      .select("doc_id", "selected").as[(Long, Boolean)].collect().toMap
    for (id <- 1L to 5L)
      assert(out(id), s"doc $id shares target vocabulary; must select")
    for (id <- 6L to 7L)
      assert(!out(id), s"doc $id is off-distribution; must not select")
  }

  test("scores are exact integers, invariant under repartitioning") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Dsir.dsirSelect(d, "doc_id", "text", col("doc_id") <= 3)
        .orderBy("doc_id").collect().toSeq
    assert(run(docs.repartition(1)) == run(docs.repartition(7)))
  }

  test("n_grams counts words plus bigrams") {
    val out = Dsir.dsirSelect(docs, "doc_id", "text", col("doc_id") <= 3)
      .select("doc_id", "n_grams").as[(Long, Long)].collect().toMap
    // "the cat sat on the mat": 6 words + 5 bigrams
    assert(out(1L) === 11L)
    // "zorp qix flub wubble snark": 5 + 4
    assert(out(6L) === 9L)
  }

  test("per-gram scores rank target-vocabulary docs above off-distribution docs") {
    val s = Dsir.dsirSelect(docs, "doc_id", "text", col("doc_id") <= 3)
      .select("doc_id", "n_grams", "dsir_score")
      .as[(Long, Long, Long)].collect()
      .map { case (id, n, sc) => id -> sc.toDouble / n }.toMap
    for (a <- 1L to 5L; b <- 6L to 7L)
      assert(s(a) > s(b), s"doc $a (${s(a)}) vs doc $b (${s(b)})")
  }

  test("an empty target slice fails loudly") {
    intercept[IllegalArgumentException] {
      Dsir.dsirSelect(docs, "doc_id", "text", lit(false)).collect()
    }
  }

  test("dsirResample draws exactly the budget, ranked contiguously") {
    val out = Dsir.dsirResample(docs, "doc_id", "text",
      col("doc_id") <= 3, budgetDocs = 4L).collect()
    assert(out.length === 4)
    assert(out.map(_.getAs[Long]("rank")).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
    // a budget past the corpus size returns the whole corpus
    val all = Dsir.dsirResample(docs, "doc_id", "text",
      col("doc_id") <= 3, budgetDocs = 100L).collect()
    assert(all.length === 7)
  }

  test("dsirResample take path == prefix-sum path (budget-aware plan)") {
    // takeCap = 0 forces the two-phase groupedCumSum fallback; the
    // default path plans TakeOrderedAndProject. Same draw either way.
    def run(cap: Int) =
      Dsir.dsirResample(docs, "doc_id", "text", col("doc_id") <= 3,
          budgetDocs = 4L, takeCap = cap)
        .orderBy("rank").collect().toSeq
    assert(run(65536) == run(0))
  }

  test("dsirResample is deterministic and partitioning-invariant") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Dsir.dsirResample(d, "doc_id", "text", col("doc_id") <= 3,
          budgetDocs = 4L)
        .orderBy("rank").collect().toSeq
    assert(run(docs.repartition(1)) == run(docs.repartition(7)))
  }

  test("dsirResample key = bit-quantized Gumbel + score, replayed row-by-row") {
    // replay the documented draw in plain Scala and pin the engine's
    // gumbel_key to it — the oracle-parity formula, spelled out
    val md = java.security.MessageDigest.getInstance("MD5")
    def u60(key: String): Long = {
      val d = md.digest(key.getBytes("UTF-8"))
      var u = 0L
      var i = 0
      while (i < 7) { u = (u << 8) | (d(i) & 0xffL); i += 1 }
      (u << 4) | ((d(7) & 0xf0L) >>> 4)
    }
    def ilog2(x: Long): Long = 63L - java.lang.Long.numberOfLeadingZeros(x)
    val scores = Dsir.dsirSelect(docs, "doc_id", "text", col("doc_id") <= 3)
      .select("doc_id", "dsir_score").as[(Long, Long)].collect().toMap
    val keys = Dsir.dsirResample(docs, "doc_id", "text",
        col("doc_id") <= 3, budgetDocs = 100L)
      .select("doc_id", "gumbel_key").as[(Long, Long)].collect().toMap
    for ((id, score) <- scores) {
      val u = u60(s"dsirg:$id")
      val z = math.max(59L - ilog2(u + 1), 0L)
      val g = 20L - ilog2(z * 1048576L + (u % 1048576L) + 1L)
      assert(keys(id) === score + g, s"doc $id")
    }
  }
}
