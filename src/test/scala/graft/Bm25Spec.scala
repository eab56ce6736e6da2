package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis => T}

/** Pins [[TextAnalysis.bm25TopK]] against a driver-side twin of the
  * exact formula (same constants, same expression order, same HALF_UP
  * micro-point quantization) on a corpus small enough to check by hand.
  * The DuckDB oracle re-derives the same algebra independently at
  * sf0.01.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog"),
    (3L, "a mouse ran past the dog"),
    (4L, "the the the"),
    (5L, "entirely unrelated words here"))

  /** Driver-side twin: same tokenization (single-space split, drop
    * empties), same top-`nTerms` query-term draw (count desc, token
    * asc), same one-tree contribution with HALF_UP micro rounding.
    */
  private def expected(nTerms: Int, k: Int): Seq[(Long, Long, Long)] = {
    val toks = corpus.flatMap { case (id, t) =>
      t.split(" ", -1).filter(_.nonEmpty).map(id -> _) }
    val n = corpus.size.toDouble
    val avgdl = toks.size.toDouble / n
    val q = toks.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (tok, c) => (-c, tok) }.take(nTerms).map(_._1).toSet
    val tf = toks.filter(p => q(p._2))
      .groupBy(identity).view.mapValues(_.size).toSeq
      .map { case ((id, tok), c) => (id, tok, c.toLong) }
    val dfc = tf.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val dl = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val perDoc = tf.groupBy(_._1).map { case (id, rows) =>
      val contribs = rows.map { case (_, tok, c) =>
        val x = math.log((n - dfc(tok) + 0.5) / (dfc(tok) + 0.5) + 1.0) *
          (c * 2.2) / (c + 1.2 * (1.0 - 0.75 + 0.75 * dl(id) / avgdl)) *
          1000000.0
        BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue
      }
      (id, rows.size.toLong, contribs.sum)
    }.toSeq
    perDoc.sortBy { case (id, _, s) => (-s, id) }.take(k)
  }

  private def engine(nTerms: Int, k: Int): Seq[(Long, Long, Long)] =
    T.bm25TopK(corpus.toDF("doc_id", "text"), "doc_id", "text", nTerms, k)
      .as[(Long, Long, Long)].collect().toSeq

  test("bm25TopK == the driver-side formula twin (top-2 terms)") {
    assert(engine(2, 10) === expected(2, 10))
  }

  test("bm25TopK == twin with a wider query-term set and a real cut") {
    assert(engine(4, 3) === expected(4, 3))
  }

  test("score_micro tie across documents breaks doc_id-asc at the k cut") {
    // docs 11/12/13 are identical (same tf, same dl for every query
    // term) so their score_micro ties exactly; with k = 2 the cut falls
    // INSIDE the tie and only the doc_id-asc order decides who survives
    val tied = Seq(
      (13L, "alpha beta alpha"),
      (11L, "alpha beta alpha"),
      (12L, "alpha beta alpha"),
      (20L, "gamma gamma gamma gamma"))
    val got = T.bm25TopK(tied.toDF("doc_id", "text"), "doc_id", "text",
        nTerms = 1, k = 2)
      .as[(Long, Long, Long)].collect().toSeq
    // top term is "alpha" (4 occurrences vs gamma's 4 — tie broken
    // token-asc, alpha wins); the three tied docs score identically
    assert(got.map(_._1) === Seq(11L, 12L), s"tie cut order wrong: $got")
    assert(got(0)._3 === got(1)._3, "scores should tie exactly")
  }

  test("obvious ranking: saturated repetition beats a single mention") {
    // with only "the" as query term, doc 4 (the x3, dl 3) outranks
    // doc 2 (the x1) and doc 5 (no hit) is absent
    val got = engine(1, 10)
    assert(got.map(_._1).contains(4L) && !got.map(_._1).contains(5L))
    val score = got.map(r => r._1 -> r._3).toMap
    assert(score(4L) > score(2L))
  }

  test("bm25MoreLikeThis: query terms come from the query doc, which is excluded") {
    // doc 3's tokens are all unique within it → its top-2 query terms
    // are the ALPHABETICALLY first two ("a", "dog"); "dog" hits doc 2,
    // "a" hits no other doc. Doc 3 itself must not appear.
    val got = T.bm25MoreLikeThis(corpus.toDF("doc_id", "text"),
        "doc_id", "text", queryId = 3L, nTerms = 2, k = 10)
      .as[(Long, Long, Long)].collect().toSeq
    assert(!got.map(_._1).contains(3L), s"query doc leaked into: $got")
    assert(got.map(_._1) === Seq(2L), s"expected only the dog doc: $got")
  }

  test("hybrid fusion ranks a doc found by both rankers above single-ranker docs") {
    // rrfFuse with hand-built rankings: doc 7 is rank 2 in both lists;
    // docs 5/9 are rank 1 in exactly one. 1/62+1/62 > 1/61+0 → doc 7
    // fuses first; the 1/61 singletons tie and break by neighbor id.
    val a = Seq((0L, 5L, 1L), (0L, 7L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val b = Seq((0L, 9L, 1L), (0L, 7L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val fused = graft.operators.Similarity.rrfFuse(a, b, k = 3)
      .orderBy(col("fused_rank"))
      .select("neighbor_id").as[Long].collect().toSeq
    assert(fused === Seq(7L, 5L, 9L))
  }
}
