package graft

import org.apache.spark.sql.functions._

import graft.operators.Curriculum

/** Curriculum ordering: exact lower-quantile staging, deterministic
  * shuffle, round-robin source interleaving.
  */
class CurriculumSpec extends SparkSpec {
  import spark.implicits._

  // 40 docs over 2 sources with token counts 1..40 (i spaces between
  // words → i+1 tokens): stages must split 10/10/10/10
  private def docs = (1 to 40).map { i =>
    (i.toLong, Seq.fill(i)("w").mkString(" "), if (i % 2 == 0) "a" else "b")
  }.toDF("doc_id", "text", "source")

  test("stages split on exact lower quartiles, balanced on a uniform corpus") {
    val out = Curriculum.curriculumOrder(docs, "doc_id", "text", "source")
    val sizes = out.groupBy("stage").count().orderBy("stage")
      .as[(Int, Long)].collect().toSeq
    assert(sizes == Seq((1, 10L), (2, 10L), (3, 10L), (4, 10L)))
    // staging is monotone in tokens: max tokens of stage s ≤ min of s+1
    val bounds = out.groupBy("stage")
      .agg(min("tokens").as("mn"), max("tokens").as("mx"))
      .orderBy("stage").as[(Int, Long, Long)].collect()
    bounds.sliding(2).foreach {
      case Array((_, _, mx), (_, mn, _)) => assert(mx <= mn)
      case _ => ()
    }
  }

  test("within a stage, sources interleave round-robin") {
    val out = Curriculum.curriculumOrder(docs, "doc_id", "text", "source")
      .where(col("stage") === 1)
      .orderBy("curriculum_rank")
      .select("source").as[String].collect().toSeq
    // both sources have 5 rows in stage 1 → ranks alternate in pairs:
    // every consecutive window of 2 holds both sources
    out.grouped(2).foreach(p => assert(p.toSet.size == 2,
      s"round-robin violated: $out"))
  }

  test("deterministic under repartitioning") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Curriculum.curriculumOrder(d, "doc_id", "text", "source")
        .orderBy("doc_id").collect().toSeq
    assert(run(docs.repartition(1)) == run(docs.repartition(7)))
  }

  test("tokenBudgetSample: budgets bind per source, documents are atomic") {
    val out = Curriculum.tokenBudgetSample(docs, "doc_id", "text", "source",
      tokensPerSource = 100L)
    val bySource = out.groupBy("source")
      .agg(max("cum_tokens").as("mx"), count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect()
    assert(bySource.length == 2)
    bySource.foreach { case (s, mx, c) =>
      assert(mx <= 100L, s"source $s exceeded its token budget")
      assert(c > 0, s"source $s must take at least one document")
    }
    // atomicity: each kept row's own tokens fit entirely inside cum
    val rows = out.select("tokens", "cum_tokens").as[(Long, Long)].collect()
    rows.foreach { case (t, cum) => assert(cum >= t) }
    // the NEXT md5-ordered doc per source would have burst the budget
    // (i.e. the selection is maximal): re-running with a budget one
    // token higher never selects FEWER documents
    val bigger = Curriculum.tokenBudgetSample(docs, "doc_id", "text",
      "source", tokensPerSource = 101L).count()
    assert(bigger >= out.count())
  }

  test("tokenBudgetSample is invariant under repartitioning") {
    def run(d: org.apache.spark.sql.DataFrame) =
      Curriculum.tokenBudgetSample(d, "doc_id", "text", "source", 100L)
        .orderBy("doc_id").collect().toSeq
    assert(run(docs.repartition(1)) == run(docs.repartition(5)))
  }

  test("rejects out-of-range stage counts") {
    intercept[IllegalArgumentException] {
      Curriculum.curriculumOrder(docs, "doc_id", "text", "source", stages = 1)
    }
  }
}
