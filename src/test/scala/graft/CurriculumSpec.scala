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

  // 200 docs, 90% in one web-crawl source — the real pretraining
  // mixture shape the two-phase formulations must survive. Varying
  // token counts so stages are non-trivial.
  private def skewed = (1 to 200).map { i =>
    (i.toLong, Seq.fill(1 + i % 17)("w").mkString(" "),
      if (i % 10 == 0) "tail" else "crawl")
  }.toDF("doc_id", "text", "source")

  test("arithmetic interleave rank ≡ the windowed total-order twin") {
    // on both a balanced and a 90%-skewed corpus, incl. sources that
    // exhaust at different rounds (the min(pos-1, c) path)
    for (d <- Seq(docs, skewed)) {
      val fast = Curriculum.curriculumOrder(d, "doc_id", "text", "source")
        .orderBy("doc_id").collect().toSeq
      val slow = Curriculum
        .curriculumOrderWindowed(d, "doc_id", "text", "source")
        .orderBy("doc_id").collect().toSeq
      assert(fast == slow)
    }
  }

  test("no per-group total-order window in either registered curriculum plan") {
    // the scale contract: neither plan may sort a whole source/stage in
    // one task. A per-group total order shows up as a window exchange
    // hash-partitioned on ONLY the group columns; the two-phase plans
    // always include _pid in the window partition key.
    for (df <- Seq(
        Curriculum.curriculumOrder(skewed, "doc_id", "text", "source"),
        Curriculum.tokenBudgetSample(skewed, "doc_id", "text", "source", 100L))) {
      val p = df.queryExecution.executedPlan.toString
      val windowExchanges = p.linesIterator
        .filter(_.contains("Exchange hashpartitioning"))
        .filter(!_.contains("_pid")).toSeq
      // only the tiny per-(pid, group) totals aggregate and the
      // broadcast build may hash on bare group columns; the WINDOW
      // over the data rows must carry _pid. Assert no Window operator
      // is partitioned by group columns alone:
      val badWindow = p.linesIterator.filter(_.contains("Window "))
        .filter(l => !l.contains("_pid") && !l.contains("_ptotal"))
        .toSeq
      assert(badWindow.isEmpty,
        s"total-order window over data rows:\n${badWindow.mkString("\n")}\n$p")
      assert(windowExchanges.forall(_.nonEmpty)) // touch to avoid unused warn
    }
  }
}
