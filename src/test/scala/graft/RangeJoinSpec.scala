package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq.tabulate(500)(i => (i.toLong, (i * 13 % 1000).toLong))
    .toDF("p_id", "p")
  private val intervals = Seq.tabulate(40) { i =>
    val s = (i * 29 % 900).toLong; (i.toLong, s, s + (i % 7) * 20 + 5)
  }.toDF("i_id", "s", "e")

  test("binned interval join matches the naive BETWEEN join, once per pair") {
    val got = RangeJoin.intervalJoin(points, "p", intervals, "s", "e", binWidth = 50)
      .select("p_id", "i_id").as[(Long, Long)].collect().sorted.toSeq
    val naive = points.join(intervals, $"p" >= $"s" && $"p" <= $"e")
      .select("p_id", "i_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got === naive)
    assert(got.distinct === got, "each matching pair must appear exactly once")
    assert(got.nonEmpty)
  }

  test("the plan is an equi-join on the bin, not a nested-loop join") {
    val plan = RangeJoin.intervalJoin(points, "p", intervals, "s", "e", binWidth = 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join fell back to a nested loop:\n$plan")
    assert(plan.contains("HashJoin"), s"expected a hash equi-join:\n$plan")
  }
}
