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

  test("a pre-existing _bin column is sidestepped, not clobbered") {
    val p2 = points.withColumn("_bin", lit("keep-me"))
    val got = RangeJoin.intervalJoin(p2, "p", intervals, "s", "e", binWidth = 50)
    assert(got.columns.count(_ == "_bin") === 1, "user _bin survives exactly once")
    val naive = p2.join(intervals, $"p" >= $"s" && $"p" <= $"e")
      .select("p_id", "i_id").as[(Long, Long)].collect().sorted.toSeq
    assert(got.select("p_id", "i_id").as[(Long, Long)].collect().sorted.toSeq === naive)
    assert(got.select("_bin").distinct.as[String].collect().toSeq === Seq("keep-me"))
  }

  test("shared column names between the two sides are refused up front") {
    val clash = intervals.withColumnRenamed("i_id", "p_id")
    val err = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(points, "p", clash, "s", "e", binWidth = 50)
    }
    assert(err.getMessage.contains("p_id"))
  }

  test("the plan is an equi-join on the bin, not a nested-loop join") {
    val plan = RangeJoin.intervalJoin(points, "p", intervals, "s", "e", binWidth = 50)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval join fell back to a nested loop:\n$plan")
    assert(plan.contains("HashJoin"), s"expected a hash equi-join:\n$plan")
  }

  test("ip range lookup covers every surviving request exactly once") {
    val out = graft.queries.ElbQueries.ipRangeLookup(spark, "/root/testdata/sf0.001")
    // the range table tiles each /16 completely, so the region rollup
    // must account for every parsed row exactly once
    val survivors = Tables.events(spark, "/root/testdata/sf0.001")
      .where(col("event_id") % 101 =!= 0 && col("event_id") % 97 =!= 0).count()
    val totals = out.agg(sum(col("n_requests"))).as[Long].head()
    assert(totals === survivors)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"range side should broadcast:\n$plan")
  }
}
