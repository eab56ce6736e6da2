package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val probe = spark.range(0, 5000)
    .select(col("id").as("k"), (col("id") * 7 % 100).as("v"))
  private lazy val build = spark.range(0, 5000).where(col("id") % 50 === 0)
    .select(col("id").as("bk"), lit("dim").as("name"))

  test("bloom-prefiltered join result equals the plain join") {
    val got = BloomJoin.bloomPrefilterJoin(probe, "k", build, "bk", 1000)
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted.toSeq
    val want = probe.join(build, col("k") === col("bk"))
      .select("k", "v", "name").as[(Long, Long, String)].collect().sorted.toSeq
    assert(got === want && want.nonEmpty)
  }

  test("a saturated bloom (tiny bit budget) still yields exact results") {
    // expectedItems=2 at fpp 0.5 → almost every probe row passes the
    // bloom; the exact join must still discard every false positive
    val got = BloomJoin.bloomPrefilterJoin(probe, "k", build, "bk", 2, fpp = 0.5)
      .select("k").as[Long].collect().sorted.toSeq
    val want = probe.join(build, col("k") === col("bk"))
      .select("k").as[Long].collect().sorted.toSeq
    assert(got === want)
  }

  test("empty build side yields an empty result with the joined schema") {
    val out = BloomJoin.bloomPrefilterJoin(
      probe, "k", build.where(lit(false)), "bk", 10)
    assert(out.columns.toSeq === Seq("k", "v", "bk", "name"))
    assert(out.count() === 0)
  }

  test("the probe side filters through might_contain inside codegen") {
    val plan = BloomJoin.bloomPrefilterJoin(probe, "k", build, "bk", 1000)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom predicate in plan:\n$plan")
  }

  test("bitsFor sizing follows the standard formula and floors at 64") {
    assert(BloomJoin.bitsFor(1, 0.5) === 64L)
    // n=10000, p=0.03 → ~72984 bits
    val b = BloomJoin.bitsFor(10000, 0.03)
    assert(b > 70000L && b < 76000L, s"bits=$b")
  }
}
