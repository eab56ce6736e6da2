package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Runtime bloom-filter join: build a bloom over the build side's join
  * keys, pre-filter the probe side with it BEFORE the join's exchange,
  * then run the exact join to discard false positives. Semantically
  * transparent — the result is byte-identical to the plain join — but
  * at 100 TB the probe side's shuffle only carries rows whose key
  * might match, which is the difference between shuffling the whole
  * fact table and shuffling the ~selectivity fraction of it. This is
  * the manual, always-on form of Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter` rewrite (which only fires
  * on selective scans it can cost); the same Catalyst machinery
  * (BloomFilterAggregate / BloomFilterMightContain / xxhash64) does
  * the work, so the filter evaluates inside whole-stage codegen.
  *
  * The build-side aggregate runs as one eager job at plan-construction
  * (exactly what Spark's runtime filter does at query start: the bloom
  * must exist before the probe scan starts). The shipped bloom is a
  * binary literal, broadcast with the task closure.
  */
object BloomJoin {

  /** bits = ⌈−n·ln(fpp)/ln²2⌉ — the standard bloom sizing formula. */
  def bitsFor(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong.max(64L)
  }

  /** One job over the build side: serialized bloom of xxhash64(key),
    * or None when the build side is empty.
    */
  def buildBloom(build: DataFrame, keyCol: String, expectedItems: Long,
      fpp: Double = 0.03): Option[Array[Byte]] = {
    val agg = new BloomFilterAggregate(
      GraftBridge.expression(xxhash64(col(keyCol))),
      Literal(expectedItems), Literal(bitsFor(expectedItems, fpp)))
      .toAggregateExpression()
    Option(build.select(GraftBridge.column(agg).as("bf")).head()
      .getAs[Array[Byte]]("bf"))
  }

  /** Codegen probe predicate: bloom-might-contain(xxhash64(key)). */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), GraftBridge.expression(xxhash64(key))))

  /** Inner equi-join with the probe side bloom-pruned before its
    * exchange. `expectedItems` sizes the filter — overestimating costs
    * bits, underestimating costs false positives, never correctness.
    */
  def bloomPrefilterJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String, expectedItems: Long,
      fpp: Double = 0.03): DataFrame =
    buildBloom(build, buildKey, expectedItems, fpp) match {
      case None =>
        // empty build side: the inner join is empty; keep the schema
        probe.where(lit(false)).join(build, probe(probeKey) === build(buildKey))
      case Some(bloom) =>
        probe.where(mightContain(bloom, probe(probeKey)))
          .join(build, probe(probeKey) === build(buildKey))
    }
}
