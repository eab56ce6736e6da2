package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Skyline (Pareto front) over long-typed maximize-dimensions: the
  * rows not dominated by any other row, where `b` dominates `a` iff
  * b >= a on every dimension and b > a on at least one (equal tuples
  * never dominate each other, so exact ties all survive — the same
  * semantics as the `NOT EXISTS` dominance SQL).
  *
  * Two-phase distributed shape (the classic parallel-skyline
  * decomposition): phase 1 computes each partition's LOCAL skyline
  * with an in-memory dominance buffer — a globally non-dominated row
  * cannot be dominated inside its own partition, so the union of
  * local skylines is a superset of the answer and is typically
  * orders of magnitude smaller than the input (dominance prunes
  * aggressively on anti-correlated real data). Phase 2 resolves
  * cross-partition dominance with a broadcast nested-loop LEFT ANTI
  * self-join over just those candidates. No global sort, no driver
  * collect; the only all-to-all movement is the tiny candidate
  * broadcast.
  *
  * Phase 1 is `mapPartitions` by design — the dominance buffer is
  * genuine per-partition imperative state that no relational operator
  * expresses without an O(n²) self-join over the FULL input.
  */
object Skyline {

  /** Pareto front of `df` over `dims` (all LongType, all maximize —
    * negate a column to minimize; encode timestamps as epoch longs).
    * Non-dim columns pass through untouched. The candidate set is
    * persisted: it feeds both sides of the phase-2 anti-join, and
    * without pinning it the whole phase-1 scan would run twice.
    */
  def pareto(df: DataFrame, dims: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "skyline needs at least one dimension")
    val schema = df.schema
    val idx = dims.map(schema.fieldIndex).toArray
    dims.foreach { d =>
      require(schema(d).dataType.typeName == "long",
        s"skyline dim $d must be LongType, got ${schema(d).dataType}")
    }

    def dominates(a: Row, b: Row): Boolean = {
      var strict = false
      var i = 0
      while (i < idx.length) {
        val av = a.getLong(idx(i))
        val bv = b.getLong(idx(i))
        if (av < bv) return false
        if (av > bv) strict = true
        i += 1
      }
      strict
    }

    val local = df.mapPartitions { it =>
      val kept = ArrayBuffer[Row]()
      it.foreach { r =>
        if (!kept.exists(k => dominates(k, r))) {
          val survivors = kept.filterNot(k => dominates(r, k))
          kept.clear()
          kept ++= survivors
          kept += r
        }
      }
      kept.iterator
    }(Encoders.row(schema))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val rhs = local.select(dims.map(d => col(d).as(s"_b_$d")): _*)
    val geAll: Column = dims.map(d => col(s"_b_$d") >= col(d))
      .reduce(_ && _)
    val gtAny: Column = dims.map(d => col(s"_b_$d") > col(d))
      .reduce(_ || _)
    local.join(broadcast(rhs), geAll && gtAny, "left_anti")
  }
}
