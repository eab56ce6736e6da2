package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-heap top-k aggregate: keeps the `k` (score, id) pairs with the
  * highest score (ties broken by ascending id — a total, deterministic
  * order) and returns them best-first as `array<struct<neighbor_id:
  * bigint, cosine: double>>`.
  *
  * This is the scale-safe replacement for `row_number() OVER (PARTITION
  * BY query) <= k`: the window formulation shuffles EVERY scored
  * candidate row into |queries| partitions — a |Q|-task stage no matter
  * how large the cluster — while an aggregate runs map-side first
  * (ObjectHashAggregate partial mode), so each task keeps at most k
  * candidates per query and the exchange carries ≤ tasks·|Q| buffers of
  * k entries instead of |Q|·N rows. The heap is a min-root priority
  * queue: insertion is O(log k) and candidates below the current k-th
  * score short-circuit without touching the heap.
  *
  * Null scores/ids are skipped (a null cosine is a non-candidate, same
  * as the window formulation where desc ordering puts nulls last and
  * they can never enter the top k while real candidates exist).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
    with ImplicitCastInputTypes
    with BinaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def left: Expression = score
  override def right: Expression = id

  // Coerce (or reject at analysis time) rather than ClassCastException at
  // runtime: an integer score (the natural shape for counts) widens to
  // double, an int id widens to long; a string score fails analysis.
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("neighbor_id", LongType, nullable = false),
      StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  /** Heap root is the WORST kept element (lowest score; ties → largest
    * id), so eviction compares against the root only.
    */
  private val evictFirst: Ordering[(Double, Long)] =
    new Ordering[(Double, Long)] {
      override def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(evictFirst)

  private def insert(
      buf: mutable.PriorityQueue[(Double, Long)],
      cand: (Double, Long)): Unit = {
    if (buf.size < k) buf.enqueue(cand)
    else if (evictFirst.compare(cand, buf.head) < 0) {
      buf.dequeue(); buf.enqueue(cand)
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // Ascending under evictFirst = best-first (evictFirst ranks worse
    // elements as larger, so the minimum is the best candidate).
    val bestFirst = buf.toArray.sorted(evictFirst)
    new GenericArrayData(bestFirst.map { case (s, i) =>
      InternalRow(i, s)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((in.readDouble(), in.readLong())); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, id = newRight)
}

/** String-keyed sibling of [[TopKByScore]]: keeps the `k` highest-score
  * (score, token) pairs, ties broken by ascending token (binary UTF-8
  * order — what unaccented SQL engines sort varchar by). The scale
  * story is identical: map-side partial heaps, k-entry buffers on the
  * wire, no |groups|-partition window. This is the vocabulary-top-k
  * primitive — at 100 TB the (token, count) aggregate output can be
  * hundreds of millions of rows, which a per-language row_number window
  * would funnel into |languages| tasks.
  */
case class TopKStringByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, UTF8String)]]
    with ImplicitCastInputTypes
    with BinaryLike[Expression] {

  require(k > 0, s"top-k needs k > 0, got $k")

  override def left: Expression = score
  override def right: Expression = id

  // See TopKByScore.inputTypes: analysis-time coercion, not runtime CCE.
  override def inputTypes: Seq[DataType] = Seq(DoubleType, StringType)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  private val evictFirst: Ordering[(Double, UTF8String)] =
    new Ordering[(Double, UTF8String)] {
      override def compare(a: (Double, UTF8String), b: (Double, UTF8String)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else a._2.binaryCompare(b._2)
      }
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, UTF8String)] =
    mutable.PriorityQueue.empty(evictFirst)

  private def insert(
      buf: mutable.PriorityQueue[(Double, UTF8String)],
      cand: (Double, UTF8String)): Unit = {
    if (buf.size < k) buf.enqueue(cand)
    else if (evictFirst.compare(cand, buf.head) < 0) {
      buf.dequeue(); buf.enqueue(cand)
    }
  }

  override def update(
      buf: mutable.PriorityQueue[(Double, UTF8String)],
      input: InternalRow): mutable.PriorityQueue[(Double, UTF8String)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      // clone: the input UTF8String may point into a reused row buffer
      insert(buf, (s.asInstanceOf[Double], i.asInstanceOf[UTF8String].clone()))
    }
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[(Double, UTF8String)],
      other: mutable.PriorityQueue[(Double, UTF8String)]): mutable.PriorityQueue[(Double, UTF8String)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, UTF8String)]): Any = {
    val bestFirst = buf.toArray.sorted(evictFirst)
    new GenericArrayData(bestFirst.map { case (s, t) =>
      InternalRow(t, s)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, UTF8String)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (s, t) =>
      out.writeDouble(s)
      val tb = t.getBytes
      out.writeInt(tb.length)
      out.write(tb)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): mutable.PriorityQueue[(Double, UTF8String)] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      val s = in.readDouble()
      val len = in.readInt()
      val tb = new Array[Byte](len)
      in.readFully(tb)
      buf.enqueue((s, UTF8String.fromBytes(tb)))
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStringByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStringByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKStringByScore =
    copy(score = newLeft, id = newRight)
}

object TopKByScore {
  import org.apache.spark.sql.GraftBridge

  /** Column API: top-k (score desc, id asc) pairs as a best-first
    * struct array — use with posexplode for (rank, id, score) rows.
    */
  def top_k_by(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKByScore(GraftBridge.expression(score), GraftBridge.expression(id), k)
        .toAggregateExpression())

  /** Column API: top-k (score desc, token asc) for string ids. */
  def top_k_string_by(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKStringByScore(GraftBridge.expression(score), GraftBridge.expression(id), k)
        .toAggregateExpression())
}
