package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) sketch buffer: keeps the `k` SMALLEST DISTINCT
  * hash values seen. With uniform hashes in [0, 2⁶⁰), the k-th smallest
  * kept value estimates distinct cardinality as (k−1)·2⁶⁰ / kth — the
  * classic bottom-k estimator (Bar-Yossef et al. 2002).
  *
  * The scale contract mirrors [[TopKByScore]]: this replaces
  * `count(DISTINCT x)`'s exact-distinct shuffle (which moves every
  * distinct value across the wire) with map-side partial sketches —
  * each task ships at most k longs per group, so the exchange carries
  * O(tasks·groups·k) instead of O(distinct values). Duplicates collapse
  * inside the TreeSet, which is what makes the sketch insensitive to
  * how many times a value repeats — only the distinct hash set matters.
  *
  * Returns `struct(n_kept: bigint, kth_hash: bigint)`: n_kept < k means
  * the group's distinct count is EXACTLY n_kept (the sketch never
  * filled); kth_hash is the largest kept hash (null when no input).
  * The estimate itself is left to the caller — one double divide over
  * exact integers, reproducible in any engine.
  */
case class KMinValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  require(k > 1, s"KMV needs k > 1 for the (k-1)/kth estimator, got $k")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_kept", LongType, nullable = false),
    StructField("kth_hash", LongType, nullable = true)))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // short-circuit: a value past the current k-th smallest can't enter
    if (buf.size() < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.isEmpty) InternalRow(0L, null)
    else InternalRow(buf.size().toLong, buf.last().longValue())

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.add(in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
}

object KMinValues {
  import org.apache.spark.sql.GraftBridge

  /** Column API: bottom-k distinct-hash sketch as
    * `struct(n_kept, kth_hash)`.
    */
  def k_min_values(hash: Column, k: Int): Column =
    GraftBridge.column(
      KMinValues(GraftBridge.expression(hash), k).toAggregateExpression())
}
