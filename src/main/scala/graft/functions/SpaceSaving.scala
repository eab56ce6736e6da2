package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving heavy-hitters sketch (Metwally et al. 2005): a bounded
  * map of at most `capacity` counters. A new item past capacity evicts
  * the current minimum and inherits its count + 1 — the classic
  * overestimate whose error is bounded by N/capacity.
  *
  * Scale contract (vs `GROUP BY item ORDER BY count DESC`): the exact
  * query shuffles EVERY distinct item; this ships at most `capacity`
  * counters per task per group — map-side partials, O(tasks·capacity)
  * on the wire — and merges by summing counts then re-truncating to the
  * top `capacity` (the mergeable-summaries construction of Agarwal et
  * al. 2013, which preserves the εN = N/capacity bound). All
  * truncation tie-breaks are (count DESC, item ASC), so the sketch is
  * deterministic for a fixed partitioning; when `capacity` ≥ the
  * group's distinct count it never truncates and the counts are EXACT
  * and partitioning-independent — the regime the DuckDB oracle
  * hash-verifies. The approximate regime's guarantees (superset of true
  * heavy hitters, bounded overestimate) are pinned in SketchSpec.
  *
  * Returns `array<struct<item: string, est: bigint>>` sorted by
  * (est DESC, item ASC) — explode + filter downstream.
  */
case class SpaceSaving(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  require(capacity > 0, s"SpaceSaving needs capacity > 0, got $capacity")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** Deterministic min scan: smallest count, ties to the LARGEST item
    * string so the kept set matches the (count DESC, item ASC) order.
    */
  private def evictMin(buf: java.util.HashMap[String, Long]): Long = {
    var minK: String = null
    var minV = Long.MaxValue
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue < minV || (e.getValue == minV && (minK == null || e.getKey > minK))) {
        minK = e.getKey; minV = e.getValue
      }
    }
    buf.remove(minK)
    minV
  }

  override def update(
      buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      val cur = buf.getOrDefault(item, 0L)
      if (cur > 0L) buf.put(item, cur + 1L)
      else if (buf.size() < capacity) buf.put(item, 1L)
      else buf.put(item, evictMin(buf) + 1L)
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.put(e.getKey, buf.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (buf.size() > capacity) {
      val kept = sorted(buf).take(capacity)
      buf.clear()
      kept.foreach { case (k, c) => buf.put(k, c) }
    }
    buf
  }

  private def sorted(buf: java.util.HashMap[String, Long]): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq.sortBy { case (k, c) => (-c, k) }
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any =
    new GenericArrayData(sorted(buf).map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }.toArray[Any])

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey); out.writeLong(e.getValue)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.put(in.readUTF(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSaving =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSaving =
    copy(child = newChild)
}

object SpaceSaving {
  import org.apache.spark.sql.GraftBridge

  /** Column API: bounded heavy-hitter counters as
    * `array<struct<item, est>>` sorted by (est DESC, item ASC).
    */
  def space_saving(item: Column, capacity: Int): Column =
    GraftBridge.column(
      SpaceSaving(GraftBridge.expression(item), capacity).toAggregateExpression())
}
