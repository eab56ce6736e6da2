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

/** Mutable Space-Saving buffer: counter map + a LAZY min-heap over
  * (count, item) snapshots for O(log m) eviction.
  *
  * The heap holds the count each entry had when pushed; increments
  * leave stale snapshots behind, and [[evictMin]] skips any popped
  * entry whose snapshot no longer equals the live count. Counts only
  * grow, so the first VALID pop is the true minimum. The heap is
  * rebuilt from the map when stale entries exceed 3× capacity,
  * bounding memory at O(capacity). The previous implementation scanned
  * all `capacity` counters per eviction — O(m) per update once the
  * sketch saturates, which measured 33× wall-clock for 10× rows on the
  * sf1 scaling run; the heap makes saturated updates O(log m) and the
  * same run scales linearly.
  *
  * Eviction rule (and therefore RESULTS) are unchanged: smallest
  * count, ties to the LARGEST item string, matching the
  * (count DESC, item ASC) output order exactly.
  */
final class SpaceSavingBuffer {
  val counts = new java.util.HashMap[String, Long]()
  // (count asc, item desc): poll() yields min count, largest item first
  private var heap = new java.util.PriorityQueue[(Long, String)](
    16, SpaceSavingBuffer.evictionOrder)

  private def push(item: String, cnt: Long): Unit = { heap.add((cnt, item)); () }

  def increment(item: String): Unit = {
    val cur = counts.getOrDefault(item, 0L)
    counts.put(item, cur + 1L)
    push(item, cur + 1L)
    maybeRebuild()
  }

  def insertNew(item: String, cnt: Long): Unit = {
    counts.put(item, cnt)
    push(item, cnt)
    maybeRebuild()
  }

  /** Remove and return the (min-count, largest-item) counter. */
  def evictMin(): Long = {
    while (true) {
      val top = heap.poll()
      val live = counts.getOrDefault(top._2, -1L)
      if (live == top._1) {
        counts.remove(top._2)
        return top._1
      } // else stale snapshot — skip
    }
    throw new IllegalStateException("unreachable")
  }

  private def maybeRebuild(): Unit =
    if (heap.size() > 3 * counts.size() + 64) rebuildHeap()

  def rebuildHeap(): Unit = {
    heap = new java.util.PriorityQueue[(Long, String)](
      math.max(16, counts.size()), SpaceSavingBuffer.evictionOrder)
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); heap.add((e.getValue, e.getKey)) }
  }
}

object SpaceSavingBuffer {
  val evictionOrder: java.util.Comparator[(Long, String)] =
    new java.util.Comparator[(Long, String)] {
      override def compare(a: (Long, String), b: (Long, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else b._2.compareTo(a._2)
      }
    }
}

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
    extends TypedImperativeAggregate[SpaceSavingBuffer]
    with ImplicitCastInputTypes
    with UnaryLike[Expression] {

  require(capacity > 0, s"SpaceSaving needs capacity > 0, got $capacity")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer()

  override def update(
      buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      if (buf.counts.containsKey(item)) buf.increment(item)
      else if (buf.counts.size() < capacity) buf.insertNew(item, 1L)
      else buf.insertNew(item, buf.evictMin() + 1L)
    }
    buf
  }

  override def merge(
      buf: SpaceSavingBuffer, other: SpaceSavingBuffer): SpaceSavingBuffer = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.counts.put(e.getKey, buf.counts.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (buf.counts.size() > capacity) {
      val kept = sorted(buf).take(capacity)
      buf.counts.clear()
      kept.foreach { case (k, c) => buf.counts.put(k, c) }
    }
    buf.rebuildHeap()
    buf
  }

  private def sorted(buf: SpaceSavingBuffer): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    buf.counts.asScala.toSeq.sortBy { case (k, c) => (-c, k) }
  }

  override def eval(buf: SpaceSavingBuffer): Any =
    new GenericArrayData(sorted(buf).map { case (k, c) =>
      InternalRow(UTF8String.fromString(k), c)
    }.toArray[Any])

  // length-prefixed UTF-8, not writeUTF: writeUTF throws past 64 KB,
  // and space_saving is SQL-registered over arbitrary string columns
  // (a whole document as the item must sketch, not crash).
  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.counts.size())
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(e.getValue)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.counts.put(
        new String(kb, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      j += 1
    }
    buf.rebuildHeap()
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
