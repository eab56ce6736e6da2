package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact second-moment matrix of a quantized vector column — the
  * covariance/Gram input of PCA, whitening, and feature-correlation
  * analysis, computed the scale-correct way: each task accumulates the
  * full Σxᵢ and upper-triangular Σxᵢxⱼ in ONE fixed-size buffer
  * (1 + d + d(d+1)/2 longs — ~17 KB at d = 64), so the exchange
  * carries one buffer per task instead of the N·d² explode a
  * SQL-shaped formulation shuffles. All sums are exact integer
  * arithmetic on the quantized domain (|x| ≤ 2·10⁴ ⇒ xᵢxⱼ ≤ 4·10⁸;
  * 2⁶³ absorbs > 10¹⁰ rows per pair) — order-independent,
  * bit-identical at any parallelism.
  *
  * Returns `struct(n, sums: array<bigint>[d], xy: array<bigint>[d·d])`
  * with `xy` the FULL row-major matrix (mirrored from the triangular
  * buffer at eval time) so callers can posexplode and derive (i, j)
  * from the index with integer div/mod — no sqrt, no join.
  */
case class VecOuterSum(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(dims >= 1 && dims <= 512, s"dims in [1,512], got $dims")

  private val tri = dims * (dims + 1) / 2

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sums", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("xy", ArrayType(LongType, containsNull = false), nullable = false)))

  override def nullable: Boolean = false

  // buffer: [n, sum_0..sum_{d-1}, tri(0,0), tri(0,1).., tri(d-1,d-1)]
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + dims + tri)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      if (a.numElements() == dims) {
        buf(0) += 1L
        var i = 0
        var t = 1 + dims
        while (i < dims) {
          val xi = a.getLong(i)
          buf(1 + i) += xi
          var j = i
          while (j < dims) {
            buf(t) += xi * a.getLong(j)
            t += 1
            j += 1
          }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val sums = java.util.Arrays.copyOfRange(buf, 1, 1 + dims)
    val full = new Array[Long](dims * dims)
    var i = 0
    var t = 1 + dims
    while (i < dims) {
      var j = i
      while (j < dims) {
        full(i * dims + j) = buf(t)
        full(j * dims + i) = buf(t)
        t += 1
        j += 1
      }
      i += 1
    }
    InternalRow(buf(0), new GenericArrayData(sums), new GenericArrayData(full))
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val buf = createAggregationBuffer()
    var i = 0
    while (i < buf.length) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecOuterSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecOuterSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecOuterSum =
    copy(child = newChild)
}

object VecOuterSum {
  import org.apache.spark.sql.GraftBridge

  /** Column API: exact (n, Σx, Σxxᵀ) of an `array<bigint>` column. */
  def vec_outer_sum(q: Column, dims: Int): Column =
    GraftBridge.column(
      VecOuterSum(GraftBridge.expression(q), dims).toAggregateExpression())
}
