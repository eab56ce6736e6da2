package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** All B Poisson-bootstrap replicate sums in ONE fixed-buffer
  * aggregate: per row, draws the B deterministic Poisson(1) weights
  * from md5(salt:id:rep) IN the update loop (plain JVM MD5 — the
  * bit-identical twin of [[graft.operators.Resample.weight]]'s
  * `conv(substring(md5(...)))` column, pinned by ResampleSpec) and
  * accumulates Σw and Σw·v for every replicate in a 2·B-long buffer
  * (512 B at B = 32) — the [[VecOuterSum]] pattern.
  *
  * Why not 2·B `sum(...)` columns over B weight columns? Both halves
  * of that plan blow Janino's 64 KB method limit at B = 32 — the
  * no-key HashAggregate's update method (rounds ≤ 11) and, once the
  * sums moved into a typed buffer, the projection of 32
  * md5→conv→when-chains (`processNext()`). This shape has NO giant
  * codegen span at all: the scan projects two columns, the typed
  * buffer does tight JVM arithmetic, and one 512-byte partial per
  * task crosses the exchange. Exact integer sums, order-independent,
  * bit-identical at any parallelism.
  *
  * Null semantics mirror the column formulation it replaces: a NULL
  * id contributes nothing (its draws are undefined); a non-null id
  * with a NULL value still counts toward Σw (like `sum(w)`) but not
  * Σw·v (like `sum(w * v)` under null-product).
  *
  * Returns `struct(n: array<bigint>[B], wv: array<bigint>[B])` —
  * callers posexplode to (rep, n_eff, wsum) rows.
  */
case class BootSums(
    left: Expression,
    right: Expression,
    reps: Int,
    salt: String,
    thresholds: Seq[Long],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with BinaryLike[Expression] {

  require(reps >= 1 && reps <= 256, s"reps in [1,256], got $reps")
  require(thresholds.nonEmpty && thresholds == thresholds.sorted,
    "thresholds must be a nonempty ascending CDF ladder")

  private val thr: Array[Long] = thresholds.toArray

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  // update() reads left.toString for the draw key and casts right to
  // Long — enforce the documented (string id, bigint value) contract
  // at analysis time, not as an executor-side ClassCastException
  // mid-job (the Column API is public; only the internal call site
  // happens to cast)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"boot_sums id column must be string, got ${left.dataType}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"boot_sums value column must be bigint, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("wv", ArrayType(LongType, containsNull = false), nullable = false)))

  override def nullable: Boolean = false

  // buffer: [Σw_0..Σw_{B-1}, Σwv_0..Σwv_{B-1}]
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * reps)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val id = left.eval(input)
    if (id != null) {
      val base = salt + ":" + id.toString + ":"
      val v = right.eval(input)
      val hasV = v != null
      val vl = if (hasV) v.asInstanceOf[Long] else 0L
      var r = 0
      while (r < reps) {
        val w = BootSums.weightOf(md, base + r, thr)
        buf(r) += w
        if (hasV) buf(reps + r) += w * vl
        r += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = InternalRow(
    new GenericArrayData(java.util.Arrays.copyOfRange(buf, 0, reps)),
    new GenericArrayData(java.util.Arrays.copyOfRange(buf, reps, 2 * reps)))

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

  override def withNewMutableAggBufferOffset(newOffset: Int): BootSums =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BootSums =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BootSums =
    copy(left = newLeft, right = newRight)
}

object BootSums {
  import org.apache.spark.sql.GraftBridge

  /** The 60-bit uniform draw: numeric value of the first 15 hex chars
    * of md5(key) — exactly `conv(substring(md5(key), 1, 15), 16, 10)`
    * (bytes 0–6 big-endian, then the high nibble of byte 7).
    */
  private[functions] def u60(md: MessageDigest, key: String): Long = {
    val d = md.digest(key.getBytes(StandardCharsets.UTF_8))
    var u = 0L
    var i = 0
    while (i < 7) { u = (u << 8) | (d(i) & 0xffL); i += 1 }
    (u << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  private[functions] def weightOf(md: MessageDigest, key: String,
      thr: Array[Long]): Long = {
    val u = u60(md, key)
    var k = 0
    while (k < thr.length && u >= thr(k)) k += 1
    k.toLong // thr.length == 6 → weights 0..6, ladder-capped
  }

  /** Test hook: the JVM weight for (salt, id, rep) — must equal the
    * Column formulation `Resample.weight` draw for draw (ResampleSpec
    * pins this over thousands of ids).
    */
  def jvmWeight(salt: String, id: String, rep: Int,
      thresholds: Seq[Long]): Long =
    weightOf(MessageDigest.getInstance("MD5"), s"$salt:$id:$rep",
      thresholds.toArray)

  /** Column API: all-replicate (Σw, Σw·v) over a string id column
    * (draw key) and a `bigint` value column.
    */
  def boot_sums(idStr: Column, value: Column, reps: Int, salt: String,
      thresholds: Seq[Long]): Column =
    GraftBridge.column(
      BootSums(GraftBridge.expression(idStr),
        GraftBridge.expression(value), reps, salt,
        thresholds).toAggregateExpression())
}
