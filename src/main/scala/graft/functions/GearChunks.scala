package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking via a Gear rolling hash, one codegen'd
  * pass per document (cf. the reference's whole-document dedup — this
  * is the finer-grained variant large corpora use so that a document
  * sharing MOST of its bytes with another still dedups chunk-wise).
  *
  * Gear (Xia et al., FAST'16 "FastCDC"): one table lookup + shift +
  * add per byte — `h = (h << 1) + gear(b)` — with a boundary wherever
  * `(h & mask) == 0` once the chunk has reached `minLen`, and a forced
  * boundary at `maxLen`. The `<< 1` ages bytes out of the low bits, so
  * the mask sees only the most recent `maskBits` bytes: that window
  * locality is what makes chunk boundaries RESYNCHRONIZE after an
  * edit — an insertion shifts every byte offset, but boundaries
  * downstream of the edit re-lock onto the same content positions
  * (asserted by CdcSpec's edit-locality property).
  *
  * This is the scale path for chunk-level dedup: O(1) state per row,
  * no per-position string allocation (contrast the portable md5-window
  * formulation in operators/Cdc.scala, which exists to be replayable
  * in a SQL oracle — O(w) work and one md5 per position). Chunking is
  * byte-oriented by design; multi-byte UTF-8 sequences may split
  * across chunks, and concat(chunks) == original bytes always holds.
  *
  * The gear table is a fixed pseudo-random permutation derived from
  * splitmix64 — deterministic across JVMs and sessions, never seeded
  * from runtime state.
  */
case class GearChunks(child: Expression, maskBits: Int, minLen: Int, maxLen: Int)
    extends UnaryExpression {

  require(maskBits >= 1 && maskBits <= 48, s"maskBits in [1,48], got $maskBits")
  require(minLen >= 1 && maxLen >= minLen,
    s"need 1 <= minLen <= maxLen, got ($minLen, $maxLen)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    GearChunks.split(v.asInstanceOf[UTF8String], maskBits, minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GearChunks.split($c, $maskBits, $minLen, $maxLen)")

  override protected def withNewChildInternal(newChild: Expression): GearChunks =
    copy(child = newChild)
}

object GearChunks {

  /** splitmix64 of the byte value — the standard statistically-flat
    * 64-bit mix, reproducible from the literal constants alone. */
  private val gear: Array[Long] = Array.tabulate(256) { i =>
    var z = i.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def split(text: UTF8String, maskBits: Int, minLen: Int, maxLen: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << maskBits) - 1
    val out = new java.util.ArrayList[Any]()
    var chunkStart = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      val len = i - chunkStart + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen) {
        out.add(UTF8String.fromBytes(bytes, chunkStart, len))
        chunkStart = i + 1
        h = 0L
      }
      i += 1
    }
    if (chunkStart < n)
      out.add(UTF8String.fromBytes(bytes, chunkStart, n - chunkStart))
    new GenericArrayData(out.toArray)
  }
}
