package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** SimHash fingerprint (Charikar 2002, the Manku et al. 2007 web-dedup
  * variant over word features) of a text column as ONE codegen'd byte
  * walk.
  *
  * The column twin it replaces —
  * `transform(array_distinct(split(text, " ")), w => md5(w))` folded by
  * `bits` separate `aggregate(hashes, ...)` HOFs, one per fingerprint
  * bit — ran INTERPRETED per element per bit (HOFs are CodegenFallback):
  * at sf10 `dedup_simhash`'s 48-task scan carried ~277 s of task CPU for
  * 115 MB of shuffle, ~550 µs/doc, the exact per-row-interpreter profile
  * this repo has now kernelized eight times. Here the single-space split
  * runs once on the raw UTF-8 bytes (empty tokens preserved — DuckDB's
  * `string_split`/Spark's `split` both emit them, and the twin hashed
  * md5("") like any other distinct token), each DISTINCT token (set
  * semantics via one hash set, matching `array_distinct` /
  * `list_distinct`) is md5-digested in place, and bit j's ±1 vote reads
  * the high bit of hex nibble j straight from the digest bytes
  * (`substr(md5(w), j+1, 1) ∈ {8..f}` ⇔ nibble j ≥ 8) — no hex string,
  * no token array, no per-bit re-walk.
  *
  * Fingerprint: bit j set iff the signed vote sum over distinct tokens
  * is ≥ 0 — bit-identical to the twin and to the DuckDB oracle mirror
  * (DedupSpec pins kernel == twin on adversarial cases and the
  * documents corpus). Null text is NULL here; [[graft.operators.Dedup
  * .simhash]] coalesces it to the twin's 0 (`when(null >= 0)` falls to
  * `otherwise(0)` per bit, so the interpreted twin yields 0, not null).
  */
case class SimhashText(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 32,
    s"simhash bits must be in [1, 32], got $bits")

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    SimhashText.simhash(v.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashText.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimhashText =
    copy(child = newChild)
}

object SimhashText {
  import org.apache.spark.sql.GraftBridge

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def simhash(text: UTF8String, bits: Int): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    val digest = md.get()
    val votes = new Array[Int](bits)
    val seen = new java.util.HashSet[UTF8String]()
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        if (seen.add(tok)) {
          digest.update(bytes, start, i - start)
          val d = digest.digest()
          var j = 0
          while (j < bits) {
            // hex nibble j ≥ 8 ⇔ its top bit: even j = bit 7 of byte
            // j/2 (high nibble), odd j = bit 3 (low nibble)
            val hit = if ((j & 1) == 0) (d(j >> 1) & 0x80) != 0
                      else (d(j >> 1) & 0x08) != 0
            votes(j) += (if (hit) 1 else -1)
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) >= 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  def simhash_text(text: Column, bits: Int): Column =
    GraftBridge.column(SimhashText(GraftBridge.expression(text), bits))
}
