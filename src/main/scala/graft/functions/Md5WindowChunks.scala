package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The portable md5-window CDC rule as ONE compiled pass: a chunk
  * boundary falls after byte p when `md5(bytes[p-15..p])` begins with
  * hex "00" (⇔ digest byte 0 == 0), and each chunk is reported as
  * `struct(h: md5-hex of the chunk, len: chunk byte length)` in
  * document order.
  *
  * Semantically IDENTICAL to the SQL formulation the DuckDB oracle
  * runs (`list_filter(generate_series(16, len), p ->
  * substr(md5(substr(text, p-15, 16)), 1, 2) = '00')` + per-chunk
  * md5) — CdcSpec pins the equivalence against that exact HOF chain.
  * The HOF chain is interpreted per POSITION (a substring allocation,
  * an md5, a hex compare, each through CodegenFallback lambda calls)
  * and Catalyst inlines it once per reference; this expression runs
  * the window scan in one tight JVM loop with a reused MessageDigest,
  * which took the three cdc_* queries from ~16 s to ~2 s at sf0.1.
  *
  * Boundary scanning is byte-oriented like GearChunks; the synthetic
  * corpus is ASCII so char and byte offsets coincide with the SQL
  * oracle's 1-based char positions.
  */
case class Md5WindowChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", StringType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    Md5WindowChunks.chunks(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5WindowChunks.chunks($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5WindowChunks =
    copy(child = newChild)
}

object Md5WindowChunks {

  private val W = 16
  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def chunks(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new java.util.ArrayList[Any]()
    def emit(from: Int, until: Int): Unit = { // [from, until)
      if (until > from) {
        md.reset()
        md.update(bytes, from, until - from)
        out.add(InternalRow(hex(md.digest()), until - from))
      }
    }
    var chunkStart = 0
    var p = W - 1 // 0-based index of the window's LAST byte
    while (p < n) {
      md.reset()
      md.update(bytes, p - W + 1, W)
      if (md.digest()(0) == 0) {
        emit(chunkStart, p + 1)
        chunkStart = p + 1
      }
      p += 1
    }
    emit(chunkStart, n)
    new GenericArrayData(out.toArray)
  }
}
