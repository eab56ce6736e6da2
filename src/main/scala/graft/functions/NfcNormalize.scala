package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd scalar expression.
  *
  * Spark ships no Unicode-normalize builtin (collation support in 4.x
  * compares normalized forms but never rewrites the bytes), and a Scala
  * UDF here would pay ser/de per row AND break whole-stage codegen for
  * the rest of the normalize projection. This expression emits one
  * static call, so it composes with `lower`/`regexp_replace` inside a
  * single generated method.
  *
  * Fast path: a string whose UTF-8 byte count equals its codepoint
  * count is pure ASCII, and NFC is the identity on ASCII — return the
  * input `UTF8String` untouched (no java.lang.String materialization).
  * Real corpora are overwhelmingly ASCII-dominant, so the expensive
  * decode→normalize→encode round-trip runs only on rows that can
  * actually change; `Normalizer.isNormalized` catches the
  * already-composed non-ASCII remainder without allocating the
  * normalized copy.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  // fail at ANALYSIS, not as a mid-job ClassCastException (the
  // ExpectsInputTypes trait's AbstractDataType is private[sql], so the
  // check is spelled out)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize needs a string column, got ${child.dataType}")

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    NfcNormalize.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import org.apache.spark.sql.GraftBridge

  def nfc(s: UTF8String): UTF8String = {
    // ASCII ⇔ one byte per codepoint; NFC(ASCII) = ASCII.
    if (s.numBytes() == s.numChars()) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column API: `nfc_normalize(col)`. */
  def nfc_normalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))
}
