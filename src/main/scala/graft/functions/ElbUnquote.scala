package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** shlex-style quote strip as a compact codegen'd expression.
  *
  * The builtin formulations each sank the parse stage: a
  * `regexp_replace` per field and a 6-reference when/substr both grew
  * the collapsed 29-field projection past Janino's 64 KB method limit
  * (→ interpreted fallback), and an array-level `transform` is
  * CodegenFallback by construction. This expression evaluates its child
  * once and emits a single static call, so 29 of them stay well inside
  * one whole-stage-codegen method.
  */
case class ElbUnquote(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    ElbUnquote.strip(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ElbUnquote.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): ElbUnquote =
    copy(child = newChild)
}

object ElbUnquote {
  import org.apache.spark.sql.GraftBridge

  /** Strip one layer of surrounding double quotes (ASCII, so byte-level
    * checks are safe in UTF-8).
    */
  def strip(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    if (n >= 2 && s.getByte(0) == '"' && s.getByte(n - 1) == '"')
      s.substring(1, s.numChars() - 1)   // quote check by byte, strip by char
    else s
  }

  def elb_unquote(c: Column): Column =
    GraftBridge.column(ElbUnquote(GraftBridge.expression(c)))
}
