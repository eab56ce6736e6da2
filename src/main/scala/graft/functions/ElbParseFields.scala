package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass ELB line tokenizer: quote-aware scan → exactly
  * [[graft.ElbSchema.columns.size]] quote-stripped fields, or null when
  * the line is short (the arity drop, reference elb_logs.py:77-78).
  *
  * Token grammar matches the reference's `shlex.split` surface: a
  * double-quoted run or a maximal non-whitespace run (space, tab, CR,
  * LF, FF, VT all delimit, like `\S+`), and an UNTERMINATED quote nulls
  * the whole line — shlex raises there and the reference drops the row
  * (elb_logs.py:130-132). This is stricter than the declarative
  * `elbTokenize` regex, which keeps an unterminated quote as a plain
  * run. Scanning is byte-level — quotes and whitespace are ASCII, so
  * UTF-8 continuation bytes can never false-match.
  *
  * Why an expression instead of builtins: the 29-field projection
  * references the token array 29 times; once the collapsed projection
  * outgrew Janino's 64 KB method limit, codegen fell back to
  * interpretation, which re-evaluated the tokenizing regex once PER
  * FIELD. This expression generates one static call — the whole parse
  * stage stays in codegen and common-subexpression elimination runs the
  * scan once per row.
  */
case class ElbParseFields(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ElbParseFields.parse(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
            |${childGen.code}
            |boolean ${ev.isNull} = true;
            |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
            |if (!${childGen.isNull}) {
            |  ${ev.value} = graft.functions.ElbParseFields.parse(${childGen.value});
            |  ${ev.isNull} = ${ev.value} == null;
            |}
          """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ElbParseFields =
    copy(child = newChild)
}

object ElbParseFields {
  import org.apache.spark.sql.GraftBridge

  private val NumFields = graft.ElbSchema.columns.size

  // exactly Python shlex's default whitespace set (' \t\r\n'): \f and \v
  // are NOT delimiters there, so a line containing them must tokenize
  // the same way the reference does (they stay inside the token)
  @inline private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\r' || b == '\n'

  /** Scan a line into the first [[NumFields]] tokens, quote-stripped;
    * null if fewer tokens exist or a quote never closes (shlex raises on
    * an unterminated quote; the reference drops such rows).
    */
  def parse(line: UTF8String): ArrayData = {
    val bytes = line.getBytes  // materialized copy; lines are short
    val n = bytes.length
    val out = new Array[AnyRef](NumFields)
    var count = 0
    var i = 0
    while (i < n && count < NumFields) {
      while (i < n && isSpace(bytes(i))) i += 1
      if (i < n) {
        var start = i
        var end = -1
        if (bytes(i) == '"') {
          var j = i + 1
          while (j < n && bytes(j) != '"') j += 1
          if (j >= n) return null // unterminated quote: drop the line
          start = i + 1; end = j; i = j + 1
        }
        if (end < 0) {            // plain run
          var j = start
          while (j < n && !isSpace(bytes(j))) j += 1
          end = j; i = j
        }
        out(count) = UTF8String.fromBytes(bytes, start, end - start)
        count += 1
      }
    }
    if (count < NumFields) null else new GenericArrayData(out)
  }

  def elb_parse_fields(c: Column): Column =
    GraftBridge.column(ElbParseFields(GraftBridge.expression(c)))
}
