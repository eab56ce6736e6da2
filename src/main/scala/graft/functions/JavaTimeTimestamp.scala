package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** Timestamp parse for the lenient forms Spark's post-3.0 pattern
  * dialect cannot express but the reference's `pd.to_datetime`
  * (dateutil) accepts (reference elb_logs.py:86):
  *
  *  - RFC 1123 / HTTP-date: `Tue, 01 Jan 2026 00:00:00 GMT` (also
  *    1-digit days and numeric offsets, per the RFC_1123 formatter) —
  *    Spark rejects `EEE` in parse patterns;
  *  - asctime: `Tue Jan  1 00:00:00 2026` (the double-space day form
  *    normalizes before parsing), treated as UTC wall time like every
  *    other zone-less lenient branch.
  *
  * A compact codegen'd Catalyst expression (one static call), so the
  * 29-field parse projection keeps whole-stage codegen; it sits LAST in
  * [[ElbColumns.parseLenientTime]]'s coalesce, so well-formed ISO rows
  * never reach the exception-based java.time slow path.
  */
case class JavaTimeTimestamp(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    JavaTimeTimestamp.parse(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_p = graft.functions.JavaTimeTimestamp.parse($c);
      if (${ev.value}_p == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_p.longValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): JavaTimeTimestamp =
    copy(child = newChild)
}

object JavaTimeTimestamp {
  import org.apache.spark.sql.GraftBridge

  private val asctimeFmt = java.time.format.DateTimeFormatter
    .ofPattern("EEE MMM d HH:mm:ss yyyy", java.util.Locale.US)

  private def toMicros(i: java.time.Instant): java.lang.Long =
    java.lang.Long.valueOf(i.getEpochSecond * 1000000L + i.getNano / 1000)

  /** Parse or null — never throws (the lenient contract). */
  def parse(s: UTF8String): java.lang.Long = {
    if (s == null) return null
    val str = s.toString.trim
    if (str.isEmpty) return null
    try {
      return toMicros(java.time.ZonedDateTime
        .parse(str, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
        .toInstant)
    } catch { case _: java.time.DateTimeException => }
    try {
      // asctime single-spaces the day field before parsing ("Jan  1")
      return toMicros(java.time.LocalDateTime
        .parse(str.replaceAll(" +", " "), asctimeFmt)
        .toInstant(java.time.ZoneOffset.UTC))
    } catch { case _: java.time.DateTimeException => }
    null
  }

  def java_time_timestamp(c: Column): Column =
    GraftBridge.column(JavaTimeTimestamp(GraftBridge.expression(c)))
}
