package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader drift-handling: `Tables.events` must normalize every `ts`
  * encoding the driver fixtures have shipped — INT64-nanos (rounds ≤6)
  * and parquet timestamp[us] (round 7+) — to the same TimestampType
  * instants, and fail LOUDLY on anything else. The µs path is
  * exercised by every fixture-reading suite; the legacy nanos path and
  * the error path live only here.
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column): Unit =
    Seq((1L, 1755043200123456789L, 7L, "view", 1.5, "{}"))
      .toDF("event_id", "_rawts", "user_id", "event_type", "value", "props")
      .select(col("event_id"), tsCol.as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/events.parquet")

  test("events: legacy INT64-nanos fixtures truncate ns -> us like DuckDB") {
    val dir = Files.createTempDirectory("graft-nanos").toString
    writeEvents(dir, col("_rawts")) // plain long column = the nanosAsLong shape
    val got = Tables.events(spark, dir).select("ts").head().getTimestamp(0)
    // 1755043200123456789 ns DIV 1000 = 1755043200123456 us
    assert(got.getTime === 1755043200123L)      // ms precision
    assert(got.getNanos === 123456000)          // us precision kept, ns dropped
    assert(Tables.events(spark, dir).schema("ts").dataType === TimestampType)
  }

  test("events: timestamp[us] fixtures load as the same instants (UTC identity)") {
    val dir = Files.createTempDirectory("graft-micros").toString
    writeEvents(dir, timestamp_micros(expr("_rawts DIV 1000")).cast(TimestampNTZType))
    val got = Tables.events(spark, dir).select("ts").head().getTimestamp(0)
    assert(got.getTime === 1755043200123L && got.getNanos === 123456000)
    assert(Tables.events(spark, dir).schema("ts").dataType === TimestampType)
  }

  test("events: an unexpected ts encoding fails with one clear error") {
    val dir = Files.createTempDirectory("graft-drift").toString
    writeEvents(dir, col("_rawts").cast("string"))
    val e = intercept[IllegalStateException] { Tables.events(spark, dir) }
    assert(e.getMessage.contains("fixture drift"))
  }

  test("load: a missing column fails with the drift message, not a resolution error") {
    val dir = Files.createTempDirectory("graft-cols").toString
    Seq((1L, 2L)).toDF("event_id", "user_id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException] { Tables.load(spark, dir, "events") }
    assert(e.getMessage.contains("missing columns"))
  }
}
