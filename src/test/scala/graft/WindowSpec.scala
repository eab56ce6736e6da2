package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Rolling, Sessionize}

class WindowSpecSuite extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("rolling 5-min frame is left-open like pandas: exact edge excluded") {
    // two events exactly 300 s apart: pandas (t-5min, t] excludes the first
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1L),
      ("a", ts("2024-01-01 00:05:00"), 2L),   // exactly +300 s
      ("a", ts("2024-01-01 00:09:59"), 3L)    // +299 s after the second
    ).toDF("ip", "time", "id")
    val out = Rolling.addRollingFeatures(df, "ip", "time", "id", "id")
      .orderBy("id")
      .select("rolling_5min_request_count").as[Long].collect()
    assert(out.toSeq === Seq(1L, 1L, 2L))
  }

  test("sessionize: 30-min gap starts a new session; id format ip_sN") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1L),
      ("a", ts("2024-01-01 00:29:00"), 2L),   // 29 min — same session
      ("a", ts("2024-01-01 01:00:00"), 3L),   // 31 min gap — new session
      ("b", ts("2024-01-01 00:00:00"), 4L)
    ).toDF("ip", "time", "id")
    val out = Sessionize.sessionize(df, "ip", "time", col("id"))
      .orderBy("id")
      .select("session_id", "new_session").as[(String, Boolean)].collect()
    assert(out.toSeq === Seq(
      ("a_s0", false), ("a_s0", false), ("a_s1", true), ("b_s0", false)))
  }

  test("sessionize: gap of exactly 30 min does NOT start a session (strict >)") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1L),
      ("a", ts("2024-01-01 00:30:00"), 2L)
    ).toDF("ip", "time", "id")
    val out = Sessionize.sessionize(df, "ip", "time", col("id"))
      .orderBy("id").select("session_number").as[Long].collect()
    assert(out.toSeq === Seq(0L, 0L))
  }

  test("rolling avg ignores nulls like pandas mean") {
    val df = Seq(
      ("a", ts("2024-01-01 00:00:00"), Some(2.0), 1L),
      ("a", ts("2024-01-01 00:10:00"), None, 2L),
      ("a", ts("2024-01-01 00:20:00"), Some(4.0), 3L)
    ).toDF("ip", "time", "v", "id")
    val out = Rolling.addRollingFeatures(df, "ip", "time", "id", "v")
      .orderBy("id").select("rolling_1h_avg_processing").as[Option[Double]].collect()
    assert(out.toSeq === Seq(Some(2.0), Some(2.0), Some(3.0)))
  }
}
