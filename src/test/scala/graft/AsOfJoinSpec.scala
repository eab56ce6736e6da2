package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("as-of join: latest right row at or before left time; ties and misses") {
    val left = Seq(
      (1L, "a", ts("2024-01-10 00:00:00")),  // after both right rows → latest wins
      (2L, "a", ts("2024-01-05 00:00:00")),  // exactly equal ts → inclusive match
      (3L, "a", ts("2024-01-01 00:00:00")),  // before all right rows → nulls
      (4L, "b", ts("2024-01-10 00:00:00")),  // tie on right ts → max tiebreak wins
      (5L, "c", ts("2024-01-10 00:00:00"))   // key with no right rows → nulls
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-03 00:00:00"), 100L, 1.0),
      ("a", ts("2024-01-05 00:00:00"), 101L, 2.0),
      ("b", ts("2024-01-02 00:00:00"), 200L, 3.0),
      ("b", ts("2024-01-02 00:00:00"), 201L, 4.0)
    ).toDF("k", "rt", "rid", "v")

    val out = AsOfJoin.asOf(left, right, "k", "t", "rt",
        rightTieBreak = col("rid"), rightValueCols = Seq("rid", "v"))
      .orderBy("id")
      .select($"id", $"rid", $"v")
      .as[(Long, Option[Long], Option[Double])].collect()

    assert(out.toSeq === Seq(
      (1L, Some(101L), Some(2.0)),
      (2L, Some(101L), Some(2.0)),   // ≤ semantics: same-instant row matches
      (3L, None, None),
      (4L, Some(201L), Some(4.0)),   // tie resolved toward larger rid
      (5L, None, None)))
  }

  test("forward as-of: earliest right at or after; ties toward smaller tiebreak") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 00:00:00")),  // before both → earliest wins
      (2L, "a", ts("2024-01-05 00:00:00")),  // exactly equal ts → inclusive match
      (3L, "a", ts("2024-01-10 00:00:00")),  // after all right rows → nulls
      (4L, "b", ts("2024-01-01 00:00:00")),  // right-ts tie → MIN tiebreak wins
      (5L, "c", ts("2024-01-01 00:00:00"))   // no right rows → nulls
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-03 00:00:00"), 100L, 1.0),
      ("a", ts("2024-01-05 00:00:00"), 101L, 2.0),
      ("b", ts("2024-01-02 00:00:00"), 200L, 3.0),
      ("b", ts("2024-01-02 00:00:00"), 201L, 4.0)
    ).toDF("k", "rt", "rid", "v")
    val out = AsOfJoin.asOfForward(left, right, "k", "t", "rt",
        rightTieBreak = col("rid"), rightValueCols = Seq("rid", "v"))
      .orderBy("id").select($"id", $"rid", $"v")
      .as[(Long, Option[Long], Option[Double])].collect()
    assert(out.toSeq === Seq(
      (1L, Some(100L), Some(1.0)),
      (2L, Some(101L), Some(2.0)),   // ≥ semantics: same-instant row matches
      (3L, None, None),
      (4L, Some(200L), Some(3.0)),   // mirror tie rule: smaller rid
      (5L, None, None)))
  }

  test("nearest as-of: closer side wins, exact distance ties go backward") {
    val left = Seq(
      (1L, "a", ts("2024-01-04 00:00:00")),  // 1d to backward, 1d to forward → backward
      (2L, "a", ts("2024-01-04 12:00:00")),  // closer to forward → forward
      (3L, "a", ts("2024-01-01 00:00:00")),  // only forward exists → forward
      (4L, "a", ts("2024-01-09 00:00:00")),  // only backward exists → backward
      (5L, "c", ts("2024-01-01 00:00:00"))   // no rights → nulls
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-03 00:00:00"), 100L, 1.0),
      ("a", ts("2024-01-05 00:00:00"), 101L, 2.0)
    ).toDF("k", "rt", "rid", "v")
    val out = AsOfJoin.asOfNearest(left, right, "k", "t", "rt",
        rightTieBreak = col("rid"), rightValueCols = Seq("rid", "v"))
      .orderBy("id").select($"id", $"rid", $"v")
      .as[(Long, Option[Long], Option[Double])].collect()
    assert(out.toSeq === Seq(
      (1L, Some(100L), Some(1.0)),   // tie → backward
      (2L, Some(101L), Some(2.0)),
      (3L, Some(100L), Some(1.0)),
      (4L, Some(101L), Some(2.0)),
      (5L, None, None)))
  }

  test("as-of join preserves left row count (1:≤1)") {
    val sf = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts")
    val ord = Tables.orders(spark, sf).withColumnRenamed("o_custkey", "user_id")
    val out = AsOfJoin.asOf(ev, ord, "user_id", "ts", "o_orderdate",
      col("o_orderkey"), Seq("o_orderkey", "o_totalprice"))
    assert(out.count() === ev.count())
  }
}
