package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Multimodal
import graft.streaming.StreamingPipeline

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState sessionizer emits exact batch-format session ids") {
    val events = StreamingPipeline.readEvents(spark, "/root/testdata/sf0.001")
    val sessions = StreamingPipeline.sessionIds(events)
    val q = sessions.writeStream.format("memory").queryName("fmgws_sessions")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("fmgws_sessions")

    // must agree with the batch sessionizer on every row
    val batch = graft.operators.Sessionize.sessionize(
        Tables.events(spark, "/root/testdata/sf0.001"),
        keyCol = "user_id", timeCol = "ts", tieBreak = col("event_id"))
      .select($"event_id", $"session_id".as("batch_sid"))
    val joined = got.join(batch, "event_id")
    assert(joined.count() === 1000)
    assert(joined.where($"session_id" =!= $"batch_sid").count() === 0)
  }

  test("flatMapGroupsWithState rolling features match the batch window operator") {
    val events = StreamingPipeline.readEvents(spark, "/root/testdata/sf0.001")
    val rolled = StreamingPipeline.rollingFeatures(events)
    val q = rolled.writeStream.format("memory").queryName("fmgws_rolling")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("fmgws_rolling")
      .select($"event_id", $"rolling_5min_count", $"rolling_1h_avg")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)

    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val w5 = graft.operators.Rolling.trailing(col("user_id"), col("ts"),
      graft.operators.Rolling.FiveMinutes)
    val w1 = graft.operators.Rolling.trailing(col("user_id"), col("ts"),
      graft.operators.Rolling.OneHour)
    val batch = e
      .withColumn("c5", count(col("event_id")).over(w5))
      .withColumn("a1", avg(col("value")).over(w1))
      .select($"event_id", $"c5", $"a1")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)

    assert(got.length === batch.length)
    got.zip(batch).foreach { case ((ge, gc, ga), (be, bc, ba)) =>
      assert(ge === be)
      assert(gc === bc, s"count mismatch at event $ge")
      (ga, ba) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-9, s"avg at $ge")
        case (a, b) => assert(a === b)
      }
    }
  }

  test("exactly-30:00 gap: session_window, sessionIds, and batch all keep one session") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gap").toFile
    val t0 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    val t1 = java.sql.Timestamp.valueOf("2025-01-01 00:30:00") // gap == timeout
    val dataDir = new java.io.File(dir, "events").toString
    Seq((1L, t0, 7L, "click", 1.0, ""), (2L, t1, 7L, "click", 2.0, ""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(dataDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    def stream = spark.readStream.schema(schema).parquet(dataDir)

    // Session windows MERGE when they touch: event at start+gap extends
    // the session, so == gap stays together — the batch > rule.
    val windowed = StreamingPipeline.runToMemory(
      StreamingPipeline.sessionAgg(stream), "gap_windowed")
    assert(windowed.count() === 1, "session_window: ==-gap events merge")
    assert(windowed.select("n_events").head().getLong(0) === 2)

    val exact = StreamingPipeline.runToMemory(
      StreamingPipeline.sessionIds(stream).toDF(), "gap_exact", OutputMode.Append())
    assert(exact.select("session_id").distinct().count() === 1,
      "sessionIds: strictly-> gap keeps one session, matching batch")

    val batch = graft.operators.Sessionize.sessionize(
      Seq((1L, t0, 7L), (2L, t1, 7L)).toDF("event_id", "ts", "user_id"),
      keyCol = "user_id", timeCol = "ts", tieBreak = col("event_id"))
    assert(batch.select("session_id").distinct().count() === 1)
  }

  test("watermark drops late events across checkpoint-recovered runs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-late").toFile
    val data = new java.io.File(dir, "events").toString
    val ckpt = new java.io.File(dir, "ckpt").toString
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    def writeBatch(name: String, rows: Seq[java.sql.Timestamp]): Unit =
      rows.map(Tuple1(_)).toDF("ts")
        .coalesce(1).write.parquet(s"$data/$name")

    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    // Update mode: the one output mode where the watermark's late-row
    // filter applies and per-batch updates are observable (Complete
    // retains all data by definition and never drops late rows; Append
    // would emit nothing here — no window finalizes before the backlog
    // ends). Each AvailableNow run shares the checkpoint, so run 2
    // restores the watermark run 1 advanced — also pinning recovery.
    // foreachBatch, not the memory sink: only recoverable sinks may
    // resume from an existing checkpoint
    val got = scala.collection.mutable.ArrayBuffer.empty[(java.sql.Timestamp, Long)]
    def runOnce(): Seq[(java.sql.Timestamp, Long)] = {
      got.clear()
      val q = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(data)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour")).count()
        .select(col("window.start").as("h"), col("count"))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          got.synchronized {
            got ++= b.collect().map(r => (r.getTimestamp(0), r.getLong(1)))
          }
          () // foreachBatch wants Unit, not the buffer
        }
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Update())
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      got.toSeq
    }

    // run 1 advances the watermark to 11:20 − 10 min = 11:10. A late
    // row is dropped only when its WINDOW END ≤ watermark, so the late
    // probe below sits in [09:00, 10:00) — fully expired — while the
    // 11:00 window (end 12:00) is still open.
    writeBatch("b1", Seq(t("2025-01-01 11:00:00"),
      t("2025-01-01 11:05:00"), t("2025-01-01 11:20:00")))
    assert(runOnce() === Seq((t("2025-01-01 11:00:00"), 3L)))

    // run 2: one event in an expired window (dropped), one on time
    writeBatch("b2", Seq(t("2025-01-01 09:30:00"), t("2025-01-01 11:30:00")))
    val second = runOnce()
    assert(!second.exists(_._1 == t("2025-01-01 09:00:00")),
      "the expired-window event must be dropped, not emit a 09:00 window")
    assert(second === Seq((t("2025-01-01 11:00:00"), 4L)))
  }

  test("multimodal plumbing: synthesized payloads decode end-to-end through the engine") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.synthesizeMedia(docs, "doc_id")
    val feats = Multimodal.decodeFeatures(media)
    // no payload fails to decode: one feature row per document
    assert(feats.count() === 500)
    // byte_len matches the physical payload length for every row
    val joined = feats.toDF().join(
      media.toDF().select(col("media_id"), length(col("payload")).as("plen")),
      "media_id")
    assert(joined.where(col("byte_len") =!= col("plen")).count() === 0)
    // checksum is the engine's own md5 of the same bytes
    assert(joined.count() === 500)
    val m = media.first()
    assert(Set("image", "audio", "video").contains(m.meta.media_type))
  }
}
