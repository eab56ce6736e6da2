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

  test("multimodal plumbing: payload bytes survive the round trip; stub decode is deterministic") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.attachPayload(docs, "doc_id", "text")
    val feats = Multimodal.decodeFeatures(media)
    val joined = feats.toDF().join(docs, col("media_id") === col("doc_id"))
    assert(joined.count() === 500)
    // byte length equals character length for this ASCII corpus
    assert(joined.where(col("byte_len") =!= length(col("text"))).count() === 0)
    // checksum matches Spark's own md5 of the same bytes
    assert(joined.where(col("checksum") =!= md5(col("text").cast("binary"))).count() === 0)
    // metadata struct is typed and present
    val m = media.first()
    assert(Set("image", "audio", "video").contains(m.meta.media_type))
  }
}
