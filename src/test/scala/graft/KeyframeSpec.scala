package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Distributed-path pin for the keyframe query: replay the selection
  * rule driver-side from the full frame table and require set equality
  * with the registered query's output.
  */
class KeyframeSpec extends SparkSpec {

  test("keyframe selection: top-2 inter-frame deltas, frame 0 never a candidate") {
    val sf = "/root/testdata/sf0.001"
    val media = Multimodal.synthesizeMedia(
      Tables.distributed(spark, sf, "documents"), "doc_id")
    val frames = Multimodal.sampleFrames(media, everyN = 1)
      .collect().groupBy(_.media_id)
    val expected = frames.flatMap { case (m, fs) =>
      val sorted = fs.sortBy(_.frame_idx)
      val deltas = sorted.sliding(2).collect {
        case Array(a, b) => (b.frame_idx, math.abs(b.frame_sum - a.frame_sum))
      }.toSeq
      deltas.sortBy { case (idx, d) => (-d, idx) }.take(2)
        .zipWithIndex.map { case ((idx, d), r) => (m, idx, d, r + 1L) }
    }.toSet
    val got = graft.queries.MiscQueries.multimodalKeyframes(spark, sf)
      .select(col("media_id"), col("frame_idx"), col("delta_abs"),
        col("key_rank"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == expected, s"diff: ${got diff expected} / ${expected diff got}")
    assert(got.forall(_._2 > 0), "frame 0 must never be selected")
    assert(got.groupBy(_._1).forall(_._2.size == 2), "exactly 2 per media")
  }
}
