package graft

import org.apache.spark.sql.Encoders

import graft.operators.MediaCodecs._
import graft.operators.Multimodal

/** ViT-style patch extraction over decoded rasters (the Dataset-level
  * sibling of MultimodalSpec's pure codec tests). */
class PatchSpec extends SparkSpec {

  private val enc = Encoders.product[Multimodal.MediaRecord]

  test("patch grid: full-patch count, exact stats, edge remainders drop") {
    // 20x12 image, formula pixels: byte i = (i + 5) % 256
    val img = DecodedImage(20, 12,
      Array.tabulate(20 * 12 * 3)(i => ((i + 5) % 256).toByte))
    val rec = Multimodal.MediaRecord(5L, Ppm.encode(img),
      Multimodal.MediaMeta("image", 20, 12, 0, 0))
    val out = Multimodal.patchImages(spark.createDataset(Seq(rec))(enc), patch = 8)
      .collect().sortBy(p => (p.py, p.px))
    // 20/8 = 2 full columns (4px remainder drops), 12/8 = 1 full row
    assert(out.map(p => (p.px, p.py)).toSeq === Seq((0, 0), (1, 0)))
    // hand-computed patch (0,0): rows y=0..7, bytes 3*(y*20)..+23
    val expect = (0 until 8).flatMap { y =>
      (0 until 24).map(k => (3 * (y * 20) + k + 5) % 256)
    }
    assert(out.head.sum_bytes === expect.sum.toLong)
    assert(out.head.min_byte === expect.min && out.head.max_byte === expect.max)
    assert(out.forall(_.n_bytes === 192))
  }

  test("audio frames: exact per-frame energy, tail samples drop") {
    // 600 samples: v_k = (k % 7) - 3 -> two full 256-frames, 88-sample tail drops
    val samples = Array.tabulate(600)(k => ((k % 7) - 3).toShort)
    val rec = Multimodal.MediaRecord(3L,
      Wav.encode(DecodedAudio(8000, samples)),
      Multimodal.MediaMeta("audio", 0, 0, 8000, 0))
    val out = Multimodal.audioFrames(spark.createDataset(Seq(rec))(enc), 256)
      .collect().sortBy(_.frame_idx)
    assert(out.map(_.frame_idx).toSeq === Seq(0, 1))
    for (f <- out) {
      val vs = (f.frame_idx * 256 until f.frame_idx * 256 + 256)
        .map(k => ((k % 7) - 3).toLong)
      assert(f.frame_sum === vs.sum && f.frame_sumsq === vs.map(v => v * v).sum)
    }
  }

  test("images smaller than one patch, and non-images, produce no rows") {
    val tiny = DecodedImage(7, 7, Array.tabulate(7 * 7 * 3)(i => i.toByte))
    val recs = Seq(
      Multimodal.MediaRecord(9L, Ppm.encode(tiny),
        Multimodal.MediaMeta("image", 7, 7, 0, 0)),
      Multimodal.MediaRecord(10L,
        Wav.encode(DecodedAudio(8000, Array.tabulate(100)(_.toShort))),
        Multimodal.MediaMeta("audio", 0, 0, 8000, 0)),
      Multimodal.MediaRecord(11L, Array[Byte](1, 2, 3), // malformed
        Multimodal.MediaMeta("image", 0, 0, 0, 0)))
    assert(Multimodal.patchImages(
      spark.createDataset(recs)(enc), patch = 8).count() === 0)
  }
}
