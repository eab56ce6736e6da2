package graft

import org.apache.spark.sql.Dataset

import graft.operators.MediaCodecs._
import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageHash, MediaMeta, MediaRecord}

/** Hand-computed aHash + banded Hamming-pair cases. 8×8 source images
  * make each grid cell exactly one pixel, so the expected hash is
  * readable off the fixture.
  */
class AhashSpec extends SparkSpec {
  import spark.implicits._

  /** 8×8 image, all-black except bright (255,255,255) pixels at the
    * given (x, y) positions — each bright pixel's cell mean (255)
    * exceeds the global mean (≤ 255·|bright|/64 < 255), every black
    * cell (0) does not, so the hash bits are exactly the bright cells.
    */
  private def img(id: Long, bright: (Int, Int)*): MediaRecord = {
    val px = new Array[Byte](8 * 8 * 3)
    bright.foreach { case (x, y) =>
      val base = 3 * (y * 8 + x)
      px(base) = 255.toByte; px(base + 1) = 255.toByte; px(base + 2) = 255.toByte
    }
    MediaRecord(id, Ppm.encode(DecodedImage(8, 8, px)), MediaMeta("image", 8, 8, 0, 0))
  }

  private def hashes(rs: MediaRecord*): Dataset[ImageHash] =
    Multimodal.imageAHash(spark.createDataset(rs))

  test("ahash: bit set exactly at each bright pixel's cell, split across halves") {
    val h = hashes(img(1L, (5, 0)), img(2L, (3, 4)), img(3L))
      .collect().map(r => r.media_id -> r).toMap
    // (5,0) → cell 5 → lo bit 5; (3,4) → cell 35 → hi bit 3
    assert(h(1L).hash_lo === 32L && h(1L).hash_hi === 0L)
    assert(h(2L).hash_lo === 0L && h(2L).hash_hi === 8L)
    // all-uniform image: no cell exceeds the global mean → hash 0
    assert(h(3L).hash_lo === 0L && h(3L).hash_hi === 0L)
  }

  test("ahash pairs: lossless ≤3-bit banding keeps close pairs, drops far ones") {
    // a ≡ b (hamming 0), c differs from a in 2 bits (cells 5 vs 7),
    // d has 4 bright cells spread over all four 16-bit bands → hamming
    // 5 vs a (> 3) must NOT appear even though zero-bands still
    // generate the candidate
    val hs = hashes(
      img(1L, (5, 0)), img(2L, (5, 0)), img(3L, (7, 0)),
      img(4L, (0, 0), (0, 2), (0, 4), (0, 6))).toDF()
    val pairs = Multimodal.ahashNearDupPairs(hs, maxHamming = 3)
      .as[(Long, Long, Long)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs === Map((1L, 2L) -> 0L, (1L, 3L) -> 2L, (2L, 3L) -> 2L))
  }

  test("ahash pairs: maxHamming ≥ 4 is rejected (pigeonhole bound)") {
    val hs = hashes(img(1L, (5, 0))).toDF()
    intercept[IllegalArgumentException] {
      Multimodal.ahashNearDupPairs(hs, maxHamming = 4)
    }
  }

  test("banding is lossless for hamming ≤ 3: every planted neighbor is found") {
    // 100 random 64-bit hashes, each with a planted copy flipping 0-3
    // random bits — the pigeonhole guarantee says the 4-band equi-join
    // must surface every planted pair, no exceptions
    val rnd = new scala.util.Random(23)
    val rows = (0 until 100).flatMap { i =>
      var hi = rnd.nextInt().toLong & 0xFFFFFFFFL
      var lo = rnd.nextInt().toLong & 0xFFFFFFFFL
      val base = (i.toLong, hi, lo)
      val flips = rnd.shuffle((0 until 64).toList).take(rnd.nextInt(4))
      flips.foreach { b =>
        if (b < 32) lo ^= 1L << b else hi ^= 1L << (b - 32)
      }
      Seq(base, (i.toLong + 1000L, hi, lo))
    }
    val hs = rows.toDF("media_id", "hash_hi", "hash_lo")
    val found = Multimodal.ahashNearDupPairs(hs, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 100).map(i => (i.toLong, i.toLong + 1000L)).toSet
    val missed = planted -- found
    assert(missed === Set.empty, s"lossless banding missed planted pairs: $missed")
  }

  test("ahash is invariant under non-wrapping brightness shift") {
    // bit = cellSum·3wh > total·cellBytes; a uniform +c on every byte
    // adds c·cellBytes·3wh to both sides (Σ cellBytes = 3wh), so the
    // comparison — and the hash — cannot move unless a byte wraps 256.
    val rnd = new scala.util.Random(7)
    val base = Array.tabulate(20 * 16 * 3)(_ => (rnd.nextInt(100)).toByte)
    val shifted = base.map(b => (b + 50).toByte)
    def rec(id: Long, px: Array[Byte]) =
      MediaRecord(id, Ppm.encode(DecodedImage(20, 16, px)),
        MediaMeta("image", 20, 16, 0, 0))
    val h = hashes(rec(1L, base), rec(2L, shifted)).collect()
      .map(r => r.media_id -> ((r.hash_hi, r.hash_lo))).toMap
    assert(h(1L) === h(2L), s"brightness shift changed the hash: $h")
  }
}
