package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaCodecs
import graft.operators.MediaCodecs._
import graft.operators.Multimodal

/** Codec-level tests for the pure-JVM media decoders: golden bytes,
  * header-grammar corners, round trips, malformed-input totality. The
  * distributed path is covered by the `multimodal_*` oracle queries and
  * the StreamingSpec plumbing test.
  */
class MultimodalSpec extends AnyFunSuite {

  // ---- PPM ------------------------------------------------------------

  test("ppm golden decode: hand-written 2x1 image") {
    // header "P6\n2 1\n255\n" then pixels (1,2,3)(250,251,252)
    val bytes = "P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 250.toByte, 251.toByte, 252.toByte)
    val img = Ppm.decode(bytes).toOption.get
    assert(img.width === 2 && img.height === 1)
    assert(img.pixels.map(_ & 0xff).toSeq === Seq(1, 2, 3, 250, 251, 252))
  }

  test("ppm header grammar: comments and arbitrary whitespace parse") {
    val bytes = "P6 # comment\n# another comment\n 2\t1 # dims\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    val img = Ppm.decode(bytes).toOption.get
    assert(img.width === 2 && img.height === 1)
    assert(img.pixels.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6))
  }

  test("ppm encode/decode round trip preserves every pixel") {
    val px = Array.tabulate(5 * 4 * 3)(i => ((i * 37 + 11) % 256).toByte)
    val round = Ppm.decode(Ppm.encode(DecodedImage(5, 4, px))).toOption.get
    assert(round.width === 5 && round.height === 4)
    assert(round.pixels.toSeq === px.toSeq)
  }

  test("ppm malformed inputs return Left, never throw") {
    assert(Ppm.decode("P5\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](0)).isLeft) // wrong magic
    assert(Ppm.decode("P6\n2 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](0)).isLeft) // truncated raster
    assert(Ppm.decode("P6\n-2 1\n255\n".getBytes("US-ASCII")).isLeft)      // negative dim
    assert(Ppm.decode("P6\n2 1\n65535\n".getBytes("US-ASCII")).isLeft)     // 16-bit maxval
    assert(Ppm.decode(Array[Byte]()).isLeft)
  }

  test("nearest-neighbor resize: floor mapping, up and down") {
    // 2x2 distinct-color image; downscale to 1x1 keeps top-left
    val px = Array[Byte](10, 11, 12, 20, 21, 22, 30, 31, 32, 40, 41, 42)
    val img = DecodedImage(2, 2, px)
    assert(MediaCodecs.resizeNearest(img, 1, 1).pixels.toSeq === Seq[Byte](10, 11, 12))
    // upscale to 4x4 replicates each source pixel into a 2x2 block
    val up = MediaCodecs.resizeNearest(img, 4, 4)
    assert(up.width === 4 && up.height === 4)
    val p = up.pixels
    def rgb(x: Int, y: Int) = Seq(p((y * 4 + x) * 3), p((y * 4 + x) * 3 + 1), p((y * 4 + x) * 3 + 2))
    assert(rgb(0, 0) === Seq[Byte](10, 11, 12) && rgb(1, 1) === Seq[Byte](10, 11, 12))
    assert(rgb(2, 0) === Seq[Byte](20, 21, 22))
    assert(rgb(0, 2) === Seq[Byte](30, 31, 32))
    assert(rgb(3, 3) === Seq[Byte](40, 41, 42))
  }

  // ---- WAV ------------------------------------------------------------

  test("wav golden decode: byte-level header layout is real RIFF") {
    val bytes = Wav.encode(DecodedAudio(8000, Array[Short](0, 1000, -1000)))
    // canonical 44-byte header + 6 data bytes
    assert(bytes.length === 50)
    assert(new String(bytes.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") === "WAVE")
    assert(new String(bytes.slice(12, 16), "US-ASCII") === "fmt ")
    assert(new String(bytes.slice(36, 40), "US-ASCII") === "data")
    // LE int32 sample rate at offset 24
    assert((bytes(24) & 0xff) + ((bytes(25) & 0xff) << 8) === 8000)
    // LE int16 samples: 1000 = 0xE8 0x03, -1000 = 0x18 0xFC
    assert((bytes(46) & 0xff, bytes(47) & 0xff) === (0xe8, 0x03))
    assert((bytes(48) & 0xff, bytes(49) & 0xff) === (0x18, 0xfc))
    val audio = Wav.decode(bytes).toOption.get
    assert(audio.sampleRate === 8000)
    assert(audio.samples.toSeq === Seq[Short](0, 1000, -1000))
  }

  test("wav decode tolerates unknown chunks between fmt and data") {
    val base = Wav.encode(DecodedAudio(16000, Array[Short](7, -7)))
    // splice a LIST chunk (odd size → padded) after fmt (offset 36)
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 65, 66, 67, 0)
    val spliced = base.slice(0, 36) ++ junk ++ base.slice(36, base.length)
    val audio = Wav.decode(spliced).toOption.get
    assert(audio.sampleRate === 16000)
    assert(audio.samples.toSeq === Seq[Short](7, -7))
  }

  test("wav malformed inputs return Left, never throw") {
    val good = Wav.encode(DecodedAudio(8000, Array[Short](1, 2)))
    assert(Wav.decode(good.slice(0, 20)).isLeft)              // truncated
    assert(Wav.decode("RIFFxxxxAIFF".getBytes("US-ASCII")).isLeft) // not WAVE
    val nonPcm = good.clone; nonPcm(20) = 3                   // IEEE float format tag
    assert(Wav.decode(nonPcm).isLeft)
    val stereo = good.clone; stereo(22) = 2                   // 2 channels
    assert(Wav.decode(stereo).isLeft)
    assert(Wav.decode(Array[Byte]()).isLeft)
  }

  // ---- Int-overflow totality (round-5 advice) -------------------------

  test("ppm overflow header (32768x32768) returns Left, never throws") {
    // w*h*3 = 3.2e9 overflows Int; the truncation check must use Long
    val bytes = "P6\n32768 32768\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    assert(Ppm.decode(bytes).isLeft)
    val wide = "P6\n32768 22370\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2, 3)
    assert(Ppm.decode(wide).isLeft) // w*h*3 just past Int.MaxValue
  }

  test("wav chunk size near Int.MaxValue returns Left, never throws") {
    // header + a chunk declaring size 0x7ffffff0: pos+8+size wraps in Int
    val buf = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(16).put("WAVE".getBytes("US-ASCII"))
    buf.put("data".getBytes("US-ASCII")).putInt(0x7ffffff0)
    buf.putInt(0)
    assert(Wav.decode(buf.array()).isLeft)
    // same wrap on a skippable unknown chunk must also be caught
    val buf2 = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf2.put("RIFF".getBytes("US-ASCII")).putInt(16).put("WAVE".getBytes("US-ASCII"))
    buf2.put("LIST".getBytes("US-ASCII")).putInt(Int.MaxValue - 4)
    buf2.putInt(0)
    assert(Wav.decode(buf2.array()).isLeft)
  }

  // ---- FRM0 -----------------------------------------------------------

  test("frm0 round trip and frame slicing") {
    val data = Array.tabulate(2 * 3 * 4)(i => i.toByte) // 4 frames of 2x3
    val fc = Frm0.decode(Frm0.encode(DecodedFrames(2, 3, 4, data))).toOption.get
    assert(fc.width === 2 && fc.height === 3 && fc.nFrames === 4)
    assert(Frm0.frame(fc, 0).toSeq === (0 until 6).map(_.toByte))
    assert(Frm0.frame(fc, 3).toSeq === (18 until 24).map(_.toByte))
    intercept[IllegalArgumentException](Frm0.frame(fc, 4))
  }

  test("frm0 malformed inputs return Left, never throw") {
    val good = Frm0.encode(DecodedFrames(2, 2, 1, new Array[Byte](4)))
    assert(Frm0.decode(good.slice(0, 17)).isLeft)   // truncated frames
    assert(Frm0.decode("FRM1".getBytes("US-ASCII") ++ good.drop(4)).isLeft)
    assert(Frm0.decode(Array[Byte]()).isLeft)
  }

  // ---- dispatch + synthesis ------------------------------------------

  test("sniff dispatches by magic and rejects garbage") {
    assert(MediaCodecs.sniff(Multimodal.synthesizePayload(0L)._1) === Some("image"))
    assert(MediaCodecs.sniff(Multimodal.synthesizePayload(1L)._1) === Some("audio"))
    assert(MediaCodecs.sniff(Multimodal.synthesizePayload(2L)._1) === Some("video"))
    assert(MediaCodecs.sniff("hello world".getBytes("US-ASCII")) === None)
    assert(MediaCodecs.decode("hello world".getBytes("US-ASCII")).isLeft)
  }

  test("synthesized payloads are valid files whose decoded stats match direct simulation") {
    for (id <- 0L until 45L) {
      val (payload, meta) = Multimodal.synthesizePayload(id)
      MediaCodecs.decode(payload).toOption.get match {
        case DecodedImage(w, h, px) =>
          assert(meta.media_type === "image")
          assert(w === 16 + (id % 8) * 4 && h === 12 + (id % 5) * 4)
          px.zipWithIndex.foreach { case (b, i) =>
            assert((b & 0xff) === ((i + id) % 256).toInt, s"pixel $i of id $id")
          }
        case DecodedAudio(rate, samples) =>
          assert(meta.media_type === "audio")
          assert(rate === 8000 + (id % 3) * 4000)
          assert(samples.length === 500 + id % 300)
          samples.zipWithIndex.foreach { case (s, k) =>
            assert(s.toInt === ((k + id) % 2001 - 1000).toInt, s"sample $k of id $id")
          }
        case DecodedFrames(w, h, nf, data) =>
          assert(meta.media_type === "video")
          assert(w === 16 && h === 12 && nf === 4 + id % 12)
          data.zipWithIndex.foreach { case (b, j) =>
            assert((b & 0xff) === ((j + id) % 256).toInt, s"byte $j of id $id")
          }
      }
    }
  }

  test("imageio png: real-format round trip is lossless and matches " +
      "the synthesis formula exactly") {
    Seq(0L, 5L, 11L, 23L).foreach { id =>
      val png = Multimodal.encodeImageIo(id, "png")
      // real PNG magic
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' &&
        png(3) == 'G', s"not a PNG for id=$id")
      val w = (16 + id % 8 * 4).toInt; val h = (12 + id % 5 * 4).toInt
      val n = w * h * 3
      var expSum = 0L; var expMn = 255; var expMx = 0
      var i = 0
      while (i < n) {
        val v = ((i + id) % 256).toInt
        expSum += v; if (v < expMn) expMn = v; if (v > expMx) expMx = v
        i += 1
      }
      assert(Multimodal.imageIoStats(png) ===
        Some((w, h, expSum, expMn, expMx)), s"png stats for id=$id")
    }
  }

  test("imageio jpeg: real lossy decode preserves dims and stays near " +
      "the source raster") {
    Seq(1L, 7L, 19L).foreach { id =>
      val jpg = Multimodal.encodeImageIo(id, "jpg")
      assert((jpg(0) & 0xff) == 0xff && (jpg(1) & 0xff) == 0xd8,
        s"not a JPEG for id=$id")
      val w = (16 + id % 8 * 4).toInt; val h = (12 + id % 5 * 4).toInt
      val n = w * h * 3
      val Some((gw, gh, gSum, _, _)) = Multimodal.imageIoStats(jpg)
      assert((gw, gh) === ((w, h)))
      var expSum = 0L
      var i = 0
      while (i < n) { expSum += ((i + id) % 256).toInt; i += 1 }
      // lossy but DC-preserving: mean per-byte drift bounded
      assert(math.abs(gSum - expSum).toDouble / n < 8.0,
        s"jpeg mean drift too large for id=$id: $gSum vs $expSum")
      // per-JVM determinism (the premise of the committed golden)
      assert(Multimodal.imageIoStats(Multimodal.encodeImageIo(id, "jpg"))
        === Multimodal.imageIoStats(jpg))
    }
  }

  test("golden checksums: payload md5s are stable across builds") {
    def md5(b: Array[Byte]) = java.security.MessageDigest.getInstance("MD5")
      .digest(b).map("%02x".format(_)).mkString
    // pin the exact bytes (any synthesis or encoder drift breaks these)
    assert(md5(Multimodal.synthesizePayload(0L)._1) ===
      md5(Ppm.encode(DecodedImage(16, 12,
        Array.tabulate(16 * 12 * 3)(i => (i % 256).toByte)))))
    assert(md5(Multimodal.synthesizePayload(1L)._1) ===
      md5(Wav.encode(DecodedAudio(12000,
        Array.tabulate(501)(k => ((k + 1) % 2001 - 1000).toShort)))))
    assert(md5(Multimodal.synthesizePayload(2L)._1) ===
      md5(Frm0.encode(DecodedFrames(16, 12, 6,
        Array.tabulate(16 * 12 * 6)(j => ((j + 2) % 256).toByte)))))
  }

}
