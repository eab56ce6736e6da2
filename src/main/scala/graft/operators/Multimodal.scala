package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

import MediaCodecs._

/** Multimodal-column operators: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run partition-wise
  * over those bytes with REAL pure-JVM codecs ([[MediaCodecs]]: binary
  * PPM images, RIFF/WAV 16-bit PCM audio, FRM0 concatenated-frame
  * video). Every operator parses the actual bytes — magic sniffing,
  * header grammar, sample/pixel walks — and never trusts the metadata
  * column.
  *
  * Distributed shape (the part that matters at 100 TB): all three
  * operators are `mapPartitions` over the payload column — no shuffle,
  * no driver collect, per-partition (not per-row) codec setup, rows
  * streaming through without materializing a partition. Decode failures
  * DROP with a counter-friendly row shape rather than throw (the ELB
  * parser's malformed-line discipline, reference elb_logs.py:120-141,
  * applied to bytes).
  *
  * Test data: payloads are synthesized as VALID files of each format
  * from integer formulas of the row id ([[synthesizeMedia]]), so the
  * DuckDB oracle can recompute every decoded statistic in closed form —
  * a header-parse or byte-walk bug diverges from the oracle hash.
  */
object Multimodal {

  /** Typed metadata carried beside the payload — advisory only; the
    * decoders re-derive every field from the bytes.
    */
  case class MediaMeta(media_type: String, width: Int, height: Int,
      sample_rate: Int, n_frames: Int)

  case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  // ---- deterministic synthesis (test-data generator) -----------------

  /** Valid-payload synthesis from a row id. Formulas are mirrored by
    * the DuckDB oracle in closed form; see MiscQueries.oracle.
    *  - id % 3 == 0 → PPM image, w = 16+(id%8)·4, h = 12+(id%5)·4,
    *    pixel byte i = (i + id) % 256
    *  - id % 3 == 1 → WAV mono 16-bit, rate = 8000+(id%3)·4000,
    *    n = 500 + id%300 samples, sample k = ((k + id) % 2001) − 1000
    *  - id % 3 == 2 → FRM0 16×12 grayscale, 4 + id%12 frames,
    *    global byte j = (j + id) % 256
    */
  def synthesizePayload(id: Long): (Array[Byte], MediaMeta) = (id % 3) match {
    case 0 =>
      val w = (16 + id % 8 * 4).toInt; val h = (12 + id % 5 * 4).toInt
      val px = new Array[Byte](w * h * 3)
      var i = 0
      while (i < px.length) { px(i) = ((i + id) % 256).toByte; i += 1 }
      (Ppm.encode(DecodedImage(w, h, px)), MediaMeta("image", w, h, 0, 0))
    case 1 =>
      val rate = (8000 + id % 3 * 4000).toInt
      val n = (500 + id % 300).toInt
      val samples = new Array[Short](n)
      var k = 0
      while (k < n) { samples(k) = (((k + id) % 2001) - 1000).toShort; k += 1 }
      (Wav.encode(DecodedAudio(rate, samples)), MediaMeta("audio", 0, 0, rate, 0))
    case _ =>
      val w = 16; val h = 12
      val nf = (4 + id % 12).toInt
      val data = new Array[Byte](w * h * nf)
      var j = 0
      while (j < data.length) { data(j) = ((j + id) % 256).toByte; j += 1 }
      (Frm0.encode(DecodedFrames(w, h, nf, data)), MediaMeta("video", w, h, 0, nf))
  }

  /** Attach a synthesized valid media payload to each row of `df` —
    * the test-data stand-in for reading real media files; everything
    * downstream treats the column as opaque bytes.
    */
  def synthesizeMedia(df: DataFrame, idCol: String): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val (payload, meta) = synthesizePayload(id)
        MediaRecord(id, payload, meta)
      }
    }
  }

  // ---- decode + feature extraction -----------------------------------

  /** Unified per-media features, all derived from DECODED bytes. Fields
    * that don't apply to a media type are None; `checksum` is the
    * payload md5 (golden-tested; the SQL oracle can't synthesize binary
    * so the driver query projects it away).
    */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      width: Option[Int], height: Option[Int],
      px_sum: Option[Long], px_min: Option[Int], px_max: Option[Int],
      sample_rate: Option[Int], n_samples: Option[Long],
      audio_sum: Option[Long], audio_sumsq: Option[Long],
      n_frames: Option[Int],
      checksum: String)

  private def md5hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(bytes).map("%02x".format(_)).mkString
  }

  private def byteStats(bytes: Array[Byte]): (Long, Int, Int) = {
    var sum = 0L; var mn = 255; var mx = 0
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sum += v
      if (v < mn) mn = v
      if (v > mx) mx = v
      i += 1
    }
    (sum, mn, mx)
  }

  /** Partition-wise decode + feature extraction (the `mapInPandas`
    * batch-UDF shape, in typed Scala). Undecodable payloads are
    * dropped, never thrown.
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    ds.mapPartitions { it =>
      it.flatMap { r =>
        MediaCodecs.decode(r.payload).toOption.map {
          case DecodedImage(w, h, px) =>
            val (s, mn, mx) = byteStats(px)
            MediaFeatures(r.media_id, "image", r.payload.length.toLong,
              Some(w), Some(h), Some(s), Some(mn), Some(mx),
              None, None, None, None, None, md5hex(r.payload))
          case DecodedAudio(rate, samples) =>
            var s = 0L; var s2 = 0L
            var i = 0
            while (i < samples.length) {
              val v = samples(i).toLong; s += v; s2 += v * v; i += 1
            }
            MediaFeatures(r.media_id, "audio", r.payload.length.toLong,
              None, None, None, None, None,
              Some(rate), Some(samples.length.toLong), Some(s), Some(s2),
              None, md5hex(r.payload))
          case DecodedFrames(w, h, nf, data) =>
            val (s, mn, mx) = byteStats(data)
            MediaFeatures(r.media_id, "video", r.payload.length.toLong,
              Some(w), Some(h), Some(s), Some(mn), Some(mx),
              None, None, None, None, Some(nf), md5hex(r.payload))
        }
      }
    }
  }

  // ---- image resize ---------------------------------------------------

  case class ResizedImage(media_id: Long, src_w: Int, src_h: Int,
      out_w: Int, out_h: Int, px_sum: Long, px_min: Int, px_max: Int,
      out_md5: String)

  /** Real nearest-neighbor resize over decoded rasters: decode PPM →
    * resample → stats + checksum of the re-encoded output. 1:1
    * partition-wise; non-image or malformed payloads drop.
    */
  def resizeImages(ds: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[ResizedImage] = {
    implicit val enc = Encoders.product[ResizedImage]
    require(targetW > 0 && targetH > 0, s"bad target dims ${targetW}x$targetH")
    ds.mapPartitions { it =>
      it.flatMap { r =>
        MediaCodecs.decode(r.payload).toOption.collect {
          case img: DecodedImage =>
            val out = resizeNearest(img, targetW, targetH)
            val (s, mn, mx) = byteStats(out.pixels)
            ResizedImage(r.media_id, img.width, img.height, targetW, targetH,
              s, mn, mx, md5hex(Ppm.encode(out)))
        }
      }
    }
  }

  // ---- frame sampling --------------------------------------------------

  case class FrameSample(media_id: Long, frame_idx: Int,
      frame_sum: Long, frame_min: Int, frame_max: Int, frame_md5: String)

  /** Every `everyN`-th frame of each video, one row per sampled frame
    * (1:many flatMap), stats over the frame's REAL byte slice.
    */
  def sampleFrames(ds: Dataset[MediaRecord], everyN: Int): Dataset[FrameSample] = {
    implicit val enc = Encoders.product[FrameSample]
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    ds.mapPartitions { it =>
      it.flatMap { r =>
        MediaCodecs.decode(r.payload).toOption.toSeq.flatMap {
          case f: DecodedFrames =>
            (0 until f.nFrames by everyN).map { i =>
              val fb = Frm0.frame(f, i)
              val (s, mn, mx) = byteStats(fb)
              FrameSample(r.media_id, i, s, mn, mx, md5hex(fb))
            }
          case _ => Nil
        }
      }
    }
  }

  // ---- audio frame energies --------------------------------------------

  case class AudioFrame(media_id: Long, frame_idx: Int, n_samples: Int,
      frame_sum: Long, frame_sumsq: Long)

  /** Fixed-length analysis frames over decoded PCM — the audio
    * counterpart of [[patchImages]] (waveform → ordered frame
    * sequence, the first step of any audio feature pipeline). One row
    * per FULL `frameLen`-sample frame; energy is the exact integer
    * Σv and Σv² over the frame's 16-bit samples (sumsq of ±1000-range
    * synth samples peaks ~2.6e8 per frame — Long headroom ~3.5e10×).
    * 1:many flatMap over the decoded samples, no shuffle.
    */
  def audioFrames(ds: Dataset[MediaRecord], frameLen: Int = 256): Dataset[AudioFrame] = {
    implicit val enc = Encoders.product[AudioFrame]
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    ds.mapPartitions { it =>
      it.flatMap { r =>
        MediaCodecs.decode(r.payload).toOption.toSeq.flatMap {
          case a: DecodedAudio =>
            val nf = a.samples.length / frameLen
            (0 until nf).map { f =>
              var s = 0L; var s2 = 0L
              var k = f * frameLen
              val end = k + frameLen
              while (k < end) {
                val v = a.samples(k).toLong
                s += v; s2 += v * v
                k += 1
              }
              AudioFrame(r.media_id, f, frameLen, s, s2)
            }
          case _ => Nil
        }
      }
    }
  }

  // ---- ViT-style patch extraction --------------------------------------

  case class ImagePatch(media_id: Long, px: Int, py: Int,
      n_bytes: Int, sum_bytes: Long, min_byte: Int, max_byte: Int)

  /** Split each decoded image into a grid of `patch`×`patch` pixel
    * tiles — the vision-transformer preprocessing step (image →
    * ordered patch sequence) applied corpus-wide. One row per FULL
    * patch (edge remainders drop, like ViT center-crop conventions);
    * stats are exact integers over the patch's RGB bytes. 1:many
    * flatMap, partition-wise, no shuffle — the patch walk indexes the
    * decoded raster directly, no per-patch copies.
    */
  def patchImages(ds: Dataset[MediaRecord], patch: Int = 8): Dataset[ImagePatch] = {
    implicit val enc = Encoders.product[ImagePatch]
    require(patch >= 1, s"patch must be >= 1, got $patch")
    ds.mapPartitions { it =>
      it.flatMap { r =>
        MediaCodecs.decode(r.payload).toOption.toSeq.flatMap {
          case img: DecodedImage =>
            val nx = img.width / patch
            val ny = img.height / patch
            for (py <- 0 until ny; px <- 0 until nx) yield {
              var sum = 0L; var mn = 255; var mx = 0
              var dy = 0
              while (dy < patch) {
                val rowStart = 3 * ((py * patch + dy) * img.width + px * patch)
                var k = 0
                while (k < 3 * patch) {
                  val v = img.pixels(rowStart + k) & 0xff
                  sum += v
                  if (v < mn) mn = v
                  if (v > mx) mx = v
                  k += 1
                }
                dy += 1
              }
              ImagePatch(r.media_id, px, py, 3 * patch * patch, sum, mn, mx)
            }
          case _ => Nil
        }
      }
    }
  }
}
