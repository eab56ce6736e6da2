package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride through
  * the engine as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extract / resize / frame-sample run partition-wise
  * over those bytes.
  *
  * The Spark-side machinery here — schema, binary encoding, partition
  * batching, typed mapPartitions signature — is real and tested. The
  * DECODE ITSELF IS A STUB (`StubDecoder`): this environment ships no
  * image/audio codecs, so it derives deterministic fake features from
  * the raw bytes. Swapping in a real codec is a one-class change; the
  * distributed shape (no shuffle, no driver collect, codec objects
  * instantiated once per partition, not per row) stays identical.
  */
object Multimodal {

  /** Typed metadata carried beside the payload. */
  case class MediaMeta(media_type: String, width: Int, height: Int,
      sample_rate: Int, n_frames: Int)

  case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(
      media_id: Long,
      byte_len: Long,
      checksum: String,
      n_chunks: Long,
      sampled_bytes: Long,
      media_type: String)

  /** Wrap a string column as an opaque binary payload with deterministic
    * metadata — the test-data stand-in for real image/audio bytes.
    */
  def attachPayload(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRecord] = {
    implicit val enc = Encoders.product[MediaRecord]
    df.select(
        col(idCol).as("media_id"),
        col(textCol).cast("binary").as("payload"),
        struct(
          when(col(idCol) % 3 === 0, "image")
            .when(col(idCol) % 3 === 1, "audio").otherwise("video").as("media_type"),
          (lit(64) + col(idCol) % 16 * 64).cast("int").as("width"),
          (lit(64) + col(idCol) % 9 * 64).cast("int").as("height"),
          lit(16000).cast("int").as("sample_rate"),
          (col(idCol) % 300 + 1).cast("int").as("n_frames")).as("meta"))
      .as[MediaRecord]
  }

  /** Where a real decoder would be constructed (per partition, never per
    * row). ??? in spirit: returns deterministic byte-derived features so
    * the pipeline is testable offline.
    */
  trait Decoder extends Serializable {
    def decode(payload: Array[Byte], meta: MediaMeta): (Long, String, Long, Long)
  }

  /** STUB decode — replace with a codec-backed Decoder in production.
    * chunk size 256 ≈ a fake "frame"; sample stride 64 ≈ a fake
    * every-Nth-frame sample.
    */
  object StubDecoder extends Decoder {
    override def decode(payload: Array[Byte], meta: MediaMeta): (Long, String, Long, Long) = {
      val len = payload.length.toLong
      val md = java.security.MessageDigest.getInstance("MD5")
      val checksum = md.digest(payload).map("%02x".format(_)).mkString
      val nChunks = (len + 255) / 256
      val sampled = (len + 63) / 64
      (len, checksum, nChunks, sampled)
    }
  }

  /** Partition-wise decode + feature extraction: the distributed shape
    * of a `mapInPandas`-style batch UDF, in typed Scala. One decoder per
    * partition; rows stream through without materializing the partition.
    */
  def decodeFeatures(ds: Dataset[MediaRecord], decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    ds.mapPartitions { it =>
      // per-partition setup — a real codec would open its context here
      val d = decoder
      it.map { r =>
        val (len, checksum, chunks, sampled) = d.decode(r.payload, r.meta)
        MediaFeatures(r.media_id, len, checksum, chunks, sampled, r.meta.media_type)
      }
    }
  }

  case class ResizedMedia(media_id: Long, media_type: String,
      width: Int, height: Int, out_len: Long, checksum: String)

  /** Resize shape: per record, produce the target-dimension metadata
    * and the transformed payload's stats. STUB transform (no codecs in
    * this environment): "resized" bytes = the first
    * `targetW·targetH/64` payload bytes — deterministic, so the oracle
    * can recompute the checksum. A real implementation swaps only the
    * byte transform; the partition-wise streaming shape (no shuffle,
    * per-partition setup, 1:1 rows) is exactly what a codec-backed
    * resize uses.
    */
  def resizeStub(ds: Dataset[MediaRecord], targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    val keep = targetW.toLong * targetH / 64
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val outLen = math.min(r.payload.length.toLong, keep).toInt
        val checksum = md.digest(r.payload.take(outLen)).map("%02x".format(_)).mkString
        ResizedMedia(r.media_id, r.meta.media_type, targetW, targetH,
          outLen.toLong, checksum)
      }
    }
  }

  case class FrameSample(media_id: Long, frame_idx: Int, frame_md5: String)

  /** Frame sampling shape: every `everyN`-th frame index of each
    * record, one output row per sampled frame (a 1:many flatMap — the
    * shape that matters; a video pipeline fans out exactly like this).
    * STUB frame extraction: "frame i" = a 32-byte payload window at a
    * deterministic offset derived from i, so frame checksums are
    * engine-recomputable.
    */
  def sampleFramesStub(ds: Dataset[MediaRecord], everyN: Int): Dataset[FrameSample] = {
    implicit val enc = Encoders.product[FrameSample]
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val len = r.payload.length
        (0 until r.meta.n_frames by everyN).iterator.map { i =>
          val start = if (len <= 32) 0 else (i * 97) % (len - 31)
          val sliceLen = math.min(32, len - start)
          val digest = md.digest(r.payload.slice(start, start + sliceLen))
            .map("%02x".format(_)).mkString
          FrameSample(r.media_id, i, digest)
        }
      }
    }
  }
}
