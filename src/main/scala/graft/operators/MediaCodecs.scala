package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM media codecs for the multimodal column family — real
  * encode/decode for three uncompressed formats, chosen because they
  * need no native codec libraries (none ship in this environment) yet
  * exercise every step a production decoder does: magic sniffing,
  * header parsing, payload validation, and byte-exact pixel/sample
  * walks.
  *
  *  - Images: binary PPM ("P6"), the Netpbm interchange format —
  *    ASCII header (`P6\n<w> <h>\n<maxval>\n`, `#` comments legal),
  *    then `w*h*3` RGB bytes.
  *  - Audio: WAV/RIFF with 16-bit little-endian mono PCM — chunked
  *    container (`RIFF..WAVE`, `fmt `, `data`), arbitrary extra chunks
  *    skipped by size like any RIFF reader.
  *  - Video: FRM0, a minimal concatenated-frame container (magic +
  *    LE int32 width/height/nFrames + `nFrames*w*h` grayscale bytes) —
  *    the raw-Y8 shape a frame-sampling pipeline sees after demux.
  *
  * All decoders are total: malformed input yields `Left(reason)`,
  * never an exception — the drop-don't-throw discipline of the ELB
  * parser (reference elb_logs.py:120-141) applied to bytes.
  */
object MediaCodecs {

  sealed trait Decoded
  /** RGB row-major, 8-bit channels. */
  final case class DecodedImage(width: Int, height: Int, pixels: Array[Byte]) extends Decoded
  /** Mono 16-bit PCM. */
  final case class DecodedAudio(sampleRate: Int, samples: Array[Short]) extends Decoded
  /** Grayscale frames, concatenated row-major. */
  final case class DecodedFrames(width: Int, height: Int, nFrames: Int, data: Array[Byte]) extends Decoded

  /** Identify a payload by magic bytes alone (the metadata column is
    * advisory; bytes are the truth).
    */
  def sniff(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') Some("image")
    else if (bytes.length >= 12 && hasAscii(bytes, 0, "RIFF") && hasAscii(bytes, 8, "WAVE")) Some("audio")
    else if (bytes.length >= 4 && hasAscii(bytes, 0, "FRM0")) Some("video")
    else None

  private def hasAscii(bytes: Array[Byte], off: Int, s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (bytes(off + i) != s.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** Decode any supported payload, dispatching on magic. */
  def decode(bytes: Array[Byte]): Either[String, Decoded] = sniff(bytes) match {
    case Some("image") => Ppm.decode(bytes)
    case Some("audio") => Wav.decode(bytes)
    case Some("video") => Frm0.decode(bytes)
    case _             => Left("unrecognized magic")
  }

  // ---- PPM (P6) ------------------------------------------------------

  object Ppm {
    def encode(img: DecodedImage): Array[Byte] = {
      require(img.pixels.length == img.width * img.height * 3,
        s"pixel buffer ${img.pixels.length} != ${img.width}x${img.height}x3")
      val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + img.pixels.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(img.pixels, 0, out, header.length, img.pixels.length)
      out
    }

    def decode(bytes: Array[Byte]): Either[String, DecodedImage] = {
      // header tokenizer: whitespace-separated tokens, '#' comments run
      // to end of line — the full Netpbm header grammar, so any valid
      // P6 writer's output parses, not just our own encoder's.
      var pos = 0
      def skipWsAndComments(): Unit = {
        var going = true
        while (going && pos < bytes.length) {
          val b = bytes(pos)
          if (b == ' ' || b == '\t' || b == '\r' || b == '\n') pos += 1
          else if (b == '#') { while (pos < bytes.length && bytes(pos) != '\n') pos += 1 }
          else going = false
        }
      }
      def token(): Option[String] = {
        skipWsAndComments()
        val start = pos
        while (pos < bytes.length && !Character.isWhitespace(bytes(pos).toChar) && bytes(pos) != '#') pos += 1
        if (pos > start) Some(new String(bytes, start, pos - start, "US-ASCII")) else None
      }
      def intToken(name: String): Either[String, Int] = token() match {
        case Some(t) if t.forall(_.isDigit) && t.length <= 9 => Right(t.toInt)
        case Some(t) => Left(s"bad $name token '$t'")
        case None    => Left(s"missing $name")
      }
      if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return Left("not a P6 ppm")
      pos = 2
      for {
        w <- intToken("width")
        h <- intToken("height")
        maxv <- intToken("maxval")
        _ <- if (maxv != 255) Left(s"unsupported maxval $maxv") else Right(())
        _ <- if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15))
               Left(s"bad dims ${w}x$h")
             else Right(())
        // exactly ONE whitespace byte separates header from raster
        _ <- if (pos < bytes.length && Character.isWhitespace(bytes(pos).toChar)) Right(pos += 1)
             else Left("missing raster separator")
        // Long math: 32768×32768×3 overflows Int, so the truncation
        // check must not compute w*h*3 in 32 bits
        n = w.toLong * h * 3
        _ <- if (bytes.length - pos < n) Left(s"truncated raster: ${bytes.length - pos} < $n")
             else Right(())
      } yield DecodedImage(w, h, java.util.Arrays.copyOfRange(bytes, pos, pos + n.toInt))
    }
  }

  /** Nearest-neighbor resize — the standard floor mapping: output pixel
    * (X, Y) samples source (X·w / W, Y·h / H). Real resampling over the
    * decoded raster, works for up- and down-scaling.
    */
  def resizeNearest(img: DecodedImage, outW: Int, outH: Int): DecodedImage = {
    require(outW > 0 && outH > 0, s"bad target dims ${outW}x$outH")
    val out = new Array[Byte](outW * outH * 3)
    var y = 0
    while (y < outH) {
      val sy = (y.toLong * img.height / outH).toInt
      var x = 0
      while (x < outW) {
        val sx = (x.toLong * img.width / outW).toInt
        val src = (sy * img.width + sx) * 3
        val dst = (y * outW + x) * 3
        out(dst) = img.pixels(src)
        out(dst + 1) = img.pixels(src + 1)
        out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    DecodedImage(outW, outH, out)
  }

  // ---- WAV (RIFF, 16-bit mono PCM) -----------------------------------

  object Wav {
    def encode(audio: DecodedAudio): Array[Byte] = {
      val dataLen = audio.samples.length * 2
      val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1)                       // PCM
        .putShort(1)                       // mono
        .putInt(audio.sampleRate)
        .putInt(audio.sampleRate * 2)      // byte rate
        .putShort(2)                       // block align
        .putShort(16)                      // bits per sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      audio.samples.foreach(buf.putShort)
      buf.array()
    }

    def decode(bytes: Array[Byte]): Either[String, DecodedAudio] = {
      if (bytes.length < 12 || !hasAscii(bytes, 0, "RIFF") || !hasAscii(bytes, 8, "WAVE"))
        return Left("not a RIFF/WAVE file")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      // walk chunks by declared size (RIFF chunks are word-aligned —
      // odd sizes carry a pad byte), tolerating unknown chunks like
      // LIST/INFO that real writers emit
      var pos = 12
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var data: Option[(Int, Int)] = None     // (offset, len)
      while (pos + 8 <= bytes.length) {
        val id = new String(bytes, pos, 4, "US-ASCII")
        val size = buf.getInt(pos + 4)
        // Long comparison: a declared size near Int.MaxValue wraps
        // pos + 8 + size negative and would bypass an Int check
        if (size < 0 || pos.toLong + 8 + size > bytes.length)
          return Left(s"chunk '$id' overruns file (size $size at $pos)")
        id match {
          case "fmt " =>
            if (size < 16) return Left(s"fmt chunk too small ($size)")
            val audioFormat = buf.getShort(pos + 8) & 0xffff
            if (audioFormat != 1) return Left(s"unsupported audio format $audioFormat (want PCM)")
            fmt = Some((buf.getShort(pos + 10) & 0xffff, buf.getInt(pos + 12), buf.getShort(pos + 22) & 0xffff))
          case "data" => data = Some((pos + 8, size))
          case _      => () // skip unknown chunk
        }
        // bounded-safe after the Long check above (pos+8+size ≤ length);
        // clamp so the word-align pad byte can never push pos past EOF
        pos = math.min(pos.toLong + 8 + size + (size & 1), bytes.length.toLong).toInt
      }
      (fmt, data) match {
        case (None, _) => Left("missing fmt chunk")
        case (_, None) => Left("missing data chunk")
        case (Some((channels, rate, bits)), Some((off, len))) =>
          if (channels != 1) Left(s"unsupported channel count $channels")
          else if (bits != 16) Left(s"unsupported bit depth $bits")
          else if (len % 2 != 0) Left(s"odd PCM data length $len")
          else {
            val samples = new Array[Short](len / 2)
            var i = 0
            while (i < samples.length) { samples(i) = buf.getShort(off + i * 2); i += 1 }
            Right(DecodedAudio(rate, samples))
          }
      }
    }
  }

  // ---- FRM0 (concatenated grayscale frames) --------------------------

  object Frm0 {
    def encode(frames: DecodedFrames): Array[Byte] = {
      require(frames.data.length == frames.width * frames.height * frames.nFrames,
        s"frame buffer ${frames.data.length} != ${frames.nFrames}x${frames.width}x${frames.height}")
      val buf = ByteBuffer.allocate(16 + frames.data.length).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("FRM0".getBytes("US-ASCII"))
        .putInt(frames.width).putInt(frames.height).putInt(frames.nFrames)
        .put(frames.data)
      buf.array()
    }

    def decode(bytes: Array[Byte]): Either[String, DecodedFrames] = {
      if (bytes.length < 16 || !hasAscii(bytes, 0, "FRM0")) return Left("not a FRM0 container")
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val w = buf.getInt(4); val h = buf.getInt(8); val nf = buf.getInt(12)
      if (w <= 0 || h <= 0 || nf <= 0) return Left(s"bad header ${w}x${h}x$nf")
      val need = w.toLong * h * nf
      if (bytes.length - 16 < need) return Left(s"truncated frames: ${bytes.length - 16} < $need")
      Right(DecodedFrames(w, h, nf, java.util.Arrays.copyOfRange(bytes, 16, 16 + need.toInt)))
    }

    /** Frame `i` as its own byte slice. */
    def frame(f: DecodedFrames, i: Int): Array[Byte] = {
      require(i >= 0 && i < f.nFrames, s"frame $i out of ${f.nFrames}")
      val sz = f.width * f.height
      java.util.Arrays.copyOfRange(f.data, i * sz, (i + 1) * sz)
    }
  }
}
