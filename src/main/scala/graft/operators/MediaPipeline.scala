package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * BINARY columns with typed metadata, and a distributed featurization
  * pass with the batch shape a real codec needs.
  *
  * The DEFAULT API surface is real end to end:
  *
  *  - [[OpaqueBytesDecoder]] — byte-block statistics over any payload
  *    (the honest feature extractor for bytes whose format is unknown;
  *    not a decode, and not claimed to be one);
  *  - [[ImageIoDecoder]] / [[imageChannelStats]] / [[resizeImage]] — a
  *    REAL image path on the JDK's bundled ImageIO readers (PNG, JPEG,
  *    BMP, GIF — no external codec libraries), gated end-to-end by the
  *    mm_image_stats query: this module's own [[encodeBmp]] writes the
  *    pixels, the independent JDK reader decodes them back, and the
  *    DuckDB oracle reproduces the channel sums without ever seeing an
  *    image;
  *  - [[decodeWav]] / [[audioChannelStats]] / [[resampleAudio]] — a
  *    REAL audio path on the JDK's bundled `javax.sound.sampled` WAV
  *    reader (same zero-external-codec recipe), gated end-to-end by
  *    mm_audio_stats: [[encodeWav]] writes canonical RIFF/PCM, the
  *    independent JDK parser decodes it back, exact per-channel sample
  *    sums checked against an oracle that never sees audio;
  *  - [[encodeGif]] / [[decodeGifFrames]] / [[videoFrameStats]] /
  *    [[sampleGifFrames]] — a REAL multi-frame (video-shaped) path:
  *    animated GIF is the one multi-frame container a bare JRE parses;
  *    this module's own GIF89a writer encodes, the independent JDK
  *    ImageIO reader decodes frame-by-frame, and frame sampling is a
  *    real decode → BMP transcode, gated end-to-end by mm_video_stats.
  *    With this, all three modalities decode for real; the byte-shape
  *    simulations that once stood in for them (`MediaSim`) are deleted.
  *
  * Layout notes (100 TB): meta is a separate struct column, so
  * `SELECT media_id, meta.kind` never reads bytes — the scan reads the
  * 40-byte struct, not the megabyte blob. mapPartitions instantiates
  * one decoder per partition (the init-once pattern a JNI codec or ONNX
  * session requires — the legitimate mapPartitions use). */
object MediaPipeline {

  case class MediaMeta(kind: String, width: Int, height: Int,
      sampleRateHz: Int, durationMs: Long)
  case class MediaRecord(media_id: Long, meta: MediaMeta, bytes: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
      features: Array[Float])
  case class ImageChannelStats(media_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)
  case class ImagePHash(media_id: Long, width: Int, height: Int, phash: Long)
  /** Interleaved 16-bit PCM: samples(frame*channels + ch). */
  case class AudioPcm(channels: Int, sampleRateHz: Int, samples: Array[Short])
  case class AudioChannelStats(media_id: Long, channel: Int,
      sample_rate_hz: Int, n_frames: Long, sum_samples: Long)

  /** At-rest schema for a media table (parquet: blob column encoded as
    * BYTE_ARRAY, metadata as a co-located struct). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("kind", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sampleRateHz", IntegerType),
      StructField("durationMs", LongType))), nullable = false),
    StructField("bytes", BinaryType)))

  /** Decoder contract: one instance per partition, called per record. */
  trait Decoder extends Serializable {
    def features(meta: MediaMeta, bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** Byte-block statistics over an OPAQUE payload: feature i = mean of
    * the i-th of `dim` equal byte chunks. A real, deterministic feature
    * for bytes of unknown format (content-shift detection, corrupt-blob
    * triage) — NOT a media decode and not claimed to be one; use
    * [[ImageIoDecoder]] when the payload is a decodable image. */
  object OpaqueBytesDecoder extends Decoder {
    def features(meta: MediaMeta, bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (bytes == null || bytes.isEmpty) return out
      val chunk = math.max(1, bytes.length / dim)
      var i = 0
      while (i < dim) {
        var s = 0L
        var j = i * chunk
        val end = math.min(bytes.length, (i + 1) * chunk)
        while (j < end) { s += bytes(j) & 0xff; j += 1 }
        out(i) = if (end > i * chunk) s.toFloat / (end - i * chunk) else 0f
        i += 1
      }
      out
    }
  }

  /** REAL image decode on the JDK's bundled ImageIO readers (PNG, JPEG,
    * BMP, GIF — present in every JRE, no codec libraries): feature i =
    * mean luminance ((r+g+b)/3) of the i-th of `dim` vertical image
    * stripes. Undecodable payloads yield all-zero features (the
    * batch-robust contract; [[imageChannelStats]] is the loud variant). */
  object ImageIoDecoder extends Decoder {
    def features(meta: MediaMeta, bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      val img = decodeImage(bytes).orNull
      if (img == null) return out
      val w = img.getWidth; val h = img.getHeight
      val sums = new Array[Long](dim); val counts = new Array[Long](dim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val px = img.getRGB(x, y)
          val lum = ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
          val stripe = math.min(dim - 1, x * dim / w)
          sums(stripe) += lum; counts(stripe) += 3
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < dim) {
        out(i) = if (counts(i) > 0) sums(i).toFloat / counts(i) else 0f
        i += 1
      }
      out
    }
  }

  /** Decode an image payload via ImageIO; None if no bundled reader
    * recognizes the bytes. */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))

  /** Encode RGB pixels as an uncompressed 24-bit BMP (the simplest
    * lossless format every ImageIO ships a reader for): `rgb` holds
    * row-major (r, g, b) byte triplets, top-left first. Bottom-up rows,
    * BGR order, 4-byte row padding — the classic BITMAPINFOHEADER
    * layout. Lossless: [[decodeImage]] returns the identical pixels. */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(rgb.length == width * height * 3,
      s"need ${width * height * 3} rgb bytes, got ${rgb.length}")
    val rowSize = (width * 3 + 3) / 4 * 4
    val dataSize = rowSize * height
    val fileSize = 54 + dataSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
    b.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val i = (y * width + x) * 3
        b.put(rgb(i + 2)).put(rgb(i + 1)).put(rgb(i)) // BGR
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** Encode interleaved 16-bit PCM as a canonical WAV (RIFF/WAVE,
    * `fmt ` + `data` chunks, little-endian PCM — the layout every WAV
    * reader since 1991 parses). The audio twin of [[encodeBmp]]:
    * lossless, so the INDEPENDENT JDK reader behind [[decodeWav]]
    * returns the identical samples — any wrong bit in the 44-byte
    * header and the decode fails or the sums shift. */
  def encodeWav(sampleRateHz: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRateHz > 0 && channels > 0,
      s"bad format ${channels}ch @ $sampleRateHz Hz")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not tile $channels channels")
    val dataSize = samples.length * 2
    val b = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = b.put(s.getBytes("US-ASCII"))
    tag("RIFF"); b.putInt(36 + dataSize); tag("WAVE")
    tag("fmt "); b.putInt(16).putShort(1).putShort(channels.toShort)
      .putInt(sampleRateHz).putInt(sampleRateHz * channels * 2)
      .putShort((channels * 2).toShort).putShort(16)
    tag("data"); b.putInt(dataSize)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  /** REAL audio decode on the JDK's bundled `javax.sound.sampled` WAV
    * reader (present in every JRE, no codec libraries): parse the RIFF
    * container, return interleaved 16-bit PCM. None if the payload is
    * not a WAV the JDK recognizes or not 16-bit signed PCM. */
  def decodeWav(bytes: Array[Byte]): Option[AudioPcm] =
    if (bytes == null || bytes.isEmpty) None
    else try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) None
        else {
          val raw = in.readAllBytes()
          val out = new Array[Short](raw.length / 2)
          java.nio.ByteBuffer.wrap(raw, 0, out.length * 2)
            .order(if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
                   else java.nio.ByteOrder.LITTLE_ENDIAN)
            .asShortBuffer().get(out)
          Some(AudioPcm(fmt.getChannels, fmt.getSampleRate.toInt, out))
        }
      } finally in.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException => None
      case _: java.io.IOException => None
    }

  /** REAL per-channel sample sums via the JDK WAV decode — exact
    * integers, so the result is oracle-comparable (the audio twin of
    * [[imageChannelStats]]). One row per (media_id, channel). Throws on
    * an undecodable payload — a corrupt blob in a batch that claims to
    * be audio fails loudly, not as silent zeros. */
  def audioChannelStats(media: Dataset[MediaRecord]): Dataset[AudioChannelStats] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val pcm = decodeWav(r.bytes).getOrElse(
        throw new IllegalArgumentException(
          s"media_id ${r.media_id}: payload is not decodable 16-bit PCM WAV"))
      val nFrames = pcm.samples.length / pcm.channels
      (0 until pcm.channels).map { ch =>
        var s = 0L
        var f = 0
        while (f < nFrames) { s += pcm.samples(f * pcm.channels + ch); f += 1 }
        AudioChannelStats(r.media_id, ch, pcm.sampleRateHz, nFrames.toLong, s)
      }
    }
  }

  /** REAL distributed audio resample: JDK decode → nearest-neighbor
    * frame pick at the target rate → lossless WAV re-encode, metadata
    * updated (the audio twin of [[resizeImage]]). Throws on
    * undecodable payloads. */
  def resampleAudio(media: Dataset[MediaRecord], targetRateHz: Int)
      : Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(targetRateHz > 0, s"bad target rate $targetRateHz")
    media.mapPartitions(_.map { r =>
      val pcm = decodeWav(r.bytes).getOrElse(
        throw new IllegalArgumentException(
          s"media_id ${r.media_id}: payload is not decodable 16-bit PCM WAV"))
      val inFrames = pcm.samples.length / pcm.channels
      val outFrames = ((inFrames.toLong * targetRateHz) / pcm.sampleRateHz).toInt
      val out = new Array[Short](outFrames * pcm.channels)
      var f = 0
      while (f < outFrames) {
        val src = ((f.toLong * pcm.sampleRateHz) / targetRateHz).toInt
        var ch = 0
        while (ch < pcm.channels) {
          out(f * pcm.channels + ch) = pcm.samples(src * pcm.channels + ch)
          ch += 1
        }
        f += 1
      }
      MediaRecord(r.media_id,
        r.meta.copy(sampleRateHz = targetRateHz,
          durationMs = if (targetRateHz > 0) outFrames * 1000L / targetRateHz else 0L),
        encodeWav(targetRateHz, pcm.channels, out))
    })
  }

  /** Encode grayscale frames as an ANIMATED GIF89a — the one real
    * multi-frame container every JRE ships a parser for (the video twin
    * of [[encodeBmp]]/[[encodeWav]], zero external codecs). Each frame
    * is row-major 8-bit gray (palette index i → RGB(i,i,i) via a global
    * gray ramp). Pixel data uses the classic UNCOMPRESSED-LZW technique
    * (public format lore since GIF89a itself): 9-bit literal codes with
    * a CLEAR every 128 pixels so the decoder's table never forces a
    * width switch — byte-exact, loss-free, and decodable by any
    * conforming reader. Any wrong bit in the descriptors or the code
    * stream and the independent JDK parser rejects the container or the
    * frame sums shift — the same cannot-fake-it property the BMP and
    * WAV gates have. */
  def encodeGif(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    require(frames.nonEmpty, "need at least one frame")
    frames.foreach(f => require(f.length == width * height,
      s"need ${width * height} gray bytes per frame, got ${f.length}"))
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xff)
    def le16(v: Int): Unit = { b(v); b(v >> 8) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(width); le16(height)
    b(0xF7) // GCT present, 8-bit color resolution, 256-entry table
    b(0); b(0)
    var i = 0
    while (i < 256) { b(i); b(i); b(i); i += 1 } // gray ramp palette
    frames.foreach { f =>
      // graphic control: no disposal tricks, no transparency, delay 10cs
      b(0x21); b(0xF9); b(4); b(0); le16(10); b(0); b(0)
      b(0x2C); le16(0); le16(0); le16(width); le16(height); b(0) // descriptor
      b(8) // LZW minimum code size
      // 9-bit codes, LSB-first bit packing; CLEAR=256, EOI=257
      val lzw = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nbits = 0
      def code(c: Int): Unit = {
        acc |= (c.toLong & 0x1ff) << nbits; nbits += 9
        while (nbits >= 8) { lzw.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
      }
      code(256)
      var p = 0
      while (p < f.length) {
        code(f(p) & 0xff)
        p += 1
        if (p % 128 == 0) code(256) // periodic CLEAR: table never widens
      }
      code(257)
      if (nbits > 0) lzw.write((acc & 0xff).toInt)
      // sub-blocks of <= 255 bytes
      val bytes = lzw.toByteArray
      var off = 0
      while (off < bytes.length) {
        val n = math.min(255, bytes.length - off)
        b(n); out.write(bytes, off, n); off += n
      }
      b(0)
    }
    b(0x3B)
    out.toByteArray
  }

  /** REAL multi-frame decode via the JDK's bundled ImageIO GIF reader:
    * every frame of the container, in order. Nil if no bundled reader
    * recognizes the bytes. */
  def decodeGifFrames(bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.isEmpty) Nil
    else {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) Nil
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            val n = r.getNumImages(true)
            (0 until n).map(r.read(_))
          } finally r.dispose()
        }
      } catch {
        case _: java.io.IOException => Nil
        case _: IndexOutOfBoundsException => Nil
      } finally in.close()
    }

  case class VideoFrameStats(media_id: Long, frame_idx: Long, width: Int,
      height: Int, sum_gray: Long)

  /** REAL per-frame pixel sums via the JDK multi-frame decode — exact
    * integers, oracle-comparable (the video row of the
    * imageChannelStats/audioChannelStats family). One row per
    * (media_id, frame). Throws on an undecodable or frameless payload. */
  def videoFrameStats(media: Dataset[MediaRecord]): Dataset[VideoFrameStats] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val frames = decodeGifFrames(r.bytes)
      if (frames.isEmpty) throw new IllegalArgumentException(
        s"media_id ${r.media_id}: payload is not a decodable multi-frame GIF")
      frames.zipWithIndex.map { case (img, idx) =>
        var s = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            s += img.getRGB(x, y) & 0xff // gray: all channels equal
            x += 1
          }
          y += 1
        }
        VideoFrameStats(r.media_id, idx.toLong, img.getWidth, img.getHeight, s)
      }
    }
  }

  /** REAL distributed frame sampling — decode the multi-frame container,
    * keep every `stride`-th frame, re-encode each as a standalone
    * lossless BMP (a real GIF → BMP transcode, the shape a downstream
    * image-embedding stage consumes). Throws on undecodable payloads. */
  def sampleGifFrames(media: Dataset[MediaRecord], stride: Int)
      : Dataset[(Long, Int, Array[Byte])] = {
    import media.sparkSession.implicits._
    require(stride > 0, "stride must be positive")
    media.flatMap { r =>
      val frames = decodeGifFrames(r.bytes)
      if (frames.isEmpty) throw new IllegalArgumentException(
        s"media_id ${r.media_id}: payload is not a decodable multi-frame GIF")
      frames.zipWithIndex.collect { case (img, idx) if idx % stride == 0 =>
        val w = img.getWidth; val h = img.getHeight
        val rgb = new Array[Byte](w * h * 3)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val px = img.getRGB(x, y)
            val i = (y * w + x) * 3
            rgb(i) = ((px >> 16) & 0xff).toByte
            rgb(i + 1) = ((px >> 8) & 0xff).toByte
            rgb(i + 2) = (px & 0xff).toByte
            x += 1
          }
          y += 1
        }
        (r.media_id, idx, encodeBmp(w, h, rgb))
      }
    }
  }

  /** Distributed featurization. mapPartitions so the decoder is
    * instantiated once per partition (not per record) and records flow
    * through as an iterator — constant memory regardless of partition
    * size, no driver involvement. */
  def featurize(media: Dataset[MediaRecord], dim: Int = 8,
      decoder: Decoder = OpaqueBytesDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      val d = decoder // per-partition init point (codec/session handle)
      records.map { r =>
        val len = if (r.bytes == null) 0L else r.bytes.length.toLong
        MediaFeatures(r.media_id, r.meta.kind, len, d.features(r.meta, r.bytes, dim))
      }
    }
  }

  /** REAL per-image channel sums via the JDK decode — exact integers,
    * so the result is oracle-comparable. Throws on an undecodable
    * payload (the pipeline-gate contract: a corrupt image in a batch
    * that claims to be images should fail loudly, not feature as
    * zeros). */
  def imageChannelStats(media: Dataset[MediaRecord]): Dataset[ImageChannelStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      records.map { r =>
        val img = decodeImage(r.bytes).getOrElse(
          throw new IllegalArgumentException(
            s"media_id ${r.media_id}: payload is not a decodable image"))
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val px = img.getRGB(x, y)
            sr += (px >> 16) & 0xff; sg += (px >> 8) & 0xff; sb += px & 0xff
            x += 1
          }
          y += 1
        }
        ImageChannelStats(r.media_id, img.getWidth, img.getHeight, sr, sg, sb)
      }
    }
  }

  /** REAL perceptual AVERAGE-HASH (aHash) over decoded pixels — the
    * image near-dup fingerprint (the classic pHash-family baseline:
    * 8×8 downsample, grayscale, threshold at the mean; re-encodes,
    * recompressions and small edits of one image land within a few
    * Hamming bits of each other). Pixels decode through the JDK
    * ImageIO reader, luminance is the exact integer r+g+b sum (no
    * division until the pool — scaling by 3 cannot move a mean
    * comparison), the image average-pools onto an 8×8 cell grid
    * (floor-average per cell), and bit i of the 64-bit hash is set iff
    * cell i (row-major) strictly exceeds the floor-mean of the 64
    * cells. Integer arithmetic end to end, so an oracle deriving the
    * same pixels reproduces the hash bit for bit. Throws on
    * undecodable payloads (the [[imageChannelStats]] loud contract);
    * pair generation over the hashes is
    * [[NearDup.hammingPairsCombo]] — the same banding that serves
    * 64-bit text simhash. */
  def imagePHash(media: Dataset[MediaRecord]): Dataset[ImagePHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { r =>
      val img = decodeImage(r.bytes).getOrElse(
        throw new IllegalArgumentException(
          s"media_id ${r.media_id}: payload is not a decodable image"))
      val w = img.getWidth; val h = img.getHeight
      require(w >= 8 && h >= 8,
        s"media_id ${r.media_id}: ${w}x$h has no 8x8 cell grid to hash")
      val sums = new Array[Long](64); val counts = new Array[Long](64)
      var y = 0
      while (y < h) {
        val cy = y * 8 / h
        var x = 0
        while (x < w) {
          val cx = x * 8 / w
          val px = img.getRGB(x, y)
          val lum = ((px >> 16) & 0xff) + ((px >> 8) & 0xff) + (px & 0xff)
          val c = cy * 8 + cx
          sums(c) += lum; counts(c) += 1
          x += 1
        }
        y += 1
      }
      val cell = new Array[Long](64)
      var i = 0; var tot = 0L
      while (i < 64) { cell(i) = sums(i) / counts(i); tot += cell(i); i += 1 }
      val mean = tot / 64
      var hash = 0L; i = 0
      while (i < 64) { if (cell(i) > mean) hash |= (1L << i); i += 1 }
      ImagePHash(r.media_id, w, h, hash)
    })
  }

  /** REAL distributed image resize: JDK decode → nearest-neighbor
    * rescale → lossless BMP re-encode, metadata updated to the new
    * dimensions. Throws on undecodable payloads (same loud contract as
    * [[imageChannelStats]]); opaque non-image payloads have no resize —
    * featurize them via [[OpaqueBytesDecoder]] instead. */
  def resizeImage(media: Dataset[MediaRecord], width: Int, height: Int)
      : Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(width > 0 && height > 0, s"bad dimensions ${width}x$height")
    media.mapPartitions(_.map { r =>
      val img = decodeImage(r.bytes).getOrElse(
        throw new IllegalArgumentException(
          s"media_id ${r.media_id}: payload is not a decodable image"))
      val rgb = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val sy = y * img.getHeight / height
        var x = 0
        while (x < width) {
          val sx = x * img.getWidth / width
          val px = img.getRGB(sx, sy)
          val i = (y * width + x) * 3
          rgb(i) = ((px >> 16) & 0xff).toByte
          rgb(i + 1) = ((px >> 8) & 0xff).toByte
          rgb(i + 2) = (px & 0xff).toByte
          x += 1
        }
        y += 1
      }
      MediaRecord(r.media_id, r.meta.copy(width = width, height = height),
        encodeBmp(width, height, rgb))
    })
  }

  /** Header-parsed container facts: what a catalog/statistics pass can
    * know about a blob WITHOUT decoding its payload. NULL-valued fields
    * don't apply to the container (a WAV has no width). */
  case class ContainerMeta(media_id: Long, container: String,
      width: Option[Long], height: Option[Long], n_frames: Option[Long],
      channels: Option[Long], sample_rate_hz: Option[Long])

  /** HEADER-ONLY metadata peek: dispatch on the container's magic bytes
    * and read dimensions/frame count/format facts from the declared
    * structure — BMP's fixed 54-byte header, WAV's RIFF chunk walk,
    * GIF's block walk (skipping payload sub-blocks BY THEIR LENGTH
    * FIELDS, never decompressing a pixel). This is the other half of
    * the decode story at 100 TB: profiling/validating a petabyte media
    * column costs O(headers) when the decode stays untouched — the
    * parquet reader already prunes the blob column to the bytes this
    * touches, and nothing here allocates a frame buffer. Corrupt or
    * unknown payloads fail LOUDLY (same contract as the decoders:
    * silently-wrong metadata poisons every downstream filter). */
  def containerMeta(media: Dataset[MediaRecord]): Dataset[ContainerMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => parseContainerMeta(r.media_id, r.bytes)))
  }

  private[graft] def parseContainerMeta(id: Long, bytes: Array[Byte]): ContainerMeta = {
    require(bytes != null && bytes.length >= 14, s"media $id: blob too short for any header")
    def u8(i: Int): Int = bytes(i) & 0xff
    def le16(i: Int): Long = (u8(i) | (u8(i + 1) << 8)).toLong
    def le32(i: Int): Long =
      (u8(i).toLong | (u8(i + 1).toLong << 8) |
        (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24))
    def ascii(i: Int, n: Int) = new String(bytes, i, n, "US-ASCII")
    if (bytes(0) == 'B' && bytes(1) == 'M') {
      // BITMAPINFOHEADER: width @18, height @22 (negative = top-down)
      ContainerMeta(id, "bmp", Some(le32(18)), Some(math.abs(le32(22).toInt).toLong),
        Some(1L), None, None)
    } else if (ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE") {
      var off = 12; var ch = -1L; var sr = -1L; var dataSize = -1L
      while (off + 8 <= bytes.length && (ch < 0 || dataSize < 0)) {
        val tag = ascii(off, 4); val sz = le32(off + 4)
        // a declared chunk size past the payload is corruption — stop
        // LOUDLY rather than walking off (or wrapping Int) into a loop
        require(sz <= bytes.length.toLong, s"media $id: RIFF chunk '$tag' declares $sz bytes")
        if (tag == "fmt ") { ch = le16(off + 10); sr = le32(off + 12) }
        else if (tag == "data") dataSize = sz
        off += 8 + sz.toInt + (sz.toInt & 1) // RIFF pads odd chunks
      }
      require(ch > 0 && sr > 0 && dataSize >= 0, s"media $id: malformed WAV header")
      ContainerMeta(id, "wav", None, None, Some(dataSize / (2L * ch)), Some(ch), Some(sr))
    } else if (ascii(0, 4) == "GIF8") {
      val (w, h) = (le16(6), le16(8))
      val packed = u8(10)
      var off = 13 + (if ((packed & 0x80) != 0) 3 * (1 << ((packed & 7) + 1)) else 0)
      var frames = 0L
      var done = false
      def skipSubBlocks(): Unit = {
        while (u8(off) != 0) off += 1 + u8(off)
        off += 1
      }
      while (!done) {
        require(off < bytes.length, s"media $id: truncated GIF stream")
        u8(off) match {
          case 0x3B => done = true
          case 0x21 => off += 2; skipSubBlocks() // extension: intro+label
          case 0x2C =>
            frames += 1
            val lp = u8(off + 9)
            off += 10 + (if ((lp & 0x80) != 0) 3 * (1 << ((lp & 7) + 1)) else 0)
            off += 1 // LZW minimum code size
            skipSubBlocks()
          case b => throw new IllegalArgumentException(
            s"media $id: unknown GIF block 0x${b.toHexString}")
        }
      }
      ContainerMeta(id, "gif", Some(w), Some(h), Some(frames), None, None)
    } else throw new IllegalArgumentException(
      s"media $id: unknown container magic " +
        bytes.take(4).map(b => f"${b & 0xff}%02x").mkString)
  }

  /** Demo wiring on harness data: documents' text bytes as the opaque
    * payload (kind "text"), so the pipeline runs end-to-end without any
    * codec. */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        struct(
          lit("text").as("kind"), lit(0).as("width"), lit(0).as("height"),
          lit(0).as("sampleRateHz"), lit(0L).as("durationMs")).as("meta"),
        col("text").cast("binary").as("bytes"))
      .as[MediaRecord]
  }
}

// HISTORICAL NOTE: a `MediaSim` namespace of explicitly-opt-in byte-shape
// simulations (payload-chunk "resize", fake frame sampling) lived here
// until round 11. Every modality now has a REAL JDK decode path gated by
// its mm_* query — images via decodeImage (ImageIO), audio via decodeWav
// (javax.sound.sampled), multi-frame video via decodeGifFrames — so the
// simulations were deleted rather than left as a surface a reader could
// mistake for live decode. Payloads of genuinely unknown format are
// served honestly by OpaqueBytesDecoder (byte-block statistics, no
// format claim).
