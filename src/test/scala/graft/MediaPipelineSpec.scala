package graft

import graft.operators.MediaPipeline
import graft.operators.MediaPipeline.{MediaMeta, MediaRecord}

class MediaPipelineSpec extends SparkSpec {
  import sqlImplicits._

  private def rec(id: Long, payload: String) =
    MediaRecord(id, MediaMeta("image", 4, 4, 0, 0L), payload.getBytes("UTF-8"))

  test("featurize preserves ids, computes byte lengths, emits fixed-dim features") {
    val ds = Seq(rec(1, "abcdefgh"), rec(2, ""), rec(3, "zz")).toDS()
    val got = MediaPipeline.featurize(ds, dim = 4).collect().sortBy(_.media_id)
    assert(got.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_.byte_len).toSeq == Seq(8L, 0L, 2L))
    assert(got.forall(_.features.length == 4))
    // chunked byte means of "abcdefgh": (a,b)(c,d)(e,f)(g,h)
    assert(got(0).features.toSeq == Seq(97.5f, 99.5f, 101.5f, 103.5f))
    assert(got(1).features.forall(_ == 0f))
  }

  test("featurize is deterministic and partition-count preserving") {
    val ds = Seq.tabulate(20)(i => rec(i.toLong, "payload-" + i)).toDS().repartition(5)
    val a = MediaPipeline.featurize(ds).collect().sortBy(_.media_id).map(_.features.toSeq)
    val b = MediaPipeline.featurize(ds).collect().sortBy(_.media_id).map(_.features.toSeq)
    assert(a.toSeq == b.toSeq)
    assert(MediaPipeline.featurize(ds).rdd.getNumPartitions == 5)
  }

  test("fromDocuments wires the documents table into the media schema") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = MediaPipeline.fromDocuments(docs)
    val feats = MediaPipeline.featurize(media, dim = 8)
    val n = docs.count()
    assert(feats.count() == n)
    val one = feats.filter(_.media_id == 0L).collect().head
    assert(one.kind == "text" && one.byte_len > 0 && one.features.length == 8)
  }

  test("fromDocuments passes null and empty payloads through as empty bytes") {
    val docs = Seq(
        (0L, "some real text"),
        (1L, null.asInstanceOf[String]), // null text → null bytes
        (2L, ""))                        // empty text → empty bytes
      .toDF("doc_id", "text")
    val out = MediaPipeline.featurize(MediaPipeline.fromDocuments(docs), dim = 4)
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(0L, 1L, 2L))
    assert(out(0).byte_len > 0)
    assert(out(1).byte_len == 0L && out(2).byte_len == 0L)
  }

  test("BMP encode → JDK ImageIO decode round-trips pixels exactly") {
    // a 2x3 image with distinctive per-pixel channels (includes >127
    // bytes — the signed-byte trap — and row-padding widths)
    val rgb = Array[Int](
      10, 20, 30, 250, 130, 5,
      0, 255, 128, 1, 2, 3,
      99, 100, 101, 200, 150, 50).map(_.toByte)
    val bmp = MediaPipeline.encodeBmp(2, 3, rgb)
    val img = MediaPipeline.decodeImage(bmp).get
    assert(img.getWidth == 2 && img.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 2) {
      val px = img.getRGB(x, y)
      val i = (y * 2 + x) * 3
      assert(((px >> 16) & 0xff) == (rgb(i) & 0xff), s"r at ($x,$y)")
      assert(((px >> 8) & 0xff) == (rgb(i + 1) & 0xff), s"g at ($x,$y)")
      assert((px & 0xff) == (rgb(i + 2) & 0xff), s"b at ($x,$y)")
    }
  }

  test("imageChannelStats sums real decoded pixels; corrupt payloads fail loudly") {
    val rgb = Array.tabulate(4 * 4 * 3)(i => ((i * 37) % 251).toByte)
    val media = Seq(MediaRecord(7L, MediaMeta("image/bmp", 4, 4, 0, 0L),
      MediaPipeline.encodeBmp(4, 4, rgb))).toDS()
    val st = MediaPipeline.imageChannelStats(media).collect().head
    def chanSum(c: Int) = (0 until 16).map(p => rgb(p * 3 + c) & 0xff).map(_.toLong).sum
    assert(st.media_id == 7L && st.width == 4 && st.height == 4)
    assert((st.sum_r, st.sum_g, st.sum_b) == ((chanSum(0), chanSum(1), chanSum(2))))
    // and the ImageIoDecoder feature path sees the same pixels: one
    // stripe = whole-image mean luminance
    val f = MediaPipeline.featurize(media, dim = 1, MediaPipeline.ImageIoDecoder)
      .collect().head.features
    assert(math.abs(f(0) - (chanSum(0) + chanSum(1) + chanSum(2)).toFloat / 48) < 1e-4)
    val bad = Seq(rec(8, "not an image at all")).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      MediaPipeline.imageChannelStats(bad).collect() }
    assert(e.getMessage.contains("not a decodable image")
      || Option(e.getCause).exists(_.getMessage.contains("not a decodable image")))
  }

  test("resizeImage decodes, rescales and re-encodes real pixels") {
    // solid-color image: any resample preserves the color exactly
    val rgb = Array.fill(4 * 4)(Array[Byte](40, 80, 120)).flatten
    val media = Seq(MediaRecord(9L, MediaMeta("image/bmp", 4, 4, 0, 0L),
      MediaPipeline.encodeBmp(4, 4, rgb))).toDS()
    val out = MediaPipeline.resizeImage(media, 2, 2).collect().head
    assert(out.meta.width == 2 && out.meta.height == 2)
    val img = MediaPipeline.decodeImage(out.bytes).get
    assert(img.getWidth == 2 && img.getHeight == 2)
    for (y <- 0 until 2; x <- 0 until 2)
      assert((img.getRGB(x, y) & 0xffffff) == ((40 << 16) | (80 << 8) | 120))
  }

  test("imagePHash: hand-computable bits, scale invariance, loud corrupt failure") {
    // 8x8 grayscale ramp: pixel (y*8+x) has value y*8+x (lum = 3v);
    // mean lum = 3*31 (floor of 3*63/2 summed exactly: Σ3v/64 = 94),
    // so exactly the cells with 3v > 94 (v >= 32) set their bit —
    // the high 32 cells, i.e. bits 32..63
    val ramp = Array.tabulate(64)(i => i.toByte)
    def gray(px: Array[Byte], w: Int, h: Int) = {
      val rgb = new Array[Byte](w * h * 3)
      px.indices.foreach { i =>
        rgb(i * 3) = px(i); rgb(i * 3 + 1) = px(i); rgb(i * 3 + 2) = px(i)
      }
      MediaPipeline.encodeBmp(w, h, rgb)
    }
    val media = Seq(MediaRecord(1L, MediaMeta("image/bmp", 8, 8, 0, 0L),
      gray(ramp, 8, 8))).toDS()
    val got = MediaPipeline.imagePHash(media).collect().head
    assert(got.media_id == 1L && got.width == 8 && got.height == 8)
    val wantMean = ramp.map(v => 3L * (v & 0xff)).sum / 64
    val want = ramp.indices.filter(i => 3L * (ramp(i) & 0xff) > wantMean)
      .foldLeft(0L)((a, i) => a | (1L << i))
    assert(got.phash == want)
    // a 16x16 nearest-neighbor upscale pools back to the SAME hash —
    // the resize invariance that makes the hash perceptual
    val up = MediaPipeline.resizeImage(media, 16, 16)
    val upHash = MediaPipeline.imagePHash(up).collect().head
    assert(upHash.phash == got.phash, "2x upscale must not move the hash")
    // solid image: no cell strictly exceeds the mean → hash 0
    val solid = Seq(MediaRecord(2L, MediaMeta("image/bmp", 8, 8, 0, 0L),
      gray(Array.fill(64)(77.toByte), 8, 8))).toDS()
    assert(MediaPipeline.imagePHash(solid).collect().head.phash == 0L)
    // corrupt payload fails loudly (the imageChannelStats contract)
    val bad = Seq(MediaRecord(3L, MediaMeta("image/bmp", 8, 8, 0, 0L),
      "junk".getBytes("UTF-8"))).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      MediaPipeline.imagePHash(bad).collect() }
    assert(e.getMessage.contains("not a decodable image")
      || Option(e.getCause).exists(_.getMessage.contains("not a decodable image")))
    // an image too small for the 8x8 grid is a loud error, not a hash
    val tiny = Seq(MediaRecord(4L, MediaMeta("image/bmp", 4, 4, 0, 0L),
      gray(Array.fill(16)(9.toByte), 4, 4))).toDS()
    val e2 = intercept[org.apache.spark.SparkException] {
      MediaPipeline.imagePHash(tiny).collect() }
    assert(e2.getMessage.contains("8x8")
      || Option(e2.getCause).exists(_.getMessage.contains("8x8")))
  }

  test("WAV encode → JDK javax.sound decode round-trips samples exactly") {
    // stereo, includes negative samples, extremes, and asymmetric
    // channels — any header-bit error and the JDK parser rejects it or
    // the samples shift
    val samples = Array[Short](0, -1, 32767, -32768, 1000, -1000, 257, -257)
    val wav = MediaPipeline.encodeWav(8000, 2, samples)
    val pcm = MediaPipeline.decodeWav(wav).get
    assert(pcm.channels == 2 && pcm.sampleRateHz == 8000)
    assert(pcm.samples.toSeq == samples.toSeq)
    // mono at a different rate too
    val mono = MediaPipeline.decodeWav(MediaPipeline.encodeWav(44100, 1, samples)).get
    assert(mono.channels == 1 && mono.sampleRateHz == 44100)
    assert(mono.samples.toSeq == samples.toSeq)
  }

  test("audioChannelStats sums real decoded samples; corrupt payloads fail loudly") {
    val samples = Array[Short](10, -20, 30, -40, 50, -60) // L: 10,30,50  R: -20,-40,-60
    val media = Seq(MediaRecord(11L, MediaMeta("audio/wav", 0, 0, 8000, 0L),
      MediaPipeline.encodeWav(8000, 2, samples))).toDS()
    val st = MediaPipeline.audioChannelStats(media).collect().sortBy(_.channel)
    assert(st.length == 2)
    assert(st(0) == MediaPipeline.AudioChannelStats(11L, 0, 8000, 3L, 90L))
    assert(st(1) == MediaPipeline.AudioChannelStats(11L, 1, 8000, 3L, -120L))
    val bad = Seq(rec(12, "not audio either")).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      MediaPipeline.audioChannelStats(bad).collect() }
    assert(e.getMessage.contains("not decodable 16-bit PCM WAV")
      || Option(e.getCause).exists(_.getMessage.contains("not decodable 16-bit PCM WAV")))
    // a TRUNCATED wav (valid header prefix, cut mid-data) must also fail
    // loudly, not decode partially silent
    val cut = MediaPipeline.encodeWav(8000, 2, samples).take(20)
    val badCut = Seq(MediaRecord(13L, MediaMeta("audio/wav", 0, 0, 8000, 0L), cut)).toDS()
    intercept[org.apache.spark.SparkException] {
      MediaPipeline.audioChannelStats(badCut).collect() }
  }

  test("resampleAudio decodes, rate-converts and re-encodes real PCM") {
    // constant-valued channels: any frame pick preserves values exactly
    val samples = Array.tabulate[Short](16)(i => if (i % 2 == 0) 500 else -700)
    val media = Seq(MediaRecord(14L, MediaMeta("audio/wav", 0, 0, 8000, 1L),
      MediaPipeline.encodeWav(8000, 2, samples))).toDS()
    val out = MediaPipeline.resampleAudio(media, 4000).collect().head
    assert(out.meta.sampleRateHz == 4000)
    val pcm = MediaPipeline.decodeWav(out.bytes).get
    assert(pcm.sampleRateHz == 4000 && pcm.channels == 2)
    assert(pcm.samples.length == 8) // 8 frames → 4 frames × 2 channels
    assert(pcm.samples.toSeq == Seq[Short](500, -700, 500, -700, 500, -700, 500, -700))
  }

  test("animated GIF encode → JDK ImageIO multi-frame decode round-trips pixels") {
    // 3 frames of 4x3 gray with full-range values (0, 255, mid) — the
    // palette path must be lossless, not quantized
    val frames = Seq(
      Array.tabulate[Byte](12)(i => (i * 21).toByte),
      Array.tabulate[Byte](12)(i => (255 - i * 9).toByte),
      Array.fill[Byte](12)(0x80.toByte))
    val gif = MediaPipeline.encodeGif(4, 3, frames)
    val back = MediaPipeline.decodeGifFrames(gif)
    assert(back.size == 3)
    for ((img, fi) <- back.zipWithIndex) {
      assert(img.getWidth == 4 && img.getHeight == 3)
      for (y <- 0 until 3; x <- 0 until 4) {
        val v = frames(fi)(y * 4 + x) & 0xff
        assert((img.getRGB(x, y) & 0xffffff) == ((v << 16) | (v << 8) | v),
          s"frame $fi pixel ($x,$y)")
      }
    }
    // a frame large enough to exercise the periodic-CLEAR cadence and
    // multiple 255-byte sub-blocks
    val big = Array.tabulate[Byte](64 * 64)(i => ((i * 7) % 256).toByte)
    val bigBack = MediaPipeline.decodeGifFrames(MediaPipeline.encodeGif(64, 64, Seq(big)))
    assert(bigBack.size == 1)
    val sums = (0 until 64).flatMap(y => (0 until 64).map(x =>
      bigBack.head.getRGB(x, y) & 0xff)).map(_.toLong).sum
    assert(sums == big.map(v => (v & 0xff).toLong).sum)
  }

  test("videoFrameStats sums real decoded frames; sampleGifFrames transcodes to BMP") {
    val frames = Seq(
      Array.fill[Byte](16)(10), Array.fill[Byte](16)(20),
      Array.fill[Byte](16)(30), Array.fill[Byte](16)(40))
    val media = Seq(MediaRecord(21L, MediaMeta("video/gif", 4, 4, 0, 0L),
      MediaPipeline.encodeGif(4, 4, frames))).toDS()
    val st = MediaPipeline.videoFrameStats(media).collect().sortBy(_.frame_idx)
    assert(st.map(_.sum_gray).toSeq == Seq(160L, 320L, 480L, 640L))
    assert(st.forall(s => s.width == 4 && s.height == 4))
    // every 2nd frame, re-encoded as a standalone decodable BMP
    val sampled = MediaPipeline.sampleGifFrames(media, stride = 2)
      .collect().sortBy(_._2)
    assert(sampled.map(_._2).toSeq == Seq(0, 2))
    val f2 = MediaPipeline.decodeImage(sampled(1)._3).get
    assert((f2.getRGB(1, 1) & 0xff) == 30)
    // corrupt payloads fail loudly
    val bad = Seq(rec(22, "definitely not a gif")).toDS()
    intercept[org.apache.spark.SparkException] {
      MediaPipeline.videoFrameStats(bad).collect() }
  }

  test("parseContainerMeta reads headers of all three containers without decoding") {
    // BMP 3x2
    val bmp = MediaPipeline.parseContainerMeta(1L,
      MediaPipeline.encodeBmp(3, 2, new Array[Byte](18)))
    assert(bmp == MediaPipeline.ContainerMeta(1L, "bmp",
      Some(3L), Some(2L), Some(1L), None, None))
    // WAV: 2 channels, 11025 Hz, 7 frames (14 interleaved samples)
    val wav = MediaPipeline.parseContainerMeta(2L,
      MediaPipeline.encodeWav(11025, 2, new Array[Short](14)))
    assert(wav == MediaPipeline.ContainerMeta(2L, "wav",
      None, None, Some(7L), Some(2L), Some(11025L)))
    // GIF: 4x3, 3 frames — the writer emits a global palette and LZW
    // sub-blocks the walker must skip by length, never decompress
    val gif = MediaPipeline.parseContainerMeta(3L,
      MediaPipeline.encodeGif(4, 3, Seq.fill(3)(new Array[Byte](12))))
    assert(gif == MediaPipeline.ContainerMeta(3L, "gif",
      Some(4L), Some(3L), Some(3L), None, None))
  }

  test("parseContainerMeta fails loudly on unknown or truncated payloads") {
    intercept[IllegalArgumentException] {
      MediaPipeline.parseContainerMeta(9L, "not a container at all".getBytes("UTF-8")) }
    intercept[IllegalArgumentException] {
      MediaPipeline.parseContainerMeta(9L, Array[Byte](1, 2, 3)) }
    // a GIF cut mid-stream must throw, not return a frame count
    val whole = MediaPipeline.encodeGif(4, 4, Seq.fill(2)(new Array[Byte](16)))
    intercept[IllegalArgumentException] {
      MediaPipeline.parseContainerMeta(9L, whole.dropRight(whole.length / 3)) }
  }

  test("media parquet round-trip keeps the blob and struct columns") {
    val out = java.nio.file.Files.createTempDirectory("graft-media").toString + "/m"
    Seq(rec(1, "hello"), rec(2, "world")).toDS().write.parquet(out)
    val back = spark.read.parquet(out)
    assert(back.schema("bytes").dataType.typeName == "binary")
    assert(back.select("meta.kind").distinct().collect().head.getString(0) == "image")
    val ds = back.as[MediaRecord]
    assert(new String(ds.filter(_.media_id == 1L).collect().head.bytes, "UTF-8") == "hello")
  }
}
