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

  test("resize updates metadata dimensions and stays deterministic") {
    val ds = Seq(rec(1, "0123456789abcdef")).toDS()
    val out = MediaPipeline.resize(ds, 2, 2).collect().head
    assert(out.meta.width == 2 && out.meta.height == 2)
    assert(out.media_id == 1L && out.bytes.nonEmpty)
    val again = MediaPipeline.resize(ds, 2, 2).collect().head
    assert(out.bytes.toSeq == again.bytes.toSeq)
  }

  test("resize survives null and empty payloads from fromDocuments") {
    val docs = Seq(
        (0L, "some real text"),
        (1L, null.asInstanceOf[String]), // null text → null bytes
        (2L, ""))                        // empty text → empty bytes
      .toDF("doc_id", "text")
    val out = MediaPipeline.resize(MediaPipeline.fromDocuments(docs), 2, 2)
      .collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(0L, 1L, 2L))
    assert(out.forall(r => r.meta.width == 2 && r.meta.height == 2))
    assert(out(0).bytes.nonEmpty)
    assert(out(1).bytes.isEmpty && out(2).bytes.isEmpty)
  }

  test("sampleFrames emits one row per sampled frame with ordered indices") {
    val ds = Seq(rec(1, "aabbccddeeffgghh"), rec(2, "")).toDS()
    val frames = MediaPipeline.sampleFrames(ds, frameCount = 8, stride = 2)
      .collect().sortBy(f => (f._1, f._2))
    assert(frames.map(_._1).forall(_ == 1L)) // empty payload emits nothing
    assert(frames.map(_._2).toSeq == Seq(0, 2, 4, 6))
    assert(frames.forall(_._3.length == 2)) // 16 bytes / 8 frames
    assert(new String(frames.head._3, "UTF-8") == "aa")
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
