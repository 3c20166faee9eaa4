package graft.ext

import graft.SparkSpec
import graft.Tables

class MultimodalSpec extends SparkSpec {

  test("media table schema: opaque binary + typed metadata") {
    val media = Multimodal.mediaFromDocuments(Tables.documents(spark, "/root/testdata/sf0.001"))
    val s = media.schema
    assert(s("content").dataType.typeName === "binary")
    assert(s("format").dataType.typeName === "string")
    assert(s("width").dataType.typeName === "integer")
    assert(media.count() > 0)
  }

  test("decodeStub is deterministic and fixed-width") {
    val a = Multimodal.decodeStub("some bytes here".getBytes("UTF-8"))
    val b = Multimodal.decodeStub("some bytes here".getBytes("UTF-8"))
    assert(a.toSeq === b.toSeq)
    assert(a.length === 8)
    assert(Multimodal.decodeStub(Array.emptyByteArray).toSeq === Seq.fill(8)(0f))
  }

  test("frame sampling takes every k-th byte") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val sampled = Multimodal.sampleFrames(bytes, 10)
    assert(sampled.length === 10)
    assert(sampled.toSeq === Seq(0, 10, 20, 30, 40, 50, 60, 70, 80, 90).map(_.toByte))
  }

  test("png lane: real imageio encode/decode round-trips dims and channel means") {
    // local codec check first: exact values, no Spark involved
    val bytes = Multimodal.pngEncode(mediaId = 3L, width = 5, height = 4)
    assert(bytes.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte),
      "payload must be a real PNG (magic bytes)")
    val st = Multimodal.pngDecodeStats(3L, bytes)
    assert((st.width, st.height) === (5, 4))
    assert(st.mean_r === 3.0)          // constant fill id%256
    assert(st.mean_g === (3 * 7 + 31) % 256.0)
    assert(st.mean_b === 1.5)          // gradient mean (h-1)/2

    // distributed: generation + decode inside mapPartitions over documents
    val stats = Multimodal.decodePngFeatures(
      Multimodal.pngMedia(Tables.documents(spark, "/root/testdata/sf0.001")))
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { s =>
      assert(s.mean_r === (s.media_id % 256).toDouble)
      assert(s.mean_b === (s.height - 1) / 2.0)
      assert(s.byte_len > 8)
    }
  }

  test("extractFeatures: distributed batched decode with stable output schema") {
    val media = Multimodal.mediaDataset(Tables.documents(spark, "/root/testdata/sf0.001"))
    val feats = Multimodal.extractFeatures(media, frameStride = 16, batchSize = 8)
    val rows = feats.collect()
    assert(rows.length === media.count())
    rows.foreach { f =>
      assert(f.features.length === 8)
      assert(f.byte_len > 0)
      assert(f.frames_sampled === (f.byte_len + 15) / 16)
    }
  }
}
