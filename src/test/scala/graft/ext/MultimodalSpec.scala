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
