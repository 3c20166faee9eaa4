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

  test("jpeg lane: real lossy round-trip — exact dims, means inside the DC band") {
    // local codec check: real JPEG magic, exact dims, bounded channel error
    val bytes = Multimodal.jpegEncode(mediaId = 42L, width = 13, height = 7)
    assert(bytes.take(2).toSeq === Seq(0xff.toByte, 0xd8.toByte),
      "payload must be a real JPEG (SOI marker)")
    val st = Multimodal.pngDecodeStats(42L, bytes)
    assert((st.width, st.height) === (13, 7), "JPEG preserves dimensions exactly")
    assert(math.abs(st.mean_r - 42.0) <= 4.0)
    assert(math.abs(st.mean_g - (42 * 7 + 31) % 256.0) <= 4.0)
    assert(math.abs(st.mean_b - (42 * 13 + 7) % 256.0) <= 4.0)

    // channel-swap sentinel: an id whose three fills are far apart — a
    // swapped channel would miss by far more than the tolerance
    val far = Multimodal.pngDecodeStats(10L,
      Multimodal.jpegEncode(mediaId = 10L, width = 16, height = 16))
    assert(math.abs(far.mean_r - 10.0) <= 4.0)     // r=10, g=101, b=137
    assert(math.abs(far.mean_g - 101.0) <= 4.0)
    assert(math.abs(far.mean_b - 137.0) <= 4.0)

    // distributed: every fixture image round-trips within tolerance
    val stats = Multimodal.decodePngFeatures(
      Multimodal.jpegMedia(Tables.documents(spark, "/root/testdata/sf0.001")))
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { s =>
      assert(math.abs(s.mean_r - (s.media_id % 256).toDouble) <= 4.0,
        s"media ${s.media_id} mean_r ${s.mean_r}")
      assert(math.abs(s.mean_g - ((s.media_id * 7 + 31) % 256).toDouble) <= 4.0)
      assert(math.abs(s.mean_b - ((s.media_id * 13 + 7) % 256).toDouble) <= 4.0)
      assert(s.byte_len > 2)
    }
  }

  test("wav lane: real javax.sound round-trip — container parsed, stats exact") {
    // local codec check: RIFF magic, format survives, closed-form stats
    val bytes = Multimodal.wavEncode(mediaId = 7L, nSamples = 370)
    assert(new String(bytes.take(4), "US-ASCII") === "RIFF",
      "payload must be a real WAV container")
    val st = Multimodal.wavDecodeStats(7L, bytes)
    assert(st.n_samples === 370L)
    assert(st.sample_rate === 16000)
    // exact values from the integer sawtooth closed form (id=7, n=370)
    assert(st.mean_sample === -31259.5)
    assert(st.rms === 31268.440071420257)

    // distributed: every fixture clip round-trips to its closed form
    val stats = Multimodal.decodeWavStats(
      Multimodal.wavMedia(Tables.documents(spark, "/root/testdata/sf0.001")))
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { s =>
      var sum = 0L; var sq = 0L
      var i = 0L
      while (i < s.n_samples) {
        val x = (s.media_id * 31 + i * 7) % 65536 - 32768
        sum += x; sq += x * x; i += 1
      }
      assert(s.mean_sample === sum.toDouble / s.n_samples, s"mean for ${s.media_id}")
      assert(s.rms === math.sqrt(sq.toDouble / s.n_samples), s"rms for ${s.media_id}")
    }
  }

  test("gif lane: real multi-frame container — frame count, sampling, exact fills") {
    // local codec check: GIF89a magic, all frames present, per-frame fills
    val bytes = Multimodal.gifEncode(mediaId = 9L, width = 6, height = 4, nFrames = 5)
    assert(new String(bytes.take(6), "US-ASCII") === "GIF89a",
      "payload must be a real animated-GIF container")
    val all = Multimodal.gifDecodeFrameStats(9L, bytes, stride = 1)
    assert(all.map(_.frame_idx) === Seq(0, 1, 2, 3, 4), "stride 1 reads every frame")
    assert(all.forall(_.n_frames === 5))
    all.foreach { f =>
      assert(f.width === 6 && f.height === 4)
      assert(f.mean_r === ((9L + 17L * f.frame_idx) % 256).toDouble, s"r frame ${f.frame_idx}")
      assert(f.mean_g === ((9L * 7 + 31 + 11L * f.frame_idx) % 256).toDouble)
      assert(f.mean_b === ((9L * 13 + 7 + 29L * f.frame_idx) % 256).toDouble)
    }
    // sampling: stride 2 takes frames 0,2,4 — real frame access, not bytes
    assert(Multimodal.gifDecodeFrameStats(9L, bytes, stride = 2)
      .map(_.frame_idx) === Seq(0, 2, 4))

    // distributed: fixture animations round-trip their closed forms
    val stats = Multimodal.decodeGifFrames(
      Multimodal.gifMedia(Tables.documents(spark, "/root/testdata/sf0.001")),
      stride = 2).collect()
    assert(stats.nonEmpty)
    stats.foreach { f =>
      assert(f.n_frames === (f.media_id % 5 + 2).toInt, s"frames for ${f.media_id}")
      assert(f.frame_idx % 2 === 0)
      assert(f.mean_r === ((f.media_id + 17L * f.frame_idx) % 256).toDouble,
        s"fill for ${f.media_id}/${f.frame_idx}")
    }
    // every doc contributes ceil(n_frames/2) sampled frames
    val perDoc = stats.groupBy(_.media_id)
    perDoc.foreach { case (id, fs) =>
      assert(fs.length === (fs.head.n_frames + 1) / 2, s"sampled count for $id")
    }
  }

  test("thumbnail kernel: 2x2 block means exact on the gradient, odd edges dropped") {
    // 9x7 gradient PNG (id=5): thumb 4x3; blue rows are trunc((8y+2)/4)=2y,
    // so mean_b = h2-1 = 2 exactly; R/G are the solid fills
    val t = Multimodal.pngThumbStats(5L, Multimodal.pngEncode(5L, 9, 7))
    assert((t.thumb_w, t.thumb_h) === ((4, 3)))
    assert(t.mean_r === 5.0 && t.mean_g === (5 * 7 + 31) % 256.0)
    assert(t.mean_b === 2.0, "gradient block average must telescope to h2-1")
    // even dims: same closed forms, nothing dropped
    val e = Multimodal.pngThumbStats(9L, Multimodal.pngEncode(9L, 8, 6))
    assert((e.thumb_w, e.thumb_h, e.mean_b) === ((4, 3, 2.0)))
    // no 2x2 block -> out of domain, loudly
    intercept[IllegalArgumentException] {
      Multimodal.pngThumbStats(1L, Multimodal.pngEncode(1L, 1, 5))
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

  /** Fresh fixture dir (fresh cache key): copy the sf0.001 documents parquet
    * into a new temp dir, so each test run exercises a cold cache. */
  private def freshFixtureDir(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_media_spec_").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/documents.parquet"),
      java.nio.file.Paths.get(dir + "/documents.parquet"))
    dir
  }

  private def tmpSiblings(path: String): Seq[java.io.File] = {
    val f = new java.io.File(path)
    Option(f.getParentFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(f.getName + ".tmp-")).toSeq
  }

  test("media cache publish: two concurrent writers land one complete snapshot") {
    val dir = freshFixtureDir()
    val docs = Tables.documents(spark, dir)
    val expected = docs.count()
    val path = Multimodal.mediaCachePath(dir)
    assert(!new java.io.File(path).exists())

    // both threads race the full encode+publish; neither may observe a
    // partial directory or crash on the loser's rename
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = Seq.fill(2)(Future(Multimodal.pngMediaCached(docs, dir).count()))
    val counts = Await.result(Future.sequence(runs), 5.minutes)
    assert(counts === Seq(expected, expected))

    assert(new java.io.File(path + "/_SUCCESS").exists(), "published snapshot must be complete")
    assert(tmpSiblings(path).isEmpty, "the losing writer must clean up its temp dir")
    // a follow-up call is a pure cache read of the same complete snapshot
    assert(Multimodal.pngMediaCached(docs, dir).count() === expected)
  }

  test("media cache publish: stale partial target (no _SUCCESS) is repaired, orphan tmp dirs swept") {
    val dir = freshFixtureDir()
    val docs = Tables.documents(spark, dir)
    val path = Multimodal.mediaCachePath(dir)

    // simulate a pre-atomic writer that crashed mid-write: a target dir with
    // data but no _SUCCESS marker
    new java.io.File(path).mkdirs()
    java.nio.file.Files.write(java.nio.file.Paths.get(path + "/part-stale.parquet"),
      "not parquet".getBytes)
    // plus an orphan temp dir from a crashed writer, backdated past the sweep
    // cutoff, and a YOUNG one that must survive (could be an in-flight writer)
    val orphan = new java.io.File(path + ".tmp-orphan")
    orphan.mkdirs()
    orphan.setLastModified(System.currentTimeMillis() - 2L * 60 * 60 * 1000)
    val inflight = new java.io.File(path + ".tmp-inflight")
    inflight.mkdirs()

    val n = Multimodal.pngMediaCached(docs, dir).count()
    assert(n === docs.count(), "repair must serve the complete fresh snapshot")
    assert(new java.io.File(path + "/_SUCCESS").exists(), "stale partial dir must be replaced")
    assert(!new java.io.File(path + "/part-stale.parquet").exists(),
      "stale partial contents must be gone")
    assert(!orphan.exists(), "backdated orphan tmp dir must be swept")
    assert(inflight.exists(), "young tmp dir must survive the sweep")
    org.apache.commons.io.FileUtils.deleteDirectory(inflight)
  }
}
