package graft.sink

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** The native compression frame (checksum/method/sizes/LZ4 block) + the
  * CityHash128 v1.0.2 checksum hash: structure pins, round trips, loud
  * failure on any tampered byte. */
class ChNativeCodecSpec extends AnyFunSuite {

  private def bytes(n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((i * 31 + 7) & 0xFF).toByte)

  test("frame layout: method 0x82, compressed_size includes the 9 header bytes, sizes LE") {
    val data = "hello clickhouse".getBytes("UTF-8")
    val f = ChNativeCodec.compressFrame(data, 0, data.length)
    assert((f(16) & 0xFF) === 0x82, "method byte after the 16-byte checksum")
    val compressedSize = (f(17) & 0xFF) | ((f(18) & 0xFF) << 8) |
      ((f(19) & 0xFF) << 16) | ((f(20) & 0xFF) << 24)
    val uncompressedSize = (f(21) & 0xFF) | ((f(22) & 0xFF) << 8) |
      ((f(23) & 0xFF) << 16) | ((f(24) & 0xFF) << 24)
    assert(compressedSize === f.length - 16, "compressed_size spans method..end")
    assert(uncompressedSize === data.length)
  }

  test("round trip: single frame, multi-frame split, empty, incompressible") {
    for (n <- Seq(1, 100, 5000, 1 << 18)) {
      val data = bytes(n)
      val out = new ByteArrayOutputStream()
      ChNativeCodec.writeFrames(out, data, blockBytes = 4096) // force splits
      val back = ChNativeCodec.readFrames(new ByteArrayInputStream(out.toByteArray))
      assert(back.toSeq === data.toSeq, s"n=$n")
    }
    // empty body → zero frames → empty result
    val out = new ByteArrayOutputStream()
    ChNativeCodec.writeFrames(out, Array.emptyByteArray)
    assert(out.size() === 0)
    assert(ChNativeCodec.readFrames(new ByteArrayInputStream(Array.emptyByteArray)).isEmpty)
    // random-ish (incompressible) data still round-trips
    var seed = 99L
    val rnd = Array.fill(10000) {
      seed = seed * 6364136223846793005L + 1442695040888963407L; (seed >>> 56).toByte
    }
    val o2 = new ByteArrayOutputStream()
    ChNativeCodec.writeFrames(o2, rnd)
    assert(ChNativeCodec.readFrames(new ByteArrayInputStream(o2.toByteArray)).toSeq === rnd.toSeq)
  }

  test("every tampered byte position fails loudly — checksum, header, or data") {
    val data = bytes(300)
    val frame = ChNativeCodec.compressFrame(data, 0, data.length)
    for (pos <- 0 until frame.length) {
      val bad = frame.clone()
      bad(pos) = (bad(pos) ^ 0x40).toByte
      val r = scala.util.Try(
        ChNativeCodec.readFrames(new ByteArrayInputStream(bad)))
      assert(r.isFailure || r.get.toSeq != data.toSeq,
        s"flip at $pos must not yield silently-correct data")
      // flips outside the checksum itself must be DETECTED (checksum flips
      // are detected because the recomputed hash no longer matches)
      if (r.isSuccess)
        fail(s"flip at $pos decoded to ${r.get.length} bytes without error")
    }
  }

  test("truncation at any boundary is loud") {
    val data = bytes(100)
    val frame = ChNativeCodec.compressFrame(data, 0, data.length)
    for (cut <- Seq(5, 16, 20, 24, frame.length - 1)) {
      intercept[IllegalArgumentException] {
        ChNativeCodec.readFrames(new ByteArrayInputStream(frame.take(cut)))
      }
    }
  }

  test("CityHash128 v1.0.2: determinism, avalanche, length sensitivity, path coverage") {
    // paths: <8, 8..15, 16..127 (CityMurmur), >=128 loop, >=128 with tail
    for (n <- Seq(0, 3, 7, 8, 15, 16, 64, 127, 128, 256, 300, 1024)) {
      val b = bytes(n)
      val h1 = CityHash102.cityHash128(b, 0, n)
      val h2 = CityHash102.cityHash128(b.clone(), 0, n)
      assert(h1 === h2, s"deterministic at n=$n")
      if (n > 0) {
        val flipped = b.clone()
        flipped(n / 2) = (flipped(n / 2) ^ 1).toByte
        assert(CityHash102.cityHash128(flipped, 0, n) !== h1, s"avalanche at n=$n")
      }
      if (n > 1)
        assert(CityHash102.cityHash128(b, 0, n - 1) !== h1, s"length-sensitive at n=$n")
    }
    // offset independence: hashing a slice equals hashing the copied slice
    val big = bytes(600)
    val slice = java.util.Arrays.copyOfRange(big, 100, 500)
    assert(CityHash102.cityHash128(big, 100, 400) ===
      CityHash102.cityHash128(slice, 0, 400))
  }

  test("CityHash128 v1.0.2: pinned vectors (freeze the implementation against drift)") {
    // Golden self-consistency vectors: no live ClickHouse exists in the
    // sandbox to cross-check against, so these pin THIS implementation —
    // any accidental change to the 1.0.2 control flow breaks them.
    def hex(b: Array[Byte]): (String, String) = {
      val (lo, hi) = CityHash102.cityHash128(b, 0, b.length)
      (java.lang.Long.toHexString(lo), java.lang.Long.toHexString(hi))
    }
    assert(hex(Array.emptyByteArray) === ("3df09dfc64c09a2b", "3cb540c392e51e29"))
    assert(hex("a".getBytes("UTF-8")) === ("d27139a1afe01ad0", "fd7e8ee2e4c86cf6"))
    assert(hex("0123456789abcdef".getBytes("UTF-8")) // 16 B: seed-from-prefix path
      === ("c52ea1adb29e4800", "7369a2fab076de4c"))
    assert(hex(bytes(200)) // >=128: main loop + tail chunks
      === ("2a2149dde0669f14", "32deb8c10c1ef4b0"))
  }

  test("FrameOutputStream: incremental writes frame identically to one-shot writeFrames") {
    val data = bytes(1000)
    // incremental: mixed single-byte and ragged array writes, 256-byte frames
    val inc = new ByteArrayOutputStream()
    val fos = new ChNativeCodec.FrameOutputStream(inc, blockBytes = 256)
    fos.write(data(0) & 0xFF)
    fos.write(data, 1, 300)   // crosses a frame boundary mid-write
    fos.write(data, 301, 5)
    fos.write(data, 306, 694)
    fos.close()
    assert(fos.framesWritten === 4, "1000 bytes at 256/frame = 3 full + 1 partial")
    // one-shot reference
    val ref = new ByteArrayOutputStream()
    ChNativeCodec.writeFrames(ref, data, blockBytes = 256)
    assert(inc.toByteArray.toSeq === ref.toByteArray.toSeq,
      "same data + blockBytes must produce byte-identical frames")
    // and the stream decodes back to the original
    assert(ChNativeCodec.readFrames(
      new ByteArrayInputStream(inc.toByteArray)).toSeq === data.toSeq)
  }

  test("FrameOutputStream: bounded buffer — a partial frame only flushes on close; empty stream = no frames") {
    val out = new ByteArrayOutputStream()
    val fos = new ChNativeCodec.FrameOutputStream(out, blockBytes = 1 << 20)
    fos.write(bytes(100), 0, 100)
    assert(out.size() === 0, "under one blockBytes nothing is on the wire yet")
    fos.close()
    assert(fos.framesWritten === 1)
    assert(ChNativeCodec.readFrames(
      new ByteArrayInputStream(out.toByteArray)).toSeq === bytes(100).toSeq)
    val empty = new ByteArrayOutputStream()
    new ChNativeCodec.FrameOutputStream(empty, 256).close()
    assert(empty.size() === 0, "no data -> no frames (matches writeFrames)")
  }
}
