package graft.sink

import java.io.{ByteArrayOutputStream, InputStream, OutputStream}

import net.jpountz.lz4.LZ4Factory

/** ClickHouse's native compression framing — the LZ4 transport the
  * reference's client puts on its insert bodies (`Cargo.toml:21` lz4
  * feature; pooled hyper client `src/main.rs:238-277`). This is the PUBLIC
  * format ClickHouse documents for `decompress=1` / `compress=1` HTTP
  * bodies (and the native TCP protocol):
  *
  * {{{
  *   frame := checksum(16) method(1) compressed_size(4 LE) uncompressed_size(4 LE) data
  *   checksum       = CityHash128 v1.0.2 of [method .. end of data],
  *                    written as two UInt64 halves, each little-endian
  *   method         = 0x82 for LZ4 (raw LZ4 block format)
  *   compressed_size INCLUDES the 9 header bytes after the checksum
  * }}}
  *
  * LZ4 block compression comes from lz4-java on the Spark classpath (the
  * same library Spark's shuffle uses) — raw block format, exactly what
  * ClickHouse's LZ4_compress_default produces/consumes.
  *
  * A body is a SEQUENCE of frames (bounded uncompressed block size keeps
  * server-side buffers bounded at 100 TB ingest); the decoder verifies
  * every checksum and size field and fails loudly on mismatch — corrupt
  * transport must never become silently-wrong rows.
  */
object ChNativeCodec {

  val MethodLz4 = 0x82
  /** Default uncompressed block bound (ClickHouse's own default buffer). */
  val DefaultBlockBytes: Int = 1 << 20

  private lazy val factory = LZ4Factory.fastestInstance()

  private def intLE(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >>> 8) & 0xFF)
    out.write((v >>> 16) & 0xFF); out.write((v >>> 24) & 0xFF)
  }

  private def longLE(out: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  /** One frame for `data[from, from+len)`. */
  def compressFrame(data: Array[Byte], from: Int, len: Int): Array[Byte] = {
    val compressor = factory.fastCompressor()
    val compressed = new Array[Byte](compressor.maxCompressedLength(len))
    val clen = compressor.compress(data, from, len, compressed, 0, compressed.length)
    // header-after-checksum + data, hashed as one region
    val hashed = new ByteArrayOutputStream(9 + clen)
    hashed.write(MethodLz4)
    intLE(hashed, 9 + clen)
    intLE(hashed, len)
    hashed.write(compressed, 0, clen)
    val body = hashed.toByteArray
    val (lo, hi) = CityHash102.cityHash128(body, 0, body.length)
    val out = new ByteArrayOutputStream(16 + body.length)
    longLE(out, lo)
    longLE(out, hi)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** Stream `data` as frames of at most `blockBytes` uncompressed each
    * (empty data → no frames). */
  def writeFrames(out: OutputStream, data: Array[Byte],
      blockBytes: Int = DefaultBlockBytes): Unit = {
    var off = 0
    while (off < data.length) {
      val n = math.min(blockBytes, data.length - off)
      out.write(compressFrame(data, off, n))
      off += n
    }
  }

  /** Incremental framing stream (VERDICT r14 #4): callers write plain bytes
    * as they produce them; a frame is emitted each time `blockBytes` of
    * uncompressed data accumulate, and the remainder flushes on close. The
    * buffer is bounded at ONE frame — the reference's streamed-insert memory
    * property (`README.md:3-5`) — unlike buffering a whole partition and
    * calling [[writeFrames]] once. Byte-compatible with [[writeFrames]] for
    * the same data and blockBytes (identical chunk boundaries).
    */
  final class FrameOutputStream(out: OutputStream,
      blockBytes: Int = DefaultBlockBytes) extends OutputStream {
    private val buf = new Array[Byte](blockBytes)
    private var n = 0
    var framesWritten: Long = 0L

    override def write(b: Int): Unit = {
      buf(n) = b.toByte
      n += 1
      if (n == blockBytes) emit()
    }

    override def write(bs: Array[Byte], off: Int, len: Int): Unit = {
      var o = off
      var left = len
      while (left > 0) {
        val take = math.min(blockBytes - n, left)
        System.arraycopy(bs, o, buf, n, take)
        n += take; o += take; left -= take
        if (n == blockBytes) emit()
      }
    }

    private def emit(): Unit = if (n > 0) {
      out.write(compressFrame(buf, 0, n))
      framesWritten += 1
      n = 0
    }

    override def flush(): Unit = out.flush() // partial frames only emit on close

    override def close(): Unit = { emit(); out.close() }
  }

  private def readFully(in: InputStream, buf: Array[Byte], off: Int, len: Int): Boolean = {
    var got = 0
    while (got < len) {
      val n = in.read(buf, off + got, len - got)
      if (n < 0) return false
      got += n
    }
    true
  }

  private def readLongLE(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xFFL); i -= 1 }
    v
  }

  private def readIntLE(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)

  /** Decode a whole stream of frames, verifying every checksum. The hashed
    * region is [method .. end of data] — exactly what [[compressFrame]]
    * hashed — so a flipped bit anywhere in header-after-checksum or data
    * fails here, never downstream as wrong rows. */
  def readFrames(in: InputStream, maxBytes: Long = 1L << 31): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val checksum = new Array[Byte](16)
    var first = in.read()
    while (first >= 0) {
      checksum(0) = first.toByte
      if (!readFully(in, checksum, 1, 15))
        throw new IllegalArgumentException("truncated frame checksum")
      val header = new Array[Byte](9)
      if (!readFully(in, header, 0, 9))
        throw new IllegalArgumentException("truncated frame header")
      val method = header(0) & 0xFF
      if (method != MethodLz4)
        throw new IllegalArgumentException(f"unsupported compression method 0x$method%02x")
      val compressedSize = readIntLE(header, 1)
      val uncompressedSize = readIntLE(header, 5)
      if (compressedSize < 9 || uncompressedSize < 0 ||
          out.size().toLong + uncompressedSize > maxBytes)
        throw new IllegalArgumentException(
          s"hostile frame sizes: compressed $compressedSize, uncompressed $uncompressedSize")
      val body = new Array[Byte](compressedSize) // method+sizes+data, as hashed
      System.arraycopy(header, 0, body, 0, 9)
      if (!readFully(in, body, 9, compressedSize - 9))
        throw new IllegalArgumentException("truncated frame body")
      val (lo, hi) = CityHash102.cityHash128(body, 0, body.length)
      if (lo != readLongLE(checksum, 0) || hi != readLongLE(checksum, 8))
        throw new IllegalArgumentException("frame checksum mismatch (CityHash128)")
      val plain = new Array[Byte](uncompressedSize)
      val n = factory.safeDecompressor().decompress(
        body, 9, compressedSize - 9, plain, 0)
      if (n != uncompressedSize)
        throw new IllegalArgumentException(
          s"LZ4 decompressed $n bytes, header said $uncompressedSize")
      out.write(plain, 0, uncompressedSize)
      first = in.read() // clean EOF only at a frame boundary
    }
    out.toByteArray
  }
}
