package graft.sink

/** CityHash128, version 1.0.2 — the hash ClickHouse pins for its native
  * compression-frame checksums (ClickHouse vendors cityhash 1.0.2
  * specifically because later CityHash releases changed the output; the
  * reference's client computes the same checksum through the `clickhouse`
  * crate's lz4 feature, `Cargo.toml:21`). Implemented from the public
  * Google CityHash 1.0.x algorithm (MIT-licensed city.cc); all arithmetic
  * is unsigned-64 two's complement, which Scala's `Long` gives for free
  * except shifts-right (use `>>>`).
  *
  * Sandbox caveat (documented for parity audits): there is no live
  * ClickHouse here to cross-check vectors against, so the pin is
  * self-consistency (encoder and fixture decoder share this one
  * implementation, golden vectors in CityHash102Spec freeze it against
  * accidental drift) plus a faithful transcription of the published
  * 1.0.2 control flow — the known 1.0.2-vs-1.1 divergence points (the
  * ^/+ mixing in the 128-bit main loop and the tail-chunk recombination)
  * follow the 1.0.2 forms.
  */
object CityHash102 {

  private val k0 = 0xc3a5c85c97cb3127L
  private val k1 = 0xb492b66fbe98f273L
  private val k2 = 0x9ae16a3b2f90404fL
  private val k3 = 0xc949d7c7509e6557L
  private val kMul = 0x9ddfea08eb382d69L

  @inline private def fetch64(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24) | ((b(i + 4) & 0xFFL) << 32) |
      ((b(i + 5) & 0xFFL) << 40) | ((b(i + 6) & 0xFFL) << 48) |
      ((b(i + 7) & 0xFFL) << 56)

  @inline private def fetch32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) | ((b(i + 2) & 0xFFL) << 16) |
      ((b(i + 3) & 0xFFL) << 24)

  @inline private def rotate(v: Long, shift: Int): Long =
    if (shift == 0) v else (v >>> shift) | (v << (64 - shift))

  /** 1.0.2's RotateByAtLeast1 (no shift-0 guard — callers pass 1..63 via
    * `len & 63` on len in 9..16, never 0 there, but keep the raw form). */
  @inline private def rotateByAtLeast1(v: Long, shift: Int): Long =
    (v >>> shift) | (v << (64 - shift))

  @inline private def shiftMix(v: Long): Long = v ^ (v >>> 47)

  @inline private def hash128to64(lo: Long, hi: Long): Long = {
    var a = (lo ^ hi) * kMul
    a ^= (a >>> 47)
    var b = (hi ^ a) * kMul
    b ^= (b >>> 47)
    b * kMul
  }

  @inline private def hashLen16(u: Long, v: Long): Long = hash128to64(u, v)

  private def hashLen0to16(b: Array[Byte], off: Int, len: Int): Long = {
    if (len > 8) {
      val a = fetch64(b, off)
      val z = fetch64(b, off + len - 8)
      hashLen16(a, rotateByAtLeast1(z + len, len)) ^ z
    } else if (len >= 4) {
      val a = fetch32(b, off)
      hashLen16(len + (a << 3), fetch32(b, off + len - 4))
    } else if (len > 0) {
      val a = b(off) & 0xFF
      val c = b(off + (len >> 1)) & 0xFF
      val d = b(off + len - 1) & 0xFF
      val y = a.toLong + (c.toLong << 8)
      val z = len.toLong + (d.toLong << 2)
      shiftMix(y * k2 ^ z * k3) * k2
    } else k2
  }

  /** (a+w, b+c) pair mix — city.cc WeakHashLen32WithSeeds. Returns both
    * halves through a reusable 2-slot array to stay allocation-light. */
  private def weakHashLen32WithSeeds(w: Long, x: Long, y: Long, z: Long,
      a0: Long, b0: Long, out: Array[Long]): Unit = {
    var a = a0 + w
    var b = rotate(b0 + a + z, 21)
    val c = a
    a += x
    a += y
    b += rotate(a, 44)
    out(0) = a + z
    out(1) = b + c
  }

  private def weakHashLen32WithSeeds(b: Array[Byte], off: Int,
      a: Long, bb: Long, out: Array[Long]): Unit =
    weakHashLen32WithSeeds(fetch64(b, off), fetch64(b, off + 8),
      fetch64(b, off + 16), fetch64(b, off + 24), a, bb, out)

  /** CityMurmur — the < 128-byte path of CityHash128WithSeed. */
  private def cityMurmur(buf: Array[Byte], off: Int, len: Int,
      seedLo: Long, seedHi: Long): (Long, Long) = {
    var a = seedLo
    var b = seedHi
    var c = 0L
    var d = 0L
    var l = len - 16
    if (l <= 0) {
      a = shiftMix(a * k1) * k1
      c = b * k1 + hashLen0to16(buf, off, len)
      d = shiftMix(a + (if (len >= 8) fetch64(buf, off) else c))
    } else {
      c = hashLen16(fetch64(buf, off + len - 8) + k1, a)
      d = hashLen16(b + len, c + fetch64(buf, off + len - 16))
      a += d
      var s = off
      while (l > 0) {
        a ^= shiftMix(fetch64(buf, s) * k1) * k1
        a *= k1
        b ^= a
        c ^= shiftMix(fetch64(buf, s + 8) * k1) * k1
        c *= k1
        d ^= c
        s += 16
        l -= 16
      }
    }
    a = hashLen16(a, c)
    b = hashLen16(d, b)
    (a ^ b, hashLen16(b, a))
  }

  /** CityHash128WithSeed, 1.0.2. */
  def cityHash128WithSeed(buf: Array[Byte], off: Int, len0: Int,
      seedLo: Long, seedHi: Long): (Long, Long) = {
    if (len0 < 128) return cityMurmur(buf, off, len0, seedLo, seedHi)
    var len = len0
    var s = off
    var x = seedLo
    var y = seedHi
    var z = len.toLong * k1
    val v = new Array[Long](2)
    val w = new Array[Long](2)
    v(0) = rotate(y ^ k1, 49) * k1 + fetch64(buf, s)
    v(1) = rotate(v(0), 42) * k1 + fetch64(buf, s + 8)
    w(0) = rotate(y + z, 35) * k1 + x
    w(1) = rotate(x + fetch64(buf, s + 88), 53) * k1
    // the same inner loop as CityHash64, manually unrolled (1.0.2 mixes
    // with ^ where 1.1 switched to +; keep the 1.0.2 forms)
    do {
      var round = 0
      while (round < 2) {
        x = rotate(x + y + v(0) + fetch64(buf, s + 16), 37) * k1
        y = rotate(y + v(1) + fetch64(buf, s + 48), 42) * k1
        x ^= w(1)
        y ^= v(0)
        z = rotate(z ^ w(0), 33)
        weakHashLen32WithSeeds(buf, s, v(1) * k1, x + w(0), v)
        weakHashLen32WithSeeds(buf, s + 32, z + w(1), y, w)
        val t = z; z = x; x = t
        s += 64
        round += 1
      }
      len -= 128
    } while (len >= 128)
    y += rotate(w(0), 37) * k0 + z
    x += rotate(v(0) + z, 49) * k0
    // hash up to 4 chunks of 32 bytes each from the END of the data
    var tailDone = 0
    while (tailDone < len) {
      tailDone += 32
      y = rotate(y - x, 42) * k0 + v(1)
      w(0) += fetch64(buf, s + len - tailDone + 16)
      x = rotate(x, 49) * k0 + w(0)
      w(0) += v(0)
      z += w(1) + fetch64(buf, s + len - tailDone)
      weakHashLen32WithSeeds(buf, s + len - tailDone, v(0) + z, v(1), v)
    }
    x = hashLen16(x, v(0))
    y = hashLen16(y, w(0))
    (hashLen16(x + v(1), w(1)) + y, hashLen16(x + w(1), y + v(1)))
  }

  /** CityHash128, 1.0.2 (seeds from the first 16 bytes when available). */
  def cityHash128(buf: Array[Byte], off: Int, len: Int): (Long, Long) =
    if (len >= 16)
      cityHash128WithSeed(buf, off + 16, len - 16,
        fetch64(buf, off) ^ k3, fetch64(buf, off + 8))
    else if (len >= 8)
      cityHash128WithSeed(buf, 0, 0,
        fetch64(buf, off) ^ (len.toLong * k0), fetch64(buf, off + len - 8) ^ k1)
    else
      cityHash128WithSeed(buf, off, len, k0, k1)
}
