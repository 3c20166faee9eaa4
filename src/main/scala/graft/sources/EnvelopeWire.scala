package graft.sources

import java.io.{DataInputStream, DataOutputStream, IOException}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.ProtoWire

/** The reference's RPC envelope messages as a wire-format codec — what
  * actually travels over the loopback socket (VERDICT r11 #2). Message
  * shapes and tags are the public substreams protocol, copied from the
  * reference's generated prost structs:
  *
  * {{{
  * // src/pb/sf.substreams.rpc.v2.rs:4-39
  * message Request { int64 start_block_num = 1; string start_cursor = 2;
  *                   uint64 stop_block_num = 3; string output_module = 6; }
  * // :46-71
  * message Response { oneof message { SessionInit session = 1;
  *   BlockScopedData block_scoped_data = 3; BlockUndoSignal block_undo_signal = 4; } }
  * // :78-100
  * message BlockUndoSignal { BlockRef last_valid_block = 1; string last_valid_cursor = 2; }
  * message BlockScopedData { MapModuleOutput output = 1; Clock clock = 2;
  *                           string cursor = 3; uint64 final_block_height = 4; }
  * message SessionInit { string trace_id = 1; }           // :103-107
  * message MapModuleOutput { string name = 1; google.protobuf.Any map_output = 2; } // :127-131
  * // src/pb/sf.substreams.v1.rs:254-270
  * message Clock { string id = 1; uint64 number = 2; google.protobuf.Timestamp timestamp = 3; }
  * message BlockRef { string id = 1; uint64 number = 2; }
  * }}}
  *
  * The `Any.value` inside `MapModuleOutput` is a real
  * `DatabaseChanges` payload encoded/decoded by [[ProtoWire]] — the same
  * codec the sink path uses (O8) — so the loopback client exercises the
  * full nested decode the reference performs (`src/loader.rs:127-130`).
  *
  * Framing is gRPC's length-prefixed message framing (1 flag byte +
  * 4-byte big-endian length + payload); a flag of [[TrailerFlag]] carries
  * a UTF-8 status string instead of a message, mirroring gRPC's
  * trailers-only error responses (how a real server ships
  * `UNAUTHENTICATED`). Truncated reads are IOException (transport —
  * retryable via [[Backoff]]); a frame that reads fully but fails protobuf
  * decode is [[MalformedFrameException]] (fatal — a desynced or hostile
  * peer; retrying would storm).
  */
object EnvelopeWire {

  // ---- opaque cursors (VERDICT r13 #2 / ADVICE r12) -------------------------
  //
  // The reference's cursor contract (`src/substreams_stream.rs:98-110`): the
  // SERVER mints an opaque token per delivered message, the client stores the
  // one from the last message it CONSUMED verbatim, returns it unmodified in
  // `Request.start_cursor`, and the server resumes AFTER it. The pre-r14
  // in-sandbox transports inverted this (client-fabricated `cursor-<seq>`
  // meaning resume-AT) — internally consistent, but an off-by-one seam
  // against any real endpoint. Now the minting lives HERE (the server role),
  // the token is opaque (obfuscated seq + CRC, base64url — clients that try
  // to parse it get garbage), and request resolution is resume-AFTER.
  // Minting stays a pure function of the position so a retried serve mints
  // the identical token — the property that keeps replay deterministic.

  /** splitmix64's golden-gamma (public constant) — obfuscation, not crypto:
    * opacity here is a CONTRACT (clients must not parse), the checksum is
    * what rejects tampered/corrupt tokens loudly. */
  private val CursorMask = 0x9E3779B97F4A7C15L

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0xFFFF
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x1021) & 0xFFFF else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  /** SERVER-side mint: the opaque cursor for stream position `seq`.
    * Layout (pre-base64url): 1 version byte, 8 bytes rotl(seq ^ mask, 23)
    * big-endian, 2 bytes CRC-16/CCITT of the first 9. */
  def mintCursor(seq: Long): String = {
    val v = java.lang.Long.rotateLeft(seq ^ CursorMask, 23)
    val b = new Array[Byte](11)
    b(0) = 1
    var i = 0
    while (i < 8) { b(1 + i) = ((v >>> (56 - 8 * i)) & 0xFF).toByte; i += 1 }
    val crc = crc16(b, 0, 9)
    b(9) = ((crc >>> 8) & 0xFF).toByte
    b(10) = (crc & 0xFF).toByte
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)
  }

  /** SERVER-side resolve: token → the position it was minted at. Only the
    * server role may call this — the client stores tokens verbatim. A token
    * that fails base64/version/CRC is a desynced or hostile peer → fatal. */
  def cursorSeq(token: String): Long = {
    val b =
      try java.util.Base64.getUrlDecoder.decode(token)
      catch { case e: IllegalArgumentException =>
        throw new MalformedFrameException(s"cursor is not base64url: '$token'", e) }
    if (b.length != 11 || b(0) != 1)
      throw new MalformedFrameException(s"bad cursor layout (${b.length} bytes, v${if (b.nonEmpty) b(0) else -1})")
    if (crc16(b, 0, 9) != (((b(9) & 0xFF) << 8) | (b(10) & 0xFF)))
      throw new MalformedFrameException("cursor checksum mismatch")
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(1 + i) & 0xFFL); i += 1 }
    java.lang.Long.rotateRight(v, 23) ^ CursorMask
  }

  /** Ordinary protobuf message frame (gRPC's uncompressed-data flag). */
  val MsgFlag: Int = 0x00
  /** Status/trailer frame: payload = UTF-8 status string. */
  val TrailerFlag: Int = 0x80
  /** Frame size sanity bound (gRPC's default max inbound message size). */
  val MaxFrameBytes: Int = 4 << 20

  val ChangesTypeUrl: String =
    "type.googleapis.com/sf.substreams.sink.database.v1.DatabaseChanges"

  /** A frame that parsed as bytes but not as protocol — fatal, never
    * retried (VERDICT r11 #2: malformed-frame must not retry-storm). */
  final class MalformedFrameException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  // ---- framing -------------------------------------------------------------

  def writeFrame(out: DataOutputStream, flag: Int, payload: Array[Byte]): Unit = {
    out.writeByte(flag)
    out.writeInt(payload.length)
    out.write(payload)
    out.flush()
  }

  def writeTrailer(out: DataOutputStream, status: String): Unit =
    writeFrame(out, TrailerFlag, status.getBytes(StandardCharsets.UTF_8))

  /** Blocking read of one frame. EOF / truncation surface as IOException
    * (java.io.EOFException is one) so the Backoff reconnect path engages;
    * an impossible length or unknown flag is malformed → fatal. */
  def readFrame(in: DataInputStream): (Int, Array[Byte]) = {
    val flag = in.readUnsignedByte()
    if (flag != MsgFlag && flag != TrailerFlag)
      throw new MalformedFrameException(f"unknown frame flag 0x$flag%02x")
    val len = in.readInt()
    if (len < 0 || len > MaxFrameBytes)
      throw new MalformedFrameException(s"frame length $len out of bounds")
    val buf = new Array[Byte](len)
    in.readFully(buf)
    (flag, buf)
  }

  // ---- Request -------------------------------------------------------------

  /** One-message request: `[seq, seq+1)` — the loopback's per-fetch unit.
    * The reference sends ONE Request for the whole range and reads a
    * stream; the per-seq request is what makes offset-resume exact here. */
  def encodeRequest(seq: Long, outputModule: String): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    if (seq != 0L) { ProtoWire.writeVarint(out, (1L << 3) | 0); ProtoWire.writeVarint(out, seq) }
    ProtoWire.writeVarint(out, (3L << 3) | 0); ProtoWire.writeVarint(out, seq + 1)
    if (outputModule.nonEmpty)
      ProtoWire.writeLenDelim(out, 6, outputModule.getBytes(StandardCharsets.UTF_8))
    out.toArray
  }

  /** The reference's actual request shape: ONE Request opens a
    * server-streamed range (`src/substreams_stream.rs:53-149` sends
    * start_block/stop_block and, on resume, the latest cursor — cursor
    * wins over start_block, `src/main.rs:63-66`). Used by the gRPC
    * transport; the line-oriented loopback keeps its per-seq form. */
  def encodeRequestRange(start: Long, stop: Long, cursor: String,
      outputModule: String): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    if (start != 0L) { ProtoWire.writeVarint(out, (1L << 3) | 0); ProtoWire.writeVarint(out, start) }
    if (cursor.nonEmpty)
      ProtoWire.writeLenDelim(out, 2, cursor.getBytes(StandardCharsets.UTF_8))
    if (stop != 0L) { ProtoWire.writeVarint(out, (3L << 3) | 0); ProtoWire.writeVarint(out, stop) }
    if (outputModule.nonEmpty)
      ProtoWire.writeLenDelim(out, 6, outputModule.getBytes(StandardCharsets.UTF_8))
    out.toArray
  }

  /** A decoded Request: `start` is already RESOLVED (cursor wins over
    * start_block_num, resume-AFTER); `cursor` is the raw token the client
    * sent ("" = cursorless start_block path) so a fixture can assert the
    * verbatim round-trip. */
  final case class RequestRange(start: Long, stop: Long, cursor: String)

  /** Resolve a Request's start position. The CURSOR wins over
    * start_block_num when both travel, and the server resumes AFTER the
    * position the token was minted at — the reference's resume rule
    * (`src/substreams_stream.rs:98-110` replay-verbatim, `src/main.rs:63-66`
    * cursor-over-start-block). Cursorless requests start AT start_block_num
    * (the reference's fresh-start path). */
  def decodeRequestRange(bytes: Array[Byte]): RequestRange =
    try {
      val r = new ProtoWire.Reader(bytes, 0, bytes.length)
      var start = 0L
      var stop = 0L
      var cursor = ""
      while (r.hasMore) {
        val tag = r.varint()
        ((tag >>> 3).toInt, (tag & 7).toInt) match {
          case (1, 0) => start = r.varint()
          case (2, 2) =>
            val (s, e) = r.bytes(r.varint().toInt)
            cursor = new String(bytes, s, e - s, StandardCharsets.UTF_8)
          case (3, 0) => stop = r.varint()
          case (_, w) => r.skip(w)
        }
      }
      val resolved = if (cursor.isEmpty) start else cursorSeq(cursor) + 1
      if (stop <= resolved)
        throw new MalformedFrameException(s"empty range [$resolved,$stop)")
      RequestRange(resolved, stop, cursor)
    } catch {
      case m: MalformedFrameException => throw m
      case ProtoWire.Malformed => throw new MalformedFrameException("bad Request bytes")
      case e: NumberFormatException => throw new MalformedFrameException("bad cursor", e)
    }

  /** → requested seq. Enforces the single-message contract
    * (stop == start + 1); anything else is malformed. */
  def decodeRequest(bytes: Array[Byte]): Long =
    try {
      val r = new ProtoWire.Reader(bytes, 0, bytes.length)
      var start = 0L
      var stop = 0L
      while (r.hasMore) {
        val tag = r.varint()
        ((tag >>> 3).toInt, (tag & 7).toInt) match {
          case (1, 0) => start = r.varint()
          case (3, 0) => stop = r.varint()
          case (_, w) => r.skip(w)
        }
      }
      if (stop != start + 1)
        throw new MalformedFrameException(s"expected single-seq request, got [$start,$stop)")
      start
    } catch { case ProtoWire.Malformed => throw new MalformedFrameException("bad Request bytes") }

  // ---- Response ------------------------------------------------------------

  /** Response{session: SessionInit{trace_id}} — "Always sent first"
    * (`sf.substreams.rpc.v2.rs:55-57`). */
  def encodeSession(traceId: String): Array[Byte] = {
    val si = ArrayBuffer.empty[Byte]
    ProtoWire.writeLenDelim(si, 1, traceId.getBytes(StandardCharsets.UTF_8))
    val out = ArrayBuffer.empty[Byte]
    ProtoWire.writeLenDelim(out, 1, si.toArray)
    out.toArray
  }

  /** Envelope → Response bytes: BlockScopedData for data (clock + cursor +
    * final_block_height + a REAL DatabaseChanges payload inside
    * MapModuleOutput/Any), BlockUndoSignal for undo. */
  def encodeResponse(e: ChainSource.Envelope): Array[Byte] = {
    val out = ArrayBuffer.empty[Byte]
    if (e.isUndo) {
      // BlockRef { id = 1, number = 2 }
      val ref = ArrayBuffer.empty[Byte]
      ProtoWire.writeLenDelim(ref, 1, s"b${e.lastValid}".getBytes(StandardCharsets.UTF_8))
      if (e.lastValid != 0L) { ProtoWire.writeVarint(ref, (2L << 3) | 0); ProtoWire.writeVarint(ref, e.lastValid) }
      // BlockUndoSignal { last_valid_block = 1, last_valid_cursor = 2 }
      val undo = ArrayBuffer.empty[Byte]
      ProtoWire.writeLenDelim(undo, 1, ref.toArray)
      ProtoWire.writeLenDelim(undo, 2, e.lastValidCursor.getBytes(StandardCharsets.UTF_8))
      ProtoWire.writeLenDelim(out, 4, undo.toArray) // Response oneof tag 4
    } else {
      // DatabaseChanges payload via the O8 codec: table "blocks",
      // fields height/fork — the change set the synthetic generator models
      val changes = ProtoWire.encodeChange(
        UTF8String.fromString("blocks"), UTF8String.fromString(""), 0L, 0,
        new ArrayBasedMapData(
          new GenericArrayData(Array[Any](
            UTF8String.fromString("height"), UTF8String.fromString("fork"))),
          new GenericArrayData(Array[Any](
            UTF8String.fromString(e.height.toString), UTF8String.fromString(e.fork.toString)))))
      // Any { type_url = 1, value = 2 }
      val any = ArrayBuffer.empty[Byte]
      ProtoWire.writeLenDelim(any, 1, ChangesTypeUrl.getBytes(StandardCharsets.UTF_8))
      ProtoWire.writeLenDelim(any, 2, changes)
      // MapModuleOutput { name = 1, map_output = 2 }
      val mmo = ArrayBuffer.empty[Byte]
      ProtoWire.writeLenDelim(mmo, 1, "graft_out".getBytes(StandardCharsets.UTF_8))
      ProtoWire.writeLenDelim(mmo, 2, any.toArray)
      // Timestamp { seconds = 1, nanos = 2 }
      val ts = ArrayBuffer.empty[Byte]
      val secs = Math.floorDiv(e.tsMicros, 1000000L)
      val nanos = Math.floorMod(e.tsMicros, 1000000L) * 1000L
      if (secs != 0L) { ProtoWire.writeVarint(ts, (1L << 3) | 0); ProtoWire.writeVarint(ts, secs) }
      if (nanos != 0L) { ProtoWire.writeVarint(ts, (2L << 3) | 0); ProtoWire.writeVarint(ts, nanos) }
      // Clock { id = 1, number = 2, timestamp = 3 }
      val clock = ArrayBuffer.empty[Byte]
      ProtoWire.writeLenDelim(clock, 1, s"b${e.height}-f${e.fork}".getBytes(StandardCharsets.UTF_8))
      if (e.height != 0L) { ProtoWire.writeVarint(clock, (2L << 3) | 0); ProtoWire.writeVarint(clock, e.height) }
      ProtoWire.writeLenDelim(clock, 3, ts.toArray)
      // BlockScopedData { output = 1, clock = 2, cursor = 3, final_block_height = 4 }
      val bsd = ArrayBuffer.empty[Byte]
      ProtoWire.writeLenDelim(bsd, 1, mmo.toArray)
      ProtoWire.writeLenDelim(bsd, 2, clock.toArray)
      ProtoWire.writeLenDelim(bsd, 3, e.cursor.getBytes(StandardCharsets.UTF_8))
      if (e.finalHeight != 0L) { ProtoWire.writeVarint(bsd, (4L << 3) | 0); ProtoWire.writeVarint(bsd, e.finalHeight) }
      ProtoWire.writeLenDelim(out, 3, bsd.toArray) // Response oneof tag 3
    }
    out.toArray
  }

  sealed trait Decoded
  final case class SessionArm(traceId: String) extends Decoded
  final case class EnvelopeArm(env: ChainSource.Envelope) extends Decoded

  /** Response bytes → the arm. `requestedSeq` is the client's POSITIONAL
    * coordinate (it counts consumed messages — the real client does the
    * same, `src/substreams_stream.rs:98-110`); the server-minted cursor is
    * opaque and travels verbatim into the envelope for the client to store
    * and return unmodified on resume. */
  def decodeResponse(requestedSeq: Long, bytes: Array[Byte]): Decoded =
    try {
      val r = new ProtoWire.Reader(bytes, 0, bytes.length)
      var out: Decoded = null
      while (r.hasMore) {
        val tag = r.varint()
        ((tag >>> 3).toInt, (tag & 7).toInt) match {
          case (1, 2) =>
            val (s, e) = r.bytes(r.varint().toInt)
            out = SessionArm(str(bytes, s, e, 1))
          case (3, 2) =>
            val (s, e) = r.bytes(r.varint().toInt)
            out = EnvelopeArm(decodeBlockScopedData(requestedSeq, bytes, s, e))
          case (4, 2) =>
            val (s, e) = r.bytes(r.varint().toInt)
            out = EnvelopeArm(decodeUndoSignal(requestedSeq, bytes, s, e))
          case (_, w) => r.skip(w)
        }
      }
      if (out == null) throw new MalformedFrameException("Response carried no known arm")
      out
    } catch {
      case m: MalformedFrameException => throw m
      case ProtoWire.Malformed => throw new MalformedFrameException("bad Response bytes")
      case e: NumberFormatException => throw new MalformedFrameException("bad numeric payload", e)
    }

  /** Scan a submessage for one string field (used for SessionInit.trace_id). */
  private def str(buf: Array[Byte], from: Int, until: Int, field: Int): String = {
    val r = new ProtoWire.Reader(buf, from, until)
    var out: String = ""
    while (r.hasMore) {
      val tag = r.varint()
      if ((tag >>> 3).toInt == field && (tag & 7) == 2) {
        val (a, b) = r.bytes(r.varint().toInt)
        out = new String(buf, a, b - a, StandardCharsets.UTF_8)
      } else r.skip((tag & 7).toInt)
    }
    out
  }

  private def decodeBlockScopedData(seq: Long, buf: Array[Byte],
      start: Int, end: Int): ChainSource.Envelope = {
    var height = 0L; var tsMicros = 0L; var finalHeight = 0L
    var cursor = ""; var fork = -1L; var payloadHeight = -1L
    val r = new ProtoWire.Reader(buf, start, end)
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => // MapModuleOutput → Any → DatabaseChanges (the O8 codec)
          val (s, e) = r.bytes(r.varint().toInt)
          val mr = new ProtoWire.Reader(buf, s, e)
          while (mr.hasMore) {
            val mtag = mr.varint()
            if ((mtag >>> 3) == 2 && (mtag & 7) == 2) { // map_output: Any
              val (as, ae) = mr.bytes(mr.varint().toInt)
              val ar = new ProtoWire.Reader(buf, as, ae)
              while (ar.hasMore) {
                val atag = ar.varint()
                if ((atag >>> 3) == 2 && (atag & 7) == 2) { // value bytes
                  val (vs, ve) = ar.bytes(ar.varint().toInt)
                  val decoded = ProtoWire.decodeChanges(
                    java.util.Arrays.copyOfRange(buf, vs, ve))
                  if (decoded == null)
                    throw new MalformedFrameException("bad DatabaseChanges payload")
                  // single TableChange; fields name→new_value carry height/fork
                  var ci = 0
                  while (ci < decoded.numElements()) {
                    val change = decoded.getStruct(ci, 6)
                    val fields = change.getArray(5)
                    var fi = 0
                    while (fi < fields.numElements()) {
                      val f = fields.getStruct(fi, 3)
                      f.getUTF8String(0).toString match {
                        case "height" => payloadHeight = f.getUTF8String(1).toString.toLong
                        case "fork"   => fork = f.getUTF8String(1).toString.toLong
                        case _        => ()
                      }
                      fi += 1
                    }
                    ci += 1
                  }
                } else ar.skip((atag & 7).toInt)
              }
            } else mr.skip((mtag & 7).toInt)
          }
        case (2, 2) => // Clock
          val (s, e) = r.bytes(r.varint().toInt)
          val cr = new ProtoWire.Reader(buf, s, e)
          while (cr.hasMore) {
            val ctag = cr.varint()
            ((ctag >>> 3).toInt, (ctag & 7).toInt) match {
              case (2, 0) => height = cr.varint()
              case (3, 2) => // Timestamp
                val (ts, te) = cr.bytes(cr.varint().toInt)
                val tr = new ProtoWire.Reader(buf, ts, te)
                var secs = 0L; var nanos = 0L
                while (tr.hasMore) {
                  val ttag = tr.varint()
                  ((ttag >>> 3).toInt, (ttag & 7).toInt) match {
                    case (1, 0) => secs = tr.varint()
                    case (2, 0) => nanos = tr.varint()
                    case (_, w) => tr.skip(w)
                  }
                }
                tsMicros = secs * 1000000L + nanos / 1000L
              case (_, w) => cr.skip(w)
            }
          }
        case (3, 2) =>
          val (s, e) = r.bytes(r.varint().toInt)
          cursor = new String(buf, s, e - s, StandardCharsets.UTF_8)
        case (4, 0) => finalHeight = r.varint()
        case (_, w) => r.skip(w)
      }
    }
    // the cursor is OPAQUE to the client (reference contract: store
    // verbatim, never parse) — validation here is presence + payload/clock
    // consistency, not token structure; position tracking is positional
    if (cursor.isEmpty)
      throw new MalformedFrameException(s"data message at seq $seq carried no cursor")
    if (fork < 0 || payloadHeight != height)
      throw new MalformedFrameException(
        s"DatabaseChanges payload disagrees with Clock (payload height $payloadHeight vs $height)")
    ChainSource.Envelope(seq, isUndo = false, height = height, fork = fork,
      lastValid = -1L, finalHeight = finalHeight, tsMicros = tsMicros,
      cursor = cursor)
  }

  private def decodeUndoSignal(seq: Long, buf: Array[Byte],
      start: Int, end: Int): ChainSource.Envelope = {
    var lastValid = -1L; var cursor = ""
    val r = new ProtoWire.Reader(buf, start, end)
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => // BlockRef
          val (s, e) = r.bytes(r.varint().toInt)
          val br = new ProtoWire.Reader(buf, s, e)
          while (br.hasMore) {
            val btag = br.varint()
            if ((btag >>> 3) == 2 && (btag & 7) == 0) lastValid = br.varint()
            else br.skip((btag & 7).toInt)
          }
          if (lastValid == -1L) lastValid = 0L // proto3 default-0 omitted
        case (2, 2) =>
          val (s, e) = r.bytes(r.varint().toInt)
          cursor = new String(buf, s, e - s, StandardCharsets.UTF_8)
        case (_, w) => r.skip(w)
      }
    }
    if (lastValid < 0L || cursor.isEmpty)
      throw new MalformedFrameException(
        s"bad undo signal: last_valid_block $lastValid, cursor '$cursor'")
    ChainSource.Envelope(seq, isUndo = true, height = -1L, fork = -1L,
      lastValid = lastValid, finalHeight = -1L, tsMicros = -1L,
      lastValidCursor = cursor)
  }
}
