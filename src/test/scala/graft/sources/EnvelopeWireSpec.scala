package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream, EOFException}

import org.scalatest.funsuite.AnyFunSuite

/** Pins the loopback wire protocol (VERDICT r11 #2) to the PUBLIC protobuf
  * wire encoding of the reference's RPC messages
  * (`src/pb/sf.substreams.rpc.v2.rs:46-100`): golden bytes hand-derived
  * from the wire spec so encoder and decoder cannot drift together, plus
  * the failure taxonomy — truncation is retryable IO, malformed is fatal.
  */
class EnvelopeWireSpec extends AnyFunSuite {

  private def cfg = ChainSource.config(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
    java.util.Map.of("totalBlocks", "100", "reorgEvery", "10", "reorgDepth", "2",
      "finalityLag", "5")))

  test("golden bytes: Response{block_undo_signal} matches the hand-derived wire layout") {
    // BlockUndoSignal { last_valid_block = BlockRef{id="b7", number=7},
    //                   last_valid_cursor = <opaque token> } at oneof tag 4.
    // The token is the server-minted opaque cursor of the undo's own
    // position (seq 10) — 11 payload bytes → 15 base64url chars.
    val tok = EnvelopeWire.mintCursor(10L)
    val tokBytes = tok.getBytes("UTF-8")
    assert(tokBytes.length === 15, "opaque cursor is 15 base64url chars")
    val undo = ChainSource.Envelope(10L, isUndo = true, height = -1L, fork = -1L,
      lastValid = 7L, finalHeight = -1L, tsMicros = -1L, lastValidCursor = tok)
    val expected: Array[Byte] =
      Array[Int](
        0x22, 10 + tokBytes.length,               // Response field 4, len 25
        0x0A, 0x06,                               //   BlockRef, len 6
        0x0A, 0x02, 'b', '7',                     //     id = "b7"
        0x10, 0x07,                               //     number = 7
        0x12, tokBytes.length) .map(_.toByte) ++  //   last_valid_cursor, len 15
        tokBytes
    assert(EnvelopeWire.encodeResponse(undo).toSeq === expected.toSeq)
    // and the decode inverts it (ignored fields normalized to -1)
    assert(EnvelopeWire.decodeResponse(10L, expected) ===
      EnvelopeWire.EnvelopeArm(undo))
  }

  test("opaque cursor codec: mint → resolve round-trips; tampering is fatal server-side") {
    for (seq <- Seq(0L, 1L, 7L, 1000L, Long.MaxValue / 3)) {
      val tok = EnvelopeWire.mintCursor(seq)
      assert(EnvelopeWire.cursorSeq(tok) === seq)
      // opacity: no legacy cursor-<seq> shape, no decimal seq in the clear
      assert(!tok.matches("cursor-\\d+") && !tok.contains(seq.toString + "-"))
    }
    // deterministic: a retried serve mints the identical token
    assert(EnvelopeWire.mintCursor(42L) === EnvelopeWire.mintCursor(42L))
    // tampered/garbage tokens are rejected loudly (fatal, not retryable)
    intercept[EnvelopeWire.MalformedFrameException] {
      EnvelopeWire.cursorSeq("not base64!!")
    }
    val tok = EnvelopeWire.mintCursor(9L)
    val tampered = (if (tok.head == 'A') "B" else "A") + tok.tail
    intercept[EnvelopeWire.MalformedFrameException] {
      EnvelopeWire.cursorSeq(tampered)
    }
  }

  test("resume-AFTER: a Request's opaque cursor wins over start_block and resolves one PAST it") {
    // consumed up to position 7 → return its token verbatim → server
    // resumes at 8, regardless of the start_block_num also in the Request
    val req = EnvelopeWire.encodeRequestRange(5L, 20L, EnvelopeWire.mintCursor(7L), "m")
    val rr = EnvelopeWire.decodeRequestRange(req)
    assert(rr === EnvelopeWire.RequestRange(8L, 20L, EnvelopeWire.mintCursor(7L)))
    // cursorless: start AT start_block_num (the fresh-start path)
    val fresh = EnvelopeWire.decodeRequestRange(
      EnvelopeWire.encodeRequestRange(5L, 20L, "", "m"))
    assert(fresh.start === 5L && fresh.cursor === "")
    // a fabricated token is rejected before any block is served
    intercept[EnvelopeWire.MalformedFrameException] {
      EnvelopeWire.decodeRequestRange(
        EnvelopeWire.encodeRequestRange(5L, 20L, "cursor-7", "m"))
    }
  }

  test("golden bytes: SessionInit and Request layouts") {
    // Response{session: SessionInit{trace_id="t1"}} — field 1, nested field 1
    assert(EnvelopeWire.encodeSession("t1").toSeq ===
      Array[Int](0x0A, 0x04, 0x0A, 0x02, 't', '1').map(_.toByte).toSeq)
    assert(EnvelopeWire.decodeResponse(-1L, EnvelopeWire.encodeSession("t1")) ===
      EnvelopeWire.SessionArm("t1"))
    // Request{start_block_num=5, stop_block_num=6, output_module="m"}
    assert(EnvelopeWire.encodeRequest(5L, "m").toSeq ===
      Array[Int](0x08, 0x05, 0x18, 0x06, 0x32, 0x01, 'm').map(_.toByte).toSeq)
    assert(EnvelopeWire.decodeRequest(EnvelopeWire.encodeRequest(5L, "m")) === 5L)
    // seq 0: proto3 omits the default-0 start_block_num
    assert(EnvelopeWire.decodeRequest(EnvelopeWire.encodeRequest(0L, "")) === 0L)
  }

  test("round-trip: every synthetic envelope crosses the wire bit-exactly") {
    val c = cfg
    for (seq <- 0L until 40L) {
      val e = ChainSource.envelopeAt(seq, c)
      val arm = EnvelopeWire.decodeResponse(seq, EnvelopeWire.encodeResponse(e))
      val got = arm.asInstanceOf[EnvelopeWire.EnvelopeArm].env
      if (e.isUndo) { // ignored fields normalize to -1 on the undo arm
        assert(got === e.copy(height = -1L, fork = -1L, finalHeight = -1L, tsMicros = -1L))
      } else assert(got === e)
      // row-level bit-parity follows from the SHARED toInternalRow encoder
      // and is pinned end-to-end in LoopbackChainSpec's first test
    }
  }

  test("data envelope carries a REAL DatabaseChanges payload under MapModuleOutput/Any") {
    val e = ChainSource.envelopeAt(3L, cfg)
    val bytes = EnvelopeWire.encodeResponse(e)
    assert((bytes(0) & 0xFF) === 0x1A, "Response oneof tag 3 (block_scoped_data)")
    // the type_url travels verbatim
    val s = new String(bytes, "ISO-8859-1")
    assert(s.contains(EnvelopeWire.ChangesTypeUrl))
    assert(s.contains("graft_out"), "MapModuleOutput.name")
  }

  test("a data message without a server-minted cursor is malformed, not retryable") {
    // the cursor is opaque (the client cannot verify its structure), but a
    // data message MUST carry one — its absence is a broken server
    val e = ChainSource.envelopeAt(4L, cfg).copy(cursor = "")
    intercept[EnvelopeWire.MalformedFrameException] {
      EnvelopeWire.decodeResponse(4L, EnvelopeWire.encodeResponse(e))
    }
  }

  test("garbage and empty Response bytes are malformed") {
    intercept[EnvelopeWire.MalformedFrameException] {
      EnvelopeWire.decodeResponse(1L, Array[Byte](0x22, 0x7F, 0x01)) // lies about length
    }
    intercept[EnvelopeWire.MalformedFrameException] {
      EnvelopeWire.decodeResponse(1L, Array.emptyByteArray) // no arm at all
    }
    intercept[EnvelopeWire.MalformedFrameException] {
      EnvelopeWire.decodeRequest(Array[Byte](0x08, 0x05)) // stop != start+1
    }
  }

  test("framing taxonomy: truncation is IOException (retryable), bad flag/length fatal") {
    def frameOf(flag: Int, payload: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      EnvelopeWire.writeFrame(new DataOutputStream(bos), flag, payload)
      bos.toByteArray
    }
    val good = frameOf(EnvelopeWire.MsgFlag, "hello".getBytes)
    val (f, p) = EnvelopeWire.readFrame(new DataInputStream(new ByteArrayInputStream(good)))
    assert(f === EnvelopeWire.MsgFlag && new String(p) === "hello")
    // truncated mid-payload → EOFException (an IOException) → Backoff retries
    intercept[EOFException] {
      EnvelopeWire.readFrame(new DataInputStream(
        new ByteArrayInputStream(good.dropRight(2))))
    }
    // unknown flag → fatal
    intercept[EnvelopeWire.MalformedFrameException] {
      EnvelopeWire.readFrame(new DataInputStream(
        new ByteArrayInputStream(frameOf(0x42, "x".getBytes))))
    }
    // hostile length → fatal before any allocation
    val hostile = Array[Byte](0x00, 0x7F.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    intercept[EnvelopeWire.MalformedFrameException] {
      EnvelopeWire.readFrame(new DataInputStream(new ByteArrayInputStream(hostile)))
    }
  }
}
