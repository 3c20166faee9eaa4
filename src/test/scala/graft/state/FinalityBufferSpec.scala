package graft.state

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.state.FinalityBuffer._

class FinalityBufferSpec extends AnyFunSuite {

  private def blk(n: Long, finalHeight: Long = 0L): BlockScoped =
    BlockScoped(Clock(s"b$n", n, Timestamp.valueOf("2023-01-01 00:00:00")),
      s"c$n", finalHeight, Seq.empty)

  // Parity with reference `test_buffer` (src/loader.rs:304-350).
  test("already-final blocks pass straight through") {
    var st = empty
    (0L to 9L).foreach { n =>
      val (st2, rel) = onBlock(st, blk(n, finalHeight = 10L))
      st = st2
      assert(rel.map(_.clock.number) === Seq(n), s"block $n should release immediately")
    }
    assert(st.size === 0)
  }

  test("non-final blocks accumulate up to BufferLen; overflow releases exactly 1") {
    var st = empty
    (1L to BufferLen.toLong).foreach { n =>
      val (st2, rel) = onBlock(st, blk(n))
      st = st2
      assert(rel.isEmpty, s"block $n should buffer")
    }
    assert(st.size === BufferLen)
    val (st2, rel) = onBlock(st, blk(BufferLen.toLong + 2))
    assert(rel.map(_.clock.number) === Seq(1L))
    assert(st2.size === BufferLen)
    assert(st2.buffer.head.clock.number === 2L)
  }

  // Parity with reference `test_undo_block_signal` (src/loader.rs:272-302):
  // buffer built directly with blocks 0..11, undo at 8 keeps 0..=8.
  test("undo at 8 keeps exactly blocks 0..=8") {
    val st = BufferState((0L to 11L).map(n => blk(n)).toVector)
    val after = onUndo(st, lastValidBlock = 8L)
    assert(after.buffer.map(_.clock.number) === (0L to 8L).toVector)
  }

  test("undo signal missing from the buffer is a no-op (reference matches on ==)") {
    val st = BufferState((5L to 9L).map(n => blk(n)).toVector)
    assert(onUndo(st, 3L) === st)
    assert(onUndo(st, 20L) === st)
  }

  test("rising final height releases the prefix in order") {
    var st = empty
    (1L to 6L).foreach { n => st = onBlock(st, blk(n))._1 }
    val (st2, rel) = onBlock(st, blk(7L, finalHeight = 3L))
    assert(rel.map(_.clock.number) === Seq(1L, 2L, 3L))
    assert(st2.buffer.map(_.clock.number) === Vector(4L, 5L, 6L, 7L))
  }

  test("step dispatches data/undo; unknown kind rejected") {
    val (st, rel) = step(empty, BlockMsg.data(0, blk(1, finalHeight = 5)))
    assert(rel.size === 1 && st.size === 0)
    val (st2, rel2) = step(st, BlockMsg.undo(1, UndoSignal(0, "c")))
    assert(rel2.isEmpty && st2.size === 0)
    intercept[IllegalArgumentException](step(empty, BlockMsg(2, "bogus", None, None)))
  }

  // Property: over any monotone chain with arbitrary finality progress and
  // undos bounded by released height, (a) a block is never released twice,
  // (b) releases are in increasing order, (c) every block whose number is
  // ≤ the final max finality is eventually released or was undone.
  test("property: no double release, order preserved") {
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { _ =>
      var st = empty
      var released = Vector.empty[Long]
      var next = 0L
      var finalHeight = -1L
      (1 to 200).foreach { _ =>
        if (rnd.nextInt(10) < 8 || st.size == 0) {
          // new block; finality lags by a random amount
          finalHeight = math.max(finalHeight, next - 1 - rnd.nextInt(15))
          val (st2, rel) = onBlock(st, blk(next, finalHeight))
          st = st2
          released ++= rel.map(_.clock.number)
          next += 1
        } else {
          // undo somewhere above the released watermark
          val floor = released.lastOption.getOrElse(-1L)
          val lastValid = floor + 1 + rnd.nextInt(math.max((next - floor).toInt, 1))
          st = onUndo(st, lastValid)
          next = math.min(next, lastValid + 1)
        }
      }
      assert(released === released.sorted, "released out of order")
      assert(released.distinct.size === released.size, "double release")
    }
  }

  test("run folds an ordered message sequence") {
    val msgs = (0L to 14L).map(n => BlockMsg.data(n, blk(n, finalHeight = n - 2))) :+
      BlockMsg.undo(15, UndoSignal(13, "c13"))
    val (st, rel) = FinalityBuffer.run(msgs)
    assert(rel.map(_.clock.number) === (0L to 12L))
    assert(st.buffer.map(_.clock.number) === Vector(13L))
  }
}
