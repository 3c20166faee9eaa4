package graft.model

import java.sql.Timestamp

/** Stream-envelope case classes — the fixed (compile-time-known) part of the
  * data model. User data stays dynamic (`DataFrame` + `MAP<STRING,STRING>`);
  * only the envelope and cursor are typed.
  *
  * Shapes follow the reference protobufs: `BlockScopedData`
  * (`src/pb/sf.substreams.rpc.v2.rs:86-100`), `Clock`
  * (`src/pb/sf.substreams.v1.rs:254-261`), `BlockUndoSignal`
  * (`src/pb/sf.substreams.rpc.v2.rs:78-83`), `TableChange`/`Field`
  * (external `substreams-database-change`; usage `src/loader.rs:13-15,
  * 140-150`, field shape in test `src/loader.rs:373-390`), `Cursor`
  * (`src/loader.rs:34-40`).
  */
final case class Clock(id: String, number: Long, ts: Timestamp)

/** One field of a row change; `oldValue` is carried but discarded by the
  * projection (reference `src/main.rs:291-297`). */
final case class FieldKV(name: String, newValue: String, oldValue: String)

/** One row change. `pk` models the single-PK oneof arm, `compositePk` the
  * composite arm; both empty = PK assumed present in fields
  * (reference `src/loader.rs:143-149`). */
final case class ChangeRec(
    table: String,
    pk: String,
    compositePk: Map[String, String],
    fields: Seq[FieldKV])

/** Block envelope with its decoded change-set payload. */
final case class BlockScoped(
    clock: Clock,
    cursor: String,
    finalBlockHeight: Long,
    changes: Seq[ChangeRec])

/** Retraction: everything after `lastValidBlock` is invalid. */
final case class UndoSignal(lastValidBlock: Long, lastValidCursor: String)

/** Tagged union of the stream element (`BlockResponse::New | Undo`,
  * reference `src/substreams_stream.rs:21-24`). Exactly one of data/undo is
  * set; kind ∈ {"data", "undo"}. `seq` is the arrival order assigned by the
  * source — the gRPC stream is implicitly ordered; a Dataset is not, so the
  * order must travel with the row for the finality state machine to replay
  * a micro-batch deterministically. */
final case class BlockMsg(
    seq: Long,
    kind: String,
    data: Option[BlockScoped],
    undo: Option[UndoSignal])

object BlockMsg {
  def data(seq: Long, b: BlockScoped): BlockMsg = BlockMsg(seq, "data", Some(b), None)
  def undo(seq: Long, u: UndoSignal): BlockMsg = BlockMsg(seq, "undo", None, Some(u))
}

/** Checkpoint row persisted after each flushed block (`src/loader.rs:34-40`;
  * recovery `src/main.rs:299-310`). */
final case class CursorRow(id: String, cursor: String, blockNum: Long, blockId: String)
