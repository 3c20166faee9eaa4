package graft.sources

import org.apache.spark.sql.catalyst.InternalRow

/** Transport seam for the chain source (O1).
  *
  * Everything between "a cursor position" and "the envelope message at it"
  * goes through this trait, so the deterministic in-sandbox generator and a
  * real substreams gRPC client are interchangeable per-partition readers.
  * A real implementation would open one `sf.substreams.rpc.v2.Stream/Blocks`
  * call per partition (reference channel shape: connect timeout, TCP
  * keepalive, LZ4 — `src/substreams.rs:26-50`), honoring the contract:
  *
  *  - construction happens ON THE EXECUTOR with the full [[ChainSource.Config]]
  *    — `token` (O2 auth header), `connectTimeoutMs`/`keepaliveMs` (channel
  *    options), and the partition's own retry budget all travel in it;
  *  - `fetch(seq)` returns the envelope at that exact cursor position and
  *    must be REPLAYABLE: a retried or restarted reader re-requests the same
  *    seq (the reference resumes from `latest_cursor`,
  *    `src/substreams_stream.rs:53-149`);
  *  - auth failures throw [[UnauthenticatedException]] (fatal — [[Backoff]]
  *    will not retry it); transient transport errors throw anything else
  *    (retried on the exponential schedule);
  *  - `close()` releases the channel when the partition is exhausted.
  *
  * CURSOR SEMANTICS at this seam (advice r12; seam CLOSED in r14): the
  * SERVER mints an OPAQUE token per delivered message
  * ([[EnvelopeWire.mintCursor]] — obfuscated + checksummed, clients that
  * try to parse it fail loudly), the client stores the token of the last
  * message it CONSUMED verbatim, returns it unmodified in
  * `Request.start_cursor` on reopen, and the server resumes AFTER it —
  * exactly the reference's replay-verbatim contract
  * (`src/substreams_stream.rs:98-110`). With nothing consumed yet the open
  * is cursorless via `start_block_num`. The `seq` coordinate used by
  * `fetch` and the Spark offset log is the client's own POSITIONAL count
  * of consumed messages, independent of the token — which is why replay
  * stays exact without ever interpreting the cursor.
  *
  * Select an implementation with `.option("fetcherClass", "fqcn")` — the
  * class needs a single-argument `(ChainSource.Config)` constructor. The
  * default (empty or `"synthetic"`) is [[SyntheticBlockFetcher]].
  */
trait BlockFetcher extends AutoCloseable {
  /** The envelope message at cursor position `seq` (blocking). */
  def fetch(seq: Long): InternalRow
  /** The reader announces its partition's `[start, end)` range before the
    * first fetch. Streaming transports use it as the Request's
    * `stop_block_num` so ONE server-streamed call covers exactly the
    * partition (the reference's one-request-many-responses shape,
    * `src/substreams_stream.rs:53-149`); point transports ignore it. */
  def hintRange(start: Long, end: Long): Unit = ()
  override def close(): Unit = ()
}

object BlockFetcher {
  /** Executor-side factory: reflectively instantiate `cfg.fetcherClass`
    * (single `Config` constructor), or the synthetic generator. */
  def create(cfg: ChainSource.Config): BlockFetcher = cfg.fetcherClass match {
    case "" | "synthetic" => new SyntheticBlockFetcher(cfg)
    case cls =>
      Class.forName(cls)
        .getDeclaredConstructor(classOf[ChainSource.Config])
        .newInstance(cfg)
        .asInstanceOf[BlockFetcher]
  }
}

/** The in-sandbox implementation: deterministic synthetic chain (state is a
  * pure function of the sequence number — see [[ChainSource.messageAt]]),
  * plus the same auth stance and transient-fault surface the real transport
  * has, so the retry/auth paths are exercised end-to-end without a network. */
class SyntheticBlockFetcher(cfg: ChainSource.Config) extends BlockFetcher {
  // transient faults fire once per seq (first attempt), so a retried fetch
  // succeeds — the reconnect-and-resume shape of O3
  private val failedOnce = scala.collection.mutable.Set.empty[Long]

  override def fetch(seq: Long): InternalRow = {
    if (cfg.requireAuth && cfg.token.isEmpty)
      throw new UnauthenticatedException(
        "missing bearer token (set the token option or SUBSTREAMS_API_TOKEN)")
    if (cfg.failEvery > 0 && seq > 0 && seq % cfg.failEvery == 0 && failedOnce.add(seq))
      throw new java.io.IOException(s"transient chain error at seq $seq")
    ChainSource.messageAt(seq, cfg)
  }
}
