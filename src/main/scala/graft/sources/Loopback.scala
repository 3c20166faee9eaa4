package graft.sources

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.apache.spark.sql.catalyst.InternalRow

/** In-process LOOPBACK transport for the chain source — the closest the
  * sandbox gets to the reference's live substreams client (O1): a real
  * socket hop, a per-connection auth handshake, connect-timeout/keepalive
  * channel options, and mid-stream connection drops that the reader's
  * [[Backoff]] loop must survive by reconnecting and re-requesting the same
  * cursor position (the reference's reconnect-resume,
  * `src/substreams_stream.rs:53-149`; channel shape `src/substreams.rs:26-77`).
  *
  * The envelope DATA travels over the wire — the client never regenerates
  * messages locally; it parses the server's response into a
  * [[ChainSource.Envelope]] and encodes it with the shared
  * [[ChainSource.toInternalRow]], so loopback and synthetic paths are
  * bit-identical by construction of the encoder, not by shared generation.
  *
  * Wire protocol (UTF-8 lines over TCP; one request, one response):
  * {{{
  *   C: AUTH <token|->          S: OK | ERR UNAUTHENTICATED
  *   C: GET <seq>               S: DATA <seq> <height> <fork> <finalHeight> <tsMicros>
  *                                 | UNDO <seq> <lastValid>
  *                                 | (connection dropped — injected fault)
  * }}}
  */
final class LoopbackChainServer(cfg: ChainSource.Config,
    failOnceAtSeqs: Set[Long] = Set.empty) extends AutoCloseable {

  private val server = new ServerSocket()
  server.bind(new InetSocketAddress("127.0.0.1", 0))
  /** Ephemeral port — pass `127.0.0.1:port` as the source's `endpoint`. */
  val port: Int = server.getLocalPort

  private val running = new AtomicBoolean(true)
  /** Connections accepted — a reconnect after a drop adds one. */
  val accepts = new AtomicInteger(0)
  /** Per-seq service count (including the dropped first attempts). */
  val served = new ConcurrentHashMap[Long, Integer]()
  private val dropped = ConcurrentHashMap.newKeySet[Long]()

  private val acceptor = new Thread(() => {
    while (running.get()) {
      try {
        val sock = server.accept()
        accepts.incrementAndGet()
        val t = new Thread(() => handle(sock), s"loopback-conn-${accepts.get()}")
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () } // closed during accept -> exit loop
    }
  }, "loopback-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  private def handle(sock: Socket): Unit = {
    try {
      val in = new BufferedReader(
        new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      val out = new BufferedWriter(
        new OutputStreamWriter(sock.getOutputStream, StandardCharsets.UTF_8))
      def reply(s: String): Unit = { out.write(s); out.write("\n"); out.flush() }
      // ---- auth handshake: SERVER-side enforcement, like the reference's
      // per-request authorization interceptor (src/substreams.rs:56-71)
      val hello = in.readLine()
      if (hello == null) return
      val tok = hello.stripPrefix("AUTH ").trim
      if (cfg.requireAuth && (tok.isEmpty || tok == "-")) {
        reply("ERR UNAUTHENTICATED"); sock.close(); return
      }
      reply("OK")
      // ---- request loop
      var line = in.readLine()
      while (line != null && running.get()) {
        val seq = line.stripPrefix("GET ").trim.toLong
        served.merge(seq, 1, (a, b) => a + b)
        if (failOnceAtSeqs.contains(seq) && dropped.add(seq)) {
          // injected mid-stream fault: drop the connection without a
          // response — the client sees EOF, Backoff retries, the retry
          // reconnects and re-requests THIS seq
          sock.close(); return
        }
        val e = ChainSource.envelopeAt(seq, cfg)
        if (e.isUndo) reply(s"UNDO ${e.seq} ${e.lastValid}")
        else reply(s"DATA ${e.seq} ${e.height} ${e.fork} ${e.finalHeight} ${e.tsMicros}")
        line = in.readLine()
      }
      sock.close()
    } catch { case _: Throwable => () } // client went away — per-conn thread ends
  }

  override def close(): Unit = {
    running.set(false)
    scala.util.Try(server.close())
  }
}

/** Client half of the loopback transport, selected with
  * `.option("fetcherClass", "graft.sources.LoopbackBlockFetcher")` and
  * pointed at a [[LoopbackChainServer]] via `.option("endpoint",
  * "127.0.0.1:<port>")`. Honors the channel options the reference sets on
  * its tonic channel (`src/substreams.rs:40-41`): `connectTimeoutMs` bounds
  * both TCP connect and per-read wait, `keepaliveMs > 0` turns on TCP
  * keepalive. Auth rejections surface as [[UnauthenticatedException]]
  * (fatal, no retry); any transport error closes the socket and throws
  * IOException so [[Backoff]] retries and the next `fetch` RECONNECTS and
  * re-requests the same seq — cursor-resume at the transport layer. */
final class LoopbackBlockFetcher(cfg: ChainSource.Config) extends BlockFetcher {
  require(cfg.endpoint.nonEmpty,
    "LoopbackBlockFetcher needs .option(\"endpoint\", \"host:port\")")
  private val Array(host, portStr) = cfg.endpoint.split(":", 2)
  private val addr = new InetSocketAddress(host, portStr.toInt)

  private var sock: Socket = _
  private var in: BufferedReader = _
  private var out: BufferedWriter = _

  private def connect(): Unit = {
    val s = new Socket()
    if (cfg.keepaliveMs > 0) s.setKeepAlive(true)
    s.setSoTimeout(cfg.connectTimeoutMs.toInt)
    s.connect(addr, cfg.connectTimeoutMs.toInt)
    val i = new BufferedReader(
      new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
    val o = new BufferedWriter(
      new OutputStreamWriter(s.getOutputStream, StandardCharsets.UTF_8))
    o.write(s"AUTH ${if (cfg.token.isEmpty) "-" else cfg.token}\n"); o.flush()
    i.readLine() match {
      case "OK" => sock = s; in = i; out = o
      case "ERR UNAUTHENTICATED" =>
        s.close()
        throw new UnauthenticatedException(
          s"server at ${cfg.endpoint} rejected the bearer token")
      case other =>
        s.close()
        throw new java.io.IOException(s"bad handshake response: $other")
    }
  }

  private def disconnect(): Unit = {
    if (sock != null) scala.util.Try(sock.close())
    sock = null; in = null; out = null
  }

  override def fetch(seq: Long): InternalRow = {
    if (sock == null || sock.isClosed) connect()
    try {
      out.write(s"GET $seq\n"); out.flush()
      val resp = in.readLine()
      if (resp == null) throw new java.io.IOException(
        s"connection dropped mid-stream at seq $seq")
      val parts = resp.split(" ")
      val env = parts(0) match {
        case "DATA" => ChainSource.Envelope(parts(1).toLong, isUndo = false,
          height = parts(2).toLong, fork = parts(3).toLong, lastValid = -1L,
          finalHeight = parts(4).toLong, tsMicros = parts(5).toLong)
        case "UNDO" => ChainSource.Envelope(parts(1).toLong, isUndo = true,
          height = -1L, fork = -1L, lastValid = parts(2).toLong,
          finalHeight = -1L, tsMicros = -1L)
        case other => throw new java.io.IOException(s"bad response: $other")
      }
      ChainSource.toInternalRow(env)
    } catch {
      case e: java.io.IOException => disconnect(); throw e
    }
  }

  override def close(): Unit = disconnect()
}
