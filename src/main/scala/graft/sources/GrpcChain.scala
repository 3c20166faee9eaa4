package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.{ConcurrentHashMap, LinkedBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import io.netty.bootstrap.{Bootstrap, ServerBootstrap}
import io.netty.buffer.{ByteBuf, Unpooled}
import io.netty.channel.{Channel, ChannelHandler, ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.SocketChannel
import io.netty.channel.socket.nio.{NioServerSocketChannel, NioSocketChannel}
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame, DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2DataFrame, Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler, Http2StreamChannel, Http2StreamChannelBootstrap}
import io.netty.handler.ssl.{ApplicationProtocolConfig, ApplicationProtocolNames, ApplicationProtocolNegotiationHandler, SslContext, SslContextBuilder, SslHandler, SslProvider}
import io.netty.handler.ssl.util.InsecureTrustManagerFactory

import org.apache.spark.sql.catalyst.InternalRow

/** O1's LAST sandbox-closable distance: the chain transport as an actual
  * gRPC call over HTTP/2 — the same bytes the reference's tonic channel
  * puts on the wire (`src/substreams.rs:26-77`). With `.option("tls",
  * "true")` the connection is TLS with ALPN-negotiated h2 (tonic's
  * `ClientTlsConfig::new()` shape, `src/substreams.rs:33-50`); without it,
  * h2c prior-knowledge cleartext — the framing above the
  * transport-security layer is identical either way:
  *
  *  - HTTP/2 HEADERS open `POST /sf.substreams.rpc.v2.Stream/Blocks`
  *    with `content-type: application/grpc`, `te: trailers`, and the
  *    per-request `authorization: Bearer <token>` header (the
  *    interceptor shape of `src/substreams.rs:56-71`);
  *  - ONE protobuf `Request{start_block_num, start_cursor,
  *    stop_block_num}` in gRPC's 5-byte-prefixed DATA framing opens a
  *    SERVER-STREAMED range — the reference's actual call shape (one
  *    request, a stream of responses), not a per-seq RPC;
  *  - the server streams `Response{session}` first, then one
  *    `Response{block_scoped_data | block_undo_signal}` per position
  *    ([[EnvelopeWire]] encodes the same message bytes as the loopback),
  *    and closes with `grpc-status: 0` trailers;
  *  - auth rejection is a trailers-only response with `grpc-status: 16`
  *    (UNAUTHENTICATED) — fatal at the client, no retry storm;
  *  - a dropped connection surfaces as stream EOF → IOException →
  *    [[Backoff]] retries and the client REOPENS the call with
  *    `start_cursor` = the SERVER-MINTED OPAQUE token of the last message
  *    it consumed, stored VERBATIM and returned unmodified — the server
  *    resumes AFTER it, exactly `src/substreams_stream.rs:98-110`'s
  *    replay-verbatim contract (and cursor wins over start_block,
  *    `src/main.rs:63-66`); with nothing consumed yet the open is
  *    cursorless via `start_block_num` (the reference's fresh-start path).
  *
  * Netty's HTTP/2 codec ships on the Spark classpath
  * (`netty-codec-http2`), so this uses the same frame machinery Spark's
  * own RPC stack is built on — no new dependency.
  */
object GrpcChain {
  val BlocksPath = "/sf.substreams.rpc.v2.Stream/Blocks"

  /** gRPC message framing: 1-byte compressed flag (0) + 4-byte BE length. */
  def grpcFrame(msg: Array[Byte]): ByteBuf = {
    val buf = Unpooled.buffer(5 + msg.length)
    buf.writeByte(0); buf.writeInt(msg.length); buf.writeBytes(msg)
    buf
  }

  /** Accumulates DATA-frame bytes and yields complete gRPC messages.
    * A compressed flag or hostile length is malformed (this transport
    * never negotiates compression). Amortized O(N): appends copy only
    * the incoming bytes into a doubling buffer, extraction advances a
    * read offset (no residual re-copy — review r12 finding), and the
    * buffer compacts when the dead prefix dominates. */
  final class FrameAccumulator {
    private var buf = new Array[Byte](512)
    private var start = 0
    private var end = 0
    def append(b: ByteBuf): Unit = {
      val n = b.readableBytes()
      if (end + n > buf.length) {
        val live = end - start
        if (live + n <= buf.length / 2) {
          System.arraycopy(buf, start, buf, 0, live) // compact in place
        } else {
          val grown = new Array[Byte](math.max(buf.length * 2, live + n))
          System.arraycopy(buf, start, grown, 0, live)
          buf = grown
        }
        start = 0; end = live
      }
      b.readBytes(buf, end, n)
      end += n
    }
    def next(): Option[Array[Byte]] = {
      if (end - start < 5) return None
      val flag = buf(start) & 0xFF
      if (flag != 0)
        throw new EnvelopeWire.MalformedFrameException(f"unsupported gRPC flag 0x$flag%02x")
      val len = ((buf(start + 1) & 0xFF) << 24) | ((buf(start + 2) & 0xFF) << 16) |
        ((buf(start + 3) & 0xFF) << 8) | (buf(start + 4) & 0xFF)
      if (len < 0 || len > EnvelopeWire.MaxFrameBytes)
        throw new EnvelopeWire.MalformedFrameException(s"gRPC frame length $len out of bounds")
      if (end - start < 5 + len) return None
      val msg = java.util.Arrays.copyOfRange(buf, start + 5, start + 5 + len)
      start += 5 + len
      if (start == end) { start = 0; end = 0 }
      Some(msg)
    }
  }

  /** One event-loop group per EXECUTOR, shared by every fetcher (daemon
    * threads, never torn down): ChainReaderFactory builds a fetcher per
    * partition per micro-batch, and a per-fetcher group would churn a
    * thread + selector each trigger (review r12 finding). */
  lazy val sharedGroup: NioEventLoopGroup = new NioEventLoopGroup(2,
    new io.netty.util.concurrent.DefaultThreadFactory("graft-grpc-client", true))

  /** gRPC statuses worth retrying: DEADLINE_EXCEEDED (4), RESOURCE_EXHAUSTED
    * (8), UNAVAILABLE (14) — the transient transport/server conditions.
    * Every other non-zero status is DETERMINISTIC (INVALID_ARGUMENT,
    * UNIMPLEMENTED, …): the server will reject the identical replayed
    * request, so retrying burns the whole budget in reconnect/reopen churn
    * before surfacing the real error (advice r12). Status 16 keeps its
    * dedicated [[UnauthenticatedException]]. */
  val RetryableStatuses: Set[Int] = Set(4, 8, 14)

  /** A deterministic server rejection (non-0/16 grpc-status outside
    * [[RetryableStatuses]]) — [[Backoff]] treats it as fatal. */
  final class NonRetryableStatusException(val code: Int, message: String)
    extends RuntimeException(s"grpc-status $code (non-retryable): $message")

  /** The WHOLE status taxonomy in one function (r13 #9: table-enumerated
    * over all 17 codes in GrpcChainSpec so it can't drift):
    *  - 16 UNAUTHENTICATED → [[UnauthenticatedException]] (fatal — the
    *    replayed token would be rejected again);
    *  - 0 OK mid-stream → IOException (the stream ended before the
    *    requested range was served; the reconnect resumes from cursor);
    *  - {4, 8, 14} ([[RetryableStatuses]]) → IOException (transient);
    *  - every other code → [[NonRetryableStatusException]] (deterministic
    *    rejection, advice r12).
    * [[Backoff]] retries IOException and treats the other two as fatal. */
  def statusException(code: Int, message: String,
      endpoint: String, seq: Long): Exception = code match {
    case 16 => new UnauthenticatedException(
      s"server at $endpoint rejected the bearer token (grpc-status 16)")
    case 0 => new java.io.IOException(
      s"server completed the stream before seq $seq was served")
    case c if RetryableStatuses(c) =>
      new java.io.IOException(s"grpc-status $c (transient): $message")
    case c => new NonRetryableStatusException(c, message)
  }

  // ---- TLS + ALPN (the reference's transport security) ---------------------
  //
  // The reference's tonic channel is TLS with ALPN-negotiated h2
  // (`src/substreams.rs:33-50`: `tls_config(ClientTlsConfig::new())` — tonic
  // advertises "h2" in the ALPN extension and fails the connection unless
  // the server selects it). Same machinery here via Netty's SslContext on
  // the Spark classpath. The fixture server's certificate is a self-signed
  // RSA keypair minted once per JVM by the JDK's own keytool (no new
  // dependency). Client TRUST follows tonic's posture (review r13 finding —
  // insecure trust must never be the silent default):
  //
  //  - default: the JVM's system trust roots + HTTPS endpoint
  //    identification (hostname verification), exactly ClientTlsConfig;
  //  - `.option("tlsTrustCertPath", pem)`: trust that CA/cert instead
  //    (still hostname-verified) — how the specs validate the fixture's
  //    REAL certificate rather than disabling validation;
  //  - `.option("tlsInsecure", "true")`: explicit opt-out, never implied.

  val TlsPassword = "graft-loopback-tls"

  private lazy val tlsDir: java.nio.file.Path = {
    val dir = java.nio.file.Files.createTempDirectory("graft-grpc-tls")
    dir.toFile.deleteOnExit()
    val ksFile = dir.resolve("server.p12").toFile
    ksFile.deleteOnExit()
    val keytool = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "keytool").getAbsolutePath
    def run(args: String*): Unit = {
      val p = new ProcessBuilder((keytool +: args): _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      if (p.waitFor() != 0)
        throw new IllegalStateException(s"keytool ${args.head} failed: $out")
    }
    run("-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "2",
      "-dname", "CN=127.0.0.1", "-ext", "SAN=IP:127.0.0.1,DNS:localhost",
      "-storetype", "PKCS12", "-keystore", ksFile.getAbsolutePath,
      "-storepass", TlsPassword, "-keypass", TlsPassword)
    // the cert as PEM, so clients can TRUST it properly instead of
    // disabling validation
    run("-exportcert", "-alias", "graft", "-rfc",
      "-keystore", ksFile.getAbsolutePath, "-storepass", TlsPassword,
      "-file", dir.resolve("server.pem").toString)
    dir.resolve("server.pem").toFile.deleteOnExit()
    dir
  }

  /** The fixture server's certificate as a PEM file — what in-sandbox
    * clients pass as `tlsTrustCertPath` for REAL certificate validation. */
  lazy val serverCertPem: java.io.File = tlsDir.resolve("server.pem").toFile

  private lazy val serverKeyManager: javax.net.ssl.KeyManagerFactory = {
    val ksFile = tlsDir.resolve("server.p12").toFile
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = new java.io.FileInputStream(ksFile)
    try ks.load(in, TlsPassword.toCharArray) finally in.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, TlsPassword.toCharArray)
    kmf
  }

  /** ALPN offering exactly "h2" — tonic's advertisement. JDK provider:
    * Java 17's SSLEngine speaks ALPN natively. */
  private def alpnH2: ApplicationProtocolConfig = new ApplicationProtocolConfig(
    ApplicationProtocolConfig.Protocol.ALPN,
    ApplicationProtocolConfig.SelectorFailureBehavior.NO_ADVERTISE,
    ApplicationProtocolConfig.SelectedListenerFailureBehavior.ACCEPT,
    ApplicationProtocolNames.HTTP_2)

  lazy val serverSslContext: SslContext =
    SslContextBuilder.forServer(serverKeyManager)
      .sslProvider(SslProvider.JDK)
      .applicationProtocolConfig(alpnH2)
      .build()

  private val clientCtxCache =
    new ConcurrentHashMap[(String, Boolean), SslContext]()

  /** Client TLS context for the given trust configuration (cached — one
    * context per distinct config per JVM, shared across fetchers). */
  def clientSslContext(trustCertPath: String, insecure: Boolean): SslContext =
    clientCtxCache.computeIfAbsent((trustCertPath, insecure), { key =>
      val (path, ins) = key
      val b = SslContextBuilder.forClient()
        .sslProvider(SslProvider.JDK)
        .applicationProtocolConfig(alpnH2)
      if (ins) b.trustManager(InsecureTrustManagerFactory.INSTANCE)
      else if (path.nonEmpty) b.trustManager(new java.io.File(path))
      // else: JVM default trust roots (tonic's ClientTlsConfig::new())
      b.build()
    })
}

/** gRPC server half: Http2FrameCodec + multiplexed per-stream handlers.
  * `failOnceAtSeqs` kills the TCP CONNECTION (not just the stream) the
  * first time a seq is about to be served — the mid-stream fault the
  * client must survive by reconnect + cursor-resume. `garbageAtSeqs`
  * replaces the response with undecodable protobuf — the hostile-peer
  * case that must be FATAL client-side. `statusAtSeqs` terminates the
  * stream with that grpc-status in trailers when the seq comes up — the
  * deterministic-rejection case (must be fatal unless the status is in
  * [[GrpcChain.RetryableStatuses]]). `stallMsAtSeqs` pauses the stream
  * (once per seq) before serving — the healthy-but-quiet server the
  * separate `readTimeoutMs` deadline exists for. With `cfg.tls` the
  * listener wraps
  * every accepted connection in TLS and only installs the HTTP/2 stack
  * after ALPN selects h2 (negotiated protocols are recorded in
  * [[alpnNegotiated]] for assertion). */
final class GrpcChainServer(cfg: ChainSource.Config,
    failOnceAtSeqs: Set[Long] = Set.empty,
    garbageAtSeqs: Set[Long] = Set.empty,
    statusAtSeqs: Map[Long, Int] = Map.empty,
    stallMsAtSeqs: Map[Long, Long] = Map.empty) extends AutoCloseable {
  import GrpcChain._

  val accepts = new AtomicInteger(0)
  /** Streams (gRPC calls) opened — ONE per partition on a clean read. */
  val calls = new AtomicInteger(0)
  val served = new ConcurrentHashMap[Long, Integer]()
  /** Raw `start_cursor` per Request in arrival order ("" = cursorless) —
    * the spec's verbatim-round-trip witness. */
  val requestCursors = new java.util.concurrent.CopyOnWriteArrayList[String]()
  /** Resolved start position per Request — the resume-AFTER witness. */
  val resolvedStarts = new java.util.concurrent.CopyOnWriteArrayList[java.lang.Long]()
  /** ALPN outcome per TLS connection (empty when cfg.tls is off). */
  val alpnNegotiated = new java.util.concurrent.CopyOnWriteArrayList[String]()
  private val dropped = ConcurrentHashMap.newKeySet[Long]()
  private val stalled = ConcurrentHashMap.newKeySet[Long]()

  // daemon threads: this is the in-sandbox fixture server — a lane-scoped
  // singleton (GrpcChainFixture) must not pin the Bench/Verify JVM open
  // after main returns
  private val serverThreads =
    new io.netty.util.concurrent.DefaultThreadFactory("graft-grpc-server", true)

  private def h2Stack(): Array[ChannelHandler] = Array(
    Http2FrameCodecBuilder.forServer().build(),
    new Http2MultiplexHandler(new ChannelInitializer[Channel] {
      override def initChannel(c: Channel): Unit =
        c.pipeline().addLast(new StreamHandler)
    }))

  private val group = new NioEventLoopGroup(2, serverThreads)
  private val bound = new ServerBootstrap()
    .group(group)
    .channel(classOf[NioServerSocketChannel])
    .childHandler(new ChannelInitializer[SocketChannel] {
      override def initChannel(ch: SocketChannel): Unit = {
        accepts.incrementAndGet()
        if (cfg.tls) {
          ch.pipeline().addLast(serverSslContext.newHandler(ch.alloc()))
          // fallback "" (not h2): a peer that skipped ALPN entirely must be
          // rejected, not silently served — tonic always advertises
          ch.pipeline().addLast(new ApplicationProtocolNegotiationHandler("") {
            override def configurePipeline(ctx: ChannelHandlerContext, protocol: String): Unit = {
              alpnNegotiated.add(protocol)
              if (protocol != ApplicationProtocolNames.HTTP_2)
                throw new IllegalStateException(s"ALPN selected '$protocol', require h2")
              ctx.pipeline().addLast(h2Stack(): _*)
            }
          })
        } else ch.pipeline().addLast(h2Stack(): _*)
      }
    })
    .bind(new InetSocketAddress("127.0.0.1", 0)).syncUninterruptibly()

  val port: Int =
    bound.channel().localAddress().asInstanceOf[InetSocketAddress].getPort

  private final class StreamHandler extends ChannelInboundHandlerAdapter {
    private val acc = new FrameAccumulator
    private var headersOk = false
    // writability-paced pump state: a large [start, stop) must not be
    // written in one synchronous loop — frames would pile in the outbound
    // buffer unboundedly and monopolize the event loop (review r12
    // finding). pump() writes while the channel is writable and resumes
    // from channelWritabilityChanged.
    private var pumpSeq = 0L
    private var pumpStop = 0L
    private var pumping = false

    private def trailersOnly(ctx: ChannelHandlerContext, status: Int, msg: String): Unit = {
      val h = new DefaultHttp2Headers()
      h.status("200")
      h.set("content-type", "application/grpc")
      h.set("grpc-status", status.toString)
      h.set("grpc-message", msg)
      ctx.writeAndFlush(new DefaultHttp2HeadersFrame(h, true))
    }

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit = msg match {
      case hf: Http2HeadersFrame =>
        calls.incrementAndGet()
        val h = hf.headers()
        val path = Option(h.path()).map(_.toString).getOrElse("")
        val auth = Option(h.get("authorization")).map(_.toString).getOrElse("")
        val tok = auth.stripPrefix("Bearer ").trim
        if (path != BlocksPath) trailersOnly(ctx, 12, s"unknown method $path")
        else if (cfg.requireAuth && (auth.isEmpty || !auth.startsWith("Bearer ") ||
            tok.isEmpty || tok == "-"))
          trailersOnly(ctx, 16, "UNAUTHENTICATED") // the reference's fatal status
        else headersOk = true
      case df: Http2DataFrame =>
        try {
          if (headersOk) {
            acc.append(df.content())
            if (df.isEndStream) {
              var m = acc.next()
              while (m.isDefined) { serve(ctx, m.get); m = acc.next() }
            }
          }
        } finally { val _ = df.release() }
      case other =>
        ctx.fireChannelRead(other) // settings/window frames etc.
    }

    private def serve(ctx: ChannelHandlerContext, reqBytes: Array[Byte]): Unit = {
      // decodeRequestRange resolves resume-AFTER: an opaque start_cursor
      // wins over start_block_num and positions delivery one past the token
      val EnvelopeWire.RequestRange(start, stop, reqCursor) =
        try EnvelopeWire.decodeRequestRange(reqBytes)
        catch { case _: EnvelopeWire.MalformedFrameException =>
          trailersOnly(ctx, 3, "INVALID_ARGUMENT"); return }
      requestCursors.add(reqCursor)
      resolvedStarts.add(java.lang.Long.valueOf(start))
      val rh = new DefaultHttp2Headers()
      rh.status("200")
      rh.set("content-type", "application/grpc")
      ctx.write(new DefaultHttp2HeadersFrame(rh))
      // "Always sent first" — Response{session}
      ctx.write(new DefaultHttp2DataFrame(
        grpcFrame(EnvelopeWire.encodeSession(s"grpc-trace-${calls.get()}"))))
      pumpSeq = start; pumpStop = stop; pumping = true
      pump(ctx)
    }

    private def pump(ctx: ChannelHandlerContext): Unit = {
      while (pumping && pumpSeq < pumpStop && ctx.channel().isWritable) {
        val seq = pumpSeq
        statusAtSeqs.get(seq) match {
          case Some(code) =>
            // deterministic rejection mid-stream: trailers with the status,
            // stream ends — the client must NOT burn retries on non-transient
            // codes (advice r12)
            pumping = false
            val trailers = new DefaultHttp2Headers()
            trailers.set("grpc-status", code.toString)
            trailers.set("grpc-message", s"injected status $code at seq $seq")
            ctx.writeAndFlush(new DefaultHttp2HeadersFrame(trailers, true))
            return
          case None => ()
        }
        stallMsAtSeqs.get(seq) match {
          case Some(ms) if stalled.add(seq) =>
            // the server goes QUIET before this seq (a chain waiting at
            // head): the connection stays healthy, delivery resumes after
            // the pause — the case readTimeoutMs (not connectTimeoutMs)
            // must cover (advice r12)
            ctx.flush()
            val _ = ctx.channel().eventLoop().schedule(
              new Runnable { def run(): Unit = pump(ctx) },
              ms, TimeUnit.MILLISECONDS)
            return
          case _ => ()
        }
        served.merge(seq, 1, (a, b) => a + b)
        if (failOnceAtSeqs.contains(seq) && dropped.add(seq)) {
          // kill the CONNECTION mid-stream: every stream on it EOFs,
          // the client's Backoff reconnects and resumes from its cursor
          pumping = false
          ctx.flush()
          ctx.channel().parent().close()
          return
        }
        val body =
          if (garbageAtSeqs.contains(seq)) Array[Byte](0x22, 0x7F, 0x01) // lies about length
          else EnvelopeWire.encodeResponse(ChainSource.envelopeAt(seq, cfg))
        ctx.write(new DefaultHttp2DataFrame(grpcFrame(body)))
        pumpSeq += 1
      }
      ctx.flush()
      if (pumping && pumpSeq >= pumpStop) {
        pumping = false
        val trailers = new DefaultHttp2Headers()
        trailers.set("grpc-status", "0")
        ctx.writeAndFlush(new DefaultHttp2HeadersFrame(trailers, true))
      }
      // !isWritable: resume from channelWritabilityChanged — HTTP/2 flow
      // control (the client's window replenishment) paces the stream
    }

    override def channelWritabilityChanged(ctx: ChannelHandlerContext): Unit = {
      if (pumping && ctx.channel().isWritable) pump(ctx)
      ctx.fireChannelWritabilityChanged()
    }
  }

  override def close(): Unit = {
    scala.util.Try(bound.channel().close().syncUninterruptibly())
    val _ = group.shutdownGracefully(0, 100, TimeUnit.MILLISECONDS)
  }
}

/** gRPC client half of the transport, selected with
  * `.option("fetcherClass", "graft.sources.GrpcBlockFetcher")` — the
  * drop-in the `fetcherClass` seam was built for. One gRPC call serves a
  * partition's WHOLE range: `fetch(seq)` consumes the next server-stream
  * message (verifying the cursor coordinate), and only a drop or an
  * out-of-order ask reopens the call — with `start_cursor` resume. */
final class GrpcBlockFetcher(cfg: ChainSource.Config) extends BlockFetcher {
  import GrpcChain._
  require(cfg.endpoint.nonEmpty,
    "GrpcBlockFetcher needs .option(\"endpoint\", \"host:port\")")
  private val Array(host, portStr) = cfg.endpoint.split(":", 2)

  private sealed trait Event
  private case class Msg(bytes: Array[Byte]) extends Event
  private case class Status(code: Int, message: String) extends Event
  private case object Eof extends Event
  private case class Broken(cause: Throwable) extends Event

  private var conn: Channel = _
  private var stream: Http2StreamChannel = _
  private var queue: LinkedBlockingQueue[Event] = _
  private var nextSeq: Long = -1L
  private var sessionSeen = false
  // the reader's partition range (hintRange); stopBound until announced
  private var rangeEnd: Long = cfg.stopBound
  // the server-minted opaque cursor of the last CONSUMED message, stored
  // VERBATIM (never parsed) — what a reopen returns so the server resumes
  // AFTER it (reference src/substreams_stream.rs:98-110). lastCursorSeq is
  // the client's own positional bookkeeping, independent of the token.
  private var lastCursor: String = ""
  private var lastCursorSeq: Long = Long.MinValue

  override def hintRange(start: Long, end: Long): Unit =
    rangeEnd = math.min(end, cfg.stopBound)

  private def connect(): Unit = {
    val b = new Bootstrap()
      .group(GrpcChain.sharedGroup) // per-executor, daemon — no churn
      .channel(classOf[NioSocketChannel])
      .handler(new ChannelInitializer[SocketChannel] {
        override def initChannel(ch: SocketChannel): Unit = {
          if (cfg.keepaliveMs > 0)
            ch.config().setOption(io.netty.channel.ChannelOption.SO_KEEPALIVE,
              java.lang.Boolean.TRUE)
          // with TLS the codec sits BEHIND the SslHandler: its connection
          // preface is queued by the handler until the handshake completes,
          // then travels inside TLS records — tonic's exact layering
          if (cfg.tls) {
            val ssl = GrpcChain.clientSslContext(cfg.tlsTrustCertPath, cfg.tlsInsecure)
              .newHandler(ch.alloc(), host, portStr.toInt)
            if (!cfg.tlsInsecure) {
              // hostname verification (tonic verifies the endpoint's name
              // against the cert; the fixture cert carries SAN IP:127.0.0.1)
              val eng = ssl.engine()
              val params = eng.getSSLParameters
              params.setEndpointIdentificationAlgorithm("HTTPS")
              eng.setSSLParameters(params)
            }
            ch.pipeline().addLast(ssl)
          }
          ch.pipeline().addLast(
            Http2FrameCodecBuilder.forClient().build(),
            new Http2MultiplexHandler(new ChannelInboundHandlerAdapter))
        }
      })
    val f = b.connect(host, portStr.toInt)
    if (!f.awaitUninterruptibly(cfg.connectTimeoutMs, TimeUnit.MILLISECONDS))
      throw new java.io.IOException(s"connect to ${cfg.endpoint} timed out")
    if (!f.isSuccess)
      throw new java.io.IOException(s"connect to ${cfg.endpoint} failed", f.cause())
    conn = f.channel()
    if (cfg.tls) {
      // block for the handshake so ALPN can be VERIFIED before the call
      // opens — tonic fails the connect unless the server selected h2
      val ssl = conn.pipeline().get(classOf[SslHandler])
      val hs = ssl.handshakeFuture()
      if (!hs.awaitUninterruptibly(cfg.connectTimeoutMs, TimeUnit.MILLISECONDS))
        throw new java.io.IOException(s"TLS handshake with ${cfg.endpoint} timed out")
      if (!hs.isSuccess)
        throw new java.io.IOException(s"TLS handshake with ${cfg.endpoint} failed", hs.cause())
      val proto = ssl.applicationProtocol()
      if (proto != io.netty.handler.ssl.ApplicationProtocolNames.HTTP_2)
        throw new java.io.IOException(
          s"ALPN with ${cfg.endpoint} selected '$proto', need h2")
    }
  }

  /** Open the call: HEADERS (+auth) then the one framed Request. */
  private def openCall(seq: Long): Unit = {
    if (conn == null || !conn.isActive) { teardownConn(); connect() }
    val q = new LinkedBlockingQueue[Event]()
    val sb = new Http2StreamChannelBootstrap(conn)
    sb.handler(new ChannelInitializer[Channel] {
      override def initChannel(c: Channel): Unit = {
        // PULL-based delivery (review r12 finding): with autoRead the
        // whole server-streamed range would pile into the unbounded
        // queue; with reads-on-demand the unconsumed bytes stay in the
        // HTTP/2 flow-control window, which is what throttles the server
        c.config().setAutoRead(false)
        c.pipeline().addLast(new ChannelInboundHandlerAdapter {
          private val acc = new FrameAccumulator
          override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit = msg match {
            case hf: Http2HeadersFrame =>
              val st = hf.headers().get("grpc-status")
              if (st != null) {
                val m = Option(hf.headers().get("grpc-message"))
                  .map(_.toString).getOrElse("")
                q.put(Status(st.toString.toInt, m))
              }
            case df: Http2DataFrame =>
              try {
                acc.append(df.content())
                var m = acc.next()
                while (m.isDefined) { q.put(Msg(m.get)); m = acc.next() }
              } catch { case e: EnvelopeWire.MalformedFrameException => q.put(Broken(e)) }
              finally { val _ = df.release() }
            case other => ctx.fireChannelRead(other)
          }
          override def channelReadComplete(ctx: ChannelHandlerContext): Unit = {
            // a read may end on a partial gRPC frame: keep pulling until
            // at least one decoded event is available to the consumer
            if (q.isEmpty) { val _ = ctx.read() }
            ctx.fireChannelReadComplete()
          }
          override def channelInactive(ctx: ChannelHandlerContext): Unit = {
            q.put(Eof); ctx.fireChannelInactive()
          }
        })
      }
    })
    val sf = sb.open()
    if (!sf.awaitUninterruptibly(cfg.connectTimeoutMs, TimeUnit.MILLISECONDS) || !sf.isSuccess)
      throw new java.io.IOException("HTTP/2 stream open failed",
        if (sf.isSuccess) null else sf.cause())
    val s = sf.getNow
    val h = new DefaultHttp2Headers()
    h.method("POST").scheme(if (cfg.tls) "https" else "http").path(BlocksPath)
      .authority(s"$host:$portStr")
    h.set("content-type", "application/grpc")
    h.set("te", "trailers")
    if (cfg.token.nonEmpty) h.set("authorization", s"Bearer ${cfg.token}")
    s.write(new DefaultHttp2HeadersFrame(h))
    // resume-AFTER: if the immediately preceding position was consumed on a
    // previous call, return ITS server-minted token unmodified (cursor wins
    // over start_block server-side); otherwise open cursorless at
    // start_block_num = seq — never fabricate a token (seam closed in r14)
    val resumeCursor = if (lastCursorSeq == seq - 1 && lastCursor.nonEmpty) lastCursor else ""
    s.writeAndFlush(new DefaultHttp2DataFrame(
      grpcFrame(EnvelopeWire.encodeRequestRange(
        seq, rangeEnd, resumeCursor, "graft_out")), true))
    stream = s; queue = q; nextSeq = seq; sessionSeen = false
  }

  private def teardownStream(): Unit = {
    if (stream != null) scala.util.Try(stream.close())
    stream = null; queue = null; nextSeq = -1L
  }
  private def teardownConn(): Unit = {
    teardownStream()
    if (conn != null) scala.util.Try(conn.close())
    conn = null
  }

  private def poll(): Event = {
    // pull: request more from the transport only when the decoded queue
    // is drained — unconsumed data then backs up in the flow-control
    // window instead of on this heap
    if (queue.isEmpty && stream != null && stream.isActive) {
      val _ = stream.read()
    }
    // readTimeoutMs is its own deadline (advice r12): a server legitimately
    // quiet longer than the CONNECT timeout — e.g. waiting at chain head —
    // must not be mistaken for a hang and reconnect-cycled
    val e = queue.poll(cfg.readTimeout, TimeUnit.MILLISECONDS)
    if (e == null)
      throw new java.io.IOException(
        s"gRPC stream read timed out after ${cfg.readTimeout} ms")
    e
  }

  override def fetch(seq: Long): InternalRow = {
    try {
      // reopen keyed on the CONSUMPTION state, not channel liveness: the
      // server may finish streaming (stream closes) long before the
      // reader drains the queued messages
      if (queue == null || nextSeq != seq) {
        teardownStream()
        openCall(seq)
      }
      while (true) {
        poll() match {
          case Msg(bytes) =>
            EnvelopeWire.decodeResponse(seq, bytes) match {
              case EnvelopeWire.SessionArm(_) =>
                if (sessionSeen)
                  throw new EnvelopeWire.MalformedFrameException(
                    s"duplicate SessionInit mid-stream at seq $seq")
                sessionSeen = true // always first, exactly once
              case EnvelopeWire.EnvelopeArm(env) =>
                // store the minted token of the message just consumed —
                // verbatim, undo's last_valid_cursor included (both mean
                // "continue the stream after me")
                lastCursor = if (env.isUndo) env.lastValidCursor else env.cursor
                lastCursorSeq = seq
                nextSeq = seq + 1
                return ChainSource.toInternalRow(env)
            }
          case Status(code, m) =>
            // one taxonomy function for all 17 codes (table-tested) —
            // fatal-vs-transient rationale lives on statusException
            throw GrpcChain.statusException(code, m, cfg.endpoint, seq)
          case Broken(cause) => throw cause
          case Eof =>
            throw new java.io.IOException(s"connection dropped mid-stream at seq $seq")
        }
      }
      throw new IllegalStateException("unreachable")
    } catch {
      // same taxonomy as the loopback: malformed/auth/deterministic-status
      // fatal, IO retryable, nothing may leave the stream desynced for the
      // next fetch
      case e: EnvelopeWire.MalformedFrameException => teardownConn(); throw e
      case e: UnauthenticatedException => teardownConn(); throw e
      case e: GrpcChain.NonRetryableStatusException => teardownConn(); throw e
      case e: java.io.IOException => teardownConn(); throw e
      case scala.util.control.NonFatal(e) =>
        teardownConn()
        throw new java.io.IOException(s"transport failure at seq $seq", e)
    }
  }

  override def close(): Unit =
    teardownConn() // the event-loop group is shared and daemon — never torn down
}
