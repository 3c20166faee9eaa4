package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.SparkSpec

/** O1 closure (VERDICT r10 #3/#4): the loopback transport drives the chain
  * source through a REAL socket — auth handshake, connection drops,
  * reconnect-resume — and the range options (`startBlock`/`endBlock`)
  * replicate the reference CLI's cursorless-start/stop-at-bound contract
  * (`src/main.rs:63-66`). */
class LoopbackChainSpec extends SparkSpec {

  private def cfgOf(opts: Map[String, String]): ChainSource.Config = {
    val jm = new java.util.HashMap[String, String]()
    opts.foreach { case (k, v) => jm.put(k, v) }
    ChainSource.config(new CaseInsensitiveStringMap(jm))
  }

  private def readBatch(opts: Map[String, String]) = {
    var r = spark.read.format("graft.sources.ChainSource")
    opts.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  test("loopback transport: envelopes shipped over the socket are bit-identical to the synthetic path") {
    val gen = Map("totalBlocks" -> "30", "reorgEvery" -> "10",
      "reorgDepth" -> "2", "finalityLag" -> "5", "numPartitions" -> "3")
    val server = new LoopbackChainServer(cfgOf(gen))
    try {
      val viaWire = readBatch(gen ++ Map(
        "fetcherClass" -> "graft.sources.LoopbackBlockFetcher",
        "endpoint" -> s"127.0.0.1:${server.port}")).toJSON.collect().sorted
      val synthetic = readBatch(gen).toJSON.collect().sorted
      assert(viaWire.length === 30)
      assert(viaWire.toSeq === synthetic.toSeq,
        "wire-parsed envelopes must encode identically to locally generated ones")
    } finally server.close()
  }

  test("loopback transport: a mid-stream connection drop is retried — reconnect re-requests the same seq") {
    val gen = Map("totalBlocks" -> "30", "numPartitions" -> "2", "maxRetries" -> "4")
    val server = new LoopbackChainServer(cfgOf(gen), failOnceAtSeqs = Set(13L))
    try {
      val df = readBatch(gen ++ Map(
        "fetcherClass" -> "graft.sources.LoopbackBlockFetcher",
        "endpoint" -> s"127.0.0.1:${server.port}"))
      assert(df.select("seq").collect().map(_.getLong(0)).sorted.toSeq === (0L until 30L),
        "nothing lost or duplicated across the drop")
      assert(server.served.get(13L) === 2,
        "the dropped seq must be re-requested by the reconnecting client")
      assert(server.accepts.get() >= 3,
        "the drop must have forced a reconnect beyond the per-partition connections")
    } finally server.close()
  }

  test("loopback transport: server-side auth rejection is fatal — no retry storm") {
    val gen = Map("totalBlocks" -> "5", "requireAuth" -> "true")
    // server enforces; the CLIENT carries no token (and must not pre-check:
    // the rejection travels back over the wire)
    assume(!sys.env.contains("SUBSTREAMS_API_TOKEN"),
      "SUBSTREAMS_API_TOKEN exported in this shell; missing-token case not testable")
    val server = new LoopbackChainServer(cfgOf(gen))
    try {
      val df = readBatch(gen ++ Map(
        "fetcherClass" -> "graft.sources.LoopbackBlockFetcher",
        "endpoint" -> s"127.0.0.1:${server.port}"))
      val e = intercept[Exception] { df.count() }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
      assert(chain(e).exists(_.isInstanceOf[UnauthenticatedException]),
        s"expected the server's UNAUTHENTICATED to surface, got $e")
      assert(chain(e).exists(_.isInstanceOf[Backoff.FatalException]))
      // one handshake per partition reader at most — fatal means no retries
      assert(server.accepts.get() <= cfgOf(gen).numPartitions + 1)
    } finally server.close()
  }

  test("loopback transport: auth accepted end-to-end when the token travels") {
    val gen = Map("totalBlocks" -> "8", "requireAuth" -> "true", "token" -> "tok-xyz")
    val server = new LoopbackChainServer(cfgOf(gen))
    try {
      val df = readBatch(gen ++ Map(
        "fetcherClass" -> "graft.sources.LoopbackBlockFetcher",
        "endpoint" -> s"127.0.0.1:${server.port}"))
      assert(df.count() === 8)
    } finally server.close()
  }

  test("loopback transport: a malformed protobuf frame is FATAL — no retry storm") {
    // rogue server: valid handshake (session frame), then garbage bytes in
    // a well-formed frame — parses as a frame, fails protobuf decode
    val server = new java.net.ServerSocket()
    server.bind(new java.net.InetSocketAddress("127.0.0.1", 0))
    val requests = new java.util.concurrent.atomic.AtomicInteger(0)
    val rogue = new Thread(() => {
      try while (true) {
        val sock = server.accept()
        val t = new Thread(() => {
          try {
            val in = new java.io.DataInputStream(sock.getInputStream)
            val out = new java.io.DataOutputStream(sock.getOutputStream)
            EnvelopeWire.readFrame(in) // token
            EnvelopeWire.writeFrame(out, EnvelopeWire.MsgFlag,
              EnvelopeWire.encodeSession("rogue"))
            while (true) {
              EnvelopeWire.readFrame(in) // request
              requests.incrementAndGet()
              EnvelopeWire.writeFrame(out, EnvelopeWire.MsgFlag,
                Array[Byte](0x22, 0x7F, 0x01)) // frame OK, protobuf lies
            }
          } catch { case _: Throwable => scala.util.Try(sock.close()) }
        })
        t.setDaemon(true); t.start()
      } catch { case _: Throwable => () }
    })
    rogue.setDaemon(true); rogue.start()
    try {
      val df = readBatch(Map("totalBlocks" -> "10", "numPartitions" -> "1",
        "maxRetries" -> "6",
        "fetcherClass" -> "graft.sources.LoopbackBlockFetcher",
        "endpoint" -> s"127.0.0.1:${server.getLocalPort}"))
      val e = intercept[Exception] { df.count() }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
      assert(chain(e).exists(_.isInstanceOf[EnvelopeWire.MalformedFrameException]),
        s"expected MalformedFrameException to surface, got $e")
      assert(chain(e).exists(_.isInstanceOf[Backoff.FatalException]),
        "malformed frames must short-circuit the retry loop")
      assert(requests.get() === 1,
        s"fatal means exactly ONE request — a retry storm sent ${requests.get()}")
    } finally scala.util.Try(server.close())
  }

  test("startBlock/endBlock: batch read covers exactly [startBlock, endBlock)") {
    val df = readBatch(Map("totalBlocks" -> "1000",
      "startBlock" -> "10", "endBlock" -> "20"))
    assert(df.select("seq").collect().map(_.getLong(0)).sorted.toSeq === (10L until 20L))
    // totalBlocks still binds when it is the tighter cap
    val capped = readBatch(Map("totalBlocks" -> "15",
      "startBlock" -> "10", "endBlock" -> "100"))
    assert(capped.select("seq").collect().map(_.getLong(0)).sorted.toSeq === (10L until 15L))
  }

  test("startBlock applies only when cursorless; the checkpoint cursor wins on restart") {
    val root = Files.createTempDirectory("chainrange").toString
    val ckpt = s"$root/ckpt"; val out = s"$root/out"

    def run(opts: Map[String, String]): Unit = {
      var r = spark.readStream.format("graft.sources.ChainSource")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.load().select(col("seq"), col("kind"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    // cursorless: starts at 5, completes at the exclusive bound 15
    run(Map("totalBlocks" -> "1000", "startBlock" -> "5", "endBlock" -> "15",
      "blocksPerTrigger" -> "4"))
    val first = spark.read.parquet(out).select("seq").collect().map(_.getLong(0)).sorted
    assert(first.toSeq === (5L until 15L), "cursorless start must honor startBlock and stop at endBlock")
    // restart with a DIFFERENT startBlock and a wider bound: the committed
    // cursor (15) wins — no re-delivery, no backfill below it
    run(Map("totalBlocks" -> "1000", "startBlock" -> "0", "endBlock" -> "25",
      "blocksPerTrigger" -> "4"))
    val second = spark.read.parquet(out).select("seq").collect().map(_.getLong(0)).sorted
    assert(second.toSeq === (5L until 25L).toSeq,
      "restart must resume from the cursor, ignoring the new startBlock")
  }

  test("endBlock below the checkpointed cursor never moves the offset backward") {
    val root = Files.createTempDirectory("chainshrink").toString
    val ckpt = s"$root/ckpt"; val out = s"$root/out"
    def run(opts: Map[String, String]): Unit = {
      var r = spark.readStream.format("graft.sources.ChainSource")
      opts.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.load().select(col("seq"))
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt).outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }
    run(Map("totalBlocks" -> "1000", "endBlock" -> "30", "blocksPerTrigger" -> "10"))
    // restart with the bound BELOW the committed cursor (30): must hold
    // position and deliver nothing — never regress the offset
    run(Map("totalBlocks" -> "1000", "endBlock" -> "10", "blocksPerTrigger" -> "10"))
    // widen again: only [30, 40) may arrive; a regressed offset would
    // re-deliver [10, 30) here as duplicates
    run(Map("totalBlocks" -> "1000", "endBlock" -> "40", "blocksPerTrigger" -> "10"))
    val seqs = spark.read.parquet(out).select("seq").collect().map(_.getLong(0)).sorted
    assert(seqs.toSeq === (0L until 40L),
      s"shrink-then-widen must deliver each seq exactly once, got ${seqs.length} rows")
  }

  test("loopback streaming: checkpointed cursor survives a mid-run fault and a restart") {
    val gen = Map("totalBlocks" -> "1000", "startBlock" -> "0", "endBlock" -> "40",
      "blocksPerTrigger" -> "9", "numPartitions" -> "2", "maxRetries" -> "4")
    val server = new LoopbackChainServer(cfgOf(gen), failOnceAtSeqs = Set(22L))
    try {
      val root = Files.createTempDirectory("chainloop").toString
      val ckpt = s"$root/ckpt"; val out = s"$root/out"
      def run(): Unit = {
        var r = spark.readStream.format("graft.sources.ChainSource")
        (gen ++ Map("fetcherClass" -> "graft.sources.LoopbackBlockFetcher",
          "endpoint" -> s"127.0.0.1:${server.port}"))
          .foreach { case (k, v) => r = r.option(k, v) }
        val q = r.load().select(col("seq"), col("kind"))
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", ckpt).outputMode("append").start()
        q.processAllAvailable(); q.stop()
      }
      run()
      run() // restart: committed range must not re-deliver
      val seqs = spark.read.parquet(out).select("seq").collect().map(_.getLong(0)).sorted
      assert(seqs.toSeq === (0L until 40L),
        "exactly-once across the injected drop and the restart")
      assert(server.served.get(22L) === 2, "the dropped seq was re-fetched once")
    } finally server.close()
  }
}
