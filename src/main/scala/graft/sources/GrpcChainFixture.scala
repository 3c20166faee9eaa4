package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Lane-scoped [[GrpcChainServer]] singletons: the `pipeline_e2e_grpc` lane
  * drives the chain pipeline over the REAL TLS+ALPN gRPC transport, and a
  * lane function only returns a lazy DataFrame — the server must outlive
  * the plan's execution (Verify/Bench materialize after the lane function
  * returns). One server per generator config, started on demand, closed by
  * a JVM shutdown hook. local-mode fixture only: executors share the JVM
  * and reach 127.0.0.1 — a cluster deployment points `endpoint` at a real
  * substreams service instead. */
object GrpcChainFixture {

  private val servers = new ConcurrentHashMap[String, GrpcChainServer]()

  sys.addShutdownHook {
    servers.values().forEach(s => scala.util.Try(s.close()))
  }

  /** Bound port of the shared server for `opts` (a ChainSource option map). */
  def port(opts: Map[String, String]): Int = {
    val key = opts.toSeq.sorted.mkString(",")
    servers.computeIfAbsent(key, _ => {
      val jm = new java.util.HashMap[String, String]()
      opts.foreach { case (k, v) => jm.put(k, v) }
      new GrpcChainServer(ChainSource.config(new CaseInsensitiveStringMap(jm)))
    }).port
  }
}
