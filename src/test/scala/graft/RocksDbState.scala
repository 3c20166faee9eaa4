package graft

import org.scalatest.funsuite.AnyFunSuite

/** Re-runs a suite's every test under the RocksDB state store provider
  * (VERDICT r15 #3): the default HDFS-backed provider holds ALL keys'
  * state on-heap, the one remaining streaming scale risk at 100 TB key
  * cardinality — RocksDB keeps state on local disk with a bounded block
  * cache. Mix into a twin/soak suite subclass:
  *
  *   class StreamingFunnelRocksDbSpec extends StreamingFunnelSpec with RocksDbState
  *
  * The provider is a per-query conf captured at stream start, so setting
  * it around each test covers every query the test starts; suites run
  * sequentially in the forked test JVM, so the shared session's conf
  * cannot leak into a concurrently-running suite.
  */
trait RocksDbState extends AnyFunSuite { this: SparkSpec =>

  abstract override def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksDbState.Provider)
    try super.withFixture(test)
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}

object RocksDbState {
  val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
}
