package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.model.{BlockMsg, BlockScoped, ChTable}
import graft.sink.{ClickHouseHttpSink, JdbcMultiTableSink, MultiTableSink}

/** End-to-end wiring of the streaming load path (reference run-loop,
  * `src/main.rs:194-235`):
  *
  *   message stream → finality buffer/undo (stateful) → per-batch:
  *   decode/route/cast → per-table sink → cursor write-last
  *
  * Checkpointing covers both the source offsets and the buffer state, so a
  * restarted query resumes mid-chain without re-delivering committed batches
  * — the Spark-native equivalent of the reference's cursor-resume + in-memory
  * buffer rebuild. Micro-batch period plays the reference's 15 s insert
  * period (`src/loader.rs:58`); pass a `Trigger` via `writeStream` options if
  * the default (as-fast-as-possible) isn't wanted.
  */
object GraftStream {

  /** Generic wiring: any sink honoring the `(releasedBlocks, batchId)`
    * contract — parquet ([[MultiTableSink]]) and JDBC
    * ([[JdbcMultiTableSink]]) both plug in here. */
  def startWith(msgs: Dataset[BlockMsg], checkpointDir: String)(
      writeBatch: (Dataset[BlockScoped], Long) => Unit): StreamingQuery =
    StreamingFinality.released(msgs)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(writeBatch)
      .start()

  def start(
      msgs: Dataset[BlockMsg],
      catalog: Seq[ChTable],
      outDir: String,
      checkpointDir: String,
      cursorId: String,
      strict: Boolean = false): StreamingQuery =
    startWith(msgs, checkpointDir)(
      new MultiTableSink(catalog, outDir, cursorId, strict).writeBatch)

  /** Stream into a JDBC database with replace-on-PK idempotent writes. */
  def startJdbc(
      msgs: Dataset[BlockMsg],
      catalog: Seq[ChTable],
      url: String,
      checkpointDir: String,
      cursorId: String,
      pkCols: Map[String, Seq[String]] = Map.empty,
      strict: Boolean = false): StreamingQuery =
    startWith(msgs, checkpointDir)(
      new JdbcMultiTableSink(catalog, url, cursorId, pkCols, strict = strict).writeBatch)

  /** Stream into a ClickHouse HTTP endpoint — RowBinary + native-LZ4
    * inserts, cursor row last (the reference's actual delivery path,
    * VERDICT r13 #1). At-least-once inserts + ReplacingMergeTree cursor
    * collapse, exactly the reference's contract. */
  def startClickHouse(
      msgs: Dataset[BlockMsg],
      catalog: Seq[ChTable],
      endpoint: String,
      checkpointDir: String,
      cursorId: String,
      user: String = "default",
      password: String = "",
      strict: Boolean = false): StreamingQuery =
    startWith(msgs, checkpointDir)(
      new ClickHouseHttpSink(catalog, endpoint, cursorId, user, password,
        strict = strict).writeBatch)

  /** Streaming file source of BlockMsg parquet rows — the fixture stand-in
    * for the gRPC connector (SURVEY §7.1 source a). One file per trigger
    * keeps batch boundaries deterministic for tests. */
  def fileSource(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 1): Dataset[BlockMsg] = {
    implicit val enc = Encoders.product[BlockMsg]
    spark.readStream
      .schema(enc.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)
      .as[BlockMsg]
  }
}
