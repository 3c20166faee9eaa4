package graft.sink

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.{BlockScoped, ChTable}
import graft.pipeline.ChangePipeline

/** Shared micro-batch skeleton for the O13/O14 sinks — the parquet and JDBC
  * variants differ ONLY in how a table frame is written and where the cursor
  * row goes, so the batch shape lives here once:
  *
  *  1. route/cast the released blocks per table (ChangePipeline);
  *  2. ONE aggregation decides which tables the batch touches (vs an
  *     isEmpty job per catalog table);
  *  3. write each present table;
  *  4. persist the top cursor LAST — only after every table committed
  *     (reference ordering, `src/loader.rs:111-175`).
  */
object SinkBatch {

  def run(
      blocks: Dataset[BlockScoped],
      catalog: Seq[ChTable],
      strict: Boolean,
      onFrames: Map[String, DataFrame] => Unit = _ => ())(
      writeTable: (String, DataFrame) => Unit)(
      persistCursor: (String, Long, String) => Unit): Unit = {
    if (blocks.isEmpty) return
    val cached = blocks.cache()
    try {
      val frames = ChangePipeline.process(cached, catalog, strict)
      onFrames(frames)
      val present = cached.toDF()
        .select(explode(col("changes.table")).as("t"))
        .distinct().collect().map(_.getString(0)).toSet
      frames.foreach { case (table, df) =>
        if (present(table)) writeTable(table, df)
      }
      val top = cached
        .select(col("clock.number").as("block_num"), col("clock.id").as("block_id"), col("cursor"))
        .orderBy(desc("block_num")).limit(1).collect()
      top.headOption.foreach { r =>
        persistCursor(r.getAs[String]("cursor"), r.getAs[Long]("block_num"),
          r.getAs[String]("block_id"))
      }
    } finally cached.unpersist()
  }
}
