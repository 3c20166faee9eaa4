package graft.sink

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{BlockScoped, ChTable, CursorRow}
import graft.pipeline.ChangePipeline

/** Per-micro-batch multi-table sink + cursor persistence (operators O13/O14)
  * and cursor recovery (O15).
  *
  * Mirrors the reference loader: route each released block's changes to
  * per-table writers, commit the data, THEN persist the cursor
  * (`src/loader.rs:111-175`; cursor strictly after data since v1.2.1,
  * `CHANGELOG.md:30-34`). Data writes are append (at-least-once on retry),
  * the cursor is append + latest-wins on read (`README.md:9-11`) — restart
  * resumes from the last persisted cursor, and Spark's checkpoint prevents
  * re-delivery of committed batches, so the effective guarantee matches the
  * reference's.
  *
  * Scale: one `ChangePipeline.process` per batch over a cached exploded
  * frame; each table write is a partitioned parquet append executed on the
  * cluster. Only the single cursor row ever touches the driver.
  */
class MultiTableSink(
    catalog: Seq[ChTable],
    outDir: String,
    cursorId: String,
    strict: Boolean = false) extends Serializable {

  def dataPath(table: String): String = s"$outDir/data/$table"
  def cursorPath: String = s"$outDir/cursors"

  /** foreachBatch body: write every table's typed rows, then the cursor. */
  def writeBatch(blocks: Dataset[BlockScoped], batchId: Long): Unit = {
    if (blocks.isEmpty) return
    val spark = blocks.sparkSession
    val cached = blocks.cache()
    try {
      val frames = ChangePipeline.process(cached, catalog, strict)
      // ONE aggregation decides which tables this batch touches, instead of
      // an isEmpty job per catalog table (O(tables) launches on a wide
      // catalog); then each present table runs exactly one write job.
      val present = cached.toDF()
        .select(explode(col("changes.table")).as("t"))
        .distinct().collect().map(_.getString(0)).toSet
      frames.foreach { case (table, df) =>
        if (present(table)) df.write.mode("append").parquet(dataPath(table))
      }
      // cursor last — only after every table committed (reference ordering)
      val top = cached
        .select(col("clock.number").as("block_num"), col("clock.id").as("block_id"), col("cursor"))
        .orderBy(desc("block_num")).limit(1).collect()
      top.headOption.foreach { r =>
        persistCursor(spark,
          CursorRow(cursorId, r.getAs[String]("cursor"), r.getAs[Long]("block_num"),
            r.getAs[String]("block_id")))
      }
    } finally cached.unpersist()
  }

  def persistCursor(spark: SparkSession, row: CursorRow): Unit = {
    import spark.implicits._
    Seq(row).toDS().write.mode("append").parquet(cursorPath)
  }

  /** O15 / query Q3: `SELECT * FROM cursors WHERE id=? ORDER BY block_num
    * DESC` fetch-first (`src/main.rs:299-310`). */
  def loadCursor(spark: SparkSession): Option[CursorRow] = {
    import spark.implicits._
    if (!new java.io.File(cursorPath).exists()) None
    else spark.read.parquet(cursorPath)
      .filter(col("id") === cursorId)
      .orderBy(desc("blockNum"))
      .limit(1)
      .as[CursorRow]
      .collect()
      .headOption
  }
}
