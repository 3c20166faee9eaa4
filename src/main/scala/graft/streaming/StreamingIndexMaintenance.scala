package graft.streaming

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ext.{Ranking, Similarity, StoreCompaction}

/** Streaming maintenance of the persisted retrieval indexes — the 100 TB
  * ingest story (VERDICT r11 #7): a document stream (ChainSource, file
  * drops, Kafka-shaped — anything `readStream` produces) flows through
  * ONE `foreachBatch` that appends each micro-batch to
  *
  *  - the partition-pruned IVF ANN store ([[Similarity.ivfAppend]]:
  *    assign under the FIXED stored centroids, land in `ivf_cell=`
  *    partitions), and
  *  - the term-bucketed incremental BM25 store ([[Ranking.bm25Append]]:
  *    postings into `t_bucket=` partitions, doclen rows, one globals
  *    PARTIAL row per batch — probes merge partials, so no
  *    read-modify-write),
  *
  * then compacts any leaf directory whose per-generation file count
  * crossed the bound ([[StoreCompaction.compact]] is crash-safe: tmp +
  * atomic publish + orphan recovery).
  *
  * Exactly-once discipline = the sink's cursor contract (O14/O15,
  * reference `src/loader.rs` cursor-after-data) PLUS batch-keyed
  * generation files: the batch id is persisted WRITE-LAST at the
  * composition root after BOTH appends, and a replayed micro-batch
  * (restart re-delivers the last uncommitted batch) compares its id
  * against the cursor and SKIPS. The residual window that used to
  * re-ingest one batch (crash between the first append and the cursor
  * write) is CLOSED as of round 13: every append publishes its files as
  * `batch<id>-<i>.parquet` ([[graft.ext.StoreCompaction.appendKeyed]]),
  * so a replay OVERWRITES its own half-published generation instead of
  * appending a duplicate — the same replace-on-key discipline the
  * reference gets from ClickHouse replace-on-PK. Compaction (which
  * renames files away from their batch keys) runs only AFTER the cursor
  * write, so every compacted batch is already skip-guarded.
  */
object StreamingIndexMaintenance {

  /** Last applied micro-batch id, or -1 before the first. */
  def readCursor(rootDir: String): Long = {
    val f = new File(rootDir, "cursor")
    if (!f.exists()) -1L
    else new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8).trim.toLong
  }

  /** Write-last cursor persist (O14): tmp + atomic move, like the
    * MultiTableSink cursor file. */
  def writeCursor(rootDir: String, batchId: Long): Unit = {
    val dir = Paths.get(rootDir)
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".cursor.tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, batchId.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve("cursor"), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Seed the stores from an initial corpus (centroids are learned HERE
    * and stay fixed — appends assign under them, the ivfAppend contract).
    * Runs before the stream attaches; cursor starts at -1. */
  def initStores(seed: DataFrame, rootDir: String, idCol: String,
      textCol: String, vecCol: String, nCells: Int): Unit = {
    Similarity.ivfWrite(
      Similarity.ivfIndex(seed, idCol, vecCol, nCells), s"$rootDir/ivf")
    Ranking.bm25Append(seed, textCol, idCol, s"$rootDir/bm25")
    writeCursor(rootDir, -1L)
  }

  /** Apply one micro-batch to both stores. Returns false when the batch
    * id is at or below the cursor (replay → skip). Exposed separately
    * from [[attach]] so the replay-skip path is directly testable. */
  def applyBatch(batch: DataFrame, batchId: Long, rootDir: String,
      idCol: String, textCol: String, vecCol: String,
      compactAtFiles: Int = 16): Boolean = {
    if (batchId <= readCursor(rootDir)) return false
    val spark = batch.sparkSession
    // the batch frame feeds two independent writes — materialize once
    val b = batch.select(col(idCol), col(textCol), col(vecCol)).localCheckpoint()
    try {
      // batch-keyed (idempotent) appends: a replay after a crash between
      // these two lines overwrites its own generation files (r12 #6)
      Similarity.ivfAppendKeyed(spark, s"$rootDir/ivf",
        b.select(col(idCol), col(vecCol)), idCol, vecCol, s"batch$batchId")
      Ranking.bm25AppendKeyed(b.select(col(idCol), col(textCol)), textCol, idCol,
        s"$rootDir/bm25", s"batch$batchId")
      writeCursor(rootDir, batchId) // write-LAST: data before cursor (O14)
      // compaction AFTER the cursor: it only rewrites published files, so
      // a crash mid-compact never interacts with replay bookkeeping
      maybeCompact(spark, s"$rootDir/ivf/assigned", compactAtFiles)
      maybeCompact(spark, s"$rootDir/bm25/postings", compactAtFiles)
      true
    } finally graft.ext.Dedup.unpersistCheckpoint(b)
  }

  /** Compact when any leaf partition dir holds more than `maxFiles`
    * generation files (each append leaves one file per touched leaf). */
  private def maybeCompact(spark: SparkSession, path: String, maxFiles: Int): Unit = {
    val report = StoreCompaction.compact(spark, path, maxFiles = maxFiles,
      targetFiles = 1)
    val _ = report
  }

  // ---- CDC maintenance: upserts AND deletes over VERSIONED stores ------
  // Round 16: the append-only maintenance above cannot retract a document;
  // real corpora also shed them (takedowns, license revocations, GDPR).
  // The CDC path runs over the gen-stamped store format (rows live iff
  // gen >= the id's greatest tombstone before_gen — graft.ext.DeltaStore):
  // a micro-batch carries an `op` column ("upsert"/"delete"); upsert ids
  // tombstone their prior generations AND re-enter at this batch's gen in
  // the same batch (the changed-document composition), delete ids just
  // tombstone. Every write is tag-keyed by batch id, and the BM25 delete
  // computes its dying set excluding its own tag — so a replayed batch
  // converges in every crash state (bm25DeleteVersionedKeyed's pinned
  // property), on top of the cursor skip-guard.

  /** Seed the VERSIONED stores (generation 0) from an initial corpus;
    * centroids learned here stay fixed, as in [[initStores]]. */
  def initStoresVersioned(seed: DataFrame, rootDir: String, idCol: String,
      textCol: String, vecCol: String, nCells: Int): Unit = {
    val idx = Similarity.ivfIndex(seed, idCol, vecCol, nCells)
    idx.assigned.withColumn("gen", lit(0))
      .repartition(col("ivf_cell"))
      .write.mode("overwrite").partitionBy("ivf_cell")
      .parquet(s"$rootDir/ivf/assigned")
    val spark = seed.sparkSession
    locally {
      import spark.implicits._
      idx.centroids.toDF("cid", "cvec").coalesce(1)
        .write.mode("overwrite").parquet(s"$rootDir/ivf/centroids")
    }
    Ranking.bm25WriteVersioned(seed, textCol, idCol, s"$rootDir/bm25", gen = 0)
    writeCursor(rootDir, -1L)
  }

  /** Apply one CDC micro-batch (`op` in upsert/delete) to both versioned
    * stores. Batch gen = batchId + 1 (the seed owns gen 0). Returns false
    * on a cursor-skipped replay.
    *
    * Intra-batch semantics: a micro-batch may carry AT MOST ONE op per id
    * unless `seqCol` names an ordering column — with it the batch is
    * reduced to the LAST op per id before any store write (CDC
    * last-wins); without it a duplicated id fails LOUDLY (advice r16:
    * silently letting the upsert win would lose a trailing delete and
    * keep duplicate postings alive). */
  def applyBatchCdc(batch: DataFrame, batchId: Long, rootDir: String,
      idCol: String, textCol: String, vecCol: String, opCol: String = "op",
      compactAtFiles: Int = 16, seqCol: Option[String] = None): Boolean = {
    if (batchId <= readCursor(rootDir)) return false
    val spark = batch.sparkSession
    val gen = (batchId + 1).toInt
    val tag = s"batch$batchId"
    // repair any crash residue of a previous fold/compact swap BEFORE the
    // first store read (advice r16 medium: a crash inside foldTombstones'
    // swap window leaves a partition dir absent until recover runs, and
    // the delete path below reads doclen/postings before any fold would)
    Seq(s"$rootDir/bm25/postings", s"$rootDir/bm25/doclen", s"$rootDir/bm25",
      s"$rootDir/ivf/assigned", s"$rootDir/ivf")
      .foreach(StoreCompaction.recover)
    val b0 = seqCol match {
      case Some(sc) => // last op per id wins, ties broken by op (delete
        // after upsert at the same seq — the conservative reading)
        import org.apache.spark.sql.expressions.Window
        batch.withColumn("__rn", row_number().over(
            Window.partitionBy(col(idCol))
              .orderBy(col(sc).desc, col(opCol).asc)))
          .filter(col("__rn") === 1).drop("__rn")
      case None => batch
    }
    val b = b0.localCheckpoint()
    try {
      if (seqCol.isEmpty) {
        val dup = b.groupBy(col(idCol)).count().filter(col("count") > 1)
          .limit(1).collect()
        require(dup.isEmpty, s"CDC micro-batch $batchId carries more than " +
          s"one op for $idCol=${dup.head.get(0)}; pass seqCol to reduce to " +
          "last-op-per-id or de-duplicate upstream")
      }
      // dead generations: every id the batch touches (a CDC upsert is
      // delete-prior-then-add; liveness gen >= before_gen keeps the re-add)
      val dead = b.select(col(idCol).as("id")).distinct()
      Ranking.bm25DeleteVersionedKeyed(spark, s"$rootDir/bm25", dead, gen, tag)
      graft.ext.DeltaStore.tombstoneKeyed(dead, gen, s"$rootDir/ivf/tomb", tag)
      val up = b.filter(col(opCol) === "upsert")
      Ranking.bm25AppendVersionedKeyed(up.select(col(idCol), col(textCol)),
        textCol, idCol, s"$rootDir/bm25", gen, tag)
      Similarity.ivfAppendVersionedKeyed(spark, s"$rootDir/ivf",
        up.select(col(idCol), col(vecCol)), idCol, vecCol, gen, tag)
      writeCursor(rootDir, batchId) // write-LAST, as in applyBatch
      maybeCompact(spark, s"$rootDir/ivf/assigned", compactAtFiles)
      maybeCompact(spark, s"$rootDir/bm25/postings", compactAtFiles)
      // fold + clear tombstones once BOTH stores folded — compaction-time
      // work, never probe-time; runs only after the cursor (replay-safe:
      // a fold of already-applied tombstones changes no live row)
      if (readCursor(rootDir) == batchId && shouldFold(rootDir)) {
        // a full fold destroys every as-of view below the highest folded
        // before_gen — record that floor (r17 lifecycle contract) BEFORE
        // clearing, so time-travel probes reject the gone views loudly
        if (graft.ext.DeltaStore.hasData(s"$rootDir/bm25/tomb")) {
          val maxBg = spark.read.parquet(s"$rootDir/bm25/tomb")
            .agg(max(col("before_gen"))).collect().head.getInt(0)
          StoreCompaction.writeAsOfFloor(s"$rootDir/bm25", maxBg)
        }
        StoreCompaction.foldTombstones(spark, s"$rootDir/bm25/postings",
          s"$rootDir/bm25/tomb", "id")
        StoreCompaction.foldTombstones(spark, s"$rootDir/bm25/doclen",
          s"$rootDir/bm25/tomb", "id")
        StoreCompaction.foldTombstones(spark, s"$rootDir/ivf/assigned",
          s"$rootDir/ivf/tomb", idCol)
        graft.ext.DeltaStore.clear(s"$rootDir/bm25/tomb")
        graft.ext.DeltaStore.clear(s"$rootDir/ivf/tomb")
      }
      true
    } finally graft.ext.Dedup.unpersistCheckpoint(b)
  }

  /** Fold when either manifest accreted past a handful of generations —
    * the small-files bound, same spirit as [[maybeCompact]]. */
  private def shouldFold(rootDir: String, maxFiles: Int = 8): Boolean =
    Seq(s"$rootDir/bm25/tomb", s"$rootDir/ivf/tomb").exists { d =>
      Option(new File(d).listFiles()).getOrElse(Array.empty)
        .count(f => f.isFile && !f.getName.startsWith(".") &&
          !f.getName.startsWith("_")) > maxFiles
    }

  /** Wire a CDC stream (op + document columns) into the versioned stores. */
  def attachCdc(stream: DataFrame, checkpointDir: String, rootDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      vecCol: String = "embedding", opCol: String = "op",
      compactAtFiles: Int = 16, seqCol: Option[String] = None): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatchCdc(batch, batchId, rootDir, idCol, textCol, vecCol,
          opCol, compactAtFiles, seqCol)
        ()
      }
      .start()

  /** Wire a document stream into the stores: ONE query, append mode; the
    * checkpoint dir carries the source offsets, the root cursor carries
    * the applied-batch watermark. */
  def attach(stream: DataFrame, checkpointDir: String, rootDir: String,
      idCol: String = "doc_id", textCol: String = "text",
      vecCol: String = "embedding", compactAtFiles: Int = 16): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, batchId, rootDir, idCol, textCol, vecCol,
          compactAtFiles)
        ()
      }
      .start()
}
