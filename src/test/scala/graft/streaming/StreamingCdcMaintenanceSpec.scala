package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.{DeltaStore, Ranking, Similarity}

/** Streaming CDC maintenance of the versioned retrieval stores: upserts
  * AND deletes flow through foreachBatch; after the stream the grown
  * stores must probe EXACTLY like fresh indexes of the live corpus, and
  * replays must converge (cursor skip-guard + keyed-write idempotence). */
class StreamingCdcMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val Terms = Seq("spark", "join")

  private def vec(seed: Int): Seq[Float] = {
    val r = new scala.util.Random(seed)
    Seq.fill(8)((r.nextGaussian() + (seed % 3) * 4).toFloat)
  }

  private def docRow(op: String, id: Long, text: String, seed: Int) =
    (op, id, text, vec(seed))

  private def seedDocs = (0L until 20L).map { i =>
    val t = if (i % 3 == 0) "spark join scan" else if (i % 3 == 1) "spark value" else "batch data join"
    (i, s"$t doc$i", vec(i.toInt))
  }.toDF("doc_id", "text", "embedding")

  /** What the corpus looks like after the CDC batches below. */
  private def liveDocs = {
    val changed3 = (3L, "join join join revised", vec(103))
    val changed21 = (21L, "spark spark join", vec(121))
    val adds = Seq((20L, "spark fresh", vec(120)), (22L, "value spark join", vec(122)),
      (23L, "scan scan", vec(123)), (24L, "join batch", vec(124)))
    val kept = seedDocs.collect().filter { r =>
      val id = r.getLong(0); id != 3L && id != 5L && id != 6L
    }.map(r => (r.getLong(0), r.getString(1), r.getSeq[Float](2)))
    (kept.toSeq ++ adds.filter(_._1 != 21L) ++ Seq(changed3, changed21))
      .toDF("doc_id", "text", "embedding")
  }

  private def probeParity(root: String): Unit = {
    // BM25: the maintained store vs a fresh ranking of the live corpus
    val maintained = Ranking.bm25TopKVersionedStore(spark, s"$root/bm25", Terms)
      .collect().map(_.toString).toSeq
    val fresh = Ranking.bm25TopK(liveDocs, "text", "doc_id", Terms, k = 20)
      .collect().map(_.toString).toSeq
    assert(maintained === fresh, "maintained BM25 must equal a fresh live-corpus index")
    // IVF: live rows of the grown index vs fresh assignment under the
    // SEED-TIME centroids (the fixed-centroid contract)
    val idx = Similarity.ivfRead(spark, s"$root/ivf")
    val alive = DeltaStore.alive(spark, idx.assigned, s"$root/ivf/tomb", "doc_id")
    val qvec = vec(122).map(_.toDouble)
    val a = Similarity.ivfProbe(alive, idx.centroids, "doc_id", "embedding",
      qvec, k = 8, nprobe = 2).collect().map(_.toString).toSeq
    val freshAssigned = Similarity.ivfAssign(liveDocs, "doc_id", "embedding", idx.centroids)
    val b = Similarity.ivfProbe(freshAssigned, idx.centroids, "doc_id", "embedding",
      qvec, k = 8, nprobe = 2).collect().map(_.toString).toSeq
    assert(a === b, "maintained IVF must probe like a fresh live-corpus assignment")
    assert(alive.count() === liveDocs.count())
  }

  test("CDC stream: upserts + deletes land exactly once; stores probe like fresh live-corpus indexes") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_ckpt").toString
    StreamingIndexMaintenance.initStoresVersioned(seedDocs, root,
      "doc_id", "text", "embedding", nCells = 3)
    val input = MemoryStream[(String, Long, String, Seq[Float])]
    val q = StreamingIndexMaintenance.attachCdc(
      input.toDF().toDF("op", "doc_id", "text", "embedding"), ckpt, root)
    // batch 0: four adds + one changed doc (upsert = retract prior + re-add)
    input.addData(
      docRow("upsert", 20L, "spark fresh", 120),
      docRow("upsert", 21L, "stale text", 221), // will change again in b1
      docRow("upsert", 22L, "value spark join", 122),
      docRow("upsert", 23L, "scan scan", 123),
      docRow("upsert", 24L, "join batch", 124),
      docRow("upsert", 3L, "join join join revised", 103))
    q.processAllAvailable()
    // batch 1: two deletes + the re-change of 21
    input.addData(
      docRow("delete", 5L, "", 0), docRow("delete", 6L, "", 0),
      docRow("upsert", 21L, "spark spark join", 121))
    q.processAllAvailable()
    q.stop()
    assert(StreamingIndexMaintenance.readCursor(root) === 1L)
    probeParity(root)
    // deleted and superseded generations are really dead
    val dl = DeltaStore.alive(spark,
      spark.read.parquet(s"$root/bm25/doclen"), s"$root/bm25/tomb", "id")
    assert(dl.filter(col("id").isin(5L, 6L)).count() === 0)
    assert(dl.filter(col("id") === 21L).collect().map(_.getAs[Int]("gen")).toSeq === Seq(2))
  }

  test("in-stream tombstone fold: manifests accrete past the bound, fold+clear, probes unchanged") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_fold").toString
    StreamingIndexMaintenance.initStoresVersioned(seedDocs, root,
      "doc_id", "text", "embedding", nCells = 3)
    // 9 single-doc delete batches: each appends one tombstone file per
    // store manifest; batch 8 lifts the count to 9 > shouldFold's bound
    // (8), so ITS batch-end maintenance folds BOTH stores and clears the
    // manifests — the loop ends with the fold as the last act
    (0 until 9).foreach { i =>
      val b = Seq(docRow("delete", i.toLong, "", 0))
        .toDF("op", "doc_id", "text", "embedding")
      assert(StreamingIndexMaintenance.applyBatchCdc(b, i.toLong, root,
        "doc_id", "text", "embedding"))
    }
    assert(!DeltaStore.hasData(s"$root/bm25/tomb") &&
      !DeltaStore.hasData(s"$root/ivf/tomb"),
      "past the bound the manifests must fold into the data files and clear")
    // dead rows are physically gone and the ranking matches a fresh index
    // of the 11 survivors
    val raw = spark.read.parquet(s"$root/bm25/doclen")
    assert(raw.filter(col("id") < 9L).count() === 0)
    val live = seedDocs.filter(col("doc_id") >= 9L)
    val maintained = Ranking.bm25TopKVersionedStore(spark, s"$root/bm25", Terms)
      .collect().map(_.toString).toSeq
    val fresh = Ranking.bm25TopK(live, "text", "doc_id", Terms, k = 20)
      .collect().map(_.toString).toSeq
    assert(maintained === fresh)
    val idx = Similarity.ivfRead(spark, s"$root/ivf")
    assert(idx.assigned.count() === 11L,
      "the folded assignment holds exactly the live vectors")
    // the in-stream fold destroyed every pre-fold as-of view — the floor
    // must record that (r17 lifecycle contract): highest folded
    // before_gen = batch 8's gen 9
    assert(graft.ext.StoreCompaction.readAsOfFloor(s"$root/bm25") === 9)
  }

  test("intra-batch order: duplicate ids fail loudly; seqCol reduces to last-op-per-id") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_dup").toString
    StreamingIndexMaintenance.initStoresVersioned(seedDocs, root,
      "doc_id", "text", "embedding", nCells = 3)
    // upsert then delete of the SAME id in one micro-batch: without an
    // ordering column this is ambiguous — the advice-r16 failure mode was
    // the upsert silently winning and the delete vanishing
    val dup = Seq(
      ("upsert", 7L, "late text join", vec(107), 1L),
      ("delete", 7L, "", vec(0), 2L))
      .toDF("op", "doc_id", "text", "embedding", "seq")
    val e = intercept[IllegalArgumentException](
      StreamingIndexMaintenance.applyBatchCdc(dup.drop("seq"), 0L, root,
        "doc_id", "text", "embedding"))
    assert(e.getMessage.contains("more than one op"))
    assert(StreamingIndexMaintenance.readCursor(root) === -1L,
      "the loud failure happens before any store write")
    // with seqCol the trailing delete wins: id 7 ends dead
    assert(StreamingIndexMaintenance.applyBatchCdc(dup, 0L, root,
      "doc_id", "text", "embedding", seqCol = Some("seq")))
    val dl = DeltaStore.alive(spark,
      spark.read.parquet(s"$root/bm25/doclen"), s"$root/bm25/tomb", "id")
    assert(dl.filter(col("id") === 7L).count() === 0)
    // the mirror sequence — delete then upsert — keeps the re-add
    val dup2 = Seq(
      ("delete", 8L, "", vec(0), 1L),
      ("upsert", 8L, "resurrected spark join", vec(108), 2L))
      .toDF("op", "doc_id", "text", "embedding", "seq")
    assert(StreamingIndexMaintenance.applyBatchCdc(dup2, 1L, root,
      "doc_id", "text", "embedding", seqCol = Some("seq")))
    val dl2 = DeltaStore.alive(spark,
      spark.read.parquet(s"$root/bm25/doclen"), s"$root/bm25/tomb", "id")
    assert(dl2.filter(col("id") === 8L).collect()
      .map(_.getAs[Int]("gen")).toSeq === Seq(2),
      "the later upsert survives at the batch's generation")
  }

  test("replay: a cursor-skipped batch is a no-op; a crash-window replay converges") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_rp").toString
    StreamingIndexMaintenance.initStoresVersioned(seedDocs, root,
      "doc_id", "text", "embedding", nCells = 3)
    val b0 = Seq(docRow("upsert", 20L, "spark fresh", 120),
      docRow("delete", 5L, "", 0))
      .toDF("op", "doc_id", "text", "embedding")
    assert(StreamingIndexMaintenance.applyBatchCdc(b0, 0L, root,
      "doc_id", "text", "embedding"))
    val after = Ranking.bm25TopKVersionedStore(spark, s"$root/bm25", Terms)
      .collect().map(_.toString).toSeq
    // full replay of the committed batch: skipped on the cursor
    assert(!StreamingIndexMaintenance.applyBatchCdc(b0, 0L, root,
      "doc_id", "text", "embedding"))
    // crash-window replay: data landed but the cursor write was lost —
    // rewind the cursor and re-apply; keyed writes must REPLACE their own
    // generation (no stacked negative partials, no duplicate postings)
    StreamingIndexMaintenance.writeCursor(root, -1L)
    assert(StreamingIndexMaintenance.applyBatchCdc(b0, 0L, root,
      "doc_id", "text", "embedding"))
    val replayed = Ranking.bm25TopKVersionedStore(spark, s"$root/bm25", Terms)
      .collect().map(_.toString).toSeq
    assert(replayed === after, "a crash-window replay must converge bit-for-bit")
    val n = spark.read.parquet(s"$root/bm25/globals")
      .agg(sum(col("n_part"))).collect().head.getLong(0)
    assert(n === 20L, "19 seed survivors + 1 add — negative partials never stack")
  }
}
