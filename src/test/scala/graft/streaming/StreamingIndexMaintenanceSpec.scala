package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ext.{Ranking, Similarity}

/** The streaming composition over the proven index pieces (VERDICT r11
  * #7): a document stream appends to the persisted IVF + BM25 stores via
  * ONE foreachBatch; at every generation the grown stores probe exactly
  * like batch-built equivalents; the query survives a restart without
  * re-appending; replayed batch ids skip on the cursor; compaction keeps
  * leaf file counts bounded without changing any probe result.
  */
class StreamingIndexMaintenanceSpec extends SparkSpec {

  private val dim = 8
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")

  /** Deterministic doc: id, text over the small vocab, clustered vector. */
  private def doc(i: Long): (Long, String, Seq[Float]) = {
    val r = new scala.util.Random(1000 + i)
    val center = Array.tabulate(dim)(d => if (d % 3 == (i % 3)) 1.0 else 0.1)
    val vec = center.map(x => (x + r.nextGaussian() * 0.05).toFloat).toSeq
    val words = (0 to (i % 5).toInt + 2).map(j => vocab(((i + j * 3) % 10).toInt))
    (i, words.mkString(" "), vec)
  }

  private def frame(ids: Seq[Long]): DataFrame = {
    import spark.implicits._
    ids.map(doc).toDF("doc_id", "text", "embedding")
  }

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("embedding", ArrayType(FloatType))))

  private val terms = Seq("alpha", "gamma", "theta")

  /** Both stores must probe exactly like batch-built equivalents over
    * everything ingested so far. */
  private def assertProbeParity(root: String, ingested: Seq[Long]): Unit = {
    val all = frame(ingested)
    // BM25: pruned-store scoring == direct full-corpus scoring
    val viaStore = Ranking.bm25TopKIndexed(spark, s"$root/bm25", terms)
      .collect().map(_.toSeq).toSeq
    val direct = Ranking.bm25TopK(all, "text", "doc_id", terms)
      .collect().map(_.toSeq).toSeq
    assert(viaStore === direct,
      s"BM25 store diverged from direct scoring at |corpus|=${ingested.size}")
    // IVF: grown layout == one-shot assignment under the stored centroids
    val idx = Similarity.ivfRead(spark, s"$root/ivf")
    assert(idx.assigned.count() === ingested.size,
      "assigned rows must match ingested docs exactly — no loss, no dups")
    val qvec = Similarity.queryVector(all, "doc_id", "embedding", ingested.head)
    def probe(assigned: DataFrame) =
      Similarity.ivfProbe(assigned, idx.centroids, "doc_id", "embedding",
        qvec, k = 5, nprobe = 2, excludeId = Some(ingested.head))
        .collect().map(_.toSeq).toSeq
    assert(probe(idx.assigned) ===
      probe(Similarity.ivfAssign(all, "doc_id", "embedding", idx.centroids)),
      s"IVF probe diverged from one-shot assignment at |corpus|=${ingested.size}")
  }

  test("foreachBatch maintenance: 3 micro-batches + restart, probe parity at every generation") {
    val base = Files.createTempDirectory("graft_stream_idx").toString
    val (inDir, root, ckpt) = (s"$base/in", s"$base/store", s"$base/ckpt")
    Files.createDirectories(Paths.get(inDir))

    // seed corpus builds the stores (and fixes the centroids)
    val seedIds = (0L until 30L)
    StreamingIndexMaintenance.initStores(frame(seedIds), root,
      "doc_id", "text", "embedding", nCells = 3)
    assertProbeParity(root, seedIds)

    def dropFile(ids: Seq[Long], name: String): Unit = {
      val stage = s"$base/stage-$name"
      frame(ids).coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(inDir, s"$name.parquet"))
    }
    def attach() = StreamingIndexMaintenance.attach(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(inDir),
      ckpt, root, compactAtFiles = 2)

    // ---- generation 1 + 2: two files, one micro-batch each
    dropFile(30L until 40L, "b0")
    dropFile(40L until 50L, "b1")
    val q1 = attach()
    q1.processAllAvailable(); q1.stop()
    assertProbeParity(root, 0L until 50L)
    val cursorAfter2 = StreamingIndexMaintenance.readCursor(root)
    assert(cursorAfter2 >= 1L, s"two micro-batches must advance the cursor, got $cursorAfter2")

    // ---- restart: the checkpoint resumes the source, nothing re-appends
    dropFile(50L until 60L, "b2")
    val q2 = attach()
    q2.processAllAvailable(); q2.stop()
    assertProbeParity(root, 0L until 60L)
    assert(StreamingIndexMaintenance.readCursor(root) > cursorAfter2)

    // ---- replay delivery: a batch id at/below the cursor must SKIP
    val before = spark.read.parquet(s"$root/bm25/doclen").count()
    val applied = StreamingIndexMaintenance.applyBatch(frame(50L until 60L),
      StreamingIndexMaintenance.readCursor(root), root,
      "doc_id", "text", "embedding")
    assert(!applied, "replayed batch id must be skipped on the cursor")
    assert(spark.read.parquet(s"$root/bm25/doclen").count() === before,
      "a skipped replay must append nothing")
    assertProbeParity(root, 0L until 60L)

    // ---- compaction kept every leaf's file count bounded (seed + 3
    // appends would otherwise stack 4 generation files per hot leaf)
    def maxLeafFiles(dir: String): Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      val leaves = walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
        .groupBy(_.getParentFile.getPath)
      if (leaves.isEmpty) 0 else leaves.values.map(_.size).max
    }
    assert(maxLeafFiles(s"$root/bm25/postings") <= 2,
      "postings leaves must stay compacted at the configured bound")
    assert(maxLeafFiles(s"$root/ivf/assigned") <= 2,
      "assigned leaves must stay compacted at the configured bound")
  }

  test("idempotent replay: a crash between the two appends re-applies with zero duplicates (r12 #6)") {
    val base = Files.createTempDirectory("graft_stream_idem").toString
    val root = s"$base/store"
    val seedIds = (0L until 30L)
    StreamingIndexMaintenance.initStores(frame(seedIds), root,
      "doc_id", "text", "embedding", nCells = 3)

    // batch 0 CRASHES after the IVF append, before the BM25 append and the
    // cursor write: simulate by running only the first keyed append
    val delta = frame(30L until 40L)
    Similarity.ivfAppendKeyed(spark, s"$root/ivf",
      delta.select(col("doc_id"), col("embedding")), "doc_id", "embedding", "batch0")
    assert(StreamingIndexMaintenance.readCursor(root) === -1L,
      "the crash happened before the cursor write")
    // half-published state: IVF already holds the batch
    assert(Similarity.ivfRead(spark, s"$root/ivf").assigned.count() === 40)

    // restart re-delivers batch 0 → the keyed appends overwrite the
    // half-published generation instead of duplicating it
    val applied = StreamingIndexMaintenance.applyBatch(delta, 0L, root,
      "doc_id", "text", "embedding")
    assert(applied, "a batch above the cursor must apply")
    assert(StreamingIndexMaintenance.readCursor(root) === 0L)
    assert(Similarity.ivfRead(spark, s"$root/ivf").assigned.count() === 40,
      "replayed IVF append must not duplicate the crashed generation")
    assertProbeParity(root, 0L until 40L)

    // and a SECOND full replay of the same batch (cursor manually reset —
    // the skip-guard removed) still changes nothing: pure idempotence
    StreamingIndexMaintenance.writeCursor(root, -1L)
    val applied2 = StreamingIndexMaintenance.applyBatch(delta, 0L, root,
      "doc_id", "text", "embedding")
    assert(applied2)
    assert(Similarity.ivfRead(spark, s"$root/ivf").assigned.count() === 40)
    assert(spark.read.parquet(s"$root/bm25/doclen").count() === 40,
      "doclen must hold exactly one row per doc after a double apply")
    assert(spark.read.parquet(s"$root/bm25/globals").count() === 2,
      "globals must hold exactly one partial per generation (seed + batch0)")
    assertProbeParity(root, 0L until 40L)
  }
}
