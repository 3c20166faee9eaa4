package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The delta loop's core claim, pinned all-Spark: processing ONLY the
  * snapshot delta against the persisted v1 stores yields the SAME end
  * state as recomputing everything from the v2 corpus. (The declared lane
  * proves the same against DuckDB; this spec adds the in-engine twin plus
  * the liveness negatives a hash compare can't localize.) */
class IncrementalPipelineSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d)
  private def emb = graft.Tables.embeddings(spark, d)
  private lazy val root = IncrementalPipeline.storeCached(spark, d)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("delta classification follows the version rules exactly") {
    val dd = IncrementalPipeline.delta(
      IncrementalPipeline.v1Docs(docs), IncrementalPipeline.v2Docs(docs),
      "doc_id", "text").collect()
    dd.foreach { r =>
      val id = r.getLong(0)
      val expected =
        if (id % 17 == 5 && id % 13 != 7) "added"
        else if (id % 13 == 7 && id % 17 != 5) "removed"
        else if (id % 11 == 0) "changed"
        else "unchanged"
      assert(r.getString(1) === expected, s"doc $id")
    }
    // ids in NEITHER version never appear in the manifest
    assert(!dd.exists(r => r.getLong(0) % 17 == 5 && r.getLong(0) % 13 == 7))
  }

  test("bm25: versioned store after the delta equals a direct v2 ranking bit-for-bit") {
    val incremental = Ranking.bm25TopKVersionedStore(spark, root + "/bm25",
      IncrementalPipeline.Terms)
    val recompute = Ranking.bm25TopK(IncrementalPipeline.v2Docs(docs),
      "text", "doc_id", IncrementalPipeline.Terms, k = 20)
    assert(rows(incremental) === rows(recompute))
  }

  test("bm25: merged globals count exactly the live corpus") {
    val g = spark.read.parquet(root + "/bm25/globals")
      .agg(sum(col("n_part")).as("n")).collect().head.getLong(0)
    val v2n = IncrementalPipeline.v2Docs(docs).count()
    assert(g === v2n,
      "positive partials minus the delete's negative partial = |v2| exactly")
  }

  test("survivors: incremental component store equals the full v2 closure") {
    val incremental = IncrementalPipeline.survivors(spark, d, root)
    val sigs = Dedup.minhashSignatures(
      IncrementalPipeline.v2Docs(docs), "text", "doc_id").localCheckpoint()
    val comps = Dedup.connectedComponents(
      Dedup.minhashNearDupsFromSigs(sigs).select(col("id1"), col("id2")))
    val recompute = IncrementalPipeline.v2Docs(docs).select(col("doc_id"))
      .join(comps.select(col("id").as("doc_id"), col("label")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("component"))
    assert(rows(incremental.orderBy("doc_id")) === rows(recompute.orderBy("doc_id")))
    Dedup.unpersistCheckpoint(comps)
    Dedup.unpersistCheckpoint(sigs)
  }

  test("ivf: live grown index probes exactly like a fresh v2 assignment under the stored centroids") {
    val incremental = IncrementalPipeline.ivfProbeLive(spark, d, root)
    val idx = Similarity.ivfRead(spark, root + "/ivf")
    val freshAssigned = Similarity.ivfAssign(
      IncrementalPipeline.v2Emb(emb), "vec_id", "embedding", idx.centroids)
    val qvec = Similarity.queryVector(IncrementalPipeline.v2Emb(emb),
      "vec_id", "embedding", IncrementalPipeline.QueryVecId)
    val recompute = Similarity.ivfProbe(freshAssigned, idx.centroids,
      "vec_id", "embedding", qvec, k = 10, nprobe = 3,
      excludeId = Some(IncrementalPipeline.QueryVecId))
    assert(rows(incremental) === rows(recompute))
  }

  test("keyed delete: replay converges in EVERY crash state (no stacked negative partials)") {
    import spark.implicits._
    def freshStore(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_keyed_del").toString
      val docs = Seq((0L, "a b c"), (1L, "a b"), (2L, "c c c c"), (3L, "b"))
        .toDF("doc_id", "text")
      Ranking.bm25WriteVersioned(docs, "text", "doc_id", dir, gen = 0)
      dir
    }
    def globals(dir: String): (Long, Long) = {
      val r = spark.read.parquet(dir + "/globals")
        .agg(sum(col("n_part")), sum(col("dl_sum"))).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val ids = Seq(0L, 2L).toDF("id")
    // clean run: live n = 2, live dl_sum = 2 + 1 = 3
    val s1 = freshStore()
    Ranking.bm25DeleteVersionedKeyed(spark, s1, ids, beforeGen = 1, tag = "b7")
    assert(globals(s1) === ((2L, 3L)))
    // crash state A: nothing durable yet -> plain re-run (trivially same)
    Ranking.bm25DeleteVersionedKeyed(spark, s1, ids, beforeGen = 1, tag = "b7")
    assert(globals(s1) === ((2L, 3L)),
      "a replay after full success must REPLACE its generation, not stack")
    // crash state B: negative partial landed, tombstone did not
    val s2 = freshStore()
    Ranking.bm25DeleteVersionedKeyed(spark, s2, ids, beforeGen = 1, tag = "b7")
    val tombFiles = Option(new java.io.File(s2 + "/tomb").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("b7-"))
    assert(tombFiles.nonEmpty)
    tombFiles.foreach(f => java.nio.file.Files.delete(f.toPath))
    Ranking.bm25DeleteVersionedKeyed(spark, s2, ids, beforeGen = 1, tag = "b7")
    assert(globals(s2) === ((2L, 3L)),
      "replay after a partial-only crash recomputes the SAME dying set")
    // and liveness agrees: exactly docs 1 and 3 remain
    val live = DeltaStore.alive(spark, spark.read.parquet(s2 + "/doclen"),
      s2 + "/tomb", "id").select(col("id")).collect().map(_.getLong(0)).sorted
    assert(live.toSeq === Seq(1L, 3L))
    // an EARLIER batch's tombstones still apply to a later tag's dying set
    Ranking.bm25DeleteVersionedKeyed(spark, s2, Seq(1L, 2L).toDF("id"),
      beforeGen = 1, tag = "b8")
    assert(globals(s2) === ((1L, 1L)),
      "doc 2 is already dead under b7 — b8 must subtract only doc 1")
  }

  test("liveness negatives: removed ids are gone from every store, changed ids carry only gen-1 rows") {
    val removedDoc = docs.select(col("doc_id"))
      .filter(col("doc_id") % 13 === 7 && col("doc_id") % 17 =!= 5)
      .orderBy(col("doc_id")).limit(1).collect().head.getLong(0)
    val changedDoc = docs.select(col("doc_id"))
      .filter(col("doc_id") % 11 === 0 && col("doc_id") % 13 =!= 7 &&
        col("doc_id") % 17 =!= 5)
      .orderBy(col("doc_id")).limit(1).collect().head.getLong(0)
    val dl = DeltaStore.alive(spark,
      spark.read.parquet(root + "/bm25/doclen"), root + "/bm25/tomb", "id")
    assert(dl.filter(col("id") === removedDoc).count() === 0,
      s"removed doc $removedDoc must have no live doclen row")
    val ch = dl.filter(col("id") === changedDoc).collect()
    assert(ch.length === 1 && ch.head.getAs[Int]("gen") === 1,
      s"changed doc $changedDoc must carry exactly its gen-1 re-add")
    val aliveSigs = DeltaStore.alive(spark,
      spark.read.parquet(root + "/sig"), root + "/sig_tomb", "id")
    assert(aliveSigs.filter(col("id") === removedDoc).count() === 0)
    assert(aliveSigs.filter(col("id") === changedDoc)
      .select(col("gen")).distinct().collect().map(_.getInt(0)).toSeq === Seq(1))
    // tombstoned vectors leave the live index
    val removedVec = emb.select(col("vec_id"))
      .filter(col("vec_id") % 13 === 7 && col("vec_id") % 17 =!= 5)
      .orderBy(col("vec_id")).limit(1).collect().head.getLong(0)
    val aliveAssigned = DeltaStore.alive(spark,
      spark.read.parquet(root + "/ivf/assigned"), root + "/ivf/tomb", "vec_id")
    assert(aliveAssigned.filter(col("vec_id") === removedVec).count() === 0)
    // live row count = |v2| for every store
    assert(dl.count() === IncrementalPipeline.v2Docs(docs).count())
    assert(aliveAssigned.count() === IncrementalPipeline.v2Emb(emb).count())
  }
}
