package graft.ext

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compaction of the append-mode partitioned stores: probe parity pinned
  * before/after the rewrite, file counts actually drop, steady state is a
  * no-op, and every crash state of the swap protocol recovers. */
class StoreCompactionSpec extends SparkSpec {

  private def dataFiles(dir: File): Seq[File] = {
    def walk(d: File): Seq[File] =
      Option(d.listFiles()).map(_.toSeq).getOrElse(Nil).flatMap {
        case f if f.isFile => Seq(f)
        case f => walk(f)
      }
    walk(dir).filter(f =>
      !f.getName.startsWith(".") && !f.getName.startsWith("_"))
  }

  private def vectors(n: Int = 60, dim: Int = 8) = {
    import spark.implicits._
    val r = new scala.util.Random(42)
    (0 until n).map { i =>
      (i.toLong, Array.fill(dim)((r.nextGaussian() + i % 3 * 5).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("IVF store: appends accrete files, compaction merges them, probe results are identical") {
    val df = vectors().cache()
    val path = Files.createTempDirectory("graft_compact_ivf").toString + "/idx"
    Similarity.ivfWrite(
      Similarity.ivfIndex(df.filter(col("vec_id") % 4 === 0), "vec_id", "embedding", nCells = 3), path)
    (1 to 3).foreach { g =>
      Similarity.ivfAppend(spark, path,
        df.filter(col("vec_id") % 4 === g), "vec_id", "embedding")
    }
    val assignedDir = new File(s"$path/assigned")
    val before = dataFiles(assignedDir).size
    assert(before > 3, s"4 generations should leave >3 files, saw $before")
    val index = Similarity.ivfRead(spark, path)
    val qvec = Similarity.queryVector(df, "vec_id", "embedding", 0L)
    def probe() = Similarity.ivfProbe(
      spark.read.parquet(s"$path/assigned"), index.centroids,
      "vec_id", "embedding", qvec, k = 10, nprobe = 2, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val pre = probe()
    val report = StoreCompaction.compact(spark, s"$path/assigned", maxFiles = 1)
    assert(report.partitionsCompacted > 0, "something must have been rewritten")
    assert(report.filesAfter < report.filesBefore)
    val filesNow = dataFiles(assignedDir)
    assert(filesNow.size <= report.partitionsScanned,
      s"expected <=1 data file per cell, saw ${filesNow.size}")
    assert(probe() === pre, "compaction must not change probe results")
    // full-store content parity, not just the probe slice
    assert(spark.read.parquet(s"$path/assigned")
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted.toSeq ===
      (0L until 60L).toSeq)
    // steady state: a second pass finds nothing over the bound
    val again = StoreCompaction.compact(spark, s"$path/assigned", maxFiles = 1)
    assert(again.partitionsCompacted === 0, "already-compacted store must be a no-op")
  }

  test("signature store: append + compact keeps incremental probe results identical") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      (i.toLong, s"the quick brown fox ${i % 5} jumps over the lazy dog ${i % 5} again and again")
    }.toDF("doc_id", "text").cache()
    val path = Files.createTempDirectory("graft_compact_sig").toString + "/store"
    Dedup.signatureStoreWrite(docs.filter(col("doc_id") % 4 === 0), "text", "doc_id", path)
    (1 to 2).foreach { g =>
      Dedup.signatureStoreWrite(docs.filter(col("doc_id") % 4 === g),
        "text", "doc_id", path, append = true)
    }
    val delta = docs.filter(col("doc_id") % 4 === 3)
    def probe() = Dedup.incrementalNearDups(delta, "text", "doc_id", path)
      .orderBy(col("id")).collect().map(_.toSeq).toSeq
    val pre = probe()
    val report = StoreCompaction.compact(spark, path, maxFiles = 1)
    assert(report.partitionsCompacted > 0)
    assert(probe() === pre, "compaction must not change incremental dedup results")
  }

  test("foldTombstones: dead rows leave the files, probes unchanged, untouched partitions untouched") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_fold").toString
    val data = root + "/store"
    val tomb = root + "/tomb"
    // gen-0: ids 0..19 across 4 partitions; gen-1 re-adds ids 0..4
    (0 until 20).map(i => (i.toLong, s"v0_$i", 0, i % 4))
      .toDF("id", "v", "gen", "b")
      .write.partitionBy("b").parquet(data)
    (0 until 5).map(i => (i.toLong, s"v1_$i", 1, i % 4))
      .toDF("id", "v", "gen", "b")
      .write.mode("append").partitionBy("b").parquet(data)
    // tombstone: changed ids 0..4 (before gen 1) + removed ids 17..19
    DeltaStore.tombstone((0 until 5).map(_.toLong).toDF("id"), 1, tomb)
    DeltaStore.tombstone(Seq(17L, 18L, 19L).toDF("id"), 1, tomb)
    val beforeRows = DeltaStore.alive(spark, spark.read.parquet(data), tomb, "id")
      .collect().map(_.toString).sorted.toSeq
    // partition b=0 holds ids {0,4,8,12,16} + re-adds {0,4}: affected.
    // Every partition holds some dead row here EXCEPT none — ids 17,18,19
    // hit b=1,2,3; so all 4 partitions are affected. Add an untouched 5th.
    Seq((100L, "keep", 0, 9)).toDF("id", "v", "gen", "b")
      .write.mode("append").partitionBy("b").parquet(data)
    val untouched = new File(data + "/b=9")
    val stamp = dataFiles(untouched).map(f => (f.getName, f.lastModified)).sorted
    val report = StoreCompaction.foldTombstones(spark, data, tomb, "id")
    assert(report.partitionsCompacted === 4, "exactly the dead-row partitions rewrite")
    assert(dataFiles(untouched).map(f => (f.getName, f.lastModified)).sorted === stamp,
      "a partition with no dead rows is not rewritten")
    // physically gone: raw read has no dead rows left
    val raw = spark.read.parquet(data)
    assert(raw.filter(col("id").isin(17L, 18L, 19L)).count() === 0)
    assert(raw.filter(col("id") < 5 && col("gen") === 0).count() === 0)
    assert(raw.filter(col("id") < 5 && col("gen") === 1).count() === 5,
      "re-adds at the tombstone generation survive the fold")
    // probe parity: alive() over the folded store (manifest still applied)
    // and the plain scan after clearing both equal the pre-fold view
    val expected = (beforeRows :+ "[100,keep,0,9]").sorted
    val folded = DeltaStore.alive(spark, raw, tomb, "id")
      .collect().map(_.toString).sorted.toSeq
    assert(folded === expected)
    // idempotent: a second fold rewrites nothing
    val again = StoreCompaction.foldTombstones(spark, data, tomb, "id")
    assert(again.partitionsCompacted === 0)
    DeltaStore.clear(tomb)
    val cleared = spark.read.parquet(data).collect().map(_.toString).sorted.toSeq
    assert(cleared === expected)
  }

  test("foldTombstones: a FLAT store folds as one leaf through its parent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_fold_flat").toString
    val data = root + "/doclen"
    val tomb = root + "/tomb"
    (0 until 10).map(i => (i.toLong, i * 10L, 0)).toDF("id", "dl", "gen")
      .write.parquet(data)
    (0 until 2).map(i => (i.toLong, i * 10L + 1L, 1)).toDF("id", "dl", "gen")
      .write.mode("append").parquet(data)
    DeltaStore.tombstone((0 until 3).map(_.toLong).toDF("id"), 1, tomb)
    val before = DeltaStore.alive(spark, spark.read.parquet(data), tomb, "id")
      .collect().map(_.toString).sorted.toSeq
    val report = StoreCompaction.foldTombstones(spark, data, tomb, "id")
    assert(report.partitionsCompacted === 1)
    DeltaStore.clear(tomb)
    assert(spark.read.parquet(data).collect().map(_.toString).sorted.toSeq === before)
    assert(spark.read.parquet(data).filter(col("gen") === 0 && col("id") < 3).count() === 0)
  }

  test("recover() repairs every crash state of the swap protocol") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_compact_rec").toString + "/store"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(col("id"))
      .write.partitionBy("id").parquet(root)
    val part = Paths.get(root, "id=1")
    val rows = () => spark.read.parquet(root).collect().map(_.getString(0)).sorted.toSeq
    val full = rows()

    // crash state A: tmp written, swap never started -> tmp dropped
    val tmp = Paths.get(root, ".compact_tmp_id=1")
    Files.createDirectories(tmp)
    Files.writeString(tmp.resolve("junk"), "x")
    StoreCompaction.recover(root)
    assert(!Files.exists(tmp) && rows() === full)

    // crash state B: partition renamed away, new copy not yet moved in ->
    // the old copy must come back
    val old = Paths.get(root, ".compact_old_id=1")
    Files.move(part, old)
    assert(rows() !== full, "precondition: the partition is really gone")
    StoreCompaction.recover(root)
    assert(Files.exists(part) && !Files.exists(old) && rows() === full)

    // crash state C: swap completed but old copy not deleted -> old dropped,
    // data untouched
    val oldC = Paths.get(root, ".compact_old_id=2")
    Files.createDirectories(oldC)
    Files.writeString(oldC.resolve("stale"), "x")
    StoreCompaction.recover(root)
    assert(!Files.exists(oldC) && rows() === full)
  }

  test("appendKeyed: keyed generations replace on replay; prefix tags never cross-delete (r13 review)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_appendkeyed").toString
    val a = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    StoreCompaction.appendKeyed(a, root, Nil, "run-1")
    StoreCompaction.appendKeyed(a, root, Nil, "run-1-retry") // dashed tag that run-1 prefixes
    assert(spark.read.parquet(root).count() === 20)
    // replay of run-1 must replace ONLY run-1's files
    StoreCompaction.appendKeyed(a, root, Nil, "run-1")
    assert(spark.read.parquet(root).count() === 20,
      "a replayed tag must never delete another tag's generation")
    val names = new java.io.File(root).listFiles().map(_.getName).filter(_.endsWith(".parquet")).sorted
    assert(names.count(_.startsWith("run-1-retry-")) === 1 && names.count(_.matches("run-1-\\d+\\.parquet")) === 1, names.mkString(","))
    // partitioned variant: one file per leaf per tag, replay replaces in place
    val p = (1 to 40).map(i => (i.toLong, i % 4)).toDF("id", "cell")
    val proot = java.nio.file.Files.createTempDirectory("graft_appendkeyed_p").toString
    StoreCompaction.appendKeyed(p, proot, Seq("cell"), "batch7")
    StoreCompaction.appendKeyed(p, proot, Seq("cell"), "batch7")
    assert(spark.read.parquet(proot).count() === 40)
  }
}
