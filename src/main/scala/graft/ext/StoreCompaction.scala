package graft.ext

import java.io.File
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Compaction for the append-mode partitioned stores (the IVF `assigned`
  * layout, the signature store): every `mode("append")` generation leaves
  * one more file-set per touched partition, and a store that accretes
  * deltas forever degrades into a small-files problem — the probe's
  * partition pruning still bounds the BYTES read, but file-open overhead
  * grows per generation. A compaction pass rewrites exactly the leaf
  * partitions whose data-file count crossed a bound, leaving the rest of
  * the store untouched (reference behavior analogue: the ClickHouse
  * MergeTree engine the reference sinks into, `/root/reference/src/main.rs`
  * DDL, compacts parts the same way — merge when a partition's part count
  * grows, never rewrite the table).
  *
  * Swap protocol, per partition dir `P` (all renames are same-filesystem
  * directory moves, i.e. atomic):
  *   1. write the compacted copy to `root/.compact_tmp_<enc(P)>`
  *   2. `P` -> `root/.compact_old_<enc(P)>`   (atomic)
  *   3. tmp -> `P`                            (atomic)
  *   4. delete the old copy
  * A crash between any two steps leaves only dot-prefixed siblings (which
  * Spark's file listing ignores — a concurrent reader can never see a
  * half-compacted partition as data) plus at most a WINDOW WHERE `P` IS
  * ABSENT (between 2 and 3). [[recover]] — run automatically at the start
  * of every [[compact]] — repairs every crash state: a `.compact_old_*`
  * whose partition is missing is moved back, one whose partition exists is
  * deleted, and stray `.compact_tmp_*` dirs are dropped. Writers are
  * single-process per store (the snapshot-cache discipline — the harness
  * runs serially); a production multi-writer deployment would put the same
  * rewrite behind a transactional table format's commit protocol instead.
  */
object StoreCompaction {

  /** What a [[compact]] pass did: partitions looked at / rewritten, data
    * file counts before and after. */
  final case class Report(partitionsScanned: Int, partitionsCompacted: Int,
      filesBefore: Int, filesAfter: Int)

  private def isData(f: File): Boolean =
    f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_")

  private def isVisibleDir(f: File): Boolean =
    f.isDirectory && !f.getName.startsWith(".") && !f.getName.startsWith("_")

  /** Leaf partition dirs = visible dirs that directly contain data files. */
  private def leafDirs(root: File): Seq[File] = {
    def walk(d: File): Seq[File] = {
      val children = Option(d.listFiles()).map(_.toSeq).getOrElse(Nil)
      val subs = children.filter(isVisibleDir)
      val here = if (children.exists(isData)) Seq(d) else Nil
      here ++ subs.flatMap(walk)
    }
    Option(root.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filter(isVisibleDir).flatMap(walk)
  }

  /** Encode a root-relative partition path into a single path segment
    * (e.g. `band=3/sig_bucket=5` -> `band=3%2Fsig_bucket=5`). */
  private def enc(rel: String): String = rel.replace("/", "%2F")
  private def dec(seg: String): String = seg.replace("%2F", "/")

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }

  /** Repair any crash residue of a previous [[compact]] run. Idempotent;
    * safe to call on a store with no residue. */
  def recover(rootPath: String): Unit = {
    val root = Paths.get(rootPath)
    if (!Files.isDirectory(root)) return
    import scala.jdk.CollectionConverters._
    val listed = Files.list(root)
    val entries = try listed.iterator().asScala.toSeq finally listed.close()
    entries.filter(_.getFileName.toString.startsWith(".compact_old_"))
      .foreach { old =>
        val rel = dec(old.getFileName.toString.stripPrefix(".compact_old_"))
        val part = root.resolve(rel)
        if (Files.exists(part)) deleteRecursively(old) // swap completed
        else { // crashed between steps 2 and 3: the old copy is the data
          Files.createDirectories(part.getParent)
          Files.move(old, part, StandardCopyOption.ATOMIC_MOVE)
        }
      }
    entries.filter(_.getFileName.toString.startsWith(".compact_tmp_"))
      .foreach(deleteRecursively) // never data — the old/part copy wins
  }

  /** IDEMPOTENT append: publish `df` into the partitioned store at
    * `rootPath` with every data file named `<tag>-<i>.parquet` — so a
    * REPLAYED append under the same tag overwrites its own generation
    * instead of accreting a duplicate (VERDICT r12 #6: the streaming index
    * maintenance keys `tag` by micro-batch id, closing the one-batch
    * re-ingest window between its two store appends and the cursor write).
    *
    * Protocol: write to a dot-prefixed tmp dir inside the store (invisible
    * to Spark's file listing), then per leaf partition delete any files of
    * a previous attempt of THIS tag and move the new ones in with
    * deterministic names (same-filesystem atomic moves). A crash at any
    * point leaves either dot-prefixed residue (swept on the next call —
    * single-writer discipline, as [[recover]]) or a partially-published
    * generation, and the replay regenerates exactly the missing files.
    * `df` is hash-repartitioned on the partition columns first, so each
    * leaf receives exactly one file per tag (no coalesce barrier; an
    * unpartitioned store gets a single file via coalesce(1) — these
    * appends are micro-batch-sized).
    *
    * PRECONDITION (advice r13): replay of a tag must be DETERMINISTIC in
    * its leaf-partition set — the previous generation is cleared only in
    * leaves the NEW write touches, so a replay that derived a different
    * partition-value set than the crashed attempt would leave stale
    * `<tag>-*.parquet` files alive in the disappeared leaves and
    * double-count. Callers satisfy this today because every tag's frame is
    * a pure function of its replayed micro-batch (Spark re-delivers the
    * same batch content for the same batchId). If a nondeterministic
    * deriver ever feeds this, sweep the whole store for the tag's files
    * before publishing instead of per-leaf clearing. */
  def appendKeyed(df: DataFrame, rootPath: String, partitionCols: Seq[String],
      tag: String): Unit = {
    require(tag.nonEmpty && tag.matches("[A-Za-z0-9_-]+"), s"bad tag '$tag'")
    val root = Paths.get(rootPath)
    Files.createDirectories(root)
    import scala.jdk.CollectionConverters._
    val rootList = Files.list(root) // try-with-resources: Files.list leaks
    try rootList.iterator().asScala.toSeq // a directory fd until closed
      .filter(_.getFileName.toString.startsWith(".append_tmp_"))
      .foreach(deleteRecursively) // crash residue of any prior attempt
    finally rootList.close()
    val tmp = root.resolve(s".append_tmp_$tag")
    val base =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df.coalesce(1)
    val w = base.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    val tmpFile = tmp.toFile
    val leaves = if (partitionCols.isEmpty) Seq(tmpFile) else leafDirs(tmpFile)
    leaves.foreach { leaf =>
      val rel = tmpFile.toPath.relativize(leaf.toPath).toString
      val destDir = if (rel.isEmpty) root else root.resolve(rel)
      Files.createDirectories(destDir)
      // clear the previous generation of THIS tag first: a replayed batch
      // replaces its own files, never another batch's. EXACT-stem match —
      // startsWith would let tag "run-1" delete "run-1-retry-0.parquet",
      // another batch's committed generation (review r13 finding)
      val own = (java.util.regex.Pattern.quote(tag) + "-\\d+\\.parquet").r
      Option(destDir.toFile.listFiles()).getOrElse(Array.empty[File])
        .filter(f => f.isFile && own.matches(f.getName))
        .foreach(f => Files.delete(f.toPath))
      leaf.listFiles().filter(isData).sortBy(_.getName).zipWithIndex.foreach {
        case (p, i) =>
          Files.move(p.toPath, destDir.resolve(s"$tag-$i.parquet"),
            StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
      }
    }
    deleteRecursively(tmp)
  }

  /** Apply a tombstone manifest PHYSICALLY: rewrite exactly the leaf
    * partitions that still hold dead rows (gen < the id's greatest
    * before_gen — the [[DeltaStore.alive]] liveness rule), leaving every
    * other partition untouched. This is the maintenance pass that turns a
    * delta-loop store's probe-time liveness joins back into plain scans;
    * run it, then [[DeltaStore]]-clear the manifest once every store
    * sharing it has folded.
    *
    * Affected-partition detection is ONE pass (dead rows →
    * `input_file_name()` → parent dirs), so an empty manifest or a
    * fully-folded store costs a single pruned job and zero rewrites. Each
    * rewrite uses [[compact]]'s atomic swap protocol — a flat
    * (unpartitioned) store swaps as a single leaf through its PARENT dir,
    * which [[recover]] repairs the same way. The fold is idempotent, and
    * crash-safe in the conservative direction: the manifest outlives the
    * fold, so a crash mid-way leaves probes correct (they just keep
    * paying the liveness join). */
  def foldTombstones(spark: SparkSession, dataPath: String, tombPath: String,
      idCol: String, maxBeforeGen: Int = Int.MaxValue): Report = {
    val root = new File(dataPath)
    if (!new File(tombPath).exists() || !root.isDirectory) return Report(0, 0, 0, 0)
    recover(dataPath)
    recover(root.getParentFile.getPath)
    import org.apache.spark.sql.functions.{input_file_name, max}
    // maxBeforeGen bounds the fold to tombstones a retention pass may
    // apply (generation-lifecycle GC: rows dead as of gen g are dead at
    // every later generation, so folding before_gen <= g preserves every
    // as-of view >= g while destroying the ones below — the caller records
    // that floor). Default folds everything, the pre-r17 behavior.
    val bg = spark.read.parquet(tombPath)
      .filter(col("before_gen") <= maxBeforeGen)
      .groupBy(col("id").as(idCol)).agg(max(col("before_gen")).as("__bg"))
    def aliveOf(df: DataFrame) = df.join(bg, Seq(idCol), "left")
      .filter(col("__bg").isNull || col("gen") >= col("__bg")).drop("__bg")
    // input_file_name() must bind BEFORE the join (single-source rule)
    val affected = spark.read.parquet(dataPath)
      .select(col(idCol), col("gen"), input_file_name().as("f"))
      .join(bg, Seq(idCol))
      .filter(col("gen") < col("__bg"))
      .select(col("f")).distinct()
      .collect()
      .map(r => new File(java.net.URI.create(r.getString(0)).getPath)
        .getParentFile.getCanonicalFile)
      .toSet
    val leaves0 = leafDirs(root)
    val flat = leaves0.isEmpty
    val leaves = if (flat) Seq(root) else leaves0
    var compacted = 0
    var before = 0
    var after = 0
    leaves.foreach { dir =>
      before += Option(dir.listFiles()).getOrElse(Array.empty[File]).count(isData)
      if (affected.contains(dir.getCanonicalFile)) {
        val base = (if (flat) root.getParentFile else root).toPath
        val rel = base.relativize(dir.toPath).toString
        val tmp = base.resolve(s".compact_tmp_${enc(rel)}")
        val old = base.resolve(s".compact_old_${enc(rel)}")
        deleteRecursively(tmp)
        aliveOf(spark.read.parquet(dir.toString)).coalesce(1)
          .write.mode("overwrite").parquet(tmp.toString)
        Files.move(dir.toPath, old, StandardCopyOption.ATOMIC_MOVE)
        Files.move(tmp, dir.toPath, StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(old)
        compacted += 1
      }
      after += Option(dir.listFiles()).getOrElse(Array.empty[File]).count(isData)
    }
    Report(leaves.size, compacted, before, after)
  }

  // ---- generation lifecycle: the as-of floor -----------------------------
  // The gen stamps already make every store a time-travel log: an as-of-g
  // probe filters rows to gen <= g and tombstones to before_gen <= g. What
  // bounds that contract is PHYSICAL folding: once a fold applied
  // tombstones with before_gen <= g, the pre-g views are gone — probes for
  // them must fail LOUDLY, not silently return the newer view. The floor
  // marker records the lowest still-probe-able generation; retention
  // passes and full folds bump it, as-of probes check it first.

  /** Lowest generation whose as-of view is still physically intact.
    * 0 until any fold/retention ran. */
  def readAsOfFloor(storeRoot: String): Int = {
    val f = new File(storeRoot, "_asof_floor")
    if (!f.exists()) 0
    else new String(Files.readAllBytes(f.toPath),
      java.nio.charset.StandardCharsets.UTF_8).trim.toInt
  }

  /** Bump (never lower) the store's as-of floor. Atomic publish. */
  def writeAsOfFloor(storeRoot: String, gen: Int): Unit = {
    val cur = readAsOfFloor(storeRoot)
    if (gen > cur) {
      val dir = Paths.get(storeRoot)
      Files.createDirectories(dir)
      val tmp = dir.resolve(s".asof_floor.tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, gen.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Files.move(tmp, dir.resolve("_asof_floor"), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Drop the manifest rows a retention pass has folded (before_gen <=
    * `minGen`), keeping the rest: read, filter, atomic directory swap via
    * the compact protocol (the manifest is flat, so it swaps as a single
    * leaf through its parent — [[recover]] repairs a crash the same way).
    * An all-folded manifest becomes an empty dir, which
    * [[DeltaStore.hasData]] reads as "no tombstones". */
  def pruneManifest(spark: SparkSession, tombPath: String, minGen: Int): Unit = {
    val dir = new File(tombPath)
    if (!dir.isDirectory) return
    recover(dir.getParentFile.getPath)
    if (!DeltaStore.hasData(tombPath)) return
    val base = dir.getParentFile.toPath
    val rel = base.relativize(dir.toPath).toString
    val tmp = base.resolve(s".compact_tmp_${enc(rel)}")
    val old = base.resolve(s".compact_old_${enc(rel)}")
    deleteRecursively(tmp)
    spark.read.parquet(tombPath).filter(col("before_gen") > minGen)
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    Files.move(dir.toPath, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmp, dir.toPath, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)
  }

  /** Rewrite every leaf partition of the partitioned parquet store at
    * `rootPath` whose data-file count exceeds `maxFiles`, coalescing it to
    * `targetFiles` file(s). Partitions at or under the bound are not
    * touched (steady state: one directory listing, zero I/O). Returns a
    * [[Report]]; row content is bit-identical before/after (pinned in
    * StoreCompactionSpec).
    */
  def compact(spark: SparkSession, rootPath: String, maxFiles: Int = 4,
      targetFiles: Int = 1): Report = {
    require(maxFiles >= 1 && targetFiles >= 1,
      s"maxFiles=$maxFiles / targetFiles=$targetFiles must be >= 1")
    recover(rootPath)
    val root = new File(rootPath)
    val leaves = leafDirs(root)
    var compacted = 0
    var before = 0
    var after = 0
    leaves.foreach { dir =>
      val n = dir.listFiles().count(isData)
      before += n
      if (n > maxFiles) {
        val rel = root.toPath.relativize(dir.toPath).toString
        val tmp = root.toPath.resolve(s".compact_tmp_${enc(rel)}")
        val old = root.toPath.resolve(s".compact_old_${enc(rel)}")
        deleteRecursively(tmp)
        // the leaf dir holds only data columns (partition values are
        // dir-encoded), so a plain read/rewrite round-trips it exactly
        spark.read.parquet(dir.toString).coalesce(targetFiles)
          .write.mode("overwrite").parquet(tmp.toString)
        Files.move(dir.toPath, old, StandardCopyOption.ATOMIC_MOVE)
        Files.move(tmp, dir.toPath, StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(old)
        compacted += 1
        after += dir.listFiles().count(isData)
      } else after += n
    }
    Report(leaves.size, compacted, before, after)
  }
}
