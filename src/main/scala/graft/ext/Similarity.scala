package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (ARRAY<FLOAT/DOUBLE>).
  *
  * Baseline: brute-force cosine top-k — one codegen'd pass over the corpus
  * (dot products via zip_with/aggregate, no UDF), finished by a top-k
  * (TakeOrderedAndProject — per-partition heaps, no global sort). At 100 TB
  * this is the exact-answer path: a broadcast of the (tiny) query set
  * against a full scan, shuffling only k rows per partition.
  *
  * Scale path: random-hyperplane LSH — P sign bits bucket the corpus
  * (2^P buckets, computed scan-side); queries probe only their own bucket
  * (optionally multi-probe neighbors). Bucketing is a plain repartition-able
  * column, so the corpus can be written bucketed/partitioned by `bucket` and
  * probes become partition-pruned scans.
  */
object Similarity {

  /** dot(a, b) in double precision — codegen'd custom expression (the
    * zip_with/aggregate formulation runs interpreted per element). */
  def dot(a: Column, b: Column): Column = graft.functions.VectorOps.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** one-pass dot + norms, codegen'd; same accumulation order as the
    * fold-based formulation so results are bit-identical. */
  def cosine(a: Column, b: Column): Column = graft.functions.VectorOps.cosine_sim(a, b)

  /** Exact top-k neighbors of `queryId`'s vector (excluded from results). */
  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"))
    embeddings.join(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), round(cosine(col(vecCol), col("qvec")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Fixed seeded hyperplanes (dim × planes), for sign-bit bucketing. */
  def hyperplanes(dim: Int, planes: Int, seed: Long = 7L): Seq[Seq[Double]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** Johnson–Lindenstrauss random projection: deterministic seeded
    * Gaussian planes (the same machinery the LSH buckets use) map `dim`-d
    * embeddings to `outDim` components `y_j = dot(v, plane_j) / sqrt(k)`,
    * the scaling under which E[‖y‖²] = ‖x‖² and pairwise distances are
    * preserved within (1 ± ε) w.h.p. for k = O(log n / ε²) — the standard
    * dimensionality-reduction step before ANN indexing (4-8x fewer
    * multiply-adds per distance at recall cost bounded by ε). Pure
    * per-row projection: zero shuffles, fuses into the scan, and any
    * engine replays it from the plane literals (sequential IEEE dot
    * products, like the LSH bucket oracle). */
  def randomProject(embeddings: DataFrame, idCol: String, vecCol: String,
      outDim: Int, dim: Int = 64, seed: Long = 11L): DataFrame = {
    val ps = hyperplanes(dim, outDim, seed)
    val scale = math.sqrt(outDim.toDouble)
    val comps = ps.zipWithIndex.map { case (p, j) =>
      (dot(col(vecCol), typedLit(p)) / scale).as(s"y$j")
    }
    embeddings.select(col(idCol) +: comps: _*)
  }

  /** LSH bucket id = the integer of sign(dot(v, plane_i)) bits. */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(vec, typedLit(p)) >= 0, 1L << i).otherwise(0L)
    }.reduce(_ + _)

  /** Approximate top-k: probe only the query's bucket. Recall depends on
    * `planes` (fewer planes → bigger buckets → higher recall, more compute);
    * callers wanting guarantees union several plane-sets (hash tables). */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, planes: Int = 4, dim: Int = 64): DataFrame = {
    val ps = hyperplanes(dim, planes)
    val bucketed = embeddings.withColumn("bucket", lshBucket(col(vecCol), ps))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("qvec"), col("bucket"))
    bucketed.join(broadcast(q), "bucket")
      .filter(col(idCol) =!= queryId)
      .select(col(idCol), round(cosine(col(vecCol), col("qvec")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  // ---- IVF (inverted-file) ANN --------------------------------------------

  /** Deterministic coarse quantizer SEED: every `corpus.count/k`-th vector
    * (by id order) becomes a centroid. k centroids × dim floats live on the
    * driver/broadcast — tiny. [[ivfRefine]] then runs Lloyd rounds on top. */
  def ivfCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[(Int, Seq[Double])] = {
    val n = embeddings.count()
    val stride = math.max(n / k, 1L)
    embeddings.select(col(idCol), col(vecCol))
      .orderBy(col(idCol))
      .filter(pmod(col(idCol), lit(stride)) === 0)
      .limit(k)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](1).map(_.toDouble)) }
      .toSeq
  }

  /** Assign each vector to its nearest centroid: broadcast-join the k
    * centroid rows against the corpus (one codegen'd cosine per pair, never
    * recomputed) and take the per-vector argmax with max_by — one
    * shuffle-free broadcast plus one aggregate. At scale the corpus is
    * written partitioned by `ivf_cell` so probes prune partitions. */
  def ivfAssign(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Seq[Double])]): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val cents = centroids.toDF("__cent_id", "__cvec")
    embeddings.join(broadcast(cents))
      .withColumn("__sim", cosine(col(vecCol), col("__cvec")))
      .groupBy(col(idCol), col(vecCol))
      .agg(max_by(col("__cent_id"), col("__sim")).as("ivf_cell"))
  }

  /** A built IVF index: k centroids (driver-side, tiny) + the corpus with
    * its `ivf_cell` assignment. Build once, persist with [[ivfWrite]], probe
    * many times — index construction never runs inside a query. */
  final case class IvfIndex(centroids: Seq[(Int, Seq[Double])], assigned: DataFrame)

  /** Mean-quantization scale for [[ivfRefine]]: dimension sums are
    * accumulated as exact `round(x·2^20)` longs, so the per-cell mean is
    * order-independent (long addition commutes) and replayable in any
    * engine — a raw double `avg` would depend on partition arrival order
    * and could never be oracle-checked. 2^20 keeps ~1e-6 precision, far
    * below what a coarse quantizer needs. */
  private val RefineScale = 1L << 20

  /** Deterministic Lloyd refinement: `iters` rounds of assign → per-cell
    * element-wise mean. Each round is one broadcast-join assignment pass
    * over the corpus plus one (cell, dim) aggregate — the collect is k·dim
    * rows (bounded, like the centroid pick itself). Cells that lose all
    * members keep their previous centroid. Stride-picked seeds are fine on
    * uniform fixtures but under-represent clustered real data; 2-3 Lloyd
    * rounds move the centroids to the mass. */
  /** Hard cap on nCells×dim for [[ivfRefine]]'s per-round collect (~32 MB
    * of packed longs at the cap). The collect is bounded by construction —
    * k·dim rows, never corpus-sized — and this guard makes the bound an
    * invariant instead of a convention: a caller who wants more cells than
    * this shards the refinement (or accepts the seed centroids), it cannot
    * silently pull an unbounded frame onto the driver. */
  val MaxRefineCells: Long = 1L << 22

  def ivfRefine(embeddings: DataFrame, idCol: String, vecCol: String,
      cents: Seq[(Int, Seq[Double])], iters: Int = 2): Seq[(Int, Seq[Double])] = {
    require(cents.isEmpty ||
      cents.size.toLong * cents.head._2.size <= MaxRefineCells,
      s"ivfRefine collects nCells x dim = ${cents.size} x " +
        s"${cents.head._2.size} centroid rows per round, over the " +
        s"$MaxRefineCells driver cap — shard the refinement instead")
    var cs = cents
    for (_ <- 0 until iters) {
      val byCell = ivfAssign(embeddings, idCol, vecCol, cs)
        .select(col("ivf_cell"),
          posexplode(col(vecCol).cast("array<double>")).as(Seq("d", "x")))
        .groupBy(col("ivf_cell"), col("d"))
        .agg(sum(round(col("x") * RefineScale).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getAs[Int]("ivf_cell"))
      cs = cs.map { case (cid, oldv) =>
        byCell.get(cid) match {
          case Some(rows) =>
            (cid, rows.map(r => (r.getAs[Int]("d"),
              r.getAs[Long]("s").toDouble / r.getAs[Long]("n") / RefineScale))
              .sortBy(_._1).map(_._2).toSeq)
          case None => (cid, oldv)
        }
      }
    }
    cs
  }

  /** Build the IVF index: centroid selection + `refineIters` Lloyd rounds +
    * one broadcast-join assignment pass over the corpus. */
  def ivfIndex(embeddings: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 8, refineIters: Int = 2): IvfIndex = {
    val cents = ivfRefine(embeddings, idCol, vecCol,
      ivfCentroids(embeddings, idCol, vecCol, nCells), refineIters)
    IvfIndex(cents, ivfAssign(embeddings, idCol, vecCol, cents))
  }

  /** Persist the index: the assignment partitioned by `ivf_cell` (a probe
    * that filters on cells becomes a partition-PRUNED scan — the on-disk
    * layout IS the index) plus the k centroid rows, so a later session can
    * probe without touching the corpus at all. */
  def ivfWrite(index: IvfIndex, path: String): Unit = {
    // repartition on the layout key first (the signatureStoreWrite
    // discipline): each cell dir gets ONE file per generation instead of
    // one per upstream task — and [[StoreCompaction.compact]] merges the
    // per-generation files back to one when appends accrete
    index.assigned.repartition(col("ivf_cell"))
      .write.mode("overwrite").partitionBy("ivf_cell")
      .parquet(s"$path/assigned")
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.centroids.toDF("cid", "cvec").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Append a DELTA of new vectors to a persisted index WITHOUT a rebuild —
    * the [[graft.ext.Dedup.incrementalNearDups]] move for ANN: the delta is
    * assigned against the STORED centroids (one broadcast pass over the
    * delta only) and appended into the existing `ivf_cell` partition
    * layout, so probes over the grown index stay partition-pruned and are
    * EXACTLY what a fresh assignment of the full corpus under the same
    * centroids would produce (pinned in SimilaritySpec). Centroids drift
    * as the corpus grows — like the signature store, a corpus generation
    * re-learns them on its own schedule; appends between generations never
    * rescan the corpus. Each append leaves one more file per touched cell —
    * run [[StoreCompaction.compact]] on `path/assigned` once the
    * per-partition file count crosses the deployment's bound. */
  def ivfAppend(spark: org.apache.spark.sql.SparkSession, path: String,
      delta: DataFrame, idCol: String, vecCol: String): Unit = {
    val cents = ivfRead(spark, path).centroids
    ivfAssign(delta, idCol, vecCol, cents)
      .repartition(col("ivf_cell"))
      .write.mode("append").partitionBy("ivf_cell").parquet(s"$path/assigned")
  }

  /** Idempotent [[ivfAppend]]: generation files are named by `tag` (the
    * caller's batch id), so a REPLAYED append overwrites its own files
    * instead of duplicating rows — the streaming index maintenance's
    * exactly-once closure (VERDICT r12 #6). */
  def ivfAppendKeyed(spark: org.apache.spark.sql.SparkSession, path: String,
      delta: DataFrame, idCol: String, vecCol: String, tag: String): Unit = {
    val cents = ivfRead(spark, path).centroids
    StoreCompaction.appendKeyed(ivfAssign(delta, idCol, vecCol, cents),
      s"$path/assigned", Seq("ivf_cell"), tag)
  }

  /** [[ivfAppendKeyed]] with a generation stamp — the streaming-CDC write
    * over a VERSIONED index (rows live iff gen ≥ the id's greatest
    * tombstone before_gen, the [[graft.ext.DeltaStore]] rule). */
  def ivfAppendVersionedKeyed(spark: org.apache.spark.sql.SparkSession,
      path: String, delta: DataFrame, idCol: String, vecCol: String,
      gen: Int, tag: String): Unit = {
    val cents = ivfRead(spark, path).centroids
    StoreCompaction.appendKeyed(
      ivfAssign(delta, idCol, vecCol, cents)
        .withColumn("gen", org.apache.spark.sql.functions.lit(gen)),
      s"$path/assigned", Seq("ivf_cell"), tag)
  }

  /** Reload a persisted index (probe-only sessions; k centroid rows is the
    * only driver-side data). */
  def ivfRead(spark: org.apache.spark.sql.SparkSession, path: String): IvfIndex = {
    val cents = spark.read.parquet(s"$path/centroids")
      .collect().map(r => (r.getAs[Int]("cid"), r.getSeq[Double](r.fieldIndex("cvec"))))
      .sortBy(_._1).toSeq
    IvfIndex(cents, spark.read.parquet(s"$path/assigned"))
  }

  /** True when `path` holds a completely-written index. */
  def ivfIndexExists(path: String): Boolean =
    new java.io.File(s"$path/assigned/_SUCCESS").exists() &&
      new java.io.File(s"$path/centroids/_SUCCESS").exists()

  /** The `nprobe` cells whose centroids are nearest `qvec` — pure driver-side
    * math over k centroid rows. Stable order: similarity desc, cell id asc. */
  def ivfProbeCells(centroids: Seq[(Int, Seq[Double])], qvec: Seq[Double],
      nprobe: Int): Seq[Int] =
    centroids.map { case (i, c) =>
      val dot = qvec.zip(c).map { case (a, b) => a * b }.sum
      val denom = math.sqrt(qvec.map(x => x * x).sum) * math.sqrt(c.map(x => x * x).sum)
      (i, dot / denom)
    }.sortBy { case (i, sim) => (-sim, i) }.take(nprobe).map(_._1)

  /** Probe a (pre-built, possibly re-read-from-parquet) assignment: scan only
    * the probe cells, cosine top-k. `assigned` needs columns idCol, vecCol,
    * ivf_cell. */
  def ivfProbe(assigned: DataFrame, centroids: Seq[(Int, Seq[Double])],
      idCol: String, vecCol: String, qvec: Seq[Double], k: Int,
      nprobe: Int = 2, excludeId: Option[Long] = None): DataFrame = {
    val cells = ivfProbeCells(centroids, qvec, nprobe)
    val base = assigned.filter(col("ivf_cell").isin(cells: _*))
    excludeId.fold(base)(id => base.filter(col(idCol) =!= id))
      .select(col(idCol), round(cosine(col(vecCol), typedLit(qvec)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** The query vector for `queryId` (bounded 1-row collect). */
  def queryVector(embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long): Seq[Double] =
    embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol)).collect().head.getSeq[Float](0).map(_.toDouble)

  /** IVF top-k convenience: build + probe in one call. For repeated probes
    * (the production shape) build with [[ivfIndex]] / persist with
    * [[ivfWrite]] and call [[ivfProbe]] against the pruned scan instead. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nCells: Int = 8, nprobe: Int = 2): DataFrame = {
    val index = ivfIndex(embeddings, idCol, vecCol, nCells)
    val qvec = queryVector(embeddings, idCol, vecCol, queryId)
    ivfProbe(index.assigned, index.centroids, idCol, vecCol, qvec, k, nprobe,
      excludeId = Some(queryId))
  }

  /** Batch kNN JOIN over the IVF layout: for EVERY probe vector, its k
    * nearest corpus neighbors — the corpus-vs-corpus shape
    * retrieval-augmentation and embedding-dedup pipelines run, where the
    * single-query [[ivfProbe]] does not scale past a handful of lookups.
    *
    * Fully distributed, no driver-side query vector:
    *  - each probe picks its `nprobe` nearest centroids with a per-probe
    *    window over the broadcast centroid frame (k·dim literals — the
    *    same (-sim, cell) tie order as [[ivfProbeCells]]);
    *  - probes join candidates on the `ivf_cell` equi-key, so a probe
    *    scores only nprobe/nCells of the corpus (against the persisted
    *    layout this is a partition-pruned read);
    *  - per-probe top-k is a window over the probe's own candidates — no
    *    global sort, state bounded by candidates-per-probe.
    *
    * Returns (query_id, neighbor_id, cos, rk) with rk in [1, k], cosine
    * rounded 6 (rank ties break on neighbor id). Self-matches excluded. */
  def ivfKnnJoin(assigned: DataFrame, centroids: Seq[(Int, Seq[Double])],
      probes: DataFrame, probeIdCol: String, probeVecCol: String,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 2): DataFrame = {
    require(k > 0 && nprobe > 0, s"k and nprobe must be positive, got $k, $nprobe")
    val spark = assigned.sparkSession
    import spark.implicits._
    val centDf = centroids.toDF("ivf_cell", "centroid")
    val wCell = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("csim").desc, col("ivf_cell"))
    val qcells = probes
      .select(col(probeIdCol).as("query_id"), col(probeVecCol).as("qvec"))
      .crossJoin(broadcast(centDf))
      .withColumn("csim", cosine(col("qvec"), col("centroid")))
      .withColumn("crk", row_number().over(wCell))
      .filter(col("crk") <= nprobe)
      .select(col("query_id"), col("qvec"), col("ivf_cell"))
    val wK = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col(idCol))
    qcells.join(assigned, "ivf_cell")
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qvec"), col(vecCol)), 6))
      .withColumn("rk", row_number().over(wK))
      .filter(col("rk") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"), col("cos"),
        col("rk").cast("int").as("rk"))
  }

  /** All pairs above a cosine threshold within an id-bounded slice —
    * embedding-based near-dup detection (quadratic: bound the slice, or go
    * through lshBucket + within-bucket pairs at scale). */
  def cosineNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = embeddings.select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = embeddings.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    a.crossJoin(b).filter(col("id1") < col("id2"))
      .withColumn("cos", round(cosine(col("v1"), col("v2")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }

  /** Scalable near-dup: only pairs sharing an LSH bucket are compared. */
  def lshNearDupPairs(embeddings: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 4, dim: Int = 64): DataFrame = {
    val ps = hyperplanes(dim, planes)
    val bucketed = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"),
      lshBucket(col(vecCol), ps).as("bucket"))
    val l = bucketed.select(col("bucket"), col("id").as("id1"), col("v").as("v1"))
    val r = bucketed.select(col("bucket"), col("id").as("id2"), col("v").as("v2"))
    l.join(r, "bucket").filter(col("id1") < col("id2"))
      .withColumn("cos", round(cosine(col("v1"), col("v2")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos")).distinct()
  }

  // ---- Product quantization (PQ) ------------------------------------------

  /** Squared L2 distance between two equal-length double arrays as a
    * SEQUENTIAL left-to-right fold — (a[i]-b[i])² accumulated in index
    * order, so the IEEE result is order-pinned and an independent engine
    * replays it bit-for-bit (the multimodal f0-fold discipline). HOFs are
    * interpreted in Spark 4 — fine here: PQ distance frames are
    * (corpus × m × k) rows of 8-element folds, never the raw-dim hot path
    * (that reduction is the point of PQ). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0),
      (acc, x) => acc + x)

  /** The (id, sub, sv) sub-vector stream: each vector split into `m`
    * contiguous dim/m-wide slices — a zero-shuffle projection. */
  def pqSubFrame(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, m: Int): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sd = dim / m
    val subs = array((0 until m).map(s0 =>
      struct(lit(s0).as("sub"),
        slice(col(vecCol).cast("array<double>"), s0 * sd + 1, sd).as("sv"))): _*)
    embeddings.select(col(idCol).as("id"), explode(subs).as("e"))
      .select(col("id"), col("e.sub").as("sub"), col("e.sv").as("sv"))
  }

  /** Deterministic per-subspace code assignment under `codebook`
    * ((sub, cid) -> centroid): min squared-L2, ties to the smallest cid —
    * realized as min-distance then min-cid-at-that-distance (two bounded
    * aggregates; no engine-dependent arg_min tie behavior anywhere).
    * Returns (id, sub, code). */
  def pqAssign(subFrame: DataFrame, codebook: Seq[((Int, Int), Seq[Double])]): DataFrame = {
    val spark = subFrame.sparkSession
    import spark.implicits._
    val cb = codebook.map { case ((s0, c0), v) => (s0, c0, v) }
      .toDF("sub", "cid", "cv")
    val dists = subFrame.join(broadcast(cb), Seq("sub"))
      .select(col("id"), col("sub"), col("cid"), l2sq(col("sv"), col("cv")).as("d2"))
    val md = dists.groupBy(col("id"), col("sub")).agg(min(col("d2")).as("md"))
    dists.join(md, Seq("id", "sub")).filter(col("d2") === col("md"))
      .groupBy(col("id"), col("sub")).agg(min(col("cid")).as("code"))
  }

  /** Train the PQ codebook: per subspace, `k` codewords seeded by the same
    * stride rule as [[ivfCentroids]] (every corpus/k-th vector by id) and
    * refined with `iters` deterministic Lloyd rounds — per-cell means
    * accumulated as exact `round(x·2^20)` longs (the [[ivfRefine]]
    * discipline), so the whole codebook is a pure, engine-replayable
    * function of the corpus. All m subspaces train in the SAME passes
    * (one assignment join + one (sub, cid, d) aggregate per round); the
    * per-round collect is m·k·(dim/m) = k·dim values — bounded like
    * [[MaxRefineCells]], never corpus-sized. */
  def pqTrain(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int = 64, m: Int = 8, k: Int = 16, iters: Int = 2): Seq[((Int, Int), Seq[Double])] = {
    require(k.toLong * dim <= MaxRefineCells, s"k x dim over the driver cap")
    val sd = dim / m
    val seeds = ivfCentroids(embeddings, idCol, vecCol, k)
    var cb: Seq[((Int, Int), Seq[Double])] = for {
      (cid, v) <- seeds; s0 <- 0 until m
    } yield ((s0, cid), v.slice(s0 * sd, (s0 + 1) * sd))
    val subf = pqSubFrame(embeddings, idCol, vecCol, dim, m)
    for (_ <- 0 until iters) {
      val byCell = pqAssign(subf, cb)
        .join(subf, Seq("id", "sub"))
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("d", "x")))
        .groupBy(col("sub"), col("code"), col("d"))
        .agg(sum(round(col("x") * RefineScale).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
        .groupBy(r => (r.getAs[Int]("sub"), r.getAs[Int]("code")))
      cb = cb.map { case (key, oldv) =>
        byCell.get(key) match {
          case Some(rows) =>
            (key, rows.map(r => (r.getAs[Int]("d"),
              r.getAs[Long]("s").toDouble / r.getAs[Long]("n") / RefineScale))
              .sortBy(_._1).map(_._2).toSeq)
          case None => (key, oldv) // empty cell keeps its previous codeword
        }
      }
    }
    cb
  }

  /** ADC (asymmetric distance computation) top-k over PQ codes: the query
    * is NOT quantized — per (sub, cid) partial distances to the true query
    * sub-vectors are precomputed (m·k values) and each corpus vector's
    * estimated distance is the FIXED-ORDER sum of its m looked-up partials
    * (a pivot to columns + an explicit a0+a1+…, so the IEEE sum is
    * order-pinned and replayable — a plain SUM over the m rows would be
    * shuffle-order-dependent). 8 bytes per vector stand in for 256 — the
    * compressed-corpus scan shape IVF-PQ systems run at memory scale. */
  def pqAdcTopK(codes: DataFrame, codebook: Seq[((Int, Int), Seq[Double])],
      qvec: Seq[Double], m: Int, topK: Int, excludeId: Option[Long] = None): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val sd = qvec.length / m
    val parts = codebook.map { case ((s0, cid), cv) =>
      val qs = qvec.slice(s0 * sd, (s0 + 1) * sd)
      val d2 = qs.zip(cv).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
      (s0, cid, d2)
    }.toDF("sub", "code", "pd")
    val base = excludeId.fold(codes)(id => codes.filter(col("id") =!= id))
    val perSub = base.join(broadcast(parts), Seq("sub", "code"))
      .groupBy(col("id")).pivot("sub", (0 until m).map(Int.box)).agg(first(col("pd")))
    val est = (0 until m).map(s0 => col(s0.toString)).reduce(_ + _)
    perSub.select(col("id"), round(est, 6).as("est_d2"))
      .orderBy(col("est_d2"), col("id")).limit(topK)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embeddings into IVF cells, then drop
    * near-semantic duplicates WITHIN each cell — a vector is dropped iff a
    * smaller-id vector in the same cell has rounded cosine ≥ `threshold`,
    * and its survivor is the smallest such id (deterministic election, the
    * same min-id rule [[graft.ext.Dedup.incrementalNearDups]] uses).
    *
    * One row per vector: (id, ivf_cell, kept, survivor_id).
    *
    * Scale: pair comparison is confined to a cell (the per-cell self-join
    * key is `ivf_cell`) — never all-pairs global. Cell population is
    * corpus/nCells on average, so at 100 TB `nCells` grows with the corpus
    * to keep cells bounded (SemDeDup runs k ~ 0.1% of n) and total work
    * stays ~n·cellSize, linear for bounded cells. Election is greedy
    * min-id, not connected components: one join + one aggregate, no
    * iteration — the documented SemDeDup trade (a kept doc may still be
    * within threshold of another kept doc's dropped neighbor). */
  def semanticDedup(embeddings: DataFrame, idCol: String, vecCol: String,
      nCells: Int = 8, threshold: Double = 0.4, refineIters: Int = 2): DataFrame =
    semanticDedupFromAssigned(
      ivfIndex(embeddings, idCol, vecCol, nCells, refineIters).assigned,
      idCol, vecCol, threshold)

  /** [[semanticDedup]] over a PRE-BUILT cell assignment (e.g. the persisted
    * IVF index) — the production shape: clustering is a corpus-generation
    * artifact, the election re-runs per policy change without re-training. */
  def semanticDedupFromAssigned(assigned: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    val a = assigned.select(col("ivf_cell"), col(idCol).as("id"),
      col(vecCol).as("v"))
    val b = a.select(col("ivf_cell"), col("id").as("id2"), col("v").as("v2"))
    val dropped = a.join(b, Seq("ivf_cell")).filter(col("id") < col("id2"))
      .withColumn("cos", round(cosine(col("v"), col("v2")), 6))
      .filter(col("cos") >= threshold)
      .groupBy(col("ivf_cell"), col("id2"))
      .agg(min(col("id")).as("survivor"))
    a.select(col("ivf_cell"), col("id"))
      .join(dropped.select(col("id2").as("id"), col("survivor")), Seq("id"), "left")
      .select(col("id"), col("ivf_cell"), col("survivor").isNull.as("kept"),
        coalesce(col("survivor"), col("id")).as("survivor_id"))
  }
}
