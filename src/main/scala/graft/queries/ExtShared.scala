package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Hll, Multimodal, Ranking, Similarity, StoreCompaction, TextAnalysis => TA}

/** Helpers shared by the Ext* domain objects (formerly private members of
  * the monolithic Extensions object). The object is package-private; member
  * visibility is therefore unchanged in effect.
  */
private[graft] object ExtShared {

  /** Truncated EWMA kernel (alpha = 0.3, 10 taps), w_k = a*(1-a)^k computed
    * ONCE here and shared verbatim — as double literals — by the Spark
    * expression and the DuckDB oracle, so no pow() is evaluated in either
    * engine at query time. */
  val ewmaTapWeights: Seq[Double] = {
    val a = 0.3
    (0 until 10).map(k => a * math.pow(1 - a, k))
  }

  /** Token budget per training shard — shared by the sharding query and its
    * packing-stats audit so the two can never drift apart. */
  val shardBudget = 2048

  /** Shared base for the shuffle-shard queries: seeded md5 shuffle key, 256
    * hash strata, token counts, and the greedy cumulative-sum shard
    * assignment (window per stratum, so the sort parallelizes across
    * strata — no global single-partition window). */
  def shuffleShardFrame(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(lit("shuf:"), col("doc_id").cast("string")).cast("binary"))
    val toks = TA.tokenCount(col("text")).cast("long")
    val base = Tables.documents(s, d)
      .select(col("doc_id"), key.as("k"), substring(key, 1, 2).as("stratum"),
        toks.as("n_tokens"))
    val w = Window.partitionBy(col("stratum")).orderBy(col("k"))
    base.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("shard",
        floor((col("cum") - col("n_tokens")) / shardBudget).cast("long"))
  }

  // DuckDB mirrors. Tokenization both sides: lowercase, split \s+, drop
  // empty. DuckDB md5() hashes the UTF-8 string exactly like Spark's
  // md5(CAST AS BINARY).
  val toks = """list_filter(regexp_split_to_array(lower(text), '\s+'), x -> length(x) > 0)"""
  val enStops =
    TA.EnglishStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
  val frStops =
    TA.FrenchStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
  val deStops =
    TA.GermanStopwords.map(w => s"'$w'").mkString("[", ", ", "]")
  val esStops =
    TA.SpanishStopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  // Spark-parity rounding for division-derived score columns (see OracleSql)
  def sparkRound(expr: String, n: Int): String = OracleSql.sparkRound(expr, n)

  /** Skyline input: (value, µs) of non-null purchases. Shared by the lane
    * and BoundedWindowSpec so the bound pin can't drift off the lane. */
  def skylinePoints(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .select(col("value"), expr("ts_ns div 1000").as("tus"))

  /** Phase 1 of the distributed skyline: per-partition dominance prune.
    * Output size = sum of per-partition Pareto frontiers (~O(p·log n) on
    * independent dims) — the bound BoundedWindowSpec pins, because phase
    * 2's global window is only safe while this stays ≪ rows. */
  def skylineSurvivors(pts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wl = Window.partitionBy(col("pid"))
      .orderBy(col("value").desc, col("tus").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pts.withColumn("pid", spark_partition_id())
      .withColumn("pm", max(col("tus")).over(wl))
      .filter(col("pm").isNull || col("pm") <= col("tus"))
      .select(col("value"), col("tus"))
  }

  /** Global sort that computes its child ONCE (r17, guide §2.4): Spark's
    * range exchange SAMPLES its child RDD for partition bounds and then
    * shuffles it — executing the entire pre-sort segment (scan, codegen'd
    * projections, codecs) TWICE. Measured on the byte-BPE projection at
    * sf0.1 (graft.SortProbe): plain orderBy 0.63 s vs 0.34 s with a hash
    * exchange interposed — the exchange materializes the segment as an AQE
    * query stage, so the range sampling reads shuffle output instead of
    * recomputing the segment. Cost: one extra exchange of the FINAL rows;
    * a win whenever segment compute dominates output bytes (tokenizer,
    * regex, media-codec lanes). Output rows and order are identical. */
  def sortedOnce(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame =
    // partition on the LEADING key only: a multi-column repartition whose
    // expressions match the sort prefix is collapsed away by the optimizer
    // in several of these shapes (observed in the r17 plan dumps), which
    // silently restores the double evaluation this helper exists to avoid
    df.repartition(keys.head).orderBy(keys: _*)

  /** Distinct (flag, price)→weight rows with their B=1024 value-range
    * bucket ids — phase 0+bucketing of agg_weighted_median_bucketed,
    * shared with BoundedWindowSpec (pins per-bucket occupancy ≪ distinct
    * values, the phase-2 window's frame bound). */
  val WmedianBuckets = 1024
  def wmedianBucketed(s: SparkSession, d: String): DataFrame = {
    val B = WmedianBuckets
    // r17 (guide §2.4): byv feeds BOTH the per-flag range aggregate and the
    // bucket join. The two consumers are NOT exchange-deduped (column
    // pruning specializes each branch's copy — plan-verified), so the lazy
    // form scanned lineitem twice; materialize the distinct-value frame
    // once — it is already the reduced grain.
    val byv = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag").as("flag"),
        col("l_extendedprice").as("v"))
      .agg(sum(col("l_quantity")).as("w"))
      .localCheckpoint()
    Dedup.rotateCheckpoints("ExtShared.wmedianBucketed", byv)
    val g = byv.groupBy(col("flag"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val wB = (col("mx") - col("mn")) / B
    byv.join(broadcast(g), "flag")
      .withColumn("b", when(wB === 0.0, lit(0L))
        .otherwise(least(lit((B - 1).toLong),
          floor((col("v") - col("mn")) / wB))))
  }

  /** One replay for BOTH weighted-median lanes (exact + bucketed): the
    * bucketed two-phase form returns the identical rows by construction. */
  val weightedMedianOracle: String =
    """WITH byv AS (SELECT l_returnflag AS flag, l_extendedprice AS v,
      |               sum(l_quantity) AS w
      |             FROM lineitem GROUP BY 1, 2),
      |c AS (SELECT flag, v, w,
      |        sum(w) OVER (PARTITION BY flag ORDER BY v
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |        sum(w) OVER (PARTITION BY flag) AS tw
      |      FROM byv)
      |SELECT flag, tw AS total_weight, min(v) AS wmedian
      |FROM c WHERE cw >= tw / 2 GROUP BY flag, tw ORDER BY flag""".stripMargin

  /** Shared near-dup graph derivation for the graph lanes (pagerank,
    * triangles, degree histogram): k=32 signatures, 8 bands × 4 rows,
    * agreement ≥ 0.5 — ONE definition kept in lockstep with the shared
    * `minhashPairsCtes` oracle constants, so re-banding one lane can never
    * desynchronize it from the single oracle replay. Returns the
    * checkpointed signature frame (the node universe — the short-doc
    * shingle fallback guarantees one row per doc) and the edge list. */
  def nearDupGraph(s: SparkSession, d: String, key: String)
      : (DataFrame, DataFrame) = {
    val sigs = Dedup.minhashSignatures(Tables.documents(s, d), "text",
      "doc_id", k = 32).localCheckpoint()
    Dedup.rotateCheckpoints(key, sigs)
    val edges = Dedup.minhashNearDupsFromSigs(sigs,
      bands = 8, rows = 4, threshold = 0.5).select(col("id1"), col("id2"))
    (sigs, edges)
  }

  /** DuckDB replay of TextAnalysis.fleschScore (rounded 4), shared VERBATIM
    * by the text_readability and train_curriculum_buckets oracles — the
    * ewmaTapWeights/minhashPairsCtes discipline: one definition, so a
    * syllable/sentence-regex change can never leave one oracle stale. */
  lazy val fleschRoundedSql: String = sparkRound(
    s"206.835 - 1.015 * (CAST(len($toks) AS DOUBLE)" +
      " / greatest(CAST(len(regexp_extract_all(text, '[.!?]+')) AS DOUBLE), 1.0))" +
      " - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)" +
      s" / CAST(len($toks) AS DOUBLE))", 4)

  /** Content-keyed path for the near-dup component store (k=32, b=8, r=4,
    * t=0.5 over `documents`): keyed by the source file's identity so a
    * regenerated corpus computes a fresh generation, versioned like the
    * IVF/sigstore caches. */
  def compStorePath(d: String): String = {
    val src = new java.io.File(d + "/documents.parquet")
    System.getProperty("java.io.tmpdir") + "/graft_compstore_" +
      (d + s"_${src.length}_${src.lastModified}_k32b8r4t05_v1")
        .replaceAll("[^A-Za-z0-9]", "_")
  }

  // ANN oracle plumbing: the exact hyperplanes the Spark path uses (fixed
  // seed), embedded as SQL literals — Double.toString round-trips exactly, and
  // both engines accumulate dot products sequentially in double, so the sign
  // bits (buckets) and cosines agree bit-for-bit.
  val lshPlanes = Similarity.hyperplanes(64, 4)
  def planeLit(p: Seq[Double]): String = p.mkString("[", ", ", "]")
  val bucketExpr = lshPlanes.zipWithIndex.map { case (p, i) =>
    s"(CASE WHEN list_inner_product(v, ${planeLit(p)}) >= 0 THEN ${1L << i} ELSE 0 END)"
  }.mkString(" + ")
  // shared CTE prefix: corpus as DOUBLE[], LSH buckets, the query row
  val lshCtes =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e),
       |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 0)""".stripMargin
  // mirrors ivfCentroids/ivfRefine/ivfAssign/ivfProbeCells: every stride-th
  // vector by id seeds a centroid; TWO deterministic Lloyd rounds move each
  // centroid to its members' element-wise mean (accumulated as exact
  // round(x·2^20) longs, so the mean is order-independent and the double
  // division replays bit-for-bit); empty cells keep their previous
  // centroid; then argmax-cosine assignment and a 3-nearest-cell probe.
  def lloydRound(i: Int, src: String = "e"): String = {
    val (prev, a, m, g, next) = (s"c${i - 1}", s"a$i", s"m$i", s"g$i", s"c$i")
    s"""$a AS (SELECT e.vec_id, e.v,
       |        arg_max(c.cid, list_cosine_similarity(e.v, c.cv)) AS cell
       |      FROM $src e, $prev c GROUP BY e.vec_id, e.v),
       |$m AS (SELECT cell, d, sum(CAST(round(v[d+1] * 1048576.0) AS BIGINT)) AS s,
       |        count(*) AS cnt
       |      FROM $a, range(64) r(d) GROUP BY cell, d),
       |$g AS (SELECT cell, list(CAST(s AS DOUBLE) / cnt / 1048576.0 ORDER BY d) AS cv
       |      FROM $m GROUP BY cell),
       |$next AS (SELECT p.cid, coalesce($g.cv, p.cv) AS cv
       |      FROM $prev p LEFT JOIN $g ON $g.cell = p.cid)""".stripMargin
  }
  val ivfCtes =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |n AS (SELECT greatest(count(*) // 8, 1) AS stride FROM e),
      |c0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cid, v AS cv
      |          FROM e, n WHERE vec_id % stride = 0 ORDER BY vec_id LIMIT 8),
      |${lloydRound(1)},
      |${lloydRound(2)},
      |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      |probe AS (SELECT cid FROM c2, q
      |          ORDER BY list_cosine_similarity(cv, qv) DESC, cid LIMIT 3),
      |assign AS (SELECT e.vec_id, e.v,
      |             arg_max(c.cid, list_cosine_similarity(e.v, c.cv)) AS cell
      |           FROM e, c2 c GROUP BY e.vec_id, e.v)""".stripMargin

  // incremental-index replay: centroids learned on the EVEN-id base corpus
  // only (seed stride + both Lloyd rounds over `ev`), assignment over the
  // FULL corpus — exactly base build + delta append under stored centroids
  val ivfIncCtes =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |ev AS (SELECT * FROM e WHERE vec_id % 2 = 0),
      |n AS (SELECT greatest(count(*) // 8, 1) AS stride FROM ev),
      |c0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cid, v AS cv
      |          FROM ev, n WHERE vec_id % stride = 0 ORDER BY vec_id LIMIT 8),
      |${lloydRound(1, "ev")},
      |${lloydRound(2, "ev")},
      |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
      |probe AS (SELECT cid FROM c2, q
      |          ORDER BY list_cosine_similarity(cv, qv) DESC, cid LIMIT 3),
      |assign AS (SELECT e.vec_id, e.v,
      |             arg_max(c.cid, list_cosine_similarity(e.v, c.cv)) AS cell
      |           FROM e, c2 c GROUP BY e.vec_id, e.v)""".stripMargin

  /** Incremental-e2e IVF replay (no WITH — composes into the combined
    * train_incremental_e2e oracle): centroids trained on the V1 embedding
    * corpus (stride seeds + two exact-long-mean Lloyd rounds — the same
    * [[lloydRound]] chain as ivfIncCtes), assignment over the V2 corpus
    * (id%13!=7, id%11==0 NEGATED — sign flips are IEEE-exact and visible
    * to cosine), probe = 3 nearest cells of the v2 query vector. Exactly
    * what the store's v1-build + tombstone + append-under-stored-centroids
    * path must produce. */
  val ivfE2eCtesBody: String =
    s"""ive AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |ev1 AS (SELECT vec_id, v FROM ive WHERE vec_id % 17 <> 5),
      |ev2 AS (SELECT vec_id,
      |          CASE WHEN vec_id % 11 = 0 THEN list_transform(v, x -> -x)
      |               ELSE v END AS v
      |        FROM ive WHERE vec_id % 13 <> 7),
      |n AS (SELECT greatest(count(*) // 8, 1) AS stride FROM ev1),
      |c0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cid, v AS cv
      |          FROM ev1, n WHERE vec_id % stride = 0 ORDER BY vec_id LIMIT 8),
      |${lloydRound(1, "ev1")},
      |${lloydRound(2, "ev1")},
      |q AS (SELECT v AS qv FROM ev2 WHERE vec_id = 1),
      |probe AS (SELECT cid FROM c2, q
      |          ORDER BY list_cosine_similarity(cv, qv) DESC, cid LIMIT 3),
      |assign AS (SELECT e.vec_id, e.v,
      |             arg_max(c.cid, list_cosine_similarity(e.v, c.cv)) AS cell
      |           FROM ev2 e, c2 c GROUP BY e.vec_id, e.v)""".stripMargin

  /** The per-corpus-snapshot persisted IVF index (nCells = 8, two Lloyd
    * rounds), built on first use and partition-pruned ever after. "lloyd2"
    * versions the cache key: the r7 centroid-refinement change would
    * otherwise be served a stale stride-seed index. */
  def cachedIvfIndex(s: SparkSession, d: String,
      emb: DataFrame): Similarity.IvfIndex = {
    val path = snapPath(d, "graft_ivf_", IvfVer)
    if (Similarity.ivfIndexExists(path)) Similarity.ivfRead(s, path)
    else {
      val built = Similarity.ivfIndex(emb, "vec_id", "embedding", nCells = 8)
      Similarity.ivfWrite(built, path)
      Similarity.ivfRead(s, path)
    }
  }

  /** ONE recipe for every per-corpus-snapshot cache path: fixture dir +
    * source (length, mtime) + a version suffix that callers bump when the
    * algorithm behind the artifact changes (the r7 'lloyd2' lesson). */
  def snapPath(d: String, prefix: String, ver: String): String = {
    val src = new java.io.File(d + "/embeddings.parquet")
    System.getProperty("java.io.tmpdir") + s"/$prefix" +
      (d + s"_${src.length}_${src.lastModified}_$ver").replaceAll("[^A-Za-z0-9]", "_")
  }

  /** IVF training version — shared by the index cache AND every derived
    * artifact (codes_by_cell), so bumping it invalidates them TOGETHER:
    * a derived layout keyed only on its own version would silently serve
    * cells from stale centroids. */
  val IvfVer = "lloyd2"

  def pqPath(d: String): String = snapPath(d, "graft_pq_", "pq1")

  /** The IVF-PQ layout proper: the PQ codes persisted PARTITIONED BY
    * ivf_cell (once per corpus snapshot), so a probe is a partition-PRUNED
    * scan of the 8-byte codes — cells-on-disk, codes-in-memory. Shared by
    * sim_ivfpq_topk and sim_ivfpq_rerank; keyed on IvfVer so a centroid
    * change invalidates it together with the index. */
  def cachedCodesByCell(s: SparkSession, d: String,
      index: Similarity.IvfIndex, codes: DataFrame): DataFrame = {
    val byCellPath = pqPath(d) + "/codes_by_cell_" + IvfVer
    if (!new java.io.File(s"$byCellPath/_SUCCESS").exists())
      codes.join(
          index.assigned.select(col("vec_id").as("id"), col("ivf_cell")), "id")
        .repartition(col("ivf_cell"))
        .write.mode("overwrite").partitionBy("ivf_cell").parquet(byCellPath)
    s.read.parquet(byCellPath)
  }

  /** The per-corpus-snapshot PQ model (codebook + codes), trained once and
    * persisted — the production shape (codebooks are corpus-generation
    * artifacts, like the IVF centroids and the signature store); repeat
    * queries read 8 bytes/vector instead of re-running Lloyd. The build
    * is gated on a marker written AFTER both writes (a crash between them
    * forces a rebuild; like every snapshot cache here, the writer is
    * single-JVM — the harness runs Verify/Bench serially). */
  def cachedPq(s: SparkSession, d: String, emb: DataFrame)
      : (Seq[((Int, Int), Seq[Double])], DataFrame) = {
    import s.implicits._
    val path = pqPath(d)
    val marker = java.nio.file.Paths.get(path, "_graft_pq_complete")
    if (!java.nio.file.Files.exists(marker)) {
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 8, k = 16)
      cb.map { case ((s0, c0), v) => (s0, c0, v) }.toDF("sub", "cid", "cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebook")
      Similarity.pqAssign(
          Similarity.pqSubFrame(emb, "vec_id", "embedding", 64, 8), cb)
        .write.mode("overwrite").parquet(s"$path/codes")
      java.nio.file.Files.writeString(marker, "ok")
    }
    val cb = s.read.parquet(s"$path/codebook").collect()
      .map(r => ((r.getAs[Int]("sub"), r.getAs[Int]("cid")),
        r.getSeq[Double](r.fieldIndex("cv"))))
      .sortBy(_._1).toSeq
    (cb, s.read.parquet(s"$path/codes"))
  }

  /** Sequential squared-L2 fold over `len` elements in index order —
    * mirrors [[graft.ext.Similarity.l2sq]] (same IEEE association). */
  def l2FoldSql(a: String, b: String, len: Int): String =
    s"""list_reduce([CAST(0.0 AS DOUBLE)] || list_transform(range(1, ${len + 1}),
       |      i -> (($a)[i] - ($b)[i]) * (($a)[i] - ($b)[i])), (x, y) -> x + y)""".stripMargin

  /** One PQ Lloyd round: assignment under cb{i-1} (min-distance then
    * min-cid — the deterministic tie rule pqAssign uses), then per
    * (sub, code, dim) exact-long means. */
  def pqRound(i: Int): String = {
    val (prev, dd, mm, aa, gg, hh, next) =
      (s"pcb${i - 1}", s"pd$i", s"pm$i", s"pa$i", s"pg$i", s"ph$i", s"pcb$i")
    s"""$dd AS (SELECT f.vec_id, f.sub, c.cid,
       |        ${l2FoldSql("f.sv", "c.cv", 8)} AS d2
       |      FROM subf f JOIN $prev c ON c.sub = f.sub),
       |$mm AS (SELECT vec_id, sub, min(d2) AS md FROM $dd GROUP BY vec_id, sub),
       |$aa AS (SELECT d.vec_id, d.sub, min(d.cid) AS code
       |      FROM $dd d JOIN $mm m ON m.vec_id = d.vec_id AND m.sub = d.sub
       |        AND d.d2 = m.md GROUP BY d.vec_id, d.sub),
       |$gg AS (SELECT a.sub, a.code, r.d,
       |        sum(CAST(round(f.sv[r.d + 1] * 1048576.0) AS BIGINT)) AS s,
       |        count(*) AS cnt
       |      FROM $aa a JOIN subf f ON f.vec_id = a.vec_id AND f.sub = a.sub,
       |        range(8) r(d) GROUP BY a.sub, a.code, r.d),
       |$hh AS (SELECT sub, code, list(CAST(s AS DOUBLE) / cnt / 1048576.0 ORDER BY d) AS cv
       |      FROM $gg GROUP BY sub, code),
       |$next AS (SELECT c.sub, c.cid, coalesce($hh.cv, c.cv) AS cv
       |      FROM $prev c LEFT JOIN $hh ON $hh.sub = c.sub AND $hh.code = c.cid)""".stripMargin
  }

  /** PQ replay chain (no leading WITH/e — composable beside ivfCtes):
    * stride seeds (16 full vectors) sliced into 8 subspaces, two Lloyd
    * rounds, final deterministic assignment, then ADC — per (sub, code)
    * partials to the exact query sub-vectors, summed in FIXED subspace
    * order via conditional columns (mirrors the Spark pivot). Own names
    * (pn/qq/…) so the ivf chain's n/q never collide. */
  val pqChainCtes =
    s"""pn AS (SELECT greatest(count(*) // 16, 1) AS stride FROM e),
       |ps0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cid, v
       |       FROM e, pn WHERE vec_id % stride = 0 ORDER BY vec_id LIMIT 16),
       |pcb0 AS (SELECT r.sub, s.cid, s.v[r.sub * 8 + 1 : r.sub * 8 + 8] AS cv
       |       FROM ps0 s, range(8) r(sub)),
       |subf AS (SELECT e.vec_id, r.sub, e.v[r.sub * 8 + 1 : r.sub * 8 + 8] AS sv
       |       FROM e, range(8) r(sub)),
       |${pqRound(1)},
       |${pqRound(2)},
       |fd AS (SELECT f.vec_id, f.sub, c.cid,
       |        ${l2FoldSql("f.sv", "c.cv", 8)} AS d2
       |      FROM subf f JOIN pcb2 c ON c.sub = f.sub),
       |fm AS (SELECT vec_id, sub, min(d2) AS md FROM fd GROUP BY vec_id, sub),
       |codes AS (SELECT d.vec_id, d.sub, min(d.cid) AS code
       |      FROM fd d JOIN fm m ON m.vec_id = d.vec_id AND m.sub = d.sub
       |        AND d.d2 = m.md GROUP BY d.vec_id, d.sub),
       |qq AS (SELECT v AS qv FROM e WHERE vec_id = 0),
       |qs AS (SELECT r.sub, qq.qv[r.sub * 8 + 1 : r.sub * 8 + 8] AS sv
       |      FROM qq, range(8) r(sub)),
       |pp AS (SELECT c.sub, c.cid AS code,
       |        ${l2FoldSql("qs.sv", "c.cv", 8)} AS pd
       |      FROM pcb2 c JOIN qs ON qs.sub = c.sub),
       |adc AS (SELECT cd.vec_id,
       |        ${(0 until 8).map(s0 =>
                  s"max(CASE WHEN cd.sub = $s0 THEN p.pd END) AS p$s0")
                  .mkString(",\n|        ")}
       |      FROM codes cd JOIN pp p ON p.sub = cd.sub AND p.code = cd.code
       |      GROUP BY cd.vec_id),
       |est AS (SELECT vec_id,
       |        round(${(0 until 8).map(s0 => s"p$s0").mkString(" + ")}, 6) AS est_d2
       |      FROM adc)""".stripMargin

  val pqCtes =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |$pqChainCtes""".stripMargin

  // Sketch oracle plumbing: the MinHash/SimHash hash basis is FNV-1a
  // (functions/Fnv.scala) precisely so DuckDB can replay it. The SQL walks
  // the UTF-8 bytes as hex pairs and folds the xor/multiply loop in HUGEINT
  // mod 2^64 — byte-for-byte the Scala loop in SimHash.fnv1a (the byte only
  // touches the low 8 bits, so the xor is done on `% 256` in BIGINT).
  def fnvSql(expr: String): String =
    s"""list_reduce(
       |  [14695981039346656037::HUGEINT] || list_transform(
       |    range(1, octet_length(encode($expr)) + 1),
       |    i -> ('0x' || substr(hex(encode($expr)), 2*i - 1, 2))::BIGINT::HUGEINT),
       |  (a, b) -> ((a - a % 256 + xor((a % 256)::BIGINT, b::BIGINT)::HUGEINT)
       |             * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)""".stripMargin
  /** (a * c) mod 2^64 where `a` is an unsigned-64 HUGEINT expression and `c`
    * a 64-bit constant — the constant is split at 32 bits so no intermediate
    * exceeds int128 (a*c directly would need 128+ bits for c ~ 2^64). */
  def mulMod64Sql(a: String, c: Long): String = {
    val c1 = java.lang.Long.divideUnsigned(c, 1L << 32)
    val c0 = c & 0xffffffffL
    s"""((($a) * $c0::HUGEINT
       |  + (((($a) % 4294967296::HUGEINT) * $c1::HUGEINT) % 4294967296::HUGEINT)
       |    * 4294967296::HUGEINT) % 18446744073709551616::HUGEINT)""".stripMargin
  }
  /** murmur3 fmix64 over an unsigned-64 HUGEINT column `h`, as a chain of
    * CTE stages (each xor-shift references its input twice — a column ref,
    * never a re-inlined subtree). Mirrors [[graft.functions.Fnv.fmix64]];
    * verified value-for-value against the JVM on random 64-bit inputs. */
  def fmixStages(src: String, keyCol: String): String =
    s"""x1 AS (SELECT $keyCol, xor(h, h // (1::HUGEINT << 33)) AS h FROM $src),
       |x2 AS (SELECT $keyCol, ${mulMod64Sql("h", 0xff51afd7ed558ccdL)} AS h FROM x1),
       |x3 AS (SELECT $keyCol, xor(h, h // (1::HUGEINT << 29)) AS h FROM x2),
       |x4 AS (SELECT $keyCol, ${mulMod64Sql("h", 0xc4ceb9fe1a85ec53L)} AS h FROM x3),
       |hh AS (SELECT $keyCol, xor(h, h // (1::HUGEINT << 32)) AS hu FROM x4)""".stripMargin
  /** unsigned 64-bit HUGEINT -> the signed BIGINT Spark's LongType holds */
  def signed64(expr: String): String =
    s"(CASE WHEN ($expr) >= 9223372036854775808::HUGEINT THEN ($expr) - 18446744073709551616::HUGEINT ELSE ($expr) END)::BIGINT"
  /** Spark pmod(x, 2^31-1) on a signed 64-bit value */
  def pmodPrime(expr: String): String =
    s"((($expr) % 2147483647) + 2147483647) % 2147483647"
  /** Word n-gram shingles of `tk` — mirrors Dedup.shingles/minhashSignatures:
    * full n-grams for >= n tokens, else the whole token string once ("" for
    * empty docs). */
  def shingleSqlN(n: Int): String = {
    val gram = (0 until n).map(j => if (j == 0) "tk[i]" else s"tk[i+$j]")
      .mkString(" || ' ' || ")
    s"""CASE WHEN len(tk) >= $n
       |     THEN list_transform(range(1, len(tk) - ${n - 2}), i -> $gram)
       |     ELSE [array_to_string(tk, ' ')] END""".stripMargin
  }
  val shingleSql = shingleSqlN(3)
  /** Shared CTE prefix doc_id -> per-shingle hash h (the EXACT constants the
    * Spark path derives from Dedup.minhashParams' fixed seed are embedded by
    * the callers below). */
  /** CDC chunk replay, shared by the per-chunk and duplication oracles:
    * -> `ch(doc_id, chunk_idx, start_tok, n_toks, chunk_md5)`. The boundary
    * rule is the signed-pmod-16 of the same FNV-1a fold the sketch oracles
    * replay, over the rolling 2-token window ("prev tok", just "tok" at
    * position 0); chunk text re-joins tokens in position order. */
  lazy val cdcChunkCtes =
    s"""WITH docs AS (SELECT doc_id, $toks AS tk FROM documents),
       |t AS (SELECT doc_id, unnest(tk) AS tok,
       |        generate_subscripts(tk, 1) - 1 AS pos FROM docs),
       |tw AS (SELECT doc_id, pos, tok,
       |         CASE WHEN lag(tok) OVER w IS NULL THEN tok
       |              ELSE lag(tok) OVER w || ' ' || tok END AS wt
       |       FROM t WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
       |hb AS (SELECT doc_id, pos, tok,
       |         CASE WHEN (((${signed64(fnvSql("wt"))} % 16) + 16) % 16) = 0
       |              THEN 1 ELSE 0 END AS b
       |       FROM tw),
       |cx AS (SELECT *, CAST(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - b
       |         AS BIGINT) AS chunk_idx
       |       FROM hb),
       |ch AS (SELECT doc_id, chunk_idx, CAST(min(pos) AS BIGINT) AS start_tok,
       |         count(*) AS n_toks,
       |         md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
       |       FROM cx GROUP BY doc_id, chunk_idx)""".stripMargin

  /** [[minhashHashCtes]] body (no WITH), parameterized by the docs source —
    * the incremental-e2e oracle runs the identical chain over the v2
    * corpus subquery. */
  def minhashHashCtesBody(src: String): String =
    s"""docs AS (SELECT doc_id, $toks AS tk FROM $src),
       |shg AS (SELECT doc_id, unnest($shingleSql) AS s FROM docs),
       |hh AS (SELECT doc_id, ${pmodPrime(signed64(fnvSql("s")))} AS h FROM shg)""".stripMargin

  val minhashHashCtes = "WITH " + minhashHashCtesBody("documents")

  /** The minhash LSH pair replay, shared by the pairs oracle and the
    * end-to-end survivors oracle: -> `pairs(id1, id2, est_jaccard)`. */
  /** BM25 scoring CTEs for the fixed 3-term query, shared by the direct,
    * indexed and NDCG-eval oracles: ends with `scored(doc_id, score)`
    * (Spark-parity round-4 score); `tf(id, t, tf)` is also referenced by
    * the NDCG relevance CTE. */
  def bm25ScoredCtesBody(src: String): String = {
    val terms = Seq("spark", "window", "join")
    val inList = terms.map(t => s"'$t'").mkString(", ")
    val scoreSum = terms.map(t =>
      s"coalesce(sum(CASE WHEN t = '$t' THEN part END), 0)").mkString(" + ")
    s"""dl AS (SELECT doc_id AS id, CAST(len($toks) AS BIGINT) AS dl FROM $src),
       |g AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
       |tk AS (SELECT doc_id AS id, unnest($toks) AS t FROM $src),
       |tf AS (SELECT id, t, count(*) AS tf FROM tk WHERE t IN ($inList) GROUP BY id, t),
       |df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
       |p AS (SELECT tf.id, tf.t,
       |        ln((g.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
       |          * (tf.tf * ${1.2 + 1}) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / g.avgdl)) AS part
       |      FROM tf JOIN df USING (t) JOIN dl USING (id), g),
       |scored AS (SELECT id AS doc_id, ${sparkRound(scoreSum, 4)} AS score
       |           FROM p GROUP BY id)""".stripMargin
  }

  lazy val bm25ScoredCtes = "WITH " + bm25ScoredCtesBody("documents")

  /** Langid scoring CTEs (`lid`: doc_id, lang_guess, en) shared by the
    * text_langid lane and its confusion-matrix evaluation — the DuckDB
    * mirror of TextAnalysis.textStatsFrame's stopword-argmax pick, tie
    * broken in en>fr>de>es inventory order exactly like the Scala fold. */
  lazy val langidCtes =
    s"""WITH s AS (
       |  SELECT doc_id,
       |    CASE WHEN len($toks)=0 THEN 0.0
       |         ELSE CAST(len(list_filter($toks, x -> list_contains($enStops, x))) AS DOUBLE)/len($toks) END AS en,
       |    CASE WHEN len($toks)=0 THEN 0.0
       |         ELSE CAST(len(list_filter($toks, x -> list_contains($frStops, x))) AS DOUBLE)/len($toks) END AS fr,
       |    CASE WHEN len($toks)=0 THEN 0.0
       |         ELSE CAST(len(list_filter($toks, x -> list_contains($deStops, x))) AS DOUBLE)/len($toks) END AS de,
       |    CASE WHEN len($toks)=0 THEN 0.0
       |         ELSE CAST(len(list_filter($toks, x -> list_contains($esStops, x))) AS DOUBLE)/len($toks) END AS es,
       |    CASE WHEN length(text)=0 THEN 0.0
       |         ELSE CAST(length(regexp_replace(text,
       |                '[^\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Hangul}]', '', 'g')) AS DOUBLE)/length(text) END AS cjk
       |  FROM documents),
       |lid AS (
       |  SELECT doc_id,
       |    CASE WHEN cjk > 0.05 THEN 'zh'
       |         WHEN en >= fr AND en >= de AND en >= es AND en > 0 THEN 'en'
       |         WHEN fr >= de AND fr >= es AND fr > 0 THEN 'fr'
       |         WHEN de >= es AND de > 0 THEN 'de'
       |         WHEN es > 0 THEN 'es'
       |         ELSE 'und' END AS lang_guess,
       |    en
       |  FROM s)""".stripMargin

  def minhashPairsCtesBody(src: String): String = {
    val sigList = Dedup.minhashParams(32)
      .map { case (a, b) => s"min((h * $a + $b) % 2147483647)" }
      .mkString("[", ", ", "]")
    s"""${minhashHashCtesBody(src)},
       |sigs AS (SELECT doc_id, $sigList AS sig FROM hh GROUP BY doc_id),
       |bands AS (SELECT doc_id, sig, b, sig[4*b + 1 : 4*b + 4] AS key
       |          FROM sigs, range(8) r(b)),
       |sizes AS (SELECT b, key FROM bands GROUP BY b, key
       |          HAVING count(*) BETWEEN 2 AND 100),
       |cand AS (SELECT DISTINCT l.doc_id AS id1, r.doc_id AS id2
       |         FROM bands l JOIN sizes z ON l.b = z.b AND l.key = z.key
       |         JOIN bands r ON r.b = z.b AND r.key = z.key
       |         WHERE l.doc_id < r.doc_id),
       |est AS (SELECT c.id1, c.id2,
       |          ${sparkRound("CAST(len(list_filter(range(1, 33), i -> s1.sig[i] = s2.sig[i])) AS DOUBLE) / 32.0", 6)} AS est_jaccard
       |        FROM cand c JOIN sigs s1 ON s1.doc_id = c.id1
       |        JOIN sigs s2 ON s2.doc_id = c.id2),
       |pairs AS (SELECT id1, id2, est_jaccard FROM est WHERE est_jaccard >= 0.5)""".stripMargin
  }

  lazy val minhashPairsCtes = "WITH " + minhashPairsCtesBody("documents")

  /** diag_profile replay, shared by both modes: melt via UNION ALL, the
    * same fmix64(FNV-1a) register chain keyed by (c, v) — null values
    * null-propagate through the hash into a null register excluded from
    * the estimate — then the grouped two-level rollup and per-row estimate
    * branch. `exact = false` swaps the count(DISTINCT v) leg for NULL,
    * mirroring Profile.profile's scale mode. */
  def profileOracleSql(exact: Boolean): String = {
    val num = Hll.numerator(8)
    val meltCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
      "l_returnflag", "l_linestatus")
    val melt = meltCols.map(c =>
      s"SELECT '$c' AS c, CAST($c AS VARCHAR) AS v FROM lineitem")
      .mkString("\n|  UNION ALL ")
    val ndLeg = if (exact) "count(DISTINCT v)" else "CAST(NULL AS BIGINT)"
    val ndRollup = if (exact) "CAST(sum(nd) AS BIGINT)" else "CAST(NULL AS BIGINT)"
    s"""WITH mlt AS (
       |  $melt),
       |h0 AS (SELECT c, v, ${fnvSql("v")} AS h FROM mlt),
       |${fmixStages("h0", "c, v")},
       |rk AS (SELECT c, v, hu // (1::HUGEINT << 56) AS idx,
       |         CASE WHEN hu % (1::HUGEINT << 56) = 0 THEN 57
       |              ELSE 57 - length(bin(hu % (1::HUGEINT << 56))) END AS rank
       |       FROM hh),
       |regs AS (SELECT c, idx, max(rank) AS r, $ndLeg AS nd,
       |           count(*) AS cnt, count(v) AS nn
       |         FROM rk GROUP BY c, idx),
       |a AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS n_rows,
       |        CAST(sum(cnt) - sum(nn) AS BIGINT) AS n_null,
       |        $ndRollup AS ndv_exact,
       |        count(CASE WHEN idx IS NOT NULL THEN 1 END) AS m_used,
       |        coalesce(sum(CASE WHEN idx IS NOT NULL
       |          THEN 1::HUGEINT << (57 - r) END), 0::HUGEINT) AS s_used
       |      FROM regs GROUP BY c),
       |f AS (SELECT c, n_rows, n_null, ndv_exact,
       |        CAST(256 - m_used AS BIGINT) AS v_empty,
       |        s_used + (256 - m_used)::HUGEINT * (1::HUGEINT << 57) AS z_scaled
       |      FROM a)
       |SELECT c AS col_name, n_rows, n_null, ndv_exact,
       |  ${sparkRound(
          s"""CASE WHEN $num / CAST(z_scaled AS DOUBLE) <= 640.0 AND v_empty > 0
             |         THEN 256.0 * ln(256.0 / v_empty)
             |         ELSE $num / CAST(z_scaled AS DOUBLE) END""".stripMargin, 4)} AS ndv_est
       |FROM f ORDER BY col_name""".stripMargin
  }

  /** The BPE merge loop as a DuckDB recursive CTE (the `text_bpe_tokens` /
    * `train_pack_bpe` oracles): per doc, fold the token list by merging the
    * LEFTMOST occurrence of the best-ranked adjacent pair, one merge per
    * iteration, until no ranked pair remains — equivalent to the Spark
    * side's all-occurrences-at-once greedy loop because the fixture table
    * is creation-ordered (a merge's output token only operands LATER
    * merges, so merging one occurrence never surfaces a better-ranked
    * pair). The VALUES list is generated from the same
    * [[graft.functions.Bpe.fixtureTable]] the expression ships. Ends with
    * `bpe(doc_id, toks)`. */
  def bpeFoldCtes: String =
    s"""WITH RECURSIVE
       |merges(l, r, rnk) AS (VALUES ${graft.functions.Bpe.fixtureTable.sqlValues}),
       |init AS (
       |  SELECT doc_id,
       |    list_filter(string_split(substr(text, 1, 120), ''), x -> x <> '') AS toks
       |  FROM documents),
       |fold AS (
       |  SELECT doc_id, toks, false AS done FROM init
       |  UNION ALL
       |  SELECT f.doc_id,
       |    CASE WHEN best.pos IS NULL THEN f.toks
       |         ELSE f.toks[1:best.pos-1] ||
       |              [f.toks[best.pos] || f.toks[best.pos+1]] ||
       |              f.toks[best.pos+2:len(f.toks)] END AS toks,
       |    best.pos IS NULL AS done
       |  FROM (SELECT * FROM fold WHERE NOT done) f
       |  LEFT JOIN LATERAL (
       |    SELECT i AS pos FROM (SELECT unnest(range(1, len(f.toks))) AS i) p
       |    JOIN merges m ON m.l = f.toks[i] AND m.r = f.toks[i+1]
       |    ORDER BY m.rnk, i LIMIT 1
       |  ) best ON true),
       |bpe AS (SELECT doc_id, toks FROM fold WHERE done)""".stripMargin

  /** FULL-document BPE replay (VERDICT r13 #4): same merge fold, but per
    * SEGMENT — documents split at breaker chars (code points in no merge
    * operand, where the token stream provably factorizes; the character
    * class comes from the SAME BpeTable the Spark expression ships). The
    * recursion's depth is bounded by the longest operand-char run, not the
    * document length, and single-char segments (every breaker) start done.
    * Ends with `bpe(doc_id, toks)` — full-document token lists; empty-text
    * docs are restored by the consumers' LEFT JOIN. */
  def bpeFoldCtesFull: String = bpeFoldCtesFullFor(graft.functions.Bpe.fixtureTable)

  /** Same per-segment fold, parameterized by merge table — the 1k-table
    * lane (`text_bpe_tokens_1k`, VERDICT r14 #2) replays its 1,000 VALUES
    * rows through the identical recursion. */
  def bpeFoldCtesFullFor(table: graft.functions.Bpe.BpeTable): String =
    "WITH RECURSIVE\n" + bpeFoldCtesBody(table, "")

  /** The fold's CTE list WITHOUT the WITH keyword, every CTE name prefixed
    * — lets one query carry TWO independent folds (the tokenizer-A/B lane
    * replays both merge tables side by side). Ends with `${p}bpe(doc_id,
    * toks)`. */
  def bpeFoldCtesBody(table: graft.functions.Bpe.BpeTable, p: String): String = {
    val cls = table.operandClassBody.replace("'", "''")
    val pat = s"[$cls]+|[^$cls]"
    s"""${p}merges(l, r, rnk) AS (VALUES ${table.sqlValues}),
       |${p}seglist AS (SELECT doc_id, regexp_extract_all(text, '$pat', 0) AS segs
       |            FROM documents),
       |${p}init AS (
       |  SELECT doc_id, i.seg_idx,
       |    list_filter(string_split(segs[i.seg_idx], ''), x -> x <> '') AS toks,
       |    length(segs[i.seg_idx]) <= 1 AS done
       |  FROM ${p}seglist,
       |       LATERAL (SELECT unnest(range(1, len(segs) + 1)) AS seg_idx) i),
       |${p}fold AS (
       |  SELECT doc_id, seg_idx, toks, done FROM ${p}init
       |  UNION ALL
       |  SELECT f.doc_id, f.seg_idx,
       |    CASE WHEN best.pos IS NULL THEN f.toks
       |         ELSE f.toks[1:best.pos-1] ||
       |              [f.toks[best.pos] || f.toks[best.pos+1]] ||
       |              f.toks[best.pos+2:len(f.toks)] END AS toks,
       |    best.pos IS NULL AS done
       |  FROM (SELECT * FROM ${p}fold WHERE NOT done) f
       |  LEFT JOIN LATERAL (
       |    SELECT i AS pos FROM (SELECT unnest(range(1, len(f.toks))) AS i) p
       |    JOIN ${p}merges m ON m.l = f.toks[i] AND m.r = f.toks[i+1]
       |    ORDER BY m.rnk, i LIMIT 1
       |  ) best ON true),
       |${p}seg_bpe AS (SELECT doc_id, seg_idx, toks FROM ${p}fold WHERE done),
       |${p}bpe AS (SELECT doc_id, flatten(list(toks ORDER BY seg_idx)) AS toks
       |        FROM ${p}seg_bpe GROUP BY doc_id)""".stripMargin
  }

  /** BYTE-seeded full-document BPE replay (`text_bpe_tokens_bytes`,
    * VERDICT r15 #4): the same per-segment fold, but seed tokens are the
    * segment's UTF-8 BYTES as lowercase hex pairs and the merge VALUES are
    * the table's HEXED twin. Segmentation stays the char-level operand
    * class — exactly byte-level factorization because every operand is
    * ASCII (enforced Spark-side at column build): a breaker char's bytes
    * are a non-operand ASCII byte or ≥0x80 lead/continuation bytes, none
    * of which appear in any hexed operand. Ends with `bpe(doc_id, toks)`. */
  def bpeFoldCtesBytesFor(table: graft.functions.Bpe.BpeTable): String = {
    val cls = table.operandClassBody.replace("'", "''")
    val pat = s"[$cls]+|[^$cls]"
    s"""WITH RECURSIVE
       |merges(l, r, rnk) AS (VALUES ${table.sqlValuesHex}),
       |seglist AS (SELECT doc_id, regexp_extract_all(text, '$pat', 0) AS segs
       |            FROM documents),
       |init AS (
       |  SELECT doc_id, i.seg_idx,
       |    regexp_extract_all(lower(hex(encode(segs[i.seg_idx]))),
       |                       '[0-9a-f][0-9a-f]') AS toks,
       |    octet_length(encode(segs[i.seg_idx])) <= 1 AS done
       |  FROM seglist,
       |       LATERAL (SELECT unnest(range(1, len(segs) + 1)) AS seg_idx) i),
       |fold AS (
       |  SELECT doc_id, seg_idx, toks, done FROM init
       |  UNION ALL
       |  SELECT f.doc_id, f.seg_idx,
       |    CASE WHEN best.pos IS NULL THEN f.toks
       |         ELSE f.toks[1:best.pos-1] ||
       |              [f.toks[best.pos] || f.toks[best.pos+1]] ||
       |              f.toks[best.pos+2:len(f.toks)] END AS toks,
       |    best.pos IS NULL AS done
       |  FROM (SELECT * FROM fold WHERE NOT done) f
       |  LEFT JOIN LATERAL (
       |    SELECT i AS pos FROM (SELECT unnest(range(1, len(f.toks))) AS i) p
       |    JOIN merges m ON m.l = f.toks[i] AND m.r = f.toks[i+1]
       |    ORDER BY m.rnk, i LIMIT 1
       |  ) best ON true),
       |seg_bpe AS (SELECT doc_id, seg_idx, toks FROM fold WHERE done),
       |bpe AS (SELECT doc_id, flatten(list(toks ORDER BY seg_idx)) AS toks
       |        FROM seg_bpe GROUP BY doc_id)""".stripMargin
  }

  /** The BPE TRAINING loop replay (`train_bpe_learn`): k unrolled stages
    * over the word histogram. Stage i = weighted adjacent-pair counts over
    * the current tokenization (lateral unnest), argmax with (cnt DESC,
    * lhs, rhs) ties, then the learned merge applied in CLOSED FORM — all
    * matches merge at once (single-pass disjointness: for l≠r matches can
    * never be adjacent; for l==r a run of n merges ⌊n/2⌋ pairs at even
    * offsets from the run start, gated here by the `% 2` parity against
    * the last non-l position). Every multiply-referenced stage is
    * MATERIALIZED — inlined chaining re-evaluates the prefix per
    * reference (2^k blowup, measured 305 s → 0.9 s at sf0.01). No
    * recursive CTE anywhere: chained recursion + lateral joins proved
    * planner-shape-sensitive in DuckDB during prototyping. */
  def bpeLearnOracle(k: Int): String = {
    val (ctes, learnSel) = bpeLearnStages(k)
    ctes + learnSel
  }

  /** The train→apply composition replay (`train_bpe_apply_learned`): the
    * same learning stages, then the final tokenization d_{k+1} joins each
    * document's whitespace words for BPE token counts + fertility. */
  def bpeApplyOracle(k: Int): String = {
    val toks = """list_filter(regexp_split_to_array(lower(text), '\s+'), x -> length(x) > 0)"""
    val (ctes, _) = bpeLearnStages(k)
    ctes +
      s""",
         |v AS (SELECT word, CAST(len(toks) AS BIGINT) AS nt FROM d${k + 1}),
         |dw AS (SELECT doc_id, unnest($toks) AS word FROM documents),
         |pd AS (SELECT doc_id, CAST(sum(nt) AS BIGINT) AS n_bpe_tokens,
         |         CAST(count(*) AS BIGINT) AS n_words
         |       FROM dw JOIN v USING (word) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(n_bpe_tokens, 0) AS n_bpe_tokens,
         |  coalesce(n_words, 0) AS n_words,
         |  CASE WHEN coalesce(n_words, 0) = 0 THEN 0.0
         |       ELSE ${sparkRound("CAST(n_bpe_tokens AS DOUBLE) / n_words", 4)} END AS fertility
         |FROM documents d LEFT JOIN pd USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
  }

  /** Shared CTE prefix for the two training lanes: (stages, learning
    * select). See [[bpeLearnOracle]] / [[bpeApplyOracle]]. */
  def bpeLearnStages(k: Int): (String, String) = {
    val toks = """list_filter(regexp_split_to_array(lower(text), '\s+'), x -> length(x) > 0)"""
    def applySql(t: String, ml: String, mr: String): String = {
      val cand = s"($t[i] = $ml AND $t[i+1] = $mr)"
      val runstart = s"(coalesce(list_max(list_filter(range(1, i), j -> $t[j] <> $ml)), 0) + 1)"
      val app = s"($cand AND ($ml <> $mr OR (i - $runstart) % 2 = 0))"
      val cand1 = s"($t[i-1] = $ml AND $t[i] = $mr)"
      val runstart1 = s"(coalesce(list_max(list_filter(range(1, i-1), j -> $t[j] <> $ml)), 0) + 1)"
      val app1 = s"(i > 1 AND $cand1 AND ($ml <> $mr OR ((i-1) - $runstart1) % 2 = 0))"
      s"""flatten(list_transform(range(1, len($t) + 1), i ->
         |    CASE WHEN i < len($t) AND $app THEN [$t[i] || $t[i+1]]
         |         WHEN $app1 THEN []
         |         ELSE [$t[i]] END))""".stripMargin
    }
    val parts = scala.collection.mutable.ArrayBuffer(
      s"""w AS MATERIALIZED (SELECT x AS word, CAST(count(*) AS BIGINT) AS wc
         |  FROM (SELECT unnest($toks) AS x FROM documents) GROUP BY x)""".stripMargin,
      """d1 AS MATERIALIZED (SELECT word, wc,
        |  list_filter(string_split(word, ''), x -> x <> '') AS toks FROM w)""".stripMargin)
    val sel = scala.collection.mutable.ArrayBuffer.empty[String]
    for (i <- 1 to k) {
      parts += s"""p$i AS (SELECT toks[i] AS l, toks[i+1] AS r, CAST(sum(wc) AS BIGINT) AS cnt
                  |  FROM d$i, LATERAL (SELECT unnest(range(1, len(toks))) AS i) ii GROUP BY 1, 2)""".stripMargin
      parts += s"m$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l, r LIMIT 1)"
      sel += s"SELECT ${i - 1} AS merge_round, l AS lhs, r AS rhs, cnt AS pair_count FROM m$i"
      // the final apply (d_{k+1}) feeds the train→apply composition lane.
      // LEFT JOIN, not a cross join (advice r14): if a round learns no merge
      // (m_i empty on a degenerate corpus), the Spark trainer keeps its last
      // merge table — the replay must likewise pass toks through unchanged
      // instead of emptying every later stage.
      parts += s"""d${i + 1} AS MATERIALIZED (
                  |  SELECT word, wc,
                  |    CASE WHEN m.l IS NULL THEN toks
                  |         ELSE ${applySql("toks", "m.l", "m.r")} END AS toks
                  |  FROM d$i LEFT JOIN m$i m ON TRUE)""".stripMargin
    }
    ("WITH\n" + parts.mkString(",\n") + "\n",
      sel.mkString(" UNION ALL ") + " ORDER BY merge_round")
  }

}
