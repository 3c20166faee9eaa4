package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {

  private val dim = 16

  /** deterministic vector set: 3 tight clusters + noise */
  private def vectors() = {
    import spark.implicits._
    val r = new scala.util.Random(123)
    val centers = Seq.fill(3)(Array.fill(dim)(r.nextGaussian()))
    (0 until 90).map { i =>
      val c = centers(i % 3)
      val v = c.map(x => (x + r.nextGaussian() * 0.1).toFloat)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("cosine: orthogonal=0, identical=1, opposite=-1") {
    import spark.implicits._
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 2f), Seq(1f, 2f), 1.0),
      (Seq(1f, 0f), Seq(-1f, 0f), -1.0)
    ).toDF("a", "b", "expect")
    df.select(Similarity.cosine(col("a"), col("b")).as("cos"), col("expect"))
      .collect().foreach { r =>
        assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
      }
  }

  test("brute-force top-k matches driver-side exact computation") {
    import spark.implicits._
    val df = vectors().cache()
    val got = Similarity.bruteForceTopK(df, "vec_id", "embedding", queryId = 0L, k = 5)
      .as[(Long, Double)].collect().toSeq
    // naive reference computation on the driver
    val all = df.as[(Long, Seq[Float])].collect().toMap
    val q = all(0L).map(_.toDouble)
    def cos(v: Seq[Float]): Double = {
      val w = v.map(_.toDouble)
      val dot = q.zip(w).map { case (a, b) => a * b }.sum
      dot / (math.sqrt(q.map(x => x * x).sum) * math.sqrt(w.map(x => x * x).sum))
    }
    val expect = all.removed(0L).view.map { case (id, v) =>
      (id, BigDecimal(cos(v)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy { case (id, c) => (-c, id) }.take(5)
    assert(got.map(_._1) === expect.map(_._1))
    got.zip(expect).foreach { case ((_, g), (_, e)) => assert(math.abs(g - e) < 1e-5) }
  }

  test("LSH top-k: high recall on clustered data, bucket co-membership works") {
    val df = vectors().cache()
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.lshTopK(df, "vec_id", "embedding", 0L, 10, planes = 2, dim = dim)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low (exact=$exact approx=$approx)")
  }

  test("IVF top-k: probing more cells raises recall; full probe equals brute force") {
    val df = vectors().cache()
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    val fullProbe = Similarity.ivfTopK(df, "vec_id", "embedding", 0L, 10,
      nCells = 6, nprobe = 6).collect().map(_.getLong(0)).toSet
    assert(fullProbe === exact, "probing every cell must reproduce brute force")
    val narrow = Similarity.ivfTopK(df, "vec_id", "embedding", 0L, 10,
      nCells = 6, nprobe = 2).collect().map(_.getLong(0)).toSet
    val recall = (exact & narrow).size.toDouble / exact.size
    assert(recall >= 0.5, s"nprobe=2 recall $recall too low")
    assert(narrow.size <= 10)
  }

  test("Lloyd refinement: centroids move to cluster mass, recall never drops, deterministic") {
    val df = vectors().cache()
    val seeds = Similarity.ivfCentroids(df, "vec_id", "embedding", 3)
    val refined = Similarity.ivfRefine(df, "vec_id", "embedding", seeds, iters = 2)
    assert(refined.map(_._1) === seeds.map(_._1), "cell ids are stable")
    assert(refined !== seeds, "two Lloyd rounds must move stride seeds on clustered data")
    // determinism: the quantized-mean formulation is order-independent
    val again = Similarity.ivfRefine(
      df.repartition(7), "vec_id", "embedding", seeds, iters = 2)
    assert(again === refined, "refinement must not depend on partitioning")

    // recall at nprobe=1 on 3 tight clusters: refined centroids sit ON the
    // clusters, so the query's own cell holds its whole cluster
    val exact = Similarity.bruteForceTopK(df, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    def recallWith(cents: Seq[(Int, Seq[Double])]): Double = {
      val assigned = Similarity.ivfAssign(df, "vec_id", "embedding", cents)
      val q = Similarity.queryVector(df, "vec_id", "embedding", 0L)
      val got = Similarity.ivfProbe(assigned, cents, "vec_id", "embedding",
        q, k = 10, nprobe = 1, excludeId = Some(0L))
        .collect().map(_.getLong(0)).toSet
      (exact & got).size.toDouble / exact.size
    }
    val (rSeed, rRefined) = (recallWith(seeds), recallWith(refined))
    assert(rRefined >= rSeed,
      s"refined recall $rRefined must not drop below seed recall $rSeed")
    assert(rRefined >= 0.9, s"refined nprobe=1 recall on tight clusters: $rRefined")

    // empty-cell fallback: more cells than distinct directions leaves some
    // cells memberless — they must keep their previous centroid, not NaN out
    val tiny = {
      import spark.implicits._
      (0 until 4).map(i => (i.toLong, Seq.fill(dim)(if (i == 0) 1f else -1f)))
        .toDF("vec_id", "embedding")
    }
    val tinySeeds = Similarity.ivfCentroids(tiny, "vec_id", "embedding", 4)
    val tinyRefined = Similarity.ivfRefine(tiny, "vec_id", "embedding", tinySeeds, iters = 2)
    assert(tinyRefined.forall(_._2.forall(x => !x.isNaN)),
      "empty cells must fall back to their previous centroid")
  }

  test("persisted IVF index round-trips and probes identically to a fresh build") {
    val df = vectors().cache()
    val path = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/idx"
    assert(!Similarity.ivfIndexExists(path))
    val built = Similarity.ivfIndex(df, "vec_id", "embedding", nCells = 6)
    Similarity.ivfWrite(built, path)
    assert(Similarity.ivfIndexExists(path))
    val loaded = Similarity.ivfRead(spark, path)
    assert(loaded.centroids === built.centroids, "centroids must survive persistence")
    val q = Similarity.queryVector(df, "vec_id", "embedding", 0L)
    val fresh = Similarity.ivfProbe(built.assigned, built.centroids,
      "vec_id", "embedding", q, k = 10, nprobe = 2, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val reloaded = Similarity.ivfProbe(loaded.assigned, loaded.centroids,
      "vec_id", "embedding", q, k = 10, nprobe = 2, excludeId = Some(0L))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(reloaded === fresh, "probe over the persisted index must match the fresh build")
  }

  test("ivfKnnJoin: per-probe results identical to single-query ivfProbe") {
    val df = vectors()
    val index = Similarity.ivfIndex(df, "vec_id", "embedding", nCells = 6)
    val probes = df.filter(col("vec_id") % 10 === 0) // 9 probes
    val joined = Similarity.ivfKnnJoin(index.assigned, index.centroids,
        probes, "vec_id", "embedding", "vec_id", "embedding", k = 4, nprobe = 2)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq)
      .toMap
    assert(joined.keySet === (0 until 90 by 10).map(_.toLong).toSet)
    for (q <- joined.keySet) {
      val qvec = Similarity.queryVector(df, "vec_id", "embedding", q)
      val single = Similarity.ivfProbe(index.assigned, index.centroids,
          "vec_id", "embedding", qvec, k = 4, nprobe = 2, excludeId = Some(q))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(joined(q) === single, s"probe $q: batch join != single-query probe")
    }
    // ranks are dense 1..k per probe
    assert(joined.values.forall(_.size == 4))
  }

  test("randomProject: JL norm preservation within the k-determined envelope") {
    val df = vectors()
    // project 16-d -> 8-d with the scaled-Gaussian planes: E[|y|^2] = |x|^2,
    // relative deviation ~ 1/sqrt(k). Assert a loose 3-sigma-ish envelope
    // per vector and a tight one for the mean over the fixture.
    val proj = Similarity.randomProject(df, "vec_id", "embedding", outDim = 8, dim = dim)
    val ny2 = (0 until 8).map(j => col(s"y$j") * col(s"y$j")).reduce(_ + _)
    val nx2 = Similarity.dot(col("embedding"), col("embedding"))
    val ratios = proj
      .join(df.select(col("vec_id"), nx2.as("nx2")), "vec_id")
      .select((ny2 / col("nx2")).as("r")).collect().map(_.getDouble(0))
    assert(ratios.forall(r => r > 0.1 && r < 4.0),
      s"per-vector norm ratio out of envelope: min=${ratios.min} max=${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.7 && mean < 1.4, s"mean norm ratio $mean should hug 1")
    // determinism: same seed, same planes, identical output
    val again = Similarity.randomProject(df, "vec_id", "embedding", outDim = 8, dim = dim)
      .orderBy("vec_id").collect()
    assert(Similarity.randomProject(df, "vec_id", "embedding", outDim = 8, dim = dim)
      .orderBy("vec_id").collect() === again)
  }

  test("PQ: codebook shape, deterministic codes, high ADC recall on clustered data") {
    val df = vectors().cache() // dim=16, 3 tight clusters
    val (m, k) = (4, 8)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = dim, m = m, k = k)
    assert(cb.size === m * k, "one codeword per (sub, cid)")
    assert(cb.forall(_._2.size === dim / m))
    val codes = Similarity.pqAssign(
      Similarity.pqSubFrame(df, "vec_id", "embedding", dim, m), cb)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(codes.size === 90 * m, "exactly one code per (vector, subspace)")
    assert(codes.values.forall(c => c >= 0 && c < k))
    // determinism end-to-end
    val cb2 = Similarity.pqTrain(df, "vec_id", "embedding", dim = dim, m = m, k = k)
    assert(cb2 === cb)
    // ADC recall vs the exact full-dim L2 top-10 for query vector 0 —
    // clustered data is where PQ earns its 32x compression
    val qvec = Similarity.queryVector(df, "vec_id", "embedding", 0L)
    val ann = Similarity.pqAdcTopK(
      Similarity.pqAssign(Similarity.pqSubFrame(df, "vec_id", "embedding", dim, m), cb),
      cb, qvec, m = m, topK = 10, excludeId = Some(0L))
      .collect().map(_.getLong(0)).toSet
    val bf = df.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        Similarity.l2sq(col("embedding").cast("array<double>"),
          typedLit(qvec)).as("d2"))
      .orderBy(col("d2"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val recall = (ann & bf).size / 10.0
    assert(recall >= 0.5, s"ADC recall@10 on tight clusters was only $recall")
  }

  test("ADC + exact re-rank: recall never drops below ADC-only, and full-C re-rank IS brute force") {
    val df = vectors().cache() // dim=16, 90 vectors, 3 tight clusters
    val (m, k) = (4, 8)
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = dim, m = m, k = k)
    val codes = Similarity.pqAssign(
      Similarity.pqSubFrame(df, "vec_id", "embedding", dim, m), cb)
    val qvec = Similarity.queryVector(df, "vec_id", "embedding", 0L)
    def rerank(c: Int): Set[Long] = {
      val cand = Similarity.pqAdcTopK(codes, cb, qvec, m = m, topK = c,
        excludeId = Some(0L)).select(col("id").as("vec_id"))
      df.join(broadcast(cand), "vec_id")
        .select(col("vec_id"),
          Similarity.l2sq(col("embedding").cast("array<double>"),
            typedLit(qvec)).as("d2"))
        .orderBy(col("d2"), col("vec_id")).limit(10)
        .collect().map(_.getLong(0)).toSet
    }
    val bf = df.filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        Similarity.l2sq(col("embedding").cast("array<double>"),
          typedLit(qvec)).as("d2"))
      .orderBy(col("d2"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val adcOnly = Similarity.pqAdcTopK(codes, cb, qvec, m = m, topK = 10,
      excludeId = Some(0L)).collect().map(_.getLong(0)).toSet
    val adcRecall = (adcOnly & bf).size / 10.0
    val rerankRecall = (rerank(30) & bf).size / 10.0
    assert(rerankRecall >= adcRecall,
      s"re-rank@C=30 recall $rerankRecall fell below ADC-only $adcRecall")
    // when C covers every candidate, the exact leg IS brute force — the
    // approximation vanishes by construction
    assert(rerank(89) === bf, "full-candidate re-rank must equal exact top-10")
  }

  test("ivfAppend: delta-grown index probes exactly like full assignment under stored centroids") {
    val df = vectors().cache()
    val base = df.filter(col("vec_id") % 2 === 0)
    val delta = df.filter(col("vec_id") % 2 === 1)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf_append").toString + "/idx"
    Similarity.ivfWrite(Similarity.ivfIndex(base, "vec_id", "embedding", nCells = 3), path)
    Similarity.ivfAppend(spark, path, delta, "vec_id", "embedding")
    val grown = Similarity.ivfRead(spark, path)
    assert(grown.assigned.count() === 90, "append must not drop or duplicate rows")
    // the grown layout must equal a one-shot assignment of the FULL corpus
    // under the SAME (stored) centroids, cell for cell...
    val oneShot = Similarity.ivfAssign(df, "vec_id", "embedding", grown.centroids)
      .select(col("vec_id"), col("ivf_cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val stored = grown.assigned.select(col("vec_id"), col("ivf_cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stored === oneShot)
    // ...and so must the probe results
    val qvec = Similarity.queryVector(df, "vec_id", "embedding", 0L)
    def probeRows(assigned: org.apache.spark.sql.DataFrame) =
      Similarity.ivfProbe(assigned, grown.centroids, "vec_id", "embedding",
        qvec, k = 5, nprobe = 2, excludeId = Some(0L)).collect().map(_.toSeq).toSeq
    assert(probeRows(grown.assigned) ===
      probeRows(Similarity.ivfAssign(df, "vec_id", "embedding", grown.centroids)))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(path).getParentFile)
  }

  test("semanticDedup: per-cell min-id election, kept/survivor invariants") {
    val df = vectors().cache()
    val out = Similarity.semanticDedup(df, "vec_id", "embedding",
      nCells = 3, threshold = 0.98)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(out.size === 90, "exactly one verdict row per vector")
    // survivors point at themselves; dropped rows point at a SMALLER kept-
    // or-dropped id in the SAME cell whose cosine clears the threshold
    val exact = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    out.foreach { case (id, (cell, kept, surv)) =>
      if (kept) assert(surv === id)
      else {
        assert(surv < id, s"survivor $surv must be the smaller id (doc $id)")
        assert(out(surv)._1 === cell, "election never crosses cells")
        assert(exact.contains((surv, id)),
          s"($surv, $id) elected but not an exact near-dup pair")
      }
    }
    // clustered fixture at sigma=0.1: some duplicates must be found
    assert(out.values.exists(!_._2), "tight clusters must yield dropped rows")
    // determinism
    val again = Similarity.semanticDedup(df, "vec_id", "embedding",
      nCells = 3, threshold = 0.98)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(again === out)
  }

  test("ivfRefine: the nCells x dim driver collect is capped, not unbounded") {
    val df = vectors()
    val tooMany = (0 until 70000).map(i => (i, Seq.fill(64)(0.5))).toSeq
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfRefine(df, "vec_id", "embedding", tooMany)
    }
    assert(e.getMessage.contains("driver cap"),
      "ivfRefine must refuse a collect larger than MaxRefineCells")
  }

  test("LSH near-dup pairs are a subset of exact pairs at the same threshold") {
    val df = vectors().cache()
    val exact = Similarity.cosineNearDupPairs(df, "vec_id", "embedding", 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDupPairs(df, "vec_id", "embedding", 0.98, planes = 2, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), s"LSH produced non-dup pairs: ${lsh -- exact}")
    // clustered data at sigma=0.1 has some very close pairs; LSH should find some
    if (exact.nonEmpty) assert(lsh.nonEmpty, "LSH found none of the exact pairs")
  }
}
