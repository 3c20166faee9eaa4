package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Hll, Multimodal, Ranking, Similarity, StoreCompaction, TextAnalysis => TA}
import ExtShared._

/** Training-mix lanes (sampling, packing, splits, decontamination, BPE training).
  *
  * Split from the former monolithic Extensions.scala (registry unchanged:
  * [[Extensions.queries]] / [[Extensions.oracles]] concatenate the domain
  * objects). Oracle policy and citations live on [[Extensions]].
  */
private[graft] object ExtTrain {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- training-pipeline compositions (oracle-checked) -------------------

    // Deterministic shuffle + token-budget sharding, the pre-training layout
    // step: docs ordered by a seeded md5 key WITHIN 256 hash strata (the
    // window is partitioned, so the sort parallelizes across strata — no
    // global single-partition window), then packed greedily into shards of
    // ~shardBudget tokens by cumulative token count.
    "train_shuffle_shard" -> ((s, d) => {
      shuffleShardFrame(s, d)
        .select(col("doc_id"), col("stratum"), col("shard"), col("n_tokens"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Deterministic train/valid/test assignment from an md5 threshold on
    // the seeded doc key — reproducible across runs/engines, no shuffle at
    // all (pure projection; the split travels with the row).
    "train_split_hash" -> ((s, d) => {
      val bucket = substring(
        md5(concat(lit("split:"), col("doc_id").cast("string")).cast("binary")), 1, 2)
      Tables.documents(s, d)
        .select(col("doc_id"), bucket.as("bucket"))
        .withColumn("split", graft.ext.Sampling.hashSplit(col("doc_id")))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Z-order (Morton) layout audit: interleave two dimensions into one
    // clustering key and show per-key-range locality — each zb bucket
    // bounds a tight (x, y) rectangle, which is exactly what parquet
    // min/max stats need to prune scans on BOTH dimensions. The interleave
    // is shift/mask column algebra, replayed bit-for-bit by the oracle.
    "layout_zorder" -> ((s, d) => {
      val e = Tables.events(s, d).select(
        floor(col("value")).cast("long").as("x"),
        hour(col("ts")).cast("long").as("y"))
      e.withColumn("zb", shiftright(graft.ext.Layout.zValue2(col("x"), col("y")), 10))
        .groupBy(col("zb"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
        .orderBy(col("zb"))
    }),

    // Stratified rate-based sampling: downsample the head language, keep
    // the tail whole — the corpus-rebalancing move. Decision = seeded md5
    // threshold per stratum: deterministic, engine-replayable, zero
    // shuffles (projection + filter, pushed into the scan stage).
    "train_stratified_sample" -> ((s, d) => {
      graft.ext.Sampling.stratifiedSample(Tables.documents(s, d), "lang", "doc_id",
          Map("en" -> 0.25, "zh" -> 0.5))
        .select(col("doc_id"), col("lang"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Stratified fixed-size sampling: exactly min(k,|stratum|) docs per
    // language, chosen by the seeded draw with the key as tiebreaker —
    // a deterministic "reservoir" (one window over the stratum shuffle,
    // no global sort).
    "train_sample_per_lang" -> ((s, d) => {
      graft.ext.Sampling.stratifiedFixedK(Tables.documents(s, d), "lang", "doc_id", 40)
        .select(col("doc_id"), col("lang"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Mixture rebalancing with DATA-DERIVED rates: each language gets
    // keep-rate min(1, equal-share/current-share), so the dominant language
    // is downsampled toward uniform and the tail is kept whole. Reports
    // per-language before/after counts — the mixture-control loop in one
    // query.
    "train_mixture_rebalance" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val kept = graft.ext.Sampling.rebalanceUniform(docs, "lang", "doc_id")
      val before = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_before"))
      val after = kept.groupBy(col("lang")).agg(count(lit(1)).as("n_after"))
      before.join(after, Seq("lang"), "left")
        .select(col("lang"), col("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"))
        .orderBy(col("lang"))
    }),

    // Temperature (α = 0.5) mixture sampling: target share ∝ sqrt(natural
    // share) — tempered toward uniform, not all the way (the multilingual
    // mixing practice); the binding stratum keeps every row, the head is
    // downsampled to realize the target exactly. Before/after counts per
    // language.
    "train_temperature_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val kept = graft.ext.Sampling.temperatureSampleHalf(docs, "lang", "doc_id")
      val before = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_before"))
      val after = kept.groupBy(col("lang")).agg(count(lit(1)).as("n_after"))
      before.join(after, Seq("lang"), "left")
        .select(col("lang"), col("n_before"),
          coalesce(col("n_after"), lit(0L)).as("n_after"))
        .orderBy(col("lang"))
    }),

    // Per-row weighted (importance) sampling: keep probability follows the
    // document's length score instead of a stratum constant — the
    // quality-weighted downsampling move. Still zero shuffles and still
    // deterministic in (seed, doc_id).
    "train_weighted_sample" -> ((s, d) => {
      graft.ext.Sampling.weightedSample(Tables.documents(s, d),
          col("n_chars").cast("double") / 500.0, "doc_id")
        .select(col("doc_id"), col("n_chars"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    // exactly 20 docs per language, selection probability ∝ tokens+1 —
    // the "pick k, longer docs more likely, no duplicates" draw that
    // per-row Bernoulli sampling can't express. Seeded-FNV u, ln(u)/w
    // rank key on a 1e-12 grid (cross-engine safe), one per-stratum
    // window.
    "train_weighted_topk" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .withColumn("nt", TA.tokenCount(col("text")).cast("long"))
      graft.ext.Sampling.weightedFixedK(docs, "lang", "doc_id",
          col("nt") + 1, k = 20)
        .select(col("lang"), col("doc_id"), col("nt").as("n_tokens"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("lang"), col("rank"))
    }),

    // Shard-level packing stats on top of train_shuffle_shard: docs and
    // token fill per (stratum, shard) against the shardBudget-token budget
    // check that the packing step produced trainable, evenly-filled shards.
    // Same one window pass; the stats are a second aggregate on its output.
    "train_pack_stats" -> ((s, d) => {
      shuffleShardFrame(s, d)
        .groupBy(col("stratum"), col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("shard_tokens"))
        .withColumn("fill",
          round(col("shard_tokens").cast("double") / shardBudget, 4))
        .orderBy(col("stratum"), col("shard"))
    }),

    // Concat-and-chunk sequence packing — the GPT-style pre-training
    // layout: the corpus concatenated in doc_id order, cut into
    // 2048-token context windows; per doc its global token offset and the
    // window span it lands in. The global running offset is a TWO-PHASE
    // prefix sum (per-shard totals + within-shard window), never a
    // single-partition global window — the only serial piece is the
    // corpus/4096-row shard-prefix frame. Oracle replays it as the plain
    // global window cumsum the two-phase form must equal.
    "train_pack_concat" -> ((s, d) => {
      graft.ext.Sampling.packConcat(Tables.documents(s, d), "doc_id",
          TA.tokenCount(col("text")), budget = 2048L)
        .select(col("id").as("doc_id"), col("n_tokens"), col("start_off"),
          col("pack_first"), col("pack_last"), col("packs_spanned"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Token-budget mixture: per language, keep docs in seeded-draw order
    // until the language's TOKEN budget is spent (the knob pre-training
    // mixtures are specified in). Admission = "start offset under budget",
    // computed with the same two-phase prefix sum as train_pack_concat
    // (draw-prefix sub-shards), so no stratum sorts as one partition. The
    // lane reports the per-language fill; the oracle replays the cut as
    // the plain per-stratum window cumsum.
    // First-fit-decreasing bin packing into 256-token windows, 16
    // deterministic FNV shards packed independently in parallel — the
    // waste-minimizing alternative to concat-and-chunk. The oracle folds
    // the identical (nt DESC, id) first-fit rule per shard as a recursive
    // CTE over list state (the finality-buffer replay pattern).
    // BPE TOKENIZER TRAINING (r14): learn the merge table itself — the
    // Sennrich et al. training loop as a distributed op, closing the
    // tokenizer family (encode r13 → train r14). Scale shape: the corpus
    // collapses to a WORD HISTOGRAM first (ONE shuffle; from then on the
    // vocabulary, not the corpus, bounds every iteration — the classic
    // trainer trick, and the reason this survives 100 TB: 8 rounds of
    // map-side-combined pair counts over distinct words weighted by wc,
    // each ending in a 1-row argmax collect; the driver holds only the
    // k-row merge table). Re-encoding each round with the accumulated
    // table is provably equal to stage-wise single-pass application
    // (BpeSpec pins the property), which is what the oracle replays:
    // 8 unrolled materialized-CTE stages, each applying the learned merge
    // in CLOSED FORM (all disjoint matches at once; run-parity gates
    // l==r chains) — no recursive CTE, no planner fragility. Ties break
    // (count DESC, lhs, rhs) identically on both sides.
    "train_bpe_learn" -> ((s, d) => {
      import graft.functions.Bpe
      val words = Tables.documents(s, d)
        .select(explode(TA.tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).cast("long").as("wc"))
        .localCheckpoint()
      Dedup.rotateCheckpoints("train_bpe_learn", words)
      var merges = Vector.empty[(String, String)]
      val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      for (round <- 0 until 8) {
        val toksCol =
          if (merges.isEmpty) filter(split(col("word"), ""), t => length(t) > 0)
          else Bpe.bpe_encode(col("word"), Bpe.BpeTable(merges))
        val best = words
          .select(col("wc"), toksCol.as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("wc"), explode(expr(
            "transform(sequence(0, size(t) - 2), j -> struct(t[j] AS l, t[j + 1] AS r))")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("wc")).as("cnt"))
          .orderBy(desc("cnt"), col("l"), col("r"))
          .limit(1).collect()
        best.headOption.foreach { row =>
          merges = merges :+ (row.getString(0) -> row.getString(1))
          learned += ((round, row.getString(0), row.getString(1), row.getLong(2)))
        }
      }
      import s.implicits._
      learned.toSeq.toDF("merge_round", "lhs", "rhs", "pair_count")
        .orderBy(col("merge_round"))
    }),

    // TRAIN → APPLY composed (r14): tokenize the corpus with the table
    // LEARNED IN-LANE — the end-to-end tokenizer build. Production shape:
    // the 8 learned merges apply to the DISTINCT VOCABULARY once (the
    // same histogram the trainer used), and documents join the tokenized
    // vocab broadcast — per-word work never repeats across occurrences,
    // so corpus size only prices the exploded join, not the merge loop.
    // Fertility (BPE tokens per word) is THE tokenizer-quality metric a
    // data pipeline monitors. Oracle: the training stages + one more
    // closed-form apply (d9), then the same vocab join per document.
    // Supervised ROUTER AUDIT — the validation step a CCNet/DCLM-style
    // pipeline runs before trusting a text classifier to route documents
    // by provenance/domain for mixture weighting: train a centroid
    // (Rocchio) classifier over unigram class profiles on a held-out
    // split, score the test half, report per-doc predictions + correctness
    // against the SOURCE label. On THIS corpus the audit's finding is
    // "no signal": text is conditionally independent of every metadata
    // label (measured during development — the centroid, a lift-weighted
    // centroid, and a full add-1 log-NB all score exactly chance ≈ 1/20 on
    // source, and per-source train-half/test-half top words disagree, i.e.
    // the apparent skew is sampling noise; the lang label is likewise
    // text-independent). A real mixture pipeline MUST run this audit —
    // routing 100 TB on an unvalidated classifier silently reweights by
    // noise. The machinery is the deliverable and is exactness-checked:
    // per-class word frequencies rounded at 9 dp and CAST to DECIMAL (the
    // bigram-LM recipe: integer division is IEEE-correctly-rounded in both
    // engines, so the rounded profile values are bit-identical), exact
    // decimal dot-product scores, argmax with lexicographic tie-break.
    // Scale shape: the profile broadcast is CAPPED at top-k terms per
    // class (no-op on this closed 31-word vocabulary — the oracle is
    // cap-free); one shuffle for the per-doc score aggregate; the class
    // list is a tiny broadcast cross.
    // Split by alternating 20-blocks, NOT parity: source = src{doc_id%20}
    // in this corpus, so a parity split would put even sources in train
    // and odd in test (disjoint classes, accuracy 0 by construction).
    // RouterSpec proves the machinery learns (accuracy 1.0) on a planted-
    // signal corpus.
    "train_centroid_classifier" -> ((s, d) =>
      graft.ext.Router.centroidAudit(Tables.documents(s, d), "source",
        col("doc_id") % 40 < 20)),

    // THE DELTA LOOP END-TO-END (VERDICT r15 #1): v1 stores (BM25 index,
    // signature store, IVF index) + ops_snapshot_diff's added/changed/
    // removed manifest -> tombstones + delta-only appends -> probes over
    // the grown stores. The oracle replays the FULL V2 RECOMPUTE in SQL
    // (BM25 scores, survivor components, the v1-centroid IVF probe), so
    // the hash match IS the incremental == recompute proof. Only delta
    // docs are ever re-read/re-signed/re-tokenized; store-side work is
    // index-sized, never corpus-sized. See ext/IncrementalPipeline.scala.
    "train_incremental_e2e" -> ((s, d) =>
      graft.ext.IncrementalPipeline.lane(s, d)),

    "train_bpe_apply_learned" -> ((s, d) => {
      import graft.functions.Bpe
      val words = Tables.documents(s, d)
        .select(explode(TA.tokens(col("text"))).as("word"))
        .groupBy(col("word")).agg(count(lit(1)).cast("long").as("wc"))
        .localCheckpoint()
      Dedup.rotateCheckpoints("train_bpe_apply_learned", words)
      var merges = Vector.empty[(String, String)]
      for (_ <- 0 until 8) {
        val toksCol =
          if (merges.isEmpty) filter(split(col("word"), ""), t => length(t) > 0)
          else Bpe.bpe_encode(col("word"), Bpe.BpeTable(merges))
        words.select(col("wc"), toksCol.as("t"))
          .filter(size(col("t")) >= 2)
          .select(col("wc"), explode(expr(
            "transform(sequence(0, size(t) - 2), j -> struct(t[j] AS l, t[j + 1] AS r))")).as("p"))
          .groupBy(col("p.l").as("l"), col("p.r").as("r"))
          .agg(sum(col("wc")).as("cnt"))
          .orderBy(desc("cnt"), col("l"), col("r"))
          .limit(1).collect()
          .headOption.foreach(row => merges = merges :+ (row.getString(0) -> row.getString(1)))
      }
      val vocabNt = words.select(col("word"),
        size(Bpe.bpe_encode(col("word"), Bpe.BpeTable(merges))).cast("long").as("nt"))
      val perDoc = Tables.documents(s, d)
        .select(col("doc_id"), explode(TA.tokens(col("text"))).as("word"))
        .join(broadcast(vocabNt), "word")
        .groupBy(col("doc_id"))
        .agg(sum(col("nt")).as("n_bpe_tokens"), count(lit(1)).cast("long").as("n_words"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"),
          coalesce(col("n_words"), lit(0L)).as("n_words"),
          coalesce(round(col("n_bpe_tokens").cast("double") / col("n_words"), 4),
            lit(0.0)).as("fertility"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    "train_pack_ffd" -> ((s, d) => {
      graft.ext.Sampling.packFirstFitDecreasing(
          Tables.documents(s, d), "doc_id",
          TA.tokenCount(col("text")), capacity = 256L, nShards = 16)
        .orderBy(col("shard"))
    }),

    // Concat-and-chunk packing BUDGETED IN BPE TOKENS — what a real
    // pre-training pipeline packs by (whitespace counts under-count by the
    // subword factor). Same two-phase prefix sum as train_pack_concat;
    // only the token counter changes. Counts are FULL-document as of r14
    // (VERDICT r13 #4: a budget computed on a 120-char prefix is not a
    // production token budget) — segment-factorized encode, per-segment
    // oracle fold.
    "train_pack_bpe" -> ((s, d) => {
      import graft.functions.Bpe
      graft.ext.Sampling.packConcat(Tables.documents(s, d), "doc_id",
          size(Bpe.bpe_encode_full(col("text"), Bpe.fixtureTable)),
          budget = 512L)
        .select(col("id").as("doc_id"), col("n_tokens"), col("start_off"),
          col("pack_first"), col("pack_last"), col("packs_spanned"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Static mixture REWEIGHTING (the DoReMi-style domain-weight step done
    // closed-form): per language, current token share vs a uniform target
    // share; resampling weight = target/current clamped to [0.1, 10], and
    // the expected post-resampling token count. One aggregate + one 1-row
    // total broadcast — the knob a pre-training mixture is tuned with
    // before any sampler runs.
    "train_mixture_reweight" -> ((s, d) => {
      val perLang = Tables.documents(s, d)
        .select(col("lang"), TA.tokenCount(col("text")).cast("long").as("nt"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
      val total = perLang.agg(sum(col("n_tokens")).as("__tot"),
        count(lit(1)).as("__n_langs"))
      perLang.crossJoin(broadcast(total))
        .withColumn("current_share",
          round(col("n_tokens").cast("double") / col("__tot"), 6))
        // a ZERO-token language gets the max upweight explicitly: Spark's
        // double /0 → Infinity → clamp, but DuckDB's double /0 is NULL, so
        // the branch must be taken BEFORE the division on both sides
        .withColumn("weight",
          when(col("n_tokens") === 0, lit(10.0)).otherwise(
            round(least(lit(10.0), greatest(lit(0.1),
              (lit(1.0) / col("__n_langs")) /
                (col("n_tokens").cast("double") / col("__tot")))), 6)))
        .select(col("lang"), col("n_docs"), col("n_tokens"),
          col("current_share"), col("weight"),
          round(col("n_tokens") * col("weight"), 2).as("expected_tokens"))
        .orderBy(col("lang"))
    }),

    "train_token_budget_mix" -> ((s, d) => {
      val kept = graft.ext.Sampling.tokenBudgetSample(
        Tables.documents(s, d), "lang", "doc_id",
        TA.tokenCount(col("text")), budgets = Map("en" -> 5000L),
        defaultBudget = 2000L)
      kept.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs_kept"),
          sum(col("__nt")).as("tokens_kept"),
          max(col("__budget")).as("budget"),
          round(sum(col("__nt")).cast("double") / max(col("__budget")), 4)
            .as("fill"))
        .orderBy(col("lang"))
    }),

    // End-to-end quality filter: keep only exact-dedup survivors whose
    // composite quality clears the bar — the canonical select-what-to-train-on
    // pipeline (fingerprint dedup ∘ quality score), one shuffle each side.
    "train_quality_filter" -> ((s, d) => {
      val stats = TA.textStatsFrame(Tables.documents(s, d), "text", "doc_id")
        .select(col("id").as("doc_id"), col("quality"), col("n_tokens"))
      val survivors = Dedup.exactGroups(Tables.documents(s, d), "text", "doc_id")
        .select(col("survivor_id").as("doc_id"))
      stats.join(survivors, "doc_id")
        .filter(col("quality") >= 0.5)
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Per-source diversity cap — the domain-cap step every web-crawl
    // mixture runs (keep the best K docs per domain so no source
    // dominates): rank within source by (quality desc, doc_id), keep
    // rank <= 20. One window per source — frame bounded by docs-per-
    // source, the natural partitioning at crawl scale.
    "train_source_cap" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val stats = TA.textStatsFrame(Tables.documents(s, d), "text", "doc_id")
        .select(col("id").as("doc_id"), col("quality"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("quality").desc, col("doc_id"))
      Tables.documents(s, d).select(col("doc_id"), col("source"))
        .join(stats, "doc_id")
        .withColumn("src_rank", row_number().over(w))
        .withColumn("kept", col("src_rank") <= 20)
        .select(col("doc_id"), col("source"), col("quality"),
          col("src_rank"), col("kept"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Train/eval n-gram decontamination: eval set = every 97th doc, train =
    // the rest; a train doc is contaminated when it shares any distinct
    // 5-gram with eval. Eval hashes broadcast; train streams through one
    // explode + semi-join + per-doc count. FNV basis -> the oracle replays
    // the full pass (shingles, hash, join, count) in SQL.
    "train_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contamination(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "text", "doc_id", n = 5)
        .select(col("id").as("doc_id"), col("n_shared"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Containment-SCORED decontamination: beside the shared-gram count,
    // the per-doc ratio |T∩E|/|T| a drop-vs-keep policy thresholds — the
    // asymmetric measure that catches a short eval doc quoted inside a
    // long train doc where symmetric Jaccard would not. Same broadcast
    // eval-hash set, one pass over the train gram stream, every train doc
    // reported.
    "train_contamination_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contaminationScored(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "text", "doc_id", n = 5)
        .select(col("id").as("doc_id"), col("n_grams"), col("n_shared"),
          col("containment"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Dataset card: the per-(lang, source) summary a data release ships —
    // doc/token counts, mean doc length, exact-duplicate rate (docs whose
    // normalized fingerprint appears more than once corpus-wide). One
    // explode-free token count + one fingerprint aggregate, broadcast
    // joined; every metric integer-derived before its round-4 fence.
    "train_dataset_card" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .withColumn("nt", TA.tokenCount(col("text")).cast("long"))
        .withColumn("fp", TA.fingerprint(col("text")))
      // per-fp multiplicity as a WINDOW (one fp-keyed exchange): the set of
      // duplicated fingerprints is corpus-scale on a duplicate-heavy corpus,
      // so it must never ride a broadcast
      docs
        .withColumn("__dup",
          when(count(lit(1)).over(Window.partitionBy(col("fp"))) > 1, 1))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nt")).as("n_tokens"),
          round(sum(col("nt")).cast("double") / count(lit(1)), 4)
            .as("avg_doc_tokens"),
          sum(when(col("__dup").isNotNull, 1L).otherwise(0L)).as("n_dup_docs"),
          round(sum(when(col("__dup").isNotNull, 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 4).as("dup_rate"))
        .orderBy(col("lang"), col("source"))
    }),

    // Leakage-safe negative sampling: 4 deterministic pseudo-random
    // negatives per anchor on the dense id ring, with negatives from the
    // anchor's near-dup cluster DROPPED (a paraphrase of the anchor is a
    // false negative) — reads the same persisted component store as the
    // survivor/split lanes. Pure column algebra over the portable FNV
    // draw; zero shuffles beyond the two broadcast cluster joins.
    "train_negative_pairs" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val comps = Dedup.componentStore(docs, "text", "doc_id", compStorePath(d))
      graft.ext.Sampling.negativePairs(docs, "doc_id", k = 4,
          components = Some(comps.select(col("id"), col("label"))))
        .orderBy(col("anchor_id"), col("draw"))
    }),

    // END-TO-END training-data pipeline — the composition a real corpus
    // build runs, as ONE lane: near-dup survivor election (persisted
    // component store, shared with the survivor/split lanes) -> quality
    // gate -> train/eval decontamination -> stratified mixture sample ->
    // per-language corpus stats. Every stage is an operator with its own
    // triple-green lane; this proves they compose (the oracle replays the
    // whole chain in one recursive-CTE SQL statement). Scale shape: the
    // chain reuses the once-per-corpus component store, the eval hash set
    // broadcasts, quality/sampling are per-row projections — no stage adds
    // an unbounded structure.
    "train_e2e_pipeline" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val comps = Dedup.componentStore(docs, "text", "doc_id", compStorePath(d))
      val survivors = docs
        .join(comps.select(col("id").as("doc_id"), col("label")), Seq("doc_id"), "left")
        .filter(coalesce(col("label"), col("doc_id")) === col("doc_id"))
        .drop("label")
      val trainPool = survivors.filter(col("doc_id") % 97 =!= 0)
      val contaminated = Dedup.contamination(trainPool,
          docs.filter(col("doc_id") % 97 === 0), "text", "doc_id", n = 5)
        .select(col("id").as("doc_id"))
      val quality = TA.textStatsFrame(docs, "text", "doc_id")
        .select(col("id").as("doc_id"), col("quality"), col("n_tokens"))
        .filter(col("quality") >= 0.5)
      val clean = trainPool.select(col("doc_id"), col("lang"))
        .join(quality, "doc_id")
        .join(contaminated, Seq("doc_id"), "left_anti")
      graft.ext.Sampling.stratifiedSample(clean, "lang", "doc_id",
          Map("en" -> 0.25, "zh" -> 0.5))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens_total"),
          round(sum(col("quality")), 2).as("quality_sum"))
        .orderBy(col("lang"))
    }),

    // LEAKAGE-SAFE train/valid/test split: hash the near-dup CLUSTER id,
    // not the doc id — with a doc-id split, a near-duplicate of a training
    // document lands in eval ~10% of the time and the benchmark is
    // contaminated. Reads the SAME component store as the survivor
    // election (the chain runs once per corpus); singletons hash their own
    // id (identical to the plain split for unique docs).
    "train_split_by_cluster" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val comps = Dedup.componentStore(docs, "text", "doc_id", compStorePath(d))
      docs.select(col("doc_id"))
        .join(comps.select(col("id").as("doc_id"), col("label")), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
        .withColumn("split", graft.ext.Sampling.hashSplit(col("cluster_id")))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Curriculum phasing: docs split easy→hard into 4 phases by Flesch
    // QUANTILE CUTPOINTS (a 3-value broadcast — not a global ntile sort,
    // which would funnel the corpus through one partition at scale), each
    // phase deterministically shuffled by the seeded-FNV fence; the
    // order-sensitive checksum Σ doc_id·rank pins the EXACT within-phase
    // order cross-engine, not just the membership.
    "train_curriculum_buckets" -> ((s, d) => {
      val W = org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .withColumn("__f", coalesce(TA.fleschScore(col("text")), lit(0.0)))
      val cuts = docs.agg(
        expr("percentile(__f, 0.25)").as("c1"),
        expr("percentile(__f, 0.5)").as("c2"),
        expr("percentile(__f, 0.75)").as("c3"))
      val phased = docs.crossJoin(broadcast(cuts)).withColumn("phase",
        when(col("__f") >= col("c3"), 1)
          .when(col("__f") >= col("c2"), 2)
          .when(col("__f") >= col("c1"), 3)
          .otherwise(4))
      val shuffled = phased.withColumn("__key", graft.functions.Fnv.fnv1a64(
          concat(lit("cur:"), col("doc_id").cast("string"))))
        .withColumn("__rn", row_number().over(
          W.partitionBy(col("phase")).orderBy(col("__key"), col("doc_id"))))
      shuffled.groupBy(col("phase")).agg(
          count(lit(1)).as("n_docs"),
          round(avg(col("__f")), 4).as("mean_flesch"),
          round(min(col("__f")), 4).as("min_flesch"),
          round(max(col("__f")), 4).as("max_flesch"),
          sum(col("doc_id") * col("__rn")).as("order_checksum"))
        .orderBy(col("phase"))
    }),

    // Sequence-length bucketing audit: docs binned into fixed power-of-two
    // token-length buckets (integer threshold compares — no log2/pow), with
    // the padding waste a batcher padding to the bucket cap would pay. The
    // batch-shape planning readout for training-throughput tuning; pure
    // map-side classify + one tiny aggregate.
    "train_length_buckets" -> ((s, d) => {
      val caps = Seq(64L, 128L, 256L, 512L, 1024L, 2048L, 4096L, 8192L,
        16384L, 32768L, 65536L)
      val n = TA.tokenCount(col("text")).cast("long")
      // docs beyond the largest cap land in a bucket_cap = -1 overflow
      // row (they get chunked, not padded — padded_sum = token_sum there);
      // keeps the cap*count product overflow-free under ANSI mode
      val cap = caps.foldRight(lit(-1L): org.apache.spark.sql.Column) {
        (c, acc) => when(n <= c, lit(c)).otherwise(acc)
      }
      Tables.documents(s, d)
        .select(col("doc_id"), n.as("n_tokens"), cap.as("bucket_cap"))
        .groupBy(col("bucket_cap"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("token_sum"))
        .withColumn("padded_sum", when(col("bucket_cap") > 0,
          col("bucket_cap") * col("n_docs")).otherwise(col("token_sum")))
        .withColumn("waste_ratio", round(lit(1.0)
          - col("token_sum").cast("double") / col("padded_sum"), 6))
        .orderBy(col("bucket_cap"))
    }),

    // Soft-dedup training weights: each doc in a near-dup component gets
    // weight 1/|component| (singletons 1.0) — the standard repetition
    // counter-bias for training mixtures, composed from the proven
    // component machinery.
    "train_cluster_weights" -> ((s, d) => {
      // the slice feeds both sides of the pair join AND the label
      // join-back — checkpoint so embeddings is scanned ONCE
      val emb100 = Tables.embeddings(s, d).filter(col("vec_id") < 100)
        .localCheckpoint()
      Dedup.rotateCheckpoints("train_cluster_weights_emb", emb100)
      val edges = Similarity.cosineNearDupPairs(emb100, "vec_id", "embedding",
        threshold = 0.3)
      val comps = Dedup.connectedComponents(edges.select(col("id1"), col("id2")))
      Dedup.rotateCheckpoints("train_cluster_weights", comps)
      val lab = emb100.select(col("vec_id"))
        .join(comps.select(col("id").as("vec_id"), col("label")),
          Seq("vec_id"), "left")
        .withColumn("cluster", coalesce(col("label"), col("vec_id")))
      val sizes = lab.groupBy(col("cluster")).agg(count(lit(1)).as("n_members"))
      lab.join(sizes, "cluster")
        .select(col("vec_id"), col("cluster"), col("n_members"),
          round(lit(1.0) / col("n_members"), 6).as("weight"))
        .orderBy(col("vec_id"))
    }),
  )

  def oracles: Map[String, String] = Map(

    // Centroid-classifier replay: identical train split, identical rounded
    // DECIMAL profile (sparkRound keeps the 9-dp rounding Spark-identical),
    // exact decimal dot product, argmax with the same (score DESC, plang)
    // tie order.
    "train_centroid_classifier" ->
      s"""WITH wx AS (SELECT doc_id, source, unnest($toks) AS w FROM documents),
         |tr AS (SELECT * FROM wx WHERE doc_id % 40 < 20),
         |cnt AS (SELECT source AS psrc, w, count(*) AS c FROM tr GROUP BY 1, 2),
         |tot AS (SELECT source AS psrc, count(*) AS n FROM tr GROUP BY 1),
         |prof AS (SELECT psrc, w,
         |    CAST(${sparkRound("c::DOUBLE / n", 9)} AS DECIMAL(38,9)) AS p
         |  FROM cnt JOIN tot USING (psrc)),
         |te AS (SELECT doc_id, w FROM wx WHERE doc_id % 40 >= 20),
         |sc AS (SELECT doc_id, psrc, sum(p) AS score
         |       FROM te JOIN prof USING (w) GROUP BY 1, 2),
         |td AS (SELECT doc_id, source AS true_source FROM documents WHERE doc_id % 40 >= 20),
         |cls AS (SELECT DISTINCT source AS psrc FROM documents),
         |fl AS (SELECT td.doc_id, td.true_source, l.psrc,
         |         coalesce(sc.score, CAST(0 AS DECIMAL(38,9))) AS score
         |       FROM td CROSS JOIN cls l
         |       LEFT JOIN sc ON sc.doc_id = td.doc_id AND sc.psrc = l.psrc),
         |rk AS (SELECT *, row_number() OVER
         |         (PARTITION BY doc_id ORDER BY score DESC, psrc) AS rn FROM fl)
         |SELECT doc_id, true_source, psrc AS pred_source,
         |  true_source = psrc AS correct
         |FROM rk WHERE rn = 1 ORDER BY doc_id""".stripMargin,

    // Full-v2-recompute replay of the delta loop: the v2 corpus as a
    // subquery through the SAME bm25/minhash CTE chains the single-store
    // oracles use, the recursive component closure, and the v1-centroid
    // IVF assignment over v2 — three sections in one frame. A value drift
    // anywhere in tombstoning, generation stamping, negative globals
    // partials, or append-under-stored-centroids hash-mismatches here.
    "train_incremental_e2e" -> {
      val v2src = "(SELECT doc_id, CASE WHEN doc_id % 11 = 0 " +
        "THEN text || ' rev2' ELSE text END AS text " +
        "FROM documents WHERE doc_id % 13 <> 7)"
      s"""WITH RECURSIVE
         |${bm25ScoredCtesBody(v2src)},
         |${minhashPairsCtesBody(v2src)},
         |sym AS (SELECT id1 AS a, id2 AS b FROM pairs
         |        UNION SELECT id2, id1 FROM pairs),
         |reach(a, r) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
         |  UNION
         |  SELECT sym.a, reach.r FROM sym JOIN reach ON sym.b = reach.a),
         |comp AS (SELECT a, min(r) AS label FROM reach GROUP BY a),
         |v2ids AS (SELECT doc_id FROM documents WHERE doc_id % 13 <> 7),
         |$ivfE2eCtesBody
         |SELECT part, k, id, score FROM (
         |  SELECT 'bm25' AS part, 'spark window join' AS k, doc_id AS id, score
         |  FROM (SELECT doc_id, score FROM scored
         |        ORDER BY score DESC, doc_id LIMIT 20)
         |  UNION ALL
         |  SELECT 'survivor', '', d.doc_id,
         |    CAST(coalesce(c.label, d.doc_id) AS DOUBLE)
         |  FROM v2ids d LEFT JOIN comp c ON c.a = d.doc_id
         |  UNION ALL
         |  SELECT 'ivf', 'q1', vec_id, cos FROM (
         |    SELECT a.vec_id,
         |      ${sparkRound("list_cosine_similarity(a.v, q.qv)", 6)} AS cos
         |    FROM assign a, q
         |    WHERE a.cell IN (SELECT cid FROM probe) AND a.vec_id != 1
         |    ORDER BY cos DESC, vec_id LIMIT 10)
         |) ORDER BY part, k, id""".stripMargin
    },

    // Decontamination replay: same 5-gram shingles, same FNV-1a hashes,
    // same distinct-per-doc + eval-set join + per-doc count.
    "train_decontaminate" ->
      s"""WITH docs AS (SELECT doc_id, $toks AS tk FROM documents),
         |g AS (SELECT doc_id, unnest(list_distinct(${shingleSqlN(5)})) AS s FROM docs),
         |h AS (SELECT doc_id, ${signed64(fnvSql("s"))} AS h FROM g),
         |ev AS (SELECT DISTINCT h FROM h WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, h FROM h WHERE doc_id % 97 <> 0)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM tr JOIN ev USING (h) GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "train_contamination_score" ->
      s"""WITH docs AS (SELECT doc_id, $toks AS tk FROM documents),
         |g AS (SELECT doc_id, unnest(list_distinct(${shingleSqlN(5)})) AS s FROM docs),
         |h AS (SELECT doc_id, ${signed64(fnvSql("s"))} AS h FROM g),
         |ev AS (SELECT DISTINCT h FROM h WHERE doc_id % 97 = 0),
         |tr AS (SELECT doc_id, CASE WHEN ev.h IS NULL THEN 0 ELSE 1 END AS sh
         |       FROM h LEFT JOIN ev USING (h) WHERE doc_id % 97 <> 0)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(sh) AS BIGINT) AS n_shared,
         |  ${sparkRound("CAST(sum(sh) AS DOUBLE) / count(*)", 6)} AS containment
         |FROM tr GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "train_dataset_card" ->
      s"""WITH d0 AS (SELECT lang, source,
         |    CAST(len($toks) AS BIGINT) AS nt,
         |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |dups AS (SELECT fp FROM d0 GROUP BY fp HAVING count(*) > 1)
         |SELECT lang, source, count(*) AS n_docs,
         |  CAST(sum(nt) AS BIGINT) AS n_tokens,
         |  ${sparkRound("CAST(sum(nt) AS DOUBLE) / count(*)", 4)} AS avg_doc_tokens,
         |  CAST(sum(CASE WHEN dups.fp IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dup_docs,
         |  ${sparkRound("CAST(sum(CASE WHEN dups.fp IS NULL THEN 0 ELSE 1 END) AS DOUBLE) / count(*)", 4)} AS dup_rate
         |FROM d0 LEFT JOIN dups USING (fp)
         |GROUP BY lang, source ORDER BY lang, source""".stripMargin,

    // Cluster-keyed split: the survivors' transitive closure feeding the
    // same md5 fences as train_split_hash, keyed on the cluster id.
    "train_split_by_cluster" ->
      s"""${minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |sym AS (SELECT id1 AS a, id2 AS b FROM pairs
         |        UNION SELECT id2, id1 FROM pairs),
         |reach(a, r) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
         |  UNION
         |  SELECT sym.a, reach.r FROM sym JOIN reach ON sym.b = reach.a),
         |comp AS (SELECT a, min(r) AS label FROM reach GROUP BY a),
         |cl AS (SELECT d.doc_id,
         |         CAST(coalesce(comp.label, d.doc_id) AS BIGINT) AS cluster_id
         |       FROM documents d LEFT JOIN comp ON comp.a = d.doc_id)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN substr(md5('split:' || CAST(cluster_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
         |       WHEN substr(md5('split:' || CAST(cluster_id AS VARCHAR)), 1, 2) < 'f3' THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM cl ORDER BY doc_id""".stripMargin,

    "train_shuffle_shard" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    md5('shuf:' || CAST(doc_id AS VARCHAR)) AS k,
         |    substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 2) AS stratum,
         |    CAST(len($toks) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT doc_id, stratum,
         |  CAST(floor((sum(n_tokens) OVER (PARTITION BY stratum ORDER BY k)
         |              - n_tokens) / $shardBudget.0) AS BIGINT) AS shard,
         |  n_tokens
         |FROM b ORDER BY doc_id""".stripMargin,

    "train_pack_stats" ->
      s"""WITH b AS (
         |  SELECT doc_id,
         |    md5('shuf:' || CAST(doc_id AS VARCHAR)) AS k,
         |    substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 2) AS stratum,
         |    CAST(len($toks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |s AS (
         |  SELECT stratum,
         |    CAST(floor((sum(n_tokens) OVER (PARTITION BY stratum ORDER BY k)
         |                - n_tokens) / $shardBudget.0) AS BIGINT) AS shard,
         |    n_tokens
         |  FROM b)
         |SELECT stratum, shard, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS shard_tokens,
         |  ${OracleSql.sparkRound(s"CAST(sum(n_tokens) AS DOUBLE) / $shardBudget.0", 4)} AS fill
         |FROM s GROUP BY 1, 2 ORDER BY stratum, shard""".stripMargin,

    // per-stratum budget cut replayed as the plain window cumsum
    // FFD replay: same seeded-FNV shard, same (nt DESC, id) order, same
    // first-bin-with-room rule — list_position over the transformed bin
    // loads finds the first fit; NULL opens a new bin.
    "train_pack_ffd" ->
      s"""WITH RECURSIVE base AS (
         |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS nt,
         |    CAST(((${signed64(fnvSql("'ffd:' || CAST(doc_id AS VARCHAR)"))} % 16) + 16) % 16 AS INT) AS shard
         |  FROM documents),
         |d AS (SELECT *, row_number() OVER (PARTITION BY shard
         |        ORDER BY nt DESC, doc_id) AS rn
         |      FROM base WHERE nt > 0),
         |fold(shard, rn, bins) AS (
         |  SELECT shard, CAST(0 AS BIGINT), CAST([] AS BIGINT[])
         |  FROM (SELECT DISTINCT shard FROM d)
         |  UNION ALL
         |  SELECT f.shard, f.rn + 1,
         |    CASE WHEN p.idx IS NULL OR p.idx = 0
         |         THEN list_append(f.bins, dd.nt)
         |         ELSE list_concat(list_concat(
         |           f.bins[:p.idx - 1], [f.bins[p.idx] + dd.nt]),
         |           f.bins[p.idx + 1:]) END
         |  FROM fold f
         |  JOIN d dd ON dd.shard = f.shard AND dd.rn = f.rn + 1
         |  CROSS JOIN LATERAL (SELECT list_position(
         |      list_transform(f.bins, b -> b + dd.nt <= 256), true) AS idx) p),
         |lastrn AS (SELECT shard, max(rn) AS mrn FROM fold GROUP BY shard),
         |fin AS (SELECT f.shard, CAST(len(f.bins) AS BIGINT) AS n_bins
         |        FROM fold f JOIN lastrn l ON f.shard = l.shard AND f.rn = l.mrn),
         |agg AS (SELECT shard, count(*) AS n_docs,
         |          CAST(sum(nt) AS BIGINT) AS n_tokens
         |        FROM d GROUP BY shard)
         |SELECT a.shard, a.n_docs, a.n_tokens, fin.n_bins,
         |  ${OracleSql.sparkRound("CAST(a.n_tokens AS DOUBLE) / (fin.n_bins * 256)", 6)} AS fill
         |FROM agg a JOIN fin ON a.shard = fin.shard
         |ORDER BY a.shard""".stripMargin,

    // Reweight replay: same aggregate + share/weight arithmetic in double.
    "train_mixture_reweight" ->
      s"""WITH pl AS (SELECT lang, count(*) AS n_docs,
         |    CAST(sum(len($toks)) AS BIGINT) AS n_tokens
         |  FROM documents GROUP BY lang),
         |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
         |        count(*) AS n_langs FROM pl),
         |w AS (SELECT pl.*, t.tot, t.n_langs,
         |    least(10.0::DOUBLE, greatest(0.1::DOUBLE,
         |      (CAST(1 AS DOUBLE) / n_langs) /
         |        (CAST(n_tokens AS DOUBLE) / tot))) AS wraw
         |  FROM pl, t),
         |w2 AS (SELECT *, CASE WHEN n_tokens = 0 THEN 10.0
         |         ELSE ${OracleSql.sparkRound("wraw", 6)} END AS weight
         |  FROM w)
         |SELECT lang, n_docs, n_tokens,
         |  ${OracleSql.sparkRound("CAST(n_tokens AS DOUBLE) / tot", 6)} AS current_share,
         |  weight,
         |  ${OracleSql.sparkRound("n_tokens * weight", 2)} AS expected_tokens
         |FROM w2 ORDER BY lang""".stripMargin,

    "train_token_budget_mix" ->
      s"""WITH b AS (
         |  SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS nt,
         |    substr(md5('budget:' || CAST(doc_id AS VARCHAR)), 1, 4) AS k
         |  FROM documents),
         |c AS (
         |  SELECT lang, nt,
         |    CASE WHEN lang = 'en' THEN 5000 ELSE 2000 END AS budget,
         |    sum(nt) OVER (PARTITION BY lang ORDER BY k, doc_id) - nt AS start
         |  FROM b),
         |kept AS (SELECT * FROM c WHERE start < budget)
         |SELECT lang, count(*) AS n_docs_kept,
         |  CAST(sum(nt) AS BIGINT) AS tokens_kept,
         |  CAST(max(budget) AS BIGINT) AS budget,
         |  ${sparkRound("CAST(sum(nt) AS DOUBLE) / max(budget)", 4)} AS fill
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,

    // the two-phase prefix sum must equal the plain global window cumsum
    "train_pack_concat" ->
      s"""WITH b AS (
         |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens FROM documents),
         |c AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS BIGINT) AS start_off
         |  FROM b)
         |SELECT doc_id, n_tokens, start_off,
         |  CAST(floor(start_off / 2048.0) AS BIGINT) AS pack_first,
         |  CAST(floor((start_off + greatest(n_tokens, 1) - 1) / 2048.0) AS BIGINT) AS pack_last,
         |  CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(floor((start_off + greatest(n_tokens, 1) - 1) / 2048.0) AS BIGINT)
         |            - CAST(floor(start_off / 2048.0) AS BIGINT) + 1 END AS packs_spanned
         |FROM c ORDER BY doc_id""".stripMargin,

    // FULL-document BPE counts (per-segment fold) through the
    // train_pack_concat window replay, budget 512.
    "train_pack_bpe" ->
      s"""$bpeFoldCtesFull,
         |b AS (SELECT d.doc_id,
         |        CAST(coalesce(len(p.toks), 0) AS BIGINT) AS n_tokens
         |      FROM documents d LEFT JOIN bpe p USING (doc_id)),
         |c AS (SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens AS BIGINT) AS start_off
         |  FROM b)
         |SELECT doc_id, n_tokens, start_off,
         |  CAST(floor(start_off / 512.0) AS BIGINT) AS pack_first,
         |  CAST(floor((start_off + greatest(n_tokens, 1) - 1) / 512.0) AS BIGINT) AS pack_last,
         |  CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
         |       ELSE CAST(floor((start_off + greatest(n_tokens, 1) - 1) / 512.0) AS BIGINT)
         |            - CAST(floor(start_off / 512.0) AS BIGINT) + 1 END AS packs_spanned
         |FROM c ORDER BY doc_id""".stripMargin,

    "train_split_hash" ->
      """SELECT doc_id,
        |  substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
        |  CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
        |         THEN 'train'
        |       WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
        |         THEN 'valid'
        |       ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    // The four magic masks are 0x00FF00FF / 0x0F0F0F0F / 0x33333333 /
    // 0x55555555 in decimal; the CTE chain replays Layout.spreadBits16
    // stage by stage.
    "layout_zorder" ->
      """WITH pts AS (SELECT CAST(floor(value) AS BIGINT) AS x,
        |                    CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS y FROM events),
        |s1 AS (SELECT x, y, ((x | (x << 8)) & 16711935) AS xa,
        |                    ((y | (y << 8)) & 16711935) AS ya FROM pts),
        |s2 AS (SELECT x, y, ((xa | (xa << 4)) & 252645135) AS xb,
        |                    ((ya | (ya << 4)) & 252645135) AS yb FROM s1),
        |s3 AS (SELECT x, y, ((xb | (xb << 2)) & 858993459) AS xc,
        |                    ((yb | (yb << 2)) & 858993459) AS yc FROM s2),
        |s4 AS (SELECT x, y, ((xc | (xc << 1)) & 1431655765) AS xs,
        |                    ((yc | (yc << 1)) & 1431655765) AS ys FROM s3)
        |SELECT (xs | (ys << 1)) >> 10 AS zb, count(*) AS n,
        |  min(x) AS min_x, max(x) AS max_x, min(y) AS min_y, max(y) AS max_y
        |FROM s4 GROUP BY 1 ORDER BY 1""".stripMargin,

    // rates: en 0.25 -> '4000', zh 0.5 -> '8000', default 1.0 -> 'g'
    // (sorts above every hex digit = keep all; 'ffff' would drop the top
    // draw). Thresholds replicate Sampling.thresholdHex exactly.
    "train_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 4) <
        |  CASE WHEN lang = 'en' THEN '4000'
        |       WHEN lang = 'zh' THEN '8000' ELSE 'g' END
        |ORDER BY doc_id""".stripMargin,

    "train_sample_per_lang" ->
      """SELECT doc_id, lang FROM (
        |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
        |    ORDER BY substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 4), doc_id) AS rk
        |  FROM documents) WHERE rk <= 40 ORDER BY doc_id""".stripMargin,

    // Rebalance replayed end-to-end: stratum counts, the (N/k)/n_s rate in
    // the same IEEE division order, the weightedSample clamp + hex fences,
    // then before/after counts.
    "train_mixture_rebalance" ->
      """WITH nb AS (SELECT lang, count(*) AS n_before FROM documents GROUP BY lang),
        |g AS (SELECT count(*) AS n_tot, count(DISTINCT lang) AS k FROM documents),
        |r AS (SELECT lang, least(1.0, (n_tot::DOUBLE / k) / n_before) AS rate
        |      FROM nb CROSS JOIN g),
        |kept AS (SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
        |  WHERE substr(md5('strat:' || CAST(d.doc_id AS VARCHAR)), 1, 4) <
        |    CASE WHEN greatest(0.0, least(1.0, rate)) >= 1.0 THEN 'g'
        |         ELSE lpad(lower(hex(CAST(floor(
        |           greatest(0.0, least(1.0, rate)) * 65536) AS BIGINT))), 4, '0')
        |    END),
        |na AS (SELECT lang, count(*) AS n_after FROM kept GROUP BY lang)
        |SELECT nb.lang, nb.n_before, coalesce(na.n_after, 0) AS n_after
        |FROM nb LEFT JOIN na USING (lang) ORDER BY nb.lang""".stripMargin,

    // Temperature sampling replayed: stratum counts, 9-decimal sqrt
    // weights summed as exact DECIMALs (order-free), target shares, the
    // binding ratio t, the (t·q)/n rate in the same association order,
    // then the weightedSample fences and before/after counts.
    "train_temperature_sample" ->
      s"""WITH nb AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
         |w AS (SELECT lang, n, CAST(sum(n) OVER () AS BIGINT) AS n_tot FROM nb),
         |x AS (SELECT lang, n,
         |        CAST(${sparkRound("sqrt(n::DOUBLE / n_tot)", 9)} AS DECIMAL(38,9)) AS w9
         |      FROM w),
         |y AS (SELECT lang, n,
         |        CAST(w9 AS DOUBLE) / CAST(sum(w9) OVER () AS DOUBLE) AS q
         |      FROM x),
         |z AS (SELECT lang, n, q, min(n::DOUBLE / q) OVER () AS t FROM y),
         |r AS (SELECT lang, least(1.0, t * q / n::DOUBLE) AS rate FROM z),
         |kept AS (SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
         |  WHERE substr(md5('strat:' || CAST(d.doc_id AS VARCHAR)), 1, 4) <
         |    CASE WHEN greatest(0.0, least(1.0, rate)) >= 1.0 THEN 'g'
         |         ELSE lpad(lower(hex(CAST(floor(
         |           greatest(0.0, least(1.0, rate)) * 65536) AS BIGINT))), 4, '0')
         |    END),
         |na AS (SELECT lang, count(*) AS n_after FROM kept GROUP BY lang)
         |SELECT nb.lang, nb.n AS n_before, coalesce(na.n_after, 0) AS n_after
         |FROM nb LEFT JOIN na USING (lang) ORDER BY nb.lang""".stripMargin,

    // Per-row threshold hex replicated exactly: clamp, floor(rate*65536),
    // 4-digit lower-case hex, 'g' sentinel at rate >= 1.
    "train_weighted_sample" ->
      """SELECT doc_id, n_chars FROM documents
        |WHERE substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 4) <
        |  CASE WHEN greatest(0.0, least(1.0, n_chars::DOUBLE / 500.0)) >= 1.0 THEN 'g'
        |       ELSE lpad(lower(hex(CAST(floor(
        |         greatest(0.0, least(1.0, n_chars::DOUBLE / 500.0)) * 65536) AS BIGINT))), 4, '0')
        |  END
        |ORDER BY doc_id""".stripMargin,

    // A-ES replay: same seeded-FNV u ∈ (0,1] (52-bit draw), same
    // ln(u)/(nt+1) key Spark-rounded to 12 decimals, same per-stratum
    // row_number with id tie-break
    "train_weighted_topk" ->
      s"""WITH b AS (SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS nt
         |           FROM documents),
         |h0 AS (SELECT doc_id, lang, nt,
         |         ${fnvSql("'aes:' || CAST(doc_id AS VARCHAR)")} AS h FROM b),
         |kx AS (SELECT doc_id, lang, nt,
         |         ${sparkRound(
              "ln(CAST((h % (1::HUGEINT << 52)) + 1 AS DOUBLE) / 4503599627370496.0) / (nt + 1)",
              12)} AS aes_key
         |       FROM h0),
         |r AS (SELECT doc_id, lang, nt,
         |        row_number() OVER (PARTITION BY lang
         |          ORDER BY aes_key DESC, doc_id) AS rank
         |      FROM kx)
         |SELECT lang, doc_id, nt AS n_tokens, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 20 ORDER BY lang, rank""".stripMargin,

    "train_quality_filter" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CASE WHEN length(text)=0 THEN 0.0
         |         ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)/length(text) END AS punct_ratio,
         |    CASE WHEN len($toks)=0 THEN 0.0
         |         ELSE CAST(len(list_filter($toks, x -> list_contains($enStops, x))) AS DOUBLE)/len($toks) END AS stop_ratio,
         |    CASE WHEN len($toks)=0 THEN 0.0
         |         ELSE CAST(list_aggregate(list_transform($toks, x -> length(x)), 'sum') AS DOUBLE)/len($toks) END AS mwl,
         |    length(text) AS n_len, CAST(len($toks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |q AS (SELECT doc_id, n_tokens,
         |        ${sparkRound(
                    """least(n_len/500.0, 1.0)*0.3 + least(stop_ratio*4.0, 1.0)*0.3
                      |          + (CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)*0.2
                      |          + greatest(0.0, 1.0 - punct_ratio*5.0)*0.2""".stripMargin, 4)} AS quality
         |      FROM f),
         |s AS (SELECT min(doc_id) AS doc_id FROM documents
         |      GROUP BY md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')))
         |SELECT q.doc_id, quality, n_tokens FROM q JOIN s USING (doc_id)
         |WHERE quality >= 0.5 ORDER BY doc_id""".stripMargin,

    // Per-source cap replay: the SAME quality formula, ranked within
    // source by (quality desc, doc_id) — the deterministic tiebreak both
    // engines share because quality is rounded before comparison.
    "train_source_cap" ->
      s"""WITH f AS (
         |  SELECT doc_id,
         |    CASE WHEN length(text)=0 THEN 0.0
         |         ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)/length(text) END AS punct_ratio,
         |    CASE WHEN len($toks)=0 THEN 0.0
         |         ELSE CAST(len(list_filter($toks, x -> list_contains($enStops, x))) AS DOUBLE)/len($toks) END AS stop_ratio,
         |    CASE WHEN len($toks)=0 THEN 0.0
         |         ELSE CAST(list_aggregate(list_transform($toks, x -> length(x)), 'sum') AS DOUBLE)/len($toks) END AS mwl,
         |    length(text) AS n_len
         |  FROM documents),
         |q AS (SELECT doc_id,
         |        ${sparkRound(
                    """least(n_len/500.0, 1.0)*0.3 + least(stop_ratio*4.0, 1.0)*0.3
                      |          + (CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)*0.2
                      |          + greatest(0.0, 1.0 - punct_ratio*5.0)*0.2""".stripMargin, 4)} AS quality
         |      FROM f)
         |SELECT q.doc_id, d.source, q.quality,
         |  CAST(row_number() OVER (PARTITION BY d.source
         |    ORDER BY q.quality DESC, q.doc_id) AS INT) AS src_rank,
         |  row_number() OVER (PARTITION BY d.source
         |    ORDER BY q.quality DESC, q.doc_id) <= 20 AS kept
         |FROM q JOIN documents d USING (doc_id) ORDER BY q.doc_id""".stripMargin,

    // Negative-pair replay: same FNV step arithmetic on the id ring, same
    // closure-derived cluster labels for the exclusion
    "train_negative_pairs" ->
      s"""${minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |sym AS (SELECT id1 AS a, id2 AS b FROM pairs
         |        UNION SELECT id2, id1 FROM pairs),
         |reach(a, r) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
         |  UNION
         |  SELECT sym.a, reach.r FROM sym JOIN reach ON sym.b = reach.a),
         |comp AS (SELECT a, min(r) AS label FROM reach GROUP BY a),
         |nn AS (SELECT count(*) AS n FROM documents),
         |dr AS (SELECT doc_id AS anchor_id, CAST(unnest(range(1, 5)) AS INT) AS draw
         |       FROM documents),
         |hv AS (SELECT anchor_id, draw,
         |         ${signed64(fnvSql("'neg:' || CAST(anchor_id AS VARCHAR) || ':' || CAST(draw AS VARCHAR)"))} AS h
         |       FROM dr),
         |neg AS (SELECT anchor_id, draw,
         |          (anchor_id + 1 + ((h % (n - 1)) + (n - 1)) % (n - 1)) % n AS neg_id
         |        FROM hv, nn)
         |SELECT neg.anchor_id, neg.draw, neg.neg_id
         |FROM neg
         |LEFT JOIN comp c1 ON c1.a = neg.anchor_id
         |LEFT JOIN comp c2 ON c2.a = neg.neg_id
         |WHERE coalesce(c1.label, neg.anchor_id) != coalesce(c2.label, neg.neg_id)
         |ORDER BY anchor_id, draw""".stripMargin,

    // The whole pipeline replayed in ONE statement: minhash pairs ->
    // closure -> survivors, 5-gram decontamination, the quality formula,
    // the stratified md5 fences, then the per-language rollup. Reuses the
    // shared minhash CTE prefix (which defines docs(doc_id, tk)).
    "train_e2e_pipeline" ->
      s"""${minhashPairsCtes.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |sym AS (SELECT id1 AS a, id2 AS b FROM pairs
         |        UNION SELECT id2, id1 FROM pairs),
         |reach(a, r) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
         |  UNION
         |  SELECT sym.a, reach.r FROM sym JOIN reach ON sym.b = reach.a),
         |comp AS (SELECT a, min(r) AS label FROM reach GROUP BY a),
         |surv AS (SELECT d.doc_id, d.lang FROM documents d
         |         LEFT JOIN comp ON comp.a = d.doc_id
         |         WHERE coalesce(comp.label, d.doc_id) = d.doc_id),
         |g5 AS (SELECT doc_id, unnest(list_distinct(${shingleSqlN(5)})) AS s5 FROM docs),
         |h5 AS (SELECT doc_id, ${signed64(fnvSql("s5"))} AS h FROM g5),
         |ev AS (SELECT DISTINCT h FROM h5 WHERE doc_id % 97 = 0),
         |cont AS (SELECT DISTINCT doc_id FROM h5 JOIN ev USING (h) WHERE doc_id % 97 <> 0),
         |f AS (
         |  SELECT doc_id,
         |    CASE WHEN length(text)=0 THEN 0.0
         |         ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)/length(text) END AS punct_ratio,
         |    CASE WHEN len($toks)=0 THEN 0.0
         |         ELSE CAST(len(list_filter($toks, x -> list_contains($enStops, x))) AS DOUBLE)/len($toks) END AS stop_ratio,
         |    CASE WHEN len($toks)=0 THEN 0.0
         |         ELSE CAST(list_aggregate(list_transform($toks, x -> length(x)), 'sum') AS DOUBLE)/len($toks) END AS mwl,
         |    length(text) AS n_len, CAST(len($toks) AS BIGINT) AS n_tokens
         |  FROM documents),
         |q AS (SELECT doc_id, n_tokens,
         |        ${sparkRound(
                    """least(n_len/500.0, 1.0)*0.3 + least(stop_ratio*4.0, 1.0)*0.3
                      |          + (CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)*0.2
                      |          + greatest(0.0, 1.0 - punct_ratio*5.0)*0.2""".stripMargin, 4)} AS quality
         |      FROM f),
         |kept AS (SELECT surv.doc_id, surv.lang, q.quality, q.n_tokens
         |         FROM surv JOIN q USING (doc_id)
         |         WHERE surv.doc_id % 97 <> 0
         |           AND q.quality >= 0.5
         |           AND surv.doc_id NOT IN (SELECT doc_id FROM cont)
         |           AND substr(md5('strat:' || CAST(surv.doc_id AS VARCHAR)), 1, 4) <
         |               CASE WHEN surv.lang = 'en' THEN '4000'
         |                    WHEN surv.lang = 'zh' THEN '8000' ELSE 'g' END)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens_total,
         |  ${sparkRound("sum(quality)", 2)} AS quality_sum
         |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,

    "train_curriculum_buckets" -> {
      val flesch =
        s"CASE WHEN len($toks) > 0 THEN $fleschRoundedSql ELSE 0.0 END"
      s"""WITH f AS (SELECT doc_id, $flesch AS fl FROM documents),
         |cuts AS (SELECT quantile_cont(fl, 0.25) AS c1,
         |                quantile_cont(fl, 0.5) AS c2,
         |                quantile_cont(fl, 0.75) AS c3
         |         FROM f),
         |ph AS (SELECT doc_id, fl,
         |         CASE WHEN fl >= c3 THEN 1
         |              WHEN fl >= c2 THEN 2
         |              WHEN fl >= c1 THEN 3
         |              ELSE 4 END AS phase
         |       FROM f, cuts),
         |sh AS (SELECT phase, doc_id, fl,
         |         row_number() OVER (PARTITION BY phase ORDER BY
         |           ${signed64(fnvSql("'cur:' || CAST(doc_id AS VARCHAR)"))}, doc_id) AS rn
         |       FROM ph)
         |SELECT phase, count(*) AS n_docs,
         |  ${sparkRound("avg(fl)", 4)} AS mean_flesch,
         |  round(min(fl), 4) AS min_flesch,
         |  round(max(fl), 4) AS max_flesch,
         |  CAST(sum(doc_id * rn) AS BIGINT) AS order_checksum
         |FROM sh GROUP BY phase ORDER BY phase""".stripMargin
    },

    // Length-bucket replay: same fixed power-of-two thresholds, same
    // overflow bucket semantics.
    "train_length_buckets" -> {
      val caps = Seq(64L, 128L, 256L, 512L, 1024L, 2048L, 4096L, 8192L,
        16384L, 32768L, 65536L)
      val caseSql = caps.map(c => s"WHEN n <= $c THEN CAST($c AS BIGINT)")
        .mkString(" ")
      s"""WITH t AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n FROM documents),
         |b AS (SELECT n, CASE $caseSql ELSE CAST(-1 AS BIGINT) END AS bucket_cap
         |      FROM t),
         |a AS (SELECT bucket_cap, CAST(count(*) AS BIGINT) AS n_docs,
         |        CAST(sum(n) AS BIGINT) AS token_sum
         |      FROM b GROUP BY bucket_cap)
         |SELECT bucket_cap, n_docs, token_sum,
         |  CASE WHEN bucket_cap > 0 THEN bucket_cap * n_docs
         |       ELSE token_sum END AS padded_sum,
         |  ${sparkRound(
           "1.0 - CAST(token_sum AS DOUBLE) / (CASE WHEN bucket_cap > 0 THEN bucket_cap * n_docs ELSE token_sum END)",
           6)} AS waste_ratio
         |FROM a ORDER BY bucket_cap""".stripMargin
    },

    // Cluster-weight replay: same closure as dedup_cluster_components,
    // singletons self-labeled, weight = 1/|cluster|.
    "train_cluster_weights" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
         |  FROM embeddings WHERE vec_id < 100),
         |nd AS (
         |  SELECT a.vec_id AS id1, b.vec_id AS id2
         |  FROM e a, e b WHERE a.vec_id < b.vec_id
         |    AND ${sparkRound("list_cosine_similarity(a.v, b.v)", 6)} >= 0.3),
         |sym AS (SELECT id1 AS a, id2 AS b FROM nd
         |        UNION SELECT id2, id1 FROM nd),
         |reach(a, r) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM sym)
         |  UNION
         |  SELECT sym.a, reach.r FROM sym JOIN reach ON sym.b = reach.a),
         |comp AS (SELECT a, CAST(min(r) AS BIGINT) AS label FROM reach GROUP BY a),
         |lab AS (SELECT e.vec_id, coalesce(comp.label, e.vec_id) AS cluster
         |        FROM e LEFT JOIN comp ON comp.a = e.vec_id),
         |sz AS (SELECT cluster, CAST(count(*) AS BIGINT) AS n_members
         |       FROM lab GROUP BY cluster)
         |SELECT vec_id, cluster, n_members,
         |  ${sparkRound("CAST(1 AS DOUBLE) / n_members", 6)} AS weight
         |FROM lab JOIN sz USING (cluster) ORDER BY vec_id""".stripMargin,
  )
}
