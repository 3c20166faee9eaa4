package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Hll, Multimodal, Ranking, Similarity, StoreCompaction, TextAnalysis => TA}
import ExtShared._

/** Text-analysis lanes (langid, quality, tokens, chunking, BPE encode, fingerprints).
  *
  * Split from the former monolithic Extensions.scala (registry unchanged:
  * [[Extensions.queries]] / [[Extensions.oracles]] concatenate the domain
  * objects). Oracle policy and citations live on [[Extensions]].
  */
private[graft] object ExtText {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- text analysis (oracle-checked; explode+agg scale path) ------------
    "text_token_stats" -> ((s, d) => {
      TA.textStatsFrame(Tables.documents(s, d), "text", "doc_id")
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_distinct"),
          col("avg_word_len"), col("n_chars_m"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    "text_quality" -> ((s, d) => {
      TA.textStatsFrame(Tables.documents(s, d), "text", "doc_id")
        .select(col("id").as("doc_id"), col("punct_ratio"), col("upper_ratio"),
          col("stop_ratio"), col("quality"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Code-vs-prose detection — the filter that routes source code out of
    // (or into) a text training mix: bracket/semicolon character density
    // plus code-keyword token share, folded into one score. Pure column
    // algebra fused into the scan; thresholds compare the ROUNDED score
    // so the verdict is a discrete grid both engines agree on.
    "text_code_detect" -> ((s, d) => {
      val kw = Seq("def", "class", "return", "import", "function", "var",
        "let", "const", "if", "else", "for", "while", "void", "int")
      val docs = Tables.documents(s, d)
      // ONE explode for token count + keyword hits (the Spark-4 HOF rule:
      // never evaluate the token array twice per row); char-level brace
      // density stays a scan-fused projection
      val tk = docs
        .select(col("doc_id"), explode_outer(TA.tokens(col("text"))).as("t"))
        .groupBy(col("doc_id"))
        .agg(count(col("t")).as("__ntk"),
          count_if(col("t").isInCollection(kw)).as("__kw"))
      val nch = length(col("text"))
      val braceRatio =
        (nch - length(regexp_replace(col("text"), "[{}()\\[\\];]", "")))
          .cast("double") / greatest(nch, lit(1)).cast("double")
      val kwRatio = col("__kw").cast("double") /
        greatest(col("__ntk"), lit(1L)).cast("double")
      val score = round(
        least(braceRatio * 20, lit(1.0)) * 0.5 +
          least(kwRatio * 8, lit(1.0)) * 0.5, 4)
      docs.join(tk, "doc_id")
        .select(col("doc_id"), nch.as("n_chars"),
          round(braceRatio, 4).as("brace_ratio"),
          round(kwRatio, 4).as("kw_ratio"),
          score.as("code_score"),
          (score >= 0.5).as("is_code"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Per-doc Shannon entropy of the word distribution — the third
    // degenerate-text signal beside repetition and quality (low entropy =
    // boilerplate/spam, suspiciously high = shredded junk). Computed as
    // H = ln(n) − (Σ c·ln c)/n over the per-(doc, word) counts, the exact
    // rearrangement that needs ONE explode + two aggregates and no
    // per-term division; round-6 fences the float sum order.
    "text_token_entropy" -> ((s, d) => {
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(TA.tokens(col("text"))).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      val perDoc = tf.groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
          sum(col("c") * log(col("c"))).as("__clc"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
            .otherwise(round(
              log(col("n_tokens")) - col("__clc") / col("n_tokens"), 6))
            .as("token_entropy"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // TF-IDF keyword extraction: each doc's top-3 terms by tf·idf with
    // smoothed idf = ln((N+1)/(df+1)) — the classic per-document keyword
    // summarizer. One explode into (doc, term) counts, a term-keyed df
    // aggregate joined back, a per-doc window top-k; ties break on the
    // term string so the pick is a pure function of the corpus.
    "text_tfidf_keywords" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tf = docs.select(col("doc_id"), explode(TA.tokens(col("text"))).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("t")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("__n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("t"))
      tf.join(dfreq, "t").crossJoin(broadcast(n))
        .withColumn("score", round(col("tf") *
          log((col("__n") + 1).cast("double") / (col("df") + 1)), 6))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("t").as("term"), col("score"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // Gopher-style quality GATE battery: word-count bounds, mean word
    // length, alpha-word fraction, distinct-stopword minimum, ellipsis
    // ratio — the pass/fail document filter a pre-training pipeline runs,
    // rolled up per language (zh fails the stopword gate wholesale, the
    // designed discrimination). One explode + one id-keyed aggregate.
    "text_quality_gates" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TA.gopherGates(docs, "text", "doc_id")
        .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          count_if(col("pass")).as("n_pass"),
          count_if(!col("gate_words")).as("fail_words"),
          count_if(!col("gate_mean_len")).as("fail_mean_len"),
          count_if(!col("gate_alpha")).as("fail_alpha"),
          count_if(!col("gate_stop")).as("fail_stop"),
          count_if(!col("gate_symbol")).as("fail_symbol"))
        .orderBy(col("lang"))
    }),

    // Gopher-style repetition signals: dup-word / top-word / top-bigram
    // fractions per document (the boilerplate detectors pre-training
    // filters key on). One explode, one exchange, codegen'd aggregates.
    "text_repetition" -> ((s, d) => {
      TA.repetitionFrame(Tables.documents(s, d), "text", "doc_id")
        .select(col("id").as("doc_id"), col("n_tokens"), col("n_distinct"),
          col("dup_word_frac"), col("top_word_frac"), col("top_bigram_frac"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Sliding token-window chunking (32-token windows, 8-token overlap):
    // the context-window prep step. Chunk geometry is per-row arithmetic
    // fused into the scan — no shuffle — and each chunk's md5 makes the
    // content cross-engine checkable without shipping text.
    "text_chunk_windows" -> ((s, d) => {
      TA.chunkFrame(Tables.documents(s, d), "text", "doc_id",
          chunkSize = 32, overlap = 8)
        .withColumnRenamed("id", "doc_id")
        .transform(sortedOnce(_, col("doc_id"), col("chunk_idx")))
    }),

    // TOKENIZER-UNIT context windows: the same sliding chunker cut in BPE
    // tokens — what an embedding/pre-training pipeline actually slices by,
    // since model context limits are tokenizer tokens, not words. Same
    // 120-char slice + fixture merge table as text_bpe_tokens; the oracle
    // composes the BPE merge-loop CTE with the window replay.
    "text_chunk_bpe" -> ((s, d) => {
      import graft.functions.Bpe
      TA.chunkFrameBy(Tables.documents(s, d),
          Bpe.bpe_encode(substring(col("text"), 1, 120), Bpe.fixtureTable),
          "doc_id", chunkSize = 32, overlap = 8)
        .withColumnRenamed("id", "doc_id")
        .transform(sortedOnce(_, col("doc_id"), col("chunk_idx")))
    }),

    // Content-defined chunking (rolling-hash cut rule at token
    // granularity): boundaries from the token's FNV-1a low bits, so chunk
    // identity survives insertions/deletions that shift every fixed-stride
    // window. Mean chunk ~16 tokens.
    "text_cdc_chunks" -> ((s, d) => {
      TA.cdcChunks(Tables.documents(s, d), "text", "doc_id", meanTokens = 16)
        .withColumnRenamed("id", "doc_id")
        .transform(sortedOnce(_, col("doc_id"), col("chunk_idx")))
    }),

    // Statistical LM quality score: average conditional bigram probability
    // under the corpus's own MLE model — the KenLM-filter signal, in the
    // rational form whose every term is an IEEE division of integer counts
    // (exactly replayable; a log form would be libm-ulp-bound).
    "text_bigram_lm_score" -> ((s, d) => {
      TA.bigramLmScores(Tables.documents(s, d), "text", "doc_id")
        .withColumnRenamed("id", "doc_id")
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Per-document n-gram NOVELTY — the corpus-freshness signal web
    // pipelines read before mixing a crawl snapshot in: which fraction of
    // a doc's distinct 5-grams appear here FIRST (global first occurrence
    // = min doc_id)? One explode to the distinct (doc, shingle) grain,
    // one min-agg per shingle, one join back — all on the shingle key,
    // no pairwise anything. The shared grain frame feeds both sides →
    // checkpointed, one corpus scan.
    "text_ngram_novelty" -> ((s, d) => {
      // r17: pre-partition the grain frame by SHINGLE before the checkpoint
      // (which preserves partitioning) — the first-occurrence aggregate and
      // the join-back are then both co-partitioned for free (was: two
      // full-stream shingle exchanges after the checkpoint)
      val g = Dedup.shingleFramePos(Tables.documents(s, d), "text", "doc_id", 5)
        .filter(col("ntok") >= 5)
        .select(col("id"), col("shingle")).distinct()
        .repartition(col("shingle"))
        .localCheckpoint()
      Dedup.rotateCheckpoints("text_ngram_novelty", g)
      val first = g.groupBy(col("shingle")).agg(min(col("id")).as("first_id"))
      val per = g.join(first, "shingle")
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("id") === col("first_id"), 1L).otherwise(0L)).as("n_novel"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(per.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
          coalesce(col("n_novel"), lit(0L)).as("n_novel"),
          when(col("n_shingles").isNull, lit(0.0))
            .otherwise(round(col("n_novel").cast("double") / col("n_shingles"), 6))
            .as("novelty"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Top-20 bigram collocations by PMI (min pair count 5) — the
    // phrase-mining readout beside the boilerplate n-grams: bigram and
    // unigram counts from the SAME token stream, PMI on the count ratios,
    // TakeOrderedAndProject for the head. All joins are on term keys
    // (vocab-bounded), the globals are one broadcast row.
    "text_pmi_collocations" -> ((s, d) => {
      // TWO corpus scans total (tokens, bigrams), both reduced to their
      // vocab-bounded count frames and checkpointed; the globals are SUMS
      // over those frames, never a rescan (review r12: the first cut
      // re-tokenized the corpus four times)
      val cbgAll = Dedup.shingleFramePos(Tables.documents(s, d), "text", "doc_id", 2)
        .filter(col("ntok") >= 2)
        .select(col("shingle").as("b"),
          substring_index(col("shingle"), " ", 1).as("w1"),
          substring_index(col("shingle"), " ", -1).as("w2"))
        .groupBy(col("b"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("c2"))
        .localCheckpoint()
      val cw = Tables.documents(s, d)
        .select(explode(TA.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cw"))
        .localCheckpoint()
      Dedup.rotateCheckpoints("text_pmi_collocations", cbgAll, cw)
      val cbg = cbgAll.filter(col("c2") >= 5)
      val globals = cw.agg(sum(col("cw")).as("n_tok"))
        .crossJoin(cbgAll.agg(sum(col("c2")).as("n_big")))
      cbg
        .join(cw.select(col("w").as("w1"), col("cw").as("ca")), "w1")
        .join(cw.select(col("w").as("w2"), col("cw").as("cb")), "w2")
        .crossJoin(broadcast(globals))
        .select(col("b"), col("c2"),
          round(log(
            (col("c2").cast("double") / col("n_big")) /
              ((col("ca").cast("double") / col("n_tok")) *
                (col("cb").cast("double") / col("n_tok")))), 6).as("pmi"))
        .orderBy(col("pmi").desc, col("b"))
        .limit(20)
    }),

    // Global vocabulary head: top-100 words by corpus frequency with a
    // deterministic tie-break — explode + hash-agg + TakeOrderedAndProject
    // (no full sort at scale).
    "text_vocab_topk" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(TA.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(100)
    }),

    // Tokenizer-EXACT counts (VERDICT r12 #7): deterministic byte-level BPE
    // (Sennrich et al.) under a fixture merge table — greedy best-ranked
    // merges from single chars, codegen'd expression, table broadcast by
    // closure. The oracle replays the merge loop as a DuckDB recursive CTE
    // over the SAME VALUES list (one leftmost-best merge per iteration,
    // equivalent by the merge table's creation-order property). The
    // 120-char slice bounds the oracle's iteration count, not the design.
    "text_bpe_tokens" -> ((s, d) => {
      import graft.functions.Bpe
      val toks = Bpe.bpe_encode(substring(col("text"), 1, 120), Bpe.fixtureTable)
      Tables.documents(s, d)
        .select(col("doc_id"), size(toks).cast("long").as("n_bpe"),
          concat_ws("|", toks).as("toks_str"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // FULL-DOCUMENT tokenizer-exact counts (VERDICT r13 #4): the 120-char
    // slice capped the oracle's recursive-CTE depth, not the design —
    // lifted via the factorization property (Bpe.BpeTable.operandCodePoints):
    // a char in NO merge operand can never join a merge, so
    // BPE(text) = concat of BPE(segment) over maximal operand-char runs.
    // Spark encodes per segment (encodeSegmented, property-pinned equal to
    // whole-text encode in BpeSpec); the oracle folds per SEGMENT too,
    // bounding its recursion by the longest operand run (≤68 chars at sf1)
    // instead of document length. Token string surfaces as md5 — the exact
    // content check without a 300+-char column in the diff.
    "text_bpe_tokens_full" -> ((s, d) => {
      import graft.functions.Bpe
      val toks = Bpe.bpe_encode_full(col("text"), Bpe.fixtureTable)
      Tables.documents(s, d)
        .select(col("doc_id"), size(toks).cast("long").as("n_bpe"),
          md5(concat_ws("|", toks)).as("toks_md5"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Realistic merge-table scale (VERDICT r14 #2): the SAME full-document
    // encode under the 1,000-merge table — an exhaustively-trained corpus
    // prefix (words merge to single tokens, maximal applied depth) plus a
    // synthetic 911-entry tail that can never match, so the lane measures
    // rank-lookup flatness in table size. Same plan shape as the 25-merge
    // lane: ONE codegen'd BpeEncode per document, no extra exchange.
    "text_bpe_tokens_1k" -> ((s, d) => {
      import graft.functions.Bpe
      val toks = Bpe.bpe_encode_full(col("text"), Bpe.table1k)
      Tables.documents(s, d)
        .select(col("doc_id"), size(toks).cast("long").as("n_bpe"),
          md5(concat_ws("|", toks)).as("toks_md5"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // BYTE-level BPE (VERDICT r15 #4 — the GPT-2/LLaMA shape): the same
    // full-document segment-factorized encode, seeded from UTF-8 BYTES
    // (tokens are lowercase hex pairs) under the fixture table's hexed
    // twin, with inherent byte fallback (every byte is base vocabulary —
    // non-ASCII chars pass through as raw bytes; BpeSpec pins that plus
    // segmented==whole and the hex-of-code-point equivalence on ASCII).
    // Same plan shape as the code-point lanes: ONE codegen'd BpeEncode
    // per document, no extra exchange. The oracle replays the fold over
    // hex byte pairs through the hexed VALUES list.
    "text_bpe_tokens_bytes" -> ((s, d) => {
      import graft.functions.Bpe
      val toks = Bpe.bpe_encode_bytes(col("text"), Bpe.fixtureTable)
      Tables.documents(s, d)
        .select(col("doc_id"), size(toks).cast("long").as("n_bpe_bytes"),
          md5(concat_ws("|", toks)).as("toks_md5"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Tokenizer A/B audit — the retokenization decision a pipeline faces
    // when upgrading its tokenizer at 100 TB: both tables encode in ONE
    // scan/projection (two codegen'd BpeEncode columns, no join, no extra
    // pass over the corpus), per-doc token counts + the count ratio +
    // which tokenizer compresses better. The oracle replays BOTH merge
    // folds side by side (prefixed CTE chains over the two VALUES lists).
    "text_tokenizer_ab" -> ((s, d) => {
      import graft.functions.Bpe
      val a = Bpe.bpe_encode_full(col("text"), Bpe.fixtureTable)
      val b = Bpe.bpe_encode_full(col("text"), Bpe.table1k)
      val na = size(a).cast("long")
      val nb = size(b).cast("long")
      Tables.documents(s, d)
        .select(col("doc_id"),
          na.as("n_bpe_25"), nb.as("n_bpe_1k"),
          when(na === 0, lit(0.0))
            .otherwise(round(nb.cast("double") / na.cast("double"), 6))
            .as("ab_ratio"),
          when(nb < na, lit("table1k")).when(na < nb, lit("fixture25"))
            .otherwise(lit("tie")).as("winner"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // PII redaction pass: deterministic synthetic PII (email/phone/IPv4
    // derived from doc_id) is appended to each doc, then counted and
    // scrubbed; the oracle re-runs the identical regexes in DuckDB and
    // md5-fingerprints the scrubbed text, so a single changed character
    // anywhere in the redaction output fails the row.
    "text_pii_scrub" -> ((s, d) => {
      val injected = concat(col("text"),
        lit(" contact: user"), col("doc_id").cast("string"),
        lit("@example.com or +1-555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit("-0199 at 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"))
      val (ne, np, ni) = TA.piiCounts(injected)
      Tables.documents(s, d).select(col("doc_id"),
        ne.as("n_emails"), np.as("n_phones"), ni.as("n_ips"),
        md5(TA.piiScrub(injected).cast("binary")).as("scrub_fp"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // The full web-corpus front door (VERDICT r16 #1): WARC records →
    // HTTP envelope strip → deterministic HTML text extraction (head/
    // script/style removal, block split, entity decode, link-density
    // boilerplate drop — graft.functions.HtmlText's documented rule), all
    // inside ONE task-local codegen span per file. The oracle replays the
    // extraction CLOSED-FORM: the fixture HTML is a pure function of
    // (doc_id, text), so the expected text is rebuilt directly from the
    // documents table and md5-compared — the nav/footer blocks must drop
    // (link density 1.0), head content must vanish, entities must decode.
    "text_html_extract" -> ((s, d) => {
      val dir = graft.sources.Warc.fixtureCached(Tables.documents(s, d), d,
        http = true)
      graft.sources.Warc.records(s, dir)
        .select(
          regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
            .cast("long").as("doc_id"),
          graft.sources.HttpPayload.http_response(col("payload"))
            .getField("body").cast("string").as("html"))
        .select(col("doc_id"),
          graft.functions.HtmlText.html_text(col("html")).as("t"))
        .select(col("doc_id"), col("t.n_kept"), col("t.n_dropped"),
          length(col("t.text")).as("n_chars"),
          md5(col("t.text").cast("binary")).as("text_md5"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Corpus-level boilerplate n-grams: top-20 5-grams by document
    // frequency (one vote per doc per distinct gram), TakeOrdered top-k.
    "text_boilerplate_ngrams" -> ((s, d) => {
      TA.topNgramsByDocFreq(Tables.documents(s, d), "text", "doc_id", n = 5, k = 20)
    }),

    // Count-Min heavy hitters: exact top-20 tokens as the witness, their
    // CMS point estimates beside the truth. The sketch is d*w = 1024
    // counters REGARDLESS of corpus size (mergeable, map-side combined);
    // over_count >= 0 always — CMS error is one-sided by construction.
    "text_cms_heavy_hitters" -> ((s, d) => {
      val toksDf = Tables.documents(s, d)
        .select(explode(TA.tokens(col("text"))).as("w"))
      val sk = graft.ext.Cms.sketch(toksDf, "w", d = 4, w = 256)
      val cand = toksDf.groupBy(col("w")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("w")).limit(20)
      graft.ext.Cms.estimate(sk, cand, "w", d = 4, w = 256)
        .withColumn("over_count", col("n_est") - col("n_exact"))
        .orderBy(col("w"))
    }),

    // Hashed TF-IDF vectorizer (feature hashing): fixed-width bag-of-words
    // embedding with NO vocabulary to build — FNV bucket per token, tf per
    // (doc, bucket), tf·ln((N+1)/(df+1)) weights, exploded sparse output.
    // Bounded to a doc slice so the verify payload stays small; the shape
    // is corpus-linear.
    "text_feature_hashing" -> ((s, d) => {
      TA.featureHashFrame(Tables.documents(s, d).filter(col("doc_id") < 100),
          "text", "doc_id", dims = 64)
        .select(col("id").as("doc_id"), col("dim"), col("weight"))
        .orderBy(col("doc_id"), col("dim"))
    }),

    // Per-language doc-length quantiles — the distribution slice beside
    // train_dataset_card's means: exact interpolating percentiles per
    // group (integer token counts, .0/.5 midpoints — round-4 exact).
    "text_length_percentiles_by_lang" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("nt", TA.tokenCount(col("text")).cast("long"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          round(expr("percentile(nt, 0.25)"), 4).as("p25"),
          round(expr("percentile(nt, 0.5)"), 4).as("p50"),
          round(expr("percentile(nt, 0.75)"), 4).as("p75"),
          round(expr("percentile(nt, 0.95)"), 4).as("p95"))
        .orderBy(col("lang"))
    }),

    "text_langid" -> ((s, d) => {
      TA.textStatsFrame(Tables.documents(s, d), "text", "doc_id")
        .select(col("id").as("doc_id"), col("lang_guess"), col("en_score"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Langid EVALUATION against the corpus's labeled `lang` column: the
    // confusion matrix (actual × predicted doc counts) a classifier-quality
    // report reads before the mixture weights trust lang_guess. Same
    // one-explode textStatsFrame scale path as text_langid, plus one
    // ≤|langs|²-group aggregate.
    "text_langid_confusion" -> ((s, d) => {
      val pred = TA.textStatsFrame(Tables.documents(s, d), "text", "doc_id")
        .select(col("id").as("doc_id"), col("lang_guess"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang").as("lang_actual"))
        .join(pred, "doc_id")
        .groupBy(col("lang_actual"), col("lang_guess"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("lang_actual"), col("lang_guess"))
    }),

    // Flesch reading-ease per document (regex word/sentence/syllable
    // counts — TextAnalysis.fleschScore): the readability axis of the
    // quality-mix feature set. Scan-fused column algebra, zero shuffles.
    "text_readability" -> ((s, d) => {
      Tables.documents(s, d).select(col("doc_id"),
          TA.tokenCount(col("text")).cast("long").as("n_words"),
          TA.sentenceCount(col("text")).cast("long").as("n_sentences"),
          TA.fleschScore(col("text")).as("flesch"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Sentence-grain boilerplate: sentences (terminator-split, trimmed,
    // lowercased) appearing in 2+ DISTINCT docs are boilerplate; each doc
    // reports its contamination ratio. The sentence stream is one explode;
    // the doc-frequency side is a (sentence)-keyed aggregate semi-joined
    // back — nothing quadratic, the n-gram lane's discipline at sentence
    // grain.
    "text_sentence_boilerplate" -> ((s, d) => {
      val sents = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), "[.!?]+")).as("s0"))
        .withColumn("s", trim(lower(col("s0"))))
        .filter(length(col("s")) > 0)
        .select(col("doc_id"), col("s")).distinct()
      val df = sents.groupBy(col("s"))
        .agg(count_distinct(col("doc_id")).as("ndocs"))
      val flagged = sents.join(df, "s")
        .groupBy(col("doc_id")).agg(
          count(lit(1)).as("n_sents"),
          count_if(col("ndocs") >= 2).as("n_boiler"))
      Tables.documents(s, d).select(col("doc_id"))
        .join(flagged, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_sents"), lit(0L)).as("n_sents"),
          coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
          when(col("n_sents") > 0,
            round(col("n_boiler").cast("double") / col("n_sents"), 4))
            .as("boiler_ratio"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Out-of-vocabulary rate per doc against the corpus top-100 vocab
    // (text_vocab_topk's exact definition) — the tokenizer-coverage gate:
    // docs with high OOV under the deployed vocab inflate token counts
    // and training cost. Vocab is a broadcast; the token stream is the
    // same one-explode.
    "text_oov_rate" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(TA.tokens(col("text"))).as("w"))
      val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(100)
        .select(col("w"), lit(1).as("__in"))
      val rates = toks.join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("doc_id")).agg(
          count(lit(1)).as("n_tokens"),
          count_if(col("__in").isNull).as("n_oov"))
      Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .join(rates, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_oov"), lit(0L)).as("n_oov"),
          when(col("n_tokens") > 0,
            round(col("n_oov").cast("double") / col("n_tokens"), 4))
            .as("oov_rate"))
        .transform(sortedOnce(_, col("doc_id")))
    }),

    // Zipf-law fit over the top-100 token frequencies: OLS slope of
    // ln(freq) on ln(rank). The corpus-naturalness screen (a slope far
    // from ~-1 flags synthetic/templated text). Both ln streams are
    // pre-rounded to 6 decimals before the moment sums so the libm ulp
    // exposure is quarantined at the leaf, not compounded through the
    // regression; the 100-row window runs over a TakeOrdered result.
    "text_zipf_slope" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val top = Tables.documents(s, d)
        .select(explode(TA.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("w")).limit(100)
      val r = top
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("w"))))
        .withColumn("x", round(log(col("rank").cast("double")), 6))
        .withColumn("y", round(log(col("n").cast("double")), 6))
      r.agg(count(lit(1)).as("n_terms"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("slope", (col("n_terms") * col("sxy") - col("sx") * col("sy"))
          / (col("n_terms") * col("sxx") - col("sx") * col("sx")))
        .select(col("n_terms"),
          round(col("slope"), 4).as("zipf_slope"),
          round((col("sy") - col("slope") * col("sx")) / col("n_terms"), 4)
            .as("intercept"))
    }),
  )

  def oracles: Map[String, String] = Map(
    "text_token_stats" ->
      s"""SELECT doc_id, len($toks) AS n_tokens,
         |  len(list_distinct($toks)) AS n_distinct,
         |  CASE WHEN len($toks) = 0 THEN 0.0
         |       ELSE ${sparkRound(s"CAST(list_aggregate(list_transform($toks, x -> length(x)), 'sum') AS DOUBLE) / len($toks)", 4)} END AS avg_word_len,
         |  length(text) AS n_chars_m
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_token_entropy" ->
      s"""WITH t AS (SELECT doc_id, unnest($toks) AS w FROM documents),
         |tf AS (SELECT doc_id, w, count(*) AS c FROM t GROUP BY 1, 2),
         |p AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |        count(*) AS n_distinct, sum(c * ln(c)) AS clc
         |      FROM tf GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
         |  coalesce(n_distinct, 0) AS n_distinct,
         |  CASE WHEN coalesce(n_tokens, 0) = 0 THEN 0.0
         |       ELSE ${sparkRound("ln(n_tokens) - clc / n_tokens", 6)} END AS token_entropy
         |FROM documents d LEFT JOIN p USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "text_quality" ->
      s"""WITH q AS (
         |  SELECT doc_id,
         |    CASE WHEN length(text)=0 THEN 0.0
         |         ELSE CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)/length(text) END AS punct_ratio,
         |    CASE WHEN length(text)=0 THEN 0.0
         |         ELSE CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)/length(text) END AS upper_ratio,
         |    CASE WHEN len($toks)=0 THEN 0.0
         |         ELSE CAST(len(list_filter($toks, x -> list_contains($enStops, x))) AS DOUBLE)/len($toks) END AS stop_ratio,
         |    CASE WHEN len($toks)=0 THEN 0.0
         |         ELSE CAST(list_aggregate(list_transform($toks, x -> length(x)), 'sum') AS DOUBLE)/len($toks) END AS mwl,
         |    length(text) AS n_len
         |  FROM documents)
         |SELECT doc_id, ${sparkRound("punct_ratio", 4)} AS punct_ratio,
         |  ${sparkRound("upper_ratio", 4)} AS upper_ratio,
         |  ${sparkRound("stop_ratio", 4)} AS stop_ratio,
         |  ${sparkRound(
              """least(n_len/500.0, 1.0)*0.3 + least(stop_ratio*4.0, 1.0)*0.3
                |    + (CASE WHEN mwl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END)*0.2
                |    + greatest(0.0, 1.0 - punct_ratio*5.0)*0.2""".stripMargin, 4)} AS quality
         |FROM q ORDER BY doc_id""".stripMargin,

    // Mirrors TextAnalysis.textStatsFrame's language pick exactly: per-language
    // stopword hit-rate, argmax with ties broken en > fr > de > es (the order
    // of LangInventories), 'und' when nothing scores, 'zh' when >5% of
    // codepoints are CJK. RE2 spells Java's \p{script=Han} as \p{Han}.
    "text_langid" ->
      s"""$langidCtes
         |SELECT doc_id, lang_guess, ${sparkRound("en", 4)} AS en_score
         |FROM lid ORDER BY doc_id""".stripMargin,

    // the same langid CTE joined back to the labeled lang column
    "text_langid_confusion" ->
      s"""$langidCtes
         |SELECT d.lang AS lang_actual, l.lang_guess, count(*) AS n_docs
         |FROM lid l JOIN documents d USING (doc_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // PII scrub replay: identical regexes (written to the Java-regex /
    // RE2 common subset), identical replacement order (email, then phone,
    // then IP — counts taken on the text each stage sees), md5 fingerprint
    // of the fully scrubbed text.
    "text_pii_scrub" -> {
      val email = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
      val phone = """\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]\d{3,4}"""
      val ip = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
      s"""WITH inj AS (SELECT doc_id,
         |    text || ' contact: user' || CAST(doc_id AS VARCHAR) ||
         |    '@example.com or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
         |    '-0199 at 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
         |  FROM documents),
         |st AS (SELECT doc_id, t,
         |    regexp_replace(t, '$email', '<EMAIL>', 'g') AS t1 FROM inj),
         |st2 AS (SELECT doc_id, t, t1,
         |    regexp_replace(t1, '$phone', '<PHONE>', 'g') AS t2 FROM st)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(t, '$email')) AS INT) AS n_emails,
         |  CAST(len(regexp_extract_all(t1, '$phone')) AS INT) AS n_phones,
         |  CAST(len(regexp_extract_all(t2, '$ip')) AS INT) AS n_ips,
         |  md5(regexp_replace(t2, '$ip', '<IP>', 'g')) AS scrub_fp
         |FROM st2 ORDER BY doc_id""".stripMargin
    },

    // Closed-form replay of the HTML extraction over the fixture template:
    // expected text = "Doc <id>\n<text>\ntail <id> & fin!" (h1 + body
    // paragraph + entity paragraph kept; nav and footer dropped at link
    // density 1.0; head/script/style vanish). The corpus has no empty or
    // whitespace-irregular texts (verified all SFs), so the rebuilt string
    // is exact — a single divergent char anywhere in WARC split, HTTP
    // strip, tag walk, entity decode, or block accounting md5-mismatches.
    "text_html_extract" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    'Doc ' || doc_id || chr(10) || text || chr(10) ||
        |      'tail ' || doc_id || ' & fin!' AS ex
        |  FROM documents WHERE doc_id < 500)
        |SELECT doc_id, CAST(3 AS INT) AS n_kept, CAST(2 AS INT) AS n_dropped,
        |  CAST(length(ex) AS INT) AS n_chars, md5(ex) AS text_md5
        |FROM r ORDER BY doc_id""".stripMargin,

    // Boilerplate top-k: same per-doc-distinct 5-gram stream, doc-frequency
    // count, total-ordered (df DESC, ngram) top-20.
    "text_boilerplate_ngrams" ->
      s"""WITH docs AS (SELECT doc_id, $toks AS tk FROM documents),
         |g AS (SELECT unnest(list_distinct(${shingleSqlN(5)})) AS ngram FROM docs)
         |SELECT ngram, CAST(count(*) AS BIGINT) AS doc_freq
         |FROM g GROUP BY ngram ORDER BY doc_freq DESC, ngram LIMIT 20""".stripMargin,

    // Count-Min heavy hitters replayed cell-for-cell: FNV token hash mod P,
    // the 4 affine rows (constants interpolated from the fixed seed) into
    // 256 buckets, the counter grid, the exact top-20 witness, and the min
    // over each candidate's 4 counters.
    "text_cms_heavy_hitters" -> {
      val P = 2147483647L
      val arms = graft.ext.Cms.cmsParams(4).zipWithIndex
      val cellArms = arms.map { case ((a, b), j) =>
        s"SELECT ((h * $a + $b) % $P) % 256 AS bucket, $j AS row FROM hh"
      }.mkString("\n  UNION ALL ")
      val candArms = arms.map { case ((a, b), j) =>
        s"SELECT w, n_exact, $j AS row, ((h * $a + $b) % $P) % 256 AS bucket FROM exact"
      }.mkString("\n  UNION ALL ")
      s"""WITH tk AS (SELECT unnest($toks) AS w FROM documents),
         |hh AS (SELECT w, ${pmodPrime(signed64(fnvSql("w")))} AS h FROM tk),
         |cells AS (
         |  $cellArms),
         |sk AS (SELECT row, bucket, count(*) AS cnt FROM cells GROUP BY row, bucket),
         |exact AS (SELECT w, min(h) AS h, CAST(count(*) AS BIGINT) AS n_exact
         |          FROM hh GROUP BY w ORDER BY n_exact DESC, w LIMIT 20),
         |cand AS (
         |  $candArms),
         |est AS (SELECT w, n_exact, min(coalesce(cnt, 0)) AS n_est
         |        FROM cand LEFT JOIN sk USING (row, bucket) GROUP BY w, n_exact)
         |SELECT w, n_exact, n_est, n_est - n_exact AS over_count
         |FROM est ORDER BY w""".stripMargin
    },

    "text_code_detect" -> {
      val kwList = Seq("def", "class", "return", "import", "function", "var",
        "let", "const", "if", "else", "for", "while", "void", "int")
        .map(w => s"'$w'").mkString("[", ", ", "]")
      val brace =
        """(CAST(length(text) - length(regexp_replace(text, '[{}()\[\];]', '', 'g')) AS DOUBLE) / greatest(length(text), 1))"""
      val kwr =
        s"""(CAST(len(list_filter($toks, x -> list_contains($kwList, x))) AS DOUBLE) / greatest(len($toks), 1))"""
      val score = sparkRound(
        s"least($brace * 20, 1.0) * 0.5 + least($kwr * 8, 1.0) * 0.5", 4)
      s"""SELECT doc_id, length(text) AS n_chars,
         |  ${sparkRound(brace, 4)} AS brace_ratio,
         |  ${sparkRound(kwr, 4)} AS kw_ratio,
         |  $score AS code_score,
         |  ($score >= 0.5) AS is_code
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    // BPE merge-loop replay (see bpeFoldCtes) + the token string join.
    "text_bpe_tokens" ->
      s"""$bpeFoldCtes
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_bpe,
         |  array_to_string(toks, '|') AS toks_str
         |FROM bpe ORDER BY doc_id""".stripMargin,

    // Full-document per-segment merge replay + the md5'd token string.
    "text_bpe_tokens_full" ->
      s"""$bpeFoldCtesFull
         |SELECT d.doc_id, CAST(coalesce(len(b.toks), 0) AS BIGINT) AS n_bpe,
         |  md5(coalesce(array_to_string(b.toks, '|'), '')) AS toks_md5
         |FROM documents d LEFT JOIN bpe b USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // The identical fold through the 1,000-row merge VALUES list.
    "text_bpe_tokens_1k" ->
      s"""${bpeFoldCtesFullFor(graft.functions.Bpe.table1k)}
         |SELECT d.doc_id, CAST(coalesce(len(b.toks), 0) AS BIGINT) AS n_bpe,
         |  md5(coalesce(array_to_string(b.toks, '|'), '')) AS toks_md5
         |FROM documents d LEFT JOIN bpe b USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // The byte-seeded fold through the hexed merge VALUES list.
    "text_bpe_tokens_bytes" ->
      s"""${ExtShared.bpeFoldCtesBytesFor(graft.functions.Bpe.fixtureTable)}
         |SELECT d.doc_id, CAST(coalesce(len(b.toks), 0) AS BIGINT) AS n_bpe_bytes,
         |  md5(coalesce(array_to_string(b.toks, '|'), '')) AS toks_md5
         |FROM documents d LEFT JOIN bpe b USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    // Both folds in one query (prefixed CTE chains), joined per doc.
    "text_tokenizer_ab" ->
      ("WITH RECURSIVE\n" +
        bpeFoldCtesBody(graft.functions.Bpe.fixtureTable, "a_") + ",\n" +
        bpeFoldCtesBody(graft.functions.Bpe.table1k, "b_") +
        s"""
           |SELECT d.doc_id,
           |  CAST(coalesce(len(a.toks), 0) AS BIGINT) AS n_bpe_25,
           |  CAST(coalesce(len(b.toks), 0) AS BIGINT) AS n_bpe_1k,
           |  CASE WHEN coalesce(len(a.toks), 0) = 0 THEN 0.0
           |       ELSE ${sparkRound(
                  "CAST(coalesce(len(b.toks), 0) AS DOUBLE) / len(a.toks)", 6)}
           |  END AS ab_ratio,
           |  CASE WHEN coalesce(len(b.toks), 0) < coalesce(len(a.toks), 0) THEN 'table1k'
           |       WHEN coalesce(len(a.toks), 0) < coalesce(len(b.toks), 0) THEN 'fixture25'
           |       ELSE 'tie' END AS winner
           |FROM documents d
           |LEFT JOIN a_bpe a USING (doc_id)
           |LEFT JOIN b_bpe b USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin),

    // TF-IDF replay: same counts, same smoothed idf, same (score DESC,
    // term) tie order.
    "text_tfidf_keywords" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toks) AS t FROM documents),
         |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
         |dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
         |n AS (SELECT count(*) AS nn FROM documents),
         |sc AS (SELECT doc_id, t,
         |    ${sparkRound("tf * ln(CAST(nn + 1 AS DOUBLE) / (df + 1))", 6)} AS score
         |  FROM tf JOIN dfreq USING (t), n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
         |        ORDER BY score DESC, t) AS rnk FROM sc)
         |SELECT doc_id, CAST(rnk AS INT) AS rnk, t AS term, score
         |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    // Gate battery replay: identical tokenization, integer-derived ratios
    // against the same decimal literals, '...' count via the same
    // replace-length delta.
    "text_quality_gates" ->
      s"""WITH tk AS (SELECT doc_id, lang, text, $toks AS t FROM documents),
         |sig AS (SELECT doc_id, lang,
         |    len(t) AS nw,
         |    coalesce(list_sum(list_transform(t, x -> length(x))), 0) AS sl,
         |    len(list_filter(t, x -> regexp_matches(x, '[a-z]'))) AS na,
         |    len(list_distinct(list_filter(t, x -> list_contains($enStops, x)))) AS ns,
         |    (length(text) - length(replace(text, '...', ''))) // 3 AS ne
         |  FROM tk),
         |g AS (SELECT lang,
         |    (nw >= 30 AND nw <= 100000) AS gw,
         |    (CASE WHEN nw = 0 THEN 0.0 ELSE CAST(sl AS DOUBLE) / nw END >= 3.0
         |     AND CASE WHEN nw = 0 THEN 0.0 ELSE CAST(sl AS DOUBLE) / nw END <= 10.0) AS gm,
         |    (CASE WHEN nw = 0 THEN 0.0 ELSE CAST(na AS DOUBLE) / nw END >= 0.7) AS ga,
         |    (ns >= 2) AS gs,
         |    (CASE WHEN nw = 0 THEN 0.0 ELSE CAST(ne AS DOUBLE) / nw END <= 0.1) AS gy
         |  FROM sig)
         |SELECT lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN gw AND gm AND ga AND gs AND gy THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |  CAST(sum(CASE WHEN NOT gw THEN 1 ELSE 0 END) AS BIGINT) AS fail_words,
         |  CAST(sum(CASE WHEN NOT gm THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_len,
         |  CAST(sum(CASE WHEN NOT ga THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha,
         |  CAST(sum(CASE WHEN NOT gs THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
         |  CAST(sum(CASE WHEN NOT gy THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol
         |FROM g GROUP BY lang ORDER BY lang""".stripMargin,

    "text_repetition" ->
      s"""WITH t AS (
         |  SELECT doc_id, unnest($toks) AS w, unnest(range(len($toks))) AS pos
         |  FROM documents),
         |b AS (
         |  SELECT doc_id, w,
         |    lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
         |  FROM t),
         |wc AS (SELECT doc_id, w, count(*) AS c FROM b GROUP BY 1, 2),
         |wa AS (SELECT doc_id, max(c) AS top_w, CAST(sum(c) AS BIGINT) AS n_tokens,
         |              count(*) AS n_distinct FROM wc GROUP BY 1),
         |bc AS (SELECT doc_id, w || ' ' || nxt AS big, count(*) AS c
         |       FROM b WHERE nxt IS NOT NULL GROUP BY 1, 2),
         |ba AS (SELECT doc_id, max(c) AS top_b, CAST(sum(c) AS BIGINT) AS n_bigrams
         |       FROM bc GROUP BY 1)
         |SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens,
         |  coalesce(n_distinct, 0) AS n_distinct,
         |  CASE WHEN coalesce(n_tokens, 0) = 0 THEN 0.0
         |       ELSE ${sparkRound("(n_tokens - n_distinct) / CAST(n_tokens AS DOUBLE)", 4)}
         |  END AS dup_word_frac,
         |  CASE WHEN coalesce(n_tokens, 0) = 0 THEN 0.0
         |       ELSE ${sparkRound("top_w / CAST(n_tokens AS DOUBLE)", 4)}
         |  END AS top_word_frac,
         |  CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0.0
         |       ELSE ${sparkRound("top_b / CAST(n_bigrams AS DOUBLE)", 4)}
         |  END AS top_bigram_frac
         |FROM documents d
         |LEFT JOIN wa ON d.doc_id = wa.doc_id
         |LEFT JOIN ba ON d.doc_id = ba.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // feature-hashing replay: same FNV bucket, same tf/df aggregates, the
    // same tf*ln((N+1)/(df+1)) weight with Spark-parity rounding
    "text_feature_hashing" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toks) AS t FROM documents WHERE doc_id < 100),
         |dimt AS (SELECT doc_id,
         |           CAST(((${signed64(fnvSql("t"))} % 64) + 64) % 64 AS INT) AS dim
         |         FROM tk),
         |tf AS (SELECT doc_id, dim, count(*) AS tf FROM dimt GROUP BY doc_id, dim),
         |dfd AS (SELECT dim, count(*) AS df FROM tf GROUP BY dim),
         |nn AS (SELECT count(*) AS n FROM documents WHERE doc_id < 100)
         |SELECT doc_id, dim, ${sparkRound("tf * ln((n + 1.0) / (df + 1.0))", 6)} AS weight
         |FROM tf JOIN dfd USING (dim), nn
         |ORDER BY doc_id, dim""".stripMargin,

    // Bigram LM replayed exactly: positioned bigrams, corpus bigram/prefix
    // counts, the continuation vocabulary V, each add-one conditional
    // (c2+1)/(c1+V) as the IEEE double both engines compute, Spark-rounded
    // to 9 decimals and summed as exact DECIMAL terms
    // (association-order-free), then one division + Spark-parity rounding.
    "text_bigram_lm_score" ->
      s"""WITH docs AS (SELECT doc_id, $toks AS tk FROM documents),
         |bg AS (SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2,
         |         tk[i] || ' ' || tk[i+1] AS b
         |       FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i
         |             FROM docs WHERE len(tk) >= 2)),
         |cbg AS (SELECT b, count(*) AS c2 FROM bg GROUP BY b),
         |cw1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
         |vv AS (SELECT count(DISTINCT w2) AS v FROM bg),
         |sc AS (SELECT doc_id,
         |         CAST(${sparkRound("(c2 + 1)::DOUBLE / (c1 + v)", 9)} AS DECIMAL(38,9)) AS r
         |       FROM bg JOIN cbg USING (b) JOIN cw1 USING (w1) CROSS JOIN vv),
         |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |         CAST(sum(r) AS DOUBLE) AS s, count(*) AS n
         |       FROM sc GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(ag.n_bigrams, 0) AS n_bigrams,
         |  CASE WHEN ag.doc_id IS NULL THEN 0.0
         |       ELSE ${sparkRound("ag.s / ag.n", 6)} END AS avg_cond_prob
         |FROM documents d LEFT JOIN ag ON ag.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // Chunk geometry replayed: nc = max(1, ceil((ntok-8)/24)) for non-empty
    // docs, 1-based inclusive list slices (both engines clamp at the end),
    // md5 of the space-joined window.
    "text_chunk_windows" ->
      s"""WITH docs AS (SELECT doc_id, $toks AS tk FROM documents),
         |n AS (SELECT doc_id, tk,
         |        CASE WHEN len(tk) <= 0 THEN 0
         |             ELSE greatest(1, CAST(ceil((len(tk) - 8)::DOUBLE / 24) AS BIGINT))
         |        END AS nc
         |      FROM docs),
         |c AS (SELECT doc_id, tk, unnest(range(0, nc)) AS chunk_idx FROM n WHERE nc > 0),
         |s AS (SELECT doc_id, chunk_idx,
         |        tk[CAST(chunk_idx*24 + 1 AS INT) : CAST(chunk_idx*24 + 32 AS INT)] AS ch
         |      FROM c)
         |SELECT doc_id, chunk_idx, CAST(len(ch) AS BIGINT) AS n_chunk_tokens,
         |  md5(array_to_string(ch, ' ')) AS chunk_md5
         |FROM s ORDER BY doc_id, chunk_idx""".stripMargin,

    // the BPE merge-loop CTE composed with the chunk-window replay
    // (chunkSize 32, overlap 8 → stride 24), md5 over the space-join
    "text_chunk_bpe" ->
      s"""$bpeFoldCtes,
         |n AS (SELECT doc_id, toks AS tk,
         |        CASE WHEN len(toks) <= 0 THEN 0
         |             ELSE greatest(1, CAST(ceil((len(toks) - 8)::DOUBLE / 24) AS BIGINT))
         |        END AS nc
         |      FROM bpe),
         |c AS (SELECT doc_id, tk, unnest(range(0, nc)) AS chunk_idx FROM n WHERE nc > 0),
         |sl AS (SELECT doc_id, chunk_idx,
         |        tk[CAST(chunk_idx*24 + 1 AS INT) : CAST(chunk_idx*24 + 32 AS INT)] AS ch
         |      FROM c)
         |SELECT doc_id, chunk_idx, CAST(len(ch) AS BIGINT) AS n_chunk_tokens,
         |  md5(array_to_string(ch, ' ')) AS chunk_md5
         |FROM sl ORDER BY doc_id, chunk_idx""".stripMargin,

    // CDC chunking replayed: per-token FNV-1a (the hex-pair byte fold),
    // boundary = signed pmod 16 == 0, chunk index = boundaries strictly
    // before the token (running sum minus own flag, CAST — HUGEINT),
    // per-chunk md5 of the pos-ordered join.
    "text_cdc_chunks" ->
      s"""$cdcChunkCtes
         |SELECT doc_id, chunk_idx, start_tok, n_toks, chunk_md5
         |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    "text_vocab_topk" ->
      s"""SELECT w, count(*) AS n
         |FROM (SELECT unnest($toks) AS w FROM documents)
         |GROUP BY 1 ORDER BY n DESC, w LIMIT 100""".stripMargin,

    // Novelty replay: identical distinct (doc, 5-gram) grain, global
    // first-occurrence by min doc_id.
    "text_ngram_novelty" ->
      s"""WITH docs AS (SELECT doc_id, $toks AS tk FROM documents),
         |g AS (SELECT doc_id, unnest(list_distinct(${shingleSqlN(5)})) AS s
         |      FROM docs WHERE len(tk) >= 5),
         |fo AS (SELECT s, min(doc_id) AS first_id FROM g GROUP BY s),
         |per AS (SELECT g.doc_id, count(*) AS n_shingles,
         |          CAST(sum(CASE WHEN g.doc_id = fo.first_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
         |        FROM g JOIN fo USING (s) GROUP BY g.doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(per.n_shingles, 0) AS BIGINT) AS n_shingles,
         |  CAST(coalesce(per.n_novel, 0) AS BIGINT) AS n_novel,
         |  CASE WHEN per.n_shingles IS NULL THEN 0.0
         |       ELSE ${sparkRound("CAST(per.n_novel AS DOUBLE) / per.n_shingles", 6)}
         |  END AS novelty
         |FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // PMI replay: bigram/unigram counts off the same token stream, the
    // identical double expression tree, rounded-then-ordered head.
    "text_pmi_collocations" ->
      s"""WITH docs AS (SELECT doc_id, $toks AS tk FROM documents),
         |bg AS (SELECT unnest(${shingleSqlN(2)}) AS b FROM docs WHERE len(tk) >= 2),
         |tok AS (SELECT unnest(tk) AS w FROM docs),
         |cw AS (SELECT w, count(*) AS cw FROM tok GROUP BY w),
         |cbg AS (SELECT b, split_part(b, ' ', 1) AS w1, split_part(b, ' ', 2) AS w2,
         |          count(*) AS c2
         |        FROM bg GROUP BY 1, 2, 3 HAVING count(*) >= 5),
         |g AS (SELECT (SELECT count(*) FROM tok) AS n_tok,
         |             (SELECT count(*) FROM bg) AS n_big)
         |SELECT c.b, CAST(c.c2 AS BIGINT) AS c2,
         |  ${sparkRound(
            """ln((CAST(c.c2 AS DOUBLE) / g.n_big) /
              |    ((CAST(a.cw AS DOUBLE) / g.n_tok) * (CAST(bb.cw AS DOUBLE) / g.n_tok)))""".stripMargin, 6)} AS pmi
         |FROM cbg c JOIN cw a ON a.w = c.w1 JOIN cw bb ON bb.w = c.w2, g
         |ORDER BY pmi DESC, c.b LIMIT 20""".stripMargin,

    "text_length_percentiles_by_lang" ->
      s"""WITH b AS (SELECT lang, CAST(len($toks) AS BIGINT) AS nt FROM documents)
         |SELECT lang, count(*) AS n_docs,
         |  ${sparkRound("quantile_cont(nt, 0.25)", 4)} AS p25,
         |  ${sparkRound("quantile_cont(nt, 0.5)", 4)} AS p50,
         |  ${sparkRound("quantile_cont(nt, 0.75)", 4)} AS p75,
         |  ${sparkRound("quantile_cont(nt, 0.95)", 4)} AS p95
         |FROM b GROUP BY lang ORDER BY lang""".stripMargin,

    "text_readability" ->
      s"""SELECT doc_id,
         |  len($toks) AS n_words,
         |  len(regexp_extract_all(text, '[.!?]+')) AS n_sentences,
         |  CASE WHEN len($toks) > 0 THEN $fleschRoundedSql
         |  END AS flesch
         |FROM documents ORDER BY doc_id""".stripMargin,

    "text_sentence_boilerplate" ->
      s"""WITH raw AS (SELECT doc_id,
         |    trim(lower(unnest(regexp_split_to_array(text, '[.!?]+')))) AS s
         |  FROM documents),
         |sents AS (SELECT DISTINCT doc_id, s FROM raw WHERE length(s) > 0),
         |df AS (SELECT s, count(DISTINCT doc_id) AS ndocs FROM sents GROUP BY s),
         |fl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sents,
         |         CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
         |       FROM sents JOIN df USING (s) GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(n_sents, 0) AS n_sents,
         |  coalesce(n_boiler, 0) AS n_boiler,
         |  CASE WHEN n_sents > 0
         |       THEN ${sparkRound("CAST(n_boiler AS DOUBLE) / n_sents", 4)}
         |  END AS boiler_ratio
         |FROM documents d LEFT JOIN fl USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    "text_oov_rate" ->
      s"""WITH t AS (SELECT doc_id, unnest($toks) AS w FROM documents),
         |v AS (SELECT w FROM (SELECT w, count(*) AS n FROM t GROUP BY w
         |                     ORDER BY n DESC, w LIMIT 100)),
         |r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |        CAST(sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |      FROM t LEFT JOIN v ON t.w = v.w GROUP BY doc_id)
         |SELECT d.doc_id, d.lang, coalesce(n_tokens, 0) AS n_tokens,
         |  coalesce(n_oov, 0) AS n_oov,
         |  CASE WHEN n_tokens > 0
         |       THEN ${sparkRound("CAST(n_oov AS DOUBLE) / n_tokens", 4)}
         |  END AS oov_rate
         |FROM documents d LEFT JOIN r USING (doc_id) ORDER BY d.doc_id""".stripMargin,

    // Zipf replay: same top-100, same leaf-rounded ln streams, same OLS
    // moment algebra.
    "text_zipf_slope" ->
      s"""WITH t AS (SELECT unnest($toks) AS w FROM documents),
         |tp AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM t GROUP BY w
         |       ORDER BY n DESC, w LIMIT 100),
         |r AS (SELECT n, row_number() OVER (ORDER BY n DESC, w) AS rnk FROM tp),
         |v AS (SELECT ${sparkRound("ln(CAST(rnk AS DOUBLE))", 6)} AS x,
         |        ${sparkRound("ln(CAST(n AS DOUBLE))", 6)} AS y FROM r),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
         |        sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         |        sum(x * x) AS sxx FROM v),
         |s AS (SELECT n_terms, sx, sy,
         |        (n_terms * sxy - sx * sy) / (n_terms * sxx - sx * sx) AS slope
         |      FROM m)
         |SELECT n_terms, ${sparkRound("slope", 4)} AS zipf_slope,
         |  ${sparkRound("(sy - slope * sx) / n_terms", 4)} AS intercept
         |FROM s""".stripMargin,
  )
}
