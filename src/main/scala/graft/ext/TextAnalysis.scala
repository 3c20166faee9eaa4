package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, content fingerprinting.
  *
  * Everything here is pure `org.apache.spark.sql.functions` column algebra —
  * no UDFs — so the whole feature extraction fuses into the document scan's
  * whole-stage codegen and runs embarrassingly parallel at 100 TB (no
  * shuffle until/unless the caller aggregates).
  */
object TextAnalysis {

  /** Canonical tokenization: lowercase, split on whitespace, drop empties.
    * (Kept deliberately simple so the DuckDB oracle can mirror it exactly.) */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alphanumeric runs and single punctuation marks
    * each count as one token — a cheap regex proxy for byte-pair tokenizers'
    * "word pieces + punctuation" behavior. */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "(?<=[^a-z0-9])|(?=[^a-z0-9])"),
      t => t.rlike("[a-z0-9]|\\p{Punct}")))

  /** Sentence count: runs of terminal punctuation ([.!?]+), each run one
    * sentence boundary ("Stop!!" is one sentence, not two). */
  def sentenceCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.!?]+"), lit(0)))

  /** Syllable proxy: maximal vowel groups ([aeiouy]+) over the lowercased
    * text — the standard cheap estimator (each vowel cluster ≈ one spoken
    * syllable). Counted corpus-wide, so word boundaries are irrelevant. */
  def syllableCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))

  /** Flesch reading-ease score from the three regex counts above:
    *
    *   206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    *
    * with the sentence denominator floored at 1 (a fragment with no
    * terminal punctuation is read as one sentence) and NULL for empty
    * docs. In a training-data pipeline this is a quality-mix feature:
    * extremely high scores flag word-salad/boilerplate, extremely negative
    * ones flag code or run-on garbage. Pure codegen'd column algebra —
    * the score fuses into the document scan like every other gate. */
  def fleschScore(text: Column): Column = {
    val words = tokenCount(text).cast("double")
    val sentences = greatest(sentenceCount(text).cast("double"), lit(1.0))
    val syllables = syllableCount(text).cast("double")
    when(words > 0,
      round(lit(206.835) - lit(1.015) * (words / sentences)
        - lit(84.6) * (syllables / words), 4))
  }

  /** Sliding token-window chunking — the context-window prep step: split
    * each doc into `chunkSize`-token windows advancing by
    * `chunkSize - overlap` tokens, the last window short if the doc runs
    * out. Docs shorter than a window become one chunk; empty docs produce
    * none. Returns (id, chunk_idx, n_chunk_tokens, chunk_md5).
    *
    * Pure column algebra over one tokenize + one generate (no window
    * function, no shuffle — chunk geometry is per-row arithmetic), so at
    * 100 TB chunking is scan-speed. The md5 fingerprint makes every chunk's
    * CONTENT verifiable cross-engine without shipping the text. */
  def chunkFrame(docs: DataFrame, textCol: String, idCol: String,
      chunkSize: Int, overlap: Int): DataFrame =
    chunkFrameBy(docs, tokens(col(textCol)), idCol, chunkSize, overlap)

  /** [[chunkFrame]] under ANY tokenization: `tokensCol` is an
    * ARRAY<STRING>-valued expression (whitespace tokens for the classic
    * lane; [[graft.functions.Bpe]] tokens for TOKENIZER-UNIT context
    * windows — what an embedding/pre-training pipeline actually cuts by,
    * since model context limits are BPE tokens, not words). */
  def chunkFrameBy(docs: DataFrame, tokensCol: Column, idCol: String,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val nChunks = when(col("__ntok") <= 0, lit(0)).otherwise(
      greatest(lit(1L), ceil((col("__ntok") - lit(overlap)).cast("double") / stride)))
    docs
      .select(col(idCol).as("id"), tokensCol.as("__tk"))
      .withColumn("__ntok", size(col("__tk")))
      .withColumn("__nc", nChunks)
      .filter(col("__nc") > 0)
      .select(col("id"), col("__tk"),
        explode(sequence(lit(0L), col("__nc") - 1)).as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        slice(col("__tk"), (col("chunk_idx") * stride + 1).cast("int"), lit(chunkSize))
          .as("__chunk"))
      .select(col("id"), col("chunk_idx"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("__chunk")).cast("binary")).as("chunk_md5"))
  }

  /** Statistical language-model quality score: per doc, the average add-one
    * smoothed conditional bigram probability
    * (c(w1,w2) + 1) / (c(w1·) + V) under the corpus's own bigram model —
    * the KenLM-style "does this text look like the corpus" filter signal
    * (low score = unusual token sequences = noisy doc). Smoothing matters:
    * the UNSMOOTHED MLE gives a never-seen-prefix bigram probability 1
    * (its prefix only ever precedes that token), scoring gibberish as
    * perfectly typical. V = continuation vocabulary (distinct second
    * tokens). Returns (id, n_bigrams, avg_cond_prob); docs with < 2 tokens
    * score (0, 0.0).
    *
    * Deliberately the RATIONAL form, not log-perplexity: every conditional
    * is an IEEE division of two integer counts (bit-identical in any
    * engine), each is quantized to 9 decimals and summed as exact DECIMAL
    * terms, so the whole score replays cross-engine — a log formulation
    * would be replayable only up to libm's ulp. Ranking behavior matches
    * (both are monotone quality signals).
    *
    * Scale: the bigram stream is checkpointed once and feeds four
    * consumers (bigram counts, prefix counts, V, the per-doc join); the
    * count tables are vocabulary-bounded hash-aggs with map-side combine,
    * V is a broadcast 1-row frame, and the joins are hash equi-joins on
    * the bigram/prefix key — everything linear, nothing all-pairs. */
  /** Token-level CONTENT-DEFINED chunking (the rolling-hash cut rule of
    * CDC dedup systems, applied at token granularity): a chunk boundary
    * falls AFTER every token whose rolling 2-token window — `"prev tok"`
    * (just `tok` at position 0) — FNV-1a-hashes to ≡ 0 (mod `meanTokens`).
    * Chunk lengths are geometric with mean ~`meanTokens`, and — the point
    * of CDC — boundaries are a function of LOCAL CONTENT alone: insert or
    * delete a paragraph and every other chunk's identity survives, where
    * fixed-stride windows ([[chunkFrame]]) shift globally. Chunk hashes
    * are therefore corpus-wide dedup keys: shared boilerplate lands in
    * identical chunks whatever document offset it sits at. (The window is
    * 2 tokens, not 1, so the boundary density holds even on a corpus with
    * a tiny vocabulary — a single-token rule degenerates to "is this one
    * of the k boundary WORDS", and a small word list may contain none.)
    *
    * Returns one row per chunk: (id, chunk_idx, start_tok, n_toks,
    * chunk_md5). Empty docs produce no rows. Scale: one explode + one
    * doc-keyed window pass (lag + running sum share the partitioning and
    * order) + one aggregate — the same shuffle the other per-doc token
    * operators pay; nothing global.
    *
    * `meanTokens` must be a power of two: the boundary test masks the
    * hash's low bits (pmod on 2^k = the low k bits), keeping the rule
    * replayable in any engine with 64-bit integers.
    */
  def cdcChunks(docs: DataFrame, textCol: String, idCol: String,
      meanTokens: Int = 16): DataFrame = {
    require(meanTokens > 0 && (meanTokens & (meanTokens - 1)) == 0,
      s"meanTokens must be a positive power of two, got $meanTokens")
    import org.apache.spark.sql.expressions.Window
    val toked = docs
      .select(col(idCol).as("id"), posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val wOrd = Window.partitionBy(col("id")).orderBy(col("pos"))
    val w = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("tok"), 1).over(wOrd)
    val windowText =
      when(prev.isNull, col("tok")).otherwise(concat_ws(" ", prev, col("tok")))
    val bnd = when(pmod(graft.functions.Fnv.fnv1a64(windowText),
      lit(meanTokens.toLong)) === 0L, 1L).otherwise(0L)
    toked
      .withColumn("__b", bnd)
      // a boundary token CLOSES its chunk: chunk index = boundaries seen
      // strictly before this token = running sum minus the token's own flag
      .withColumn("chunk_idx", sum(col("__b")).over(w) - col("__b"))
      .groupBy(col("id"), col("chunk_idx"))
      .agg(
        min(col("pos")).cast("long").as("start_tok"),
        count(lit(1)).as("n_toks"),
        // order within the group is (pos); sort_array on the struct keys
        // by pos first, so the joined text is the original token order
        md5(concat_ws(" ",
          transform(sort_array(collect_list(struct(col("pos"), col("tok")))),
            s => s.getField("tok"))).cast("binary")).as("chunk_md5"))
  }

  def bigramLmScores(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val bg = Dedup.shingleFramePos(docs, textCol, idCol, 2)
      .filter(col("ntok") >= 2) // whole-string shingles of short docs are not bigrams
      .select(col("id"), col("shingle").as("b"),
        substring_index(col("shingle"), " ", 1).as("w1"),
        substring_index(col("shingle"), " ", -1).as("w2"))
      .localCheckpoint()
    Dedup.rotateCheckpoints("TextAnalysis.bigramLmScores", bg)
    val cbg = bg.groupBy(col("b")).agg(count(lit(1)).as("c2"))
    val cw1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vRow = bg.agg(count_distinct(col("w2")).as("v"))
    val sc = bg.join(cbg, "b").join(cw1, "w1")
      .crossJoin(broadcast(vRow)) // 1-row global, broadcast attachment
      .select(col("id"),
        round((col("c2") + 1).cast("double") / (col("c1") + col("v")), 9)
          .cast("decimal(38,9)").as("r"))
    val ag = sc.groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("r")).as("s"))
    docs.select(col(idCol).as("id"))
      .join(ag, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("s").isNull, lit(0.0))
          .otherwise(round(col("s").cast("double") / col("n_bigrams"), 6))
          .as("avg_cond_prob"))
  }

  /** Per-document quality features (ratios in [0,1]). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") / length(text))

  def upperRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, "[^A-Z]", "")).cast("double") / length(text))

  def stopwordRatio(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => t.isInCollection(stopwords))).cast("double") / size(toks))
  }

  def meanWordLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: long enough, readable word lengths,
    * some stopwords (fluent prose), not drowning in punctuation. The exact
    * blend is a heuristic; each term is individually oracle-checkable. */
  def qualityScore(text: Column): Column = {
    val lenTerm = least(length(text).cast("double") / 500.0, lit(1.0))
    val stopTerm = least(stopwordRatio(text) * 4.0, lit(1.0))
    val wordTerm = when(meanWordLen(text).between(3.0, 10.0), 1.0).otherwise(0.5)
    val punctTerm = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    (lenTerm * 0.3 + stopTerm * 0.3 + wordTerm * 0.2 + punctTerm * 0.2)
  }

  /** Content fingerprint: md5 of the normalized text (lowercase, collapsed
    * whitespace). Stable across engines — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " ").cast("binary"))

  /** 64-bit rolling-ish fingerprint via xxhash64 of the normalized text —
    * cheaper than md5 when a 64-bit key suffices (Spark-only; no oracle). */
  def fingerprint64(text: Column): Column =
    xxhash64(regexp_replace(trim(lower(text)), "\\s+", " "))

  // ---- feature hashing -----------------------------------------------------

  /** Hashed TF-IDF vectorizer ("hashing trick"): every token lands in one of
    * `dims` buckets via the portable FNV-1a hash, term frequency counts per
    * (doc, bucket), and the weight is tf·ln((N+1)/(df+1)) over the BUCKET's
    * document frequency — the fixed-width bag-of-words embedding classical
    * classifiers/cluster passes start from, with no vocabulary to build or
    * broadcast. Output is the EXPLODED sparse form (id, dim, weight): at
    * 100 TB a dense array column per doc would carry dims·8 bytes/row even
    * for short docs, while the sparse stream is bounded by distinct
    * (doc, bucket) pairs and feeds groupBy/join shapes directly.
    *
    * One explode + one (id, dim) aggregate + a broadcast-sized per-dim df
    * frame; weights rounded 6 (ln parity with the oracle, same convention
    * as BM25). */
  def featureHashFrame(docs: DataFrame, textCol: String, idCol: String,
      dims: Int = 64): DataFrame = {
    require(dims > 0, s"dims must be positive, got $dims")
    val n = docs.select(count(lit(1)).as("n"))
    val tok = docs.select(col(idCol).as("id"),
        explode(tokens(col(textCol))).as("t"))
      .withColumn("dim", pmod(graft.functions.Fnv.fnv1a64(col("t")), lit(dims)).cast("int"))
    val tf = tok.groupBy(col("id"), col("dim")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("dim")).agg(count(lit(1)).as("df")) // tf keys distinct per (id, dim)
    tf.join(broadcast(df), "dim")
      .crossJoin(broadcast(n))
      .select(col("id"), col("dim"),
        round(col("tf") * log((col("n") + 1.0) / (col("df") + 1.0)), 6).as("weight"))
  }

  // ---- boilerplate detection -----------------------------------------------

  /** Corpus-level boilerplate detector: the k most DOCUMENT-frequent word
    * n-grams (each doc votes once per distinct n-gram), the standard input
    * to a boilerplate-removal pass — navigation chrome, license headers and
    * template text show up as n-grams with anomalous document frequency.
    *
    * Scale shape: one explode of per-doc-distinct shingles, one count
    * aggregate (map-side combined), and a TakeOrderedAndProject for the
    * top-k — no global sort, no second shuffle. Ties break on the n-gram
    * text so the top-k is total-ordered and deterministic. */
  def topNgramsByDocFreq(docs: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String, n: Int = 5, k: Int = 20): org.apache.spark.sql.DataFrame =
    Dedup.shingleFrame(docs, textCol, idCol, n)
      .select(col("id"), col("shingle").as("ngram")).distinct() // 1 vote/doc
      .groupBy(col("ngram")).agg(count(lit(1)).as("doc_freq"))
      .orderBy(col("doc_freq").desc, col("ngram"))
      .limit(k)

  // ---- PII scrubbing -------------------------------------------------------

  /** Redaction patterns, written to mean the SAME THING in Java regex
    * (Spark) and RE2 (DuckDB): no lookaround, no backreferences, no
    * possessive quantifiers — so the oracle replays the scrub verbatim. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+\\d{1,3}[- ]\\d{3}[- ]\\d{3,4}[- ]\\d{3,4}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Replace emails / international-format phone numbers / IPv4 addresses
    * with typed placeholder tokens — the standard pre-training redaction
    * pass. Pure column algebra (three codegen'd regexp_replace), so it runs
    * scan-side with zero shuffles at any scale. Email first (its local part
    * may contain dot-digit runs the IP pattern would bite into), phone
    * before IP (dashes keep them disjoint, but the order makes it explicit). */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-doc PII hit counts, for redaction-rate monitoring. Each count is
    * taken on the text as [[piiScrub]] sees it at that stage (emails on the
    * raw text, phones after email redaction, IPs after both), so the counts
    * are exactly the number of replacements the scrub performs. */
  def piiCounts(text: Column): (Column, Column, Column) = {
    val afterEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, PhoneRe, "<PHONE>")
    (regexp_count(text, lit(EmailRe)),
     regexp_count(afterEmail, lit(PhoneRe)),
     regexp_count(afterPhone, lit(Ipv4Re)))
  }

  // ---- language identification -------------------------------------------

  /** Tiny embedded stopword inventories; enough signal for a coarse
    * n-gram/stopword language guess without any external model. */
  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "it", "that", "this", "for", "with", "on", "as", "be", "at", "by",
    "not", "from", "but", "they", "his", "her", "you", "we", "have")
  val FrenchStopwords: Seq[String] = Seq(
    "le", "la", "les", "un", "une", "des", "et", "ou", "de", "du", "dans",
    "est", "sont", "il", "elle", "nous", "vous", "pour", "avec", "sur",
    "pas", "que", "qui", "ce", "cette", "au", "aux", "son", "ses", "mais")
  val GermanStopwords: Seq[String] = Seq(
    "der", "die", "das", "ein", "eine", "und", "oder", "von", "zu", "in",
    "ist", "sind", "er", "sie", "wir", "ihr", "für", "mit", "auf", "nicht",
    "dass", "den", "dem", "des", "im", "am", "auch", "als", "bei", "nach")
  val SpanishStopwords: Seq[String] = Seq(
    "el", "la", "los", "las", "un", "una", "unos", "y", "o", "de", "del",
    "en", "es", "son", "él", "ella", "nosotros", "para", "con", "sobre",
    "no", "que", "quien", "este", "esta", "al", "su", "sus", "pero", "por")

  val LangInventories: Seq[(String, Seq[String])] = Seq(
    "en" -> EnglishStopwords, "fr" -> FrenchStopwords,
    "de" -> GermanStopwords, "es" -> SpanishStopwords)

  /** Fraction of tokens found in `words` — the per-language score. */
  def langScore(text: Column, words: Seq[String]): Column = stopwordRatio(text, words)

  private val CjkClass =
    "[^\\p{script=Han}\\p{script=Hiragana}\\p{script=Katakana}\\p{script=Hangul}]"

  def cjkRatio(text: Column): Column =
    when(length(text) === 0, 0.0)
      .otherwise(length(regexp_replace(text, CjkClass, "")).cast("double") / length(text))

  /** Coarse language ID: CJK codepoint share first (no whitespace tokens),
    * then argmax of stopword hit-rate across the embedded inventories;
    * "und" = undetermined when nothing scores. Pure column algebra — the
    * argmax is a greatest()-chain, not a UDF.
    *
    * WARNING — inline form: Spark higher-order functions are interpreted,
    * so the token pipeline re-evaluates once per inventory per when-branch.
    * Fine for small frames and unit tests; use `textStatsFrame` (one
    * explode + codegen'd aggregates) at scale. */
  def langId(text: Column): Column = {
    val scored = LangInventories.map { case (lang, words) => (lang, langScore(text, words)) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scored.foldRight(lit("und")) { case ((lang, score), acc) =>
      when(score === best && best > 0.0, lang).otherwise(acc)
    }
    when(cjkRatio(text) > 0.05, "zh").otherwise(pick)
  }

  /** Scale path for all per-document token statistics: ONE evaluation of
    * the token pipeline (explode), then codegen'd count/sum aggregates with
    * map-side combine — the same explode+aggregate shape as
    * Dedup.minhashSignatures, for the same reason (interpreted HOFs don't
    * share subexpressions). Emits per doc:
    * n_tokens, n_distinct, sum_len, per-language stopword hits, cjk/punct/
    * upper ratios, plus derived avg_word_len, stop_ratio_<lang>, quality,
    * lang_guess. */
  def textStatsFrame(docs: org.apache.spark.sql.DataFrame, textCol: String, idCol: String): org.apache.spark.sql.DataFrame = {
    // Doc-level character stats in their own projection: keeping them out of
    // the post-explode plan stops CollapseProject from re-running the
    // regexps once per TOKEN row. Rejoined on id after the aggregate.
    val docStats = docs.select(col(idCol).as("id"),
      length(col(textCol)).as("n_chars_m"),
      cjkRatio(col(textCol)).as("cjk"),
      punctRatio(col(textCol)).as("punct_ratio"),
      upperRatio(col(textCol)).as("upper_ratio"))
    val hitAggs = LangInventories.map { case (lang, words) =>
      count_if(col("t").isInCollection(words)).as(s"hits_$lang")
    }
    val counts = docs
      .select(col(idCol).as("id"), explode_outer(tokens(col(textCol))).as("t"))
      .groupBy(col("id"))
      .agg(count(col("t")).as("n_tokens"),
        (Seq(count_distinct(col("t")).as("n_distinct"),
          coalesce(sum(length(col("t"))), lit(0L)).as("sum_len")) ++ hitAggs): _*)
      .join(docStats, "id")
    val n = col("n_tokens")
    def ratio(c: Column): Column = when(n === 0, 0.0).otherwise(c.cast("double") / n)
    val mwl = ratio(col("sum_len"))
    val stopEn = ratio(col("hits_en"))
    val scored = LangInventories.map { case (lang, _) => (lang, ratio(col(s"hits_$lang"))) }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scored.foldRight(lit("und")) { case ((lang, score), acc) =>
      when(score === best && best > 0.0, lang).otherwise(acc)
    }
    val quality =
      least(col("n_chars_m").cast("double") / 500.0, lit(1.0)) * 0.3 +
        least(stopEn * 4.0, lit(1.0)) * 0.3 +
        when(mwl.between(3.0, 10.0), 1.0).otherwise(0.5) * 0.2 +
        greatest(lit(0.0), lit(1.0) - col("punct_ratio") * 5.0) * 0.2
    counts.select(col("id"), col("n_chars_m"), col("n_tokens"), col("n_distinct"),
      round(mwl, 4).as("avg_word_len"),
      round(col("punct_ratio"), 4).as("punct_ratio"),
      round(col("upper_ratio"), 4).as("upper_ratio"),
      round(stopEn, 4).as("stop_ratio"),
      round(quality, 4).as("quality"),
      when(col("cjk") > 0.05, "zh").otherwise(pick).as("lang_guess"),
      round(stopEn, 4).as("en_score"))
  }

  /** Gopher-style repetition signals (Rae et al. 2021, §A1.1 analogs over a
    * flat token stream): per document, the duplicate-word fraction
    * (1 − distinct/total), the top-word fraction (most frequent word's share
    * of all tokens) and the top-bigram fraction. High values flag boilerplate
    * and degenerate repetition that pre-training filters drop.
    *
    * Scale shape: one explode of the token pipeline, one exchange on id
    * (the bigram lead() window); both the word-count and bigram-count
    * aggregates consume that same exchange (ReuseExchange caches its
    * output), so the document scan runs once. All aggregates are codegen'd
    * with map-side combine; no HOF is referenced twice.
    */
  def repetitionFrame(docs: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol).as("id"),
      posexplode_outer(tokens(col(textCol)))).toDF("id", "pos", "w")
    // lead() over token position builds bigrams without a second HOF pass
    val base = tok.withColumn("nxt",
      lead(col("w"), 1).over(Window.partitionBy(col("id")).orderBy(col("pos"))))
    val wordAgg = base.filter(col("w").isNotNull)
      .groupBy(col("id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(max(col("c")).as("top_w"), sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"))
    val biAgg = base.filter(col("w").isNotNull && col("nxt").isNotNull)
      .select(col("id"), concat(col("w"), lit(" "), col("nxt")).as("b"))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("id"))
      .agg(max(col("c")).as("top_b"), sum(col("c")).as("n_bigrams"))
    def frac(num: Column, den: Column): Column =
      when(coalesce(den, lit(0L)) === 0, 0.0)
        .otherwise(num.cast("double") / den)
    docs.select(col(idCol).as("id"))
      .join(wordAgg, Seq("id"), "left")
      .join(biAgg, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
        round(frac(col("n_tokens") - col("n_distinct"), col("n_tokens")), 4)
          .as("dup_word_frac"),
        round(frac(col("top_w"), col("n_tokens")), 4).as("top_word_frac"),
        round(frac(col("top_b"), col("n_bigrams")), 4).as("top_bigram_frac"))
  }

  /** Gopher-style quality GATE battery (Rae et al. 2021 §A1.1 — the
    * document-filter rules a pre-training pipeline applies before anything
    * touches the tokenizer): per document,
    *
    *  - word count within `[minWords, maxWords]`;
    *  - mean word length within `[3, 10]`;
    *  - fraction of words containing an alphabetic character ≥ 0.7;
    *  - at least 2 DISTINCT stopwords (the fluent-prose test);
    *  - ellipsis ("...") occurrences per word ≤ 0.1.
    *
    * Returns one row per doc: the raw signals plus one boolean per gate and
    * the conjunction `pass`. All integer-derived ratios compare against
    * decimal literals both engines parse identically, so the gate decisions
    * replay bit-for-bit in the oracle.
    *
    * Scale shape: ONE explode of the shared token stream into one id-keyed
    * aggregate (map-side combined), the per-doc character counts in their
    * own pre-explode projection (same CollapseProject fence as
    * [[textStatsFrame]]), one join back on id. No HOF is referenced twice.
    */
  def gopherGates(docs: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String, minWords: Long = 30L, maxWords: Long = 100000L): DataFrame = {
    val docStats = docs.select(col(idCol).as("id"),
      // '...' occurrences via length delta — scan-side arithmetic, and the
      // exact expression DuckDB replays with replace()
      ((length(col(textCol)) -
        length(replace(col(textCol), lit("..."), lit("")))) / 3)
        .cast("long").as("n_ellipsis"))
    val tok = docs.select(col(idCol).as("id"), explode_outer(tokens(col(textCol))).as("w"))
    val sig = tok.groupBy(col("id")).agg(
      count(col("w")).as("n_words"),
      coalesce(sum(length(col("w"))), lit(0L)).as("sum_len"),
      count_if(col("w").rlike("[a-z]")).as("n_alpha"),
      count_distinct(when(col("w").isInCollection(EnglishStopwords), col("w")))
        .as("n_stop_distinct"))
    val n = col("n_words")
    def frac(c: Column): Column =
      when(n === 0, 0.0).otherwise(c.cast("double") / n.cast("double"))
    sig.join(docStats, "id")
      .withColumn("mean_word_len", frac(col("sum_len")))
      .withColumn("alpha_frac", frac(col("n_alpha")))
      .withColumn("ellipsis_per_word", frac(col("n_ellipsis")))
      .withColumn("gate_words", n >= minWords && n <= maxWords)
      .withColumn("gate_mean_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("gate_alpha", col("alpha_frac") >= 0.7)
      .withColumn("gate_stop", col("n_stop_distinct") >= 2L)
      .withColumn("gate_symbol", col("ellipsis_per_word") <= 0.1)
      .withColumn("pass", col("gate_words") && col("gate_mean_len") &&
        col("gate_alpha") && col("gate_stop") && col("gate_symbol"))
  }
}
