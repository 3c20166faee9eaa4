package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import graft.ext.{TextAnalysis => TA}

  test("token and subword counts on known strings") {
    import spark.implicits._
    val df = Seq(
      ("hello world", 2),
      ("  spaced   out  tokens ", 3),
      ("", 0),
      ("one", 1)
    ).toDF("text", "expect")
    df.select(TA.tokenCount(col("text")).as("n"), col("expect")).collect()
      .foreach(r => assert(r.getInt(0) === r.getInt(1)))
    val sub = Seq(("don't stop, now!", "x")).toDF("text", "x")
      .select(TA.subwordCount(col("text"))).collect().head.getInt(0)
    // don / ' / t | stop / , | now / ! -> 7 pieces
    assert(sub === 7)
  }

  test("quality features on crafted docs") {
    import spark.implicits._
    val clean = "the cat sat on the mat and it was a good day for all of us"
    val junk = "@@@@ ### $$$$ %%%% ^^^^ &&&&"
    val df = Seq(("c", clean), ("j", junk)).toDF("k", "text")
      .select(col("k"), TA.qualityScore(col("text")).as("q"),
        TA.punctRatio(col("text")).as("p"), TA.stopwordRatio(col("text")).as("s"))
    val m = df.collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(m("c")._1 > m("j")._1, s"clean ${m("c")} should outscore junk ${m("j")}")
    assert(m("j")._2 > 0.5, "junk is mostly punctuation")
    assert(m("c")._3 > 0.4, "clean prose has stopwords")
  }

  test("language ID on real multilingual snippets") {
    import spark.implicits._
    val df = Seq(
      ("en", "the quick brown fox jumps over the lazy dog and it was not a problem for they have seen this before"),
      ("fr", "le chat est sur la table et nous avons une maison dans les montagnes pour que vous soyez avec nous"),
      ("de", "der hund ist in dem garten und wir haben eine katze die nicht mit auf den berg kommen will"),
      ("es", "el perro está en la casa y nosotros tenemos un gato que no quiere subir al monte con sus amigos"),
      ("zh", "今天天气很好我们一起去公园散步然后吃饭")
    ).toDF("expect", "text")
    val got = df.select(col("expect"), TA.langId(col("text")).as("guess")).collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("textStatsFrame (scale path) agrees with the inline column functions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox and the lazy dog"),
      (2L, ""),
      (3L, "le chat est sur la table et nous avons une maison dans les montagnes"),
      (4L, "@@@@ ###")
    ).toDF("doc_id", "text")
    val frame = TA.textStatsFrame(docs, "text", "doc_id")
      .select("id", "n_tokens", "avg_word_len", "stop_ratio", "quality", "lang_guess")
      .collect().map(r => r.getLong(0) -> r).toMap
    val inline = docs.select(col("doc_id"),
      TA.tokenCount(col("text")).as("n"),
      round(TA.meanWordLen(col("text")), 4).as("mwl"),
      round(TA.stopwordRatio(col("text")), 4).as("sr"),
      round(TA.qualityScore(col("text")), 4).as("q"),
      TA.langId(col("text")).as("lang"))
      .collect().map(r => r.getLong(0) -> r).toMap
    inline.keys.foreach { id =>
      assert(frame(id).getLong(1) === inline(id).getInt(1).toLong, s"n_tokens doc $id")
      assert(frame(id).getDouble(2) === inline(id).getDouble(2), s"avg_word_len doc $id")
      assert(frame(id).getDouble(3) === inline(id).getDouble(3), s"stop_ratio doc $id")
      assert(frame(id).getDouble(4) === inline(id).getDouble(4), s"quality doc $id")
      assert(frame(id).getString(5) === inline(id).getString(5), s"lang doc $id")
    }
  }

  test("repetition signals on constructed docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a b"),          // 4 toks, 2 distinct; top word a=3; bigrams: "a a"×2, "a b" → top 2/3
      (2L, "x y z"),            // no repetition at all
      (3L, "go go go go"),      // fully degenerate
      (4L, "")                  // empty → all zeros
    ).toDF("doc_id", "text")
    val m = TA.repetitionFrame(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(1) === 4 && m(1L).getLong(2) === 2)
    assert(m(1L).getDouble(3) === 0.5)      // dup_word_frac
    assert(m(1L).getDouble(4) === 0.75)     // top_word_frac
    assert(m(1L).getDouble(5) === 0.6667)   // top_bigram_frac 2/3
    assert(m(2L).getDouble(3) === 0.0 && m(2L).getDouble(4) === 0.3333)
    assert(m(3L).getDouble(3) === 0.75 && m(3L).getDouble(4) === 1.0 &&
      m(3L).getDouble(5) === 1.0)
    assert(m(4L).getLong(1) === 0 && m(4L).getDouble(3) === 0.0 &&
      m(4L).getDouble(5) === 0.0)
  }

  test("fingerprint: whitespace/case normalization collapses, content differs") {
    import spark.implicits._
    val df = Seq(
      ("a", "Hello   World"),
      ("b", "hello world"),
      ("c", "hello worlds")
    ).toDF("k", "text").select(col("k"), TA.fingerprint(col("text")).as("fp"))
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m("a") === m("b"))
    assert(m("a") !== m("c"))
    // md5 well-known value sanity: md5("hello world")
    assert(m("b") === "5eb63bbbe01eeed093cb22bb8f5acdc3")
  }

  test("boilerplate n-grams: doc frequency counts each doc once, ties break on text") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val boiler = "all rights reserved by example corp"
    val docs = Seq(
      (1L, s"unique alpha words here $boiler"),
      (2L, s"$boiler and other content follows now"),
      (3L, s"totally different body $boiler trailing words"),
      // repeated gram INSIDE one doc must still count once for that doc
      (4L, s"spam spam spam spam spam spam spam spam spam spam")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.topNgramsByDocFreq(docs, "text", "doc_id", n = 5, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.head._2 === 3L, s"boilerplate gram must lead: ${top.toSeq}")
    assert(top.head._1.contains("rights reserved"), s"got ${top.toSeq}")
    // doc 4's self-repeated gram counts once
    val spam = TextAnalysis.topNgramsByDocFreq(docs, "text", "doc_id", n = 5, k = 100)
      .filter(col("ngram") === "spam spam spam spam spam").collect()
    assert(spam.length === 1 && spam(0).getLong(1) === 1L)
  }

  test("PII scrub: emails, phones, IPv4 redacted; counts match replacements") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Seq(
      ("reach me at jane.doe+spam@corp.example.org thanks", 1, 0, 0),
      ("call +1-555-0123-0199 or +44-207-946-0958 now", 0, 2, 0),
      ("server 192.168.0.1 and 10.20.30.40 are down", 0, 0, 2),
      ("a@b.co from 1.2.3.4 dial +1-555-010-0100", 1, 1, 1),
      ("no pii here, just text 12345", 0, 0, 0)).toDF("text", "e", "p", "i")
    val (ne, np, ni) = TextAnalysis.piiCounts(col("text"))
    val out = docs.select(col("e"), col("p"), col("i"),
      ne.as("ne"), np.as("np"), ni.as("ni"),
      TextAnalysis.piiScrub(col("text")).as("scrubbed")).collect()
    out.foreach { r =>
      assert(r.getAs[Int]("ne") === r.getAs[Int]("e"), s"emails in: $r")
      assert(r.getAs[Int]("np") === r.getAs[Int]("p"), s"phones in: $r")
      assert(r.getAs[Int]("ni") === r.getAs[Int]("i"), s"ips in: $r")
    }
    // nothing redactable survives the scrub
    val rescan = docs.select(TextAnalysis.piiScrub(col("text")).as("text"))
    val (ne2, np2, ni2) = TextAnalysis.piiCounts(col("text"))
    val residue = rescan.select((ne2 + np2 + ni2).as("n")).agg(sum("n")).head().getLong(0)
    assert(residue === 0L, "scrubbed text must contain no remaining PII matches")
    // placeholders present
    val s = out.map(_.getAs[String]("scrubbed")).mkString(" ")
    assert(s.contains("<EMAIL>") && s.contains("<PHONE>") && s.contains("<IP>"))
  }

  test("bigramLmScores: hand-computed add-one conditionals, short docs score 0") {
    import spark.implicits._
    val docs = Seq(
      // c(a b)=2, c(a c)=1, c(a.)=3, V = |{b, c}| = 2
      (1L, "a b"), (2L, "a b"), (3L, "a c"),
      (4L, "solo"), (5L, "")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.bigramLmScores(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map { case (id, n, p) => id -> ((n, p)) }.toMap
    assert(m(1L) === ((1L, 0.6)), "p(b|a) = (2+1)/(3+2)")
    assert(m(2L) === ((1L, 0.6)))
    assert(m(3L) === ((1L, 0.4)), "p(c|a) = (1+1)/(3+2)")
    assert(m(4L) === ((0L, 0.0)), "one token -> no bigrams")
    assert(m(5L) === ((0L, 0.0)), "empty doc")
  }

  test("bigramLmScores: replicated docs outscore a gibberish outlier") {
    import spark.implicits._
    val common = "the quick brown fox jumps over the lazy dog"
    val docs = ((1L to 8L).map(i => (i, common)) :+
      (9L, "zxq wvu tsr qpo nml")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScores(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().map { case (id, _, p) => id -> p }.toMap
    // smoothing is the point: unsmoothed MLE would give the outlier's
    // never-repeated bigrams probability 1.0 and call gibberish typical
    assert(out(1L) > 0.4, s"replicated text must look typical, got ${out(1L)}")
    assert(out(9L) < 0.2, s"gibberish must look atypical, got ${out(9L)}")
    assert(out(9L) < out(1L))
  }

  test("chunkFrame: window geometry, overlap content, short and empty docs") {
    import spark.implicits._
    // 10 tokens, chunkSize 4, overlap 1 -> stride 3 -> ceil(9/3) = 3 chunks
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"),
      (2L, "a b"), // short: one whole-doc chunk
      (3L, "")     // empty: no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkFrame(docs, "text", "doc_id", chunkSize = 4, overlap = 1)
      .orderBy("id", "chunk_idx")
      .collect()
    val byDoc = out.groupBy(_.getLong(0))
    assert(byDoc(1L).length === 3)
    assert(!byDoc.contains(3L), "empty docs must produce no chunks")
    // doc 1 windows: [t0..t3], [t3..t6], [t6..t9] — adjacent chunks share
    // exactly the 1-token overlap; verify via the md5 of the expected text
    val expected = Seq("t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9")
    val md5s = docs.sparkSession.range(1).select(
      expected.map(e => md5(lit(e).cast("binary")).as(e)): _*).head()
    byDoc(1L).zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(2) === 4L, s"chunk $i width")
      assert(r.getString(3) === md5s.getString(i), s"chunk $i content")
    }
    assert(byDoc(2L).map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((0L, 2L)),
      "short doc: a single short chunk at index 0")
  }

  test("chunkFrame: every token is covered and consecutive chunks overlap") {
    import spark.implicits._
    val docs = Seq((1L, (0 until 53).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.chunkFrame(docs, "text", "doc_id", chunkSize = 16, overlap = 4)
      .orderBy("chunk_idx").collect()
    // stride 12: ceil((53-4)/12) = 5 chunks; last starts at 48, width 5
    assert(out.length === 5)
    assert(out.last.getLong(2) === 5L)
    val widths = out.map(_.getLong(2))
    // total tokens counted with overlap = 53 + 4 overlaps * 4 shared tokens
    assert(widths.sum === 53L + 4 * 4)
  }

  test("cdcChunks: geometry is a partition of the token stream") {
    import spark.implicits._
    val text = (0 until 200).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.cdcChunks(docs, "text", "doc_id", meanTokens = 16)
      .orderBy("chunk_idx").collect()
    assert(out.forall(_.getLong(0) === 1L), "empty doc must produce no chunks")
    // chunks tile the stream: indexes 0..n-1, starts contiguous, counts sum
    assert(out.map(_.getLong(1)).toSeq === out.indices.map(_.toLong))
    assert(out.map(_.getLong(3)).sum === 200L)
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) === a.getLong(2) + a.getLong(3), "starts abut")
    case _ => }
  }

  test("cdcChunks: chunk identity survives a prefix insertion (the CDC property)") {
    import spark.implicits._
    val words = (0 until 300).map(i => s"tok$i")
    // pick a prefix whose insertion creates NO new boundary: neither the
    // lone "[prefix]" window nor the "[prefix tok0]" pair may cut (and the
    // original "[tok0]" head window must not cut either, else the two docs'
    // first boundaries misalign by construction)
    def cuts(s: String): Boolean = spark.range(1).select(
      pmod(graft.functions.Fnv.fnv1a64(lit(s)), lit(16L)) === 0L).head().getBoolean(0)
    assert(!cuts("tok0"), "fixture head token must not be a boundary")
    val prefix = Seq("alpha", "beta", "gamma", "delta")
      .find(w => !cuts(w) && !cuts(s"$w tok0")).get
    val docs = Seq(
      (1L, words.mkString(" ")),
      (2L, (prefix +: words).mkString(" "))).toDF("doc_id", "text")
    val chunks = TextAnalysis.cdcChunks(docs, "text", "doc_id", meanTokens = 16)
      .orderBy("id", "chunk_idx").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(4)).toSeq).toMap
    assert(chunks(1L).size === chunks(2L).size)
    assert(chunks(1L).head !== chunks(2L).head,
      "the first chunk absorbs the inserted token")
    assert(chunks(1L).tail === chunks(2L).tail,
      "every chunk after the first boundary must be identical — fixed-stride " +
        "windows would shift globally here")
  }

  test("feature hashing: FNV buckets, tf counts, idf weights replicate driver-side") {
    import spark.implicits._
    val docs = Seq((0L, "aa bb aa"), (1L, "bb cc"), (2L, "dd"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.featureHashFrame(docs, "text", "doc_id", dims = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    def bucket(t: String): Int = {
      val h = graft.functions.Fnv.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      (((h % 8) + 8) % 8).toInt
    }
    // driver-side replica: tf per (doc, bucket), df per bucket, n = 3
    val tf = Seq((0L, "aa", 2), (0L, "bb", 1), (1L, "bb", 1), (1L, "cc", 1), (2L, "dd", 1))
      .groupBy { case (id, t, _) => (id, bucket(t)) }
      .view.mapValues(_.map(_._3).sum).toMap
    val df = tf.keySet.groupBy(_._2).view.mapValues(_.size).toMap
    val expect = tf.map { case ((id, dim), f) =>
      (id, dim) -> BigDecimal(f * math.log((3 + 1.0) / (df(dim) + 1.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got === expect)
  }
}
