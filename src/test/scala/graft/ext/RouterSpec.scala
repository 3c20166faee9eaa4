package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The router-audit classifier's machinery, proven on corpora whose signal
  * WE control — the complement to the declared lane, whose chance-level
  * result on the synthetic corpus is the audit's correct no-signal finding
  * (text ⊥ metadata there, verified against a log-NB prototype during
  * development). */
class RouterSpec extends SparkSpec {
  import spark.implicits._

  /** 4 classes × 40 docs with REAL class→vocabulary signal: each class
    * writes mostly its own jargon plus shared filler; labels are assigned
    * independently of doc_id parity (the split dimension). */
  private def plantedDocs = {
    val vocab = Map(
      "news" -> Seq("election", "minister", "policy", "vote"),
      "code" -> Seq("compile", "pointer", "runtime", "stack"),
      "legal" -> Seq("plaintiff", "statute", "liability", "clause"),
      "med" -> Seq("diagnosis", "dosage", "clinical", "symptom"))
    val classes = vocab.keys.toSeq.sorted
    val rows = for (i <- 0 until 160) yield {
      // (i/2) % 4, NOT i % 4: the split is on doc parity, so i % 4 would
      // hand even classes to train and odd to test — the same degeneracy
      // the declared lane documents for source = src{doc_id % 20}
      val cls = classes((i / 2) % 4)
      val own = vocab(cls)
      // deterministic token stream: 12 class tokens + 4 shared fillers
      val toks = (0 until 12).map(j => own((i * 7 + j) % own.size)) ++
        Seq("the", "a", "data", "report")
      (i.toLong, cls, toks.mkString(" "))
    }
    rows.toDF("doc_id", "domain", "text")
  }

  test("planted signal: the centroid router learns the vocabulary -> class map exactly") {
    val audit = Router.centroidAudit(plantedDocs, "domain", col("doc_id") % 2 === 0)
    val rows = audit.collect()
    assert(rows.length === 80, "half the corpus is the test split")
    assert(rows.forall(_.getAs[Boolean]("correct")),
      "with real class->vocabulary signal the audit must score 1.0 — " +
        "chance-level on the fixture corpus is therefore the CORPUS, not the machinery")
  }

  test("determinism: two runs produce identical prediction frames") {
    val a = Router.centroidAudit(plantedDocs, "domain", col("doc_id") % 2 === 0)
      .collect().map(_.toString).toSeq
    val b = Router.centroidAudit(plantedDocs, "domain", col("doc_id") % 2 === 0)
      .collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("vocabulary cap: top-k-per-class profile still learns the planted signal exactly") {
    // each class's 4 jargon words dominate its term counts (≈3 uses/doc vs
    // 1 for the shared fillers), so a cap of 4 keeps EXACTLY the signal
    // vocabulary and drops the fillers — the CCNet truncation must not
    // cost accuracy when the head terms carry the signal
    val audit = Router.centroidAudit(plantedDocs, "domain",
      col("doc_id") % 2 === 0, maxTermsPerClass = 4)
    val rows = audit.collect()
    assert(rows.length === 80)
    assert(rows.forall(_.getAs[Boolean]("correct")),
      "a df-head cap that keeps the signal terms must not move accuracy")
  }

  test("vocabulary cap above the vocabulary is a no-op (bit-identical predictions)") {
    val uncapped = Router.centroidAudit(plantedDocs, "domain",
      col("doc_id") % 2 === 0, maxTermsPerClass = Int.MaxValue)
      .collect().map(_.toString).toSeq
    val default = Router.centroidAudit(plantedDocs, "domain",
      col("doc_id") % 2 === 0)
      .collect().map(_.toString).toSeq
    assert(default === uncapped,
      "the default 4096 cap never binds on a sub-4096 vocabulary")
  }

  test("zero profile overlap classifies to the lexicographically smallest class (tie policy)") {
    val docs = Seq(
      (0L, "beta", "xx yy"), (2L, "alpha", "xx yy"), // train: both classes
      (1L, "beta", "zz qq")                          // test: NO shared words
    ).toDF("doc_id", "domain", "text")
    val audit = Router.centroidAudit(docs, "domain", col("doc_id") % 2 === 0)
    val r = audit.collect()
    assert(r.length === 1)
    assert(r.head.getAs[String]("pred_domain") === "alpha",
      "all-zero scores tie-break to the smallest class label in both engines")
  }
}
