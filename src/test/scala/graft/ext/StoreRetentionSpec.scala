package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generation lifecycle over the versioned BM25 store (VERDICT r16 #6):
  * the gen stamps already make the store a time-travel log — this pins the
  * two contract halves. As-of-g probes must equal a fresh ranking of the
  * corpus as it stood at g, for EVERY g; retention must preserve all views
  * at/above its floor bit-identically while rejecting the folded ones
  * loudly. */
class StoreRetentionSpec extends SparkSpec {
  import spark.implicits._

  private val d = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, d).filter(col("doc_id") < 200)
  private val terms = IncrementalPipeline.Terms

  // corpus as of each generation: gen 0 = all 200; gen 1 deletes %7==3 and
  // revises %11==0 (delete + re-add); gen 2 deletes %5==1
  private def rev(df: DataFrame): DataFrame =
    df.withColumn("text", when(col("doc_id") % 11 === 0,
      concat(col("text"), lit(" rev2"))).otherwise(col("text")))
  private def corpusAt(g: Int): DataFrame = g match {
    case 0 => docs
    case 1 => rev(docs).filter(col("doc_id") % 7 =!= 3)
    case _ => rev(docs).filter(col("doc_id") % 7 =!= 3 && col("doc_id") % 5 =!= 1)
  }

  /** Three-generation store under `root`: the full delete/re-add/delete
    * history. */
  private def buildStore(root: String): Unit = {
    Ranking.bm25WriteVersioned(corpusAt(0), "text", "doc_id", root, gen = 0)
    val dead1 = docs.filter(col("doc_id") % 7 === 3 || col("doc_id") % 11 === 0)
      .select(col("doc_id").as("id"))
    Ranking.bm25DeleteVersioned(spark, root, dead1, beforeGen = 1)
    val up1 = rev(docs).filter(col("doc_id") % 11 === 0 && col("doc_id") % 7 =!= 3)
    Ranking.bm25WriteVersioned(up1, "text", "doc_id", root, gen = 1)
    val dead2 = corpusAt(1).filter(col("doc_id") % 5 === 1)
      .select(col("doc_id").as("id"))
    Ranking.bm25DeleteVersioned(spark, root, dead2, beforeGen = 2)
  }

  private def freshRank(g: Int): Seq[String] =
    Ranking.bm25TopK(corpusAt(g), "text", "doc_id", terms, k = 20)
      .collect().map(_.toString).toSeq

  private def asOf(root: String, g: Int): Seq[String] =
    Ranking.bm25TopKVersionedStoreAsOf(spark, root, terms, asOfGen = g)
      .collect().map(_.toString).toSeq

  private def tmpRoot(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_retention_$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("as-of probes equal a fresh ranking of each generation's corpus, current view included") {
    val root = tmpRoot("asof")
    buildStore(root)
    for (g <- 0 to 2)
      assert(asOf(root, g) === freshRank(g), s"as-of gen $g")
    // the current-view probe is the as-of of the newest generation
    val current = Ranking.bm25TopKVersionedStore(spark, root, terms)
      .collect().map(_.toString).toSeq
    assert(current === freshRank(2))
  }

  test("retention at gen 1 keeps views >= 1 bit-identical, physically drops dead rows, rejects gen 0") {
    val root = tmpRoot("retain")
    buildStore(root)
    val before1 = asOf(root, 1)
    val before2 = asOf(root, 2)
    val dlBefore = spark.read.parquet(root + "/doclen").count()

    Ranking.bm25RetainGenerations(spark, root, minGen = 1)

    assert(asOf(root, 1) === before1, "gen-1 view survives retention")
    assert(asOf(root, 2) === before2, "gen-2 view survives retention")
    val dlAfter = spark.read.parquet(root + "/doclen").count()
    assert(dlAfter < dlBefore, "rows dead as of gen 1 are physically gone")
    // the folded manifest rows are pruned; the gen-2 tombstones remain
    val tomb = spark.read.parquet(root + "/tomb")
    assert(tomb.filter(col("before_gen") <= 1).count() === 0)
    assert(tomb.filter(col("before_gen") === 2).count() > 0)

    val e = intercept[IllegalArgumentException](asOf(root, 0))
    assert(e.getMessage.contains("folded away by retention"))
    assert(StoreCompaction.readAsOfFloor(root) === 1)
  }

  test("retention is idempotent and composes: a second pass at a higher floor") {
    val root = tmpRoot("compose")
    buildStore(root)
    Ranking.bm25RetainGenerations(spark, root, minGen = 1)
    val v2a = asOf(root, 2)
    Ranking.bm25RetainGenerations(spark, root, minGen = 1) // idempotent
    assert(asOf(root, 2) === v2a)
    assert(asOf(root, 1) === freshRank(1))

    Ranking.bm25RetainGenerations(spark, root, minGen = 2)
    assert(asOf(root, 2) === v2a, "the newest view survives full retention")
    assert(spark.read.parquet(root + "/doclen")
      .join(corpusAt(2).select(col("doc_id").as("id")), Seq("id"), "left_anti")
      .count() === 0, "only live-at-2 rows remain on disk")
    val e = intercept[IllegalArgumentException](asOf(root, 1))
    assert(e.getMessage.contains("floor is 2"))
    // floors never lower: re-running the gen-1 pass cannot resurrect claims
    Ranking.bm25RetainGenerations(spark, root, minGen = 1)
    assert(StoreCompaction.readAsOfFloor(root) === 2)
  }
}
