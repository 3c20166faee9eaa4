package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ClusterSplitSpec extends SparkSpec {
  import spark.implicits._

  // the query composition: LSH pairs -> components -> hashSplit(cluster)
  private def clusterSplit(docs: DataFrame): Map[Long, (Long, String)] = {
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", k = 32).localCheckpoint()
    val pairs = Dedup.minhashNearDupsFromSigs(sigs, bands = 8, rows = 4, threshold = 0.5)
    val comps = Dedup.connectedComponents(pairs.select(col("id1"), col("id2")))
    Dedup.rotateCheckpoints("ClusterSplitSpec", sigs, comps)
    docs.select(col("doc_id"))
      .join(comps.select(col("id").as("doc_id"), col("label")), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("label"), col("doc_id")).as("cluster_id"))
      .withColumn("split", Sampling.hashSplit(col("cluster_id")))
      .as[(Long, Long, String)].collect().map { case (d, c, s) => d -> ((c, s)) }.toMap
  }

  private def plainSplits(ids: Seq[Long]): Map[Long, String] =
    ids.toDF("doc_id").withColumn("s", Sampling.hashSplit(col("doc_id")))
      .as[(Long, String)].collect().toMap

  test("near-duplicates always share a split, keyed on the min cluster id") {
    val plain = plainSplits(1L to 300L)
    // a doc-id pair the PLAIN split would separate — the leakage case
    val trainId = (1L to 300L).find(plain(_) == "train").get
    val evalId = (1L to 300L).find(plain(_) != "train").get
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val others = (1L to 300L).filterNot(i => i == trainId || i == evalId)
      .map(i => (i, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h"))
    val docs = (others :+ (trainId, shared) :+ (evalId, shared)).toDF("doc_id", "text")

    val m = clusterSplit(docs)
    val clusterKey = math.min(trainId, evalId)
    assert(m(trainId) === ((clusterKey, plain(clusterKey))),
      "dup must adopt the cluster key's split")
    assert(m(evalId) === ((clusterKey, plain(clusterKey))),
      s"near-dup of a ${plain(trainId)} doc leaked into ${plain(evalId)}")
    assert(m(trainId)._2 === m(evalId)._2, "cluster members must share a split")
  }

  test("singleton docs match the plain doc-id split exactly") {
    val ids = 1L to 60L
    val docs = ids.map(i => (i, s"s${i}a s${i}b s${i}c s${i}d s${i}e s${i}f")).toDF("doc_id", "text")
    val plain = plainSplits(ids)
    val m = clusterSplit(docs)
    ids.foreach { i => assert(m(i) === ((i, plain(i)))) }
  }
}
