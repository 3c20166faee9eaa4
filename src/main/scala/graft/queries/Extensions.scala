package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Dedup, Hll, Multimodal, Ranking, Similarity, StoreCompaction, TextAnalysis => TA}

/** Training-data-pipeline extension surface over documents/embeddings:
  * deduplication, similarity search, text analysis, multimodal plumbing.
  *
  * Oracle policy: everything whose semantics DuckDB can replicate exactly
  * (token stats, quality features, language ID, md5 fingerprints, exact dedup
  * groups, n-gram Jaccard, cosine top-k / near-dup pairs, hyperplane-LSH and
  * IVF ANN + their recall@10, multimodal metadata, and the FNV-1a-based
  * sketches: MinHash signatures, LSH pair-finding, SimHash) is
  * oracle-checked value-for-value — the ANN oracles embed the same
  * deterministic hyperplane constants and replay the bucket/assign/probe
  * math in SQL, and the sketch oracles replay the FNV-1a byte loop +
  * affine permutations + banding in SQL (the hash basis is FNV-1a rather
  * than xxhash64 precisely so this replay is possible; see
  * [[graft.functions.Fnv]]). The only remaining rows-only entries are
  * engine-internal sketches (HLL) and the stub-codec multimodal lane, each
  * with an exact-checked sibling.
  */
object Extensions {

  /** Concatenated registry over the domain objects — the split is purely
    * structural; key set and per-key behavior are byte-identical to the
    * former monolith. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ExtText.queries ++ ExtTrain.queries ++ ExtDedup.queries ++
      ExtSim.queries ++ ExtEvents.queries ++ ExtDiag.queries ++
      ExtPipe.queries

  def oracles: Map[String, String] = oraclesBase +
    // the gRPC-transported flagship pipeline produces byte-identical
    // envelopes to the in-process generator (GrpcChainSpec parity), so the
    // same recursive-CTE fold replay is its exact oracle
    ("pipeline_e2e_grpc" -> oraclesBase("pipeline_e2e_chain")) +
    // ... and the HTTP-sink round trip must likewise be invisible: the
    // table read back from the loopback ClickHouse endpoint folds to the
    // same per-fork counts the generator arithmetic predicts
    ("pipeline_e2e_http" -> oraclesBase("pipeline_e2e_chain")) +
    ("train_bpe_learn" -> ExtShared.bpeLearnOracle(8)) +
    ("train_bpe_apply_learned" -> ExtShared.bpeApplyOracle(8))

  private def oraclesBase: Map[String, String] =
    ExtText.oracles ++ ExtTrain.oracles ++ ExtDedup.oracles ++
      ExtSim.oracles ++ ExtEvents.oracles ++ ExtDiag.oracles ++
      ExtPipe.oracles

  // Test-visible forwarders (BoundedWindowSpec) — implementations moved to
  // ExtShared with the split.
  private[graft] def skylinePoints(s: SparkSession, d: String): DataFrame =
    ExtShared.skylinePoints(s, d)
  private[graft] def skylineSurvivors(pts: DataFrame): DataFrame =
    ExtShared.skylineSurvivors(pts)
  private[graft] def wmedianBucketed(s: SparkSession, d: String): DataFrame =
    ExtShared.wmedianBucketed(s, d)
  private[graft] val WmedianBuckets: Int = ExtShared.WmedianBuckets
}
