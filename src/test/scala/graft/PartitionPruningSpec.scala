package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Scale pattern proof: a Hive-partitioned layout turns an equality filter
  * on the partition column into directory pruning — the scan lists only the
  * matching partition's files and the predicate never runs against row data.
  * At 100 TB, partitioning on a low-cardinality routing column (language,
  * date, table) is what keeps selective queries from touching the whole
  * corpus. */
class PartitionPruningSpec extends SparkSpec {

  test("partitioned write + filtered read prunes to one partition") {
    val d = "/root/testdata/sf0.001"
    val path = java.nio.file.Files.createTempDirectory("graft_prune").toString
    Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").partitionBy("lang").parquet(path)

    val nLangs = Tables.documents(spark, d)
      .select(col("lang")).distinct().count()
    assert(nLangs > 1, "fixture must have several languages for the test to bite")

    val filtered = spark.read.parquet(path).filter(col("lang") === "en")
    filtered.collect()
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
    // the lang predicate must be a partition filter (directory pruning),
    // not a data filter evaluated per row
    assert(scan.partitionFilters.exists(_.toString.contains("lang")),
      s"lang filter not pushed to partition pruning: ${scan.partitionFilters}")
    assert(scan.dataFilters.isEmpty,
      s"lang filter leaked into data filters: ${scan.dataFilters}")
    // and the pruned listing returns strictly fewer files than exist
    val prunedFiles = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters)
      .flatMap(_.files).length
    assert(scan.relation.location.inputFiles.length > prunedFiles,
      "scan did not prune any partition")

    // correctness of the round trip: same rows as filtering the original
    val expected = Tables.documents(spark, d)
      .filter(col("lang") === "en").count()
    assert(filtered.count() === expected)
  }
}
