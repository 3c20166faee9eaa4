package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-shaped upsert for the relational lake — the batch complement of
  * the JDBC sink's replace-on-PK idiom (`sink/SqlDialect.scala`: Derby's
  * delete-then-insert, ClickHouse's ReplacingMergeTree): `MERGE INTO
  * target USING source ON pk WHEN MATCHED THEN UPDATE (replace the row)
  * WHEN NOT MATCHED THEN INSERT`, expressed relationally as
  * anti-join + union — the form every engine optimizes well and any SQL
  * oracle replays verbatim.
  *
  * Scale shape: a CDC delta is small next to the target, so the anti-join
  * broadcasts the source's PK set (default) and the target NEVER shuffles —
  * the merge is a single pass over the target scan plus a union, and
  * writing the result back `bucketBy(pk)` (see [[BucketedLayout]]) keeps
  * the layout's zero-exchange join property across generations. With a
  * corpus-sized source, set `broadcastSource = false` for a shuffled SMJ
  * anti (both sides hash on pk — the same cost any MERGE pays).
  *
  * ANSI MERGE precondition: source PKs must be unique (a multi-match is an
  * error in SQL MERGE). [[merge]] relies on that contract — no hidden
  * `distinct()`, which would cost the one shuffle the broadcast shape
  * avoids — so duplicate source PKs would all land; run
  * [[requireUniquePk]] first when the source is not dedup-guaranteed.
  */
object MergeUpsert {

  /** Throws if `source` carries duplicate PKs (the ANSI MERGE multi-match
    * error, surfaced eagerly). One bounded aggregate. */
  def requireUniquePk(source: DataFrame, pk: Seq[String]): Unit = {
    val dups = source.groupBy(pk.map(col): _*).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(1).collect()
    require(dups.isEmpty,
      s"MERGE source has duplicate PK ${dups.headOption.mkString} — " +
        "ANSI MERGE rejects multi-matches; dedup the source first")
  }

  /** The merged table: target rows whose PK appears in `source` are
    * replaced by the source row (UPDATE), source rows with new PKs are
    * appended (INSERT), everything else passes through. Schemas must
    * align by name. */
  def merge(target: DataFrame, source: DataFrame, pk: Seq[String],
      broadcastSource: Boolean = true): DataFrame = {
    val keys = source.select(pk.map(col): _*)
    target.join(if (broadcastSource) broadcast(keys) else keys, pk, "left_anti")
      .unionByName(source)
  }

  /** The update/insert split the JDBC replace-on-PK sink reports: one row
    * (n_updated, n_inserted, n_target, n_merged). */
  def report(target: DataFrame, source: DataFrame, pk: Seq[String]): DataFrame = {
    val keys = source.select(pk.map(col): _*)
    val matched = target.join(broadcast(keys), pk, "left_semi").count()
    val srcN = keys.count()
    val tgtN = target.count()
    val spark = target.sparkSession
    import spark.implicits._
    Seq((matched, srcN - matched, tgtN, tgtN - matched + srcN))
      .toDF("n_updated", "n_inserted", "n_target", "n_merged")
  }
}
