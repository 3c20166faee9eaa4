package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.cast.DynamicCast
import graft.model.{BlockScoped, ChTable}

/** The change-set batch pipeline: operators O8–O12 of SURVEY §2.1, expressed
  * as declarative column transforms so Catalyst fuses them into one
  * whole-stage-codegen'd pass per table.
  *
  *   blocks ─ explode changes (O8/O9 route key) ─ fields→map latest-wins
  *   (O10, reference src/main.rs:291-297) ─ composite-PK merge (O11,
  *   src/loader.rs:143-149) ─ per-table typed projection (O12,
  *   src/table_info.rs:73-167)
  *
  * Scale: the explode+project path is shuffle-free — routing to N tables is
  * N filtered scans of the same exploded frame (or one pass in foreachBatch),
  * not a groupBy; intra-table input order is preserved because explode keeps
  * array order and no exchange is introduced before the sink.
  */
object ChangePipeline {

  /** Blocks → one row per change:
    * (block_num, block_id, ts, cursor, table, fields_map).
    * Fields arrive as ARRAY<STRUCT<name,newValue,oldValue>> and leave as a
    * deduped MAP<STRING,STRING> with composite-PK keys merged over it.
    */
  def explodeChanges(blocks: Dataset[BlockScoped]): DataFrame = {
    blocks.toDF()
      .select(
        col("clock.number").as("block_num"),
        col("clock.id").as("block_id"),
        col("clock.ts").as("block_ts"),
        col("cursor"),
        explode(col("changes")).as("change"))
      .select(
        col("block_num"), col("block_id"), col("block_ts"), col("cursor"),
        col("change.table").as("table"),
        fieldsToMap(col("change.fields"), col("change.compositePk")).as("fields_map"))
  }

  /** O10 + O11: ARRAY<STRUCT<name,newValue,_>> (+ composite-PK map) → one
    * MAP<STRING,STRING>, duplicate names resolved latest-wins and PK keys
    * winning over field entries — exactly `HashMap::extend` semantics in the
    * reference (`src/main.rs:291-297`, `src/loader.rs:143-149`).
    *
    * Pure SQL array ops (no UDF): an entry survives iff no later entry has
    * the same name. Field lists are tiny (one row's columns), so the O(n²)
    * scan is cheaper than any shuffle-based alternative and stays codegen'd.
    */
  def fieldsToMap(fields: Column, compositePk: Column): Column = {
    val fieldEntries = transform(fields,
      f => struct(f.getField("name").as("k"), f.getField("newValue").as("v")))
    val pkEntries = transform(map_entries(coalesce(compositePk, map())),
      e => struct(e.getField("key").as("k"), e.getField("value").as("v")))
    val all = concat(fieldEntries, pkEntries)
    val deduped = filter(all, (e, i) =>
      !exists(slice(all, i + lit(2), size(all) - i - lit(1)),
        later => later.getField("k") === e.getField("k")))
    map_from_entries(deduped)
  }

  /** O9 + O12: route the exploded change rows to their tables and apply each
    * table's typed projection. Returns one DataFrame per catalog table —
    * block/cursor metadata first, then the schema columns in canonical
    * (name-sorted) order. Tables absent from the batch yield empty frames.
    */
  def routeAndCast(
      changes: DataFrame,
      catalog: Seq[ChTable],
      strict: Boolean = false): Map[String, DataFrame] = {
    catalog.map { t =>
      val meta = Seq(col("block_num"), col("block_id"), col("cursor"))
      t.name -> changes
        .filter(col("table") === t.name)
        .select(meta ++ DynamicCast.projection(col("fields_map"), t, strict): _*)
    }.toMap
  }

  /** End-to-end batch path: blocks → per-table typed frames. */
  def process(
      blocks: Dataset[BlockScoped],
      catalog: Seq[ChTable],
      strict: Boolean = false): Map[String, DataFrame] =
    routeAndCast(explodeChanges(blocks), catalog, strict)
}
