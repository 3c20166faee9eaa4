package graft.cast

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{FixedString, U256}
import graft.model.ChType._
import graft.model.{ChColumn, ChTable, ChType}

/** The dynamic typed projection (operator O12): string values from a
  * `MAP<STRING,STRING>` fields column, cast per target-table schema
  * (reference `impl Serialize for DynamicInsert`, `src/table_info.rs:73-167`).
  *
  * Divergences (SURVEY §1.2, deliberate):
  *  - missing column → explicit NULL (reference silently skips the column,
  *    corrupting positional encoding — `table_info.rs:80-81`);
  *  - malformed value → NULL in permissive mode (default) with a strict mode
  *    that raises instead, mirroring the reference's `unwrap()` panic;
  *  - unsigned types reject out-of-range input on both ends — negatives and
  *    values above the uN max (reference `parse::<uN>` errors on both);
  *  - Date / Nullable / LowCardinality / Decimal are supported (reference
  *    `unimplemented!`).
  *
  * Everything is built-in `cast`/`when` except FixedString (codegen'd custom
  * expression) and 256-bit ints (interpreted, sink-boundary only) — so the
  * projection stays inside whole-stage codegen for the common lanes.
  */
object DynamicCast {

  /** Typed column for `col` taken from `fieldsMap` (permissive: bad → NULL). */
  def castColumn(fieldsMap: Column, col: ChColumn): Column =
    cast(fieldsMap.getItem(col.name), col.chType).as(col.name)

  /** Strict variant: raises (like the reference's panic) when a present value
    * fails its cast; absent values still become NULL. */
  def castColumnStrict(fieldsMap: Column, col: ChColumn): Column = {
    val raw = fieldsMap.getItem(col.name)
    val typed = cast(raw, col.chType)
    when(raw.isNotNull && typed.isNull,
      raise_error(concat(
        lit(s"graft strict cast: column '${col.name}' (${col.chType}) rejected value '"),
        raw, lit("'"))))
      .otherwise(typed).as(col.name)
  }

  /** String column → target ChType. Mirrors table_info.rs:73-167 lane by
    * lane. `try_cast` everywhere: identical permissive semantics whether the
    * session runs ANSI (Spark 4 default) or legacy mode. */
  def cast(raw: Column, t: ChType): Column = t match {
    case ChString => raw
    case ChFixedString(n) => FixedString.fixed_string_encode(raw, n)
    // unsigned lanes: next-wider signed Spark type, bounded to the uN range
    // (reference parse::<uN>() rejects both negatives and overflow)
    case ChUInt8 => bounded(raw.try_cast("short"), lit(255))
    case ChUInt16 => bounded(raw.try_cast("int"), lit(65535))
    case ChUInt32 => bounded(raw.try_cast("long"), lit(4294967295L))
    case ChUInt64 =>
      bounded(raw.try_cast("decimal(20,0)"), lit(BigDecimal("18446744073709551615")))
    // 128/256-bit: canonical decimal string, validated+normalized by a
    // roundtrip through the order-preserving fixed-width encoding
    case ChUInt128 => wide(raw, signed = false, bits = 128)
    case ChInt128 => wide(raw, signed = true, bits = 128)
    case ChUInt256 => wide(raw, signed = false, bits = 256)
    case ChInt256 => wide(raw, signed = true, bits = 256)
    case ChInt8 => raw.try_cast("byte")
    case ChInt16 => raw.try_cast("short")
    case ChInt32 => raw.try_cast("int")
    case ChInt64 => raw.try_cast("long")
    case ChFloat32 => raw.try_cast("float")
    case ChFloat64 => raw.try_cast("double")
    case ChBool => raw.try_cast("boolean")
    // RFC-3339 → second-precision timestamp (table_info.rs:151-156)
    case ChDateTime => date_trunc("second", raw.try_cast("timestamp"))
    case ChDate => raw.try_cast("date")
    case ChDecimal(p, s) => raw.try_cast(s"decimal($p,$s)")
    case ChNullable(inner) => cast(raw, inner)
    case ChLowCardinality(inner) => cast(raw, inner)
  }

  private def wide(raw: Column, signed: Boolean, bits: Int): Column =
    U256.u256_to_str(U256.u256_from_str(raw, signed, bits), signed, bits)

  private def bounded(c: Column, max: Column): Column = when(c.between(lit(0), max), c)

  /** Full typed projection of a fields-map column to `table`'s schema, in the
    * reference's canonical order (columns sorted by name, SURVEY §1.3). */
  def projection(fieldsMap: Column, table: ChTable, strict: Boolean = false): Seq[Column] =
    table.sortedColumns.map { c =>
      if (strict) castColumnStrict(fieldsMap, c) else castColumn(fieldsMap, c)
    }
}
