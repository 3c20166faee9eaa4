package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{FixedString, U256}

/** Custom-function surface: the two capabilities the reference needs beyond
  * built-in Spark types — 256-bit integers (reference `src/table_info.rs:
  * 112-115,136-139`) and FixedString(n) zero-padded byte strings
  * (`src/table_info.rs:140-146`).
  *
  * DuckDB has no 256-bit integer, so the u256 oracle exercises values inside
  * HUGEINT (int128) range: equality of the decimal-string results proves the
  * parse→arith→format path; ORDER BY on the 32-byte encoding (Spark side)
  * vs ORDER BY numeric value (DuckDB side) proves the encoding is
  * order-preserving — which is what makes sorts/joins/range predicates on
  * 256-bit columns pure built-in BinaryType ops at scale (no custom
  * comparator, fully codegen'd).
  */
object FuncShapes {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // u256 pipeline: parse decimal strings, add, format back; ORDER BY the
    // 32-byte encoding must equal numeric order.
    "func_u256_arith_order" -> ((s, d) => {
      val base = Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          concat(col("l_orderkey").cast("string"), lit("0" * 18)).as("a_str"),
          col("l_partkey").cast("string").as("b_str"))
      base
        .withColumn("sum256",
          U256.u256_add(U256.u256_from_str(col("a_str")), U256.u256_from_str(col("b_str"))))
        // sort on the 32-byte encoding (built-in BinaryType comparator) —
        // must equal the oracle's numeric ORDER BY.
        .orderBy(col("sum256"), col("l_linenumber"))
        .select(col("l_orderkey"), col("l_linenumber"),
          U256.u256_to_str(col("sum256")).as("val"))
    }),

    // u256 SUM (TypedImperativeAggregate over the 32-byte encoding): per-
    // orderstatus group sums of values built past 2^64 (orderkey·2^60 +
    // 12345), formatted back to decimal strings. Values are sized so the
    // true sums stay inside HUGEINT — equality proves the distributed
    // wrap-fold (partials, map-side combine, merge) computes the exact
    // big-integer sum; the wrap branch itself is spec-pinned driver-side.
    "func_u256_sum" -> ((s, d) => {
      val v = U256.u256_from_str(
        (col("o_orderkey").cast("decimal(38,0)") *
          lit("1152921504606846976").cast("decimal(38,0)") +
          lit(12345).cast("decimal(38,0)")).cast("string"))
      Tables.orders(s, d)
        .select(col("o_orderstatus"), v.as("v256"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), U256.u256_sum(col("v256")).as("s256"))
        .select(col("o_orderstatus"), col("n"),
          U256.u256_to_str(col("s256")).as("total"))
        .orderBy(col("o_orderstatus"))
    }),

    // u256 MIN/MAX need NOTHING custom: the 32-byte big-endian encoding is
    // order-preserving under BinaryType's unsigned lexicographic
    // comparator, so the built-in (codegen'd, map-side-combined) min/max
    // aggregates are numerically correct as-is — the design dividend of
    // the encoding, demonstrated per group and checked against HUGEINT.
    "func_u256_minmax" -> ((s, d) => {
      val v = U256.u256_from_str(
        (col("o_orderkey").cast("decimal(38,0)") *
          lit("1152921504606846976").cast("decimal(38,0)") +
          lit(12345).cast("decimal(38,0)")).cast("string"))
      Tables.orders(s, d)
        .select(col("o_orderstatus"), v.as("v256"))
        .groupBy(col("o_orderstatus"))
        .agg(min(col("v256")).as("lo256"), max(col("v256")).as("hi256"))
        .select(col("o_orderstatus"),
          U256.u256_to_str(col("lo256")).as("lo"),
          U256.u256_to_str(col("hi256")).as("hi"))
        .orderBy(col("o_orderstatus"))
    }),

    // FixedString(10): encode truncates/zero-pads to exactly 10 bytes; decode
    // strips the padding. For ASCII inputs decode∘encode == 10-char prefix.
    "func_fixed_string" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") < 300)
        .select(col("p_partkey"),
          FixedString.fixed_string_decode(
            FixedString.fixed_string_encode(col("p_name"), 10)).as("fs10"),
          length(FixedString.fixed_string_encode(col("p_type"), 16)).as("enc_len"))
        .orderBy(col("p_partkey"))
    })
  )

  def oracles: Map[String, String] = Map(
    "func_u256_arith_order" ->
      """SELECT l_orderkey, l_linenumber,
        |  CAST(CAST(l_orderkey AS HUGEINT) * 1000000000000000000 + l_partkey AS VARCHAR) AS val
        |FROM lineitem WHERE l_orderkey < 2000
        |ORDER BY CAST(l_orderkey AS HUGEINT) * 1000000000000000000 + l_partkey, l_linenumber""".stripMargin,

    "func_fixed_string" ->
      """SELECT p_partkey, substring(p_name, 1, 10) AS fs10, 16 AS enc_len
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin,

    "func_u256_sum" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_orderkey AS HUGEINT) * 1152921504606846976 + 12345)
        |    AS VARCHAR) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "func_u256_minmax" ->
      """SELECT o_orderstatus,
        |  CAST(min(CAST(o_orderkey AS HUGEINT) * 1152921504606846976 + 12345)
        |    AS VARCHAR) AS lo,
        |  CAST(max(CAST(o_orderkey AS HUGEINT) * 1152921504606846976 + 12345)
        |    AS VARCHAR) AS hi
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )
}
