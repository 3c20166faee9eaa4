package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The reference's own query surface, re-expressed over the fixture tables.
  *
  * elric-rs issues exactly four SQL shapes against ClickHouse (SURVEY §2.2;
  * reference `src/table_info.rs:221-261`, `src/main.rs:303-307`) and runs a
  * fixed dataflow pipeline (SURVEY §2.1). Each query here reproduces one of
  * those shapes on the driver testdata so the DuckDB oracle can check it:
  *
  *  - ref_q1_*: projection + conjunctive equality filter + multi-key sort
  *    (`information_schema.columns` lookup, src/table_info.rs:221-236)
  *  - ref_q2_*: aliasing + NOT/LIKE predicates + sort
  *    (`system.tables` discovery, src/table_info.rs:244-261)
  *  - ref_q3_*: filter + ORDER BY DESC + LIMIT 1 argmax
  *    (cursor recovery, src/main.rs:303-307)
  *  - pipe_*: the per-block dataflow operators O9-O12 (group/route, field-map
  *    projection, latest-wins, pk-merge, dynamic cast), batch-expressed.
  *
  * Scale notes: every filter/projection here pushes into the parquet scan;
  * argmax-per-key uses a window over a hash-partitioned shuffle (no
  * driver-side collect); the global argmax is a sort+limit-1, which Spark
  * executes as a top-K (TakeOrderedAndProject), O(n) per partition.
  */
object RefShapes {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Q1 shape: SELECT column_name, data_type FROM information_schema.columns
    // WHERE table_schema=? AND table_name=? ORDER BY column_name, data_type
    "ref_q1_columns_lookup" -> ((s, d) => {
      Tables.part(s, d)
        .filter(col("p_type") === "ECONOMY" && col("p_size") === 10)
        .select(col("p_name").as("column_name"), col("p_brand").as("data_type"))
        .orderBy(col("column_name"), col("data_type"))
    }),

    // Q2 shape: projection+aliasing, NOT/!=/LIKE predicates, 2-key sort.
    "ref_q2_tables_discovery" -> ((s, d) => {
      Tables.part(s, d)
        .filter(!col("p_type").like("%View") &&
          !col("p_brand").like("Brand#1%") &&
          col("p_size") =!= 0 &&
          col("p_type").like("%O%"))
        .select(col("p_brand").as("table_schema"), col("p_name").as("table_name"),
          col("p_partkey").as("table_key"))
        .orderBy(col("table_schema"), col("table_name"), col("table_key"))
    }),

    // Q3 shape: cursor recovery = filter id, ORDER BY block_num DESC, LIMIT 1.
    // events stands in for the cursors table (user_id=id, event_id=block_num).
    "ref_q3_cursor_recovery" -> ((s, d) => {
      Tables.events(s, d)
        .filter(col("user_id") === 7)
        .select(col("user_id").as("id"), col("event_id").as("block_num"),
          col("event_type").as("cursor"))
        .orderBy(col("block_num").desc)
        .limit(1)
    }),

    // Q3 generalized: latest-per-key via row_number window (argmax per id).
    "ref_q3_argmax_per_key" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"))
        .orderBy(col("user_id"))
    }),

    // O9: group-by-table routing — hash aggregation by route key.
    "pipe_o9_route_by_table" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type").as("table_name"))
        .agg(count(lit(1)).as("n_changes"),
          min(col("event_id")).as("first_change"),
          max(col("event_id")).as("last_change"))
        .orderBy(col("table_name"))
    }),

    // O10: fields list -> map projection; extract typed value from the
    // string-encoded props payload (map_from_entries analog via regexp).
    "pipe_o10_field_projection" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          regexp_extract(col("props"), "[0-9]+", 0).cast("int").as("k"))
        .filter(col("event_id") < 1000)
        .orderBy(col("event_id"))
    }),

    // O10 latest-wins: duplicate field names collapse to the last value
    // (reference src/main.rs:291-297). Here: last event value per user.
    "pipe_o10_latest_wins" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(max_by(col("value"), col("event_id")).as("final_value"),
          max_by(col("event_type"), col("event_id")).as("final_type"))
        .orderBy(col("user_id"))
    }),

    // O12: dynamic string->typed cast matrix (reference table_info.rs:73-167).
    // Values travel as strings and are cast at the sink boundary; here we
    // stringify real columns then cast back, covering int/long/double/bool/
    // date/timestamp lanes.
    "pipe_o12_cast_matrix" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 500)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_linenumber").cast("string").cast("int").as("c_int"),
          col("l_orderkey").cast("string").cast("long").as("c_long"),
          (col("l_quantity") > 25).cast("string").cast("boolean").as("c_bool"),
          col("l_shipdate").cast("date").cast("string").as("c_date_str"),
          unix_timestamp(col("l_shipdate")).as("c_epoch_s"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // O8: protobuf DatabaseChanges decode (reference src/loader.rs:127-130).
    // Events are first serialized to real wire-format payloads (fixture
    // role: real payloads arrive already encoded), then decoded with the
    // codegen'd wire decoder and projected back to typed columns. The DuckDB
    // oracle computes the expected output straight from events — the byte
    // layout itself is pinned by ProtoWireSpec's golden vectors.
    // O13: the sink's wire format — ClickHouse RowBinary positional tuples
    // in sorted-column order (reference src/table_info.rs:73-167 via the
    // forked SchemaInserter, src/loader.rs:6-29). Each orders row's string
    // values are encoded with the real sink encoder (graft.sink.RowBinary,
    // golden-byte-pinned in RowBinarySpec) and surfaced as hex; the DuckDB
    // oracle reconstructs the same bytes from the format spec — an
    // independent replay of varint/LE/zero-pad layout on real data.
    "pipe_o13_rowbinary" -> ((s, d) => {
      import graft.model.{ChColumn, ChTable}
      import graft.model.ChType._
      import graft.sink.RowBinary
      val table = ChTable("orders", Seq(
        ChColumn("o_custkey", ChUInt64),
        ChColumn("o_orderdate", ChDateTime),
        ChColumn("o_orderkey", ChUInt64),
        ChColumn("o_orderpriority", ChString),
        ChColumn("o_orderstatus", ChFixedString(2))))
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          map(
            lit("o_custkey"), col("o_custkey").cast("string"),
            lit("o_orderdate"), unix_timestamp(col("o_orderdate")).cast("string"),
            lit("o_orderkey"), col("o_orderkey").cast("string"),
            lit("o_orderpriority"), col("o_orderpriority"),
            lit("o_orderstatus"), col("o_orderstatus")).as("fields"))
        .select(col("o_orderkey"),
          hex(RowBinary.rowbinary_encode(col("fields"), table)).as("rb_hex"))
        .orderBy(col("o_orderkey"))
    }),

    // O13 OVER THE WIRE (VERDICT r13 #1): the RowBinary bytes driven through
    // the full transport the reference uses — executor-side encode
    // (codegen'd RowBinaryEncode) → native-LZ4 frames with CityHash128
    // checksums → POST /?query=INSERT…FORMAT RowBinary&decompress=1 → the
    // loopback ClickHouse HTTP fixture checksum-verifies, decompresses and
    // DECODES the rows server-side → SELECT … FORMAT RowBinary (compressed
    // response) → client-side decode back to typed columns. The oracle
    // replays the same rows straight from the orders table, so any byte
    // the wire corrupts or re-orders is a hash mismatch. The read-back
    // decode is driver-side and BOUNDED (o_orderkey < 2000, ~500 rows) —
    // this lane is the wire-parity witness; bulk egress stays in the
    // executor POST path.
    "pipe_o13_rowbinary_wire" -> ((s, d) => {
      import graft.model.{ChColumn, ChTable}
      import graft.model.ChType._
      import graft.sink.{ClickHouseDialect, ClickHouseHttpServer, ClickHouseHttpSink, RowBinary}
      val table = ChTable("orders_rb", Seq(
        ChColumn("o_custkey", ChUInt64),
        ChColumn("o_epoch_s", ChDateTime),
        ChColumn("o_orderkey", ChUInt64),
        ChColumn("o_orderpriority", ChString),
        ChColumn("o_orderstatus", ChFixedString(2))))
      val server = new ClickHouseHttpServer()
      try {
        val dialect = ClickHouseDialect()
        ClickHouseHttpSink.post(server.url, dialect.createTableSql("orders_rb",
          table.columns.map(c => c.name -> ClickHouseDialect.chName(c.chType)),
          Seq("o_orderkey")), Array.emptyByteArray, "default", "", compress = false)
        val encoded = Tables.orders(s, d)
          .filter(col("o_orderkey") < 2000)
          .select(map(
            lit("o_custkey"), col("o_custkey").cast("string"),
            lit("o_epoch_s"), unix_timestamp(col("o_orderdate")).cast("string"),
            lit("o_orderkey"), col("o_orderkey").cast("string"),
            lit("o_orderpriority"), col("o_orderpriority"),
            lit("o_orderstatus"), col("o_orderstatus")).as("fields"))
          .select(RowBinary.rowbinary_encode(col("fields"), table).as("rb"))
        val url = server.url
        val insertSql = "INSERT INTO `orders_rb` (" +
          table.sortedColumns.map(c => s"`${c.name}`").mkString(", ") +
          ") FORMAT RowBinary"
        encoded.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          if (it.hasNext) {
            val body = new java.io.ByteArrayOutputStream()
            it.foreach(r => body.write(r.getAs[Array[Byte]](0)))
            ClickHouseHttpSink.post(url, insertSql, body.toByteArray,
              "default", "", compress = true)
          }
        }
        val bytes = ClickHouseHttpSink.get(server.url,
          "SELECT * FROM `orders_rb` FORMAT RowBinary", "default", "", compress = true)
        val rows = RowBinary.decodeRows(table.columns.map(_.chType), bytes)
        import s.implicits._
        rows.map(r => (r(2).toLong, r(0).toLong, r(1).toLong, r(3), r(4)))
          .toDF("o_orderkey", "o_custkey", "o_epoch_s",
            "o_orderpriority", "o_orderstatus")
          .orderBy(col("o_orderkey"))
      } finally server.close()
    }),

    "pipe_o8_decode" -> ((s, d) => {
      import graft.functions.ProtoWire
      val enc = Tables.events(s, d)
        .filter(col("event_id") < 2000)
        .select(ProtoWire.pb_encode_change(
          col("event_type"),
          col("event_id").cast("string"),
          col("event_id"),
          lit(1), // Operation::CREATE
          map(lit("user_id"), col("user_id").cast("string"))).as("payload"))
      enc.select(explode(ProtoWire.pb_decode_changes(col("payload"))).as("c"))
        .select(col("c.table").as("table_name"),
          col("c.pk").cast("long").as("pk"),
          col("c.ordinal").as("ordinal"),
          col("c.operation").as("op"),
          expr("map_from_entries(transform(c.fields, f -> struct(f.name, f.new_value)))")
            .getItem("user_id").cast("long").as("user_id"))
        .orderBy(col("pk"))
    })
  )

  /** LE byte-string of `expr` at `width` bytes, as DuckDB SQL (the oracle's
    * independent replay of the RowBinary little-endian layout). */
  private def leHex(expr: String, width: Int): String =
    (0 until width).map(i => s"lpad(to_hex(($expr >> ${8 * i}) & 255), 2, '0')")
      .mkString(" || ")

  def oracles: Map[String, String] = Map(
    "pipe_o13_rowbinary" ->
      s"""SELECT o_orderkey, upper(
         |  ${leHex("o_custkey", 8)}
         |  || ${leHex("CAST(epoch(o_orderdate) AS BIGINT)", 4)}
         |  || ${leHex("o_orderkey", 8)}
         |  || lpad(to_hex(length(o_orderpriority)), 2, '0') || hex(o_orderpriority)
         |  || hex(o_orderstatus) || repeat('00', 2 - length(o_orderstatus))
         |) AS rb_hex
         |FROM orders WHERE o_orderkey < 2000
         |ORDER BY o_orderkey""".stripMargin,

    // the wire round trip must be invisible: the decoded read-back equals
    // the source rows exactly
    "pipe_o13_rowbinary_wire" ->
      """SELECT o_orderkey, o_custkey,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS o_epoch_s,
        |       o_orderpriority, o_orderstatus
        |FROM orders WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin,

    "ref_q1_columns_lookup" ->
      """SELECT p_name AS column_name, p_brand AS data_type FROM part
        |WHERE p_type = 'ECONOMY' AND p_size = 10
        |ORDER BY column_name, data_type""".stripMargin,

    "ref_q2_tables_discovery" ->
      """SELECT p_brand AS table_schema, p_name AS table_name, p_partkey AS table_key
        |FROM part
        |WHERE p_type NOT LIKE '%View' AND p_brand NOT LIKE 'Brand#1%'
        |  AND p_size != 0 AND p_type LIKE '%O%'
        |ORDER BY table_schema, table_name, table_key""".stripMargin,

    "ref_q3_cursor_recovery" ->
      """SELECT user_id AS id, event_id AS block_num, event_type AS cursor
        |FROM events WHERE user_id = 7
        |ORDER BY block_num DESC LIMIT 1""".stripMargin,

    "ref_q3_argmax_per_key" ->
      """SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
        |FROM (SELECT user_id, event_id, event_type,
        |        row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |      FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin,

    "pipe_o9_route_by_table" ->
      """SELECT event_type AS table_name, count(*) AS n_changes,
        |       min(event_id) AS first_change, max(event_id) AS last_change
        |FROM events GROUP BY 1 ORDER BY table_name""".stripMargin,

    "pipe_o10_field_projection" ->
      """SELECT event_id, CAST(regexp_extract(props, '[0-9]+') AS INT) AS k
        |FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin,

    "pipe_o10_latest_wins" ->
      """SELECT user_id, arg_max(value, event_id) AS final_value,
        |       arg_max(event_type, event_id) AS final_type
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "pipe_o12_cast_matrix" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_linenumber AS VARCHAR) AS INT) AS c_int,
        |       CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS c_long,
        |       CAST(CAST(l_quantity > 25 AS VARCHAR) AS BOOLEAN) AS c_bool,
        |       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS c_date_str,
        |       CAST(epoch(l_shipdate) AS BIGINT) AS c_epoch_s
        |FROM lineitem WHERE l_orderkey < 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "pipe_o8_decode" ->
      """SELECT event_type AS table_name, CAST(event_id AS BIGINT) AS pk,
        |       CAST(event_id AS BIGINT) AS ordinal, 1 AS op,
        |       CAST(user_id AS BIGINT) AS user_id
        |FROM events WHERE event_id < 2000 ORDER BY pk""".stripMargin
  )
}
