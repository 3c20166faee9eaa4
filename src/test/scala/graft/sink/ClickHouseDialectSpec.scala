package graft.sink

import java.nio.file.Files
import java.sql.DriverManager

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.model._
import graft.model.ChType._

/** ClickHouse dialect lane for the JDBC sink (reference target:
  * `/root/reference/src/loader.rs:49-60`, `src/table_info.rs:13-38`).
  * No live ClickHouse exists in this environment, so the spec pins exactly
  * what the sink would send: the generated DDL for a full §1.2-matrix
  * schema, the type-name round-trip through ChType.parse, the URL-query →
  * session-setting plumbing, and the insert-only delivery flag. The shared
  * SinkBatch contract itself stays proven against Derby in JdbcSinkSpec. */
class ClickHouseDialectSpec extends SparkSpec {

  /** Every ChType lane from SURVEY §1.2, including the four the reference
    * panics on (Date/Nullable/LowCardinality/Decimal) and the wide ints. */
  private val matrixColumns = Seq(
    ChColumn("c_string", ChString),
    ChColumn("c_fixed", ChFixedString(40)),
    ChColumn("c_u8", ChUInt8), ChColumn("c_u16", ChUInt16),
    ChColumn("c_u32", ChUInt32), ChColumn("c_u64", ChUInt64),
    ChColumn("c_u128", ChUInt128), ChColumn("c_u256", ChUInt256),
    ChColumn("c_i8", ChInt8), ChColumn("c_i16", ChInt16),
    ChColumn("c_i32", ChInt32), ChColumn("c_i64", ChInt64),
    ChColumn("c_i128", ChInt128), ChColumn("c_i256", ChInt256),
    ChColumn("c_f32", ChFloat32), ChColumn("c_f64", ChFloat64),
    ChColumn("c_bool", ChBool), ChColumn("c_dt", ChDateTime),
    ChColumn("c_date", ChDate), ChColumn("c_dec", ChDecimal(38, 10)),
    ChColumn("c_null", ChNullable(ChInt32)),
    ChColumn("c_lc", ChLowCardinality(ChString)))

  test("type names round-trip through ChType.parse for the full matrix") {
    matrixColumns.foreach { c =>
      val name = ClickHouseDialect.chName(c.chType)
      assert(ChType.parse(name) === c.chType,
        s"chName must be the exact inverse of parse: $name")
    }
  }

  test("generated DDL: IF NOT EXISTS, backtick quoting, MergeTree ORDER BY pk, catalog types") {
    val table = ChTable("matrix", matrixColumns)
    val sink = new JdbcMultiTableSink(Seq(table), "jdbc:clickhouse://localhost:8123/db",
      "id1", pkCols = Map("matrix" -> Seq("c_u64")), dialect = ClickHouseDialect())
    val stmts = sink.ddlStatements(Map("matrix" -> table.schema))

    // one CREATE per table + the cursor table; no index statements (the
    // MergeTree ORDER BY key covers PK locality)
    assert(stmts.length === 2)
    val ddl = stmts.head
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS `matrix` ("))
    assert(ddl.endsWith("ENGINE = MergeTree ORDER BY (`c_u64`)"))
    // catalog ChTypes win over the frame's Spark types: the schema stores
    // wide ints as STRING and FixedString as BINARY, but the DDL must carry
    // the native names
    assert(ddl.contains("`c_u256` UInt256"))
    assert(ddl.contains("`c_i128` Int128"))
    assert(ddl.contains("`c_fixed` FixedString(40)"))
    assert(ddl.contains("`c_null` Nullable(Int32)"))
    assert(ddl.contains("`c_lc` LowCardinality(String)"))
    assert(ddl.contains("`c_dec` Decimal(38, 10)"))
    assert(ddl.contains("`c_date` Date"))
    // cursor table mirrors the reference's Cursor row (block_num is u64)
    // and models its "replace on duplicates" persistence (README.md:9-11):
    // ReplacingMergeTree versioned by block_num, keyed by cursor id —
    // background merges collapse the constant inserts to the latest row
    val cursor = stmts.last
    assert(cursor.startsWith("CREATE TABLE IF NOT EXISTS `graft_cursors` ("))
    assert(cursor.contains("`block_num` UInt64"))
    assert(cursor.endsWith("ENGINE = ReplacingMergeTree(`block_num`) ORDER BY (`id`)"))
  }

  test("frames with no catalog entry fall back to Spark-type mapping") {
    val sink = new JdbcMultiTableSink(Nil, "jdbc:clickhouse://localhost:8123/db",
      "id1", dialect = ClickHouseDialect())
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", DoubleType),
      StructField("c", StringType), StructField("d", DecimalType(20, 0))))
    val ddl = sink.ddlStatements(Map("plain" -> schema)).head
    assert(ddl.contains("`a` Int64") && ddl.contains("`b` Float64"))
    assert(ddl.contains("`c` String") && ddl.contains("`d` Decimal(20, 0)"))
    // default PK when none configured
    assert(ddl.endsWith("ORDER BY (`block_num`)"))
  }

  test("URL query pairs become per-connection session settings (reference main.rs:273-275)") {
    val d = ClickHouseDialect.fromUrl(
      "jdbc:clickhouse://ch:8123/db?async_insert=1&wait_for_async_insert=0&max_insert_block_size=65536")
    assert(d.sessionSettings === Map(
      "async_insert" -> "1", "wait_for_async_insert" -> "0",
      "max_insert_block_size" -> "65536"))
    assert(d.initStatements === Seq(
      "SET async_insert = 1",
      "SET max_insert_block_size = 65536",
      "SET wait_for_async_insert = 0"))
    // no query string -> no settings
    assert(ClickHouseDialect.fromUrl("jdbc:clickhouse://ch:8123/db").initStatements.isEmpty)
  }

  test("URL pairs are %-decoded; malformed escapes fail loudly at parse time") {
    // %2C must land in SET as a literal comma, %20 as a space
    val d = ClickHouseDialect.fromUrl(
      "jdbc:clickhouse://ch:8123/db?format_csv_delimiter=%2C&a%20key=v")
    assert(d.sessionSettings === Map("format_csv_delimiter" -> ",", "a key" -> "v"))
    // a truncated escape raises here, not as a ClickHouse SET parse error
    // at the first commit
    val e = intercept[IllegalArgumentException] {
      ClickHouseDialect.fromUrl("jdbc:clickhouse://ch:8123/db?bad=%2")
    }
    assert(e.getMessage.contains("malformed"))
  }

  test("delivery contract: insert-only (no DELETE mutations), engine overridable") {
    assert(!ClickHouseDialect().supportsDeleteOnPk,
      "ClickHouse DELETE is an async mutation — the sink must not use the replace-on-PK lane")
    assert(DerbyDialect.supportsDeleteOnPk)
    val custom = ClickHouseDialect(engine = "ReplacingMergeTree(ver)")
    val ddl = custom.createTableSql("t", Seq("a" -> "Int64"), Seq("a"))
    assert(ddl.contains("ENGINE = ReplacingMergeTree(ver) ORDER BY (`a`)"))
    // empty pk -> tuple()
    assert(ClickHouseDialect().createTableSql("t", Seq("a" -> "Int64"), Nil)
      .endsWith("ORDER BY tuple()"))
  }

  test("cursor recovery is latest-wins and INVARIANT to ReplacingMergeTree merge timing") {
    // The reference persists cursors by constant insertion and recovers the
    // latest (README.md:9-11); ReplacingMergeTree collapses duplicates only
    // EVENTUALLY (at merge time), so the recovery read must return the same
    // row BEFORE the collapse (all duplicates present) and AFTER it (only
    // the max-block_num row left per id). No live ClickHouse exists here:
    // the duplicate-row state and the post-merge state are materialized on
    // embedded Derby through the sink's own insert-only persistCursor /
    // ORDER BY block_num DESC + limit-1 loadCursor path — the exact
    // statements the ClickHouse dialect would issue, modulo DDL.
    System.setProperty("derby.system.home",
      Files.createTempDirectory("derbyhome_ch").toString)
    val root = Files.createTempDirectory("chcursor").toString
    val url = s"jdbc:derby:$root/db;create=true"
    val sink = new JdbcMultiTableSink(Nil, url, "pipeline-1")
    assert(sink.loadCursor(spark).isEmpty) // creates the cursor table (O15 order)
    // constant insertion, out of order and with a competing cursor id
    Seq(3L, 1L, 7L, 5L).foreach(n =>
      sink.persistCursor(CursorRow("pipeline-1", s"c$n", n, s"b$n")))
    Seq(2L, 9L).foreach(n =>
      sink.persistCursor(CursorRow("other", s"c$n", n, s"b$n")))
    // BEFORE the merge: all duplicate rows present, recovery = max block_num
    val before = sink.loadCursor(spark)
    assert(before.map(r => (r.blockNum, r.cursor, r.blockId)) === Some((7L, "c7", "b7")),
      "recovery must pick the latest cursor among the uncollapsed duplicates")
    // emulate the ReplacingMergeTree background merge: keep exactly the
    // max-version row per ORDER BY key (id), drop the rest
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate(
        """DELETE FROM "graft_cursors" t WHERE "block_num" <
          |  (SELECT MAX("block_num") FROM "graft_cursors" s WHERE s."id" = t."id")""".stripMargin)
      st.close()
      val rs = conn.createStatement()
        .executeQuery("""SELECT COUNT(*) FROM "graft_cursors"""")
      rs.next()
      assert(rs.getInt(1) === 2, "merge leaves one row per cursor id")
    } finally conn.close()
    // AFTER the merge: the collapsed table yields the identical recovery row
    val after = sink.loadCursor(spark)
    assert(after === before, "recovery must not depend on merge timing")
  }
}
