package graft.sink

import java.sql.{Connection, DriverManager, PreparedStatement, Types}

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{BlockScoped, ChTable, CursorRow}

/** JDBC variant of the per-table micro-batch sink (operator O13) — the
  * database-loading role the reference fills with per-table ClickHouse
  * inserters (`/root/reference/src/loader.rs:49-80`; BASELINE "Structured
  * Streaming + JDBC/ClickHouse sink").
  *
  * Same `writeBatch` contract as [[MultiTableSink]]: route/cast each released
  * block's changes per table, write data, THEN the cursor row
  * (write-last ordering, `src/loader.rs:111-175`).
  *
  * Delivery: foreachBatch is at-least-once on retry, so data writes are
  * idempotent REPLACE-on-PK — each partition deletes its PK range and
  * re-inserts in one transaction (batched, `batchSize` rows per round trip).
  * A re-delivered batch overwrites itself instead of duplicating; with
  * Spark's checkpoint preventing cross-restart re-delivery this yields
  * exactly-once-EFFECTIVE output, strictly stronger than the reference's
  * at-least-once inserts.
  *
  * Scale: writes run on the executors (one connection per partition per
  * table, like the reference's per-table async inserters); only the cursor
  * row and the DDL touch the driver. The embedded test target is Derby (on
  * the Spark classpath); any network JDBC URL works the same way.
  */
class JdbcMultiTableSink(
    catalog: Seq[ChTable],
    url: String,
    cursorId: String,
    pkCols: Map[String, Seq[String]] = Map.empty,
    batchSize: Int = 1000,
    isolation: Int = Connection.TRANSACTION_READ_COMMITTED,
    strict: Boolean = false) extends Serializable {

  import JdbcMultiTableSink._

  val cursorTable = "graft_cursors"

  @transient @volatile private var schemaReady = false

  /** foreachBatch body: write every table's typed rows, then the cursor
    * (batch shape shared with the parquet sink via [[SinkBatch]]). */
  def writeBatch(blocks: Dataset[BlockScoped], batchId: Long): Unit =
    SinkBatch.run(blocks, catalog, strict, onFrames = ensureSchema)(writeTable) {
      (cursor, blockNum, blockId) =>
        persistCursor(CursorRow(cursorId, cursor, blockNum, blockId))
    }

  /** Replace-on-PK write. The PK here is a GROUP key (a block can carry many
    * rows): all rows sharing a PK are deleted once, then re-inserted. Two
    * invariants make that idempotent under retry:
    *  - rows are repartitioned by PK, so a group lives in exactly one task
    *    and another task's delete can never remove its inserts;
    *  - within a task each PK is deleted only on first encounter, so a group
    *    spanning several `batchSize` chunks isn't wiped by its own later
    *    chunks. A retried task re-deletes its groups and re-inserts them.
    * The repartition is one narrow-ish shuffle per table per micro-batch —
    * the price of exactly-once-effective output on an append-only protocol. */
  private def writeTable(table: String, df: DataFrame): Unit = {
    val schema = df.schema
    val pk = pkCols.getOrElse(table, Seq("block_num"))
    val pkIdx = pk.map(schema.fieldIndex)
    val cols = schema.fieldNames.toSeq
    val deleteSql = s"""DELETE FROM ${q(table)} WHERE ${pk.map(c => s"${q(c)} = ?").mkString(" AND ")}"""
    val insertSql = s"""INSERT INTO ${q(table)} (${cols.map(q).mkString(", ")})
                       |VALUES (${cols.map(_ => "?").mkString(", ")})""".stripMargin
    val sqlCodes = schema.fields.map(f => sqlTypeCode(f.dataType))
    val (jdbcUrl, batch, iso) = (url, batchSize, isolation)
    df.repartition(pk.map(col): _*).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(jdbcUrl)
        try {
          conn.setAutoCommit(false)
          conn.setTransactionIsolation(iso)
          val del = conn.prepareStatement(deleteSql)
          val ins = conn.prepareStatement(insertSql)
          val seen = scala.collection.mutable.HashSet.empty[Seq[Any]]
          rows.grouped(batch).foreach { chunk =>
            var deletes = 0
            chunk.foreach { row =>
              if (seen.add(pkIdx.map(row.get))) {
                pkIdx.zipWithIndex.foreach { case (ci, pi) =>
                  setParam(del, pi + 1, sqlCodes(ci), row, ci)
                }
                del.addBatch(); deletes += 1
              }
              var i = 0
              while (i < sqlCodes.length) { setParam(ins, i + 1, sqlCodes(i), row, i); i += 1 }
              ins.addBatch()
            }
            if (deletes > 0) del.executeBatch()
            ins.executeBatch()
            conn.commit()
          }
        } finally conn.close()
      }
    }
  }

  def persistCursor(row: CursorRow): Unit = withConnection { conn =>
    val ps = conn.prepareStatement(
      s"""INSERT INTO ${q(cursorTable)} (${Seq("id", "cursor", "block_num", "block_id").map(q).mkString(", ")})
         |VALUES (?, ?, ?, ?)""".stripMargin)
    ps.setString(1, row.id); ps.setString(2, row.cursor)
    ps.setLong(3, row.blockNum); ps.setString(4, row.blockId)
    ps.executeUpdate()
  }

  /** O15: latest cursor for this id (`src/main.rs:299-310`). */
  def loadCursor(spark: SparkSession): Option[CursorRow] = withConnection { conn =>
    ensureCursorTable(conn)
    val ps = conn.prepareStatement(
      s"""SELECT ${Seq("cursor", "block_num", "block_id").map(q).mkString(", ")}
         |FROM ${q(cursorTable)} WHERE ${q("id")} = ?
         |ORDER BY ${q("block_num")} DESC FETCH FIRST 1 ROWS ONLY""".stripMargin)
    ps.setString(1, cursorId)
    val rs = ps.executeQuery()
    if (rs.next()) Some(CursorRow(cursorId, rs.getString(1), rs.getLong(2), rs.getString(3)))
    else None
  }

  // ---- DDL (driver-side, once) --------------------------------------------

  private def ensureSchema(frames: Map[String, DataFrame]): Unit =
    if (!schemaReady) synchronized {
      if (!schemaReady) {
        withConnection { conn =>
          frames.foreach { case (table, df) =>
            createIfAbsent(conn, table,
              df.schema.fields.map(f => s"${q(f.name)} ${ddlType(f.dataType)}").mkString(", "))
            // the replace-on-PK deletes must be point lookups, not table
            // scans that grow with accumulated rows (PK is a GROUP key with
            // duplicates, so an index — not a PRIMARY KEY constraint)
            val pk = pkCols.getOrElse(table, Seq("block_num"))
            execIgnoringExists(conn,
              s"CREATE INDEX ${q(s"ix_${table}_pk")} ON ${q(table)} (${pk.map(q).mkString(", ")})")
          }
          ensureCursorTable(conn)
        }
        schemaReady = true
      }
    }

  private def ensureCursorTable(conn: Connection): Unit =
    createIfAbsent(conn, cursorTable,
      s"""${q("id")} VARCHAR(256), ${q("cursor")} VARCHAR(1024),
         |${q("block_num")} BIGINT, ${q("block_id")} VARCHAR(256)""".stripMargin)

  private def createIfAbsent(conn: Connection, table: String, columnsDdl: String): Unit =
    execIgnoringExists(conn, s"CREATE TABLE ${q(table)} ($columnsDdl)")

  private def execIgnoringExists(conn: Connection, ddl: String): Unit =
    try {
      val st = conn.createStatement()
      st.executeUpdate(ddl)
      st.close()
    } catch {
      // Derby: X0Y32 = object already exists; other engines use IF NOT EXISTS
      case e: java.sql.SQLException if e.getSQLState == "X0Y32" => ()
    }

  private def withConnection[A](f: Connection => A): A = {
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }
}

object JdbcMultiTableSink {

  /** Quote an identifier — `cursor` is a reserved word in most dialects. */
  def q(ident: String): String = "\"" + ident + "\""

  /** Spark type → portable DDL type (Derby-compatible subset). */
  def ddlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case ShortType | ByteType => "SMALLINT"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case d: DecimalType => s"DECIMAL(${math.min(d.precision, 31)},${d.scale})"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case _ => "VARCHAR(4000)"
  }

  def sqlTypeCode(dt: DataType): Int = dt match {
    case LongType => Types.BIGINT
    case IntegerType => Types.INTEGER
    case ShortType | ByteType => Types.SMALLINT
    case DoubleType => Types.DOUBLE
    case FloatType => Types.REAL
    case BooleanType => Types.BOOLEAN
    case _: DecimalType => Types.DECIMAL
    case TimestampType => Types.TIMESTAMP
    case DateType => Types.DATE
    case _ => Types.VARCHAR
  }

  def setParam(ps: PreparedStatement, idx: Int, sqlCode: Int, row: Row, col: Int): Unit =
    if (row.isNullAt(col)) ps.setNull(idx, sqlCode)
    else sqlCode match {
      case Types.BIGINT => ps.setLong(idx, row.getLong(col))
      case Types.INTEGER => ps.setInt(idx, row.getInt(col))
      case Types.SMALLINT => ps.setShort(idx, row.getAs[Number](col).shortValue())
      case Types.DOUBLE => ps.setDouble(idx, row.getDouble(col))
      case Types.REAL => ps.setFloat(idx, row.getFloat(col))
      case Types.BOOLEAN => ps.setBoolean(idx, row.getBoolean(col))
      case Types.DECIMAL => ps.setBigDecimal(idx, row.getDecimal(col))
      case Types.TIMESTAMP => ps.setTimestamp(idx, row.getTimestamp(col))
      case Types.DATE => ps.setDate(idx, row.getDate(col))
      case _ => ps.setString(idx, String.valueOf(row.get(col)))
    }
}
