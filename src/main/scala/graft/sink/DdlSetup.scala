package graft.sink

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Operator O16 — the `setup` subcommand (reference `src/main.rs:279-289`):
  * read a SQL file, split on ';', trim, execute each non-empty statement in
  * order. Statements run through `spark.sql`, so anything Spark DDL supports
  * (CREATE TABLE/VIEW ... USING parquet, etc.) works; errors surface with
  * the failing statement attached. */
object DdlSetup {

  def runFile(spark: SparkSession, path: String): Int =
    runStatements(spark, Files.readString(Paths.get(path)))

  def runStatements(spark: SparkSession, sql: String): Int = {
    val stmts = sql.split(";").map(_.trim).filter(_.nonEmpty)
    stmts.foreach { s =>
      try spark.sql(s)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"DDL setup failed on statement: $s", e)
      }
    }
    stmts.length
  }
}
