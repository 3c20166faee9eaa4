package graft.sink

import java.nio.file.Files

import graft.SparkSpec

class DdlSetupSpec extends SparkSpec {

  test("executes each ';'-separated statement in order (reference main.rs:279-289)") {
    val f = Files.createTempFile("setup", ".sql")
    Files.writeString(f,
      """CREATE OR REPLACE TEMPORARY VIEW ddl_a AS SELECT 1 AS x;
        |
        |CREATE OR REPLACE TEMPORARY VIEW ddl_b AS SELECT x + 1 AS y FROM ddl_a;
        |  ;
        |""".stripMargin)
    val n = DdlSetup.runFile(spark, f.toString)
    assert(n === 2) // empty statements skipped
    assert(spark.table("ddl_b").collect().head.getInt(0) === 2)
  }

  test("failing statement surfaces with its SQL attached") {
    val e = intercept[IllegalArgumentException] {
      DdlSetup.runStatements(spark, "SELECT 1; SELECT * FROM nope_not_there")
    }
    assert(e.getMessage.contains("nope_not_there"))
  }
}
