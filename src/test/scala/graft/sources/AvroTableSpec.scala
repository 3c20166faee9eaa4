package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Avro container-file codec: lossless round-trip over the supported
  * primitive lanes, null handling, and reader-schema evolution. */
class AvroTableSpec extends SparkSpec {

  private val schema = StructType.fromDDL(
    "id LONG, name STRING, score DOUBLE, flag BOOLEAN, blob BINARY")

  private def fixture() = {
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, Array[Byte](1, 2, 3)),
      Row(2L, null, -2.25, false, null),
      Row(3L, "gamma", 0.0, true, Array[Byte]()))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
  }

  test("round-trip is lossless across primitives, nulls, and binary") {
    val path = java.nio.file.Files.createTempDirectory("graft_avro_spec").toString + "/t"
    AvroTable.write(fixture(), path)
    val back = AvroTable.read(spark, path, schema).orderBy("id").collect()
    val orig = fixture().orderBy("id").collect()
    assert(back.length === 3)
    back.zip(orig).foreach { case (b, o) =>
      assert(b.getLong(0) === o.getLong(0))
      assert(b.getAs[String](1) === o.getAs[String](1))
      assert(b.getDouble(2) === o.getDouble(2))
      assert(b.getBoolean(3) === o.getBoolean(3))
      assert(Option(b.getAs[Array[Byte]](4)).map(_.toSeq) ===
        Option(o.getAs[Array[Byte]](4)).map(_.toSeq))
    }
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(path).getParentFile)
  }

  test("reader schema may add a trailing nullable column (Avro resolution)") {
    val path = java.nio.file.Files.createTempDirectory("graft_avro_evo").toString + "/t"
    AvroTable.write(fixture().select(col("id"), col("name")), path)
    val widened = AvroTable.read(spark, path,
      StructType.fromDDL("id LONG, name STRING, extra STRING"))
      .orderBy("id").collect()
    assert(widened.map(r => (r.getLong(0), r.isNullAt(2))).toSeq ===
      Seq((1L, true), (2L, true), (3L, true)))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(path).getParentFile)
  }

  test("non-nullable columns round-trip (noDefault, not an illegal null default)") {
    import spark.implicits._
    // toDF over primitives yields NON-nullable columns — the lane that
    // crashed when every field took withDefault(null)
    val df = Seq((1L, 2.5), (3L, 4.5)).toDF("id", "x")
    assert(!df.schema("id").nullable)
    val path = java.nio.file.Files.createTempDirectory("graft_avro_nn").toString + "/t"
    AvroTable.write(df, path)
    val back = AvroTable.read(spark, path,
      StructType.fromDDL("id LONG, x DOUBLE")).orderBy("id").collect()
    assert(back.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((1L, 2.5), (3L, 4.5)))
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(path).getParentFile)
  }

  test("unsupported column types are rejected up front") {
    intercept[IllegalArgumentException] {
      AvroTable.avroSchema(StructType.fromDDL("ts TIMESTAMP"))
    }
  }
}
