package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {

  test("dot and cosine on float and double arrays, mixed element types") {
    import spark.implicits._
    val df = Seq((Seq(1f, 2f, 3f), Seq(4.0, 5.0, 6.0))).toDF("f", "d")
    val r = df.select(
      VectorOps.dot_product(col("f"), col("d")).as("dot"),
      round(VectorOps.cosine_sim(col("f"), col("f")), 9).as("self"),
      VectorOps.cosine_sim(col("f"), col("d")).as("cos")).collect().head
    assert(r.getDouble(0) === 32.0)
    assert(r.getDouble(1) === 1.0)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
  }

  test("length mismatch and zero-norm inputs yield NULL") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0), Seq(0.0, 0.0))).toDF("a", "b", "z")
    val r = df.select(
      VectorOps.dot_product(col("a"), col("b")).as("mismatch"),
      VectorOps.cosine_sim(col("a"), col("z")).as("zeronorm")).collect().head
    assert(r.isNullAt(0))
    assert(r.isNullAt(1))
  }

  test("matches the interpreted fold bit-for-bit (oracle stability)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = Seq.fill(200)((Seq.fill(64)(rnd.nextFloat()), Seq.fill(64)(rnd.nextFloat())))
      .toDF("a", "b")
    val folded = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val diffs = df.select((VectorOps.dot_product(col("a"), col("b")) - folded).as("d"))
      .agg(max(abs(col("d")))).collect().head.getDouble(0)
    assert(diffs === 0.0, "codegen dot must equal the fold exactly")
  }
}
