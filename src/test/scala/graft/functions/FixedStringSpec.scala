package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

class FixedStringSpec extends SparkSpec {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("encode pads short values with zero bytes (reference table_info.rs:140-146)") {
    val e = FixedString.encode("abc".getBytes("UTF-8"), 8)
    assert(e.length === 8)
    assert(e.take(3).toSeq === "abc".getBytes("UTF-8").toSeq)
    assert(e.drop(3).forall(_ == 0))
  }

  test("encode truncates long values to n bytes") {
    val e = FixedString.encode("abcdefgh".getBytes("UTF-8"), 4)
    assert(e.toSeq === "abcd".getBytes("UTF-8").toSeq)
  }

  test("decode strips trailing zeros only") {
    assert(new String(FixedString.decode(FixedString.encode("abc".getBytes("UTF-8"), 8)), "UTF-8") === "abc")
    assert(FixedString.decode(Array[Byte](0, 0)).isEmpty)
    assert(FixedString.decode(Array[Byte](97, 0, 98, 0, 0)).toSeq === Seq[Byte](97, 0, 98))
  }

  test("roundtrip property for values that fit") {
    samples(Gen.resize(16, Gen.alphaNumStr)).foreach { s =>
      assert(new String(FixedString.decode(FixedString.encode(s.getBytes("UTF-8"), 16)), "UTF-8") === s)
    }
  }

  test("Spark end-to-end: encode is fixed-width, decode restores text (codegen path)") {
    import spark.implicits._
    val df = Seq("a", "abcdef", "", "exactly8").toDF("s")
      .select(col("s"),
        FixedString.fixed_string_encode(col("s"), 8).as("enc"))
      .select(col("s"), length(col("enc")).as("len"),
        FixedString.fixed_string_decode(col("enc")).as("back"))
    df.collect().foreach { r =>
      assert(r.getInt(1) === 8)
      assert(r.getString(2) === r.getString(0))
    }
  }

  test("width must be positive") {
    intercept[IllegalArgumentException](FixedStringEncode(null, 0))
  }
}
