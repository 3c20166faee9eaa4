package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FnvSpec extends SparkSpec {

  /** Published FNV-1a 64 reference vectors (unsigned, from the FNV spec's
    * parameters: offset 0xcbf29ce484222325, prime 0x100000001b3). The DuckDB
    * oracle replays this exact byte loop in SQL — if these pins move, every
    * sketch oracle moves with them. */
  private val pins = Seq(
    "" -> java.lang.Long.parseUnsignedLong("14695981039346656037"),
    "hello" -> java.lang.Long.parseUnsignedLong("11831194018420276491"),
    "a" -> java.lang.Long.parseUnsignedLong("12638187200555641996"))

  test("fnv1a64: pinned reference values, direct and through codegen") {
    import spark.implicits._
    pins.foreach { case (s, expect) =>
      assert(graft.ext.SimHash.fnv1a(s.getBytes("UTF-8")) === expect,
        s"direct fnv1a($s)")
    }
    // through the Expression (whole-stage codegen path)
    val rows = pins.map(_._1).toDF("s")
      .select(col("s"), Fnv.fnv1a64(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    pins.foreach { case (s, expect) => assert(rows(s) === expect, s"column fnv1a($s)") }
  }

  test("fnv1a64: multi-byte UTF-8 hashes the bytes, not the codepoints") {
    import spark.implicits._
    val s = "héllo 世界"
    val viaCol = Seq(s).toDF("s").select(Fnv.fnv1a64(col("s"))).head().getLong(0)
    assert(viaCol === graft.ext.SimHash.fnv1a(s.getBytes("UTF-8")))
    assert(viaCol !== graft.ext.SimHash.fnv1a(s.map(_.toByte).toArray))
  }

  test("fnv1a64: null in, null out") {
    import spark.implicits._
    val r = Seq[Option[String]](None).toDF("s").select(Fnv.fnv1a64(col("s"))).head()
    assert(r.isNullAt(0))
  }

  // scalatest/scalacheck bridge isn't in the offline cache; sample directly.
  private def samples[A](g: org.scalacheck.Gen[A], n: Int): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("fnv1a64 property: codegen column == direct loop on arbitrary unicode") {
    import org.scalacheck.Gen
    import spark.implicits._
    val gen = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf('a', 'é', '世', ' ', '0', '\t')).map(_.mkString),
      Gen.const(""))
    val ss = samples(gen, 200).distinct
    val viaCol = ss.toDF("s").select(col("s"), Fnv.fnv1a64(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    ss.foreach { s =>
      assert(viaCol(s) === graft.ext.SimHash.fnv1a(s.getBytes("UTF-8")), s"for ${s.take(40)}")
    }
  }

  test("simhash property: order-invariant, duplicate-token-sensitive") {
    import org.scalacheck.Gen
    import spark.implicits._
    val word = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val docGen = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word))
    samples(docGen, 60).foreach { toks =>
      val perm = scala.util.Random.shuffle(toks)
      val df = Seq((toks.mkString(" "), perm.mkString(" "))).toDF("a", "b")
        .select(
          graft.ext.SimHash.simhash64(split(col("a"), " ")).as("ha"),
          graft.ext.SimHash.simhash64(split(col("b"), " ")).as("hb"))
        .head()
      // the bit votes are a commutative sum over tokens -> order never matters
      assert(df.getLong(0) === df.getLong(1), s"order variance on $toks")
    }
  }

  test("fmix64: pinned murmur3-finalizer vectors, direct and through codegen") {
    import spark.implicits._
    // independently computed (and cross-checked against the DuckDB replay)
    val mixPins = Seq(
      0L -> 0L,
      1L -> 6866073966979089171L,
      0xcbf29ce484222325L -> java.lang.Long.parseUnsignedLong("17654655229998161022"))
    mixPins.foreach { case (in, out) => assert(Fnv.fmix64(in) === out, s"fmix64($in)") }
    // the column path: fnv1a64mixed = fmix64 ∘ fnv1a (fnv1a("") is the FNV
    // offset basis, so the empty string exercises the third pin)
    val viaCol = Seq("").toDF("s").select(Fnv.fnv1a64mixed(col("s"))).head().getLong(0)
    assert(viaCol === Fnv.fmix64(graft.ext.SimHash.fnv1a(Array.empty[Byte])))
  }

  test("wrong input types are rejected at ANALYSIS time, not runtime codegen") {
    import spark.implicits._
    // fnv1a64 over a LONG column: ExpectsInputTypes must fail the plan in
    // analysis (AnalysisException), never as a ClassCastException mid-query
    val longs = Seq(1L, 2L).toDF("v")
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      longs.select(Fnv.fnv1a64(col("v"))).collect()
    }
    assert(e1.getMessage.toLowerCase.contains("type"))
    // simhash64 over a plain STRING (not ARRAY<STRING>)
    val strs = Seq("a b").toDF("s")
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      strs.select(graft.ext.SimHash.simhash64(col("s"))).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("type"))
  }
}
