package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.functions.U256._

class U256Spec extends SparkSpec {

  // scalatest/scalacheck bridge isn't in the offline cache; sample directly.
  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val genUnsigned: Gen[BigInteger] = Gen.oneOf(
    Gen.chooseNum(0L, Long.MaxValue).map(BigInteger.valueOf),
    Gen.listOfN(64, Gen.numChar).map(ds => new BigInteger(ds.mkString).mod(UMax)),
    Gen.const(BigInteger.ZERO), Gen.const(UMax))

  private val genSigned: Gen[BigInteger] = Gen.oneOf(
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(BigInteger.valueOf),
    Gen.listOfN(60, Gen.numChar).map(ds => new BigInteger(ds.mkString).mod(IMax)),
    Gen.listOfN(60, Gen.numChar).map(ds => new BigInteger(ds.mkString).mod(IMax).negate()),
    Gen.const(IMin), Gen.const(IMax), Gen.const(BigInteger.ZERO))

  test("unsigned roundtrip") {
    samples(genUnsigned).foreach { v =>
      assert(decodeUnsigned(encodeUnsigned(v)) === v)
    }
  }

  test("signed roundtrip (incl. extremes — fixes reference Int256 sign bug)") {
    samples(genSigned).foreach { v =>
      assert(decodeSigned(encodeSigned(v)) === v)
    }
  }

  private def unsignedLexCompare(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val c = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    0
  }

  test("encoding preserves numeric order under unsigned byte comparison") {
    samples(genUnsigned).zip(samples(genUnsigned)).foreach { case (a, b) =>
      assert(math.signum(unsignedLexCompare(encodeUnsigned(a), encodeUnsigned(b))) ===
        math.signum(a.compareTo(b)))
    }
    samples(genSigned).zip(samples(genSigned)).foreach { case (a, b) =>
      assert(math.signum(unsignedLexCompare(encodeSigned(a), encodeSigned(b))) ===
        math.signum(a.compareTo(b)))
    }
  }

  test("out-of-range encode is rejected") {
    intercept[IllegalArgumentException](encodeUnsigned(BigInteger.valueOf(-1)))
    intercept[IllegalArgumentException](encodeUnsigned(UMax.add(BigInteger.ONE)))
    intercept[IllegalArgumentException](encodeSigned(IMax.add(BigInteger.ONE)))
    intercept[IllegalArgumentException](encodeSigned(IMin.subtract(BigInteger.ONE)))
  }

  // ---- Spark integration -------------------------------------------------

  test("Spark ORDER BY on encoded u256 equals numeric order") {
    val vals = Seq(
      "0", "1", "255", "256", "18446744073709551615", // u64 max
      "18446744073709551616",
      "340282366920938463463374607431768211456", // 2^128
      UMax.toString)
    import spark.implicits._
    val df = scala.util.Random.shuffle(vals).toDF("s")
      .withColumn("enc", u256_from_str(col("s")))
    val sorted = df.orderBy(col("enc")).select(u256_to_str(col("enc"))).as[String].collect()
    assert(sorted.toSeq === vals)
  }

  test("Spark roundtrip + NULL on malformed (permissive mode)") {
    import spark.implicits._
    val df = Seq("123", "abc", "-5", UMax.toString, "9" + UMax.toString).toDF("s")
      .select(col("s"), u256_to_str(u256_from_str(col("s"))).as("rt"))
    val m = df.as[(String, Option[String])].collect().toMap
    assert(m("123").contains("123"))
    assert(m(UMax.toString).contains(UMax.toString))
    assert(m("abc").isEmpty)          // malformed -> NULL
    assert(m("-5").isEmpty)           // negative out of unsigned range -> NULL
    assert(m("9" + UMax.toString).isEmpty) // overflow -> NULL
  }

  test("Spark signed roundtrip and arithmetic") {
    import spark.implicits._
    val df = Seq(("-42", "100")).toDF("a", "b")
      .select(
        u256_to_str(u256_add(u256_from_str(col("a"), signed = true),
          u256_from_str(col("b"), signed = true), signed = true), signed = true).as("sum"),
        u256_to_str(u256_mul(u256_from_str(col("a"), signed = true),
          u256_from_str(col("b"), signed = true), signed = true), signed = true).as("prod"),
        u256_to_str(u256_sub(u256_from_str(col("a"), signed = true),
          u256_from_str(col("b"), signed = true), signed = true), signed = true).as("diff"))
    val r = df.collect().head
    assert(r.getString(0) === "58")
    assert(r.getString(1) === "-4200")
    assert(r.getString(2) === "-142")
  }

  test("arithmetic overflow -> NULL (permissive)") {
    import spark.implicits._
    val df = Seq((UMax.toString, "2")).toDF("a", "b")
      .select(u256_mul(u256_from_str(col("a")), u256_from_str(col("b"))).as("prod"))
    assert(df.collect().head.isNullAt(0))
  }

  test("u256_sum: exact big-integer group sums across partitions") {
    import spark.implicits._
    val big = BigInteger.ONE.shiftLeft(200) // far past any native type
    val rows = (1 to 500).map(i =>
      (i % 3, big.add(BigInteger.valueOf(i)).toString))
    val out = rows.toDF("g", "v").repartition(8)
      .select(col("g"), u256_from_str(col("v")).as("v256"))
      .groupBy(col("g")).agg(u256_to_str(u256_sum(col("v256"))).as("total"))
      .collect().map(r => r.getInt(0) -> new BigInteger(r.getString(1))).toMap
    val expect = rows.groupBy(_._1).view.mapValues(
      _.map(t => new BigInteger(t._2)).reduce(_ add _)).toMap
    assert(out === expect,
      "the distributed fold (partials + merge) must equal the exact sum")
  }

  test("u256_sum: wraps mod 2^256 on overflow (ClickHouse semantics), NULL for empty/null-only") {
    import spark.implicits._
    val out = Seq(UMax.toString, "5")
      .toDF("v").select(u256_from_str(col("v")).as("v256"))
      .agg(u256_to_str(u256_sum(col("v256"))).as("total"))
      .collect().head.getString(0)
    assert(new BigInteger(out) === BigInteger.valueOf(4),
      "UMax + 5 must wrap to 4 mod 2^256")
    val empty = Seq(Option.empty[String]).toDF("v")
      .select(u256_from_str(col("v")).as("v256"))
      .agg(u256_sum(col("v256")).as("total"))
      .collect().head
    assert(empty.isNullAt(0), "SQL SUM of no values is NULL")
  }

  test("u256_sum: signed values wrap in two's complement and sum exactly in range") {
    import spark.implicits._
    val out = Seq("-100", "40", "-5")
      .toDF("v").select(u256_from_str(col("v"), signed = true).as("v256"))
      .agg(u256_to_str(u256_sum(col("v256"), signed = true), signed = true).as("total"))
      .collect().head.getString(0)
    assert(out === "-65")
    val wrapped = Seq(IMax.toString, "1")
      .toDF("v").select(u256_from_str(col("v"), signed = true).as("v256"))
      .agg(u256_to_str(u256_sum(col("v256"), signed = true), signed = true).as("total"))
      .collect().head.getString(0)
    assert(new BigInteger(wrapped) === IMin, "IMax + 1 wraps to IMin")
  }
}
