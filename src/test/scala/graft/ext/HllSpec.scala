package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {

  private def est(n: Int, p: Int = 8): (Double, Long) = {
    import spark.implicits._
    val df = (0 until n).map(i => s"value_$i").toDF("v")
    val row = Hll.approxDistinct(df, "v", p).head()
    (row.getAs[Double]("est_hll"), row.getAs[Long]("n_exact"))
  }

  test("estimate lands within HLL's error envelope across cardinalities") {
    // standard error for m=256 is 1.04/sqrt(256) = 6.5%; assert 4 sigma so
    // the test never flakes while a broken register/rank path (errors of
    // 2-10x) still fails decisively
    Seq(50, 500, 5000, 50000).foreach { n =>
      val (e, exact) = est(n)
      assert(exact === n)
      assert(math.abs(e - n) / n <= 0.26, s"n=$n est=$e off by >4 sigma")
    }
  }

  test("duplicates do not move the estimate (hash collapses them)") {
    import spark.implicits._
    val once = (0 until 1000).map(i => s"v$i")
    val dup = once ++ once ++ once
    val a = Hll.approxDistinct(once.toDF("v"), "v").head()
    val b = Hll.approxDistinct(dup.toDF("v"), "v").head()
    assert(a.getAs[Double]("est_hll") === b.getAs[Double]("est_hll"))
    assert(a.getAs[String]("z_scaled") === b.getAs[String]("z_scaled"))
    assert(b.getAs[Long]("n_exact") === 1000L)
  }

  test("NULL values occupy no register and do not move the estimate") {
    import spark.implicits._
    val clean = (0 until 500).map(i => Option(s"v$i"))
    val dirty = clean ++ Seq.fill(50)(Option.empty[String])
    def regMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(regMap(Hll.registers(dirty.toDF("v"), "v")) ===
      regMap(Hll.registers(clean.toDF("v"), "v")),
      "a null input must not create an (idx=null) register row")
    val a = Hll.approxDistinct(clean.toDF("v"), "v").head()
    val b = Hll.approxDistinct(dirty.toDF("v"), "v").head()
    assert(a.getAs[String]("z_scaled") === b.getAs[String]("z_scaled"))
    assert(b.getAs[Long]("n_exact") === 500L,
      "COUNT DISTINCT semantics: NULLs are not counted")
  }

  test("small-range branch: tiny cardinalities use linear counting") {
    // with n << m most registers are empty -> E_raw <= 2.5m and v_empty > 0
    // forces the m*ln(m/V) branch; linear counting is very accurate there
    Seq(1, 5, 20).foreach { n =>
      val (e, exact) = est(n)
      assert(exact === n)
      assert(math.abs(e - n) <= math.max(1.0, 0.05 * n),
        s"linear counting should be near-exact at n=$n, got $e")
    }
  }

  test("n_exact rides the same pass: per-register distincts sum globally") {
    import spark.implicits._
    // values chosen adversarially equal-ish: many duplicates across registers
    val vals = (0 until 300).map(i => s"k${i % 97}")
    val row = Hll.approxDistinct(vals.toDF("v"), "v").head()
    assert(row.getAs[Long]("n_exact") === 97L)
  }

  test("non-string input columns are hashed via their cast string form") {
    import spark.implicits._
    val longs = (0L until 1000L).toDF("v")
    val strs = (0L until 1000L).map(_.toString).toDF("v")
    val a = Hll.approxDistinct(longs, "v").head()
    val b = Hll.approxDistinct(strs, "v").head()
    assert(a.getAs[String]("z_scaled") === b.getAs[String]("z_scaled"),
      "LONG 42 and STRING '42' must land in identical registers")
  }

  test("merge is exactly the union's sketch; inclusion-exclusion brackets the overlap") {
    import spark.implicits._
    val a = (0L until 800L).toDF("v")          // 0..799
    val b = (500L until 1500L).toDF("v")       // 500..1499, overlap 300
    val ra = Hll.registers(a, "v")
    val rb = Hll.registers(b, "v")
    def regMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the identity every distributed HLL rests on: registers(A ∪ B) ==
    // merge(registers(A), registers(B)), register for register
    assert(regMap(Hll.merge(ra, rb)) === regMap(Hll.registers(a.union(b), "v")))
    val estA = Hll.estimate(ra).head().getDouble(0)
    val estB = Hll.estimate(rb).head().getDouble(0)
    val estU = Hll.estimate(Hll.merge(ra, rb)).head().getDouble(0)
    val common = estA + estB - estU
    // p=8 → ~6.5% per estimate; allow a generous compounded envelope
    assert(common > 100 && common < 500,
      s"inclusion-exclusion estimate $common should bracket the true 300")
  }

  test("grouped registers merge to exactly the one-pass sketch") {
    import spark.implicits._
    val rows = (1L to 5000L).map(i => (i % 7, s"u${i % 613}")).toDF("g", "v")
    def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val oneShot = toMap(Hll.registers(rows.select($"v"), "v"))
    val merged = toMap(Hll.mergeGrouped(Hll.registersBy(rows, "v", "g")))
    assert(merged === oneShot, "register-wise max must commute with union")
    // and therefore the estimates agree exactly
    val a = Hll.estimate(Hll.registers(rows.select($"v"), "v")).collect().head.getDouble(0)
    val b = Hll.estimate(Hll.mergeGrouped(Hll.registersBy(rows, "v", "g")))
      .collect().head.getDouble(0)
    assert(a === b)
  }
}
