package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CmsSpec extends SparkSpec {
  import spark.implicits._

  // skewed stream: token t_k appears k times, k = 1..40 (820 increments)
  private def stream = (1 to 40).flatMap(k => Seq.fill(k)(s"t_$k")).toDF("w")

  private def exact = stream.groupBy("w").agg(count(lit(1)).as("n_exact"))

  test("one-sided error: estimate >= true count for every item") {
    // tiny grid (d=2, w=16) so collisions definitely happen
    val sk = Cms.sketch(stream, "w", d = 2, w = 16)
    val est = Cms.estimate(sk, exact, "w", d = 2, w = 16)
      .as[(String, Long, Long)].collect()
    assert(est.length === 40)
    est.foreach { case (w, n, e) =>
      assert(e >= n, s"$w: estimate $e below true count $n — CMS must never under-count")
    }
  }

  test("exact when the grid is collision-free") {
    // 40 distinct items into w = 2^16 buckets across 4 rows: the chance any
    // item collides in ALL rows is negligible; min over rows recovers truth
    val sk = Cms.sketch(stream, "w", d = 4, w = 1 << 16)
    val est = Cms.estimate(sk, exact, "w", d = 4, w = 1 << 16)
      .as[(String, Long, Long)].collect()
    est.foreach { case (w, n, e) => assert(e === n, s"$w: $e != $n at w=65536") }
  }

  test("grid size and mass: <= d*w cells, total mass = d * increments") {
    val sk = Cms.sketch(stream, "w", d = 3, w = 32).cache()
    try {
      assert(sk.count() <= 3 * 32)
      val mass = sk.agg(sum("cnt")).as[Long].head()
      assert(mass === 3L * 820, s"every increment must hit every row once, got $mass")
    } finally sk.unpersist()
  }

  test("mergeable: sketch(a union b) = cell-wise sum of the part sketches") {
    val (a, b) = (stream.filter(length(col("w")) === 3), // t_1..t_9
                  stream.filter(length(col("w")) =!= 3))
    val whole = Cms.sketch(stream, "w", d = 2, w = 16)
    val merged = Cms.sketch(a, "w", d = 2, w = 16)
      .unionAll(Cms.sketch(b, "w", d = 2, w = 16))
      .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select(col("row").cast("long"), col("bucket").cast("long"),
        col("cnt").cast("long")).as[(Long, Long, Long)].collect().toSet
    assert(cells(whole) === cells(merged))
  }

  test("params are seed-stable and rows are distinct") {
    assert(Cms.cmsParams(4) === Cms.cmsParams(4))
    assert(Cms.cmsParams(4).distinct.size === 4)
    Cms.cmsParams(4).foreach { case (a, _) => assert(a % 2 === 1, "a must be odd") }
  }
}
