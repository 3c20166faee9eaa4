package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  /** driver-side replica of the quantized power iteration */
  private def refRank(edges: Seq[(Long, Long)], iters: Int, d: Double): Map[Long, Double] = {
    val sym = (edges ++ edges.map(_.swap)).distinct
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size
    var r: Map[Long, Double] = deg.keysIterator.map(_ -> 1.0 / n).toMap
    def q(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 1 to iters)
      r = deg.keysIterator.map { v =>
        val in = sym.collect { case (u, `v`) => r(u) / deg(u) }.sum
        v -> q((1 - d) / n + d * in, 10)
      }.toMap
    r.view.mapValues(q(_, 6)).toMap
  }

  test("pageRank: star center dominates, scores replicate the quantized reference") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (5L, 6L))
    val got = Graph.pageRank(edges.toDF("id1", "id2"), iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expect = refRank(edges, 10, 0.85)
    assert(got.keySet === expect.keySet)
    got.foreach { case (id, v) => assert(v === expect(id), s"node $id") }
    assert(got(0L) > got(1L) && got(1L) === got(4L),
      "the star center must outrank its leaves; leaves tie")
    assert(got(5L) === got(6L), "the isolated pair splits evenly")
    // probability mass is conserved (up to the per-iteration quantization)
    assert(math.abs(got.values.sum - 1.0) < 1e-5)
  }

  test("triangleCounts: two triangles sharing an edge, orientation-invariant") {
    import spark.implicits._
    // K3 {1,2,3} plus K3 {2,3,4} (sharing edge 2-3), a pendant 4-5, and an
    // isolated edge 6-7: shared-edge nodes 2,3 sit in BOTH triangles
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (6L, 7L))
    val expect = Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L)
    val got = Graph.triangleCounts(edges.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expect)
    // reversed + duplicated + self-loop input: same canonical edge set,
    // same counts (the orientation and dedup are the operator's job)
    val messy = (edges.map(_.swap) ++ edges ++ Seq((2L, 2L))).toDF("id1", "id2")
    val got2 = Graph.triangleCounts(messy)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === expect)
    // triangle-free graph: empty result, not a failure
    assert(Graph.triangleCounts(Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2"))
      .count() === 0)
  }

  test("pageRank: edgeless input yields an empty frame, bad params refuse") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Graph.pageRank(empty).count() === 0)
    intercept[IllegalArgumentException] {
      Graph.pageRank(empty, iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(empty, damping = 1.0)
    }
  }
}
