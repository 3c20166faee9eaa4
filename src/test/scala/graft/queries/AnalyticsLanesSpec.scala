package graft.queries

import org.apache.spark.sql.Row

import graft.{SparkSpec, SparkEntry}

/** Independent brute-force replicas for the wave-4 analytics operators.
  *
  * Each test recomputes the operator's answer from first principles in
  * plain Scala over the collected sf0.001 fixture (small enough to hold on
  * the driver in a TEST) and compares it to the distributed lane — the same
  * replica discipline as the FFD/packing specs: the oracle proves
  * cross-engine SQL parity, these prove the OPERATOR SEMANTICS against an
  * implementation that shares no code with the lane.
  */
class AnalyticsLanesSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("sort_skyline_pareto equals brute-force dominance on the fixture") {
    val got = SparkEntry.queries("sort_skyline_pareto")(spark, d).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    // brute force: collect purchase points, test every pair
    val pts = graft.Tables.events(spark, d)
      .filter("event_type = 'purchase' AND value IS NOT NULL")
      .selectExpr("value", "ts_ns div 1000 as tus").collect()
      .map(r => (r.getDouble(0), r.getLong(1)))
    def dominated(p: (Double, Long)) = pts.exists { q =>
      q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2)
    }
    val frontier = pts.filterNot(dominated)
      .groupBy(identity).map { case ((v, t), g) => (v, t, g.length.toLong) }
      .toSeq.sortBy { case (v, t, _) => (-v, t) }
    assert(got.toSeq == frontier,
      s"lane=${got.toSeq} bruteforce=$frontier")
    assert(got.nonEmpty)
  }

  test("sim_mmr_diversify equals an independent greedy over raw vectors") {
    val got = SparkEntry.queries("sim_mmr_diversify")(spark, d).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // independent: collect raw vectors, sequential-order cosine in plain
    // Scala (same leaf rounding contract: 6 decimals via BigDecimal
    // HALF_UP on the shortest repr, matching Spark round())
    val vecs = graft.Tables.embeddings(spark, d)
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def round6(x: Double): Double =
      new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = vecs(0L)
    val cand = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, round6(cos(v, q))) }
      .sortBy { case (id, rel) => (-rel, id) }.take(20)
    val relMap = cand.toMap
    var selected = Vector.empty[(Int, Long, Double, Double)]
    var remaining = relMap.keySet
    for (step <- 1 to 5) {
      val scored = remaining.toSeq.map { id =>
        val rel = relMap(id)
        val score = if (step == 1) rel
          else 0.7 * rel - 0.3 * selected.map(p =>
            round6(cos(vecs(id), vecs(p._2)))).max
        (id, rel, score)
      }
      val best = scored.minBy { case (id, _, sc) => (-sc, id) }
      selected :+= ((step, best._1, round6(best._2), round6(best._3)))
      remaining -= best._1
    }
    assert(got.toSeq == selected, s"lane=${got.toSeq} replica=$selected")
  }

  test("agg_weighted_median equals a brute-force lower weighted median") {
    val got = SparkEntry.queries("agg_weighted_median")(spark, d).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val rows = graft.Tables.lineitem(spark, d)
      .selectExpr("l_returnflag", "l_extendedprice", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val expect = rows.groupBy(_._1).map { case (flag, g) =>
      val tw = g.map(_._3).sum
      // ascending by value, accumulate weight until the tw/2 crossing
      val sorted = g.groupBy(_._2).map { case (v, vs) => (v, vs.map(_._3).sum) }
        .toSeq.sortBy(_._1)
      var cum = 0.0
      val med = sorted.collectFirst {
        case (v, w) if { cum += w; cum >= tw / 2 } => v
      }.get
      (flag, tw, med)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq == expect, s"lane=${got.toSeq} bruteforce=$expect")
  }
}
