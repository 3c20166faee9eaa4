package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable point-in-interval range join. Spark's only native plan for
  * `p.x BETWEEN i.lo AND i.hi` is a (broadcast) nested loop — O(|P|·|I|).
  * Composed alternative: overlay a fixed grid of width `cell`; every point
  * maps to one cell, every interval explodes to the cells it overlaps, and
  * the match becomes an EQUI-join on the cell id followed by the exact
  * predicate. Cost: one hash join of |P| + Σ(interval span/cell) rows —
  * linear for intervals short relative to the cell size, which is the
  * tuning knob (cell ≈ typical interval length).
  */
object RangeJoin {

  /** @param points   frame with a numeric `xCol`
    * @param intervals frame with numeric `loCol`/`hiCol` (inclusive bounds)
    * @param cell     grid width; choose ≈ the typical interval span */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      xCol: String,
      loCol: String,
      hiCol: String,
      cell: Double): DataFrame = {
    require(cell > 0)
    val p = points.withColumn("__cell", floor(col(xCol) / cell).cast("long"))
    val i = intervals.withColumn("__cell",
      explode(sequence(floor(col(loCol) / cell).cast("long"),
        floor(col(hiCol) / cell).cast("long"))))
    p.join(i, "__cell")
      .filter(col(xCol) >= col(loCol) && col(xCol) <= col(hiCol))
      .drop("__cell")
  }
}
