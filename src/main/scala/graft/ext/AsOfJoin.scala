package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (backward, inclusive): each left row picks the single latest
  * right row with `rightTs <= leftTs` for the same key — the time-series
  * join Spark has no built-in operator for.
  *
  * Implemented by COMPOSITION (the preferred order for custom operators:
  * compose > custom Expression > custom plan): both sides union into one
  * tagged stream, one hash-partition by key + sort by (ts, side), and a
  * last-non-null carry-forward window propagates the latest right row —
  * carried as ONE struct so all payload columns come from the same row —
  * to every left row after it. Cost = ONE shuffle of |L|+|R| rows — never
  * the range-explosion of an inequality join, and AQE/skew handling apply
  * as to any window. A right row at exactly leftTs matches (side ordering
  * puts right before left on ties).
  */
object AsOfJoin {

  /** @param rightCols payload columns carried from the right side
    * @param joinType "inner" (drop unmatched left rows) or "left" */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      joinType: String = "left"): DataFrame = {
    require(Seq("inner", "left").contains(joinType), s"unsupported joinType $joinType")
    val payload = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTs)
    val rStruct = struct(rightCols.map(col): _*)
    // tagged union: side 0 = right (sorts first on ts ties -> inclusive)
    val rTagged = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        rStruct.as("__r")) ++
        payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(right.select(rStruct).schema.head.dataType).as("__r")) ++
        payload.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.unionByName(lTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched =
      if (joinType == "inner") carried.filter(col("__match").isNotNull) else carried
    matched.select(
      (keys.map(col) :+ col("__ts").as(leftTs)) ++
        payload.map(col) ++
        rightCols.map(c => col("__match").getField(c).as(c)): _*)
  }
}
