package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** As-of join — each left row picks ONE right row for the same key by time
  * proximity: the latest `rightTs <= leftTs` (backward, the default), the
  * earliest `rightTs >= leftTs` (forward), or whichever of the two is
  * closer (nearest; exact ties go backward) — pandas `merge_asof` surface,
  * plus an optional `tolerance` bound on the match distance. The
  * time-series join Spark has no built-in operator for.
  *
  * Implemented by COMPOSITION (the preferred order for custom operators:
  * compose > custom Expression > custom plan): both sides union into one
  * tagged stream, ONE hash-partition by key, and last-non-null
  * carry-forward windows propagate the nearest right row — carried as ONE
  * struct (match ts + payload) so all columns come from the same row — to
  * every left row. `nearest` adds only a second SORT over the SAME
  * partitioning (the reversed window reuses the exchange; pinned in
  * AsOfJoinSpec). Cost = ONE shuffle of |L|+|R| rows — never the
  * range-explosion of an inequality join, and AQE/skew handling apply as
  * to any window. A right row at exactly leftTs matches in every
  * direction (side ordering puts right before left on ties). Right rows
  * sharing (key, rightTs) resolve to the lexicographically greatest
  * payload tuple — a pinned, engine-replayable tie rule, not arrival
  * order (see `carry`).
  */
object AsOfJoin {

  /** @param rightCols payload columns carried from the right side
    * @param joinType  "inner" (drop unmatched left rows) or "left"
    * @param direction "backward" | "forward" | "nearest"
    * @param tolerance max |leftTs − matchTs| for a match to stand, in the
    *                  ts columns' own units (µs for TimestampType columns,
    *                  which are compared on `unix_micros`); None = unbounded */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      joinType: String = "left",
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(Seq("inner", "left").contains(joinType), s"unsupported joinType $joinType")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unsupported direction $direction")
    def tsLong(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      dt match {
        case TimestampType => unix_micros(c)
        case _ => c.cast("long")
      }
    val payload = left.columns.toSeq.filterNot(c => keys.contains(c) || c == leftTs)
    // the carried struct leads with the match's OWN timestamp (as a long),
    // so tolerance and nearest-arbitration read it without a join back
    val rStruct = struct(
      tsLong(col(rightTs), right.schema(rightTs).dataType).as("__mts") +:
        rightCols.map(col): _*)
    val rTagged = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side") :+
        rStruct.as("__r")) ++
        payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val lTagged = left.select(
      (keys.map(col) :+ col(leftTs).as("__ts") :+ lit(1).as("__side") :+
        lit(null).cast(right.select(rStruct).schema.head.dataType).as("__r")) ++
        payload.map(col): _*)
    val union = rTagged.unionByName(lTagged)
    val lts = tsLong(col("__ts"), left.schema(leftTs).dataType)
    def carry(back: Boolean): Column = {
      // tertiary sort on the carried struct itself: among right rows that
      // SHARE (key, rightTs), `last` then deterministically picks the
      // lexicographically greatest (mts, payload…) tuple in BOTH carry
      // directions — without it the peer order is shuffle-dependent and the
      // matched payload nondeterministic run-to-run. (Struct ordering is
      // field-wise, so payload columns must be orderable types — true of
      // every Spark type except MapType; pre-aggregate duplicates if a map
      // must ride along.)
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(if (back) col("__ts").asc else col("__ts").desc,
          col("__side").asc, col("__r").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("__r"), ignoreNulls = true).over(w)
    }
    def within(m: Column): Column = tolerance match {
      case Some(t) => when(abs(lts - m.getField("__mts")) <= t, m)
      case None => m
    }
    val carried = (direction match {
      case "backward" => union.withColumn("__match", within(carry(back = true)))
      case "forward" => union.withColumn("__match", within(carry(back = false)))
      case "nearest" =>
        // both carries over the same key partitioning (second sort, no
        // second shuffle); closer wins, exact tie -> backward
        val b = within(carry(back = true))
        val f = within(carry(back = false))
        union
          .withColumn("__b", b).withColumn("__f", f)
          .withColumn("__match",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              .when(abs(lts - col("__f").getField("__mts")) <
                abs(lts - col("__b").getField("__mts")), col("__f"))
              .otherwise(col("__b")))
    }).filter(col("__side") === 1)
    val matched =
      if (joinType == "inner") carried.filter(col("__match").isNotNull) else carried
    matched.select(
      (keys.map(col) :+ col("__ts").as(leftTs)) ++
        payload.map(col) ++
        rightCols.map(c => col("__match").getField(c).as(c)): _*)
  }
}
