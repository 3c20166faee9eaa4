package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  private def ts(m: Int): Timestamp = Timestamp.valueOf(f"2023-01-01 00:$m%02d:00")

  test("backward inclusive semantics: latest right row at or before each left ts") {
    import spark.implicits._
    val trades = Seq((1L, ts(5), 100.0), (1L, ts(10), 101.0), (1L, ts(2), 99.0),
      (2L, ts(6), 50.0)).toDF("sym", "t_ts", "trade_px")
    val quotes = Seq((1L, ts(1), 98.0), (1L, ts(5), 100.5), (1L, ts(9), 100.9),
      (2L, ts(7), 51.0)).toDF("sym", "q_ts", "quote_px")

    val out = AsOfJoin.asofJoin(trades, quotes, Seq("sym"), "t_ts", "q_ts",
      Seq("quote_px"), "left")
      .select("sym", "t_ts", "trade_px", "quote_px")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .sortBy(x => (x._1, x._2.getTime))

    assert(out.toSeq === Seq(
      (1L, ts(2), 99.0, Some(98.0)),    // quote@1 is latest <= 2
      (1L, ts(5), 100.0, Some(100.5)),  // INCLUSIVE: quote@5 matches trade@5
      (1L, ts(10), 101.0, Some(100.9)), // quote@9
      (2L, ts(6), 50.0, None)))         // quote@7 is in the future -> no match
  }

  test("inner drops unmatched left rows; left keeps them") {
    import spark.implicits._
    val l = Seq((1L, ts(1), "early"), (1L, ts(8), "late")).toDF("k", "lts", "tag")
    val r = Seq((1L, ts(4), 7)).toDF("k", "rts", "v")
    val inner = AsOfJoin.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("v"), "inner")
    assert(inner.select("tag").as[String].collect().toSeq === Seq("late"))
    val leftJ = AsOfJoin.asofJoin(l, r, Seq("k"), "lts", "rts", Seq("v"), "left")
    assert(leftJ.count() === 2)
  }

  test("matches DuckDB ASOF JOIN semantics on events (spot check)") {
    // clicks join the latest prior view per user; compare a driver-side
    // reference computation on a bounded slice
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d).filter(col("user_id") < 10)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("click_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("view_id"))
    val got = AsOfJoin.asofJoin(clicks, views, Seq("user_id"), "c_ts", "v_ts",
      Seq("view_id"), "inner")
      .select("click_id", "view_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive reference
    val cs = clicks.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val vs = views.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val expect = cs.flatMap { case (u, cts, cid) =>
      val prior = vs.filter(v => v._1 == u && !v._2.after(cts))
      if (prior.isEmpty) None
      else Some(cid -> prior.maxBy(_._2.getTime)._3)
    }.toMap
    assert(got === expect)
    assert(got.nonEmpty)
  }
}
