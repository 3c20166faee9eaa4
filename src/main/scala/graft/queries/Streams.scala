package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time windowing surface (SURVEY §2.3 streaming; absent in the
  * reference, whose only "window" is the block-height finality buffer —
  * provided here because any streaming engine user needs them).
  *
  * Each query is the BATCH execution of a streaming construct —
  * `window()` / `session_window()` produce identical results under
  * `readStream` + watermark (covered by WindowStreamSpec); batch mode is
  * what the DuckDB oracle can check exactly.
  *
  * Scale: windowed aggregation shuffles once on (key, window); session
  * windows shuffle on user_id then sort-merge sessions within partitions —
  * both the standard Spark plans a 1000-executor job would want.
  */
object Streams {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // tumbling 1 h count/sum per event type
    "stream_tumbling_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("event_type"), col("n"), col("sum_v"))
        .orderBy(col("win_start"), col("event_type"))
    }),

    // sliding 1 h window every 30 min — every event lands in exactly 2 windows
    "stream_sliding_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .select(unix_timestamp(col("window.start")).as("win_start"), col("n"), col("sum_v"))
        .orderBy(col("win_start"))
    }),

    // session windows per user, 10 min inactivity gap
    "stream_session_window" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .select(col("user_id"),
          unix_timestamp(col("session_window.start")).as("sess_start"),
          col("n"), col("sum_v"))
        .orderBy(col("user_id"), col("sess_start"))
    }),

    // Deterministic batch twin of the streaming dedup path
    // (Dedup.streamingExactDedup / dropDuplicatesWithinWatermark, covered in
    // StreamingDedupSpec): the FIRST event per (user, type) by event time,
    // event_id as the tiebreak so the survivor is well-defined in both
    // engines. One shuffle on the dedup key.
    "stream_dedup_first" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(min(struct(col("ts"), col("event_id"))).as("w"))
        .select(col("user_id"), col("event_type"),
          unix_timestamp(col("w.ts")).as("first_ts"),
          col("w.event_id").as("first_event_id"))
        .orderBy(col("user_id"), col("event_type"))
    }),

    // stream-stream join shape (StreamJoinSpec runs the same plan under
    // readStream + watermarks): views attributed to clicks on the same user
    // within the following 5 minutes. Equi-key user_id carries the shuffle;
    // the time-range bound is the state-retention condition in stream mode.
    "stream_join_attrib" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts").as("click_ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      clicks.join(views,
        col("user_id") === col("v_user_id") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 5 MINUTES"))
        .select(col("user_id"), col("click_id"), col("view_id"))
        .orderBy(col("user_id"), col("click_id"), col("view_id"))
    }),

    // STREAM-STATIC enrichment: the event stream broadcast-joined to a
    // dimension table (customer market segment), then window-aggregated —
    // the standard "enrich then aggregate" streaming topology. The static
    // side never shuffles the stream (broadcast), and in streaming mode
    // the same plan re-reads the dim per micro-batch (parity in
    // StreamJoinSpec). Batch twin here is what the oracle checks exactly.
    "stream_enrich_static" -> ((s, d) => {
      val dim = Tables.customer(s, d)
        .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      Tables.events(s, d).join(broadcast(dim), "user_id")
        .groupBy(window(col("ts"), "6 hours"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_v"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("c_mktsegment"), col("n"), col("sum_v"))
        .orderBy(col("win_start"), col("c_mktsegment"))
    })
  )

  // DuckDB reads events.ts as TIMESTAMP_NS; CAST to TIMESTAMP truncates to µs
  // exactly like Tables.events does on the Spark side, so both engines window
  // the same instants. Window starts are epoch-aligned in Spark by default.
  def oracles: Map[String, String] = Map(
    "stream_tumbling_window" ->
      """SELECT CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 3600e6) * 3600 AS BIGINT) AS win_start,
        |  event_type, count(*) AS n, round(sum(value),2) AS sum_v
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "stream_sliding_window" ->
      """WITH e AS (SELECT CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 1800e6) * 1800 AS BIGINT) AS s0,
        |                  value FROM events)
        |SELECT win_start, count(*) AS n, round(sum(value),2) AS sum_v FROM (
        |  SELECT s0 AS win_start, value FROM e
        |  UNION ALL
        |  SELECT s0 - 1800 AS win_start, value FROM e)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "stream_session_window" ->
      """WITH o AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, value,
        |         CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY ts) >= 600000000
        |              OR lag(t) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (SELECT user_id, t, value,
        |        sum(brk) OVER (PARTITION BY user_id ORDER BY t ROWS UNBOUNDED PRECEDING) AS grp
        |      FROM o)
        |SELECT user_id, CAST(floor(min(t) / 1e6) AS BIGINT) AS sess_start,
        |       count(*) AS n, round(sum(value),2) AS sum_v
        |FROM g GROUP BY user_id, grp ORDER BY user_id, sess_start""".stripMargin,

    // NOTE the CAST in the ORDER BY: Spark's min(struct(ts, event_id))
    // compares the µs-truncated ts, so the oracle must truncate BEFORE
    // ordering too or a same-microsecond pair could tiebreak differently
    // (DuckDB reads the raw column at ns precision).
    "stream_dedup_first" ->
      """SELECT user_id, event_type,
        |  CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 1e6) AS BIGINT) AS first_ts,
        |  event_id AS first_event_id
        |FROM (SELECT *, row_number() OVER (
        |        PARTITION BY user_id, event_type
        |        ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "stream_join_attrib" ->
      """SELECT c.user_id, c.event_id AS click_id, v.event_id AS view_id
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON c.user_id = v.user_id
        | AND CAST(c.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
        | AND CAST(c.ts AS TIMESTAMP) <= CAST(v.ts AS TIMESTAMP) + INTERVAL 5 MINUTE
        |ORDER BY c.user_id, click_id, view_id""".stripMargin,

    "stream_enrich_static" ->
      """SELECT CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 21600e6) * 21600 AS BIGINT)
        |    AS win_start,
        |  c_mktsegment, count(*) AS n, round(sum(value), 2) AS sum_v
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  )
}
