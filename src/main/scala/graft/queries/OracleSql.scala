package graft.queries

/** Shared helpers for writing DuckDB oracle SQL that matches Spark
  * bit-for-bit. */
object OracleSql {

  /** Spark-parity rounding. Spark's round(double, n) stringifies the double
    * first (Double.toString — SHORTEST decimal repr) and then HALF_UPs the
    * decimal, so a value whose binary form sits just below a .5 boundary but
    * prints as exactly .5 (e.g. 0.678849999..95 → "0.67885") rounds UP in
    * Spark while DuckDB's round(double) — which rounds the true binary value
    * — rounds DOWN. Replicate Spark: varchar (shortest repr) → decimal →
    * round (DuckDB decimal round = half away from zero = Java HALF_UP) →
    * double. Division-derived scores are the expressions that actually land
    * on such boundaries; sums can also diverge by accumulation ORDER, which
    * no rounding semantics can reconcile — those stay best-effort. */
  def sparkRound(expr: String, n: Int): String =
    s"CAST(round(CAST(CAST(($expr) AS VARCHAR) AS DECIMAL(38,19)), $n) AS DOUBLE)"

  /** Per-user daily-close + calendar-spine CTE prefix, ending at CTE `j`
    * (= spine LEFT JOIN daily) — shared VERBATIM by the ts_resample_ffill
    * and ts_interpolate_linear oracles so the day-floor, the last-per-day
    * (ts DESC, id DESC) tie rule, and the spine bounds can never drift
    * between the two lanes (the Spark twin is [[TsSpine.spineDaily]]). */
  val userDailySpineCtes: String =
    """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) * 1000 AS ts_ns, value,
      |              (epoch_us(ts) * 1000
      |                - ((epoch_us(ts) * 1000 % 86400000000000 + 86400000000000) % 86400000000000))
      |                // 86400000000000 AS day
      |            FROM events WHERE user_id < 8),
      |daily AS (SELECT user_id, day, round(value, 2) AS close FROM (
      |            SELECT user_id, day, value,
      |              row_number() OVER (PARTITION BY user_id, day
      |                ORDER BY ts_ns DESC, event_id DESC) AS rn
      |            FROM ev) WHERE rn = 1),
      |bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM ev GROUP BY user_id),
      |spine AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM bounds),
      |j AS (SELECT s.user_id, s.day, d.close
      |      FROM spine s LEFT JOIN daily d USING (user_id, day))""".stripMargin
}

/** Spark-side twin of [[OracleSql.userDailySpineCtes]]: the per-user daily
  * spine joined with the day's last observation — ONE definition shared by
  * ts_resample_ffill and ts_interpolate_linear, so the two lanes always
  * agree on what a "daily close" is. */
private[queries] object TsSpine {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window

  /** Columns out: (user_id, day, close) with close NULL on unobserved
    * spine days. Spine is per-user bounded; the fill strategy is the
    * caller's. */
  def spineDaily(s: SparkSession, d: String): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val ev = graft.Tables.events(s, d).filter(col("user_id") < 8)
      .withColumn("day", expr(s"(ts_ns - pmod(ts_ns, ${dayNs}L)) div ${dayNs}L"))
    val wDay = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    val daily = ev.withColumn("rn", row_number().over(wDay))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("day"), round(col("value"), 2).as("close"))
    val spine = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
  }
}
