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
}
