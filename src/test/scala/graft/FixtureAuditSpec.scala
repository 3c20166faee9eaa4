package graft

/** Pins the fixture invariant several ordering-sensitive lanes rely on
  * (ADVICE r11): every `events.parquet` ts_ns is exactly µs-aligned
  * (`ts_ns % 1000 == 0`). The batch lanes events_rolling_zscore /
  * events_drawdown / events_gap_stats sort by raw ts_ns in Spark but by
  * `epoch_us(ts)` in their DuckDB oracles — equivalent ONLY under this
  * alignment. If a future fixture generation introduces true sub-µs
  * precision this spec fails loudly instead of letting those lanes
  * silently desynchronize from their oracles.
  */
class FixtureAuditSpec extends SparkSpec {
  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"$sf events.parquet: ts_ns is µs-aligned (ns % 1000 == 0)") {
      val dir = s"/root/testdata/$sf"
      assume(new java.io.File(s"$dir/events.parquet").exists, s"$dir not present")
      // Tables.events normalizes both file generations to (ts_ns, ts);
      // the check is substantive for TIMESTAMP(NANOS) files and trivially
      // true for µs-TIMESTAMP files — either way the lanes' assumption holds
      val misaligned = Tables.events(spark, dir)
        .filter("ts_ns % 1000 != 0").count()
      assert(misaligned === 0L,
        s"$misaligned events carry sub-µs ts_ns — the epoch_us-mirrored " +
          "ordering lanes and their oracles are no longer equivalent")
    }
  }
}
