package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Session invariant (see ext/BucketedLayout.scala): bucketed scans
      // report their sortBy order, so one-file-per-bucket SMJ joins skip
      // both the exchange and the sort.
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/file-listing paths so the first timed query
    // isn't charged session startup.
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    // Cross-run calibration (VERDICT r7): driver-vs-builder totals diverged
    // 2.1x on identical code for four straight rounds because nothing in the
    // record measured the BOX. Two markers, taken before and after the
    // sweep: (a) a fixed reference probe — scan+sum lineitem's quantity
    // column, the simplest shuffle-free aggregate, so its time moves with
    // machine load and nothing else; (b) /proc/loadavg. A consumer compares
    // two records' probes and divides the load factor out instead of
    // re-litigating noise-vs-regression.
    def calibProbe(): Double = {
      import org.apache.spark.sql.functions.sum
      val t0 = System.nanoTime()
      Tables.load(spark, sfDir, "lineitem").agg(sum("l_quantity")).collect()
      (System.nanoTime() - t0) / 1e9
    }
    def loadavg(): String =
      scala.util.Try(java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).trim.split(" ").take(3).mkString(" "))
        .getOrElse("unavailable")
    def fmtD(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // THREE untimed warm-ups (r14): the probe exists to measure the BOX, and
    // with a single warm-up the first timed rep still carries JIT/codegen
    // warmth — a fresh JVM on an idle warm-cache box measured 0.376 s start
    // vs 0.125 s end probe, tripping the quiet gate on JVM coldness instead
    // of co-tenant load. Steady state arrives by the 4th execution.
    (1 to 3).foreach(_ => calibProbe())
    val calibStart = Seq.fill(3)(calibProbe()).sorted.apply(1)
    val loadStart = loadavg()
    // Reproducible methodology (VERDICT r4): per query, one untimed warm-up
    // pass (file listing, codegen compile, broadcast build) then `reps` timed
    // runs, reporting the MEDIAN. Single-run walls on a shared box vary up to
    // 7x with no code change (r3->r4 q8/q9), so round-over-round comparisons
    // need the median and the warm-up to mean anything.
    // tolerate a malformed env value (fall back to the default) rather than
    // aborting the whole bench run on a NumberFormatException
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(3).max(1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    // Per query keep ALL `reps` timings, not just the median: a 2x median
    // swing whose min bands overlap round-over-round is self-evidently box
    // noise, while a regression shifts the whole band. (VERDICT r6: three
    // straight rounds re-litigated noise-vs-regression because the non-median
    // reps were measured and then discarded.)
    // Optional args(0): only bench queries whose name starts with the given
    // prefix — local iteration on one operator without the full sweep.
    val prefix = args.headOption.getOrElse("")
    val samples = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix)).map { case (name, fn) =>
      // noop sink: full computation of every output column (count() would let
      // Catalyst prune unreferenced projections and under-report the work)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      val timed = try { run(); Seq.fill(reps)(run()) }
        catch { case _: Throwable => Seq.empty }
      name -> timed
    }
    val results = samples.map { case (name, timed) =>
      name -> (if (timed.nonEmpty) median(timed) else -1.0)
    }
    // Output contract (all consumers key on these metric names):
    //  - "queries_chunk" lines: the per-query median map, split into chunks of
    //    ~15 queries so every line stays well under the driver's bounded
    //    output tail (one 115-entry line lost the first half of the alphabet
    //    to truncation in round 5). `chunk`/`n_chunks` let a consumer verify
    //    it saw the whole map.
    //  - ONE "total_summary" record LAST: the wall total, complete and
    //    parseable even if earlier lines scrolled out of the captured tail.
    //    (Renamed from "total" in round 5 so a by-metric aggregator can't
    //    double-count the wall against the old long per-query record.)
    // The full map is also written to BENCH_DETAIL.json in the repo root, so
    // round-over-round per-query tracking never depends on stdout capture.
    // Locale.ROOT: the f-interpolator would use the default locale and
    // emit comma decimals (invalid JSON) on e.g. de_DE JVMs.
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // -1.0 marks a failed query; exclude the sentinel from the wall total and
    // surface the failure count instead of silently shrinking the aggregate.
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failures = results.count(_._2 < 0)
    // Noise bands: [min, median, max] of the `reps` timed runs per query, so
    // a consumer can tell noise (overlapping min bands) from regression
    // (shifted band) from ONE run's record. The total's band sums the
    // per-query extrema — a conservative envelope of the wall spread.
    def band(timed: Seq[Double]): String =
      if (timed.isEmpty) "[-1,-1,-1]"
      else s"[${fmt(timed.min)},${fmt(median(timed))},${fmt(timed.max)}]"
    val totalMin = samples.collect { case (_, t) if t.nonEmpty => t.min }.sum
    val totalMax = samples.collect { case (_, t) if t.nonEmpty => t.max }.sum
    val chunks = samples.grouped(15).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      val qs = chunk.map { case (k, t) =>
        "\"" + k + "\":" + fmt(if (t.nonEmpty) median(t) else -1.0) }.mkString("{", ",", "}")
      val bs = chunk.map { case (k, t) => "\"" + k + "\":" + band(t) }.mkString("{", ",", "}")
      println(s"""{"metric":"queries_chunk","chunk":${i + 1},"n_chunks":${chunks.size},"reps":$reps,"queries":$qs,"bands":$bs,"sf":"$sfDir"}""")
    }
    val allQs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val allBands = samples.map { case (k, t) => "\"" + k + "\":" + band(t) }.mkString("{", ",", "}")
    // end probe BEFORE the detail/canonical write so the gate can consider it
    val calibEnd = Seq.fill(3)(calibProbe()).sorted.apply(1)
    // A prefix-filtered run is a local iteration aid — never let it replace
    // the full-inventory record the judge reads.
    if (prefix.isEmpty) scala.util.Try {
      val detail =
        s"""{"metric":"total","value":$total,"unit":"sec","min":${fmt(totalMin)},"max":${fmt(totalMax)},"failures":$failures,"reps":$reps,"calib_ref_start_sec":${fmtD(calibStart)},"calib_ref_end_sec":${fmtD(calibEnd)},"loadavg_start":"$loadStart","queries":$allQs,"bands":$allBands,"sf":"$sfDir"}"""
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_DETAIL.json"),
        detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // The CANONICAL record (VERDICT r12 #8): driver sweeps overwrite
      // BENCH_DETAIL.json on every run — including sweeps taken on a loaded
      // co-tenant box — which shadowed the committed quiet-box record in the
      // r12 working tree. A run taken under the quiet gate (builder sets
      // SPARK_GRAFT_CANONICAL=1 after checking probe <= 0.25 s and
      // loadavg < 2) ALSO writes BENCH_CANONICAL.json, which ordinary
      // sweeps never touch — that file is the round's record.
      // The gate is RE-CHECKED in-process (ADVICE r13): the env var alone is
      // trust, and a stale export on a loaded box would silently replace the
      // round's record — the exact shadowing failure this file exists to
      // prevent. The JVM already measured calibStart and loadStart, so use
      // them: refuse the canonical write (keeping the ordinary detail write)
      // unless the probe and the 1-minute loadavg were inside the gate.
      // BOTH probes must be quiet (VERDICT r16 #3): the sweep runs
      // ALPHABETICALLY, so a run that starts on a warming box (r16 run 2:
      // start probe 0.684, end 0.150) passes a min-probe gate on the END
      // while its first chunks (agg_*, dedup_*) record x2-7 warm-up
      // inflation — poisoning every future canonical-to-canonical per-lane
      // comparison. JVM coldness is already paid before calibStart (three
      // untimed probe warm-ups + the table pre-count), so a hot START
      // probe here measures co-tenant pressure during the early lanes,
      // exactly what the record must exclude.
      if (sys.env.get("SPARK_GRAFT_CANONICAL").contains("1")) {
        val load1 = scala.util.Try(loadStart.split(" ").head.toDouble).getOrElse(Double.MaxValue)
        if (math.max(calibStart, calibEnd) <= 0.25 && load1 < 2.0)
          java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_CANONICAL.json"),
            detail.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        else
          System.err.println(s"""SPARK_GRAFT_CANONICAL=1 set but gate failed in-process """ +
            s"""(probe start ${fmtD(calibStart)}s / end ${fmtD(calibEnd)}s — BOTH must be <= 0.25, """ +
            s"""loadavg "$loadStart") — canonical write refused.""")
      }
    }
    val calib = s""""calib_ref_sec":{"start":${fmtD(calibStart)},"end":${fmtD(calibEnd)}},"loadavg":{"start":"$loadStart","end":"${loadavg()}"}"""
    println(s"""{"metric":"total_summary","value":$total,"unit":"sec","min":${fmt(totalMin)},"max":${fmt(totalMax)},"failures":$failures,"reps":$reps,"n_queries":${results.size},$calib,"sf":"$sfDir"}""")
    spark.stop()
  }
}
