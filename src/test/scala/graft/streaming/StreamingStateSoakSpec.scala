package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** State SOAK for the custom-state twins (VERDICT r10 #8): the 100 TB
  * streaming risk is state GROWTH, and the parity/TTL specs pin small
  * populations only. Here ≥10⁴ distinct keys flow through in rolling
  * cohorts across ~20 micro-batches while the event-time clock advances,
  * and the per-batch `numRowsTotal` curve must PLATEAU at a few cohorts —
  * never accumulate toward the key population. Funnel and retention bound
  * state via `ttlUs`; top-paths is bounded by construction (closed
  * sessions leave nothing behind).
  *
  * Methodology: cohort c = `cohortSize` fresh users active only around
  * batch c's event time; batches step the watermark by a fixed stride
  * chosen to pass each cohort's close-out + TTL horizon within a couple
  * of batches. The recorded curve is printed (the soak's artifact) and
  * asserted: max ≤ `boundCohorts`·cohortSize + slack, AND the tail (after
  * warm-up) never exceeds the early peak — a monotone climb fails even if
  * it stays under the absolute bound.
  */
class StreamingStateSoakSpec extends SparkSpec {

  private val cohorts = 20
  private val cohortSize = 500 // 20 × 500 = 10,000 distinct keys
  private val baseUs = Timestamp.valueOf("2023-01-01 00:00:00").getTime * 1000L

  private def tsAt(us: Long) = new Timestamp(us / 1000L)

  private def stateRows(q: StreamingQuery): Long =
    Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)

  /** Run the cohort schedule, returning the per-batch state-rows curve. */
  private def soak[T](input: MemoryStream[T], q: StreamingQuery,
      rowsFor: Int => Seq[T], sentinel: Seq[T]): Seq[Long] = {
    val curve = (0 until cohorts).map { c =>
      input.addData(rowsFor(c): _*)
      q.processAllAvailable()
      stateRows(q)
    }
    input.addData(sentinel: _*)
    q.processAllAvailable()
    val end = stateRows(q)
    // the provider's own accounting (RocksDB reports memory + SST file
    // sizes — the state-on-disk/bounded-heap evidence; the HDFS-backed
    // provider reports its on-heap bytes)
    Option(q.lastProgress).foreach { p =>
      import scala.jdk.CollectionConverters._
      val mm = p.stateOperators.flatMap(_.customMetrics.asScala)
        .filter { case (k, _) =>
          val lk = k.toLowerCase(java.util.Locale.ROOT)
          lk.contains("memory") || lk.contains("sst") || lk.contains("bytes")
        }
      if (mm.nonEmpty)
        println(s"SOAK state-store metrics: " +
          mm.map { case (k, v) => s"$k=$v" }.mkString(", "))
    }
    q.stop()
    curve :+ end
  }

  private def assertPlateau(curve: Seq[Long], boundCohorts: Int, name: String): Unit = {
    println(s"SOAK $name state-rows curve: ${curve.mkString(", ")}")
    val bound = boundCohorts.toLong * cohortSize + 50
    assert(curve.max <= bound,
      s"$name state must plateau under $boundCohorts cohorts, curve=$curve")
    // no monotone climb: the post-warm-up tail stays at/below the early peak
    val warm = curve.take(boundCohorts + 2).max
    assert(curve.drop(boundCohorts + 2).forall(_ <= warm),
      s"$name state keeps growing past the warm-up peak $warm, curve=$curve")
  }

  test("funnel soak: 10k users across 20 cohorts — ttlUs holds state at a few cohorts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hourUs = 3600L * 1000000L
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = StreamingFunnel.funnel(
      input.toDF().toDF("user_id", "ts", "event_type"),
      "user_id", "ts", "event_type", Seq("signup", "view"),
      windowUs = 20L * 60L * 1000000L, // 20-minute funnel window
      watermarkDelay = "0 seconds",
      ttlUs = Some(30L * 60L * 1000000L)) // tombstone gone 50 min after anchor
    val q = out.writeStream.format("memory").queryName("soak_funnel")
      .outputMode("append").start()
    def cohortRows(c: Int): Seq[(Long, Timestamp, String)] = {
      val t0 = baseUs + c.toLong * hourUs
      (0 until cohortSize).map { u =>
        val id = c.toLong * cohortSize + u
        (id, tsAt(t0 + u), if (u % 2 == 0) "signup" else "view")
      }
    }
    val far = tsAt(baseUs + (cohorts + 10).toLong * hourUs)
    val curve = soak(input, q, cohortRows, Seq((999999L, far, "signup")))
    // per batch: the arriving cohort's open funnels + at most the previous
    // cohort's tombstones (the 50-min horizon clears within the next hour)
    assertPlateau(curve, boundCohorts = 3, "funnel")
    // every anchored user emitted exactly one row (views without a signup
    // anchor never open a funnel; the sentinel's stays open at stop)
    val emitted = spark.table("soak_funnel").count()
    assert(emitted === (cohorts * cohortSize / 2).toLong,
      "every signup-anchored user must emit exactly once")
  }

  test("retention soak: 10k users across 20 daily cohorts — ttlUs drops departed users") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dayUs = 86400L * 1000000L
    val input = MemoryStream[(Long, Timestamp)]
    val out = StreamingRetention.facts(
      input.toDF().toDF("user_id", "ts"),
      "user_id", "ts", watermarkDelay = "0 seconds",
      ttlUs = Some(2L * dayUs)) // residue gone 2 days after last activity
    val q = out.writeStream.format("memory").queryName("soak_retention")
      .outputMode("append").start()
    def cohortRows(c: Int): Seq[(Long, Timestamp)] = {
      val t0 = baseUs + c.toLong * dayUs
      (0 until cohortSize).map { u =>
        (c.toLong * cohortSize + u, tsAt(t0 + u.toLong * 1000000L))
      }
    }
    val far = tsAt(baseUs + (cohorts + 10).toLong * dayUs)
    val curve = soak(input, q, cohortRows, Seq((999999L, far)))
    // per batch: arriving cohort + ≤2 days of not-yet-expired residue
    assertPlateau(curve, boundCohorts = 4, "retention")
    val facts = spark.table("soak_retention").count()
    assert(facts === (cohorts * cohortSize).toLong,
      "one day-0 fact per user, exactly once")
  }

  test("top-paths soak: 10k users across 20 cohorts — state returns to zero by construction") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val hourUs = 3600L * 1000000L
    val input = MemoryStream[(Long, Timestamp, Long, String)]
    val out = StreamingTopPaths.grams(
      input.toDF().toDF("user_id", "ts", "event_id", "event_type"),
      gapUs = 30L * 60L * 1000000L, n = 2, watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("soak_paths")
      .outputMode("append").start()
    def cohortRows(c: Int): Seq[(Long, Timestamp, Long, String)] = {
      val t0 = baseUs + c.toLong * hourUs
      (0 until cohortSize).flatMap { u =>
        val id = c.toLong * cohortSize + u
        Seq((id, tsAt(t0 + u), id * 10L, "a"),
          (id, tsAt(t0 + u + 1000000L), id * 10L + 1L, "b"),
          (id, tsAt(t0 + u + 2000000L), id * 10L + 2L, "c"))
      }
    }
    val far = tsAt(baseUs + (cohorts + 10).toLong * hourUs)
    val curve = soak(input, q, cohortRows, Seq((999999L, far, 1L, "a")))
    // per batch: only the arriving cohort's OPEN sessions hold state; the
    // previous cohort's sessions closed when this batch's watermark passed
    // their 30-min gap — nothing survives per departed key, no TTL needed
    assertPlateau(curve, boundCohorts = 2, "top-paths")
    // 3-event sessions emit two bigrams each, exactly once
    val grams = spark.table("soak_paths").count()
    assert(grams === (cohorts * cohortSize * 2).toLong)
  }
}

/** The soak under RocksDB: the plateau must hold with state on LOCAL DISK
  * (SST files) and a bounded block cache instead of on-heap maps — the
  * provider a 100 TB deployment runs (VERDICT r15 #3). The printed
  * state-store metrics line is the bounded-heap evidence. */
class StreamingStateSoakRocksDbSpec extends StreamingStateSoakSpec with graft.RocksDbState
