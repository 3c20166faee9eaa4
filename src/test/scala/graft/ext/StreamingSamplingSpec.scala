package graft.ext

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The sampling/split family is pure column algebra over a seeded md5 draw —
  * stateless, so the SAME operators run unchanged on a stream, and (because
  * the draw is deterministic in the key, not in arrival order or batching)
  * a streaming run selects EXACTLY the rows the batch run selects. That
  * parity is the operational point: a pipeline can sample its backfill in
  * batch and its live tail in streaming without the two disagreeing. */
class StreamingSamplingSpec extends SparkSpec {

  test("streaming stratifiedSample + hashSplit select exactly the batch rows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (1L to 500L).map(i => (i, if (i % 3 == 0) "en" else "de"))
    val batch = rows.toDF("id", "lang")

    val sampleOf = (df: org.apache.spark.sql.DataFrame) =>
      Sampling.stratifiedSample(df, "lang", "id", Map("en" -> 0.3))
        .withColumn("split", Sampling.hashSplit(col("id")))

    val input = MemoryStream[(Long, String)]
    val q = sampleOf(input.toDF().toDF("id", "lang"))
      .writeStream.format("memory").queryName("sampled_stream")
      .outputMode("append").start()
    // deliver in two arbitrary batches, shuffled order — batching must not matter
    val (a, b) = scala.util.Random.shuffle(rows).splitAt(200)
    input.addData(a); q.processAllAvailable()
    input.addData(b); q.processAllAvailable()

    val streamed = spark.table("sampled_stream")
      .as[(Long, String, String)].collect().toSet
    val batched = sampleOf(batch).as[(Long, String, String)].collect().toSet
    assert(streamed === batched, "stream and batch must select the same sample")
    assert(batched.nonEmpty && batched.size < rows.size)
    q.stop()
  }
}
