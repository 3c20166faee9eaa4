package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r17 measurement probe (guide §1): does a global orderBy re-execute its
  * child for range-bound sampling? Times the same expensive projection
  * (a) unsorted, (b) orderBy'd, (c) checkpointed-then-orderBy'd — all via
  * the noop sink. Not part of the declared surface.
  */
object SortProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Bpe
    def base() = {
      val toks = Bpe.bpe_encode_bytes(col("text"), Bpe.fixtureTable)
      Tables.documents(spark, sfDir)
        .select(col("doc_id"), size(toks).cast("long").as("n"),
          md5(concat_ws("|", toks)).as("m"))
    }
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-28s median ${ts.sorted.apply(1)}%.3f  all ${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    time("no-sort")(noop(base()))
    time("orderBy")(noop(base().orderBy(col("doc_id"))))
    time("ckpt+orderBy") {
      val c = base().localCheckpoint()
      noop(c.orderBy(col("doc_id")))
      graft.ext.Dedup.unpersistCheckpoint(c)
    }
    time("repart+sortWithin")(noop(
      base().repartition(col("doc_id")).sortWithinPartitions(col("doc_id"))))
    time("repart+orderBy")(noop(
      base().repartition(col("doc_id")).orderBy(col("doc_id"))))
    time("sort-then-project") {
      val toks = Bpe.bpe_encode_bytes(col("text"), Bpe.fixtureTable)
      noop(Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), size(toks).cast("long").as("n"),
          md5(concat_ws("|", toks)).as("m")))
    }
    spark.stop()
  }
}
