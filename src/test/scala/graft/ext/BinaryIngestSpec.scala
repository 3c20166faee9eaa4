package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BinaryIngestSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  test("binary manifest: per-file rows, UTF-8 byte lengths, md5, sidecars pruned") {
    import spark.implicits._
    // non-ASCII doc pins BYTE length (not char count) and UTF-8 md5
    val docs = Seq((0L, "hello world"), (1L, "héllo wörld"), (2L, ""))
      .toDF("doc_id", "text")
    val sfKey = "/tmp/graft-binspec-" + java.util.UUID.randomUUID().toString
    val dir = BinaryIngest.textFilesCached(docs, sfKey, maxDocs = 500)
    assert(new java.io.File(dir, "_SUCCESS").exists(), "atomic publish marker")
    assert(new java.io.File(dir, "doc_000002.txt").exists(),
      "the empty doc's file IS written by the fixture")
    val rows = BinaryIngest.binaryDocManifest(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(rows.keySet === Set(0L, 1L),
      "_SUCCESS must be glob-pruned AND zero-byte files are dropped by " +
        "Spark's split planning (documented manifest semantics)")
    assert(rows(0L) === ((11L, md5hex("hello world"))))
    assert(rows(1L) === ((13L, md5hex("héllo wörld"))),
      "two 2-byte UTF-8 chars -> 13 bytes, not 11 chars")
  }

  test("fixture cache: second call reuses the snapshot, maxDocs bounds the file set") {
    import spark.implicits._
    val docs = (0L until 10L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    val sfKey = "/tmp/graft-binspec-" + java.util.UUID.randomUUID().toString
    val dir = BinaryIngest.textFilesCached(docs, sfKey, maxDocs = 4)
    val mtimes = new java.io.File(dir).listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(mtimes.count(_._1.endsWith(".txt")) === 4, "maxDocs bound")
    val dir2 = BinaryIngest.textFilesCached(docs, sfKey, maxDocs = 4)
    assert(dir2 === dir)
    val after = new java.io.File(dir).listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(after === mtimes, "cached snapshot must not be rewritten")
  }
}
