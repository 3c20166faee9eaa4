package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WARC record splitter: framing round-trips, strict-parse failures, and
  * the geometry accounting (offsets) the lane's oracle replays. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def rec(id: Long, text: String): Array[Byte] =
    Warc.fixtureRecord(id, text)

  private def parse(bytes: Array[Byte]) = {
    val n = Warc.parseRecords(bytes).numElements()
    val df = Seq(bytes).toDF("content")
      .select(posexplode(Warc.warc_records(col("content"))).as(Seq("i", "r")))
      .select(col("i"), col("r.*"))
    (n, df.collect())
  }

  test("single record round-trips: headers, payload bytes, offset 0") {
    val (n, rows) = parse(rec(7, "the scan value"))
    assert(n === 1)
    val r = rows.head
    assert(r.getAs[String]("warc_type") === "response")
    assert(r.getAs[String]("record_id") === "<urn:graft:doc:7>")
    assert(r.getAs[String]("target_uri") === "https://example.org/doc/7")
    assert(r.getAs[String]("warc_date") === "2026-01-01T00:00:07Z")
    assert(r.getAs[Long]("content_length") === 14L)
    assert(r.getAs[Long]("offset") === 0L)
    assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") === "the scan value")
  }

  test("concatenated records split with exact byte offsets") {
    val a = rec(1, "alpha")
    val b = rec(2, "beta beta")
    val c = rec(3, "")
    val (n, rows) = parse(a ++ b ++ c)
    assert(n === 3)
    assert(rows.map(_.getAs[Long]("offset")).toSeq ===
      Seq(0L, a.length.toLong, (a.length + b.length).toLong))
    assert(rows.map(_.getAs[Long]("content_length")).toSeq === Seq(5L, 9L, 0L))
  }

  test("payload bytes are opaque: CRLFs and header-lookalikes inside the body don't resync") {
    val tricky = "WARC/1.0\r\nContent-Length: 999\r\n\r\nnot a record"
    val (n, rows) = parse(rec(4, tricky) ++ rec(5, "tail"))
    assert(n === 2)
    assert(new String(rows.head.getAs[Array[Byte]]("payload"), "UTF-8") === tricky)
    assert(rows(1).getAs[String]("record_id") === "<urn:graft:doc:5>")
  }

  test("strict parse: bad version line, missing Content-Length, torn terminator all throw") {
    def asBytes(s: String) = s.getBytes("UTF-8")
    val badVersion = asBytes("HTTP/1.1\r\n\r\n")
    val noLength = asBytes("WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    val good = rec(9, "ok")
    val torn = good.dropRight(1) // missing the final LF
    val overrun = asBytes("WARC/1.0\r\nContent-Length: 50\r\n\r\nshort\r\n\r\n")
    for (bad <- Seq(badVersion, noLength, torn, overrun)) {
      val e = intercept[IllegalArgumentException](Warc.parseRecords(bad))
      assert(e.getMessage.contains("WARC parse error"))
    }
  }

  test("WARC/1.1 and case-insensitive header names are accepted") {
    val b = ("WARC/1.1\r\n" +
      "warc-type: metadata\r\n" +
      "CONTENT-LENGTH: 3\r\n" +
      "\r\nabc\r\n\r\n").getBytes("UTF-8")
    val (n, rows) = parse(b)
    assert(n === 1)
    assert(rows.head.getAs[String]("warc_type") === "metadata")
    assert(rows.head.getAs[String]("target_uri") === null,
      "absent optional headers surface as null, not a parse failure")
  }

  test("gz members: per-record gzip inflation reproduces the plain geometry exactly") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(b); g.close()
      bo.toByteArray
    }
    val (a, b, c) = (rec(1, "alpha"), rec(2, "beta beta"), rec(3, ""))
    val plain = Warc.parseRecords(a ++ b ++ c)
    val inflated = Warc.parseRecordsGz(gz(a) ++ gz(b) ++ gz(c))
    assert(inflated.numElements() === 3)
    // decompressed-stream offsets == plain concatenation offsets
    val plainRows = Seq(plain, inflated).map { arr =>
      (0 until arr.numElements()).map(i =>
        arr.getStruct(i, 7).getLong(5)).toSeq
    }
    assert(plainRows.head === plainRows(1))
    assert(plainRows.head === Seq(0L, a.length.toLong, (a.length + b.length).toLong))
  }

  test("gz: a corrupted member stream throws, never resynchronizes") {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(rec(1, "alpha")); g.close()
    val bytes = bo.toByteArray
    bytes(bytes.length / 2) = (bytes(bytes.length / 2) ^ 0x5a).toByte
    assertThrows[java.io.IOException](Warc.parseRecordsGz(bytes))
  }

  test("gz fixture + directory read: same 500 records through the .warc.gz container") {
    val d = "/root/testdata/sf0.001"
    val dir = Warc.fixtureCached(graft.Tables.documents(spark, d), d, gzMembers = true)
    val recs = Warc.recordsGz(spark, dir)
    assert(recs.count() === 500)
    assert(recs.filter(col("warc_type") === "response").count() === 500)
  }

  test("fixture + directory read: every doc < 500 comes back, one row per record") {
    val d = "/root/testdata/sf0.001"
    val dir = Warc.fixtureCached(graft.Tables.documents(spark, d), d)
    assert(new java.io.File(dir + "/_SUCCESS").exists())
    val recs = Warc.records(spark, dir)
    assert(recs.count() === 500)
    // per-file record indexes are dense from 0 — the explode preserved order
    val byFile = recs.groupBy(col("path"))
      .agg(count(lit(1)).as("n"), max(col("rec_idx")).as("mx"))
      .collect()
    assert(byFile.length === 4)
    byFile.foreach(r => assert(r.getAs[Int]("mx").toLong === r.getAs[Long]("n") - 1))
  }
}
