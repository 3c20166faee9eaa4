package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HTTP response-envelope strip: fixture round-trip, strict-framing
  * failures, header handling — the layer between a WARC response record's
  * payload and the HTML extractor. */
class HttpPayloadSpec extends SparkSpec {
  import spark.implicits._

  private def parseDf(bytes: Array[Byte]) =
    Seq(bytes).toDF("payload")
      .select(HttpPayload.http_response(col("payload")).as("h"))
      .select(col("h.*"))
      .collect().head

  test("fixture payload round-trips through the codegen path") {
    val r = parseDf(HttpPayload.httpResponsePayload(7, "the scan value"))
    assert(r.getAs[Int]("status_code") === 200)
    assert(r.getAs[String]("reason") === "OK")
    assert(r.getAs[String]("content_type") === "text/html; charset=utf-8")
    val body = r.getAs[Array[Byte]]("body")
    assert(new String(body, "UTF-8") === HttpPayload.htmlDoc(7, "the scan value"))
    assert(r.getAs[Long]("content_length") === body.length.toLong)
    assert(r.getAs[Int]("n_headers") === 3)
  }

  test("reason may be empty; missing Content-Length surfaces as -1 with body = remainder") {
    val payload = ("HTTP/1.0 204\r\nServer: graft\r\n\r\n").getBytes("UTF-8")
    val r = parseDf(payload)
    assert(r.getAs[Int]("status_code") === 204)
    assert(r.getAs[String]("reason") === "")
    assert(r.getAs[String]("content_type") === null)
    assert(r.getAs[Long]("content_length") === -1L)
    assert(r.getAs[Array[Byte]]("body").length === 0)
  }

  test("header names are case-insensitive; body bytes are opaque") {
    val body = "WARC/1.0\r\nnot: a header\r\n\r\nstill body"
    val payload = (s"HTTP/1.1 404 Not Found\r\n" +
      s"CONTENT-TYPE: text/plain\r\n" +
      s"content-length: ${body.getBytes("UTF-8").length}\r\n" +
      "\r\n" + body).getBytes("UTF-8")
    val r = parseDf(payload)
    assert(r.getAs[Int]("status_code") === 404)
    assert(r.getAs[String]("reason") === "Not Found")
    assert(r.getAs[String]("content_type") === "text/plain")
    assert(new String(r.getAs[Array[Byte]]("body"), "UTF-8") === body)
  }

  test("strict framing: malformed envelopes throw with a byte offset") {
    def b(s: String) = s.getBytes("UTF-8")
    val cases = Seq(
      b("ICY 200 OK\r\n\r\nx"),                       // not an HTTP/1.x status line
      b("HTTP/2 200 OK\r\n\r\nx"),                    // wrong version shape
      b("HTTP/1.1 20 OK\r\n\r\nx"),                   // 2-digit code
      b("HTTP/1.1 200 OK\r\nbroken header\r\n\r\nx"), // no colon
      b("HTTP/1.1 200 OK\r\nContent-Length: ten\r\n\r\nx"), // non-numeric CL
      b("HTTP/1.1 200 OK\r\nContent-Length: 5\r\n\r\nxx"),  // CL != body bytes
      b("HTTP/1.1 200 OK\r\nServer: graft"))          // headers never terminate
    for (payload <- cases) {
      val e = intercept[IllegalArgumentException](
        HttpPayload.parseResponse(payload))
      assert(e.getMessage.contains("HTTP parse error"), new String(payload, "UTF-8"))
    }
  }

  test("the WARC+HTTP fixture chains: record payload parses back to the HTML body") {
    val rec = Warc.fixtureRecordHttp(3, "alpha beta")
    val row = Seq(rec).toDF("content")
      .select(explode(Warc.warc_records(col("content"))).as("r"))
      .select(col("r.payload").as("payload"))
      .select(HttpPayload.http_response(col("payload")).as("h"))
      .select(col("h.status_code"), col("h.body").cast("string").as("html"))
      .collect().head
    assert(row.getAs[Int]("status_code") === 200)
    assert(row.getAs[String]("html") === HttpPayload.htmlDoc(3, "alpha beta"))
  }
}
