package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTTP response-envelope strip — the step between a WARC `response`
  * record's payload and the document body (VERDICT r16 #1). A crawl
  * response record's payload is `application/http; msgtype=response`: an
  * HTTP/1.x status line, CRLF headers, a blank line, then the entity body
  * (reference scope note: the reference is a chain sink and never sees
  * HTTP; this operator exists for the brief's LLM-pipeline surface — every
  * Common Crawl consumer strips this envelope before any text machinery).
  *
  * Same discipline as [[Warc]]'s splitter: ONE codegen'd expression per
  * payload, STRICT framing (a malformed status line, a torn header, or a
  * Content-Length that disagrees with the actual body byte count throws
  * with the byte offset — silent resync would hide data loss), and the
  * driver never sees a payload byte. Scale shape: runs inside the same
  * whole-stage-codegen span as the WARC splitter's posexplode consumer, so
  * WARC file → records → bodies is one task-local pass, no shuffle.
  */
object HttpPayload {

  /** One parsed response: status line + the headers text processing needs
    * + the raw entity body. `content_length` is the DECLARED header value
    * (-1 when absent) — parse fails loudly if it disagrees with the actual
    * body size, so downstream can trust `length(body)`. */
  val responseType: StructType = StructType(Seq(
    StructField("status_code", IntegerType, nullable = false),
    StructField("reason", StringType, nullable = false),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("n_headers", IntegerType, nullable = false),
    StructField("body", BinaryType, nullable = false)))

  /** Strict RFC 9112 response framing over one payload's bytes. */
  def parseResponse(bytes: Array[Byte]): GenericInternalRow = {
    var pos = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"HTTP parse error at byte $pos: $msg")
    def readLine(): String = {
      val start = pos
      while (pos < bytes.length - 1 &&
        !(bytes(pos) == '\r' && bytes(pos + 1) == '\n')) pos += 1
      if (pos >= bytes.length - 1) fail("unterminated header line")
      val s = new String(bytes, start, pos - start,
        java.nio.charset.StandardCharsets.UTF_8)
      pos += 2
      s
    }
    val status = readLine()
    // HTTP-version SP 3-digit-code SP reason (reason may be empty)
    val m = java.util.regex.Pattern
      .compile("HTTP/1\\.[01] (\\d{3}) ?(.*)").matcher(status)
    if (!m.matches()) fail(s"expected HTTP/1.x status line, got '${status.take(32)}'")
    val code = m.group(1).toInt
    val reason = m.group(2)
    var contentType: UTF8String = null
    var contentLength = -1L
    var nHeaders = 0
    var line = readLine()
    while (line.nonEmpty) {
      val i = line.indexOf(':')
      if (i < 0) fail(s"malformed header '${line.take(32)}'")
      val name = line.substring(0, i).trim.toLowerCase(java.util.Locale.ROOT)
      val value = line.substring(i + 1).trim
      name match {
        case "content-type" => contentType = UTF8String.fromString(value)
        case "content-length" =>
          contentLength = try value.toLong
          catch { case _: NumberFormatException => fail(s"bad Content-Length '$value'") }
        case _ => () // other headers: framing doesn't need them
      }
      nHeaders += 1
      line = readLine()
    }
    val body = java.util.Arrays.copyOfRange(bytes, pos, bytes.length)
    if (contentLength >= 0 && contentLength != body.length)
      fail(s"Content-Length $contentLength disagrees with actual body of " +
        s"${body.length} bytes")
    new GenericInternalRow(Array[Any](
      code, UTF8String.fromString(reason), contentType, contentLength,
      nHeaders, body))
  }

  /** BINARY (one response payload) → STRUCT of the parsed envelope. */
  def http_response(payload: Column): Column =
    ColumnBridge.column(HttpParse(ColumnBridge.expression(payload)))

  // ---- deterministic fixture helpers ------------------------------------
  // The WARC+HTTP fixture's payload is a pure function of (doc_id, text),
  // so the lanes' oracles rebuild every byte arithmetically in SQL. The
  // HTML template deliberately exercises the extractor's hard cases: a
  // <head> with title/style/script (all removed), a nav and a footer block
  // that are pure link text (boilerplate: link density 1.0 → dropped), and
  // a trailing paragraph with named + numeric character entities.

  /** The fixture HTML document for one (doc_id, text). Expected
    * [[graft.functions.HtmlText]] extraction:
    * `"Doc <id>\n<text>\ntail <id> & fin!"`, 3 blocks kept, 2 dropped. */
  def htmlDoc(docId: Long, text: String): String =
    s"""<html><head><title>Doc $docId</title><style>p{margin:0}</style>""" +
      s"""<script>var s="<p>no</p>";</script></head><body>""" +
      s"""<div><a href="/">Home</a> <a href="/about">About</a> """ +
      s"""<a href="/contact">Contact</a></div>""" +
      s"""<h1>Doc $docId</h1><p>$text</p>""" +
      s"""<p>tail $docId &amp; fin&#33;</p>""" +
      s"""<div><a href="/terms">Terms</a> <a href="/privacy">Privacy</a></div>""" +
      s"""</body></html>"""

  /** The fixture HTTP/1.1 response payload wrapping [[htmlDoc]]. */
  def httpResponsePayload(docId: Long, text: String): Array[Byte] = {
    val body = htmlDoc(docId, text)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val header =
      s"HTTP/1.1 200 OK\r\n" +
        s"Content-Type: text/html; charset=utf-8\r\n" +
        s"Content-Length: ${body.length}\r\n" +
        s"X-Graft-Doc: $docId\r\n" +
        "\r\n"
    val hb = header.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](hb.length + body.length)
    System.arraycopy(hb, 0, out, 0, hb.length)
    System.arraycopy(body, 0, out, hb.length, body.length)
    out
  }
}

/** BINARY (HTTP response payload) → STRUCT. Codegen via a static call like
  * [[WarcParse]] — one invocation per record row inside whole-stage
  * codegen. */
case class HttpParse(child: Expression) extends UnaryExpression {
  override def dataType: DataType = HttpPayload.responseType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HttpPayload.parseResponse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.sources.HttpPayload.parseResponse($b);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
