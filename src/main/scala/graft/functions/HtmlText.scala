package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic HTML → text extraction (the WET/jusText step, VERDICT
  * r16 #1): the operator between an HTTP response body and the documents
  * table. One codegen'd expression per document; the whole WARC → HTTP →
  * text chain runs inside a single whole-stage-codegen span with no
  * shuffle and no driver-side bytes.
  *
  * The rule is a fixed, documented function — no heuristics that drift:
  *
  *  1. `<!-- -->` comments, and the full content of `<head>`, `<script>`
  *     and `<style>` elements, are removed (case-insensitive; an
  *     unterminated container swallows to end-of-input).
  *  2. The document splits into BLOCKS at every open or close of a
  *     block-level tag (p, div, h1-h6, li, ul, ol, dl, dt, dd, table,
  *     thead, tbody, tr, td, th, br, hr, section, article, aside, header,
  *     footer, nav, blockquote, pre, form, title, body, html). Inline
  *     tags (a, b, i, em, strong, span, code, small, u, sub, sup) do not
  *     break blocks.
  *  3. Text accumulates with character entities decoded: the named core
  *     (`&amp; &lt; &gt; &quot; &apos;`, `&nbsp;` → space) plus numeric
  *     `&#NNN;` / `&#xHHH;`; an unknown or malformed entity passes
  *     through literally (extraction is TOTAL — it never throws; strict
  *     framing belongs to the WARC/HTTP layers below it).
  *  4. Per block, whitespace runs collapse to one space and the block is
  *     trimmed; an empty block vanishes (counted in neither bucket).
  *  5. Boilerplate rule (the jusText/link-density core): a block whose
  *     NON-WHITESPACE characters are majority inside `<a>` anchors
  *     (link_density > 0.5) is DROPPED; ties (exactly 0.5) keep.
  *  6. Output = kept blocks joined by `\n`, plus kept/dropped counts.
  *
  * Tag scanning respects quoted attribute values (a `>` inside
  * `href="a>b"` does not end the tag); a `<` never followed by `>`
  * discards the remainder as an unterminated tag.
  */
object HtmlText {

  val resultType: StructType = StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("n_dropped", IntegerType, nullable = false)))

  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "dl", "dt", "dd", "table", "thead", "tbody", "tr", "td", "th",
    "br", "hr", "section", "article", "aside", "header", "footer", "nav",
    "blockquote", "pre", "form", "title", "body", "html")

  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  def html_text(html: Column): Column =
    ColumnBridge.column(HtmlTextExtract(ColumnBridge.expression(html)))

  def extract(html: UTF8String): GenericInternalRow = {
    val r = extractString(html.toString)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(r._1), r._2, r._3))
  }

  /** (extracted text, n_kept, n_dropped) — the testable core. */
  def extractString(html: String): (String, Int, Int) = {
    val n = html.length
    val out = new java.lang.StringBuilder
    val block = new java.lang.StringBuilder
    var totalNonWs = 0
    var linkNonWs = 0
    var linkDepth = 0
    var nKept = 0
    var nDropped = 0
    var pos = 0

    def emit(c: Char): Unit = {
      block.append(c)
      if (!Character.isWhitespace(c)) {
        totalNonWs += 1
        if (linkDepth > 0) linkNonWs += 1
      }
    }

    def flush(): Unit = {
      // collapse whitespace runs, trim
      val norm = new java.lang.StringBuilder
      var i = 0
      var pendingSpace = false
      while (i < block.length()) {
        val c = block.charAt(i)
        if (Character.isWhitespace(c)) { if (norm.length() > 0) pendingSpace = true }
        else {
          if (pendingSpace) { norm.append(' '); pendingSpace = false }
          norm.append(c)
        }
        i += 1
      }
      if (norm.length() > 0) {
        if (linkNonWs * 2 > totalNonWs) nDropped += 1
        else {
          if (out.length() > 0) out.append('\n')
          out.append(norm)
          nKept += 1
        }
      }
      block.setLength(0)
      totalNonWs = 0
      linkNonWs = 0
    }

    /** Case-insensitive match of `what` at `at`. */
    def matchesAt(at: Int, what: String): Boolean =
      at + what.length <= n &&
        html.regionMatches(true, at, what, 0, what.length)

    /** Scan from an opening `<` (pos at '<') to past the tag's `>`,
      * honoring quoted attribute values; returns the index AFTER '>', or
      * n if unterminated. */
    def skipTag(from: Int): Int = {
      var i = from
      var quote: Char = 0
      while (i < n) {
        val c = html.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return i + 1
        i += 1
      }
      n
    }

    /** Decode one entity starting at `&` (pos at '&'); appends the
      * decoded text and returns the index after the entity, or appends
      * '&' literally and returns pos+1 when malformed/unknown. */
    def entity(at: Int): Int = {
      val semi = html.indexOf(';', at + 1)
      if (semi < 0 || semi - at > 12) { emit('&'); return at + 1 }
      val name = html.substring(at + 1, semi)
      val decoded: Option[String] =
        if (name.startsWith("#x") || name.startsWith("#X")) {
          try {
            val cp = Integer.parseInt(name.substring(2), 16)
            if (Character.isValidCodePoint(cp) && cp > 0)
              Some(new String(Character.toChars(cp))) else None
          } catch { case _: Exception => None }
        } else if (name.startsWith("#")) {
          try {
            val cp = Integer.parseInt(name.substring(1))
            if (Character.isValidCodePoint(cp) && cp > 0)
              Some(new String(Character.toChars(cp))) else None
          } catch { case _: Exception => None }
        } else Entities.get(name)
      decoded match {
        case Some(s) => s.foreach(emit); semi + 1
        case None => emit('&'); at + 1
      }
    }

    while (pos < n) {
      val c = html.charAt(pos)
      if (c == '<') {
        if (matchesAt(pos, "<!--")) {
          val end = html.indexOf("-->", pos + 4)
          pos = if (end < 0) n else end + 3
        } else if (pos + 1 < n && html.charAt(pos + 1) == '!') {
          pos = skipTag(pos) // <!DOCTYPE ...>
        } else {
          // parse the tag name
          var i = pos + 1
          val closing = i < n && html.charAt(i) == '/'
          if (closing) i += 1
          // a tag name starts with a letter (so "<3" stays literal text);
          // digits may follow (h1..h6)
          val nameStart = i
          if (i < n && Character.isLetter(html.charAt(i))) {
            i += 1
            while (i < n && (Character.isLetter(html.charAt(i)) ||
              Character.isDigit(html.charAt(i)))) i += 1
          }
          val name = html.substring(nameStart, i).toLowerCase(java.util.Locale.ROOT)
          if (name.isEmpty) {
            // '<' not a tag ('< ' or '<3'): literal text
            emit('<'); pos += 1
          } else if (!closing && (name == "script" || name == "style" ||
            name == "head")) {
            // swallow the whole container, content included
            val afterOpen = skipTag(pos)
            var j = afterOpen
            var end = n
            var found = false
            while (!found && j < n) {
              if (matchesAt(j, "</" + name)) { end = skipTag(j); found = true }
              else j += 1
            }
            pos = end
          } else {
            if (BlockTags.contains(name)) flush()
            if (name == "a") {
              if (closing) linkDepth = math.max(0, linkDepth - 1)
              else linkDepth += 1
            }
            pos = skipTag(pos)
          }
        }
      } else if (c == '&') {
        pos = entity(pos)
      } else {
        emit(c)
        pos += 1
      }
    }
    flush()
    (out.toString, nKept, nDropped)
  }
}

/** STRING (an HTML document) → STRUCT(text, n_kept, n_dropped). Codegen
  * via a static call — the extraction loop runs inside whole-stage
  * codegen, one invocation per document row. */
case class HtmlTextExtract(child: Expression) extends UnaryExpression {
  override def dataType: DataType = HtmlText.resultType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HtmlText.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h =>
      s"${ev.value} = graft.functions.HtmlText.extract($h);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
