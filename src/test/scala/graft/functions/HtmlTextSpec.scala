package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HTML → text extraction battery: the documented rule's hard cases —
  * container removal, nesting, entities, quoted attributes, link-density
  * boundary, malformed input totality. */
class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  private def ex(html: String): (String, Int, Int) = HtmlText.extractString(html)
  private def text(html: String): String = ex(html)._1

  test("fixture template extracts the closed-form the lane oracle replays") {
    val html = graft.sources.HttpPayload.htmlDoc(7, "the scan value")
    val (t, kept, dropped) = ex(html)
    assert(t === "Doc 7\nthe scan value\ntail 7 & fin!")
    assert(kept === 3)
    assert(dropped === 2)
  }

  test("head, script and style vanish wholesale, markup inside them included") {
    val html = "<head><title>T</title></head>" +
      "<script>if (a<b) document.write(\"<p>fake</p>\");</script>" +
      "<style>p>span{color:red}</style><p>real</p>"
    assert(text(html) === "real")
  }

  test("unterminated script/style/head swallow to end-of-input") {
    assert(text("<p>seen</p><script>var x=1;") === "seen")
    assert(text("<p>seen</p><head><p>never") === "seen")
  }

  test("comments are removed, tags inside comments included; unterminated comment swallows") {
    assert(text("<p>a</p><!-- <p>not me</p> --><p>b</p>") === "a\nb")
    assert(text("<p>a</p><!-- open forever <p>x</p>") === "a")
  }

  test("entities: named, decimal, hex, nbsp-as-space; unknown and malformed pass literally") {
    assert(text("<p>a &amp; b &lt;tag&gt; &quot;q&quot; &apos;s&apos;</p>") ===
      "a & b <tag> \"q\" 's'")
    assert(text("<p>x&#65;&#x42;y</p>") === "xABy")
    assert(text("<p>a&nbsp;b</p>") === "a b")
    assert(text("<p>&bogus; &toolongtobeanentityname; &amp</p>") ===
      "&bogus; &toolongtobeanentityname; &amp")
    assert(text("<p>&#x1F600;</p>") === new String(Character.toChars(0x1F600)))
  }

  test("a '>' inside a quoted attribute does not end the tag") {
    assert(text("""<p><a href="/x?a>b" title='1>0'>link text</a> and plenty of surrounding prose</p>""") ===
      "link text and plenty of surrounding prose")
  }

  test("link-density boundary: exactly half linked keeps, majority linked drops") {
    // 4 linked non-ws chars, 4 unlinked → density 0.5 → keep
    val (t1, k1, d1) = ex("<p><a>abcd</a> wxyz</p>")
    assert((t1, k1, d1) === ("abcd wxyz", 1, 0))
    // 5 linked, 4 unlinked → density > 0.5 → drop
    val (t2, k2, d2) = ex("<p><a>abcde</a> wxyz</p>")
    assert((t2, k2, d2) === ("", 0, 1))
  }

  test("whitespace runs collapse, blocks trim, empty blocks vanish from both counts") {
    val (t, kept, dropped) = ex("<div>  </div><p>  a\n\t b  </p><div></div>")
    assert(t === "a b")
    assert(kept === 1)
    assert(dropped === 0)
  }

  test("inline tags do not split blocks; block tags (br included) do") {
    assert(text("<p>one <b>bold</b> <span>span</span> word</p>") ===
      "one bold span word")
    assert(text("line a<br/>line b<hr>line c") === "line a\nline b\nline c")
  }

  test("malformed input is total: unterminated tag discards remainder, stray '<' is text") {
    assert(text("<p>kept</p><a href=unclosed forever") === "kept")
    assert(text("<p>3 < 5 and 2 <3 heart</p>") === "3 < 5 and 2 <3 heart")
    assert(text("") === "")
    // stray close-anchors never underflow the link depth
    assert(ex("</a></a><p>plain text words</p>") === ("plain text words", 1, 0))
  }

  test("nested anchors count linked chars once and unwind correctly") {
    // everything inside the outer <a> is linked → dropped
    val (_, k, d) = ex("<p><a>out <a>in</a> out</a></p>")
    assert((k, d) === (0, 1))
    // after both close, later text is unlinked again
    val (t2, k2, _) = ex("<p><a>x<a>y</a>z</a> plain words after anchor</p>")
    assert(k2 === 1)
    assert(t2 === "xyz plain words after anchor")
  }

  test("DOCTYPE is skipped; codegen path agrees with the direct call") {
    val html = "<!DOCTYPE html>" + graft.sources.HttpPayload.htmlDoc(1, "alpha")
    val row = Seq(html).toDF("h")
      .select(HtmlText.html_text(col("h")).as("t"))
      .select(col("t.text"), col("t.n_kept"), col("t.n_dropped"))
      .collect().head
    val (t, k, d) = ex(html)
    assert(row.getString(0) === t)
    assert(row.getInt(1) === k)
    assert(row.getInt(2) === d)
    assert(t === "Doc 1\nalpha\ntail 1 & fin!")
  }
}
