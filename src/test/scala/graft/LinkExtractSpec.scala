package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.LinkExtract

/** Link-extraction semantics (`scrapy/linkextractors/lxmlhtml.py`):
  * document order, quote styles, base-url, nofollow, area tags, filters,
  * per-document first-wins dedup on the keep-fragments canonical key. */
class LinkExtractSpec extends AnyFunSuite {
  private val base = "http://h.test/dir/page.html"

  private def urls(html: String, pageUrl: String = base): Seq[String] =
    LinkExtract.extract(html.getBytes, pageUrl, 2083).map(_._2.url)

  test("document order, quote styles, uppercase tags") {
    val html =
      """<HTML><BODY>
        |<A HREF="/first">1</A>
        |<a href='second.html'>2</a>
        |<a href=third.html>3</a>
        |</BODY></HTML>""".stripMargin
    assert(urls(html) === Seq(
      "http://h.test/first",
      "http://h.test/dir/second.html",
      "http://h.test/dir/third.html"))
  }

  test("base href changes resolution for subsequent links") {
    val html =
      """<base href="/other/"><a href="x.html">x</a>"""
    assert(urls(html) === Seq("http://h.test/other/x.html"))
  }

  test("area tags, nofollow skipped, rel with multiple tokens") {
    val html =
      """<area href="/map1">
        |<a href="/nf" rel="external nofollow">skip</a>
        |<a href="/ok" rel="external">keep</a>""".stripMargin
    assert(urls(html) === Seq("http://h.test/map1", "http://h.test/ok"))
  }

  test("filters: scheme, ignored extensions, length") {
    val html =
      """<a href="mailto:x@y.test">m</a>
        |<a href="javascript:void(0)">j</a>
        |<a href="/file.zip">z</a>
        |<a href="/file.tar.gz">t</a>
        |<a href="/page.html">ok</a>""".stripMargin
    assert(urls(html) === Seq("http://h.test/page.html"))
    val long = "<a href=\"/" + "x" * 3000 + "\">l</a>"
    assert(urls(long).isEmpty)
  }

  test("per-document first-wins dedup on canonical(keep_fragments) key") {
    val html =
      """<a href="/p/1?b=2&a=1">first</a>
        |<a href="/p/1?a=1&b=2">dup-reordered-query</a>
        |<a href="/p/1?a=1&b=2#frag">distinct-by-fragment</a>
        |<a href="HTTP://H.TEST/p/1?b=2&a=1">dup-case</a>""".stripMargin
    val out = urls(html)
    // fragment variant survives: link dedup keeps fragments in its key
    assert(out === Seq("http://h.test/p/1?b=2&a=1", "http://h.test/p/1?a=1&b=2#frag"))
  }

  test("html5 whitespace stripped from hrefs") {
    val html = "<a href=\"  /padded.html\n\">p</a>"
    assert(urls(html) === Seq("http://h.test/padded.html"))
  }

  test("raw document index is preserved for discovery ordering") {
    val html =
      """<a href="/file.zip">filtered</a><a href="/a">a</a><a href="/b">b</a>"""
    val idx = LinkExtract.extract(html.getBytes, base, 2083).map(_._1)
    assert(idx === Seq(1, 2)) // index 0 was the filtered .zip link
  }
}
