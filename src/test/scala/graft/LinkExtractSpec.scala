package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.LinkExtract

/** Link-extraction semantics (`scrapy/linkextractors/lxmlhtml.py`):
  * document order, quote styles, base-url, nofollow, area tags, filters,
  * per-document first-wins dedup on the raw sanitized URL (the reference
  * default extractor's `unique` key — see LinkExtractorSpec for the
  * reference-derived golden battery). */
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

  test("per-document first-wins dedup on the raw sanitized URL") {
    // the reference default (`unique=True, canonicalize=False`) dedups on
    // link.url — NOT the canonical form (`lxmlhtml.py:56-58,71-76`): the
    // reordered-query variant survives extraction (the fp-level dupefilter
    // collapses it later); only byte-identical sanitized URLs dedup here
    val html =
      """<a href="/p/1?b=2&a=1">first</a>
        |<a href="/p/1?a=1&b=2">reordered-query-survives</a>
        |<a href="/p/1?a=1&b=2#frag">distinct-by-fragment</a>
        |<a href="HTTP://H.TEST/p/1?b=2&a=1">dup-after-sanitize</a>""".stripMargin
    val out = urls(html)
    assert(out === Seq("http://h.test/p/1?b=2&a=1", "http://h.test/p/1?a=1&b=2",
      "http://h.test/p/1?a=1&b=2#frag"))
  }

  test("linkFilter knobs: allow/deny regex, domains, restrict_text") {
    import graft.extract.LinkFilter
    val html =
      """<a href="/p/1">Pic of a cat</a>
        |<a href="/p/2">Pic of a dog</a>
        |<a href="http://other.test/p/3">elsewhere</a>
        |<a href="/q/4">query page</a>""".stripMargin
    def u(f: LinkFilter): Seq[String] =
      LinkExtract.extract(html.getBytes, base, 2083, f).map(_._2.url)
    assert(u(LinkFilter(allow = Seq("/p/"))) ===
      Seq("http://h.test/p/1", "http://h.test/p/2", "http://other.test/p/3"))
    assert(u(LinkFilter(allow = Seq("/p/"), deny = Seq("p/2"))) ===
      Seq("http://h.test/p/1", "http://other.test/p/3"))
    assert(u(LinkFilter(allowDomains = Seq("h.test"))) ===
      Seq("http://h.test/p/1", "http://h.test/p/2", "http://h.test/q/4"))
    assert(u(LinkFilter(denyDomains = Seq("other.test"))) ===
      Seq("http://h.test/p/1", "http://h.test/p/2", "http://h.test/q/4"))
    assert(u(LinkFilter(restrictText = Seq("of.*dog"))) === Seq("http://h.test/p/2"))
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
