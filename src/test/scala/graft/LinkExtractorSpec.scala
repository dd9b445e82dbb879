package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.{LinkExtract, LinkExtractor}
import graft.extract.LinkExtract.Link

/** Reference-derived GOLDEN battery for the user-facing LinkExtractor —
  * expected outputs hard-coded from the reference's own test suite
  * (`tests/test_linkextractors.py`, fixture
  * `tests/sample_data/link_extractor/linkextractor.html`), the way
  * FingerprintSpec pins urlkit. This closes the shared-code blind spot:
  * LinkExtract is used by BOTH the engine and the oracle, so conformance
  * alone cannot catch a mutual extraction bug — these fixtures can. */
class LinkExtractorSpec extends AnyFunSuite {

  // tests/sample_data/link_extractor/linkextractor.html, verbatim
  private val fixtureHtml =
    """<!DOCTYPE html>
      |
      |<html>
      |  <head>
      |    <base href='http://example.com' />
      |    <title>Sample page with links for testing LinkExtractor</title>
      |  </head>
      |  <body>
      |    <div id='wrapper'>
      |      <div id='subwrapper'>
      |        <area href='sample1.html' alt='sample1'/>
      |        <a href='sample2.html'>sample 2<img src='sample2.jpg' alt='sample2'/></a>
      |      </div>
      |      <a href='http://example.com/sample3.html' title='sample 3'>sample 3 text</a>
      |      <a href='sample3.html'>sample 3 repetition</a>
      |      <a href='sample3.html'>sample 3 repetition</a>
      |      <a href='sample3.html#foo'>sample 3 repetition with fragment</a>
      |      <a href='http://www.google.com/something'></a>
      |      <a href='http://example.com/innertag.html'><strong>inner</strong> tag</a>
      |      <a href='page 4.html'>href with whitespaces</a>
      |    </div>
      |  </body>
      |</html>""".stripMargin
  private val fixtureUrl = "http://example.com/index"

  private def links(lx: LinkExtractor, html: String = fixtureHtml,
      pageUrl: String = fixtureUrl): Seq[Link] =
    lx.extractLinks(html, pageUrl)

  test("test_extract_all_links") {
    assert(links(new LinkExtractor()) === Seq(
      Link("http://example.com/sample1.html", false, ""),
      Link("http://example.com/sample2.html", false, "sample 2"),
      Link("http://example.com/sample3.html", false, "sample 3 text"),
      Link("http://example.com/sample3.html#foo", false,
        "sample 3 repetition with fragment"),
      Link("http://www.google.com/something", false, ""),
      Link("http://example.com/innertag.html", false, "inner tag"),
      Link("http://example.com/page%204.html", false, "href with whitespaces")))
  }

  test("test_extract_filter_allow") {
    assert(links(new LinkExtractor(allow = Seq("sample"))) === Seq(
      Link("http://example.com/sample1.html", false, ""),
      Link("http://example.com/sample2.html", false, "sample 2"),
      Link("http://example.com/sample3.html", false, "sample 3 text"),
      Link("http://example.com/sample3.html#foo", false,
        "sample 3 repetition with fragment")))
  }

  test("test_extract_filter_allow_with_duplicates (unique=false)") {
    assert(links(new LinkExtractor(allow = Seq("sample"), unique = false)) === Seq(
      Link("http://example.com/sample1.html", false, ""),
      Link("http://example.com/sample2.html", false, "sample 2"),
      Link("http://example.com/sample3.html", false, "sample 3 text"),
      Link("http://example.com/sample3.html", false, "sample 3 repetition"),
      Link("http://example.com/sample3.html", false, "sample 3 repetition"),
      Link("http://example.com/sample3.html#foo", false,
        "sample 3 repetition with fragment")))
  }

  test("test_extract_filter_allow_with_duplicates_canonicalize") {
    assert(links(new LinkExtractor(allow = Seq("sample"), unique = false,
      canonicalize = true)) === Seq(
      Link("http://example.com/sample1.html", false, ""),
      Link("http://example.com/sample2.html", false, "sample 2"),
      Link("http://example.com/sample3.html", false, "sample 3 text"),
      Link("http://example.com/sample3.html", false, "sample 3 repetition"),
      Link("http://example.com/sample3.html", false, "sample 3 repetition"),
      Link("http://example.com/sample3.html", false,
        "sample 3 repetition with fragment")))
  }

  test("test_extract_filter_allow_no_duplicates_canonicalize") {
    assert(links(new LinkExtractor(allow = Seq("sample"), unique = true,
      canonicalize = true)) === Seq(
      Link("http://example.com/sample1.html", false, ""),
      Link("http://example.com/sample2.html", false, "sample 2"),
      Link("http://example.com/sample3.html", false, "sample 3 text")))
  }

  test("test_extract_filter_allow_and_deny") {
    assert(links(new LinkExtractor(allow = Seq("sample"), deny = Seq("3"))) === Seq(
      Link("http://example.com/sample1.html", false, ""),
      Link("http://example.com/sample2.html", false, "sample 2")))
  }

  test("test_extract_filter_allowed_domains + deny_domains") {
    assert(links(new LinkExtractor(allowDomains = Seq("google.com"))) === Seq(
      Link("http://www.google.com/something", false, "")))
    assert(links(new LinkExtractor(denyDomains = Seq("example.com"))) === Seq(
      Link("http://www.google.com/something", false, "")))
  }

  test("test_nofollow") {
    val html =
      """<html><head><title>Page title</title></head>
        |<body>
        |<div class='links'>
        |<p><a href="/about.html">About us</a></p>
        |</div>
        |<div>
        |<p><a href="/follow.html">Follow this link</a></p>
        |</div>
        |<div>
        |<p><a href="/nofollow.html" rel="nofollow">Dont follow this one</a></p>
        |</div>
        |<div>
        |<p><a href="/nofollow2.html" rel="blah">Choose to follow or not</a></p>
        |</div>
        |<div>
        |<p><a href="http://google.com/something" rel="external nofollow">External link not to follow</a></p>
        |</div>
        |</body></html>""".stripMargin
    assert(links(new LinkExtractor(), html,
      "http://example.org/somepage/index.html") === Seq(
      Link("http://example.org/about.html", false, "About us"),
      Link("http://example.org/follow.html", false, "Follow this link"),
      Link("http://example.org/nofollow.html", true, "Dont follow this one"),
      Link("http://example.org/nofollow2.html", false, "Choose to follow or not"),
      Link("http://google.com/something", true, "External link not to follow")))
  }

  test("test_matches") {
    val url1 = "http://lotsofstuff.com/stuff1/index"
    val url2 = "http://evenmorestuff.com/uglystuff/index"
    assert(new LinkExtractor(allow = Seq("stuff1")).matches(url1))
    assert(!new LinkExtractor(allow = Seq("stuff1")).matches(url2))
    assert(new LinkExtractor(deny = Seq("uglystuff")).matches(url1))
    assert(!new LinkExtractor(deny = Seq("uglystuff")).matches(url2))
    assert(!new LinkExtractor(allowDomains = Seq("evenmorestuff.com")).matches(url1))
    assert(new LinkExtractor(allowDomains = Seq("evenmorestuff.com")).matches(url2))
    assert(!new LinkExtractor(denyDomains = Seq("lotsofstuff.com")).matches(url1))
    assert(new LinkExtractor(denyDomains = Seq("lotsofstuff.com")).matches(url2))
    val lx = new LinkExtractor(allow = Seq("blah1"), deny = Seq("blah2"),
      allowDomains = Seq("blah1.com"), denyDomains = Seq("blah2.com"))
    assert(lx.matches("http://blah1.com/blah1"))
    assert(!lx.matches("http://blah1.com/blah2"))
    assert(!lx.matches("http://blah2.com/blah1"))
    assert(!lx.matches("http://blah2.com/blah2"))
  }

  test("test_ignored_extensions (default + deny_extensions override)") {
    val html = """<a href="page.html">asd</a> and <a href="photo.jpg">"""
    assert(links(new LinkExtractor(), html, "http://example.org/") === Seq(
      Link("http://example.org/page.html", false, "asd")))
    assert(links(new LinkExtractor(denyExtensions = Some(Seq("html"))), html,
      "http://example.org/") === Seq(
      Link("http://example.org/photo.jpg", false, "")))
  }

  test("test_attrs") {
    assert(links(new LinkExtractor(attrs = Seq("href"))).map(_.url) === Seq(
      "http://example.com/sample1.html", "http://example.com/sample2.html",
      "http://example.com/sample3.html", "http://example.com/sample3.html#foo",
      "http://www.google.com/something", "http://example.com/innertag.html",
      "http://example.com/page%204.html"))
    assert(links(new LinkExtractor(attrs = Seq("href", "src"),
      tags = Seq("a", "area", "img"), denyExtensions = Some(Nil))) === Seq(
      Link("http://example.com/sample1.html", false, ""),
      Link("http://example.com/sample2.html", false, "sample 2"),
      Link("http://example.com/sample2.jpg", false, ""),
      Link("http://example.com/sample3.html", false, "sample 3 text"),
      Link("http://example.com/sample3.html#foo", false,
        "sample 3 repetition with fragment"),
      Link("http://www.google.com/something", false, ""),
      Link("http://example.com/innertag.html", false, "inner tag"),
      Link("http://example.com/page%204.html", false, "href with whitespaces")))
    assert(links(new LinkExtractor(attrs = Nil)) === Nil)
  }

  test("test_tags") {
    val html =
      """<html><area href="sample1.html"></area><a href="sample2.html">sample 2</a><img src="sample2.jpg"/></html>"""
    val page = "http://example.com/index.html"
    assert(links(new LinkExtractor(tags = Nil), html, page) === Nil)
    assert(links(new LinkExtractor(), html, page) === Seq(
      Link("http://example.com/sample1.html", false, ""),
      Link("http://example.com/sample2.html", false, "sample 2")))
    assert(links(new LinkExtractor(tags = Seq("area")), html, page) === Seq(
      Link("http://example.com/sample1.html", false, "")))
    assert(links(new LinkExtractor(tags = Seq("a")), html, page) === Seq(
      Link("http://example.com/sample2.html", false, "sample 2")))
    assert(links(new LinkExtractor(tags = Seq("a", "img"),
      attrs = Seq("href", "src"), denyExtensions = Some(Nil)), html, page) === Seq(
      Link("http://example.com/sample2.html", false, "sample 2"),
      Link("http://example.com/sample2.jpg", false, "")))
  }

  test("test_tags_attrs (custom data attribute)") {
    val html =
      """<html><body>
        |<div id="item1" data-url="get?id=1"><a href="#">Item 1</a></div>
        |<div id="item2" data-url="get?id=2"><a href="#">Item 2</a></div>
        |</body></html>""".stripMargin
    assert(links(new LinkExtractor(tags = Seq("div"), attrs = Seq("data-url")),
      html, "http://example.com/index.html") === Seq(
      Link("http://example.com/get?id=1", false, "Item 1"),
      Link("http://example.com/get?id=2", false, "Item 2")))
  }

  test("test_link_wrong_href (invalid IPv6 netloc skipped)") {
    val html =
      """<a href="http://example.org/item1.html">Item 1</a>
        |<a href="http://[example.org/item2.html">Item 2</a>
        |<a href="http://example.org/item3.html">Item 3</a>""".stripMargin
    assert(links(new LinkExtractor(), html, "http://example.org/index.html") === Seq(
      Link("http://example.org/item1.html", false, "Item 1"),
      Link("http://example.org/item3.html", false, "Item 3")))
  }

  test("test_skip_bad_links (non-numeric port skipped)") {
    val html =
      """<a href="http://example.org:non-port">Why would you do this?</a>
        |<a href="http://example.org/item2.html">Good Link</a>
        |<a href="http://example.org/item3.html">Good Link 2</a>""".stripMargin
    assert(links(new LinkExtractor(), html, "http://example.org/index.html") === Seq(
      Link("http://example.org/item2.html", false, "Good Link"),
      Link("http://example.org/item3.html", false, "Good Link 2")))
  }

  test("test_ftp_links") {
    val html =
      """<html><body>
        |<div><a href="ftp://www.external.com/">An Item</a></div>
        |</body></html>""".stripMargin
    assert(links(new LinkExtractor(), html, "http://www.example.com/index.html") ===
      Seq(Link("ftp://www.external.com/", false, "An Item")))
  }

  test("test_link_restrict_text") {
    val html =
      """<a href="http://example.org/item1.html">Pic of a cat</a>
        |<a href="http://example.org/item2.html">Pic of a dog</a>
        |<a href="http://example.org/item3.html">Pic of a cow</a>""".stripMargin
    val page = "http://example.org/index.html"
    assert(links(new LinkExtractor(restrictText = Seq("dog")), html, page) === Seq(
      Link("http://example.org/item2.html", false, "Pic of a dog")))
    assert(links(new LinkExtractor(restrictText = Seq("of.*dog")), html, page) === Seq(
      Link("http://example.org/item2.html", false, "Pic of a dog")))
    assert(links(new LinkExtractor(restrictText = Seq("of.*dog", "of.*cat")),
      html, page) === Seq(
      Link("http://example.org/item1.html", false, "Pic of a cat"),
      Link("http://example.org/item2.html", false, "Pic of a dog")))
  }

  test("test_link_allowed edge cases (empty url, bad/missing scheme prefix)") {
    val lx = new LinkExtractor()
    assert(!lx.linkAllowed(Link("", false, "")))
    assert(!lx.linkAllowed(Link("htp://should_be_http.example", false, "")))
    assert(!lx.linkAllowed(Link("should_have_prefix.example", false, "")))
  }

  test("test_link_extractor_aggregation (unique × canonicalize)") {
    val html =
      """<div>
        |    <a href="/a">a1</a>
        |    <a href="/b?a=1&b=2">b1</a>
        |</div>
        |<div>
        |    <a href="/a">a2</a>
        |    <a href="/b?b=2&a=1">b2</a>
        |</div>""".stripMargin
    val page = "https://example.com"
    assert(links(new LinkExtractor(), html, page) === Seq(
      Link("https://example.com/a", false, "a1"),
      Link("https://example.com/b?a=1&b=2", false, "b1"),
      Link("https://example.com/b?b=2&a=1", false, "b2")))
    assert(links(new LinkExtractor(canonicalize = true), html, page) === Seq(
      Link("https://example.com/a", false, "a1"),
      Link("https://example.com/b?a=1&b=2", false, "b1")))
    assert(links(new LinkExtractor(unique = false), html, page) === Seq(
      Link("https://example.com/a", false, "a1"),
      Link("https://example.com/b?a=1&b=2", false, "b1"),
      Link("https://example.com/a", false, "a2"),
      Link("https://example.com/b?b=2&a=1", false, "b2")))
    assert(links(new LinkExtractor(unique = false, canonicalize = true),
      html, page) === Seq(
      Link("https://example.com/a", false, "a1"),
      Link("https://example.com/b?a=1&b=2", false, "b1"),
      Link("https://example.com/a", false, "a2"),
      Link("https://example.com/b?a=1&b=2", false, "b2")))
  }

  test("test_base_url (base tag in head governs relative resolution)") {
    val html =
      """<html><head><title>Page title</title><base href="http://otherdomain.com/base/" /></head>
        |<body><p><a href="item/12.html">Item 12</a></p>
        |</body></html>""".stripMargin
    assert(links(new LinkExtractor(), html,
      "http://example.org/somepage/index.html") === Seq(
      Link("http://otherdomain.com/base/item/12.html", false, "Item 12")))
  }

  test("test_encoded_url (percent-encoded page path preserved)") {
    val html = """<html><body><div><a href="?page=2">BinB</a></body></html>"""
    assert(links(new LinkExtractor(), html, "http://known.fm/AC%2FDC/") === Seq(
      Link("http://known.fm/AC%2FDC/?page=2", false, "BinB")))
  }

  test("test_process_value (javascript href extraction)") {
    val html =
      """<a href="javascript:goToPage('../other/page.html','photo','width=600,height=540,scrollbars'); return false">Text</a>
        |<a href="/about.html">About us</a>""".stripMargin
    val pv: String => Option[String] = v =>
      """javascript:goToPage\('(.*?)'""".r.findFirstMatchIn(v).map(_.group(1))
    assert(links(new LinkExtractor(processValue = Some(pv)), html,
      "http://example.org/somepage/index.html") === Seq(
      Link("http://example.org/other/page.html", false, "Text")))
  }

  // ------------------------------------------------ restrict_xpaths / css

  test("test_restrict_xpaths") {
    assert(links(new LinkExtractor(
      restrictXpaths = Seq("""//div[@id="subwrapper"]"""))) === Seq(
      Link("http://example.com/sample1.html", false, ""),
      Link("http://example.com/sample2.html", false, "sample 2")))
  }

  test("test_restrict_xpaths_encoding (windows-1252)") {
    val html = ("""<html><head><title>Page title</title></head>
      |<body><p><a href="item/12.html">Item 12</a></p>
      |<div class='links'>
      |<p><a href="/about.html">About us£</a></p>
      |</div>
      |<div>
      |<p><a href="/nofollow.html">This shouldn't be followed</a></p>
      |</div>
      |</body></html>""").stripMargin
    val body = html.getBytes("windows-1252")
    val lx = new LinkExtractor(restrictXpaths = Seq("//div[@class='links']"))
    assert(lx.extractLinks(body, "http://example.org/somepage/index.html",
      "windows-1252") === Seq(
      Link("http://example.org/about.html", false, "About us£")))
  }

  test("test_restrict_xpaths_with_html_entities (iso8859-15 query encoding)") {
    // &hearts; decodes to U+2665 (UTF-8 percent-encoded in the path);
    // &euro; decodes to U+20AC, percent-encoded with the PAGE encoding in
    // the query (iso8859-15 byte 0xA4) — w3lib safe_url_string(url, enc)
    val body =
      "<html><body><p><a href=\"/&hearts;/you?c=&euro;\">text</a></p></body></html>"
        .getBytes("ISO-8859-15")
    val lx = new LinkExtractor(restrictXpaths = Seq("//p"))
    assert(lx.extractLinks(body, "http://example.org/somepage/index.html",
      "ISO-8859-15") === Seq(
      Link("http://example.org/%E2%99%A5/you?c=%A4", false, "text")))
  }

  test("test_restrict_xpaths_concat_in_handle_data (gb18030, unclosed div)") {
    val body = "<html><body><div><a href=\"/foo\">&gt;京&lt;东</a></body></html>"
      .getBytes("GB18030")
    val lx = new LinkExtractor(restrictXpaths = Seq("//div"))
    assert(lx.extractLinks(body, "http://example.org", "GB18030") === Seq(
      Link("http://example.org/foo", false, ">京<东")))
  }

  test("test_restrict_css") {
    // the area link is NOT an <a>, so '#subwrapper a' excludes it
    assert(links(new LinkExtractor(restrictCss = Seq("#subwrapper a"))) === Seq(
      Link("http://example.com/sample2.html", false, "sample 2")))
  }

  test("test_restrict_css_and_restrict_xpaths_together") {
    // subdocs in selector order: xpath's div (sample1+sample2), then the
    // css adjacent-sibling match (the sample3 <a> itself)
    assert(links(new LinkExtractor(
      restrictXpaths = Seq("""//div[@id="subwrapper"]"""),
      restrictCss = Seq("#subwrapper + a"))) === Seq(
      Link("http://example.com/sample1.html", false, ""),
      Link("http://example.com/sample2.html", false, "sample 2"),
      Link("http://example.com/sample3.html", false, "sample 3 text")))
  }

  test("test_link_extractor_aggregation (unique x canonicalize)") {
    val html =
      """
        |<div>
        |    <a href="/a">a1</a>
        |    <a href="/b?a=1&b=2">b1</a>
        |</div>
        |<div>
        |    <a href="/a">a2</a>
        |    <a href="/b?b=2&a=1">b2</a>
        |</div>
      """.stripMargin
    val url = "https://example.com"
    // unique=True (default), canonicalize=False (default)
    assert(new LinkExtractor(restrictCss = Seq("div"))
      .extractLinks(html, url) === Seq(
      Link("https://example.com/a", false, "a1"),
      Link("https://example.com/b?a=1&b=2", false, "b1"),
      Link("https://example.com/b?b=2&a=1", false, "b2")))
    // unique=True, canonicalize=True
    assert(new LinkExtractor(restrictCss = Seq("div"), canonicalize = true)
      .extractLinks(html, url) === Seq(
      Link("https://example.com/a", false, "a1"),
      Link("https://example.com/b?a=1&b=2", false, "b1")))
    // unique=False, canonicalize=False
    assert(new LinkExtractor(restrictCss = Seq("div"), unique = false)
      .extractLinks(html, url) === Seq(
      Link("https://example.com/a", false, "a1"),
      Link("https://example.com/b?a=1&b=2", false, "b1"),
      Link("https://example.com/a", false, "a2"),
      Link("https://example.com/b?b=2&a=1", false, "b2")))
    // unique=False, canonicalize=True
    assert(new LinkExtractor(restrictCss = Seq("div"), unique = false,
      canonicalize = true).extractLinks(html, url) === Seq(
      Link("https://example.com/a", false, "a1"),
      Link("https://example.com/b?a=1&b=2", false, "b1"),
      Link("https://example.com/a", false, "a2"),
      Link("https://example.com/b?a=1&b=2", false, "b2")))
  }

  test("nested restrict matches duplicate like per-subdoc extraction") {
    // //div matches both wrapper and subwrapper: subwrapper's links are
    // extracted twice (once per subdoc); unique=True collapses them,
    // preserving first-occurrence order
    val html =
      """<div id="outer"><div id="inner"><a href="/x">x</a></div>
        |<a href="/y">y</a></div>""".stripMargin
    assert(new LinkExtractor(restrictXpaths = Seq("//div"), unique = false)
      .extractLinks(html, "http://e.com") === Seq(
      Link("http://e.com/x", false, "x"),
      Link("http://e.com/y", false, "y"),
      Link("http://e.com/x", false, "x")))
    assert(new LinkExtractor(restrictXpaths = Seq("//div"))
      .extractLinks(html, "http://e.com") === Seq(
      Link("http://e.com/x", false, "x"),
      Link("http://e.com/y", false, "y")))
  }

  test("unsupported selector fails at construction") {
    intercept[IllegalArgumentException] {
      new LinkExtractor(restrictXpaths = Seq("//div[position()=1]"))
    }
    intercept[IllegalArgumentException] {
      new LinkExtractor(restrictCss = Seq("div:first-child"))
    }
  }
}
