package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Sel

/** Golden battery for the parsel-semantics [[graft.extract.Sel]] facade.
  * Expected values come from the reference's OWN worked examples:
  * `docs/topics/selectors.rst` over `docs/_static/selectors-sample1.html`
  * (embedded verbatim below — whitespace-exact, the `::text` goldens
  * assert raw text-node content) and the in-subset cases of
  * `tests/test_selector.py`. */
class SelectorSpec extends AnyFunSuite {

  /** docs/_static/selectors-sample1.html, byte-for-byte. */
  val sample: String =
    """<!DOCTYPE html>
      |
      |<html>
      |  <head>
      |    <base href='http://example.com/' />
      |    <title>Example website</title>
      |  </head>
      |  <body>
      |    <div id='images'>
      |      <a href='image1.html'>Name: My image 1 <br /><img src='image1_thumb.jpg' alt='image1'/></a>
      |      <a href='image2.html'>Name: My image 2 <br /><img src='image2_thumb.jpg' alt='image2'/></a>
      |      <a href='image3.html'>Name: My image 3 <br /><img src='image3_thumb.jpg' alt='image3'/></a>
      |      <a href='image4.html'>Name: My image 4 <br /><img src='image4_thumb.jpg' alt='image4'/></a>
      |      <a href='image5.html'>Name: My image 5 <br /><img src='image5_thumb.jpg' alt='image5'/></a>
      |    </div>
      |  </body>
      |</html>""".stripMargin

  def s: Sel = Sel(sample)

  val hrefs = (1 to 5).map(i => s"image$i.html")
  val thumbs = (1 to 5).map(i => s"image${i}_thumb.jpg")

  // ---- docs/topics/selectors.rst worked examples ---------------------------

  test("xpath //title/text() get/getall") {
    assert(s.xpath("//title/text()").getall == Seq("Example website"))
    assert(s.xpath("//title/text()").get == Some("Example website"))
  }

  test("css title::text") {
    assert(s.css("title::text").get == Some("Example website"))
  }

  test("nested: css(img).xpath(@src)") {
    assert(s.css("img").xpath("@src").getall == thumbs)
  }

  test("xpath //div[@id=\"images\"]/a/text() first match") {
    assert(s.xpath("""//div[@id="images"]/a/text()""").get ==
      Some("Name: My image 1 "))
  }

  test("no match: get None / default") {
    assert(s.xpath("""//div[@id="not-exists"]/text()""").get.isEmpty)
    assert(s.xpath("""//div[@id="not-exists"]/text()""")
      .getOrElse("not-found") == "not-found")
  }

  test("attrib: per-element and first-of-list") {
    assert(s.css("img").items.map(_.attrib("src")) == thumbs)
    assert(s.css("img").attrib("src") == "image1_thumb.jpg")
    assert(s.css("base").attrib("href") == "http://example.com/")
  }

  test("base href via xpath @, css ::attr") {
    assert(s.xpath("//base/@href").get == Some("http://example.com/"))
    assert(s.css("base::attr(href)").get == Some("http://example.com/"))
  }

  test("xpath contains(@href) / css [href*=image]") {
    assert(s.xpath("""//a[contains(@href, "image")]/@href""").getall == hrefs)
    assert(s.css("a[href*=image]::attr(href)").getall == hrefs)
    assert(s.xpath("""//a[contains(@href, "image")]/img/@src""").getall == thumbs)
    assert(s.css("a[href*=image] img::attr(src)").getall == thumbs)
  }

  test("css #images *::text — ALL descendant text nodes incl. whitespace") {
    val expected = Seq("\n      ") ++
      (1 to 5).flatMap(i => Seq(s"Name: My image $i ", "\n      "))
        .dropRight(1) ++ Seq("\n    ")
    assert(s.css("#images *::text").getall == expected)
  }

  test("css img::text — element exists but has no text") {
    assert(s.css("img::text").get.isEmpty)
    assert(s.css("img::text").getOrElse("") == "")
  }

  test("css a::attr(href)") {
    assert(s.css("a::attr(href)").getall == hrefs)
  }

  test(".re with one group (docs example)") {
    assert(s.xpath("""//a[contains(@href, "image")]/text()""")
      .re("Name:\\s*(.*)") == (1 to 5).map(i => s"My image $i "))
    assert(s.xpath("""//a[contains(@href, "image")]/text()""")
      .reFirst("Name:\\s*(.*)") == Some("My image 1 "))
  }

  test(".re with no groups = full matches") {
    assert(s.css("title::text").re("\\w+") == Seq("Example", "website"))
  }

  test("nesting loop: per-link @href and img/@src (docs example)") {
    val links = s.xpath("""//a[contains(@href, "image")]""")
    assert(links.length == 5)
    val pairs = links.items.map(l =>
      (l.xpath("@href").get.get, l.xpath("img/@src").get.get))
    assert(pairs == hrefs.zip(thumbs))
  }

  // ---- tests/test_selector.py (in-subset) ----------------------------------

  test("simple selection (test_selector.py)") {
    val body = "<p><input name='a'value='1'/><input name='b'value='2'/></p>"
    val sel = Sel(body)
    assert(sel.xpath("//input").length == 2)
    assert(sel.xpath("//input").getall ==
      sel.xpath("//input").items.map(_.get.get))
    assert(sel.xpath("//input[@name='a']/@name").getall == Seq("a"))
  }

  // ---- relative-vs-absolute gotcha (docs "Working with relative XPaths") --

  test("nested // is absolute, .// is relative, bare name is child axis") {
    val html = "<div><p>a</p><span><p>b</p></span></div><div><p>c</p></div>"
    val divs = Sel(html).xpath("//div")
    assert(divs.length == 2)
    // "//p" inside a loop extracts ALL p from the document, per context
    assert(divs.xpath("//p/text()").getall == Seq("a", "b", "c", "a", "b", "c"))
    // ".//p" is the subtree
    assert(divs.xpath(".//p/text()").getall == Seq("a", "b", "c"))
    // "p" is direct children only
    assert(divs.xpath("p/text()").getall == Seq("a", "c"))
    assert(divs.css("p ::text").getall == Seq("a", "b", "c"))
  }

  // ---- engine-specific pins -------------------------------------------------

  test("element get() is the source span") {
    assert(Sel("<div><p>hello</p></div>").css("p").get == Some("<p>hello</p>"))
    assert(Sel(sample).css("base").get ==
      Some("<base href='http://example.com/' />"))
  }

  test("comments and PIs are not text nodes") {
    assert(Sel("<p>a<!-- c -->b<?pi x?>c</p>").xpath("//p/text()").getall ==
      Seq("a", "b", "c"))
  }

  test("entities decode in text nodes and attributes") {
    val sel = Sel("""<a href="/p?x=1&amp;y=2">A &amp; B &lt;ok&gt;</a>""")
    assert(sel.xpath("//a/text()").get == Some("A & B <ok>"))
    assert(sel.css("a::attr(href)").get == Some("/p?x=1&y=2"))
  }

  test("descendant text: //div//text() vs //div/text()") {
    val sel = Sel("<div>x<span>y</span>z</div>")
    assert(sel.xpath("//div//text()").getall == Seq("x", "y", "z"))
    assert(sel.xpath("//div/text()").getall == Seq("x", "z"))
    assert(sel.xpath("//text()").getall == Seq("x", "y", "z"))
    assert(sel.css("div::text").getall == Seq("x", "z"))
    assert(sel.css("*::text").getall == Seq("x", "y", "z"))
  }

  test("xpath starts-with predicate") {
    assert(s.xpath("//a[starts-with(@href, 'image1')]/@href").getall ==
      Seq("image1.html"))
  }

  test("css attribute operators ^= $= ~=") {
    assert(s.css("a[href^=image1]::attr(href)").getall == Seq("image1.html"))
    assert(s.css("a[href$='2.html']::attr(href)").getall == Seq("image2.html"))
    assert(s.css("img[alt~=image3]::attr(src)").getall ==
      Seq("image3_thumb.jpg"))
  }

  test("unsupported queries fail fast") {
    intercept[IllegalArgumentException](s.xpath("string(//title)"))
    intercept[IllegalArgumentException](s.css("a:first-child"))
  }

  test("value nodes have no children or attributes") {
    val texts = s.css("title::text")
    assert(texts.css("a").getall.isEmpty)
    assert(texts.xpath("@href").getall.isEmpty)
    assert(texts.attrib.isEmpty)
  }

  test("script/style content is the element's own text, not the parent's") {
    val sel = Sel("<div>a<script>var x = '<p>';</script>b</div>")
    assert(sel.xpath("//div/text()").getall == Seq("a", "b"))
    assert(sel.xpath("//script/text()").get == Some("var x = '<p>';"))
  }

  // ---- response.follow / follow_all (reference test_http_response.py) ------

  test("follow: a element, link element, and ::attr value selectors") {
    val base = "http://example.com/page/index.html"
    val html = "<html><head><link rel='next' href='/feed.xml'/></head><body>" +
      "<a href='sub/a.html'>A</a><a href=' spaced.html\t'>S</a>" +
      "<span>not a link</span><a name='anchor-only'>no href</a></body></html>"
    val s = Sel(html)
    assert(s.css("a").follow(base) == "http://example.com/page/sub/a.html")
    assert(s.css("link").follow(base) == "http://example.com/feed.xml")
    // attribute value: html5-whitespace stripped before the join
    assert(s.css("a::attr(href)").items(1).follow(base) ==
      "http://example.com/page/spaced.html")
    intercept[IllegalArgumentException](s.css("span").follow(base))
    intercept[IllegalArgumentException](s.css("a[name]").follow(base))
    intercept[IllegalArgumentException](s.css("div.absent").follow(base))
  }

  test("follow_all skips selectors without an obtainable link") {
    val base = "http://example.com/"
    val html = "<body><a href='/1'>x</a><a name='n'>no-href</a>" +
      "<a href='/2'>y</a></body>"
    assert(Sel(html).css("a").followAll(base) ==
      Seq("http://example.com/1", "http://example.com/2"))
    assert(Sel(html).css("a::attr(href)").followAll(base) ==
      Seq("http://example.com/1", "http://example.com/2"))
  }

  // ------------------------- jmespath (test_selector.py::TestJMESPath) ----

  test("jmespath: json body wrapping html (test_json_has_html)") {
    val body =
      """
        {
            "content": [
                {
                    "name": "A",
                    "value": "a"
                },
                {
                    "name": {
                        "age": 18
                    },
                    "value": "b"
                },
                {
                    "name": "C",
                    "value": "c"
                },
                {
                    "name": "<a>D</a>",
                    "value": "<div>d</div>"
                }
            ],
            "html": "<div><a>a<br>b</a>c</div><div><a>d</a>e<b>f</b></div>"
        }
        """
    val sel = Sel(body)
    assert(sel.jmespath("html").get ===
      Some("<div><a>a<br>b</a>c</div><div><a>d</a>e<b>f</b></div>"))
    assert(sel.jmespath("html").xpath("//div/a/text()").getall ===
      Seq("a", "b", "d"))
    assert(sel.jmespath("html").css("div > b").getall === Seq("<b>f</b>"))
    assert(sel.jmespath("content").jmespath("name.age").get === Some("18"))
  }

  val htmlWithJson: String =
    """
        <div>
            <h1>Information</h1>
            <content>
            {
              "user": [
                        {
                                  "name": "A",
                                  "age": 18
                        },
                        {
                                  "name": "B",
                                  "age": 32
                        },
                        {
                                  "name": "C",
                                  "age": 22
                        },
                        {
                                  "name": "D",
                                  "age": 25
                        }
              ],
              "total": 4,
              "status": "ok"
            }
            </content>
        </div>
        """

  test("jmespath: html body wrapping json (test_html_has_json)") {
    val sel = Sel(htmlWithJson)
    assert(sel.xpath("//div/content/text()").jmespath("user[*].name").getall ===
      Seq("A", "B", "C", "D"))
    assert(sel.xpath("//div/content").jmespath("user[*].name").getall ===
      Seq("A", "B", "C", "D"))
    assert(sel.xpath("//div/content").jmespath("total").get === Some("4"))
  }

  test("jmespath chained with re (test_jmestpath_with_re)") {
    val sel = Sel(htmlWithJson)
    assert(sel.xpath("//div/content/text()").jmespath("user[*].name")
      .re("(\\w+)") === Seq("A", "B", "C", "D"))
    assert(sel.xpath("//div/content").jmespath("user[*].name")
      .re("(\\w+)") === Seq("A", "B", "C", "D"))
    assert(sel.xpath("//div/content").jmespath("unavailable")
      .re("(\\d+)") === Seq.empty)
    assert(sel.xpath("//div/content").jmespath("unavailable")
      .reFirst("(\\d+)") === None)
    assert(sel.xpath("//div/content").jmespath("user[*].age.to_string(@)")
      .re("(\\d+)") === Seq("18", "32", "22", "25"))
  }

  test("jmespath subset: index, negative index, misses, fail-fast") {
    val sel = Sel("""{"a": [10, 20, 30], "o": {"k": "v"}}""")
    assert(sel.jmespath("a[0]").get === Some("10"))
    assert(sel.jmespath("a[-1]").get === Some("30"))
    assert(sel.jmespath("a[9]").get === None)
    assert(sel.jmespath("o.k").get === Some("v"))
    assert(sel.jmespath("o.missing").get === None)
    assert(sel.jmespath("a[*]").getall === Seq("10", "20", "30"))
    // [*] on a non-list is jmespath null
    assert(sel.jmespath("o[*]").get === None)
    intercept[IllegalArgumentException](sel.jmespath("a[?x > `1`]"))
    intercept[IllegalArgumentException](sel.jmespath("a | b"))
    intercept[IllegalArgumentException](sel.jmespath("a[*].b[*]"))
  }
}
