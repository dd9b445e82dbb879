package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Sitemap
import graft.extract.Sitemap.{Doc, Entry, Knobs}

/** Sitemap parser + SitemapSpider routing goldens, hard-coded from the
  * reference's own suites (`tests/test_utils_sitemap.py`,
  * `tests/test_spider.py` TestSitemapSpider) — expected entry maps, robots
  * discovery lists and routed URL lists copied verbatim. */
class SitemapGoldenSpec extends AnyFunSuite {

  private def doc(xml: String): Doc = Sitemap.parseDoc(xml.getBytes)

  test("urlset entries with all fields (test_sitemap)") {
    val s = doc("""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.google.com/schemas/sitemap/0.84">
<url>
<loc>http://www.example.com/</loc>
<lastmod>2009-08-16</lastmod>
<changefreq>daily</changefreq>
<priority>1</priority>
</url>
<url>
<loc>http://www.example.com/Special-Offers.html</loc>
<lastmod>2009-08-16</lastmod>
<changefreq>weekly</changefreq>
<priority>0.8</priority>
</url>
</urlset>""")
    assert(s.tpe === "urlset")
    assert(s.entries === Seq(
      Entry(Map("priority" -> "1", "loc" -> "http://www.example.com/",
        "lastmod" -> "2009-08-16", "changefreq" -> "daily"), Nil),
      Entry(Map("priority" -> "0.8",
        "loc" -> "http://www.example.com/Special-Offers.html",
        "lastmod" -> "2009-08-16", "changefreq" -> "weekly"), Nil)))
  }

  test("sitemapindex entries (test_sitemap_index)") {
    val s = doc("""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<sitemap>
  <loc>http://www.example.com/sitemap1.xml.gz</loc>
  <lastmod>2004-10-01T18:23:17+00:00</lastmod>
</sitemap>
<sitemap>
  <loc>http://www.example.com/sitemap2.xml.gz</loc>
  <lastmod>2005-01-01</lastmod>
</sitemap>
</sitemapindex>""")
    assert(s.tpe === "sitemapindex" && s.isIndex)
    assert(s.entries.map(_.fields) === Seq(
      Map("loc" -> "http://www.example.com/sitemap1.xml.gz",
        "lastmod" -> "2004-10-01T18:23:17+00:00"),
      Map("loc" -> "http://www.example.com/sitemap2.xml.gz",
        "lastmod" -> "2005-01-01")))
  }

  test("loc whitespace stripped, self-closing lastmod is \"\" (test_sitemap_strip)") {
    val s = doc("""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.google.com/schemas/sitemap/0.84">
<url>
<loc> http://www.example.com/</loc>
<lastmod>2009-08-16</lastmod>
<changefreq>daily</changefreq>
<priority>1</priority>
</url>
<url>
<loc> http://www.example.com/2</loc>
<lastmod />
</url>
</urlset>
""")
    assert(s.entries.map(_.fields) === Seq(
      Map("priority" -> "1", "loc" -> "http://www.example.com/",
        "lastmod" -> "2009-08-16", "changefreq" -> "daily"),
      Map("loc" -> "http://www.example.com/2", "lastmod" -> "")))
  }

  test("wrong/absent namespaces still parse (test_sitemap_wrong_ns/_ns2)") {
    val s = doc("""<?xml version="1.0" encoding="UTF-8"?>
<urlset>
<url xmlns="">
<loc> http://www.example.com/</loc>
<lastmod>2009-08-16</lastmod>
<changefreq>daily</changefreq>
<priority>1</priority>
</url>
<url xmlns="">
<loc> http://www.example.com/2</loc>
<lastmod />
</url>
</urlset>
""")
    assert(s.tpe === "urlset")
    assert(s.entries.map(_.loc) ===
      Seq("http://www.example.com/", "http://www.example.com/2"))
  }

  test("robots discovery: urljoin against base, relative + uppercase scheme (test_sitemap_urls_from_robots)") {
    val robots = """User-agent: *
Disallow: /aff/
Disallow: /wl/

# Search and shopping refining
Disallow: /s*/*facet
Disallow: /s*/*tags

# Sitemap files
Sitemap: http://example.com/sitemap.xml
Sitemap: http://example.com/sitemap-product-index.xml
Sitemap: HTTP://example.com/sitemap-uppercase.xml
Sitemap: /sitemap-relative-url.xml

# Forums
Disallow: /forum/search/
Disallow: /forum/active/
"""
    assert(Sitemap.sitemapUrlsFromRobots(robots, "http://example.com") === Seq(
      "http://example.com/sitemap.xml",
      "http://example.com/sitemap-product-index.xml",
      "http://example.com/sitemap-uppercase.xml",
      "http://example.com/sitemap-relative-url.xml"))
  }

  test("leading blank lines and comments between entries (test_sitemap_blanklines, test_comment)") {
    val s = doc("""
<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">

<!-- cache: cached = yes name = sitemap_jspCache key = sitemap -->
<sitemap>
<loc>http://www.example.com/sitemap1.xml</loc>
<lastmod>2013-07-15</lastmod>
</sitemap>

<sitemap>
<loc>http://www.example.com/sitemap2.xml</loc>
<lastmod>2013-07-15</lastmod>
</sitemap>

<!-- end cache -->
</sitemapindex>
""")
    assert(s.entries.map(_.loc) === Seq(
      "http://www.example.com/sitemap1.xml",
      "http://www.example.com/sitemap2.xml"))

    val c = doc("""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
    xmlns:xhtml="http://www.w3.org/1999/xhtml">
    <url>
        <loc>http://www.example.com/</loc>
        <!-- this is a comment on which the parser might raise an exception if implemented incorrectly -->
    </url>
</urlset>""")
    assert(c.entries === Seq(Entry(Map("loc" -> "http://www.example.com/"), Nil)))
  }

  private val AltUrlset = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"
    xmlns:xhtml="http://www.w3.org/1999/xhtml">
    <url>
        <loc>http://www.example.com/english/</loc>
        <xhtml:link rel="alternate" hreflang="de"
            href="http://www.example.com/deutsch/"/>
        <xhtml:link rel="alternate" hreflang="de-ch"
            href="http://www.example.com/schweiz-deutsch/"/>
        <xhtml:link rel="alternate" hreflang="it"
            href="http://www.example.com/italiano/"/>
        <xhtml:link rel="alternate" hreflang="it"/><!-- wrong tag without href -->
    </url>
</urlset>"""

  test("alternate links collected per entry; href-less link dropped (test_alternate)") {
    val s = doc(AltUrlset)
    assert(s.entries === Seq(Entry(Map("loc" -> "http://www.example.com/english/"),
      Seq("http://www.example.com/deutsch/",
        "http://www.example.com/schweiz-deutsch/",
        "http://www.example.com/italiano/"))))
  }

  test("sitemap_alternate_links routing (test_alternate_url_locs)") {
    val s = doc(AltUrlset)
    assert(Sitemap.route(s, Knobs()).map(_._1) ===
      Seq("http://www.example.com/english/"))
    assert(Sitemap.route(s, Knobs(alternateLinks = true)).map(_._1) === Seq(
      "http://www.example.com/english/",
      "http://www.example.com/deutsch/",
      "http://www.example.com/schweiz-deutsch/",
      "http://www.example.com/italiano/"))
  }

  test("sitemap_filter over urlset entries (test_sitemap_filter)") {
    val s = doc("""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <url>
        <loc>http://www.example.com/english/</loc>
        <lastmod>2010-01-01</lastmod>
    </url>
    <url>
        <loc>http://www.example.com/portuguese/</loc>
        <lastmod>2005-01-01</lastmod>
    </url>
</urlset>""")
    assert(Sitemap.route(s, Knobs()).map(_._1) === Seq(
      "http://www.example.com/english/", "http://www.example.com/portuguese/"))
    val filtered = Knobs(filter =
      _.filter(_.fields("lastmod").take(4).toInt > 2008))
    assert(Sitemap.route(s, filtered).map(_._1) ===
      Seq("http://www.example.com/english/"))
  }

  test("sitemap_filter can rewrite loc from alternates (test_sitemap_filter_with_alternate_links)") {
    val s = doc("""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <url>
        <loc>http://www.example.com/english/article_1/</loc>
        <lastmod>2010-01-01</lastmod>
        <xhtml:link rel="alternate" hreflang="de"
            href="http://www.example.com/deutsch/article_1/"/>
    </url>
    <url>
        <loc>http://www.example.com/english/article_2/</loc>
        <lastmod>2015-01-01</lastmod>
    </url>
</urlset>""")
    assert(Sitemap.route(s, Knobs()).map(_._1) === Seq(
      "http://www.example.com/english/article_1/",
      "http://www.example.com/english/article_2/"))
    val filtered = Knobs(filter = _.flatMap { e =>
      e.alternate.collectFirst { case l if l.contains("/deutsch/") =>
        e.copy(fields = e.fields + ("loc" -> l))
      }
    })
    assert(Sitemap.route(s, filtered).map(_._1) ===
      Seq("http://www.example.com/deutsch/article_1/"))
  }

  test("sitemap_filter over an index (test_sitemapindex_filter)") {
    val s = doc("""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
    <sitemap>
        <loc>http://www.example.com/sitemap1.xml</loc>
        <lastmod>2004-01-01T20:00:00+00:00</lastmod>
    </sitemap>
    <sitemap>
        <loc>http://www.example.com/sitemap2.xml</loc>
        <lastmod>2005-01-01</lastmod>
    </sitemap>
</sitemapindex>""")
    assert(Sitemap.route(s, Knobs()).map(_._1) === Seq(
      "http://www.example.com/sitemap1.xml", "http://www.example.com/sitemap2.xml"))
    val filtered = Knobs(filter =
      _.filter(_.fields("lastmod").take(4).toInt > 2004))
    assert(Sitemap.route(s, filtered).map(_._1) ===
      Seq("http://www.example.com/sitemap2.xml"))
  }

  test("sitemap_rules: first-match callback routing, non-matching locs dropped") {
    val s = doc("""<urlset>
<url><loc>http://h.test/shop/item/1</loc></url>
<url><loc>http://h.test/blog/post/1</loc></url>
<url><loc>http://h.test/about</loc></url>
</urlset>""")
    // first matching rule wins (the reference breaks after the first hit)
    val knobs = Knobs(rules = Seq(
      ("/shop/".r, "parse_shop"), ("/blog/".r, "parse_blog")))
    assert(Sitemap.route(s, knobs) === Seq(
      ("http://h.test/shop/item/1", Some("parse_shop")),
      ("http://h.test/blog/post/1", Some("parse_blog"))))
    // overlapping rules: order decides
    val overlap = Knobs(rules = Seq(("/shop/".r, "a"), ("item".r, "b")))
    assert(Sitemap.route(s, overlap) ===
      Seq(("http://h.test/shop/item/1", Some("a"))))
    // default rule: everything → parse
    assert(Sitemap.route(s, Knobs()).map(_._2).distinct === Seq(Some("parse")))
  }

  test("sitemap_follow gates index recursion (expandRouted)") {
    val index = """<sitemapindex>
<sitemap><loc>http://h.test/shop-sitemap.xml</loc></sitemap>
<sitemap><loc>http://h.test/blog-sitemap.xml</loc></sitemap>
</sitemapindex>"""
    val shop = "<urlset><url><loc>http://h.test/shop/1</loc></url></urlset>"
    val blog = "<urlset><url><loc>http://h.test/blog/1</loc></url></urlset>"
    val docs = Map(
      "http://h.test/root.xml" -> index.getBytes,
      "http://h.test/shop-sitemap.xml" -> shop.getBytes,
      "http://h.test/blog-sitemap.xml" -> blog.getBytes)
    // default: follow everything
    assert(Sitemap.expandRouted(docs.get, "http://h.test/root.xml", Knobs())
      .map(_._1) === Seq("http://h.test/shop/1", "http://h.test/blog/1"))
    // follow only the shop sub-sitemap
    assert(Sitemap.expandRouted(docs.get, "http://h.test/root.xml",
      Knobs(follow = Seq("shop".r))) === Seq(("http://h.test/shop/1", "parse")))
  }
}
