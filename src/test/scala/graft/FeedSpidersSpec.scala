package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.FeedSpiders

/** Golden battery for the XMLFeedSpider / CSVFeedSpider parsing core,
  * hard-coded from the reference's own spider tests
  * (`tests/test_spider.py` TestXMLFeedSpider.test_register_namespace and
  * TestCSVFeedSpider.test_parse_rows over
  * `tests/sample_data/feeds/feed-sample6.csv`). */
class FeedSpidersSpec extends AnyFunSuite {

  // `tests/sample_data/feeds/feed-sample6.csv` verbatim
  private val csvBody =
    ("'id','name','value'\n" +
      "1,'alpha','foobar'\n" +
      "2,'unicode','únícódé‽'\n" +
      "'3','multi','foo\nbar'\n" +
      "4,'empty',\n").getBytes("UTF-8")

  test("CSVFeedSpider parse_rows (test_parse_rows: delimiter=',' quotechar=''')") {
    val rows = FeedSpiders.csvRows(csvBody,
      delimiter = Some(','), quotechar = Some('\''))
    assert(rows.head === Map("id" -> "1", "name" -> "alpha", "value" -> "foobar"))
    assert(rows.size === 4)
    assert(rows(1)("value") === "únícódé‽")
    assert(rows(2)("value") === "foo\nbar") // quoted field spanning a newline
    assert(rows(3) === Map("id" -> "4", "name" -> "empty", "value" -> ""))
  }

  test("csviter: explicit headers keep the first row; short rows skipped") {
    val rows = FeedSpiders.csvRows("a,b\n1,2\nonlyone\n3,4\n".getBytes("UTF-8"),
      headers = Some(Seq("x", "y")))
    assert(rows === Seq(Map("x" -> "a", "y" -> "b"),
      Map("x" -> "1", "y" -> "2"), Map("x" -> "3", "y" -> "4")))
  }

  test("csv doubled-quote escape (CPython csv.reader)") {
    val rows = FeedSpiders.csvRows("h\n\"say \"\"hi\"\"\"\n".getBytes("UTF-8"))
    assert(rows === Seq(Map("h" -> "say \"hi\"")))
  }

  // `tests/test_spider.py:165-208` test_register_namespace body, verbatim
  private val xmlBody =
    ("""<?xml version="1.0" encoding="UTF-8"?>
      |        <urlset xmlns:x="http://www.google.com/schemas/sitemap/0.84"
      |                xmlns:y="http://www.example.com/schemas/extras/1.0">
      |        <url><x:loc>http://www.example.com/Special-Offers.html</x:loc><y:updated>2009-08-16</y:updated>
      |            <other value="bar" y:custom="fuu"/>
      |        </url>
      |        <url><loc>http://www.example.com/</loc><y:updated>2009-08-16</y:updated><other value="foo"/></url>
      |        </urlset>""").stripMargin.getBytes("UTF-8")

  private val ns = Map(
    "a" -> "http://www.google.com/schemas/sitemap/0.84",
    "b" -> "http://www.example.com/schemas/extras/1.0")

  test("XMLFeedSpider iternodes + registered namespaces (test_register_namespace)") {
    val nodes = FeedSpiders.xmlNodes(xmlBody, "url")
    assert(nodes.size === 2)
    val outputs = nodes.map { n =>
      Map(
        "loc" -> n.childTexts("a:loc", ns),
        "updated" -> n.childTexts("b:updated", ns),
        "other" -> n.childAttrs("other", "value"),
        "custom" -> n.childAttrs("other", "b:custom", ns))
    }
    assert(outputs === Seq(
      Map("loc" -> Seq("http://www.example.com/Special-Offers.html"),
        "updated" -> Seq("2009-08-16"),
        "other" -> Seq("bar"),
        "custom" -> Seq("fuu")),
      Map("loc" -> Nil, // un-namespaced <loc> must NOT match a:loc
        "updated" -> Seq("2009-08-16"),
        "other" -> Seq("foo"),
        "custom" -> Nil)))
  }

  test("blank lines yield [] like csv.reader; single-column CSV skips them (ADVICE r4)") {
    // CPython: csv.reader("a\n\nb\n,\n\n") → [['a'], [], ['b'], ['',''], []]
    // — blank lines yield [] and are dropped by the 1-column header filter,
    // while the ','-only line still yields ['','']
    assert(FeedSpiders.csvRows("a\n\nb\n,\n\n".getBytes("UTF-8"),
      headers = Some(Seq("h"))) === Seq(Map("h" -> "a"), Map("h" -> "b")))
    // single-column body: the blank interior line must NOT produce a row
    assert(FeedSpiders.csvRows("h\nx\n\ny\n".getBytes("UTF-8")) ===
      Seq(Map("h" -> "x"), Map("h" -> "y")))
  }

  test("itertag matching is namespace-exact; entities decode in text") {
    val body =
      ("""<feed xmlns="http://www.w3.org/2005/Atom"><entry><title>a &amp; b</title></entry></feed>""")
        .getBytes("UTF-8")
    // default-xmlns entries are NAMESPACED: plain itertag must not match...
    assert(FeedSpiders.xmlNodes(body, "entry").isEmpty)
    // ...until the namespace is given (xmliter_lxml's `namespace` param)
    val nodes = FeedSpiders.xmlNodes(body, "entry",
      namespace = Some("http://www.w3.org/2005/Atom"))
    assert(nodes.size === 1)
    assert(nodes.head.childTexts("t:title",
      Map("t" -> "http://www.w3.org/2005/Atom")) === Seq("a & b"))
  }
}
