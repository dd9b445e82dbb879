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

  // ---- goldens ported from `tests/test_utils_iterators.py` ----------------

  // `tests/sample_data/feeds/feed-sample3.csv` verbatim
  private val sample3 =
    "id,name,value\n1,alpha,foobar\n2,unicode,únícódé‽\n3,multi,\"foo\nbar\"\n4,empty,\n"
  private val sample3Rows = Seq(
    Map("id" -> "1", "name" -> "alpha", "value" -> "foobar"),
    Map("id" -> "2", "name" -> "unicode", "value" -> "únícódé‽"),
    Map("id" -> "3", "name" -> "multi", "value" -> "foo\nbar"),
    Map("id" -> "4", "name" -> "empty", "value" -> ""))

  test("csviter defaults (test_csviter_defaults, feed-sample3)") {
    assert(FeedSpiders.csvRows(sample3.getBytes("UTF-8")) === sample3Rows)
  }

  test("csviter delimiter (test_csviter_delimiter: tabs)") {
    assert(FeedSpiders.csvRows(sample3.replace(',', '\t').getBytes("UTF-8"),
      delimiter = Some('\t')) === sample3Rows)
  }

  test("csviter wrong quotechar keeps the quotes (test_csviter_wrong_quotechar)") {
    // feed-sample6 parsed with the DEFAULT '"' quotechar: the single quotes
    // stay literal, row 3's quoted field splits at the newline — its first
    // physical line still has 3 fields (kept, value "'foo") while the
    // "bar'" remainder has 1 field and is dropped by the header-length filter
    val rows = FeedSpiders.csvRows(csvBody)
    assert(rows === Seq(
      Map("'id'" -> "1", "'name'" -> "'alpha'", "'value'" -> "'foobar'"),
      Map("'id'" -> "2", "'name'" -> "'unicode'", "'value'" -> "'únícódé‽'"),
      Map("'id'" -> "'3'", "'name'" -> "'multi'", "'value'" -> "'foo"),
      Map("'id'" -> "4", "'name'" -> "'empty'", "'value'" -> "")))
  }

  test("csviter explicit headers over a headerless body (test_csviter_headers)") {
    val body = sample3.split('\n').drop(1).mkString("\n")
    assert(FeedSpiders.csvRows(body.getBytes("UTF-8"),
      headers = Some(Seq("id", "name", "value"))) === sample3Rows)
  }

  test("csviter skips rows with the wrong field count (test_csviter_falserow)") {
    val body = sample3 + "\na,b\na,b,c,d"
    assert(FeedSpiders.csvRows(body.getBytes("UTF-8")) === sample3Rows)
  }

  test("csviter explicit response encodings (test_csviter_encoding)") {
    // feed-sample4.csv: latin-1 body
    val body4 = "id,name,value\n1,latin1,test\n2,something,ñáéó\n"
      .getBytes("ISO-8859-1")
    assert(FeedSpiders.csvRows(body4, charset = Some("latin1")) === Seq(
      Map("id" -> "1", "name" -> "latin1", "value" -> "test"),
      Map("id" -> "2", "name" -> "something", "value" -> "ñáéó")))
    // feed-sample5.csv: cp852 body (box-drawing run, bytes hard-coded)
    val body5 = "id,name,value\n1,cp852,test\n2,something,".getBytes("UTF-8") ++
      Array(200, 202, 202, 202, 205, 205, 187).map(_.toByte) ++
      "\n".getBytes("UTF-8")
    assert(FeedSpiders.csvRows(body5, charset = Some("cp852")) === Seq(
      Map("id" -> "1", "name" -> "cp852", "value" -> "test"),
      Map("id" -> "2", "name" -> "something",
        "value" -> "╚╩╩╩══╗")))
  }

  private def attr(n: FeedSpiders.XmlNode, name: String): Option[String] =
    n.attributes.collectFirst { case (("", `name`), v) => v }

  test("xmliter products battery (test_xmliter)") {
    val body = ("""<?xml version="1.0" encoding="UTF-8"?>
      |<products xmlns:xsi="http://www.w3.org/2001/XMLSchema-instance"
      |          xsi:noNamespaceSchemaLocation="someschmea.xsd">
      |  <product id="001"><type>Type 1</type><name>Name 1</name></product>
      |  <product id="002"><type>Type 2</type><name>Name 2</name></product>
      |</products>""").stripMargin.getBytes("UTF-8")
    val attrs = FeedSpiders.xmlNodes(body, "product").map { x =>
      (attr(x, "id").get, x.childTexts("name"), x.childTexts("type"))
    }
    assert(attrs === Seq(
      ("001", Seq("Name 1"), Seq("Type 1")),
      ("002", Seq("Name 2"), Seq("Type 2"))))
  }

  test("xmliter unusual node name (test_xmliter_unusual_node)") {
    val body = ("""<?xml version="1.0" encoding="UTF-8"?>
      |<root><matchme...></matchme...><matchmenot></matchmenot></root>""")
      .stripMargin.getBytes("UTF-8")
    assert(FeedSpiders.xmlNodes(body, "matchme...").map(_.localName) ===
      Seq("matchme..."))
  }

  test("xmliter unicode tag names (test_xmliter_unicode, scrapy/#1665)") {
    val body = ("""<?xml version="1.0" encoding="UTF-8"?>
      |<þingflokkar>
      |  <þingflokkur id="26"><heiti />
      |    <skammstafanir><stuttskammstöfun>-</stuttskammstöfun><löngskammstöfun /></skammstafanir>
      |    <tímabil><fyrstaþing>80</fyrstaþing></tímabil>
      |  </þingflokkur>
      |  <þingflokkur id="21"><heiti>Alþýðubandalag</heiti>
      |    <skammstafanir><stuttskammstöfun>Ab</stuttskammstöfun><löngskammstöfun>Alþb.</löngskammstöfun></skammstafanir>
      |    <tímabil><fyrstaþing>76</fyrstaþing><síðastaþing>123</síðastaþing></tímabil>
      |  </þingflokkur>
      |  <þingflokkur id="27"><heiti>Alþýðuflokkur</heiti>
      |    <skammstafanir><stuttskammstöfun>A</stuttskammstöfun><löngskammstöfun>Alþfl.</löngskammstöfun></skammstafanir>
      |    <tímabil><fyrstaþing>27</fyrstaþing><síðastaþing>120</síðastaþing></tímabil>
      |  </þingflokkur>
      |</þingflokkar>""").stripMargin.getBytes("UTF-8")
    val attrs = FeedSpiders.xmlNodes(body, "þingflokkur").map { x =>
      (attr(x, "id").get,
        x.children.filter(_.localName == "skammstafanir")
          .flatMap(_.childTexts("stuttskammstöfun")),
        x.children.filter(_.localName == "tímabil")
          .flatMap(_.childTexts("fyrstaþing")))
    }
    assert(attrs === Seq(
      ("26", Seq("-"), Seq("80")),
      ("21", Seq("Ab"), Seq("76")),
      ("27", Seq("A"), Seq("27"))))
  }

  test("xmliter over a compact body (test_xmliter_text)") {
    val body = ("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<products><product>one</product><product>two</product></products>")
      .getBytes("UTF-8")
    assert(FeedSpiders.xmlNodes(body, "product").map(_.text) === Seq("one", "two"))
  }

  private val rssBody = ("""<?xml version="1.0" encoding="UTF-8"?>
    |<rss version="2.0" xmlns:g="http://base.google.com/ns/1.0">
    |  <channel>
    |  <title>My Dummy Company</title>
    |  <link>http://www.mydummycompany.com</link>
    |  <description>This is a dummy company. We do nothing.</description>
    |  <item>
    |    <title>Item 1</title>
    |    <description>This is item 1</description>
    |    <link>http://www.mydummycompany.com/items/1</link>
    |    <g:image_link>http://www.mydummycompany.com/images/item1.jpg</g:image_link>
    |    <g:id>ITEM_1</g:id>
    |    <g:price>400</g:price>
    |  </item>
    |  </channel>
    |</rss>""").stripMargin.getBytes("UTF-8")
  private val gNs = Map("g" -> "http://base.google.com/ns/1.0")

  test("xmliter registered namespaces (test_xmliter_namespaces)") {
    val node = FeedSpiders.xmlNodes(rssBody, "item").head
    assert(node.childTexts("title") === Seq("Item 1"))
    assert(node.childTexts("description") === Seq("This is item 1"))
    assert(node.childTexts("link") === Seq("http://www.mydummycompany.com/items/1"))
    assert(node.childTexts("g:image_link", gNs) ===
      Seq("http://www.mydummycompany.com/images/item1.jpg"))
    assert(node.childTexts("g:id", gNs) === Seq("ITEM_1"))
    assert(node.childTexts("g:price", gNs) === Seq("400"))
    // un-prefixed lookups must NOT see the namespaced children
    assert(node.childTexts("image_link") === Nil)
    assert(node.childTexts("id") === Nil)
    assert(node.childTexts("price") === Nil)
  }

  test("xmliter namespaced itertag (test_xmliter_namespaced_nodename ±missing)") {
    val nodes = FeedSpiders.xmlNodes(rssBody, "image_link",
      namespace = Some("http://base.google.com/ns/1.0"))
    assert(nodes.map(_.text) ===
      Seq("http://www.mydummycompany.com/images/item1.jpg"))
    assert(FeedSpiders.xmlNodes(rssBody, "link_image",
      namespace = Some("http://base.google.com/ns/1.0")).isEmpty)
  }

  test("xmliter honors the XML-declaration encoding (test_xmliter_encoding)") {
    val body = ("<?xml version=\"1.0\" encoding=\"ISO-8859-9\"?>\n<xml>\n" +
      "    <item>Some Turkish Characters ÖÇŞİĞÜ " +
      "üğışçö</item>\n</xml>\n\n")
      .getBytes("ISO-8859-9")
    assert(FeedSpiders.xmlNodes(body, "item").map(_.text) ===
      Seq("Some Turkish Characters ÖÇŞİĞÜ " +
        "üğışçö"))
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

  test("xmliter iterate_namespace: default-xmlns itertag needs the uri " +
    "(test_xmliter_iterate_namespace)") {
    val body = ("""<?xml version="1.0" encoding="UTF-8"?>
      |<rss version="2.0" xmlns="http://base.google.com/ns/1.0">
      |    <channel>
      |    <title>My Dummy Company</title>
      |    <link>http://www.mydummycompany.com</link>
      |    <description>This is a dummy company. We do nothing.</description>
      |    <item>
      |        <title>Item 1</title>
      |        <description>This is item 1</description>
      |        <link>http://www.mydummycompany.com/items/1</link>
      |        <image_link>http://www.mydummycompany.com/images/item1.jpg</image_link>
      |        <image_link>http://www.mydummycompany.com/images/item2.jpg</image_link>
      |    </item>
      |    </channel>
      |</rss>""").stripMargin.getBytes("UTF-8")
    assert(FeedSpiders.xmlNodes(body, "image_link").isEmpty)
    val nodes = FeedSpiders.xmlNodes(body, "image_link",
      namespace = Some("http://base.google.com/ns/1.0"))
    assert(nodes.map(_.text) === Seq(
      "http://www.mydummycompany.com/images/item1.jpg",
      "http://www.mydummycompany.com/images/item2.jpg"))
  }

  test("xmliter prefixed namespaces (test_xmliter_namespaces_prefix)") {
    val body = ("""<?xml version="1.0" encoding="UTF-8"?>
      |<root>
      |    <h:table xmlns:h="http://www.w3.org/TR/html4/">
      |      <h:tr>
      |        <h:td>Apples</h:td>
      |        <h:td>Bananas</h:td>
      |      </h:tr>
      |    </h:table>
      |
      |    <f:table xmlns:f="http://www.w3schools.com/furniture">
      |      <f:name>African Coffee Table</f:name>
      |      <f:width>80</f:width>
      |      <f:length>120</f:length>
      |    </f:table>
      |
      |</root>""").stripMargin.getBytes("UTF-8")
    val hUri = "http://www.w3.org/TR/html4/"
    val hTable = FeedSpiders.xmlNodes(body, "table", namespace = Some(hUri))
    assert(hTable.size === 1)
    val tr = hTable.head.children.filter(c => c.nsUri == hUri && c.localName == "tr")
    assert(tr.size === 1)
    val tds = tr.head.childTexts("h:td", Map("h" -> hUri))
    assert(tds === Seq("Apples", "Bananas"))
    val fUri = "http://www.w3schools.com/furniture"
    val fTable = FeedSpiders.xmlNodes(body, "table", namespace = Some(fUri))
    assert(fTable.size === 1)
    assert(fTable.head.childTexts("f:name", Map("f" -> fUri)) ===
      Seq("African Coffee Table"))
  }
}
