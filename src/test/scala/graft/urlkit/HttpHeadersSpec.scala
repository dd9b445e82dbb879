package graft.urlkit

import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference `tests/test_http_headers.py` battery against
  * [[HttpHeaders]] (case-insensitive multi-value headers). */
class HttpHeadersSpec extends AnyFunSuite {

  private def b(s: String): Seq[Byte] = s.getBytes("UTF-8").toSeq
  private def sv(l: Iterable[Array[Byte]]): Seq[Seq[Byte]] = l.map(_.toSeq).toSeq

  test("basics") {
    val h = new HttpHeaders(Seq("Content-Type" -> "text/html",
      "Content-Length" -> 1234))
    assert(h("Content-Type") != null)
    assert(h("Content-Length").toSeq === b("1234"))

    intercept[NoSuchElementException] { h("Accept") }
    assert(h.get("Accept") === null)
    assert(h.getlist("Accept").isEmpty)

    assert(h.get("Accept", "*/*").toSeq === b("*/*"))
    assert(sv(h.getlist("Accept", "*/*")) === Seq(b("*/*")))
    assert(sv(h.getlist("Accept", Seq("text/html", "images/jpeg"))) ===
      Seq(b("text/html"), b("images/jpeg")))
  }

  test("single value") {
    val h = new HttpHeaders()
    h.set("Content-Type", "text/html")
    assert(h("Content-Type").toSeq === b("text/html"))
    assert(h.get("Content-Type").toSeq === b("text/html"))
    assert(sv(h.getlist("Content-Type")) === Seq(b("text/html")))
  }

  test("multivalue") {
    val h = new HttpHeaders()
    val hlist = Seq("ip1", "ip2")
    h.set("X-Forwarded-For", hlist)
    assert(h("X-Forwarded-For").toSeq === b("ip2"))
    assert(h.get("X-Forwarded-For").toSeq === b("ip2"))
    assert(sv(h.getlist("X-Forwarded-For")) === Seq(b("ip1"), b("ip2")))
  }

  test("multivalue for one header via pair sequence") {
    val h = new HttpHeaders(Seq("a" -> "b", "a" -> "c"))
    assert(h("a").toSeq === b("c"))
    assert(h.get("a").toSeq === b("c"))
    assert(sv(h.getlist("a")) === Seq(b("b"), b("c")))
  }

  test("encoding utf-8 / latin1 / multiple") {
    val h = new HttpHeaders(Seq("key" -> "£"), "utf-8")
    assert(sv(h.getlist("key")) === Seq(Seq(0xc2.toByte, 0xa3.toByte)))
    val h2 = new HttpHeaders(Seq("key" -> "£"), "latin1")
    assert(sv(h2.getlist("key")) === Seq(Seq(0xa3.toByte)))
    val h3 = new HttpHeaders(Seq("key" -> Seq("£")), "utf-8")
    assert(sv(h3.getlist("key")) === Seq(Seq(0xc2.toByte, 0xa3.toByte)))
  }

  test("delete and contains") {
    val h = new HttpHeaders()
    h.set("Content-Type", "text/html")
    assert(h.contains("Content-Type"))
    assert(h.contains("content-type")) // caseless
    h.delete("content-TYPE")
    assert(!h.contains("Content-Type"))
  }

  test("setdefault returns the STORED list (aliasing semantics)") {
    val h = new HttpHeaders()
    val olist = h.setdefault("X-Forwarded-For", Seq("ip1", "ip2"))
    assert(h.getlist("X-Forwarded-For") eq olist)

    val h2 = new HttpHeaders()
    val olist2 = h2.setdefault("X-Forwarded-For", "ip1")
    assert(sv(h2.getlist("X-Forwarded-For")) === Seq(b("ip1")))
    assert(h2.getlist("X-Forwarded-For") eq olist2)
  }

  test("iterables: keys normalized, items/values shapes") {
    val h = new HttpHeaders(Seq("Content-Type" -> "text/html",
      "X-Forwarded-For" -> Seq("ip1", "ip2")))
    assert(h.keys.map(_.toSeq).sortBy(_.mkString) ===
      Seq(b("Content-Type"), b("X-Forwarded-For")).sortBy(_.mkString))
    assert(h.items.map { case (k, v) => (k.toSeq, sv(v)) }.toMap ===
      Map(b("Content-Type") -> Seq(b("text/html")),
          b("X-Forwarded-For") -> Seq(b("ip1"), b("ip2"))))
    assert(h.values.map(_.toSeq).toSet === Set(b("ip2"), b("text/html")))
  }

  test("update") {
    val h = new HttpHeaders()
    h.update(Seq("Content-Type" -> "text/html",
      "X-Forwarded-For" -> Seq("ip1", "ip2")))
    assert(sv(h.getlist("Content-Type")) === Seq(b("text/html")))
    assert(sv(h.getlist("X-Forwarded-For")) === Seq(b("ip1"), b("ip2")))
  }

  test("copy is deep for the value lists") {
    val h1 = new HttpHeaders(Seq("header1" -> Seq("value1", "value2")))
    val h2 = h1.copy()
    assert(h1 === h2)
    assert(sv(h1.getlist("header1")) === sv(h2.getlist("header1")))
    assert(!(h1.getlist("header1") eq h2.getlist("header1")))
  }

  test("appendlist") {
    val h1 = new HttpHeaders(Seq("header1" -> "value1"))
    h1.appendlist("header1", "value3")
    assert(sv(h1.getlist("header1")) === Seq(b("value1"), b("value3")))

    val h2 = new HttpHeaders()
    h2.appendlist("header1", "value1")
    h2.appendlist("header1", "value3")
    assert(sv(h2.getlist("header1")) === Seq(b("value1"), b("value3")))
  }

  test("setlist") {
    val h1 = new HttpHeaders(Seq("header1" -> "value1"))
    assert(sv(h1.getlist("header1")) === Seq(b("value1")))
    h1.setlist("header1", Seq("value2", "value3"))
    assert(sv(h1.getlist("header1")) === Seq(b("value2"), b("value3")))
  }

  test("setlistdefault") {
    val h1 = new HttpHeaders(Seq("header1" -> "value1"))
    h1.setlistdefault("header1", Seq("value2", "value3"))
    h1.setlistdefault("header2", Seq("value2", "value3"))
    assert(sv(h1.getlist("header1")) === Seq(b("value1")))
    assert(sv(h1.getlist("header2")) === Seq(b("value2"), b("value3")))
  }

  test("None value is an empty-list tombstone") {
    val h1 = new HttpHeaders()
    h1.set("foo", "bar")
    h1.set("foo", null)
    h1.setdefault("foo", "bar")
    assert(h1.get("foo") === null)
    assert(h1.getlist("foo").isEmpty)
  }

  test("int values stringify") {
    val h1 = new HttpHeaders(Seq("hey" -> 5))
    h1.set("foo", 1)
    h1.setdefault("bar", 2)
    h1.setlist("buz", Seq[Any](1, "dos", 3))
    assert(sv(h1.getlist("foo")) === Seq(b("1")))
    assert(sv(h1.getlist("bar")) === Seq(b("2")))
    assert(sv(h1.getlist("buz")) === Seq(b("1"), b("dos"), b("3")))
    assert(sv(h1.getlist("hey")) === Seq(b("5")))
  }

  test("invalid value types raise") {
    val o = new Object
    intercept[IllegalArgumentException] { new HttpHeaders(Seq("foo" -> o)) }
    intercept[IllegalArgumentException] { new HttpHeaders().set("foo", o) }
    intercept[IllegalArgumentException] { new HttpHeaders().setdefault("foo", o) }
    intercept[IllegalArgumentException] { new HttpHeaders().setlist("foo", Seq(o)) }
  }

  test("key normalization is Python str.title") {
    val h = new HttpHeaders()
    h.set("content-type", "a")
    assert(h.keys.map(_.toSeq) === Seq(b("Content-Type")))
    h.set("x-forwarded-for", "b")
    h.set("ACCEPT-encoding", "c")
    h.set("x2ab", "d")
    assert(h.keys.map(_.toSeq) === Seq(b("Content-Type"),
      b("X-Forwarded-For"), b("Accept-Encoding"), b("X2Ab")))
    assert(HttpHeaders.pyTitle("dnt") === "Dnt")
    assert(HttpHeaders.pyTitle("te9x t") === "Te9X T")
  }

  test("to_unicode_dict joins with comma; toWire renders CRLF lines") {
    val h = new HttpHeaders(Seq("Content-Type" -> "text/html",
      "X-Forwarded-For" -> Seq("ip1", "ip2")))
    assert(h.toUnicodeDict === Map("Content-Type" -> "text/html",
      "X-Forwarded-For" -> "ip1,ip2"))
    assert(new String(h.toWire, "UTF-8") ===
      "Content-Type: text/html\r\nX-Forwarded-For: ip1\r\nX-Forwarded-For: ip2")
  }
}
