package graft.urlkit

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** FormRequest / JsonRequest construction — scenario shapes from the
  * reference `tests/test_http_request.py` (FormRequest / from_response
  * batteries). */
class RequestsSpec extends AnyFunSuite {
  import Requests._

  test("POST formdata: urlencoded body, form content type, POST default") {
    val r = formRequest("http://www.example.com/", Seq(("one", "1"), ("two", "2")))
    assert(r.method === "POST")
    assert(new String(r.body, UTF_8) === "one=1&two=2")
    assert(r.headers("Content-Type") === "application/x-www-form-urlencoded")
  }

  test("GET formdata replaces the query string") {
    val r = formRequest("http://www.example.com/?old=gone", Seq(("a", "1"), ("b", "2")),
      method = "GET")
    assert(r.method === "GET")
    assert(r.url === "http://www.example.com/?a=1&b=2")
    assert(r.body.isEmpty)
  }

  test("urlencode quotes like quote_plus (spaces, unicode, specials)") {
    assert(urlencodeForm(Seq(("price", "£ 100"), ("q", "a b+c&d"))) ===
      "price=%C2%A3+100&q=a+b%2Bc%26d")
  }

  test("json request: body + default headers") {
    val r = jsonRequest("http://www.example.com/api", """{"a": 1}""")
    assert(new String(r.body, UTF_8) === """{"a": 1}""")
    assert(r.headers("Content-Type") === "application/json")
    assert(r.method === "POST")
  }

  test("from_response: hidden inputs, action join, first submit clicked") {
    val html =
      """<html><body>
        |<form action="post.php" method="POST">
        |  <input type="hidden" name="test" value="val1">
        |  <input type="hidden" name="test2" value="xxx">
        |  <input type="submit" name="button" value="submit">
        |</form></body></html>""".stripMargin
    val r = fromResponse(html, "http://www.example.com/this/page.html")
    assert(r.url === "http://www.example.com/this/post.php")
    assert(r.method === "POST")
    assert(new String(r.body, UTF_8) === "test=val1&test2=xxx&button=submit")
  }

  test("from_response: user formdata overrides form values; dont_click skips submit") {
    val html =
      """<form action="post.php" method="POST">
        |  <input type="hidden" name="test" value="val1">
        |  <input type="submit" name="button" value="submit">
        |</form>""".stripMargin
    val r = fromResponse(html, "http://h.test/", formdata = Seq(("test", "override")))
    assert(new String(r.body, UTF_8) === "button=submit&test=override")
    val r2 = fromResponse(html, "http://h.test/", dontClick = true)
    assert(new String(r2.body, UTF_8) === "test=val1")
  }

  test("from_response: checkbox/radio only when checked; textarea and select") {
    val html =
      """<form method="GET" action="/s">
        |  <input type="checkbox" name="c1" value="yes" checked>
        |  <input type="checkbox" name="c2" value="no">
        |  <input type="radio" name="r" value="a">
        |  <input type="radio" name="r" value="b" checked="checked">
        |  <textarea name="note">hello</textarea>
        |  <select name="pick"><option value="one">1</option>
        |    <option value="two" selected>2</option></select>
        |</form>""".stripMargin
    val r = fromResponse(html, "http://h.test/page")
    assert(r.method === "GET")
    assert(r.url === "http://h.test/s?c1=yes&r=b&note=hello&pick=two")
  }

  test("from_response: select without selected picks the first option") {
    val html =
      """<form action="/go"><select name="s">
        |<option value="first">x</option><option value="second">y</option>
        |</select></form>""".stripMargin
    val r = fromResponse(html, "http://h.test/")
    assert(r.url === "http://h.test/go?s=first")
  }

  test("from_response: formname / formid / formnumber selection, invalid method → GET") {
    val html =
      """<form action="/one"><input name="a" value="1"></form>
        |<form name="f2" id="i2" action="/two" method="DELETE"><input name="b" value="2"></form>""".stripMargin
    assert(fromResponse(html, "http://h.test/", formnumber = 1).url ===
      "http://h.test/two?b=2")
    assert(fromResponse(html, "http://h.test/", formname = "f2").url ===
      "http://h.test/two?b=2") // DELETE is not a valid form method → GET
    assert(fromResponse(html, "http://h.test/", formid = "i2").url ===
      "http://h.test/two?b=2")
    intercept[IllegalArgumentException] { fromResponse("<p>no forms</p>", "http://h.test/") }
    intercept[IndexOutOfBoundsException] {
      fromResponse(html, "http://h.test/", formnumber = 5)
    }
  }

  test("built requests fingerprint like hand-built ones (method+body significant)") {
    val post = formRequest("http://h.test/f", Seq(("a", "1")))
    val get = formRequest("http://h.test/f", Seq(("a", "1")), method = "GET")
    assert(UrlKit.toHex(post.fingerprint) !== UrlKit.toHex(get.fingerprint))
    assert(UrlKit.toHex(post.fingerprint) ===
      UrlKit.toHex(UrlKit.fingerprint("http://h.test/f", "POST", "a=1".getBytes(UTF_8))))
  }
}
