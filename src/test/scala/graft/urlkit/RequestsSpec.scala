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

  // ==== from_response golden battery — expected values derived from the
  // reference `tests/test_http_request.py` FormRequest tests (the reference
  // asserts parsed query-sets; these pin the exact document-order encoding
  // the same pipeline produces) ============================================

  /** The formdata pairs wherever the method put them: POST body or GET
    * query (the reference `_qs(req)` helper does the same). */
  private def body(r: Requests.BuiltRequest): String =
    if (r.method == "POST") new String(r.body, UTF_8)
    else {
      val q = r.url.indexOf('?')
      if (q < 0) "" else r.url.substring(q + 1)
    }

  test("golden test_from_response_post: duplicate keys + multi-valued formdata") {
    val html =
      """<form action="post.php" method="POST">
        |<input type="hidden" name="test" value="val1">
        |<input type="hidden" name="test" value="val2">
        |<input type="hidden" name="test2" value="xxx">
        |</form>""".stripMargin
    val r = fromResponse(html, "http://www.example.com/this/list.html",
      formdata = Seq(("one", "two"), ("one", "three"), ("six", "seven")))
    assert(r.method === "POST")
    assert(r.url === "http://www.example.com/this/post.php")
    assert(body(r) === "test=val1&test=val2&test2=xxx&one=two&one=three&six=seven")
  }

  test("golden nonascii utf8 + latin1: names/values encoded in the page encoding") {
    val html =
      """<form action="post.php" method="POST">
        |<input type="hidden" name="test £" value="val1">
        |<input type="hidden" name="test2" value="xxx µ">
        |</form>""".stripMargin
    val r8 = fromResponse(html, "http://www.example.com/this/list.html")
    assert(body(r8) === "test+%C2%A3=val1&test2=xxx+%C2%B5")
    val r1 = fromResponse(html, "http://www.example.com/this/list.html",
      encoding = java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(body(r1) === "test+%A3=val1&test2=xxx+%B5")
  }

  test("golden duplicate_form_key: empty form, GET override, pair-list formdata") {
    val r = fromResponse("<form></form>", "http://www.example.com",
      method = "GET", formdata = Seq(("foo", "bar"), ("foo", "baz")))
    assert(r.url === "http://www.example.com?foo=bar&foo=baz")
  }

  test("golden override_duplicate_form_key: override replaces, extras append") {
    val html =
      """<form action="get.php" method="POST">
        |<input type="hidden" name="one" value="1">
        |<input type="hidden" name="two" value="3">
        |</form>""".stripMargin
    val r = fromResponse(html, "http://example.com",
      formdata = Seq(("two", "2"), ("two", "4")))
    assert(body(r) === "one=1&two=2&two=4")
  }

  test("golden drop_params: null formdata value drops the key") {
    val html =
      """<form action="get.php" method="POST">
        |<input type="hidden" name="one" value="1">
        |<input type="hidden" name="two" value="3">
        |</form>""".stripMargin
    val r = fromResponse(html, "http://example.com",
      formdata = Seq(("two", null)))
    assert(body(r) === "one=1")
  }

  test("golden override_method and override_url") {
    val html = """<html><body><form action="/app"></form></body></html>"""
    assert(fromResponse(html, "http://example.com").method === "GET")
    assert(fromResponse(html, "http://example.com", method = "POST").method === "POST")
    assert(fromResponse(html, "http://example.com").url === "http://example.com/app")
    assert(fromResponse(html, "http://example.com", url = "http://foo.bar/absolute").url ===
      "http://foo.bar/absolute")
    assert(fromResponse(html, "http://example.com", url = "/relative").url ===
      "http://example.com/relative")
  }

  test("golden case_insensitive: SuBmIt clicks, iMaGe excluded from values") {
    val html =
      """<form action="get.php" method="GET">
        |<input type="SuBmIt" name="clickable1" value="clicked1">
        |<input type="iMaGe" name="i1" src="http://my.image.org/1.jpg">
        |<input type="submit" name="clickable2" value="clicked2">
        |</form>""".stripMargin
    val r = fromResponse(html, "http://example.com")
    assert(r.url === "http://example.com/get.php?clickable1=clicked1")
  }

  test("golden submit_first_clickable vs clickdata name targeting") {
    val html =
      """<form action="get.php" method="GET">
        |<input type="submit" name="clickable1" value="clicked1">
        |<input type="hidden" name="one" value="1">
        |<input type="hidden" name="two" value="3">
        |<input type="submit" name="clickable2" value="clicked2">
        |</form>""".stripMargin
    val r1 = fromResponse(html, "http://example.com", formdata = Seq(("two", "2")))
    assert(r1.url === "http://example.com/get.php?one=1&clickable1=clicked1&two=2")
    val r2 = fromResponse(html, "http://example.com", formdata = Seq(("two", "2")),
      clickdata = Seq(("name", "clickable2")))
    assert(r2.url === "http://example.com/get.php?one=1&clickable2=clicked2&two=2")
    val r3 = fromResponse(html, "http://example.com", dontClick = true)
    assert(r3.url === "http://example.com/get.php?one=1&two=3")
  }

  test("golden image/reset handling and clickdata-does-not-ignore-image") {
    val r1 = fromResponse(
      """<form>
        |<input type="hidden" name="i1" value="i1v">
        |<input type="image" name="i2" src="http://my.image.org/1.jpg">
        |<input type="submit" name="i3" value="i3v">
        |</form>""".stripMargin, "http://example.com", dontClick = true)
    assert(body(r1) === "i1=i1v")
    val r2 = fromResponse(
      """<form>
        |<input type="hidden" name="i1" value="i1v">
        |<input type="text" name="i2" value="i2v">
        |<input type="reset" name="resetme">
        |<input type="submit" name="i3" value="i3v">
        |</form>""".stripMargin, "http://example.com", dontClick = true)
    assert(body(r2) === "i1=i1v&i2=i2v")
    val r3 = fromResponse(
      """<form>
        |<input type="text" name="i1" value="i1v">
        |<input id="image" name="i2" type="image" value="i2v" alt="Login" src="http://my.image.org/1.jpg">
        |</form>""".stripMargin, "http://example.com")
    assert(body(r3) === "i1=i1v&i2=i2v")
  }

  test("golden multiple_clickdata / ambiguous / non-matching / nr index") {
    val html =
      """<form action="get.php" method="GET">
        |<input type="submit" name="clickable" value="clicked1">
        |<input type="submit" name="clickable" value="clicked2">
        |<input type="hidden" name="one" value="clicked1">
        |<input type="hidden" name="two" value="clicked2">
        |</form>""".stripMargin
    val r = fromResponse(html, "http://example.com",
      clickdata = Seq(("name", "clickable"), ("value", "clicked2")))
    assert(r.url === "http://example.com/get.php?one=clicked1&two=clicked2&clickable=clicked2")
    intercept[IllegalArgumentException] {
      fromResponse(html, "http://example.com", clickdata = Seq(("type", "submit")))
    }
    intercept[IllegalArgumentException] {
      fromResponse(html, "http://example.com", clickdata = Seq(("nonexistent", "notme")))
    }
    val nr = fromResponse(
      """<form>
        |<input type="submit" name="clickable1" value="clicked1">
        |<input type="submit" name="clickable2" value="clicked2">
        |</form>""".stripMargin, "http://example.com", clickdata = Seq(("nr", "1")))
    assert(body(nr) === "clickable2=clicked2")
    intercept[IllegalArgumentException] { // out-of-range nr → no-match error
      fromResponse(
        """<form><input type="submit" name="clickable" value="clicked"></form>""",
        "http://example.com", clickdata = Seq(("nr", "1")))
    }
  }

  test("golden invalid_html5 recovery: stray </html> before the form") {
    val html = """<!DOCTYPE html><body></html><form>""" +
      """<input type="text" name="foo" value="xxx">""" +
      """</form></body></html>"""
    val r = fromResponse(html, "http://example.com", formdata = Seq(("bar", "buz")))
    assert(body(r) === "foo=xxx&bar=buz")
  }

  test("golden formname/formid fallback rules") {
    val html =
      """<form name="form1" action="post.php" method="POST">
        |<input type="hidden" name="one" value="1">
        |</form>
        |<form id="form2" name="form2" action="post.php" method="POST">
        |<input type="hidden" name="two" value="2">
        |</form>""".stripMargin
    // nonexistent name falls back to formnumber 0
    assert(body(fromResponse(html, "http://example.com", formname = "form3")) === "one=1")
    // nonexistent name falls back to formid
    assert(body(fromResponse(html, "http://example.com",
      formname = "form3", formid = "form2")) === "two=2")
    // nonexistent id falls back to formnumber
    assert(body(fromResponse(html, "http://example.com", formid = "form3")) === "one=1")
    // ... and an out-of-range formnumber still errors
    intercept[IndexOutOfBoundsException] {
      fromResponse(html, "http://example.com", formname = "form3", formnumber = 2)
    }
  }

  test("golden select battery: selected/first/nameless/multiple/empty") {
    val html =
      """<form>
        |<select name="i1">
        |  <option value="i1v1">option 1</option>
        |  <option value="i1v2" selected>option 2</option>
        |</select>
        |<select name="i2">
        |  <option value="i2v1">option 1</option>
        |  <option value="i2v2">option 2</option>
        |</select>
        |<select>
        |  <option value="i3v1">option 1</option>
        |</select>
        |<select name="i4" multiple>
        |  <option value="i4v1">option 1</option>
        |  <option value="i4v2" selected>option 2</option>
        |  <option value="i4v3" selected>option 3</option>
        |</select>
        |<select name="i5" multiple>
        |  <option value="i5v1">option 1</option>
        |</select>
        |<select name="i6"></select>
        |<select name="i7"/>
        |</form>""".stripMargin
    val r = fromResponse(html, "http://example.com")
    assert(body(r) === "i1=i1v2&i2=i2v1&i4=i4v2&i4=i4v3")
  }

  test("golden radio/checkbox: checked-only, value defaults to 'on', nameless skipped") {
    for (t <- Seq("radio", "checkbox")) {
      val html =
        s"""<form>
           |<input type="$t" name="i1" value="i1v1">
           |<input type="$t" name="i1" value="iv2" checked>
           |<input type="$t" name="i2" checked>
           |<input type="$t" name="i2">
           |<input type="$t" name="i3" value="i3v1">
           |<input type="$t" value="i4v1">
           |<input type="$t">
           |</form>""".stripMargin
      assert(body(fromResponse(html, "http://example.com")) === "i1=iv2&i2=on")
    }
  }

  test("golden input text/hidden: missing value → empty, nameless skipped, no type → text") {
    val r1 = fromResponse(
      """<form>
        |<input type="text" name="i1" value="i1v1">
        |<input type="text" name="i2">
        |<input type="text" value="i3v1">
        |<input type="text">
        |<input name="i4" value="i4v1">
        |</form>""".stripMargin, "http://example.com")
    assert(body(r1) === "i1=i1v1&i2=&i4=i4v1")
    val r2 = fromResponse(
      """<form>
        |<input type="hidden" name="i1" value="i1v1">
        |<input type="hidden" name="i2">
        |<input type="hidden" value="i3v1">
        |<input type="hidden">
        |</form>""".stripMargin, "http://example.com")
    assert(body(r2) === "i1=i1v1&i2=")
  }

  test("golden textarea battery: content, empty, self-closed, nameless") {
    val r = fromResponse(
      """<form>
        |<textarea name="i1">i1v</textarea>
        |<textarea name="i2"></textarea>
        |<textarea name="i3"/>
        |<textarea>i4v</textarea>
        |</form>""".stripMargin, "http://example.com")
    assert(body(r) === "i1=i1v&i2=&i3=")
  }

  test("golden descendants: controls found at any nesting depth, document order") {
    val r = fromResponse(
      """<form>
        |<div>
        |  <fieldset>
        |    <input type="text" name="i1">
        |    <select name="i2">
        |        <option value="v1" selected>
        |    </select>
        |  </fieldset>
        |  <input type="radio" name="i3" value="i3v2" checked>
        |  <input type="checkbox" name="i4" value="i4v2" checked>
        |  <textarea name="i5"></textarea>
        |  <input type="hidden" name="h1" value="h1v">
        |  </div>
        |<input type="hidden" name="h2" value="h2v">
        |</form>""".stripMargin, "http://example.com")
    assert(body(r) === "i1=&i2=v1&i3=i3v2&i4=i4v2&i5=&h1=h1v&h2=h2v")
  }

  test("golden formxpath/formcss: direct match, walk-up from inner node, no-match error") {
    val html =
      """<form action="post.php" method="POST">
        |<input type="hidden" name="one" value="1">
        |<input type="hidden" name="two" value="2">
        |</form>
        |<form action="post2.php" method="POST">
        |<input type="hidden" name="three" value="3">
        |<input type="hidden" name="four" value="4">
        |</form>""".stripMargin
    assert(body(fromResponse(html, "http://example.com",
      formxpath = "//form[@action='post.php']")) === "one=1&two=2")
    assert(body(fromResponse(html, "http://example.com",
      formxpath = "//form/input[@name='four']")) === "three=3&four=4")
    val e = intercept[IllegalArgumentException] {
      fromResponse(html, "http://example.com",
        formxpath = "//form/input[@name='abc']")
    }
    assert(e.getMessage.contains("//form/input[@name='abc']"))
    assert(body(fromResponse(html, "http://example.com",
      formcss = "form[action='post.php']")) === "one=1&two=2")
    assert(body(fromResponse(html, "http://example.com",
      formcss = "input[name='four']")) === "three=3&four=4")
    intercept[IllegalArgumentException] {
      fromResponse(html, "http://example.com", formcss = "input[name='abc']")
    }
  }

  test("golden button submit / no-type / no-value clickables") {
    def form(button: String) =
      s"""<form action="post.php" method="POST">
         |<input type="hidden" name="test1" value="val1">
         |<input type="hidden" name="test2" value="val2">
         |$button
         |</form>""".stripMargin
    val url = "http://www.example.com/this/list.html"
    val r1 = fromResponse(form(
      """<button type="submit" name="button1" value="submit1">Submit</button>"""), url)
    assert(r1.url === "http://www.example.com/this/post.php")
    assert(body(r1) === "test1=val1&test2=val2&button1=submit1")
    val r2 = fromResponse(form(
      """<button name="button1" value="submit1">Submit</button>"""), url)
    assert(body(r2) === "test1=val1&test2=val2&button1=submit1")
    val r3 = fromResponse(form("""<input type="submit" name="button1">"""), url)
    assert(body(r3) === "test1=val1&test2=val2&button1=")
    val r4 = fromResponse(form(
      """<button type="submit" name="button1">Submit</button>"""), url)
    assert(body(r4) === "test1=val1&test2=val2&button1=")
  }

  test("golden base-href action resolution and html5-whitespace in action") {
    val withBase =
      """<html><head><base href=" http://b.com/"></head>
        |<body><form action="test_form"></form></body></html>""".stripMargin
    assert(fromResponse(withBase, "http://a.com/").url === "http://b.com/test_form")
    val spaces = "<body><form action=\" path\n\"></form></body>"
    assert(fromResponse(spaces, "http://example.com").url === "http://example.com/path")
  }

  test("golden valid_form_methods: GET/POST pass, anything else → GET") {
    for ((m, expected) <- Seq(("GET", "GET"), ("POST", "POST"), ("UNKNOWN", "GET"))) {
      val r = fromResponse(
        s"""<form action="post.php" method="$m"><input type="hidden" name="one" value="1"></form>""",
        "http://example.com")
      assert(r.method === expected, s"method=$m")
    }
  }

  test("golden multiple_forms_clickdata: clickdata scoped to the selected form") {
    val html =
      """<form name="form1">
        |<input type="submit" name="clickable" value="clicked1">
        |<input type="hidden" name="field1" value="value1">
        |</form>
        |<form name="form2">
        |<input type="submit" name="clickable" value="clicked2">
        |<input type="hidden" name="field2" value="value2">
        |</form>""".stripMargin
    val r = fromResponse(html, "http://example.com", formname = "form2",
      clickdata = Seq(("name", "clickable")))
    assert(body(r) === "field2=value2&clickable=clicked2")
  }

  test("golden override_clickable: formdata wins over the clicked element") {
    val r = fromResponse(
      """<form><input type="submit" name="clickme" value="one"> </form>""",
      "http://example.com", formdata = Seq(("clickme", "two")),
      clickdata = Seq(("name", "clickme")))
    assert(body(r) === "clickme=two")
  }

  test("built requests fingerprint like hand-built ones (method+body significant)") {
    val post = formRequest("http://h.test/f", Seq(("a", "1")))
    val get = formRequest("http://h.test/f", Seq(("a", "1")), method = "GET")
    assert(UrlKit.toHex(post.fingerprint) !== UrlKit.toHex(get.fingerprint))
    assert(UrlKit.toHex(post.fingerprint) ===
      UrlKit.toHex(UrlKit.fingerprint("http://h.test/f", "POST", "a=1".getBytes(UTF_8))))
  }
}
