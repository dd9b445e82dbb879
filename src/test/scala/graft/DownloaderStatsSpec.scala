package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DownloaderStats

/** Golden battery for the DownloaderStats byte formulas (contract 6h).
  *
  * Every expected value below was computed with CPython 3.12 running the
  * reference formulas verbatim: `request_httprepr` from
  * `scrapy/utils/request.py:126-140` (stdlib urlparse/urlunparse, UTF-8
  * byte lengths, GET + empty body) and `get_header_size` /
  * `get_status_size` from `scrapy/downloadermiddlewares/stats.py:21-38`
  * (incl. the header-size formula's -2 for an empty header set and
  * `http.HTTPStatus`'s exact status phrases).
  */
class DownloaderStatsSpec extends AnyFunSuite {

  private val UA = "graft/1.0 (+local)"

  test("request_httprepr lengths match CPython (default header set)") {
    // (url, referer, cookies, auth) -> len(request_httprepr) with the
    // default Accept/Accept-Language/User-Agent/Accept-Encoding headers
    val cases = Seq(
      ("http://h0.example/", null, null, null, 200L),
      ("http://h0.example/p/1?a=1&b=2", null, null, null, 211L),
      ("https://h3.example:8443/x;pp?q=1", null, null, null, 208L), // Host has no port; ;params kept
      ("http://h1.example/p/2", "http://h1.example/", "sid=abc; t=9", null, 254L),
      ("http://h2.example/p/3", null, null, "Basic dXNlcjpwYXNz", 238L),
      ("data:text/html;base64,PGEgaHJlZj0iL2EiPmE8L2E+", null, null, null, 230L), // empty Host, data opaque in path;params
      ("file:///tmp/corpus/a.html", null, null, null, 207L),
      ("http://xn--nxasmq6b.example/café", null, null, null, 215L), // UTF-8 path bytes
      ("http://h0.example", null, null, null, 200L)) // empty path -> "/"
    for ((url, ref, ck, auth, want) <- cases)
      assert(DownloaderStats.requestBytes(url, ref, ck, UA, auth) === want,
        s"request bytes for $url")
  }

  test("POST request_httprepr adds method byte, Content-Type and the body (7g)") {
    // request_httprepr of a FormRequest POST differs from the GET of the
    // same URL by exactly: +1 method byte ("POST" vs "GET"), the
    // Content-Type header the FormRequest sets (`form.py:53-57`;
    // 2 + len("Content-Type") + len("application/x-www-form-urlencoded")
    // = 47 plus the header-join's +2 for one more key) and the body bytes
    // appended verbatim (`utils/request.py:139`)
    val url = "http://h1.test/p/3"
    val body = "q=find+7&tok=tk1-7&opt=on&go=1" // 30 ASCII bytes
    val get = DownloaderStats.requestBytes(url, null, null, UA, null)
    val post = DownloaderStats.requestBytes(url, "POST", body, null, null, UA, null)
    assert(post === get + 1 + 47 + 2 + 30)
    // a 302/303-converted request is a plain GET again: empty body, no
    // Content-Type (`_redirect_request_using_get` pops it)
    assert(DownloaderStats.requestBytes(url, "GET", "", null, null, UA, null)
      === get)
    // a POST with an EMPTY body carries no Content-Type (formdata absent →
    // FormRequest never set it): only the method byte differs
    assert(DownloaderStats.requestBytes(url, "POST", "", null, null, UA, null)
      === get + 1)
  }

  test("get_header_size matches CPython, including the empty-set -2") {
    assert(DownloaderStats.headerSize(Nil) === -2)
    assert(DownloaderStats.headerSize(Seq("Set-Cookie" -> "a=1; Path=/")) === 23)
    assert(DownloaderStats.headerSize(Seq(
      "Location" -> "http://h1.example/p/0",
      "Cache-Control" -> "max-age=60")) === 58)
    assert(DownloaderStats.headerSize(Seq(
      "Content-Encoding" -> "gzip",
      "Referrer-Policy" -> "no-referrer",
      "Set-Cookie" -> "s=2; Secure",
      "Cache-Control" -> "no-store",
      "Location" -> "/x")) === 116)
  }

  test("get_status_size matches CPython http.HTTPStatus phrases") {
    val cases = Seq(200 -> 17, 204 -> 25, 301 -> 32, 302 -> 20, 303 -> 24,
      307 -> 33, 308 -> 33, 404 -> 24, 418 -> 27, 429 -> 32, 500 -> 36,
      503 -> 34, 599 -> 15) // 599: ValueError in CPython -> bare 15
    for ((st, want) <- cases)
      assert(DownloaderStats.statusSize(st) === want, s"status $st")
  }

  test("response bytes compose body + headers + status + 4") {
    // a header-less 200 with a 100-byte body: 100 - 2 + 17 + 4
    assert(DownloaderStats.responseBytes(200, 100L, Nil) === 119L)
    // corpus-miss 404 (no body, no headers): 0 - 2 + 24 + 4
    assert(DownloaderStats.responseBytes(404, 0L, Nil) === 26L)
    // a 302 with Location + Set-Cookie
    val hdrs = DownloaderStats.responseHeaders("http://h1.example/p/0", null,
      null, "a=1; Path=/", null)
    assert(hdrs === Seq("Location" -> "http://h1.example/p/0",
      "Set-Cookie" -> "a=1; Path=/"))
    assert(DownloaderStats.responseBytes(302, 10L, hdrs) ===
      10L + (2 + 8 + 21) + (2 + 10 + 11) + 2 + 20 + 4)
  }
}
