package graft.urlkit

import org.scalatest.funsuite.AnyFunSuite
import graft.urlkit.UrlKit.{redirectSchemeOk, redirectTarget, safeUrlString}

/** RedirectMiddleware Location-resolution goldens — expected values from
  * the reference's `tests/test_downloadermiddleware_redirect.py`
  * (`test_redirect_schemes` parameter matrix + `test_redirect_302_relative`)
  * over `redirect.py:163-173`. */
class RedirectResolutionSpec extends AnyFunSuite {

  private def resolve(url: String, location: String): Option[String] = {
    val t = safeUrlString(redirectTarget(url, location))
    if (redirectSchemeOk(t)) Some(t) else None
  }

  test("http/https absolute targets redirect verbatim") {
    for (in <- Seq("http", "https"); out <- Seq("http", "https"))
      assert(resolve(s"$in://example.com/a", s"$out://example.com/b") ===
        Some(s"$out://example.com/b"), s"$in -> $out")
  }

  test("non-http(s) targets do not redirect (data/file/ftp/s3/foo)") {
    for (in <- Seq("http", "https");
         out <- Seq("data", "file", "ftp", "s3", "foo"))
      assert(resolve(s"$in://example.com/a", s"$out://example.com/b") === None,
        s"$in -> $out")
  }

  test("path-relative and network-path-relative Locations") {
    for (scheme <- Seq("http", "https")) {
      assert(resolve(s"$scheme://example.com/a", "/b") ===
        Some(s"$scheme://example.com/b"))
      assert(resolve(s"$scheme://example.com/a", "//example.com/b") ===
        Some(s"$scheme://example.com/b"))
    }
  }

  test("triple-slash Location is scheme-relative, NOT a path on the host") {
    // test_redirect_302_relative: '///i8n.example2.com/302' from
    // 'http://www.example.com/302' → 'http://i8n.example2.com/302'
    assert(resolve("http://www.example.com/302", "///i8n.example2.com/302") ===
      Some("http://i8n.example2.com/302"))
  }

  test("scheme-relative Location to another host keeps the request scheme") {
    assert(resolve("https://a.example/x", "//b.example/y") ===
      Some("https://b.example/y"))
  }

  test("non-ascii Location percent-encodes as UTF-8 (test_utf8_location)") {
    assert(resolve("http://scrapytest.org/first", "/ação") ===
      Some("http://scrapytest.org/a%C3%A7%C3%A3o"))
  }
}
