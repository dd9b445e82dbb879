package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LogFormat

/** Ports `tests/test_logformatter.py` — the rendered `msg % args` lines the
  * reference asserts, byte-for-byte. */
class LogFormatSpec extends AnyFunSuite {

  test("test_crawled_with_referer") {
    assert(LogFormat.crawled(200, "GET", "http://www.example.com", null) ===
      "Crawled (200) <GET http://www.example.com> (referer: None)")
  }

  test("test_crawled_without_referer (cached response flag)") {
    assert(LogFormat.crawled(200, "GET", "http://www.example.com",
      "http://example.com", responseFlags = Seq("cached")) ===
      "Crawled (200) <GET http://www.example.com> " +
        "(referer: http://example.com) ['cached']")
  }

  test("test_flags_in_request") {
    assert(LogFormat.crawled(200, "GET", "http://www.example.com", null,
      requestFlags = Seq("test", "flag")) ===
      "Crawled (200) <GET http://www.example.com> ['test', 'flag'] " +
        "(referer: None)")
  }

  test("test_dropped") {
    // the exception message is the non-ASCII '‘' — lines stay str
    assert(LogFormat.dropped("‘", "{}").split("\n").toSeq ===
      Seq("Dropped: ‘", "{}"))
  }

  test("test_item_error") {
    assert(LogFormat.itemError("{'key': 'value'}") ===
      "Error processing {'key': 'value'}")
  }

  test("test_spider_error") {
    assert(LogFormat.spiderError("GET", "http://www.example.com",
      "http://example.org") ===
      "Spider error processing <GET http://www.example.com> " +
        "(referer: http://example.org)")
  }

  test("test_download_error_short") {
    assert(LogFormat.downloadError("GET", "http://www.example.com") ===
      "Error downloading <GET http://www.example.com>")
  }

  test("test_download_error_long") {
    assert(LogFormat.downloadError("GET", "http://www.example.com",
      "Some message") ===
      "Error downloading <GET http://www.example.com>: Some message")
  }

  test("test_scraped (non-ASCII item repr)") {
    assert(LogFormat.scraped("name: £", 200,
      "http://www.example.com").split("\n").toSeq ===
      Seq("Scraped from <200 http://www.example.com>", "name: £"))
  }

  test("fetchLogLine: 599 is a download error, cache hits carry ['cached']") {
    assert(LogFormat.fetchLogLine(599, "GET", "http://h.test/p/0", null,
      cached = false) === "Error downloading <GET http://h.test/p/0>")
    assert(LogFormat.fetchLogLine(200, "POST", "http://h.test/p/0",
      "http://h.test/", cached = true) ===
      "Crawled (200) <POST http://h.test/p/0> (referer: http://h.test/) " +
        "['cached']")
  }

  test("flagsRepr is the CPython str(list): single quotes, repr escapes") {
    assert(LogFormat.flagsRepr(Seq("cached")) === "['cached']")
    assert(LogFormat.flagsRepr(Seq("a'b")) === "[\"a'b\"]") // repr quote flip
    assert(LogFormat.flagsRepr(Nil) === "[]")
  }
}
