package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.urlkit.UrlKit

/** Schedule-time offsite middleware battery (contract 7h) — ports the
  * reference's `tests/test_downloadermiddleware_offsite.py` parametrized
  * suites onto the shared authority [[CrawlConfig.offsiteFiltered]] /
  * [[CrawlConfig.hostAllowed]]. A row is "filtered" when process_request
  * would raise IgnoreRequest (`downloadermiddlewares/offsite.py:47-66`).
  */
class OffsiteSpec extends AnyFunSuite {

  private def cfg(domains: String*): CrawlConfig =
    CrawlConfig(allowedDomains = domains)

  private def filtered(c: CrawlConfig, url: String,
      dontFilter: Boolean = false, allowOffsite: Boolean = false): Boolean =
    c.offsiteFiltered(UrlKit.hostOf(url), dontFilter, allowOffsite)

  test("test_process_request_domain_filtering rows") {
    // (allowed_domain, url, allowed)
    val rows = Seq(
      ("example.com", "http://example.com/1", true),
      ("example.com", "http://example.org/1", false),
      ("example.com", "http://sub.example.com/1", true),
      ("sub.example.com", "http://sub.example.com/1", true),
      ("sub.example.com", "http://example.com/1", false),
      ("example.com", "http://example.com:8000/1", true),
      ("example.com", "http://example.org/example.com", false),
      ("example.com", "http://example.org/foo.example.com", false),
      ("example.com", "http://example.com.example", false),
      ("a.example", "http://nota.example", false),
      ("b.a.example", "http://notb.a.example", false))
    for ((domain, url, allowed) <- rows)
      assert(filtered(cfg(domain), url) === !allowed, s"($domain, $url)")
  }

  test("test_process_request_dont_filter rows") {
    // (dont_filter value, filtered) — None/False are falsy, True bypasses
    val c = cfg("a.example")
    assert(filtered(c, "https://b.example", dontFilter = false))
    assert(!filtered(c, "https://b.example", dontFilter = true))
  }

  test("test_process_request_allow_offsite rows") {
    val c = cfg("a.example")
    // (allow_offsite, dont_filter, filtered)
    val rows = Seq(
      (true, false, false), (true, true, false),
      (false, false, true), (false, true, false))
    for ((ao, df, expect) <- rows)
      assert(filtered(c, "https://b.example", df, ao) === expect, s"($ao, $df)")
  }

  test("test_process_request_no_allowed_domains: empty list allows all") {
    assert(!filtered(CrawlConfig(), "https://example.com"))
    assert(!filtered(cfg(), "https://example.com"))
  }

  test("test_process_request_invalid_domains: URL/port entries never match") {
    val c = CrawlConfig(allowedDomains =
      Seq("a.example", null, "http:////b.example", "//c.example"))
    assert(!filtered(c, "https://a.example"))
    assert(filtered(c, "https://b.example"))
    // "//c.example" survives the cleaning but host "c.example" ≠ it
    assert(filtered(c, "https://c.example"))
  }

  test("port-carrying and URL-shaped entries are dropped from the allow list") {
    // get_host_regex warns and ignores these — they must not accidentally
    // allow (or block) anything
    val c = CrawlConfig(allowedDomains = Seq("a.example:8080", "http://b.example"))
    // ALL entries invalid → the degenerate regex matches no real host
    assert(filtered(c, "https://a.example"))
    assert(filtered(c, "https://b.example"))
  }

  test("no-hostname request under a non-empty allow list is filtered") {
    // should_follow uses `hostname or ""` — "" never matches a real domain
    assert(CrawlConfig(allowedDomains = Seq("a.example")).offsiteFiltered(
      "", dontFilter = false, allowOffsite = false))
    assert(CrawlConfig(allowedDomains = Seq("a.example")).offsiteFiltered(
      null, dontFilter = false, allowOffsite = false))
  }
}
