package graft

import org.scalatest.funsuite.AnyFunSuite

/** Request-header middleware analogues (CrawlConfig step 6a + 1a helpers):
  * HTTP Basic auth, proxy routing, UA fallback, DOWNLOAD_SLOTS resolution.
  * Scenarios mirror the reference middleware tests
  * (`tests/test_downloadermiddleware_httpauth.py`,
  * `tests/test_downloadermiddleware_httpproxy.py`,
  * `tests/test_downloadermiddleware_robotstxt.py`). */
class HeadersSpec extends AnyFunSuite {

  // ---- HttpAuthMiddleware analogue (`httpauth.py:36-53`) -------------------
  test("basic auth header matches the reference golden (foo:bar)") {
    val cfg = CrawlConfig(httpUser = "foo", httpPass = "bar",
      httpAuthDomain = "example.com")
    // w3lib basic_auth_header('foo','bar') == b'Basic Zm9vOmJhcg=='
    assert(cfg.authorizationFor("example.com") === "Basic Zm9vOmJhcg==")
  }

  test("auth domain scoping: exact host, subdomain yes; other host no") {
    val cfg = CrawlConfig(httpUser = "u", httpPass = "p",
      httpAuthDomain = "example.com")
    assert(cfg.authorizationFor("example.com") != null)
    assert(cfg.authorizationFor("sub.example.com") != null)
    assert(cfg.authorizationFor("example.org") === null)
    assert(cfg.authorizationFor("notexample.com") === null) // suffix, not subdomain
  }

  test("null auth domain sends auth to every host (legacy mode)") {
    val cfg = CrawlConfig(httpUser = "u", httpPass = "p")
    assert(cfg.authorizationFor("anything.test") != null)
  }

  test("no credentials -> no Authorization header") {
    assert(CrawlConfig().authorizationFor("example.com") === null)
    // user-only / pass-only still produce a header (reference `usr or pwd`)
    assert(CrawlConfig(httpUser = "u").authorizationFor("h.test") ===
      "Basic " + java.util.Base64.getEncoder.encodeToString("u:".getBytes))
    assert(CrawlConfig(httpPass = "p").authorizationFor("h.test") ===
      "Basic " + java.util.Base64.getEncoder.encodeToString(":p".getBytes))
  }

  test("credentials encode as ISO-8859-1 (w3lib basic_auth_header default)") {
    val cfg = CrawlConfig(httpUser = "mü", httpPass = "p")
    val expected = "Basic " + java.util.Base64.getEncoder.encodeToString(
      "mü:p".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(cfg.authorizationFor("h.test") === expected)
  }

  // ---- HttpProxyMiddleware analogue (`httpproxy.py:45-106`) ----------------
  test("proxy picked per scheme; noProxy suffixes bypass") {
    val cfg = CrawlConfig(
      proxies = Map("http" -> "http://proxy:3128", "https" -> "http://sproxy:3128"),
      noProxy = Seq("internal.test"))
    assert(cfg.proxyFor("http", "h.test") === "http://proxy:3128")
    assert(cfg.proxyFor("https", "h.test") === "http://sproxy:3128")
    assert(cfg.proxyFor("ftp", "h.test") === null) // no proxy for the scheme
    assert(cfg.proxyFor("http", "internal.test") === null) // exact bypass
    assert(cfg.proxyFor("http", "svc.internal.test") === null) // suffix bypass
    assert(cfg.proxyFor("http", "notinternal.test") === "http://proxy:3128")
  }

  // ---- robots UA fallback (`robotstxt.py:64-80`) ---------------------------
  test("robots matching UA falls back to the request User-Agent") {
    assert(CrawlConfig(robotsUserAgent = "rbot", userAgent = "ua")
      .effectiveRobotsUserAgent === "rbot")
    assert(CrawlConfig(robotsUserAgent = "", userAgent = "ua")
      .effectiveRobotsUserAgent === "ua")
    assert(CrawlConfig(robotsUserAgent = null, userAgent = "ua")
      .effectiveRobotsUserAgent === "ua")
  }

  // ---- DOWNLOAD_SLOTS + AutoThrottle resolution (contract step 1a) ---------
  test("slot override fixes delay and cap; others inherit") {
    val cfg = CrawlConfig(delayMs = 100, epochMs = 1000, maxPerHostPerEpoch = 16,
      slotOverrides = Map(
        "slow.test" -> SlotOverride(delayMs = Some(500)),
        "vip.test" -> SlotOverride(delayMs = Some(10), maxPerEpoch = Some(3))))
    assert(cfg.resolveSlotDelay("plain.test", -1L) === 100)
    assert(cfg.resolveSlotDelay("slow.test", -1L) === 500)
    assert(cfg.slotBudgetOf("plain.test", -1L) === 10) // 1000/100
    assert(cfg.slotBudgetOf("slow.test", -1L) === 2) // 1000/500
    assert(cfg.slotBudgetOf("vip.test", -1L) === 3) // 1000/10=100 capped at 3
    assert(cfg.maxSlotBudget === 16)
  }

  test("autothrottle resolution: stored delay wins; else start; override seeds") {
    val cfg = CrawlConfig(delayMs = 50, autothrottle = true,
      autothrottleStartDelayMs = 200,
      slotOverrides = Map("s.test" -> SlotOverride(delayMs = Some(80))))
    // no state yet: start = max(mindelay, START_DELAY) (reference _start_delay)
    assert(cfg.resolveSlotDelay("plain.test", -1L) === 200)
    // overridden slot starts at its configured delay
    assert(cfg.resolveSlotDelay("s.test", -1L) === 80)
    // stored adaptive delay wins over both
    assert(cfg.resolveSlotDelay("plain.test", 123L) === 123)
    assert(cfg.resolveSlotDelay("s.test", 77L) === 77)
  }
}
