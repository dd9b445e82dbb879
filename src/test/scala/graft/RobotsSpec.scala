package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.robots.RobotsRules

/** Robots matching semantics (RFC 9309 / Protego parity for the cases the
  * corpus exercises; reference behavior notes in
  * `scrapy/robotstxt.py:24-42`, `scrapy/downloadermiddlewares/robotstxt.py`). */
class RobotsSpec extends AnyFunSuite {

  private val body =
    """# comment
      |User-agent: otherbot
      |Disallow: /
      |
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/ok
      |Disallow: /p/3$
      |Disallow: /*.zip$
      |""".stripMargin

  private val rules = RobotsRules.parse(body)

  test("star group applies to unknown agents") {
    assert(rules.allowed("http://h.test/p/1", "graftbot"))
    assert(!rules.allowed("http://h.test/private/x", "graftbot"))
  }
  test("longest match wins; Allow beats Disallow on tie-break") {
    assert(rules.allowed("http://h.test/private/ok", "graftbot"))
    assert(rules.allowed("http://h.test/private/okay", "graftbot"))
    assert(!rules.allowed("http://h.test/private/no", "graftbot"))
  }
  test("$ anchors the end") {
    assert(!rules.allowed("http://h.test/p/3", "graftbot"))
    assert(rules.allowed("http://h.test/p/33", "graftbot"))
  }
  test("* wildcard") {
    assert(!rules.allowed("http://h.test/files/a.zip", "graftbot"))
    assert(rules.allowed("http://h.test/files/a.zipx", "graftbot"))
  }
  test("specific agent group preferred over star") {
    assert(!rules.allowed("http://h.test/p/1", "OtherBot/1.0"))
  }
  test("empty / garbage bodies allow everything") {
    assert(RobotsRules.parse(Array.emptyByteArray).allowed("http://h.test/x", "a"))
    assert(RobotsRules.parse(Array[Byte](0xff.toByte, 0xfe.toByte))
      .allowed("http://h.test/private/x", "a"))
  }
  test("deny all") {
    val r = RobotsRules.parse("User-agent: *\nDisallow: /\n")
    assert(!r.allowed("http://h.test/", "a"))
    assert(!r.allowed("http://h.test/p/1", "a"))
  }
  test("directive aliases: Protego's published sets, nothing more") {
    // accepted: Protego _USER_AGENT_DIRECTIVE / _DISALLOW_DIRECTIVE aliases
    val aliased = RobotsRules.parse(
      "useragent: *\ndissallow: /a\ndisalow: /b\ndiasllow: /c\n".getBytes)
    assert(!aliased.allowed("http://h.test/a/x", "bot"))
    assert(!aliased.allowed("http://h.test/b/x", "bot"))
    assert(!aliased.allowed("http://h.test/c/x", "bot"))
    val spaced = RobotsRules.parse(
      "user agent: *\ndisallaw: /d\n".getBytes)
    assert(!spaced.allowed("http://h.test/d/x", "bot"))
    // rejected near-misses: unknown keys are ignored, not guessed at
    val rejected = RobotsRules.parse(
      "User-agent: *\ndis allow: /e\nDisalloww: /f\n".getBytes)
    assert(rejected.allowed("http://h.test/e/x", "bot"))
    assert(rejected.allowed("http://h.test/f/x", "bot"))
  }

  test("ROBOTSTXT_USER_AGENT vs request-UA fallback changes which group matches") {
    // reference `downloadermiddlewares/robotstxt.py:64-80`: matching UA =
    // ROBOTSTXT_USER_AGENT if set, else the request's User-Agent header.
    // `otherbot` has a deny-all group above; the star group only blocks
    // /private/. The same URL therefore flips allow/deny with the UA source.
    val url = "http://h.test/p/1"
    val asOther = CrawlConfig(robotsUserAgent = "otherbot", userAgent = "graft/1.0")
    val asFallback = CrawlConfig(robotsUserAgent = "", userAgent = "graft/1.0")
    assert(!rules.allowed(url, asOther.effectiveRobotsUserAgent))
    assert(rules.allowed(url, asFallback.effectiveRobotsUserAgent))
    // and the fallback can land in a specific group too
    val asOtherViaUA = CrawlConfig(robotsUserAgent = null, userAgent = "otherbot")
    assert(!rules.allowed(url, asOtherViaUA.effectiveRobotsUserAgent))
  }

  test("query string participates in matching") {
    val r = RobotsRules.parse("User-agent: *\nDisallow: /*?a=1\n")
    assert(!r.allowed("http://h.test/p?a=1", "bot"))
    assert(r.allowed("http://h.test/p?a=2", "bot"))
  }
}
