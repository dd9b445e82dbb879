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

  // ── reference tests/test_robotstxt_interface.py battery ──

  test("wildcard battery (test_allowed_wildcards)") {
    val r = RobotsRules.parse(
      """User-agent: first
        |Disallow: /disallowed/*/end$
        |
        |User-agent: second
        |Allow: /*allowed
        |Disallow: /
        |""".stripMargin)
    assert(r.allowed("https://www.site.local/disallowed", "first"))
    assert(!r.allowed("https://www.site.local/disallowed/xyz/end", "first"))
    assert(!r.allowed("https://www.site.local/disallowed/abc/end", "first"))
    assert(r.allowed("https://www.site.local/disallowed/xyz/endinglater", "first"))
    assert(r.allowed("https://www.site.local/allowed", "second"))
    assert(r.allowed("https://www.site.local/is_still_allowed", "second"))
    assert(r.allowed("https://www.site.local/is_allowed_too", "second"))
  }

  test("length-based precedence (test_length_based_precedence)") {
    val r = RobotsRules.parse("User-agent: * \nDisallow: / \nAllow: /page")
    assert(r.allowed("https://www.site.local/page", "*"))
  }

  test("unicode url and useragent (test_unicode_url_and_useragent)") {
    val r = RobotsRules.parse(
      """
        |User-Agent: *
        |Disallow: /admin/
        |Disallow: /static/
        |# taken from https://en.wikipedia.org/robots.txt
        |Disallow: /wiki/K%C3%A4ytt%C3%A4j%C3%A4:
        |Disallow: /wiki/Käyttäjä:
        |
        |User-Agent: UnicödeBöt
        |Disallow: /some/randome/page.html""".stripMargin)
    assert(r.allowed("https://site.local/", "*"))
    assert(!r.allowed("https://site.local/admin/", "*"))
    assert(!r.allowed("https://site.local/static/", "*"))
    assert(r.allowed("https://site.local/admin/", "UnicödeBöt"))
    assert(!r.allowed("https://site.local/wiki/K%C3%A4ytt%C3%A4j%C3%A4:", "*"))
    assert(!r.allowed("https://site.local/wiki/Käyttäjä:", "*"))
    assert(r.allowed("https://site.local/some/randome/page.html", "*"))
    assert(!r.allowed("https://site.local/some/randome/page.html", "UnicödeBöt"))
  }

  test("decode_robotstxt: BOM stripped, bad bytes dropped, garbage = allow-all") {
    // reference `robotstxt.py:24-42` decode("utf-8-sig", errors="ignore")
    val bom = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "User-agent: *\nDisallow: /\n".getBytes("UTF-8")
    assert(!RobotsRules.parse(bom).allowed("https://site.local/x", "*"),
      "BOM must not hide the star group")
    // a stray undecodable byte is DROPPED — the rule on that line still applies
    val stray = "User-agent: *\n".getBytes("UTF-8") ++ Array(0xff.toByte) ++
      "Disallow: /\n".getBytes("UTF-8")
    assert(!RobotsRules.parse(stray).allowed("https://site.local/x", "*"),
      "a stray bad byte must not void the remaining rules")
    // pure binary garbage decodes to directive-less text → allow all
    val gif = Array[Byte]('G', 'I', 'F', '8', '9', 'a',
      0xd3.toByte, 0x00, 0xfe.toByte, 0x00, 0xa2.toByte)
    val g = RobotsRules.parse(gif)
    assert(g.allowed("https://site.local/", "*"))
    assert(g.allowed("https://site.local/disallowed", "chrome"))
  }
}
