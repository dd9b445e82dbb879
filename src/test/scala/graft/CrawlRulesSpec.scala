package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.{CrawlRules, LinkExtract, LinkExtractor}
import graft.extract.CrawlRules.{CrawlRule, RuleRequest}

/** Golden battery for the CrawlSpider Rule walk (contract 7c), hard-coded
  * from the reference's own CrawlSpider tests
  * (`tests/test_spider.py:231-447` TestCrawlSpider) — the same page body and
  * expected request URLs, including the re-sanitization of hook-rewritten
  * URLs (`safe_url_string(request.url.upper())`). */
class CrawlRulesSpec extends AnyFunSuite {

  // `tests/test_spider.py:232-242` test_body
  private val testBody =
    """<html><head><title>Page title</title></head>
      |    <body>
      |    <p><a href="item/12.html">Item 12</a></p>
      |    <div class='links'>
      |    <p><a href="/about.html">About us</a></p>
      |    </div>
      |    <div>
      |    <p><a href="/nofollow.html">This shouldn't be followed</a></p>
      |    </div>
      |    </body></html>""".stripMargin.getBytes("UTF-8")
  private val pageUrl = "http://example.org/somepage/index.html"

  private def urls(rules: Seq[CrawlRule], respRule: Int = -1): Seq[String] =
    CrawlRules.followRequests(rules, testBody, pageUrl, respRule).map(_._2.url)

  test("default rule extracts all three links, nofollow included (test_rule_without_link_extractor)") {
    assert(urls(Seq(CrawlRule())) === Seq(
      "http://example.org/somepage/item/12.html",
      "http://example.org/about.html",
      "http://example.org/nofollow.html"))
  }

  test("identity process_links passes everything (test_process_links)") {
    assert(urls(Seq(CrawlRule(processLinks = ls => ls))) === Seq(
      "http://example.org/somepage/item/12.html",
      "http://example.org/about.html",
      "http://example.org/nofollow.html"))
  }

  test("filtering process_links drops matching links (test_process_links_filter)") {
    val re = java.util.regex.Pattern.compile("nofollow")
    val rules = Seq(CrawlRule(
      processLinks = ls => ls.filterNot(l => re.matcher(l.url).find())))
    assert(urls(rules) === Seq(
      "http://example.org/somepage/item/12.html",
      "http://example.org/about.html"))
  }

  test("process_request may rewrite the URL (test_process_request)") {
    val rules = Seq(CrawlRule(processRequest = (r, _) =>
      Some(r.copy(url = r.url.replace(".org", ".com")))))
    assert(urls(rules) === Seq(
      "http://example.com/somepage/item/12.html",
      "http://example.com/about.html",
      "http://example.com/nofollow.html"))
  }

  test("rewritten URLs re-sanitize like request.replace (test_process_request_instance_method)") {
    // the engine/oracle safe_url_string the hook's output; the reference
    // golden is safe_url_string("http://EXAMPLE.ORG/SOMEPAGE/ITEM/12.HTML")
    val rules = Seq(CrawlRule(processRequest = (r, _) =>
      Some(r.copy(url = r.url.toUpperCase(java.util.Locale.ROOT)))))
    val sanitized = urls(rules).map(graft.urlkit.UrlKit.safeUrlString)
    assert(sanitized === Seq(
      "http://example.org/SOMEPAGE/ITEM/12.HTML",
      "http://example.org/ABOUT.HTML",
      "http://example.org/NOFOLLOW.HTML"))
  }

  test("process_request sees the response URL and may drop (crawl.py:146-149)") {
    var seenResp: List[String] = Nil
    val rules = Seq(CrawlRule(processRequest = (r, respUrl) => {
      seenResp ::= respUrl
      if (r.url.contains("about")) None else Some(r)
    }))
    assert(urls(rules) === Seq(
      "http://example.org/somepage/item/12.html",
      "http://example.org/nofollow.html"))
    assert(seenResp.distinct === List(pageUrl))
  }

  test("cross-rule seen set: the first rule claims a link (crawl.py:138-145)") {
    val rules = Seq(
      CrawlRule(extractor = new LinkExtractor(allow = Seq("item"))),
      CrawlRule())
    val out = CrawlRules.followRequests(rules, testBody, pageUrl, -1)
    assert(out.map(_._2.url) === Seq(
      "http://example.org/somepage/item/12.html", // rule 0
      "http://example.org/about.html", // rule 1 — item link already seen
      "http://example.org/nofollow.html"))
    assert(out.map(_._2.ruleIdx) === Seq(0, 1, 1))
  }

  test("follow=false rules yield requests whose responses do not expand") {
    val rules = Seq(CrawlRule(follow = false))
    // the response to a rule-0 request (respRuleIdx=0) expands to nothing...
    assert(CrawlRules.followRequests(rules, testBody, pageUrl, 0) === Nil)
    // ...but a seed response (-1) still walks the rules
    assert(urls(rules, respRule = -1).size === 3)
  }

  test("emission index numbers dropped requests too (order stays total)") {
    val rules = Seq(CrawlRule(processRequest = (r, _) =>
      if (r.url.contains("about")) None else Some(r)))
    val out = CrawlRules.followRequests(rules, testBody, pageUrl, -1)
    assert(out.map(_._1) === Seq(0, 2))
  }

  test("rule link text rides on the request (meta link_text, crawl.py:127-131)") {
    val out = CrawlRules.followRequests(Seq(CrawlRule()), testBody, pageUrl, -1)
    assert(out.map(_._2.linkText) ===
      Seq("Item 12", "About us", "This shouldn't be followed"))
  }
}
