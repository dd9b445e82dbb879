package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.AjaxCrawl

/** AjaxCrawlMiddleware analogue — scenarios mirror the reference doctests
  * (`scrapy/downloadermiddlewares/ajaxcrawl.py:95-120`) and
  * `tests/test_downloadermiddleware_ajaxcrawl.py` / w3lib
  * add_or_replace_parameter cases. */
class AjaxCrawlSpec extends AnyFunSuite {

  test("ajax-crawlable meta detection (reference doctest battery)") {
    assert(AjaxCrawl.hasAjaxCrawlableMeta(
      """<html><head><meta name="fragment"  content="!"/></head><body></body></html>"""))
    assert(AjaxCrawl.hasAjaxCrawlableMeta(
      """<html><head><meta name='fragment' content='!'></head></html>"""))
    // commented-out meta does not count
    assert(!AjaxCrawl.hasAjaxCrawlableMeta(
      """<html><head><!--<meta name="fragment"  content="!"/>--></head><body></body></html>"""))
    assert(!AjaxCrawl.hasAjaxCrawlableMeta("<html></html>"))
    // inside script/noscript is stripped before matching
    assert(!AjaxCrawl.hasAjaxCrawlableMeta(
      """<script>var x = '<meta name="fragment" content="!">';</script>"""))
    // entity-encoded quotes still match (w3lib replace_entities step)
    assert(AjaxCrawl.hasAjaxCrawlableMeta(
      """<meta name=&quot;fragment&quot; content=&quot;!&quot;>"""))
    // beyond the lookup window is ignored
    val far = ("x" * 40000) + """<meta name="fragment" content="!">"""
    assert(!AjaxCrawl.hasAjaxCrawlableMeta(far))
    assert(AjaxCrawl.hasAjaxCrawlableMeta(far, lookupBytes = 50000))
  }

  test("entity decode handles supplementary code points via surrogate pairs") {
    assert(AjaxCrawl.replaceBasicEntities("&#128512;") === "😀")
    assert(AjaxCrawl.replaceBasicEntities("&#x1F600;") === "😀")
    assert(AjaxCrawl.replaceBasicEntities("&#65509;") === "￥") // BMP stays 1 char
    assert(AjaxCrawl.replaceBasicEntities("&quot;x&quot; &amp; &#60;y&#62;") ===
      "\"x\" & <y>")
  }

  test("escape_ajax turns #! fragments into _escaped_fragment_") {
    // w3lib/scrapy escape_ajax doctest values
    assert(AjaxCrawl.escapeAjax("www.example.com/ajax.html#!key=value") ===
      "www.example.com/ajax.html?_escaped_fragment_=key%3Dvalue")
    assert(AjaxCrawl.escapeAjax("www.example.com/ajax.html?k1=v1&k2=v2#!key=value") ===
      "www.example.com/ajax.html?k1=v1&k2=v2&_escaped_fragment_=key%3Dvalue")
    // non-#! fragments pass through untouched
    assert(AjaxCrawl.escapeAjax("www.example.com/ajax.html#normal") ===
      "www.example.com/ajax.html#normal")
    assert(AjaxCrawl.escapeAjax("www.example.com/plain") === "www.example.com/plain")
  }

  test("the middleware rewrite appends an empty escaped fragment") {
    assert(AjaxCrawl.ajaxCrawlableUrl("http://example.com/") ===
      "http://example.com/?_escaped_fragment_=")
    assert(AjaxCrawl.ajaxCrawlableUrl("http://example.com/p?a=1") ===
      "http://example.com/p?a=1&_escaped_fragment_=")
  }

  test("add_or_replace_parameter semantics") {
    assert(AjaxCrawl.addOrReplaceParameter("http://h.test/p?a=1", "b", "2") ===
      "http://h.test/p?a=1&b=2")
    assert(AjaxCrawl.addOrReplaceParameter("http://h.test/p?a=1&b=old", "b", "new") ===
      "http://h.test/p?a=1&b=new")
    // values are re-encoded with quote_plus
    assert(AjaxCrawl.addOrReplaceParameter("http://h.test/p", "q", "a b&c") ===
      "http://h.test/p?q=a+b%26c")
  }
}
