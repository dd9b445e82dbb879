package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.HtmlDom

/** Direct pins for the HtmlDom parser + selector subset backing
  * restrict_xpaths/restrict_css (LinkExtractorSpec pins the end-to-end
  * extraction; this isolates the tree/selector layer). */
class HtmlDomSpec extends AnyFunSuite {

  private def tags(html: String): Seq[String] = HtmlDom.parse(html).map(_.tag)

  test("basic nesting, offsets and spans") {
    val h = """<html><body><div id="a"><a href="/x">x</a></div></body></html>"""
    val els = HtmlDom.parse(h)
    assert(els.map(_.tag) === Seq("html", "body", "div", "a"))
    val div = els(2)
    assert(div.attrs("id") === "a")
    assert(div.start === h.indexOf("<div"))
    assert(div.end === h.indexOf("</div>"))
    val a = els(3)
    assert(a.parent eq div)
    assert(a.start > div.start && a.end < div.end)
  }

  test("void and self-closing elements never nest") {
    val els = HtmlDom.parse("<div><br><img src='x'/><p>t</p></div>")
    assert(els.map(_.tag) === Seq("div", "br", "img", "p"))
    assert(els(1).parent.tag === "div")
    assert(els(3).parent.tag === "div") // p is a sibling of br/img, not a child
  }

  test("close tag pops to nearest matching ancestor; unmatched close ignored") {
    // </body> implicitly closes the unclosed div; stray </table> is a no-op
    val h = "<html><body><div><a href='/f'>t</a></table></body></html>"
    val els = HtmlDom.parse(h)
    val div = els.find(_.tag == "div").get
    assert(div.end === h.indexOf("</body>"))
    val a = els.find(_.tag == "a").get
    assert(a.start > div.start && a.start < div.end)
  }

  test("rawtext elements swallow markup-looking content") {
    val h = "<div><script>if (a<b) { x('<a href=\"/no\">') }</script><a href='/yes'>y</a></div>"
    val els = HtmlDom.parse(h)
    // the <a> inside the script text is NOT an element
    assert(els.map(_.tag) === Seq("div", "script", "a"))
    assert(els(2).attrs("href") === "/yes")
  }

  test("auto-close: repeated li / p, tr closes open td") {
    val els = HtmlDom.parse("<ul><li>one<li>two</ul><p>a<p>b")
    val lis = els.filter(_.tag == "li")
    assert(lis.length === 2)
    assert(lis(1).parent.tag === "ul") // second li is NOT inside the first
    val ps = els.filter(_.tag == "p")
    assert(ps(1).parent.tag === ps(0).parent.tag)

    val t = HtmlDom.parse("<table><tr><td>1<tr><td>2</table>")
    val trs = t.filter(_.tag == "tr")
    assert(trs.length === 2)
    assert(trs(1).parent.tag === "table") // tr popped the open td AND tr
  }

  test("attribute entity decode and duplicate-attr first-wins") {
    val els = HtmlDom.parse("""<div title="a &amp; b &hearts;" title="second">x</div>""")
    assert(els.head.attrs("title") === "a & b ♥")
  }

  test("xpath subset: //tag, //tag[@attr='v'], /html/body child steps") {
    val h = """<html><body><div class="links"><p id="p1"><a href="/x">x</a></p></div>
              |<div><p id="p2">y</p></div></body></html>""".stripMargin
    val doc = HtmlDom.parse(h)
    assert(HtmlDom.parseXPath("//p").select(doc).map(_.attrs("id")) ===
      Seq("p1", "p2"))
    assert(HtmlDom.parseXPath("//div[@class='links']").select(doc)
      .map(_.tag) === Seq("div"))
    assert(HtmlDom.parseXPath("/html/body/div").select(doc).length === 2)
    assert(HtmlDom.parseXPath("/div").select(doc).isEmpty) // div is not a root child
    intercept[IllegalArgumentException] { HtmlDom.parseXPath("//p/text()") }
    intercept[IllegalArgumentException] { HtmlDom.parseXPath("p") }
  }

  test("css subset: #id, .class, [attr=v], child/adjacent/general sibling") {
    val h = """<div id="w"><div id="s" class="box hot"><a href="/1">1</a></div>
              |<a href="/2" rel="x">2</a><span>s</span><a href="/3">3</a></div>""".stripMargin
    val doc = HtmlDom.parse(h)
    def sel(c: String): Seq[String] =
      HtmlDom.parseCss(c).select(doc).map(e => e.attrs.getOrElse("href", e.tag))
    assert(sel("#s a") === Seq("/1"))
    assert(sel(".box a") === Seq("/1"))
    assert(sel(".hot.box") === Seq("div"))
    assert(sel("[rel=x]") === Seq("/2"))
    assert(sel("#s + a") === Seq("/2")) // adjacent only
    assert(sel("#s ~ a") === Seq("/2", "/3")) // all following siblings
    assert(sel("div > a") === Seq("/1", "/2", "/3"))
    assert(sel("#w > a") === Seq("/2", "/3"))
    intercept[IllegalArgumentException] { HtmlDom.parseCss("a:hover") }
    intercept[IllegalArgumentException] { HtmlDom.parseCss("+ a") }
  }

  test("comments and doctype are skipped") {
    assert(tags("<!DOCTYPE html><!-- <a href='/no'>c</a> --><div>x</div>") ===
      Seq("div"))
  }
}
