package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.HtmlText.visibleText

/** Golden pins for HTML→visible-text extraction (hand-derived expected
  * values; the function's documented scope is on [[graft.extract.HtmlText]]). */
class HtmlTextSpec extends AnyFunSuite {

  test("block structure: paragraphs and headings become lines") {
    val html =
      """<html><head><title>T</title></head><body>
        |<h1>Header</h1>
        |<p>First paragraph.</p>
        |<p>Second <b>bold</b> paragraph.</p>
        |</body></html>""".stripMargin
    assert(visibleText(html) ===
      "T\nHeader\nFirst paragraph.\nSecond bold paragraph.")
  }

  test("script/style/noscript/template content is invisible") {
    val html =
      """<body><style>p { color: red }</style>
        |<script>if (a < b) document.write("<p>injected</p>");</script>
        |<noscript>enable js</noscript>
        |<template><p>unstamped</p></template>
        |<p>visible</p></body>""".stripMargin
    assert(visibleText(html) === "visible")
  }

  test("comments, doctype and PIs are dropped; literal < kept") {
    assert(visibleText("<!DOCTYPE html><!-- note --><?pi x?><p>2 < 3</p>") ===
      "2 < 3")
  }

  test("inline tags collapse to single spaces; entities decode") {
    assert(visibleText("<p>a<span>b</span> &amp; c&nbsp;&hearts; &unknown;</p>") ===
      "a b & c ♥ &unknown;")
  }

  test("br and list items break lines; blank lines dropped") {
    assert(visibleText("<p>one<br>two</p>\n\n<ul><li>x</li><li>y</li></ul>") ===
      "one\ntwo\nx\ny")
  }

  test("tables: rows become lines, cells separated") {
    assert(visibleText("<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>") ===
      "a b\nc")
  }

  test("unclosed rawtext swallows to EOF; quoted > inside attrs is safe") {
    assert(visibleText("""<p title="a>b">text</p><script>trailing""") === "text")
  }

  test("whitespace collapse is per line") {
    assert(visibleText("<p>  a\t\tb  </p><div>   </div><p>c</p>") === "a b\nc")
  }
}
