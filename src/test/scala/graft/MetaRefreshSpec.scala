package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.MetaRefresh

/** Meta-refresh parsing pinned to the reference middleware semantics
  * (`scrapy/downloadermiddlewares/redirect.py:184-212` over w3lib
  * get_meta_refresh shapes; scenario shapes from
  * `tests/test_downloadermiddleware_redirect.py` MetaRefresh cases). */
class MetaRefreshSpec extends AnyFunSuite {

  test("basic directive, either attribute order, quote styles") {
    assert(MetaRefresh.find("""<meta http-equiv="refresh" content="5; url=http://x.test/a">""")
      === Some((5.0, "http://x.test/a")))
    assert(MetaRefresh.find("""<meta content='0;URL=/b' http-equiv='refresh'>""")
      === Some((0.0, "/b")))
    assert(MetaRefresh.find("""<META HTTP-EQUIV=REFRESH CONTENT="2.5, url='/c'">""")
      === Some((2.5, "/c")))
  }

  test("no directive / no url / malformed → None") {
    assert(MetaRefresh.find("<html><body>plain</body></html>") === None)
    assert(MetaRefresh.find("""<meta http-equiv="refresh" content="30">""") === None) // self-refresh
    assert(MetaRefresh.find("""<meta http-equiv="refresh" content="not-a-number; url=/x">""") === None)
    assert(MetaRefresh.find("""<meta http-equiv="expires" content="0; url=/x">""") === None)
  }

  test("comments and noscript blocks are ignored") {
    assert(MetaRefresh.find(
      """<!-- <meta http-equiv="refresh" content="0; url=/evil"> --><p>hi</p>""") === None)
    assert(MetaRefresh.find(
      """<noscript><meta http-equiv="refresh" content="0; url=/ns"></noscript>""") === None)
    // but a real directive after an ignored block is still found
    assert(MetaRefresh.find(
      """<noscript><meta http-equiv="refresh" content="0; url=/ns"></noscript>
        |<meta http-equiv="refresh" content="1; url=/real">""".stripMargin)
      === Some((1.0, "/real")))
  }

  test("first directive wins") {
    assert(MetaRefresh.find(
      """<meta http-equiv="refresh" content="9; url=/first">
        |<meta http-equiv="refresh" content="0; url=/second">""".stripMargin)
      === Some((9.0, "/first")))
  }
}
