package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cookies

/** Cookie-jar contract unit cases (scenario shapes from the reference
  * `tests/test_downloadermiddleware_cookies.py`; the end-to-end jar behavior
  * — header at fetch time, BSP visibility, last-writer-wins, cross-host
  * isolation — is pinned by ConformanceSpec's byte-for-byte compare). */
class CookiesSpec extends AnyFunSuite {

  test("Set-Cookie parsing: first segment, attributes ignored, malformed dropped") {
    assert(Cookies.parseSetCookie("sid=abc123; Path=/; HttpOnly") === Some(("sid", "abc123")))
    assert(Cookies.parseSetCookie("pref=p2") === Some(("pref", "p2")))
    assert(Cookies.parseSetCookie("sid=; Max-Age=0") === Some(("sid", "")))
    assert(Cookies.parseSetCookie(" a = b ; Secure") === Some(("a", "b")))
    assert(Cookies.parseSetCookie("no-equals-here") === None)
    assert(Cookies.parseSetCookie("=value-without-name") === None)
    assert(Cookies.parseSetCookie(null) === None)
  }

  test("Cookie header rendering: sorted pairs, omitted when empty") {
    assert(Cookies.renderHeader(Seq(("sid", "x"), ("ab", "1"))) === Some("ab=1; sid=x"))
    assert(Cookies.renderHeader(Seq(("one", "1"))) === Some("one=1"))
    assert(Cookies.renderHeader(Nil) === None)
  }

  test("jar semantics through a real crawl: cookies appear one epoch after Set-Cookie") {
    import graft.corpus.{Corpus, CorpusWriter}
    import graft.operators.CrawlDriver
    val spark = TestSpark.spark
    import spark.implicits._
    val corpusDir = TestSpark.tempDir("corpus-cookies")
    CorpusWriter.writeAll(spark, Corpus.Small, corpusDir, withImages = false)
    val res = CrawlDriver.run(spark, CrawlConfig(maxEpochs = 6), corpusDir,
      TestSpark.tempDir("snap-cookies"), withMedia = false)
    val log = CrawlDriver.fetchLog(spark, res.manifest)
      .select($"epoch", $"host", $"cookies")
      .as[(Int, String, Option[String])].collect()
    // some fetch eventually carries a Cookie header (the corpus sets them)
    assert(log.exists(_._3.isDefined), "no fetch ever carried a Cookie header")
    // epoch-0 fetches can't have cookies yet (jar starts empty, BSP visibility)
    assert(log.filter(_._1 == 0).forall(_._3.isEmpty))
    // the final jar holds rows and round-trips through the snapshot
    val jar = CrawlDriver.readCookieJar(spark, res.manifest.cookieJarDirs).collect()
    assert(jar.nonEmpty)
    assert(jar.forall(c => c.value.nonEmpty), "deleted cookies must not persist")
  }
}
