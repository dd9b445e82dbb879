package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cookies
import graft.operators.Cookies.ParsedCookie

/** Cookie-jar tier-2 contract unit cases (scenario shapes from the reference
  * `tests/test_downloadermiddleware_cookies.py`, which exercises the CPython
  * `http.cookiejar` the CookiesMiddleware delegates to; the end-to-end jar
  * behavior — header at fetch time, BSP visibility, last-writer-wins,
  * cross-host isolation, domain scoping over the subdomain-pair corpus — is
  * pinned by ConformanceSpec's byte-for-byte `cookies2`/`cookies2https`
  * variants). */
class CookiesSpec extends AnyFunSuite {

  private def parse(h: String, host: String = "www.example.com",
      reqPath: String = "/", now: Long = 1000L): Option[ParsedCookie] =
    Cookies.parseOne(h, host, reqPath, now)

  test("name=value parsing: first segment, trim, malformed dropped") {
    assert(parse("sid=abc123; Path=/; HttpOnly").map(c => (c.name, c.value))
      === Some(("sid", "abc123")))
    assert(parse("pref=p2").map(c => (c.name, c.value)) === Some(("pref", "p2")))
    assert(parse(" a = b ; Secure").map(c => (c.name, c.value)) === Some(("a", "b")))
    assert(parse("no-equals-here") === None)
    assert(parse("=value-without-name") === None)
    assert(parse(null) === None)
  }

  test("cookie-date parse: RFC 6265 §5.1.1 algorithm goldens") {
    import Cookies.parseCookieDate
    // canonical RFC-1123 shape (the §5.1.1 worked example family)
    assert(parseCookieDate("Wed, 21 Oct 2015 07:28:00 GMT")
      === Some(1445412480000L))
    // epoch origin and near-origin (the conformance corpus anchors)
    assert(parseCookieDate("Thu, 01 Jan 1970 00:00:00 GMT") === Some(0L))
    assert(parseCookieDate("Thu, 01 Jan 1970 00:00:03 GMT") === Some(3000L))
    // asctime shape, 2-digit year: 72 → 1972 (70-99 → 19xx)
    assert(parseCookieDate("Sat Jan  1 00:00:30 72") === Some(63072030000L))
    // 2-digit year 69 → 2069; 4-digit year below 1601 fails
    assert(parseCookieDate("1 Jan 69 00:00:00")
      === Some(java.time.LocalDateTime.of(2069, 1, 1, 0, 0, 0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
    assert(parseCookieDate("1 Jan 1600 00:00:00") === None)
    // delimiter tolerance: dashes, extra tokens, trailing junk on seconds
    assert(parseCookieDate("21-Oct-2015 07:28:00")
      === Some(1445412480000L))
    assert(parseCookieDate("Sun, 06-Nov-1994 08:49:37 GMT")
      === Some(784111777000L))
    // first-match-wins token order: the day token can precede the time
    assert(parseCookieDate("2015 Oct 21 07:28:00").isDefined)
    // invalid fields fail: hour 24, day 32, missing month, 3-digit second
    assert(parseCookieDate("Wed, 21 Oct 2015 24:28:00 GMT") === None)
    assert(parseCookieDate("Wed, 32 Oct 2015 07:28:00 GMT") === None)
    assert(parseCookieDate("Wed, 21 2015 07:28:00 GMT") === None)
    assert(parseCookieDate("Wed, 21 Oct 2015 07:28:000 GMT") === None)
    assert(parseCookieDate("not-a-real-date") === None)
    assert(parseCookieDate(null) === None)
  }

  test("Expires attribute: virtual-clock anchor, Max-Age precedence, deletion") {
    // clockStartMs=0 (the conformance anchor): Expires at +3s virtual
    val c = Cookies.parseOne("exp=v; Expires=Thu, 01 Jan 1970 00:00:03 GMT",
      "h.test", "/", 1000L).get
    assert(c.expiresMs === 3000L)
    // non-zero clock origin shifts into the virtual timeline
    val shifted = Cookies.parseOne(
      "exp=v; Expires=Thu, 01 Jan 1970 00:01:00 GMT", "h.test", "/", 1000L,
      clockStartMs = 50000L).get
    assert(shifted.expiresMs === 10000L)
    // a date before the clock origin clamps to the expired-deletion shape
    assert(Cookies.parseOne("exp=v; Expires=Thu, 01 Jan 1970 00:00:01 GMT",
      "h.test", "/", 1000L, clockStartMs = 99000L).get.expiresMs === 0L)
    // Max-Age WINS over Expires (§4.1.2.2)
    assert(Cookies.parseOne(
      "b=1; Max-Age=5; Expires=Thu, 01 Jan 1970 00:00:01 GMT",
      "h.test", "/", 1000L).get.expiresMs === 6000L)
    // unparseable Expires → attribute ignored → session cookie
    assert(Cookies.parseOne("k=v; Expires=garbage", "h.test", "/", 0L)
      .get.expiresMs === -1L)
    // an expired-by-Expires entry is never sendable (the deletion shape)
    assert(!Cookies.sendable("h.test", "/", "http", 5000L,
      "h.test", hostOnly = true, "/", 3000L, secure = false))
  }

  test("Domain attribute: normalized, scoped, rejected when response host mismatches") {
    // leading dot stripped + lowercased (RFC 6265 §5.2.3)
    val c = parse("a=1; Domain=.Example.COM").get
    assert(c.domain === "example.com" && !c.hostOnly)
    // response host must domain-match the attribute or the store is refused
    // (cookiejar set_cookie_if_ok): other-domain and a LOOKALIKE suffix
    assert(parse("a=1; Domain=other.org") === None)
    assert(parse("a=1; Domain=ample.com") === None) // label boundary
    // a subdomain host may set a parent-domain cookie
    assert(parse("a=1; Domain=example.com", host = "sub.example.com").isDefined)
    // no attribute → host-only, domain = the response host
    val h = parse("b=2").get
    assert(h.hostOnly && h.domain === "www.example.com")
  }

  test("domainMatches: exact + subdomain with label boundary") {
    assert(Cookies.domainMatches("example.com", "example.com"))
    assert(Cookies.domainMatches("a.b.example.com", "example.com"))
    assert(!Cookies.domainMatches("badexample.com", "example.com"))
    assert(!Cookies.domainMatches("example.com", "www.example.com"))
  }

  test("Path attribute and §5.1.4 default path") {
    assert(parse("a=1; Path=/p").get.path === "/p")
    assert(parse("a=1; Path=nope").get.path === "/") // must start with '/'
    assert(Cookies.defaultPath("/p/5") === "/p")
    assert(Cookies.defaultPath("/p") === "/")
    assert(Cookies.defaultPath("/") === "/")
    assert(Cookies.defaultPath("") === "/")
    assert(Cookies.defaultPath("/a/b/c") === "/a/b")
    // the default path comes from the REQUEST URI when no attribute
    assert(parse("a=1", reqPath = "/p/7").get.path === "/p")
  }

  test("pathMatches: §5.4 prefix with boundary") {
    assert(Cookies.pathMatches("/p/5", "/p"))
    assert(Cookies.pathMatches("/p", "/p"))
    assert(Cookies.pathMatches("/p/5", "/"))
    assert(!Cookies.pathMatches("/private/1", "/p"))
    assert(!Cookies.pathMatches("/", "/p"))
    assert(Cookies.pathMatches("/p/x", "/p/"))
  }

  test("Max-Age on the virtual clock; Max-Age<=0 is the expired tombstone") {
    assert(parse("a=1; Max-Age=5", now = 2000L).get.expiresMs === 7000L)
    assert(parse("a=1; Max-Age=0", now = 2000L).get.expiresMs === 0L)
    assert(parse("a=1; Max-Age=-1", now = 2000L).get.expiresMs === 0L)
    assert(parse("a=1").get.expiresMs === -1L) // session cookie
    assert(parse("a=1; Max-Age=junk").get.expiresMs === -1L)
  }

  test("Secure flag and scheme gate") {
    val c = parse("a=1; Secure").get
    assert(c.secure)
    assert(!Cookies.sendable("www.example.com", "/", "http", 0L,
      c.domain, c.hostOnly, c.path, c.expiresMs, c.secure))
    assert(Cookies.sendable("www.example.com", "/", "https", 0L,
      c.domain, c.hostOnly, c.path, c.expiresMs, c.secure))
  }

  test("sendable: host-only vs domain cookie, expiry at send time") {
    val hostOnly = parse("a=1").get // domain = www.example.com, hostOnly
    assert(!Cookies.sendable("sub.www.example.com", "/", "http", 0L,
      hostOnly.domain, hostOnly.hostOnly, hostOnly.path, hostOnly.expiresMs,
      hostOnly.secure))
    val dom = parse("a=1; Domain=example.com").get
    assert(Cookies.sendable("other.example.com", "/", "http", 0L,
      dom.domain, dom.hostOnly, dom.path, dom.expiresMs, dom.secure))
    // expiry is checked at the FETCH's virtual time
    val ttl = parse("a=1; Max-Age=5", now = 1000L).get // expires 6000
    assert(Cookies.sendable("www.example.com", "/", "http", 5999L,
      ttl.domain, ttl.hostOnly, ttl.path, ttl.expiresMs, ttl.secure))
    assert(!Cookies.sendable("www.example.com", "/", "http", 6000L,
      ttl.domain, ttl.hostOnly, ttl.path, ttl.expiresMs, ttl.secure))
  }

  test("multi-header block: newline-separated, malformed lines dropped") {
    val cs = Cookies.parseSetCookies("a=1\npref=p2; Path=/\nmalformed",
      "h0.test", "/p/1", 0L)
    assert(cs.map(_.name) === Seq("a", "pref"))
    assert(cs(0).path === "/p") // default path from the request URI
    assert(cs(1).path === "/")
    assert(Cookies.parseSetCookies(null, "h", "/", 0L) === Nil)
  }

  test("domainSuffixes: bounded label-suffix explode for the jar equi-join") {
    assert(Cookies.domainSuffixes("a.b.example.com")
      === Seq("a.b.example.com", "b.example.com", "example.com", "com"))
    assert(Cookies.domainSuffixes("localhost") === Seq("localhost"))
    assert(Cookies.domainSuffixes("") === Seq())
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
    // the final jar round-trips through the snapshot chain merge
    val jar = CrawlDriver.readCookieJar(spark, res.manifest.cookieJarDirs).collect()
    assert(jar.nonEmpty)
    // the Small corpus deletion trap (`sid=; Max-Age=0`) persists only as
    // an expired tombstone (never sendable); live entries are session
    // cookies with values
    assert(jar.filter(_.value.isEmpty).forall(_.expiresMs == 0L))
    assert(jar.exists(c => c.expiresMs == -1L && c.value.nonEmpty))
  }
}
