package graft.operators

/** Cookie-jar analogue of the reference CookiesMiddleware
  * (`scrapy/downloadermiddlewares/cookies.py:40-189`, which delegates to
  * CPython `http.cookiejar`), re-expressed for the epoch-BSP engine as a
  * domain-keyed state table. Tier-2 semantics since round 5 (RFC 6265
  * subset the reference jar implements):
  *
  *  - jar key = (domain, path, name) — RFC 6265 §5.3 step 11; `domain` is
  *    the normalized cookie domain (lowercase, leading dot stripped).
  *  - a `Domain` attribute scopes the cookie to the domain AND its
  *    subdomains (§5.1.3 domain-match); the response host must itself
  *    match the attribute or the cookie is rejected (`set_cookie_if_ok`).
  *    No attribute ⇒ host-only: sent to the exact host.
  *    (The reference's tldextract public-suffix demotion is not modeled —
  *    the synthetic corpus has no public-suffix registry.)
  *  - `Path` attribute (must start with '/'), else the §5.1.4 default path
  *    of the request URI; §5.4 path-match decides sending.
  *  - `Max-Age` on the VIRTUAL clock: expiry = response fetch time +
  *    Max-Age seconds; Max-Age ≤ 0 stores an already-expired entry, which
  *    IS the deletion (it shadows the live entry under latest-wins and is
  *    never sent).
  *  - `Expires` (since r5): the attribute value is parsed with the RFC 6265
  *    §5.1.1 tolerant cookie-date algorithm and anchored to the crawl's
  *    virtual timeline via the clock origin (cfg.virtualClockStartMs =
  *    absolute epoch ms of virtual t=0, the same anchor the rfc2616 cache
  *    policy uses): virtual expiry = dateMs − clockStartMs. A date at or
  *    before the request's virtual time is the §5.3 deletion shape. A
  *    Max-Age attribute WINS over Expires (§4.1.2.2); an unparseable date
  *    means the attribute is ignored (session cookie), matching
  *    http.cookiejar's None expiry.
  *  - `Secure` ⇒ sent only on https requests.
  *  - multiple Set-Cookie headers per response travel newline-separated in
  *    the corpus page row's single string column.
  *  - `cookiesEnabled=false` (COOKIES_ENABLED) removes the middleware
  *    entirely: no Cookie header, no jar reads or writes.
  *  - `meta["cookiejar"]` (tier-3, `cookies.py:52-66`): the request's jar
  *    id ("" = default) prefixes the jar key — jars are fully isolated; a
  *    request reads its Cookie header from and stores its Set-Cookie into
  *    its own jar only. Not sticky: retries/redirects inherit the id (meta
  *    copy), extracted links never do. Robots requests are fresh Requests
  *    (`robotstxt.py:82-99`) — always the default jar.
  *  - `meta["dont_merge_cookies"]` (`cookies.py:79-81,96-98`): the request
  *    sends no Cookie header AND its response's Set-Cookie is discarded.
  *
  * Retained graft-contract simplifications (oracle implements the SAME
  * contract, so conformance is exact):
  *  - Cookies set by a response become visible at the NEXT epoch (BSP
  *    visibility, like link discoveries); within an epoch the last writer
  *    by global fetch seq wins per jar key.
  *  - The Cookie header renders the matching `n=v` pairs sorted by the
  *    rendered pair string (UTF-16 collation, [[renderRendered]]) — the
  *    reference jar sorts by path length then creation time; ours is the
  *    deterministic batch-replayable order (documented deviation).
  *  - The redirect cross-origin Cookie strip (`redirect.py:92-110`)
  *    emerges naturally: the header is computed from the TARGET host's
  *    matching cookies at fetch time, never copied across hosts.
  */
object Cookies {

  /** One parsed Set-Cookie result (the jar entry shape). `expiresMs`:
    * -1 = session cookie (never expires on the crawl's virtual timeline);
    * an entry with `expiresMs` ≤ send-time is expired — storing one is the
    * deletion. */
  final case class ParsedCookie(domain: String, hostOnly: Boolean,
      path: String, name: String, value: String, expiresMs: Long,
      secure: Boolean)

  /** RFC 6265 §5.1.4 default-path of a request-URI path. */
  def defaultPath(uriPath: String): String = {
    if (uriPath == null || uriPath.isEmpty || uriPath.charAt(0) != '/') "/"
    else {
      val i = uriPath.lastIndexOf('/')
      if (i <= 0) "/" else uriPath.substring(0, i)
    }
  }

  /** RFC 6265 §5.1.3 domain-match: host equals the domain or is a
    * subdomain of it (label boundary enforced by the dot). */
  def domainMatches(host: String, domain: String): Boolean =
    host == domain || host.endsWith("." + domain)

  /** RFC 6265 §5.4 path-match. */
  def pathMatches(reqPath: String, cookiePath: String): Boolean = {
    val p = if (reqPath == null || reqPath.isEmpty) "/" else reqPath
    p == cookiePath ||
      (p.startsWith(cookiePath) &&
        (cookiePath.endsWith("/") || p.charAt(cookiePath.length) == '/'))
  }

  /** Request-URI path of a sanitized URL ("/" when absent). */
  def reqPathOf(url: String): String = {
    val p = graft.urlkit.PyUrl.urlparse(url).path
    if (p == null || p.isEmpty) "/" else p
  }

  private val MonthNames = Array("jan", "feb", "mar", "apr", "may", "jun",
    "jul", "aug", "sep", "oct", "nov", "dec")

  /** RFC 6265 §5.1.1 cookie-date algorithm (the tolerant parse the
    * reference jar's date handling accepts a superset of): tokenize on the
    * delimiter set, first token matching each of time/day/month/year wins,
    * 2-digit years 70-99 → 19xx and 0-69 → 20xx, validity checks, UTC.
    * Returns absolute epoch MILLISECONDS; None = unparseable (the attribute
    * is then ignored — session cookie). */
  def parseCookieDate(s: String): Option[Long] = {
    if (s == null) return None
    def isDelim(c: Char): Boolean =
      c == 0x09 || (c >= 0x20 && c <= 0x2f) || (c >= 0x3b && c <= 0x40) ||
        (c >= 0x5b && c <= 0x60) || (c >= 0x7b && c <= 0x7e)
    val tokens = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    for (c <- s) {
      if (isDelim(c)) { if (cur.nonEmpty) { tokens += cur.toString; cur.clear() } }
      else cur += c
    }
    if (cur.nonEmpty) tokens += cur.toString
    // a production is 1-2 (or 2-4 for year) digits optionally followed by a
    // non-digit and arbitrary octets (§5.1.1 grammar)
    def leadingDigits(t: String, min: Int, max: Int): Option[Int] = {
      var i = 0
      while (i < t.length && t.charAt(i).isDigit) i += 1
      if (i < min || i > max) None
      else if (i < t.length && t.charAt(i).isDigit) None
      else Some(t.substring(0, i).toInt)
    }
    // time = 1*2DIGIT ":" 1*2DIGIT ":" 1*2DIGIT ( non-digit *OCTET )
    def matchTime(t: String): Option[(Int, Int, Int)] = {
      var i = 0
      def field(): Int = {
        val s0 = i
        while (i < t.length && t.charAt(i).isDigit && i - s0 < 2) i += 1
        if (i == s0) -1 else t.substring(s0, i).toInt
      }
      val h = field()
      if (h < 0 || i >= t.length || t.charAt(i) != ':') return None
      i += 1
      val m = field()
      if (m < 0 || i >= t.length || t.charAt(i) != ':') return None
      i += 1
      val sec = field()
      if (sec < 0) return None
      if (i < t.length && t.charAt(i).isDigit) return None // 3+ digit field
      Some((h, m, sec))
    }
    var time: Option[(Int, Int, Int)] = None
    var day: Option[Int] = None
    var month: Option[Int] = None
    var year: Option[Int] = None
    // §5.1.1: each token is matched against the FIRST not-yet-found
    // production, in time → day → month → year order, no backtracking
    for (t <- tokens) {
      val asTime = if (time.isEmpty) matchTime(t) else None
      if (asTime.isDefined) time = asTime
      else if (day.isEmpty && leadingDigits(t, 1, 2).isDefined)
        day = leadingDigits(t, 1, 2)
      else if (month.isEmpty && t.length >= 3 &&
          MonthNames.indexOf(t.substring(0, 3)
            .toLowerCase(java.util.Locale.ROOT)) >= 0)
        month = Some(MonthNames.indexOf(
          t.substring(0, 3).toLowerCase(java.util.Locale.ROOT)) + 1)
      else if (year.isEmpty && leadingDigits(t, 2, 4).isDefined)
        year = leadingDigits(t, 2, 4)
    }
    val y0 = year.getOrElse(return None)
    val y = if (y0 >= 70 && y0 <= 99) y0 + 1900
      else if (y0 >= 0 && y0 <= 69) y0 + 2000 else y0
    val (hh, mm, ss) = time.getOrElse(return None)
    val d = day.getOrElse(return None)
    val mo = month.getOrElse(return None)
    if (d < 1 || d > 31 || y < 1601 || hh > 23 || mm > 59 || ss > 59) return None
    try Some(java.time.LocalDateTime.of(y, mo, d, hh, mm, ss)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    catch { case _: java.time.DateTimeException => None }
  }

  /** Parse ONE Set-Cookie header received at virtual time `nowMs` from a
    * response served by `host` for request path `reqPath`. `clockStartMs`
    * anchors Expires dates (absolute epoch ms of virtual t=0). None =
    * malformed (no '=' in the first segment / empty name — the jar's
    * parse_ns_headers drop) or REJECTED (a Domain attribute the response
    * host doesn't domain-match, `cookies.py` set_cookie_if_ok). */
  def parseOne(header: String, host: String, reqPath: String,
      nowMs: Long, clockStartMs: Long = 0L): Option[ParsedCookie] = {
    if (header == null) return None
    val segs = header.split(";")
    val first = segs(0).trim
    val eq = first.indexOf('=')
    if (eq <= 0) return None
    val name = first.substring(0, eq).trim
    val value = first.substring(eq + 1).trim
    if (name.isEmpty) return None
    var domain: String = null
    var path: String = null
    var maxAge: Option[Long] = None
    var expiresAttr: Option[Long] = None // absolute epoch ms
    var secure = false
    var i = 1
    while (i < segs.length) {
      val seg = segs(i).trim
      val e = seg.indexOf('=')
      val an = (if (e < 0) seg else seg.substring(0, e).trim)
        .toLowerCase(java.util.Locale.ROOT)
      val av = if (e < 0) "" else seg.substring(e + 1).trim
      an match {
        case "domain" if av.nonEmpty =>
          domain = av.stripPrefix(".").toLowerCase(java.util.Locale.ROOT)
        case "path" if av.startsWith("/") => path = av
        case "max-age" => av.toLongOption.foreach(v => maxAge = Some(v))
        case "expires" => // NOTE: a date with a comma (RFC 1123 weekday,)
          // never reaches here intact — the header splitter above is ';'
          // so full "Wdy, DD Mon YYYY" values survive; the §5.1.1 parse
          // is delimiter-tolerant either way
          expiresAttr = parseCookieDate(av)
        case "secure" => secure = true
        case _ => () // HttpOnly/SameSite/unknown — ignored
      }
      i += 1
    }
    val h = host.toLowerCase(java.util.Locale.ROOT)
    val hostOnly = domain == null
    val effDomain = if (hostOnly) h else domain
    if (!hostOnly && !domainMatches(h, effDomain)) return None // rejected
    // Max-Age WINS over Expires (§4.1.2.2); Expires anchors to the virtual
    // timeline via the clock origin — a non-positive virtual date is the
    // already-expired deletion shape
    val expires = maxAge match {
      case Some(v) if v <= 0 => 0L // delete: expired from the epoch origin
      case Some(v) => nowMs + v * 1000L
      case None => expiresAttr match {
        case Some(abs) => math.max(0L, abs - clockStartMs)
        case None => -1L
      }
    }
    Some(ParsedCookie(effDomain, hostOnly,
      if (path == null) defaultPath(reqPath) else path, name, value,
      expires, secure))
  }

  /** Parse a response's Set-Cookie header block (multiple headers
    * newline-separated — one parquet string column holds them all). */
  def parseSetCookies(headerBlock: String, host: String, reqPath: String,
      nowMs: Long, clockStartMs: Long = 0L): Seq[ParsedCookie] =
    if (headerBlock == null) Nil
    else headerBlock.split("\n").toSeq
      .flatMap(h => parseOne(h, host, reqPath, nowMs, clockStartMs))

  /** RFC 6265 §5.4: is a stored cookie sent with a request to
    * (host, reqPath, scheme) at virtual time `nowMs`? Field-splatted so the
    * engine can bind it as a codegen-batch UDF over the jar join. */
  def sendable(host: String, reqPath: String, scheme: String, nowMs: Long,
      domain: String, hostOnly: Boolean, cookiePath: String, expiresMs: Long,
      secure: Boolean): Boolean =
    (if (hostOnly) host == domain else domainMatches(host, domain)) &&
      pathMatches(reqPath, cookiePath) &&
      (expiresMs < 0 || nowMs < expiresMs) &&
      (!secure || scheme == "https")

  /** Domain suffixes of a host that could key a stored cookie — the
    * bounded (≤ label count) explode side of the engine's equi-join
    * against the domain-keyed jar. */
  def domainSuffixes(host: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var h = host
    if (h.nonEmpty) out += h
    var i = h.indexOf('.')
    while (i >= 0) {
      h = h.substring(i + 1)
      if (h.nonEmpty) out += h
      i = h.indexOf('.')
    }
    out.result()
  }

  /** Render from pre-rendered `n=v` pair strings. THE single collation
    * authority for the Cookie header: Scala String ordering (UTF-16 code
    * units). Both the oracle and the engine (via a UDF) call this — a SQL
    * array_sort would sort UTF-8 bytes and diverge on supplementary
    * characters (U+10000+ sorts after U+E000..U+FFFF in UTF-16 surrogates
    * but before in UTF-8), silently breaking the byte-for-byte compare. */
  def renderRendered(rendered: Seq[String]): Option[String] =
    if (rendered.isEmpty) None else Some(rendered.sorted.mkString("; "))

  /** Render a Cookie request header: `n1=v1; n2=v2` sorted by the rendered
    * pair string; None when nothing matches. */
  def renderHeader(cookies: Seq[(String, String)]): Option[String] =
    renderRendered(cookies.map { case (n, v) => s"$n=$v" })
}
