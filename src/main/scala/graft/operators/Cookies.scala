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
  *    never sent). `Expires` carries a wall-clock date the virtual
  *    timeline cannot interpret — ignored (documented deviation; the
  *    corpus uses Max-Age).
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

  /** Parse ONE Set-Cookie header received at virtual time `nowMs` from a
    * response served by `host` for request path `reqPath`. None =
    * malformed (no '=' in the first segment / empty name — the jar's
    * parse_ns_headers drop) or REJECTED (a Domain attribute the response
    * host doesn't domain-match, `cookies.py` set_cookie_if_ok). */
  def parseOne(header: String, host: String, reqPath: String,
      nowMs: Long): Option[ParsedCookie] = {
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
        case "secure" => secure = true
        case _ => () // Expires (wall-clock date)/HttpOnly/SameSite/unknown
      }
      i += 1
    }
    val h = host.toLowerCase(java.util.Locale.ROOT)
    val hostOnly = domain == null
    val effDomain = if (hostOnly) h else domain
    if (!hostOnly && !domainMatches(h, effDomain)) return None // rejected
    val expires = maxAge match {
      case Some(v) if v <= 0 => 0L // delete: expired from the epoch origin
      case Some(v) => nowMs + v * 1000L
      case None => -1L
    }
    Some(ParsedCookie(effDomain, hostOnly,
      if (path == null) defaultPath(reqPath) else path, name, value,
      expires, secure))
  }

  /** Parse a response's Set-Cookie header block (multiple headers
    * newline-separated — one parquet string column holds them all). */
  def parseSetCookies(headerBlock: String, host: String, reqPath: String,
      nowMs: Long): Seq[ParsedCookie] =
    if (headerBlock == null) Nil
    else headerBlock.split("\n").toSeq
      .flatMap(h => parseOne(h, host, reqPath, nowMs))

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
