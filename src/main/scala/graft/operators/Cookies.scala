package graft.operators

/** Cookie-jar analogue of the reference CookiesMiddleware
  * (`scrapy/downloadermiddlewares/cookies.py:40-189`), re-expressed for the
  * epoch-BSP engine as a per-host state table (the reference keeps one
  * in-process CookieJar keyed by domain; the per-host table is the same
  * lookup co-partitioned with the rest of the host state).
  *
  * Documented simplifications (the oracle implements the SAME contract, so
  * conformance is exact):
  *  - Set-Cookie is parsed as `name=value` (first `;`-segment); attributes
  *    (Path/Domain/Expires/Secure) are ignored. An empty value deletes.
  *  - The jar is keyed by the response/request HOST — parent-domain cookie
  *    scoping (Domain=.example.com) is not modeled.
  *  - Cookies set by a response become visible at the NEXT epoch (BSP
  *    visibility, like link discoveries); within an epoch the last writer
  *    by global fetch seq wins per (host, name).
  *  - The redirect cross-origin Cookie strip (`redirect.py:92-110`) emerges
  *    naturally: the header is computed from the TARGET host's jar at fetch
  *    time, never copied across hosts.
  */
object Cookies {

  /** Parse a Set-Cookie header value → (name, value); None if malformed. */
  def parseSetCookie(header: String): Option[(String, String)] = {
    if (header == null) return None
    val first = header.split(";", 2)(0).trim
    val eq = first.indexOf('=')
    if (eq <= 0) None
    else Some((first.substring(0, eq).trim, first.substring(eq + 1).trim))
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
    * pair string; None when the jar holds nothing for the host. */
  def renderHeader(cookies: Seq[(String, String)]): Option[String] =
    renderRendered(cookies.map { case (n, v) => s"$n=$v" })
}
