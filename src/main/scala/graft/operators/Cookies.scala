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

  /** Render a Cookie request header: `n1=v1; n2=v2` sorted by the rendered
    * pair string (matches the engine's array_sort over the same strings);
    * None when the jar holds nothing for the host (header omitted). */
  def renderHeader(cookies: Seq[(String, String)]): Option[String] =
    if (cookies.isEmpty) None
    else Some(cookies.map { case (n, v) => s"$n=$v" }.sorted.mkString("; "))
}
