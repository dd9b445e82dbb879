package graft.urlkit

/** W3C Referrer-Policy implementation — reference
  * `scrapy/spidermiddlewares/referer.py:49-307` (all 9 policies) and
  * `scrapy/utils/url.py:159-204` (`strip_url`).
  *
  * A policy maps (parent response URL, outgoing request URL) to the
  * Referer header value to attach (None = omit the header). The engine
  * applies the parent page's Referrer-Policy header when present, else the
  * configured default (`referer.py:333-371` RefererMiddleware.policy,
  * minus request-meta overrides, which have no analogue in a frontier row).
  */
object Referer {

  /** `scrapy/utils/url.py:159-204` strip_url. */
  def stripUrl(url: String,
      stripCredentials: Boolean = true,
      stripDefaultPort: Boolean = true,
      originOnly: Boolean = false,
      stripFragment: Boolean = true): String = {
    val p = PyUrl.urlparse(url)
    var netloc = p.netloc
    val (user, pass) = PyUrl.userinfo(p.netloc)
    if ((stripCredentials || originOnly) &&
        (user.exists(_.nonEmpty) || pass.exists(_.nonEmpty))) {
      netloc = netloc.split("@").last
    }
    val port = PyUrl.port(p.netloc)
    if (stripDefaultPort && port.isDefined &&
        Set(("http", 80), ("https", 443), ("ftp", 21)).contains((p.scheme, port.get))) {
      netloc = netloc.replace(s":${port.get}", "")
    }
    PyUrl.urlunparse(
      p.scheme, netloc,
      if (originOnly) "/" else p.path,
      if (originOnly) "" else p.params,
      if (originOnly) "" else p.query,
      if (stripFragment) "" else p.fragment)
  }

  /** Scheme per urlparse's rule ([a-zA-Z][a-zA-Z0-9+.-]* before ':'),
    * without paying a full parse — this runs per extracted link. */
  private def schemeOf(url: String): String = {
    val i = url.indexOf(':')
    if (i <= 0) return ""
    val c0 = url.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return ""
    var k = 1
    while (k < i) {
      val c = url.charAt(k)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
      if (!ok) return ""
      k += 1
    }
    url.substring(0, i).toLowerCase(java.util.Locale.ROOT)
  }

  // Per-thread last-value memo for the link-INDEPENDENT policy pieces: one
  // page's links all evaluate against the same response URL, so the full
  // strip_url / origin parses run once per page instead of once per link.
  // Pure-function caching — results are byte-identical.
  private val stripMemo = new ThreadLocal[Array[AnyRef]] {
    override def initialValue(): Array[AnyRef] = new Array[AnyRef](6)
  }
  private def stripDefaultCached(url: String): String = {
    val c = stripMemo.get()
    if (url == c(0)) c(1).asInstanceOf[String]
    else { val v = stripUrl(url); c(0) = url; c(1) = v; v }
  }
  // LRU-2 for origin: same-origin-style policies probe BOTH the (fixed)
  // response origin and each link's origin — one slot would thrash
  private def originCached(url: String): String = {
    val c = stripMemo.get()
    if (url == c(2)) c(3).asInstanceOf[String]
    else if (url == c(4)) { // promote to MRU
      val v = c(5).asInstanceOf[String]
      val u0 = c(2); val v0 = c(3)
      c(2) = url; c(3) = v; c(4) = u0; c(5) = v0
      v
    } else { // miss: evict the LRU slot
      val v = stripUrl(url, originOnly = true)
      c(4) = c(2); c(5) = c(3)
      c(2) = url; c(3) = v
      v
    }
  }

  /** about/blob/data/filesystem (`referer.py:31-36`). */
  val LocalSchemes: Set[String] = Set("about", "blob", "data", "filesystem")

  sealed abstract class Policy(val name: String) {
    /** schemes that never leak a referrer (`referer.py:54`). */
    def noReferrerSchemes: Set[String] = LocalSchemes

    def referrer(responseUrl: String, requestUrl: String): Option[String]

    protected def strippedReferrer(url: String): Option[String] =
      if (!noReferrerSchemes.contains(schemeOf(url))) Some(stripDefaultCached(url))
      else None

    protected def originReferrer(url: String): Option[String] =
      if (!noReferrerSchemes.contains(schemeOf(url))) Some(origin(url)) else None

    protected def origin(url: String): String = originCached(url)

    protected def tlsProtected(url: String): Boolean =
      Set("https", "ftps").contains(schemeOf(url))

    protected def potentiallyTrustworthy(url: String): Boolean =
      schemeOf(url) != "data" && tlsProtected(url)
  }

  case object NoReferrer extends Policy("no-referrer") {
    def referrer(responseUrl: String, requestUrl: String): Option[String] = None
  }

  case object NoReferrerWhenDowngrade extends Policy("no-referrer-when-downgrade") {
    def referrer(responseUrl: String, requestUrl: String): Option[String] =
      if (!tlsProtected(responseUrl) || tlsProtected(requestUrl))
        strippedReferrer(responseUrl)
      else None
  }

  case object SameOrigin extends Policy("same-origin") {
    def referrer(responseUrl: String, requestUrl: String): Option[String] =
      if (origin(responseUrl) == origin(requestUrl)) strippedReferrer(responseUrl)
      else None
  }

  case object Origin extends Policy("origin") {
    def referrer(responseUrl: String, requestUrl: String): Option[String] =
      originReferrer(responseUrl)
  }

  case object StrictOrigin extends Policy("strict-origin") {
    def referrer(responseUrl: String, requestUrl: String): Option[String] =
      if ((tlsProtected(responseUrl) && potentiallyTrustworthy(requestUrl)) ||
          !tlsProtected(responseUrl))
        originReferrer(responseUrl)
      else None
  }

  case object OriginWhenCrossOrigin extends Policy("origin-when-cross-origin") {
    def referrer(responseUrl: String, requestUrl: String): Option[String] = {
      val o = origin(responseUrl)
      if (o == origin(requestUrl)) strippedReferrer(responseUrl) else Some(o)
    }
  }

  case object StrictOriginWhenCrossOrigin extends Policy("strict-origin-when-cross-origin") {
    def referrer(responseUrl: String, requestUrl: String): Option[String] = {
      val o = origin(responseUrl)
      if (o == origin(requestUrl)) strippedReferrer(responseUrl)
      else if ((tlsProtected(responseUrl) && potentiallyTrustworthy(requestUrl)) ||
          !tlsProtected(responseUrl))
        originReferrer(responseUrl)
      else None
    }
  }

  case object UnsafeUrl extends Policy("unsafe-url") {
    def referrer(responseUrl: String, requestUrl: String): Option[String] =
      strippedReferrer(responseUrl)
  }

  /** no-referrer-when-downgrade + never leak file:// or s3:// parents
    * (`referer.py:291-299`, the reference's default). */
  case object ScrapyDefault extends Policy("scrapy-default") {
    override def noReferrerSchemes: Set[String] = LocalSchemes ++ Set("file", "s3")
    def referrer(responseUrl: String, requestUrl: String): Option[String] =
      if (!tlsProtected(responseUrl) || tlsProtected(requestUrl))
        strippedReferrer(responseUrl)
      else None
  }

  val AllPolicies: Seq[Policy] = Seq(
    NoReferrer, NoReferrerWhenDowngrade, SameOrigin, Origin, StrictOrigin,
    OriginWhenCrossOrigin, StrictOriginWhenCrossOrigin, UnsafeUrl, ScrapyDefault)

  private val byName: Map[String, Policy] =
    AllPolicies.map(p => p.name -> p).toMap +
      // empty string → no-referrer-when-downgrade (W3C empty-policy rule,
      // `referer.py:310-311`)
      ("" -> NoReferrerWhenDowngrade)

  /** Parse a Referrer-Policy header per
    * https://www.w3.org/TR/referrer-policy/#parse-referrer-policy-from-header
    * (`referer.py:314-331`): rightmost known token wins; unknown/absent →
    * None (caller falls back to the configured default). */
  def fromHeader(header: String): Option[Policy] = {
    if (header == null) return None
    // split limit -1: a trailing empty token ("same-origin,") must survive —
    // the rightmost "" resolves to no-referrer-when-downgrade per the W3C
    // empty-string rule (`referer.py` _load_policy_class + `:310-311`)
    header.toLowerCase(java.util.Locale.ROOT).split(",", -1).map(_.trim)
      .reverseIterator.collectFirst { case t if byName.contains(t) => byName(t) }
  }

  /** Policy for a parent response: its Referrer-Policy header if valid,
    * else the configured default. */
  def policyFor(header: String, default: Policy): Policy =
    fromHeader(header).getOrElse(default)

  def named(name: String): Policy =
    byName.getOrElse(name, throw new IllegalArgumentException(s"unknown policy $name"))
}
