package graft.urlkit

import java.nio.charset.StandardCharsets.UTF_8

/** URL sanitization + canonicalization with w3lib semantics (public BSD
  * library; reimplemented from its documented behavior, NOT ported), plus the
  * request fingerprint of the reference engine.
  *
  * Behavior pins:
  *  - 15 golden SHA-1 fingerprints: `/root/reference/tests/test_utils_request.py:65-141`
  *  - canonicalization properties (query order invariance, fragments, blank
  *    params): same file `:143-152,186-192` and `scrapy/utils/request.py:35-97`.
  */
object UrlKit {

  // w3lib safe-char sets (RFC 3986 classes + w3lib extras).
  private val RFC3986_GEN_DELIMS = ":/?#[]@"
  private val RFC3986_SUB_DELIMS = "!$&'()*+,;="
  private val RFC3986_RESERVED = RFC3986_GEN_DELIMS + RFC3986_SUB_DELIMS
  // unreserved alnum handled by quote()'s always-safe set already
  private val EXTRA_SAFE_CHARS = "|"
  private val SAFE_CHARS = RFC3986_RESERVED + EXTRA_SAFE_CHARS + "%"
  private val PATH_SAFE_CHARS = SAFE_CHARS.filterNot(_ == '#')
  private val USERINFO_SAFE_CHARS = RFC3986_SUB_DELIMS + ":"

  /** Python-`str.encode("idna")` ASCII fast path: identity when every label
    * is 1..63 chars (last may be empty); UnicodeError → None. Non-ASCII goes
    * through java.net.IDN (close enough; the corpus keeps hosts ASCII). */
  private def idnaEncode(netloc: String): Option[String] = {
    if (netloc.isEmpty) return Some(netloc)
    if (netloc.forall(_ < 128)) {
      val labels = netloc.split("\\.", -1)
      val init = labels.dropRight(1)
      if (init.exists(l => l.isEmpty || l.length >= 64) || labels.last.length >= 64) None
      else Some(netloc)
    } else {
      try Some(java.net.IDN.toASCII(netloc)) catch { case _: Exception => None }
    }
  }

  /** w3lib `safe_url_string` — sanitize a raw href into an RFC-safe ASCII URL.
    * Mirrors: strip C0/space ends + tab/newline anywhere, IDNA host,
    * percent-encode path/query/fragment with w3lib's safe sets, rebuild
    * userinfo. (Used by the reference's `Request.__init__`:
    * `scrapy/http/request/__init__.py:232`.) */
  def safeUrlString(url: String): String = safeUrlString(url, UTF_8)

  /** w3lib signature `safe_url_string(url, encoding)`: the page encoding
    * drives the QUERY and FRAGMENT byte encoding (path stays UTF-8 —
    * w3lib's separate `path_encoding` default). A character the encoding
    * can't represent raises UnicodeEncodeError in Python (a ValueError);
    * here the strict encoder throws CharacterCodingException — callers
    * that mirror the reference's link-skip catch it. */
  def safeUrlString(url: String, encoding: java.nio.charset.Charset): String = {
    val stripped = PyUrl.removeTabNewline(PyUrl.stripC0(url))
    val parts = PyUrl.urlsplit(stripped)
    val (username, password) = PyUrl.userinfo(parts.netloc)
    val hostnameOpt = PyUrl.hostname(parts.netloc)
    val portOpt = PyUrl.port(parts.netloc)
    val netloc = new StringBuilder
    if (username.isDefined || password.isDefined) {
      username.foreach(u => netloc.append(PyUrl.quote(PyUrl.unquote(u), USERINFO_SAFE_CHARS)))
      password.foreach { p =>
        netloc.append(':')
        netloc.append(PyUrl.quote(PyUrl.unquote(p), USERINFO_SAFE_CHARS))
      }
      netloc.append('@')
    }
    hostnameOpt.foreach { h =>
      netloc.append(idnaEncode(h).getOrElse(h))
    }
    portOpt.foreach { p => netloc.append(':').append(p.toString) }
    val path = PyUrl.quoteBytes(parts.path.getBytes(UTF_8), PATH_SAFE_CHARS)
    val query = PyUrl.quoteBytes(encodeStrict(parts.query, encoding), SAFE_CHARS)
    val fragment =
      PyUrl.quoteBytes(encodeStrict(parts.fragment, encoding), SAFE_CHARS)
    PyUrl.urlunsplit(parts.scheme, netloc.toString, path, query, fragment)
  }

  /** Python `str.encode(encoding)` — strict, raises on unmappable (the
    * UTF-8 fast path can never fail on valid UTF-16 input). */
  private[urlkit] def encodeStrict(s: String,
      cs: java.nio.charset.Charset): Array[Byte] = {
    if (cs == UTF_8 || s.isEmpty) return s.getBytes(UTF_8)
    val enc = cs.newEncoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    val bb = enc.encode(java.nio.CharBuffer.wrap(s)) // throws on unmappable
    val arr = new Array[Byte](bb.remaining())
    bb.get(arr)
    arr
  }

  /** w3lib `_unquotepath`: protect %2F/%3F (encoded '/' '?') as literal
    * uppercase escapes, then decode every other %XX to raw bytes. */
  private def unquotePath(path: String): Array[Byte] = {
    var p = path
    for (r <- Seq("2f", "2F", "3f", "3F"))
      p = p.replace("%" + r, "%25" + r.toUpperCase(java.util.Locale.ROOT))
    PyUrl.unquoteToBytes(p)
  }

  /** w3lib `parse_qsl_to_bytes(qs, keep_blank_values=True)`:
    * split on '&' ONLY (CPython >= 3.10 parse_qsl and current w3lib no
    * longer treat ';' as a pair separator — ';' stays inside values and is
    * percent-encoded on re-serialization; pinned by the
    * "semicolon stays inside a query value" golden in CanonicalizeSpec),
    * '+'→' ', percent-decode names and values to raw bytes. */
  private def parseQslToBytes(qs: String): Seq[(Array[Byte], Array[Byte])] = {
    val pairs = qs.split("&", -1)
    pairs.iterator.filter(_.nonEmpty).map { nv =>
      val eq = nv.indexOf('=')
      val (n, v) = if (eq < 0) (nv, "") else (nv.substring(0, eq), nv.substring(eq + 1))
      (PyUrl.unquoteToBytes(n.replace('+', ' ')), PyUrl.unquoteToBytes(v.replace('+', ' ')))
    }.toSeq
  }

  private def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(a.length, b.length)
  }

  /** w3lib `canonicalize_url`:
    *  - sort query pairs (bytewise, by key then value), keep blank values,
    *    re-encode via quote_plus
    *  - percent-decode then re-encode the path (normalizes %xx case), '/'-default
    *  - lowercase netloc (IDNA-encoded when possible), strip trailing ':'
    *  - drop the fragment unless keepFragments.
    * Reference use: `scrapy/utils/request.py:87-97` (fingerprint),
    * `scrapy/linkextractors/lxmlhtml.py:56-58` (link dedup key). */
  def canonicalizeUrl(url: String, keepFragments: Boolean = false): String = {
    val p = PyUrl.urlparse(url)
    // _safe_ParseResult: idna netloc (fallback raw), quote each part keeping %
    val netloc0 = idnaEncode(p.netloc).getOrElse(p.netloc)
    val pathQ = PyUrl.quoteBytes(p.path.getBytes(UTF_8), PATH_SAFE_CHARS)
    val paramsQ = PyUrl.quoteBytes(p.params.getBytes(UTF_8), SAFE_CHARS)
    val queryQ = PyUrl.quoteBytes(p.query.getBytes(UTF_8), SAFE_CHARS)
    val fragmentQ = PyUrl.quoteBytes(p.fragment.getBytes(UTF_8), SAFE_CHARS)

    val keyvals = parseQslToBytes(queryQ).sortWith { (a, b) =>
      val c = compareBytes(a._1, b._1)
      if (c != 0) c < 0 else compareBytes(a._2, b._2) < 0
    }
    val query = keyvals
      .map { case (k, v) => PyUrl.quotePlusBytes(k) + "=" + PyUrl.quotePlusBytes(v) }
      .mkString("&")

    val path = {
      val q = PyUrl.quoteBytes(unquotePath(pathQ), PATH_SAFE_CHARS)
      if (q.isEmpty) "/" else q
    }
    val fragment = if (keepFragments) fragmentQ else ""
    val netloc = {
      var n = netloc0.toLowerCase(java.util.Locale.ROOT)
      while (n.endsWith(":")) n = n.substring(0, n.length - 1)
      n
    }
    PyUrl.urlunparse(p.scheme, netloc, path, paramsQ, query, fragment)
  }

  /** Hostname of a (sanitized) URL, "" when absent — the politeness slot key
    * (reference: `scrapy/core/downloader/__init__.py:169-177`). */
  def hostOf(url: String): String =
    PyUrl.hostname(PyUrl.urlsplit(url).netloc).getOrElse("")

  /** Resolve a (possibly relative) href against a base URL — CPython urljoin. */
  def urljoin(base: String, href: String): String = PyUrl.urljoin(base, href)

  /** RedirectMiddleware Location resolution (`redirect.py:163-168`):
    * `safe_url_string` the raw header; a scheme-relative Location (leading
    * `//`) becomes request-scheme + "://" + location stripped of ALL
    * leading slashes — the reference's guard against urljoin's handling of
    * `///host/path` (which would otherwise resolve as an absolute PATH on
    * the request's host); then urljoin against the request URL. The caller
    * applies the Request-constructor `safe_url_string` to the result and
    * gates on the target scheme (http/https only, `redirect.py:172-173`). */
  def redirectTarget(requestUrl: String, location: String): String = {
    var loc = safeUrlString(location)
    if (location.startsWith("//")) {
      val scheme = PyUrl.urlparse(requestUrl).scheme
      loc = scheme + "://" + loc.dropWhile(_ == '/')
    }
    urljoin(requestUrl, loc)
  }

  /** The redirect scheme gate (`redirect.py:172-173`): only http/https
    * targets redirect; anything else passes the response through. */
  def redirectSchemeOk(targetUrl: String): Boolean = {
    val s = PyUrl.urlparse(targetUrl).scheme
    s == "http" || s == "https"
  }

  // ---- fingerprint -------------------------------------------------------

  private val hexLower = "0123456789abcdef"
  def toHex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    for (b <- bytes) {
      sb.append(hexLower.charAt((b & 0xf0) >> 4))
      sb.append(hexLower.charAt(b & 0x0f))
    }
    sb.toString
  }

  /** `json.dumps(s)`-compatible string escape (ensure_ascii=True). */
  private def jsonStr(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case c if c < ' ' || c > '~' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  /** Reference request fingerprint (`scrapy/utils/request.py:35-97`):
    * SHA-1 over the sorted-key JSON of
    * `{"body": hex, "headers": {...}, "method": m, "url": canonical}` with
    * CPython `json.dumps` default separators `", "`/`": "`.
    *
    * `url` must already be Request-sanitized (see [[safeUrlString]]);
    * `includeHeaders` are (lowercased-name → values) pairs, pre-sorted by name.
    */
  def fingerprint(
      url: String,
      method: String = "GET",
      body: Array[Byte] = Array.emptyByteArray,
      includeHeaders: Seq[(String, Seq[String])] = Nil,
      keepFragments: Boolean = false): Array[Byte] = {
    val canonical = canonicalizeUrl(url, keepFragments)
    val headersJson =
      if (includeHeaders.isEmpty) "{}"
      else includeHeaders
        .map { case (name, values) =>
          val nameHex = toHex(name.toLowerCase(java.util.Locale.ROOT).getBytes(UTF_8))
          val valsJson = values.map(v => jsonStr(toHex(v.getBytes(UTF_8)))).mkString(", ")
          s"${jsonStr(nameHex)}: [$valsJson]"
        }
        .sorted // sort_keys=True over the hex names
        .mkString("{", ", ", "}")
    val json = new StringBuilder(256)
    json.append("{\"body\": ").append(jsonStr(toHex(body)))
    json.append(", \"headers\": ").append(headersJson)
    json.append(", \"method\": ").append(jsonStr(method))
    json.append(", \"url\": ").append(jsonStr(canonical))
    json.append('}')
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.digest(json.toString.getBytes(UTF_8))
  }

  /** First 8 bytes of the fingerprint as a signed long — partition key for
    * url_seen bucketing (uniform by construction). */
  def fpHash64(fp: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (fp(i) & 0xffL); i += 1 }
    v
  }
}
