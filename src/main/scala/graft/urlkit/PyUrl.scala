package graft.urlkit

/** Faithful Scala mirror of the slice of CPython `urllib.parse` (3.13) that
  * w3lib's URL canonicalization depends on. Public-knowledge reimplementation;
  * behavior pinned by golden tests derived from
  * `/root/reference/tests/test_utils_request.py:65-141` (fingerprint hashes)
  * and w3lib's documented semantics.
  *
  * Only the pieces the crawl engine needs are mirrored: urlsplit/urlparse,
  * quote/unquote, urlunparse/urlunsplit, urljoin, hostname/port extraction.
  */
object PyUrl {

  /** urlsplit result. `hasNetloc` distinguishes `http://h/p` from `mailto:x`. */
  final case class Split(
      scheme: String,
      netloc: String,
      path: String,
      query: String,
      fragment: String)

  /** urlparse result (Split + `;params` peeled off the last path segment). */
  final case class Parse(
      scheme: String,
      netloc: String,
      path: String,
      params: String,
      query: String,
      fragment: String)

  // Schemes that use a network location / support relative resolution
  // (CPython urllib.parse.uses_netloc / uses_relative).
  val usesNetloc: Set[String] = Set(
    "", "ftp", "http", "gopher", "nntp", "telnet", "imap", "wais", "file",
    "mms", "https", "shttp", "snews", "prospero", "rtsp", "rtspu", "rsync",
    "svn", "svn+ssh", "sftp", "nfs", "git", "git+ssh", "ws", "wss",
    "itms-services")
  val usesRelative: Set[String] = Set(
    "", "ftp", "http", "gopher", "nntp", "imap", "wais", "file", "https",
    "shttp", "mms", "prospero", "rtsp", "rtspu", "sftp", "svn", "svn+ssh",
    "ws", "wss")

  private def isSchemeChar(c: Char): Boolean =
    c.isLetterOrDigit && c < 128 || c == '+' || c == '-' || c == '.'

  /** CPython 3.13 urlsplit: strips leading/trailing C0-control/space, removes
    * ASCII tab/CR/LF anywhere, then splits scheme://netloc/path?query#frag. */
  def urlsplit(rawUrl: String, defaultScheme: String = "", allowFragments: Boolean = true): Split = {
    var url = stripC0(rawUrl)
    url = removeTabNewline(url)
    var scheme = defaultScheme
    val colon = url.indexOf(':')
    if (colon > 0) {
      val cand = url.substring(0, colon)
      if (cand.charAt(0).isLetter && cand.charAt(0) < 128 && cand.forall(isSchemeChar)) {
        scheme = cand.toLowerCase(java.util.Locale.ROOT)
        url = url.substring(colon + 1)
      }
    }
    var netloc = ""
    if (url.startsWith("//")) {
      val rest = url.substring(2)
      val end0 = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
      val end = if (end0 < 0) rest.length else end0
      netloc = rest.substring(0, end)
      url = rest.substring(end)
    }
    var fragment = ""
    if (allowFragments) {
      val h = url.indexOf('#')
      if (h >= 0) { fragment = url.substring(h + 1); url = url.substring(0, h) }
    }
    var query = ""
    val q = url.indexOf('?')
    if (q >= 0) { query = url.substring(q + 1); url = url.substring(0, q) }
    Split(scheme, netloc, url, query, fragment)
  }

  /** CPython urlparse: urlsplit + split `;params` off the last path segment. */
  def urlparse(url: String, defaultScheme: String = "", allowFragments: Boolean = true): Parse = {
    val s = urlsplit(url, defaultScheme, allowFragments)
    val (path, params) =
      if (s.path.contains(';')) splitParams(s.path) else (s.path, "")
    Parse(s.scheme, s.netloc, path, params, s.query, s.fragment)
  }

  private def splitParams(url: String): (String, String) = {
    val i =
      if (url.contains('/')) url.indexOf(';', url.lastIndexOf('/'))
      else url.indexOf(';')
    if (i < 0) (url, "") else (url.substring(0, i), url.substring(i + 1))
  }

  def urlunsplit(scheme: String, netloc: String, path0: String, query: String, fragment: String): String = {
    var url = path0
    if (netloc.nonEmpty) {
      if (url.nonEmpty && !url.startsWith("/")) url = "/" + url
      url = "//" + netloc + url
    } else if (url.startsWith("//")) {
      url = "//" + url
    } else if (scheme.nonEmpty && usesNetloc.contains(scheme) && (url.isEmpty || url.startsWith("/"))) {
      url = "//" + url
    }
    if (scheme.nonEmpty) url = scheme + ":" + url
    if (query.nonEmpty) url = url + "?" + query
    if (fragment.nonEmpty) url = url + "#" + fragment
    url
  }

  def urlunparse(scheme: String, netloc: String, path: String, params: String, query: String, fragment: String): String = {
    val p = if (params.nonEmpty) path + ";" + params else path
    urlunsplit(scheme, netloc, p, query, fragment)
  }

  /** Strip leading/trailing C0 control chars and space (CPython 3.13 /
    * WHATWG behavior shared by urlsplit and w3lib's `_strip`). */
  def stripC0(s: String): String = {
    var i = 0; var j = s.length
    while (i < j && s.charAt(i) <= ' ') i += 1
    while (j > i && s.charAt(j - 1) <= ' ') j -= 1
    s.substring(i, j)
  }

  /** Remove ASCII tab/CR/LF anywhere (CPython `_UNSAFE_URL_BYTES_TO_REMOVE`,
    * also w3lib `_ASCII_TAB_OR_NEWLINE` translation). */
  def removeTabNewline(s: String): String =
    if (s.exists(c => c == '\t' || c == '\r' || c == '\n'))
      s.filterNot(c => c == '\t' || c == '\r' || c == '\n')
    else s

  // ---- netloc pieces (CPython SplitResult.hostname/.port/.username/.password)

  /** Part of netloc after the last '@' (host[:port]). */
  def hostPort(netloc: String): String = {
    val at = netloc.lastIndexOf('@')
    if (at >= 0) netloc.substring(at + 1) else netloc
  }

  /** Lowercased hostname, brackets stripped for IPv6; None if empty. */
  def hostname(netloc: String): Option[String] = {
    val hp = hostPort(netloc)
    val host =
      if (hp.startsWith("[")) {
        val close = hp.indexOf(']')
        if (close >= 0) hp.substring(0, close + 1) else hp
      } else {
        val colon = hp.indexOf(':')
        if (colon >= 0) hp.substring(0, colon) else hp
      }
    if (host.isEmpty) None else Some(host.toLowerCase(java.util.Locale.ROOT))
  }

  /** Port digits after the last ':' (outside brackets); None if absent/empty. */
  def port(netloc: String): Option[Int] = {
    val hp = hostPort(netloc)
    val start = if (hp.startsWith("[")) hp.indexOf(']') max 0 else 0
    val colon = hp.indexOf(':', start)
    if (colon < 0) None
    else {
      val p = hp.substring(colon + 1)
      if (p.nonEmpty && p.forall(_.isDigit)) Some(p.toInt) else None
    }
  }

  def userinfo(netloc: String): (Option[String], Option[String]) = {
    val at = netloc.lastIndexOf('@')
    if (at < 0) (None, None)
    else {
      val ui = netloc.substring(0, at)
      val colon = ui.indexOf(':')
      if (colon < 0) (Some(ui), None)
      else (Some(ui.substring(0, colon)), Some(ui.substring(colon + 1)))
    }
  }

  // ---- percent-encoding (CPython quote/unquote semantics)

  /** CPython's `always_safe`: never percent-encoded by quote(). */
  private def alwaysSafe(b: Byte): Boolean = {
    val c = (b & 0xff).toChar
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
    c == '_' || c == '.' || c == '-' || c == '~'
  }

  private val hexUpper = "0123456789ABCDEF"

  /** CPython `urllib.parse.quote` over raw bytes with an explicit safe set. */
  def quoteBytes(bytes: Array[Byte], safe: String): String = {
    val sb = new StringBuilder(bytes.length + 8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      val c = (b & 0xff).toChar
      if (alwaysSafe(b) || (b >= 0 && safe.indexOf(c) >= 0)) sb.append(c)
      else {
        sb.append('%')
        sb.append(hexUpper.charAt((b & 0xf0) >> 4))
        sb.append(hexUpper.charAt(b & 0x0f))
      }
      i += 1
    }
    sb.toString
  }

  def quote(s: String, safe: String): String =
    quoteBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), safe)

  /** CPython `unquote_to_bytes`: decode %XX pairs, keep malformed '%' as-is. */
  def unquoteToBytes(s: String): Array[Byte] = {
    val in = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new java.io.ByteArrayOutputStream(in.length)
    var i = 0
    def hexVal(b: Byte): Int = {
      val c = (b & 0xff).toChar
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    }
    while (i < in.length) {
      if (in(i) == '%' && i + 2 < in.length) {
        val h = hexVal(in(i + 1)); val l = hexVal(in(i + 2))
        if (h >= 0 && l >= 0) { out.write((h << 4) | l); i += 3 }
        else { out.write(in(i)); i += 1 }
      } else { out.write(in(i)); i += 1 }
    }
    out.toByteArray
  }

  /** CPython `unquote` (str result, UTF-8, errors='replace'). */
  def unquote(s: String): String =
    new String(unquoteToBytes(s), java.nio.charset.StandardCharsets.UTF_8)

  /** CPython `quote_plus` over bytes, safe='' (as used by urlencode). */
  def quotePlusBytes(bytes: Array[Byte]): String = {
    if (bytes.contains(' '.toByte)) quoteBytes(bytes, " ").replace(' ', '+')
    else quoteBytes(bytes, "")
  }

  /** CPython `urljoin` (RFC 3986 resolution with urllib quirks). */
  def urljoin(base: String, url: String, allowFragments: Boolean = true): String = {
    if (base.isEmpty) return url
    if (url.isEmpty) return base
    val b = urlparse(base, "", allowFragments)
    val u = urlparse(url, b.scheme, allowFragments)
    if (u.scheme != b.scheme || !usesRelative.contains(u.scheme)) return url
    var netloc = u.netloc
    if (usesNetloc.contains(u.scheme)) {
      if (netloc.nonEmpty)
        return urlunparse(u.scheme, netloc, u.path, u.params, u.query, u.fragment)
      netloc = b.netloc
    }
    if (u.path.isEmpty && u.params.isEmpty) {
      val query = if (u.query.isEmpty) b.query else u.query
      return urlunparse(u.scheme, netloc, b.path, b.params, query, u.fragment)
    }
    val baseParts = {
      val parts = b.path.split("/", -1).toBuffer
      if (parts.nonEmpty && parts.last != "") parts.remove(parts.length - 1)
      parts
    }
    val segments: scala.collection.mutable.Buffer[String] =
      if (u.path.startsWith("/")) u.path.split("/", -1).toBuffer
      else {
        val segs = baseParts ++ u.path.split("/", -1).toBuffer
        // CPython: segments[1:-1] = filter(None, segments[1:-1])
        if (segs.length > 2) {
          val head = segs.head; val last = segs.last
          val mid = segs.slice(1, segs.length - 1).filter(_.nonEmpty)
          (scala.collection.mutable.Buffer(head) ++ mid) :+ last
        } else segs
      }
    val resolved = scala.collection.mutable.Buffer.empty[String]
    for (seg <- segments) {
      if (seg == "..") { if (resolved.nonEmpty) resolved.remove(resolved.length - 1) }
      else if (seg == ".") ()
      else resolved += seg
    }
    if (segments.nonEmpty && (segments.last == "." || segments.last == ".."))
      resolved += ""
    val path = {
      val joined = resolved.mkString("/")
      if (joined.isEmpty) "/" else joined
    }
    urlunparse(u.scheme, netloc, path, u.params, u.query, u.fragment)
  }
}
