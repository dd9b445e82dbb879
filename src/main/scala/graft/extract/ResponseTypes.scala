package graft.extract

/** Response-class dispatch (`scrapy/responsetypes.py`): given HTTP headers, a
  * URL/filename, or body bytes, pick the most specific response class. The
  * class decides whether a response is parseable text and whether the HTML
  * link/selector stages run (`spiders/crawl.py:140-141` ignores
  * non-HtmlResponse; `FileDownloadHandler`/`DataURIDownloadHandler` both call
  * `responsetypes.from_args` / `from_mimetype` to type their responses,
  * `handlers/file.py:20-24`, `handlers/datauri.py:19-27`).
  *
  * The class lattice is modeled as a 5-value enum ([[RespClass]]) —
  * Response / TextResponse / HtmlResponse / XmlResponse / JsonResponse are
  * the only classes the reference table produces.
  *
  * `from_filename` runs CPython's `mimetypes.MimeTypes.guess_type` algorithm
  * (suffix re-map → encoding-suffix strip → extension table): an encoding
  * suffix (`.gz` …) forces plain `Response` even when the inner extension is
  * typed, exactly like the reference (`responsetypes.py:100-105`). The
  * extension table is a curated subset of CPython's builtin map merged with
  * the entries `scrapy/mime.types` overrides — covering the web-relevant
  * extensions, not the full Apache registry.
  *
  * Everything here is a pure per-row function, usable inside fetch-batch
  * `map` stages on executors.
  */
object ResponseTypes {

  sealed trait RespClass { def isText: Boolean = this != RPlain }
  /** `scrapy.http.Response` — opaque binary. */
  case object RPlain extends RespClass
  case object RText extends RespClass
  case object RHtml extends RespClass
  case object RXml extends RespClass
  case object RJson extends RespClass

  /** `ResponseTypes.CLASSES` (`responsetypes.py:22-38`). */
  private val classes: Map[String, RespClass] = Map(
    "text/html" -> RHtml,
    "application/atom+xml" -> RXml,
    "application/rdf+xml" -> RXml,
    "application/rss+xml" -> RXml,
    "application/xhtml+xml" -> RHtml,
    "application/vnd.wap.xhtml+xml" -> RHtml,
    "application/xml" -> RXml,
    "application/json" -> RJson,
    "application/x-json" -> RJson,
    "application/json-amazonui-streaming" -> RJson,
    "application/javascript" -> RText,
    "application/x-javascript" -> RText,
    "text/xml" -> RXml,
    "text/*" -> RText)

  /** Extension → mimetype: CPython `mimetypes` builtins merged with the
    * `scrapy/mime.types` overrides (readfp add_type wins for a shared ext —
    * e.g. `.xml` → application/xml). Curated to the web-relevant rows. */
  private val typesMap: Map[String, String] = Map(
    "html" -> "text/html", "htm" -> "text/html", "shtml" -> "text/html",
    "xhtml" -> "application/xhtml+xml", "xht" -> "application/xhtml+xml",
    "txt" -> "text/plain", "asc" -> "text/plain", "text" -> "text/plain",
    "pot" -> "text/plain", "brf" -> "text/plain",
    "csv" -> "text/csv",
    "tsv" -> "text/tab-separated-values",
    "xml" -> "application/xml", "xsl" -> "application/xml",
    "xsd" -> "application/xml",
    "atom" -> "application/atom+xml",
    "rss" -> "application/rss+xml",
    "rdf" -> "application/rdf+xml",
    "json" -> "application/json",
    "js" -> "text/javascript", "mjs" -> "text/javascript",
    "css" -> "text/css",
    "md" -> "text/markdown", "markdown" -> "text/markdown",
    "doc" -> "application/msword", "dot" -> "application/msword",
    "bin" -> "application/octet-stream",
    "pdf" -> "application/pdf",
    "zip" -> "application/zip",
    "tar" -> "application/x-tar",
    "jpg" -> "image/jpeg", "jpeg" -> "image/jpeg", "jpe" -> "image/jpeg",
    "png" -> "image/png",
    "gif" -> "image/gif",
    "webp" -> "image/webp",
    "svg" -> "image/svg+xml",
    "ico" -> "image/vnd.microsoft.icon",
    "mp3" -> "audio/mpeg",
    "mp4" -> "video/mp4",
    "wasm" -> "application/wasm")

  /** CPython `mimetypes.encodings_map` — case-SENSITIVE (`.Z` only). */
  private val encodingsMap: Map[String, String] = Map(
    ".gz" -> "gzip", ".Z" -> "compress", ".bz2" -> "bzip2",
    ".xz" -> "xz", ".br" -> "br")

  /** CPython `mimetypes.suffix_map` (compared lowercased). */
  private val suffixMap: Map[String, String] = Map(
    ".svgz" -> ".svg.gz", ".tgz" -> ".tar.gz", ".taz" -> ".tar.gz",
    ".tz" -> ".tar.gz", ".tbz2" -> ".tar.bz2", ".txz" -> ".tar.xz")

  /** `from_mimetype` (`responsetypes.py:52-58`): exact class, else the
    * top-level wildcard basetype (only the text wildcard is mapped), else
    * plain Response. */
  def fromMimetype(mimetype: String): RespClass = {
    if (mimetype == null) return RPlain
    classes.getOrElse(mimetype,
      classes.getOrElse(mimetype.split('/').head + "/*", RPlain))
  }

  /** `from_content_type` (`responsetypes.py:60-70`): a Content-Encoding
    * means an undecoded body → plain Response; else the media type is the
    * latin-1-decoded header up to the first `;`, trimmed, lowercased. */
  def fromContentType(contentType: Array[Byte],
      contentEncoding: Option[String] = None): RespClass = {
    if (contentEncoding.exists(_.nonEmpty)) return RPlain
    val s = new String(contentType, java.nio.charset.StandardCharsets.ISO_8859_1)
    fromMimetype(s.split(';').head.trim.toLowerCase(java.util.Locale.ROOT))
  }

  def fromContentType(contentType: String): RespClass =
    fromContentType(
      contentType.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  /** `from_content_disposition` (`responsetypes.py:72-84`): latin-1 decode,
    * `split(";")[1].split("=")[1]` with the IndexError → Response fallback,
    * quotes stripped, then filename dispatch. */
  def fromContentDisposition(contentDisposition: Array[Byte]): RespClass = {
    val s = new String(contentDisposition,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // Python str.split keeps empty parts; [1] raises IndexError when absent
    val afterSemi = s.split(";", -1)
    if (afterSemi.length < 2) return RPlain
    val afterEq = afterSemi(1).split("=", -1)
    if (afterEq.length < 2) return RPlain
    fromFilename(stripChars(afterEq(1), "\"'"))
  }

  /** Python `str.strip(chars)`: drop leading/trailing chars in the set. */
  private def stripChars(s: String, chars: String): String = {
    var i = 0
    var j = s.length
    while (i < j && chars.indexOf(s.charAt(i)) >= 0) i += 1
    while (j > i && chars.indexOf(s.charAt(j - 1)) >= 0) j -= 1
    s.substring(i, j)
  }

  /** `from_headers` (`responsetypes.py:86-97`): Content-Type first;
    * Content-Disposition only when that resolved to plain Response. */
  def fromHeaders(headers: Map[String, String]): RespClass = {
    def get(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
    var cls: RespClass = RPlain
    get("Content-Type").foreach { ct =>
      cls = fromContentType(
        ct.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1),
        get("Content-Encoding"))
    }
    if (cls == RPlain)
      get("Content-Disposition").foreach { cd =>
        cls = fromContentDisposition(
          cd.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      }
    cls
  }

  /** CPython `posixpath.splitext`: last-dot split where a basename of
    * leading dots has no extension. Returns (base, ext-with-dot). */
  private[graft] def splitext(p: String): (String, String) = {
    val sepIndex = p.lastIndexOf('.')
    var filenameIndex = p.lastIndexOf('/') + 1
    if (sepIndex > filenameIndex) {
      // skip all-dots basenames (".txt" has no extension)
      var idx = filenameIndex
      while (idx < sepIndex) {
        if (p.charAt(idx) != '.') return (p.substring(0, sepIndex), p.substring(sepIndex))
        idx += 1
      }
    }
    (p, "")
  }

  /** CPython `mimetypes.guess_type` over the curated tables: returns
    * (mimetype, encoding), either nullable. A `scheme:` prefix is split off
    * like `urllib._splittype` (so full URLs work). */
  def guessType(url: String): (String, String) = {
    // _splittype: ([^/:]+):(.*) — scheme part may not contain '/' or ':'
    val colon = url.indexOf(':')
    val path =
      if (colon > 0 && url.substring(0, colon).forall(c => c != '/')) url.substring(colon + 1)
      else url
    var (base, ext) = splitext(path)
    while (suffixMap.contains(ext.toLowerCase(java.util.Locale.ROOT))) {
      val re = splitext(base + suffixMap(ext.toLowerCase(java.util.Locale.ROOT)))
      base = re._1; ext = re._2
    }
    var encoding: String = null
    if (encodingsMap.contains(ext)) {
      encoding = encodingsMap(ext)
      val re = splitext(base)
      base = re._1; ext = re._2
    }
    val extLower = ext.toLowerCase(java.util.Locale.ROOT)
    val tpe =
      if (extLower.startsWith(".")) typesMap.getOrElse(extLower.substring(1), null)
      else null
    (tpe, encoding)
  }

  /** `from_filename` (`responsetypes.py:99-104`): typed extension without an
    * encoding suffix → its class; anything else → plain Response. */
  def fromFilename(filename: String): RespClass = {
    val (tpe, encoding) = guessType(filename)
    if (tpe != null && encoding == null) fromMimetype(tpe) else RPlain
  }

  /** `binary_is_text` (`utils/python.py:158-169`): no control bytes other
    * than NUL/TAB/LF/CR. */
  def binaryIsText(data: Array[Byte]): Boolean =
    data.forall { b =>
      val c = b & 0xFF
      c >= 32 || c == 0 || c == 9 || c == 10 || c == 13
    }

  /** `from_body` (`responsetypes.py:106-122`): sniff the first 5000 bytes —
    * binary → octet-stream; `<html>` / `<!doctype html>` → HTML; `<?xml` →
    * XML; other printable text → the text wildcard class. */
  def fromBody(body: Array[Byte]): RespClass = {
    val chunk = if (body.length > 5000) java.util.Arrays.copyOf(body, 5000) else body
    if (!binaryIsText(chunk)) return fromMimetype("application/octet-stream")
    // bytes.lower() = ASCII-only lowercase
    val lower = new String(chunk.map { b =>
      val c = b & 0xFF
      if (c >= 'A' && c <= 'Z') (c + 32).toChar else c.toChar
    })
    if (lower.contains("<html>")) fromMimetype("text/html")
    else if (lower.contains("<?xml")) fromMimetype("text/xml")
    else if (lower.contains("<!doctype html>")) fromMimetype("text/html")
    else fromMimetype("text")
  }

  /** `from_args` (`responsetypes.py:124-142`): headers, then URL, then
    * filename, then body — each consulted only while still plain Response. */
  def fromArgs(
      headers: Map[String, String] = null,
      url: String = null,
      filename: String = null,
      body: Array[Byte] = null): RespClass = {
    var cls: RespClass = RPlain
    if (headers != null) cls = fromHeaders(headers)
    if (cls == RPlain && url != null) cls = fromFilename(url)
    if (cls == RPlain && filename != null) cls = fromFilename(filename)
    if (cls == RPlain && body != null) cls = fromBody(body)
    cls
  }

  /** `scrapy.utils.response.response_status_message` — "<code> <phrase>"
    * over the CPython `http.HTTPStatus` phrase table (3.11), "Unknown
    * Status" otherwise. */
  def statusMessage(status: Int): String =
    s"$status ${httpPhrases.getOrElse(status, "Unknown Status")}"

  /** `{s.value: s.phrase for s in http.HTTPStatus}`, CPython 3.11. */
  private val httpPhrases: Map[Int, String] = Map(
    100 -> "Continue", 101 -> "Switching Protocols", 102 -> "Processing",
    103 -> "Early Hints",
    200 -> "OK", 201 -> "Created", 202 -> "Accepted",
    203 -> "Non-Authoritative Information", 204 -> "No Content",
    205 -> "Reset Content", 206 -> "Partial Content", 207 -> "Multi-Status",
    208 -> "Already Reported", 226 -> "IM Used",
    300 -> "Multiple Choices", 301 -> "Moved Permanently", 302 -> "Found",
    303 -> "See Other", 304 -> "Not Modified", 305 -> "Use Proxy",
    307 -> "Temporary Redirect", 308 -> "Permanent Redirect",
    400 -> "Bad Request", 401 -> "Unauthorized", 402 -> "Payment Required",
    403 -> "Forbidden", 404 -> "Not Found", 405 -> "Method Not Allowed",
    406 -> "Not Acceptable", 407 -> "Proxy Authentication Required",
    408 -> "Request Timeout", 409 -> "Conflict", 410 -> "Gone",
    411 -> "Length Required", 412 -> "Precondition Failed",
    413 -> "Request Entity Too Large", 414 -> "Request-URI Too Long",
    415 -> "Unsupported Media Type",
    416 -> "Requested Range Not Satisfiable", 417 -> "Expectation Failed",
    418 -> "I'm a Teapot", 421 -> "Misdirected Request",
    422 -> "Unprocessable Entity", 423 -> "Locked",
    424 -> "Failed Dependency", 425 -> "Too Early",
    426 -> "Upgrade Required", 428 -> "Precondition Required",
    429 -> "Too Many Requests", 431 -> "Request Header Fields Too Large",
    451 -> "Unavailable For Legal Reasons",
    500 -> "Internal Server Error", 501 -> "Not Implemented",
    502 -> "Bad Gateway", 503 -> "Service Unavailable",
    504 -> "Gateway Timeout", 505 -> "HTTP Version Not Supported",
    506 -> "Variant Also Negotiates", 507 -> "Insufficient Storage",
    508 -> "Loop Detected", 510 -> "Not Extended",
    511 -> "Network Authentication Required")
}
