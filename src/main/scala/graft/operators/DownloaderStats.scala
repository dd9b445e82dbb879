package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import graft.urlkit.PyUrl

/** DownloaderStats middleware analogue (contract step 6h) — the reference's
  * byte/method counters (`scrapy/downloadermiddlewares/stats.py`), shared by
  * the engine and the oracle so both sides count identically.
  *
  * The middleware sits at priority 850, i.e. ABOVE the cache middleware
  * (900) and BELOW everything that mutates request headers (auth 300,
  * default headers 400, UA 500, compression 590, cookies 700): it therefore
  * counts
  *   - every request that reaches the downloader frontier — page fetches,
  *     robots fetches (`robotstxt.py` downloads via the full middleware
  *     chain) and cache HITS (stats runs before the cache short-circuits),
  *     with the fully-rendered header set;
  *   - every response on the way back — including cached replays — with the
  *     RAW (still Content-Encoded) body, because HttpCompression at 590
  *     decodes only after stats at 850 has seen the response;
  *   - download exceptions (timeout 6c, cancel 6g, local handler errors 6e)
  *     count request bytes but produce no response bytes.
  *
  * Request size is `len(request_httprepr(request))`
  * (`scrapy/utils/request.py:126-140`): the GET line with the CPython
  * urlparse/urlunparse path (`;params` and `?query` preserved, empty path →
  * "/"), a Host line from `parsed.hostname`, then `Headers.to_string()` —
  * all UTF-8 byte lengths. Response size is
  * `len(body) + get_header_size(headers) + get_status_size(status) + 4`,
  * where `get_header_size` of an EMPTY header set is -2 (the reference's
  * `2 * (n_keys - 1)` term — reproduced faithfully) and `get_status_size`
  * is `len(HTTPStatus(status).phrase) + 15`, 15 alone for a status CPython's
  * `http.HTTPStatus` does not know (e.g. 599).
  *
  * The rendered request-header set is exactly the per-fetch headers the
  * conformance byte-compare already pins (User-Agent 6a, Referer 7b,
  * Cookie 6a/tier-2, Authorization 6a) plus the three constant defaults the
  * reference middlewares add before stats: Accept + Accept-Language
  * (`DEFAULT_REQUEST_HEADERS`, `defaultheaders.py`) and Accept-Encoding
  * (`httpcompression.py` request side) — rendered as "gzip, deflate, zstd"
  * to match this engine's 6b codec support (zstd decoded, brotli opaque —
  * the reference advertises exactly what it can decode). The proxy meta is
  * NOT a header; Proxy-Authorization IS one when the routed proxy URL
  * carries userinfo (`httpproxy.py:94-95`, contract 6a split) and enters
  * the byte count like any other header.
  */
object DownloaderStats {

  /** CPython `http.HTTPStatus` phrases (stdlib, Python 3.12). */
  private val Phrases: Map[Int, String] = Map(
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
    415 -> "Unsupported Media Type", 416 -> "Requested Range Not Satisfiable",
    417 -> "Expectation Failed", 418 -> "I'm a Teapot",
    421 -> "Misdirected Request", 422 -> "Unprocessable Entity",
    423 -> "Locked", 424 -> "Failed Dependency", 425 -> "Too Early",
    426 -> "Upgrade Required", 428 -> "Precondition Required",
    429 -> "Too Many Requests", 431 -> "Request Header Fields Too Large",
    451 -> "Unavailable For Legal Reasons",
    500 -> "Internal Server Error", 501 -> "Not Implemented",
    502 -> "Bad Gateway", 503 -> "Service Unavailable",
    504 -> "Gateway Timeout", 505 -> "HTTP Version Not Supported",
    506 -> "Variant Also Negotiates", 507 -> "Insufficient Storage",
    508 -> "Loop Detected", 510 -> "Not Extended",
    511 -> "Network Authentication Required")

  /** `get_status_size` (`stats.py:32-38`): phrase length + 15
    * (b"HTTP/1.1 NNN " + b"\r\n"); an unknown status raises ValueError in
    * CPython and contributes phrase b"" → 15. */
  def statusSize(status: Int): Int =
    Phrases.get(status).map(_.getBytes(UTF_8).length).getOrElse(0) + 15

  /** `get_header_size` (`stats.py:21-29`): per header `len(": ") + len(key)
    * + len(value)`, plus `2 * (n_keys - 1)` — which is -2 for an EMPTY
    * header set (faithful to the reference formula). */
  def headerSize(headers: Seq[(String, String)]): Int =
    headers.iterator.map { case (k, v) =>
      2 + k.getBytes(UTF_8).length + v.getBytes(UTF_8).length
    }.sum + 2 * (headers.size - 1)

  /** `DEFAULT_REQUEST_HEADERS` (`default_settings.py`). */
  val DefaultAccept =
    "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8"
  val DefaultAcceptLanguage = "en"

  /** Advertised codings = what 6b can decode (gzip/deflate/zstd; brotli is
    * opaque-keep, so not advertised — mirrors the reference building
    * ACCEPTED_ENCODINGS from importable codecs, `httpcompression.py`). */
  val AcceptEncoding = "gzip, deflate, zstd"

  /** `len(request_httprepr(request))`: request line + Host line + rendered
    * headers + blank line + body, UTF-8 byte lengths. Null header args =
    * header absent on this fetch (exactly the fetch-log columns the
    * conformance byte-compare pins). `reqBody` is the request's UTF-8 text
    * body ("" = empty — `request_httprepr` appends `request.body` verbatim,
    * `utils/request.py:139`); a POST with a body carries the FormRequest's
    * Content-Type header (`form.py:53-57` setdefault — contract 7g). */
  def requestBytes(url: String, method: String, reqBody: String,
      referer: String, cookies: String,
      userAgent: String, authorization: String,
      proxyAuth: String = null): Long = {
    val p = PyUrl.urlparse(url)
    val pathPart = {
      val base = if (p.path.nonEmpty) p.path else "/"
      val withParams = if (p.params.nonEmpty) base + ";" + p.params else base
      if (p.query.nonEmpty) withParams + "?" + p.query else withParams
    }
    val host = PyUrl.hostname(p.netloc).getOrElse("")
    // "<method> " path " HTTP/1.1\r\n"
    var n = method.getBytes(UTF_8).length + 1 + pathPart.getBytes(UTF_8).length + 11
    n += 6 + host.getBytes(UTF_8).length + 2 // "Host: " host "\r\n"
    val headers = requestHeaders(method, reqBody, referer, cookies, userAgent,
      authorization, proxyAuth)
    if (headers.nonEmpty) n += headerSize(headers) + 2 // to_string() + "\r\n"
    n += 2 // final "\r\n"
    n += (if (reqBody != null) reqBody.getBytes(UTF_8).length else 0)
    n.toLong
  }

  /** GET with an empty body (the pre-7g surface, kept for the goldens). */
  def requestBytes(url: String, referer: String, cookies: String,
      userAgent: String, authorization: String): Long =
    requestBytes(url, "GET", "", referer, cookies, userAgent, authorization)

  /** The request headers present at the stats middleware, in middleware
    * order of attachment (order is irrelevant to the byte count). A POST
    * with a non-empty body is a FormRequest in this engine — it carries the
    * form Content-Type (`form.py:53-57`, contract 7g); a 302/303-redirected
    * request was converted to GET with the header dropped
    * (`_redirect_request_using_get`). */
  def requestHeaders(method: String, reqBody: String, referer: String,
      cookies: String, userAgent: String,
      authorization: String,
      proxyAuth: String = null): Seq[(String, String)] = {
    val b = Seq.newBuilder[(String, String)]
    b += ("Accept" -> DefaultAccept)
    b += ("Accept-Language" -> DefaultAcceptLanguage)
    if (method == "POST" && reqBody != null && reqBody.nonEmpty)
      b += ("Content-Type" -> "application/x-www-form-urlencoded")
    if (userAgent != null && userAgent.nonEmpty) b += ("User-Agent" -> userAgent)
    b += ("Accept-Encoding" -> AcceptEncoding)
    if (authorization != null) b += ("Authorization" -> authorization)
    // Proxy-Authorization (contract 6a: credential-carrying proxy split)
    if (proxyAuth != null) b += ("Proxy-Authorization" -> proxyAuth)
    if (referer != null) b += ("Referer" -> referer)
    if (cookies != null) b += ("Cookie" -> cookies)
    b.result()
  }

  /** Response size (`stats.py:69-77`): raw body + header-size formula +
    * status size + 4. `bodyLen` is the RAW (possibly still-compressed) body
    * length — stats at 850 sees the response before HttpCompression at 590
    * decodes. Callers must NOT call this for a 599 exception row (no
    * response object exists there). */
  def responseBytes(status: Int, bodyLen: Long,
      headers: Seq[(String, String)]): Long =
    bodyLen + headerSize(headers) + statusSize(status) + 4L

  /** The synthetic server's response headers = the page row's non-null
    * header fields (FIXTURES.md corpus schema); robots and data:/file:
    * responses carry none (contract 6e). */
  def responseHeaders(location: String, contentEncoding: String,
      refererPolicy: String, setCookie: String,
      cacheControl: String): Seq[(String, String)] = {
    val b = Seq.newBuilder[(String, String)]
    if (location != null) b += ("Location" -> location)
    if (contentEncoding != null) b += ("Content-Encoding" -> contentEncoding)
    if (refererPolicy != null) b += ("Referrer-Policy" -> refererPolicy)
    if (setCookie != null) b += ("Set-Cookie" -> setCookie)
    if (cacheControl != null) b += ("Cache-Control" -> cacheControl)
    b.result()
  }
}
