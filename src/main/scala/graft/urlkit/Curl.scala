package graft.urlkit

import scala.collection.mutable

/** `Request.from_curl` parsing — reference `scrapy/utils/curl.py`
  * (`curl_to_request_kwargs`), pinned by CurlSpec, a port of the public
  * battery in `tests/test_utils_curl.py`.
  *
  * The reference composes three CPython pieces; each is reimplemented from
  * its documented behavior:
  *  - `shlex.split(posix=True, whitespace_split=True)` tokenization
  *    ([[Curl.shlexSplit]]);
  *  - an argparse subset over curl's flags: `-H/--header` append,
  *    `-X/--request`, `-b/--cookie` append, `-d/--data/--data-raw` (with the
  *    `$'...'` ANSI-quoting prefix stripped), `-u/--user`, plus the
  *    safe-to-ignore flags `--compressed`, `-s/--silent`, `-v/--verbose`,
  *    `-#/--progress-bar`; unknown options are collected like
  *    `parse_known_args` and warned about or rejected;
  *  - `http.cookies.SimpleCookie` for `Cookie:` header values and `-b`
  *    pairs (quoted-value unquoting; a `-b` argument without `=` is a
  *    cookie-file reference and is skipped).
  *
  * Documented scope: argparse's long-option prefix abbreviation
  * (`--head` for `--header`) is not supported — full option names only.
  */
object Curl {

  /** The kwargs dict: insertion-ordered headers/cookies, like the
    * reference's list/dict result. */
  final case class CurlRequest(
      method: String,
      url: String,
      headers: Seq[(String, String)] = Nil,
      cookies: Seq[(String, String)] = Nil,
      body: Option[String] = None)

  private def parseError(message: String): Nothing =
    throw new IllegalArgumentException(
      s"There was an error parsing the curl command: $message")

  // ------------------------------------------------------------ shlex.split

  /** CPython `shlex.split` (posix, whitespace_split): whitespace delimits;
    * `'...'` is literal; inside `"..."` a backslash escapes only `\` and
    * `"` (kept literally otherwise); outside quotes a backslash escapes any
    * character. Unbalanced quotes / trailing escape raise. */
  def shlexSplit(s: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val tok = new StringBuilder
    var hasTok = false
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'') { // single quotes: raw until the closing quote
        val e = s.indexOf('\'', i + 1)
        if (e < 0) throw new IllegalArgumentException("No closing quotation")
        tok.append(s.substring(i + 1, e)); hasTok = true; i = e + 1
      } else if (c == '"') { // double quotes: \ escapes only \ and "
        hasTok = true
        i += 1
        var closed = false
        while (i < n && !closed) {
          val q = s.charAt(i)
          if (q == '"') { closed = true; i += 1 }
          else if (q == '\\') {
            if (i + 1 >= n) throw new IllegalArgumentException("No escaped character")
            val e = s.charAt(i + 1)
            if (e != '\\' && e != '"') tok.append('\\')
            tok.append(e); i += 2
          } else { tok.append(q); i += 1 }
        }
        if (!closed) throw new IllegalArgumentException("No closing quotation")
      } else if (c == '\\') { // escape outside quotes: next char literal
        if (i + 1 >= n) throw new IllegalArgumentException("No escaped character")
        tok.append(s.charAt(i + 1)); hasTok = true; i += 2
      } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n' || c == '\f') {
        if (hasTok) { out += tok.result(); tok.clear(); hasTok = false }
        i += 1
      } else { tok.append(c); hasTok = true; i += 1 }
    }
    if (hasTok) out += tok.result()
    out.result()
  }

  // -------------------------------------------------------- argparse subset

  /** Option registry: canonical name -> (aliases, takesValue, isData).
    * Mirrors `curl_parser.add_argument` order-independent lookups. */
  private val valueOpts: Map[String, String] = Map(
    "-H" -> "header", "--header" -> "header",
    "-X" -> "method", "--request" -> "method",
    "-b" -> "cookie", "--cookie" -> "cookie",
    "-d" -> "data", "--data" -> "data", "--data-raw" -> "data",
    "-u" -> "auth", "--user" -> "auth")

  private val flagOpts: Set[String] = Set(
    "--compressed", "-s", "--silent", "-v", "--verbose",
    "-#", "--progress-bar")

  private final class ParsedArgs {
    val headers = mutable.ArrayBuffer.empty[String]
    val cookies = mutable.ArrayBuffer.empty[String]
    var method: String = null
    var data: String = null
    var auth: String = null
    var url: String = null
    val extras = mutable.ArrayBuffer.empty[String]

    def set(dest: String, v: String): Unit = dest match {
      case "header" => headers += v
      case "cookie" => cookies += v
      case "method" => method = v
      case "data" => data = v.stripPrefix("$") // DataAction: `$'...'` prefix
      case "auth" => auth = v
    }
  }

  private def parseArgs(args: Seq[String]): ParsedArgs = {
    val p = new ParsedArgs
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (a.startsWith("--") && a.length > 2) {
        val eq = a.indexOf('=')
        val (name, inline) =
          if (eq >= 0) (a.substring(0, eq), Some(a.substring(eq + 1)))
          else (a, None)
        valueOpts.get(name) match {
          case Some(dest) =>
            inline match {
              case Some(v) => p.set(dest, v)
              case None =>
                if (i + 1 >= args.length)
                  parseError(s"argument $name: expected one argument")
                p.set(dest, args(i + 1)); i += 1
            }
          case None =>
            if (flagOpts.contains(name) && inline.isEmpty) () // ignored flag
            else p.extras += a
        }
      } else if (a.length > 1 && a.charAt(0) == '-' && a != "-") {
        val name = a.substring(0, 2)
        val attached = if (a.length > 2) Some(a.substring(2)) else None
        valueOpts.get(name) match {
          case Some(dest) =>
            attached match {
              case Some(v) => p.set(dest, v)
              case None =>
                if (i + 1 >= args.length)
                  parseError(s"argument $name: expected one argument")
                p.set(dest, args(i + 1)); i += 1
            }
          case None =>
            if (flagOpts.contains(a)) () // -s / -v / -#
            else p.extras += a
        }
      } else {
        if (p.url == null) p.url = a else p.extras += a
      }
      i += 1
    }
    if (p.url == null)
      parseError("the following arguments are required: url")
    p
  }

  // ------------------------------------------------------------ SimpleCookie

  /** `http.cookies.SimpleCookie` load of a `k=v; k2=v2` string: morsel
    * values with surrounding quotes unquoted (`\x` unescaped inside). */
  private def simpleCookiePairs(s: String): Seq[(String, String)] =
    s.split(";").toSeq.flatMap { part =>
      val t = part.trim
      val eq = t.indexOf('=')
      if (eq <= 0) None
      else {
        val name = t.substring(0, eq).trim
        var v = t.substring(eq + 1).trim
        if (v.length >= 2 && v.head == '"' && v.last == '"')
          v = v.substring(1, v.length - 1).replaceAll("""\\(.)""", "$1")
        Some(name -> v)
      }
    }

  /** w3lib `basic_auth_header(user, pass)` — ISO-8859-1 credentials. */
  private def basicAuthHeader(user: String, pass: String): String =
    "Basic " + java.util.Base64.getEncoder.encodeToString(
      s"$user:$pass".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  // --------------------------------------------------------------- assembly

  /** `curl_to_request_kwargs`: parse a curl command line into Request
    * kwargs. `ignoreUnknownOptions=false` raises on unrecognized options
    * (otherwise they are dropped with a warning, matching the reference's
    * `warnings.warn`). */
  def curlToRequest(curlCommand: String,
      ignoreUnknownOptions: Boolean = true): CurlRequest = {
    val args = shlexSplit(curlCommand)
    if (args.isEmpty || args.head != "curl")
      throw new IllegalArgumentException("A curl command must start with \"curl\"")
    val p = parseArgs(args.tail)

    if (p.extras.nonEmpty && !ignoreUnknownOptions)
      throw new IllegalArgumentException(
        s"Unrecognized options: ${p.extras.mkString(", ")}")

    // curl prepends http:// when the scheme is missing; Request needs one
    val url =
      if (PyUrl.urlparse(p.url).scheme.isEmpty) "http://" + p.url else p.url

    val headers = Vector.newBuilder[(String, String)]
    val cookies = mutable.LinkedHashMap.empty[String, String]
    p.headers.foreach { header =>
      val colon = header.indexOf(':')
      if (colon < 0) parseError(s"malformed header '$header'")
      val name = header.substring(0, colon).trim
      val value = header.substring(colon + 1).trim
      if (name.equalsIgnoreCase("cookie"))
        simpleCookiePairs(value).foreach { case (k, v) => cookies(k) = v }
      else headers += (name -> value)
    }
    // -b pairs (a parameter without '=' is a cookie FILE — skipped)
    p.cookies.foreach { c =>
      if (c.contains("="))
        simpleCookiePairs(c).foreach { case (k, v) => cookies(k) = v }
    }
    if (p.auth != null) {
      val colon = p.auth.indexOf(':')
      val (u, pw) =
        if (colon < 0) parseError(s"credentials '${p.auth}' need user:password")
        else (p.auth.substring(0, colon), p.auth.substring(colon + 1))
      headers += ("Authorization" -> basicAuthHeader(u, pw))
    }

    val method0 = Option(p.method).getOrElse("GET")
    // data without an explicit -X implies POST
    val method =
      if (p.data != null && p.method == null) "POST" else method0.toUpperCase

    CurlRequest(
      method = method,
      url = url,
      headers = headers.result(),
      cookies = cookies.toSeq,
      body = Option(p.data))
  }
}
