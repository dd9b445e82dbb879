package graft.extract

import graft.urlkit.UrlKit

/** HTML link extraction with the reference's semantics
  * (`scrapy/linkextractors/lxmlhtml.py:104-145,217-284`):
  * iterate `<a>`/`<area>` href attributes in document order, strip HTML5
  * whitespace, resolve against the `<base href>` (or page) URL, sanitize
  * (safe_url_string), carry rel=nofollow; then filter (valid scheme, ignored
  * extensions, URL length) and first-wins dedup on
  * `canonicalize_url(keep_fragments=true)` (`lxmlhtml.py:56-58,282-283`).
  *
  * Parsing is regex-based (no lxml on the JVM; the synthetic corpus emits
  * well-formed attributes) — the *semantics* (order, base-url resolution,
  * dedup key, filter chain) are what conformance pins.
  */
object LinkExtract {

  final case class Link(url: String, nofollow: Boolean)

  private val TagRe =
    """(?is)<(a|area|base)\b([^>]*)>""".r
  private val HrefRe =
    """(?is)href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""".r
  private val RelRe =
    """(?is)rel\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""".r

  private def attr(re: scala.util.matching.Regex, attrs: String): Option[String] =
    re.findFirstMatchIn(attrs).map { m =>
      Option(m.group(2)).orElse(Option(m.group(3))).orElse(Option(m.group(4))).getOrElse("")
    }

  /** Raw `<a>`/`<area>` links in document order, resolved + sanitized. */
  def extractRaw(html: String, pageUrl: String): Seq[Link] = {
    var baseUrl = pageUrl
    val links = Vector.newBuilder[Link]
    for (m <- TagRe.findAllMatchIn(html)) {
      val tag = m.group(1).toLowerCase(java.util.Locale.ROOT)
      val attrs = m.group(2)
      if (tag == "base") {
        attr(HrefRe, attrs).foreach { h =>
          val trimmed = UrlKit.urljoin(pageUrl, stripHtml5Whitespace(h))
          if (trimmed.nonEmpty) baseUrl = trimmed
        }
      } else {
        attr(HrefRe, attrs).foreach { h =>
          val href = stripHtml5Whitespace(h)
          if (href.nonEmpty) {
            val abs = UrlKit.safeUrlString(UrlKit.urljoin(baseUrl, href))
            val nofollow = attr(RelRe, attrs)
              .exists(_.toLowerCase(java.util.Locale.ROOT).split("\\s+").contains("nofollow"))
            links += Link(abs, nofollow)
          }
        }
      }
    }
    links.result()
  }

  /** HTML5 whitespace strip (`lxmlhtml.py:117`, `w3lib strip_html5_whitespace`):
    * leading/trailing ASCII space, tab, LF, FF, CR. */
  def stripHtml5Whitespace(s: String): String = {
    def ws(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
    var i = 0; var j = s.length
    while (i < j && ws(s.charAt(i))) i += 1
    while (j > i && ws(s.charAt(j - 1))) j -= 1
    s.substring(i, j)
  }

  private def scheme(url: String): String = {
    val i = url.indexOf("://")
    if (i < 0) "" else url.substring(0, i).toLowerCase(java.util.Locale.ROOT)
  }

  /** `scrapy/utils/url.py url_has_any_extension`: lowercased path endswith
    * ".ext" for any ignored extension. The path slice is a direct scan for
    * the absolute sanitized URLs this is called on (every extracted link
    * paid a full urlsplit here); anything without `://` falls back to the
    * real parser. */
  def hasIgnoredExtension(url: String): Boolean = {
    val ss = url.indexOf("://")
    val path =
      if (ss < 0) graft.urlkit.PyUrl.urlsplit(url).path
      else {
        var h = ss + 3 // netloc ends at the first of / ? #
        while (h < url.length && url.charAt(h) != '/' && url.charAt(h) != '?' &&
          url.charAt(h) != '#') h += 1
        var end = url.length
        val q = url.indexOf('?', h)
        if (q >= 0) end = q
        val f = url.indexOf('#', h)
        if (f >= 0 && f < end) end = f
        url.substring(h, end)
      }
    val lower = path.toLowerCase(java.util.Locale.ROOT)
    graft.CrawlConfig.IgnoredExtensions.exists(e => lower.endsWith("." + e))
  }

  /** Full extraction pipeline: raw links → filter chain → per-document
    * first-wins dedup on canonical(keep_fragments) key. Returns links with
    * their original document index (for discovery ordering). */
  def extract(html: Array[Byte], pageUrl: String, urlLengthLimit: Int): Seq[(Int, Link)] = {
    // per-response encoding handling (reference TextResponse): BOM → declared
    // <meta charset> → UTF-8-validity inference (no Content-Type header at
    // this call site; pages that need one route through Encoding.detect
    // directly). Total: falls back to latin-1, never throws.
    val text = Encoding.decode(html, None)
    val raw = extractRaw(text, pageUrl)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val out = Vector.newBuilder[(Int, Link)]
    var idx = 0
    for (l <- raw) {
      val ok = !l.nofollow &&
        graft.CrawlConfig.ValidSchemes.contains(scheme(l.url)) &&
        l.url.length <= urlLengthLimit &&
        !hasIgnoredExtension(l.url)
      if (ok) {
        val key = UrlKit.canonicalizeUrl(l.url, keepFragments = true)
        if (seen.add(key)) out += ((idx, l))
      }
      idx += 1 // raw document index, advances for filtered links too
    }
    out.result()
  }
}
