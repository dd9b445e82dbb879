package graft.extract

import java.util.regex.Pattern

import graft.urlkit.UrlKit

/** Per-extractor user filter knobs (reference `scrapy/linkextractors/
  * lxmlhtml.py:217-249` `_link_allowed`): allow/deny URL regexes (Python
  * `re.search` semantics), allow/deny domain suffixes
  * (`url_is_from_any_domain`), and anchor-text regexes (`restrict_text`).
  * All-empty = no user filtering (the engine's common path — zero per-link
  * cost). Patterns compile lazily per JVM (@transient: the config rides
  * inside Spark task closures). */
final case class LinkFilter(
    allow: Seq[String] = Nil,
    deny: Seq[String] = Nil,
    allowDomains: Seq[String] = Nil,
    denyDomains: Seq[String] = Nil,
    restrictText: Seq[String] = Nil) {

  @transient private lazy val allowRe = allow.map(Pattern.compile(_))
  @transient private lazy val denyRe = deny.map(Pattern.compile(_))
  @transient private lazy val textRe = restrictText.map(Pattern.compile(_))

  def isEmpty: Boolean = allow.isEmpty && deny.isEmpty &&
    allowDomains.isEmpty && denyDomains.isEmpty && restrictText.isEmpty

  /** `scrapy/utils/url.py url_is_from_any_domain`: lowercased netloc equals
    * the domain or ends with ".domain". */
  def urlFromAnyDomain(url: String, domains: Seq[String]): Boolean = {
    val host = LinkExtract.netlocOf(url).toLowerCase(java.util.Locale.ROOT)
    host.nonEmpty && domains.exists { d0 =>
      val d = d0.toLowerCase(java.util.Locale.ROOT)
      host == d || host.endsWith("." + d)
    }
  }

  private def matches(s: String, res: Seq[Pattern]): Boolean =
    res.exists(_.matcher(s).find())

  /** The `_link_allowed` user-knob subset (valid-scheme/extension checks are
    * the caller's fixed chain). */
  def allows(url: String, text: String): Boolean = {
    if (allowRe.nonEmpty && !matches(url, allowRe)) return false
    if (denyRe.nonEmpty && matches(url, denyRe)) return false
    if (allowDomains.nonEmpty && !urlFromAnyDomain(url, allowDomains)) return false
    if (denyDomains.nonEmpty && urlFromAnyDomain(url, denyDomains)) return false
    textRe.isEmpty || matches(text, textRe)
  }
}

object LinkFilter { val Empty: LinkFilter = LinkFilter() }

/** HTML link extraction with the reference's semantics
  * (`scrapy/linkextractors/lxmlhtml.py:104-145,217-284`):
  * iterate link tags' scanned attributes in document order, strip HTML5
  * whitespace, resolve against the page's base URL (w3lib `get_base_url`:
  * first `<base href>` within the first 4096 chars), sanitize
  * (safe_url_string), carry rel=nofollow and the element's string content
  * (`link.text`); skip bogus hrefs the Python stack rejects (invalid IPv6
  * netloc at urljoin, non-numeric port at safe_url_string); then
  * first-wins dedup on the RAW sanitized URL (the default extractor's
  * `unique=True, canonicalize=False` ⇒ `canonicalized=True` ⇒
  * `link_key = url`, `lxmlhtml.py:56-58,71-76`) and the filter chain
  * (valid scheme, ignored extensions, URL length + the [[LinkFilter]] user
  * knobs). Dedup runs BEFORE filtering, like the reference's parser-level
  * `_deduplicate_if_needed` (`lxmlhtml.py:140-145`).
  *
  * Parsing is regex-based (no lxml on the JVM; the synthetic corpus emits
  * well-formed attributes) — the *semantics* (order, base-url resolution,
  * dedup key, filter chain) are what conformance + the reference-derived
  * golden battery in LinkExtractorSpec pin.
  */
object LinkExtract {

  final case class Link(url: String, nofollow: Boolean, text: String = "")

  /** w3lib `html.get_base_url` regex (first match wins, searched over the
    * first 4096 chars like `scrapy/utils/response.py:31-38`). */
  // w3lib `_baseurl_re` verbatim: quotes required, whitespace allowed
  // INSIDE them (`w3lib/html.py`), so href=" http://b.com/" resolves
  private val BaseRe =
    Pattern.compile("""<base\s[^>]*href\s*=\s*["']\s*([^"'\s]+)\s*["']""",
      Pattern.CASE_INSENSITIVE)

  private val RelRe =
    """(?is)\brel\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""".r

  /** Attributes of one element in document order: name → raw value. */
  private val AttrRe = Pattern.compile(
    """([a-zA-Z_][\w:.-]*)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
    Pattern.DOTALL)

  /** Void elements (no content model) — their text is always "". */
  private val VoidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "source", "track", "wbr")

  /** HTML named character references lxml resolves while parsing (the
    * common HTML4 set — attribute values and text reach scrapy already
    * decoded; `w3lib.html.replace_entities` semantics: unknown names pass
    * through untouched). */
  private val NamedEntities: Map[String, String] = Map(
    "quot" -> "\"", "amp" -> "&", "lt" -> "<", "gt" -> ">", "apos" -> "'",
    "nbsp" -> " ", "iexcl" -> "¡", "cent" -> "¢",
    "pound" -> "£", "curren" -> "¤", "yen" -> "¥",
    "sect" -> "§", "copy" -> "©", "laquo" -> "«",
    "reg" -> "®", "deg" -> "°", "plusmn" -> "±",
    "middot" -> "·", "raquo" -> "»", "frac12" -> "½",
    "iquest" -> "¿", "times" -> "×", "divide" -> "÷",
    "ndash" -> "–", "mdash" -> "—", "lsquo" -> "‘",
    "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "bull" -> "•", "hellip" -> "…", "euro" -> "€",
    "trade" -> "™", "larr" -> "←", "rarr" -> "→",
    "spades" -> "♠", "clubs" -> "♣", "hearts" -> "♥",
    "diams" -> "♦")

  private val EntityRe =
    """&(#[xX]?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]{1,31});""".r

  /** Decode numeric + common named character references; malformed or
    * unknown references stay literal (lxml attribute-value semantics). */
  private[graft] def replaceHtmlEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    EntityRe.replaceAllIn(s, m => {
      val e = m.group(1)
      val repl: Option[String] =
        if (e.startsWith("#x") || e.startsWith("#X"))
          try Some(new String(Character.toChars(Integer.parseInt(e.drop(2), 16))))
          catch { case _: Exception => None }
        else if (e.startsWith("#")) {
          val d = e.drop(1)
          if (d.forall(_.isDigit))
            try Some(new String(Character.toChars(d.toInt)))
            catch { case _: Exception => None }
          else None
        } else NamedEntities.get(e)
      scala.util.matching.Regex.quoteReplacement(repl.getOrElse(m.matched))
    })
  }

  /** Base URL of a page (`w3lib.html.get_base_url` via
    * `scrapy/utils/response.py get_base_url`): the first `<base href>`
    * within the first 4096 chars, joined against the page URL. */
  def baseUrl(html: String, pageUrl: String): String = {
    val chunk = if (html.length > 4096) html.substring(0, 4096) else html
    val m = BaseRe.matcher(chunk)
    if (m.find()) UrlKit.urljoin(pageUrl, stripHtml5Whitespace(m.group(1)))
    else pageUrl
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

  /** Netloc of an absolute URL ("" when relative / no authority). */
  private[extract] def netlocOf(url: String): String = {
    val ss = url.indexOf("://")
    if (ss < 0) ""
    else {
      var h = ss + 3
      var e = h
      while (e < url.length && url.charAt(e) != '/' && url.charAt(e) != '?' &&
        url.charAt(e) != '#') e += 1
      url.substring(h, e)
    }
  }

  /** URLs the Python stack REJECTS with ValueError — `urlsplit`'s
    * "Invalid IPv6 URL" (unmatched bracket in the netloc, hit inside
    * `urljoin`) and w3lib-2 `safe_url_string`'s non-numeric port (hit at
    * `parts.port`). The reference extractor skips such links
    * (`lxmlhtml.py:118-129`, tests `test_link_wrong_href` /
    * `test_skip_bad_links`). */
  private[graft] def isBogusUrl(url: String): Boolean = {
    val netloc = netlocOf(url)
    if (netloc.isEmpty) return false
    val hasOpen = netloc.contains('[')
    val hasClose = netloc.contains(']')
    if (hasOpen != hasClose) return true // Invalid IPv6 URL
    // port: text after the last ':' of the host part (userinfo stripped,
    // bracket form handled); non-numeric ⇒ w3lib ValueError
    val hostPort = netloc.substring(netloc.lastIndexOf('@') + 1)
    val afterBracket =
      if (hostPort.startsWith("[")) hostPort.substring(hostPort.indexOf(']') + 1)
      else hostPort
    val c = afterBracket.lastIndexOf(':')
    if (c >= 0) {
      val port = afterBracket.substring(c + 1)
      port.nonEmpty && !port.forall(_.isDigit)
    } else false
  }

  /** The reference's per-link URL pipeline (`lxmlhtml.py:113-135`):
    * urljoin(base) → process_value → safe_url_string → urljoin(pageUrl)
    * (the last join only matters after process_value returns a relative
    * URL); None = skipped (bogus URL or process_value rejection).
    * `encoding` is the response encoding the reference passes to
    * `safe_url_string` (query/fragment bytes; path stays UTF-8) — a
    * character the page encoding can't represent raises UnicodeEncodeError
    * (a ValueError) there, i.e. the link is skipped. */
  private def resolveHref(base: String, pageUrl: String, href: String,
      processValue: Option[String => Option[String]],
      encoding: java.nio.charset.Charset): Option[String] = {
    if (isBogusUrl(href)) return None // urljoin's urlsplit raises
    val joined = UrlKit.urljoin(base, href)
    val processed = processValue match {
      case Some(f) => f(joined) match {
        case Some(v) => v
        case None => return None
      }
      case None => joined
    }
    if (isBogusUrl(processed)) None // safe_url_string raises
    else try {
      val safe = UrlKit.safeUrlString(processed, encoding)
      Some(if (processValue.isDefined) UrlKit.urljoin(pageUrl, safe) else safe)
    } catch {
      case _: java.nio.charset.CharacterCodingException => None
    }
  }

  /** `string()` content of the element whose open tag ends at `from` —
    * the reference's `_collect_string_content` (lxml XPath string()):
    * everything to the matching close tag, markup stripped, basic entities
    * decoded. Unclosed / void / self-closed elements yield "". */
  private def elementText(html: String, from: Int, tag: String): String = {
    val both = Pattern.compile("<(/?)" + Pattern.quote(tag) + "\\b[^>]*?>",
      Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
    val m = both.matcher(html)
    m.region(from, html.length)
    var depth = 1
    var end = -1
    while (end < 0 && m.find()) {
      if (m.group(1).isEmpty) depth += 1
      else { depth -= 1; if (depth == 0) end = m.start }
    }
    if (end < 0) ""
    else replaceHtmlEntities(
      html.substring(from, end).replaceAll("(?s)<[^>]*>", ""))
  }

  /** Raw links of the scanned (tag, attr) pairs in document order, resolved
    * + sanitized, with nofollow flag and (when `needText`) the element's
    * string content. The generalized core behind both the engine's fixed
    * a/area·href scan and the user-facing [[LinkExtractor]] tags/attrs
    * knobs (`lxmlhtml.py:92-139` `_iter_links` + `_extract_links`). */
  def extractTagged(html: String, pageUrl: String,
      tags: Seq[String], attrs: Seq[String],
      processValue: Option[String => Option[String]] = None,
      needText: Boolean = true): Seq[Link] =
    extractTaggedOffsets(html, pageUrl, tags, attrs, processValue, needText)
      .map(_._2)

  /** Like [[extractTagged]] but each link carries the source offset of its
    * element's `<` — the membership key for `restrict_xpaths`/`restrict_css`
    * subtree filtering. `encoding` = response encoding for
    * `safe_url_string`'s query/fragment bytes (reference `lxmlhtml.py:130`:
    * `safe_url_string(url, encoding=response_encoding)`). */
  def extractTaggedOffsets(html: String, pageUrl: String,
      tags: Seq[String], attrs: Seq[String],
      processValue: Option[String => Option[String]] = None,
      needText: Boolean = true,
      encoding: java.nio.charset.Charset = java.nio.charset.StandardCharsets.UTF_8)
      : Seq[(Int, Link)] = {
    if (tags.isEmpty || attrs.isEmpty) return Nil
    val wantAttr = attrs.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val base = baseUrl(html, pageUrl)
    val tagRe = Pattern.compile(
      "<(" + tags.map(Pattern.quote).mkString("|") + ")\\b([^>]*)>",
      Pattern.CASE_INSENSITIVE | Pattern.DOTALL)
    val m = tagRe.matcher(html)
    val out = Vector.newBuilder[(Int, Link)]
    while (m.find()) {
      val tag = m.group(1).toLowerCase(java.util.Locale.ROOT)
      val attrsStr = m.group(2)
      var text: String = null // computed once per element, lazily
      val am = AttrRe.matcher(attrsStr)
      while (am.find()) {
        val name = am.group(1).toLowerCase(java.util.Locale.ROOT)
        if (wantAttr.contains(name)) {
          val rawV = Option(am.group(3)).orElse(Option(am.group(4)))
            .orElse(Option(am.group(5))).getOrElse("")
          // lxml hands scrapy the attribute value with character references
          // already resolved; strip_html5_whitespace runs on the decoded form
          val href = stripHtml5Whitespace(replaceHtmlEntities(rawV))
          if (href.nonEmpty) {
            resolveHref(base, pageUrl, href, processValue, encoding).foreach { abs =>
              if (text == null) {
                text =
                  if (!needText || VoidTags.contains(tag) ||
                    attrsStr.trim.endsWith("/")) ""
                  else elementText(html, m.end, tag)
              }
              val nofollow = RelRe.findFirstMatchIn(attrsStr).exists { rm =>
                Option(rm.group(2)).orElse(Option(rm.group(3)))
                  .orElse(Option(rm.group(4))).getOrElse("")
                  .toLowerCase(java.util.Locale.ROOT)
                  .split("\\s+").contains("nofollow")
              }
              out += ((m.start, Link(abs, nofollow, text)))
            }
          }
        }
      }
    }
    out.result()
  }

  /** Raw `<a>`/`<area>` href links in document order, resolved + sanitized
    * (the engine's fixed scan). */
  def extractRaw(html: String, pageUrl: String): Seq[Link] =
    extractTagged(html, pageUrl, Seq("a", "area"), Seq("href"))

  private def scheme(url: String): String = {
    val i = url.indexOf("://")
    if (i < 0) "" else url.substring(0, i).toLowerCase(java.util.Locale.ROOT)
  }

  /** `scrapy/utils/url.py url_has_any_extension`: lowercased path endswith
    * ".ext" for any of `exts`. The path slice is a direct scan for
    * the absolute sanitized URLs this is called on (every extracted link
    * paid a full urlsplit here); anything without `://` falls back to the
    * real parser. */
  def hasAnyExtension(url: String, exts: Set[String]): Boolean = {
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
    exts.exists(e => lower.endsWith("." + e))
  }

  def hasIgnoredExtension(url: String): Boolean =
    hasAnyExtension(url, graft.CrawlConfig.IgnoredExtensions)

  /** The engine's full extraction pipeline: raw links → per-document
    * first-wins dedup on the raw sanitized URL (the reference extractor's
    * default `unique` key) → fixed filter chain (nofollow, valid scheme,
    * URL length, ignored extensions) + the [[LinkFilter]] user knobs.
    * Returns links with their original document index (for discovery
    * ordering). Anchor text is only materialized when `restrictText` needs
    * it — the common path stays free of per-link text scans. */
  def extract(html: Array[Byte], pageUrl: String, urlLengthLimit: Int,
      filter: LinkFilter = LinkFilter.Empty): Seq[(Int, Link)] = {
    // per-response encoding handling (reference TextResponse): BOM → declared
    // <meta charset> → UTF-8-validity inference (no Content-Type header at
    // this call site; pages that need one route through Encoding.detect
    // directly). Total: falls back to latin-1, never throws.
    val text = Encoding.decode(html, None)
    val needText = filter.restrictText.nonEmpty
    val raw = extractTagged(text, pageUrl, Seq("a", "area"), Seq("href"),
      needText = needText)
    val seen = scala.collection.mutable.HashSet.empty[String]
    val out = Vector.newBuilder[(Int, Link)]
    var idx = 0
    for (l <- raw) {
      // dedup BEFORE the filters (reference parser-level dedup): a filtered
      // first occurrence shadows later duplicates of the same raw URL
      if (seen.add(l.url)) {
        val ok = !l.nofollow &&
          graft.CrawlConfig.ValidSchemes.contains(scheme(l.url)) &&
          l.url.length <= urlLengthLimit &&
          !hasIgnoredExtension(l.url) &&
          (filter.isEmpty || filter.allows(l.url, l.text))
        if (ok) out += ((idx, l))
      }
      idx += 1 // raw document index, advances for filtered links too
    }
    out.result()
  }
}

/** User-facing link extractor — the reference `LxmlLinkExtractor` surface
  * (`scrapy/linkextractors/lxmlhtml.py:166-284`) including the
  * selector-based `restrict_xpaths`/`restrict_css` knobs: each selector
  * picks subdocuments (element subtrees, [[HtmlDom]]'s documented XPath/CSS
  * subset), links are extracted per subdocument in selector order
  * (`lxmlhtml.py:270-277`: xpaths first, then css translated and appended),
  * and the unique/canonicalize aggregation runs across all of them
  * (reference `test_link_extractor_aggregation`). Pipeline per
  * `extract_links`: scan tags/attrs → parser-level unique dedup →
  * `_link_allowed` filter chain → optional canonicalize → final dedup.
  * Pinned by the reference-derived golden battery in LinkExtractorSpec. */
final class LinkExtractor(
    allow: Seq[String] = Nil,
    deny: Seq[String] = Nil,
    allowDomains: Seq[String] = Nil,
    denyDomains: Seq[String] = Nil,
    denyExtensions: Option[Seq[String]] = None, // None = IGNORED_EXTENSIONS
    restrictText: Seq[String] = Nil,
    tags: Seq[String] = Seq("a", "area"),
    attrs: Seq[String] = Seq("href"),
    canonicalize: Boolean = false,
    unique: Boolean = true,
    processValue: Option[String => Option[String]] = None,
    restrictXpaths: Seq[String] = Nil,
    restrictCss: Seq[String] = Nil)
  extends Serializable {

  import LinkExtract._

  private val filter =
    LinkFilter(allow, deny, allowDomains, denyDomains, restrictText)
  private val denyExt: Set[String] =
    denyExtensions.map(_.toSet).getOrElse(graft.CrawlConfig.IgnoredExtensions)

  // parsed eagerly so an unsupported selector fails at construction, like
  // the reference's __init__-time css_to_xpath translation
  private val selectors: Seq[HtmlDom.Selector] =
    restrictXpaths.map(HtmlDom.parseXPath) ++ restrictCss.map(HtmlDom.parseCss)

  /** Dedup key (`lxmlhtml.py:56-58,71-76`): the raw URL by default
    * (`canonicalized = not canonicalize`), the keep-fragments canonical
    * form when `canonicalize` is on. */
  private def linkKey(l: Link): String =
    if (canonicalize) UrlKit.canonicalizeUrl(l.url, keepFragments = true)
    else l.url

  private def dedup(links: Seq[Link]): Seq[Link] =
    if (!unique) links
    else {
      val seen = scala.collection.mutable.HashSet.empty[String]
      links.filter(l => seen.add(linkKey(l)))
    }

  /** `_link_allowed` (`lxmlhtml.py:217-240`): scheme-valid URL, allow/deny
    * regexes, domain lists, extension filter, restrict_text. (nofollow is
    * NOT filtered here — the flag rides on the Link, reference parity.) */
  private[graft] def linkAllowed(l: Link): Boolean = {
    val s = l.url.split("://", 2)
    if (s.length < 2 || !Set("http", "https", "file", "ftp").contains(s(0))) return false
    if (!filter.allows(l.url, l.text)) return false
    !(denyExt.nonEmpty && hasAnyExtension(l.url, denyExt))
  }

  /** `extract_links(response)` over an HTML string. `charset` = the
    * response encoding (drives `safe_url_string`'s query/fragment bytes). */
  def extractLinks(html: String, pageUrl: String,
      charset: java.nio.charset.Charset =
        java.nio.charset.StandardCharsets.UTF_8): Seq[Link] = {
    val rawOff = extractTaggedOffsets(html, pageUrl, tags, attrs,
      processValue, needText = true, charset)
    val raw: Seq[Link] =
      if (selectors.isEmpty) rawOff.map(_._2)
      else {
        // subdocument membership by source span: grouped per selected
        // subtree in selector order, document order within each — nested
        // matches duplicate their links exactly like the reference's
        // per-subdoc extraction (unique=False keeps the duplicates)
        val doc = HtmlDom.parse(html)
        for {
          sel <- selectors
          el <- sel.select(doc)
          (off, l) <- rawOff
          if off >= el.start && off < el.end
        } yield l
      }
    val filtered = dedup(raw).filter(linkAllowed)
    val canon =
      if (canonicalize) filtered.map(l => l.copy(url = UrlKit.canonicalizeUrl(l.url)))
      else filtered
    dedup(canon)
  }

  def extractLinks(html: Array[Byte], pageUrl: String): Seq[Link] =
    extractLinks(Encoding.decode(html, None), pageUrl)

  /** Bytes + declared response encoding (reference
    * `HtmlResponse(..., encoding=...)`). */
  def extractLinks(html: Array[Byte], pageUrl: String,
      encoding: String): Seq[Link] = {
    val cs = java.nio.charset.Charset.forName(encoding)
    extractLinks(new String(html, cs), pageUrl, cs)
  }

  /** `matches(url)` (`lxmlhtml.py:242-255`): would this extractor's
    * URL-side rules accept the URL? */
  def matches(url: String): Boolean = {
    if (allowDomains.nonEmpty && !filter.urlFromAnyDomain(url, allowDomains))
      return false
    if (denyDomains.nonEmpty && filter.urlFromAnyDomain(url, denyDomains))
      return false
    val allowed = allow.isEmpty ||
      allow.exists(p => Pattern.compile(p).matcher(url).find())
    val denied = deny.exists(p => Pattern.compile(p).matcher(url).find())
    allowed && !denied
  }
}
