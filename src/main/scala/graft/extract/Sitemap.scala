package graft.extract

import scala.util.matching.Regex

/** Sitemap parsing + SitemapSpider routing for seed expansion (reference
  * `scrapy/spiders/sitemap.py:26-147`, `scrapy/utils/sitemap.py:19-59`):
  * `<urlset>` yields page-loc entries routed through `sitemap_rules`
  * (first matching regex wins, like the reference's callback break),
  * `<sitemapindex>` yields nested sitemap locs recursed into when a
  * `sitemap_follow` regex matches; `xhtml:link href` alternates ride each
  * entry and are emitted under `sitemap_alternate_links`; a
  * `sitemap_filter` hook sees the full entry maps (loc/lastmod/...)
  * before routing. Gzipped bodies are sniffed by magic and inflated;
  * robots.txt `Sitemap:` lines discover sitemap URLs (urljoined against
  * the robots URL). Regex XML handling matches the synthetic corpus
  * shapes; semantics (recursion, routing, gunzip, discovery) are the
  * point. */
object Sitemap {

  /** One `<url>`/`<sitemap>` entry: child-element local-name → trimmed
    * text, plus the `href`s of any `link` children (the reference collects
    * EVERY link child carrying href under "alternate",
    * `utils/sitemap.py:38-42`). Entries without `<loc>` are dropped. */
  final case class Entry(fields: Map[String, String], alternate: Seq[String]) {
    def loc: String = fields.getOrElse("loc", "")
  }

  /** A parsed sitemap document: `tpe` is the root tag's local name
    * ("urlset" | "sitemapindex" | anything else → not a sitemap). */
  final case class Doc(tpe: String, entries: Seq[Entry]) {
    def isIndex: Boolean = tpe == "sitemapindex"
  }

  /** SitemapSpider user knobs (`sitemap.py:27-33` class attributes).
    * `rules` routes urlset locs to a callback name — FIRST regex that
    * finds anywhere in the loc wins (`re.search` + break); `follow`
    * gates which index sub-sitemaps recurse; `filter` is the
    * `sitemap_filter` entry hook. Defaults mirror the reference: every
    * loc → "parse", follow everything, no alternates. */
  final case class Knobs(
      rules: Seq[(Regex, String)] = Seq(("".r, "parse")),
      follow: Seq[Regex] = Seq("".r),
      alternateLinks: Boolean = false,
      filter: Seq[Entry] => Seq[Entry] = identity)

  def isGzip(body: Array[Byte]): Boolean =
    body.length > 2 && (body(0) & 0xff) == 0x1f && (body(1) & 0xff) == 0x8b

  def gunzip(body: Array[Byte], maxSize: Int = 16 * 1024 * 1024): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(body))
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0 && out.size <= maxSize) {
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  // root element (skipping the xml decl/comments), entry blocks, and entry
  // children — paired (captured text) or self-closing (lxml `el.text` is
  // None → "") — all namespace-prefix-blind (lxml's `tag.split("}",1)[1]`
  // local-name behavior)
  private val RootRe = "(?s)<\\s*(?:[\\w.-]+:)?([A-Za-z][\\w.-]*)".r
  private val EntryRe =
    "(?is)<(?:[\\w.-]+:)?(url|sitemap)\\b[^>]*>(.*?)</(?:[\\w.-]+:)?\\1\\s*>".r
  private val ChildRe =
    ("(?is)<(?:[\\w.-]+:)?([A-Za-z][\\w.-]*)\\b([^>]*?)" +
      "(?:/\\s*>|>\\s*([^<]*?)\\s*</(?:[\\w.-]+:)?\\1\\s*>)").r
  private val HrefRe = "(?is)\\bhref\\s*=\\s*[\"']([^\"']*)[\"']".r

  private def stripDeclAndComments(text: String): String =
    text.replaceAll("(?s)<\\?.*?\\?>", "").replaceAll("(?s)<!--.*?-->", "")

  /** Parse a sitemap body into typed entries (gunzips when magic matches). */
  def parseDoc(body0: Array[Byte]): Doc = {
    val body = if (isGzip(body0)) gunzip(body0) else body0
    val text = stripDeclAndComments(
      new String(body, java.nio.charset.StandardCharsets.UTF_8))
    val tpe = RootRe.findFirstMatchIn(text).map(_.group(1)).getOrElse("")
    val entries = EntryRe.findAllMatchIn(text).flatMap { m =>
      var fields = Map.empty[String, String]
      val alts = Seq.newBuilder[String]
      for (c <- ChildRe.findAllMatchIn(m.group(2))) {
        val name = c.group(1).toLowerCase(java.util.Locale.ROOT)
        if (name == "link") // any link child carrying href → "alternate"
          HrefRe.findFirstMatchIn(c.group(2)).foreach(h => alts += h.group(1))
        else fields += name -> Option(c.group(3)).getOrElse("")
      }
      if (fields.contains("loc")) Some(Entry(fields, alts.result())) else None
    }.toSeq
    Doc(tpe, entries)
  }

  /** Back-compat shape used by the corpus seed expansion. */
  final case class Parsed(locs: Seq[String], isIndex: Boolean)
  def parse(body0: Array[Byte]): Parsed = {
    val d = parseDoc(body0)
    Parsed(d.entries.map(_.loc), d.isIndex)
  }

  /** `iterloc` (`sitemap.py:141-147`): each entry's loc, then its
    * alternates when enabled. */
  def iterloc(entries: Seq[Entry], alt: Boolean): Seq[String] =
    entries.flatMap(e => e.loc +: (if (alt) e.alternate else Nil))

  private def searches(re: Regex, s: String): Boolean =
    re.findFirstMatchIn(s).isDefined

  /** Route one parsed doc the way `_parse_sitemap` does: an index yields
    * (loc, None) follow-ups gated by `follow`; a urlset yields
    * (loc, Some(callback)) for the FIRST matching rule, dropping locs no
    * rule matches. */
  def route(doc: Doc, knobs: Knobs): Seq[(String, Option[String])] = {
    val entries = knobs.filter(doc.entries)
    if (doc.isIndex)
      iterloc(entries, knobs.alternateLinks)
        .filter(loc => knobs.follow.exists(searches(_, loc)))
        .map(loc => (loc, None))
    else if (doc.tpe == "urlset")
      iterloc(entries, knobs.alternateLinks)
        .flatMap(loc => knobs.rules.collectFirst {
          case (re, cb) if searches(re, loc) => (loc, Some(cb))
        })
    else Nil
  }

  /** `Sitemap:` lines from a robots.txt body, urljoined against the
    * robots URL (`utils/sitemap.py:49-59` — relative sitemap URLs resolve
    * against `base_url`). */
  def sitemapUrlsFromRobots(robots: String, baseUrl: String = ""): Seq[String] =
    robots.linesIterator
      .map(_.trim)
      .filter(_.toLowerCase(java.util.Locale.ROOT).startsWith("sitemap:"))
      .map(_.substring("sitemap:".length).trim)
      .filter(_.nonEmpty)
      .map(u => if (baseUrl.isEmpty) u else graft.urlkit.PyUrl.urljoin(baseUrl, u))
      .toSeq

  /** Expand a root sitemap (possibly an index) to page locs, bounded depth.
    * The knob-less overload keeps the pre-round-5 seed-expansion shape. */
  def expand(fetch: String => Option[Array[Byte]], rootUrl: String,
      maxDepth: Int = 3): Seq[String] =
    expandRouted(fetch, rootUrl, Knobs(), maxDepth).map(_._1)

  /** Knob-aware expansion: returns (loc, callback) pairs for urlset hits,
    * recursing only into follow-matched index entries. */
  def expandRouted(fetch: String => Option[Array[Byte]], rootUrl: String,
      knobs: Knobs, maxDepth: Int = 3): Seq[(String, String)] = {
    if (maxDepth < 0) return Nil
    fetch(rootUrl) match {
      case None => Nil
      case Some(body) =>
        route(parseDoc(body), knobs).flatMap {
          case (loc, None) => expandRouted(fetch, loc, knobs, maxDepth - 1)
          case (loc, Some(cb)) => Seq((loc, cb))
        }
    }
  }
}
