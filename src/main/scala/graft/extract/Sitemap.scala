package graft.extract

/** Sitemap parsing for seed expansion (reference `scrapy/spiders/
  * sitemap.py:26-147`, `scrapy/utils/sitemap.py:19-59`): `<urlset>` yields
  * page locs, `<sitemapindex>` yields nested sitemap locs to recurse into;
  * gzipped bodies are sniffed by magic and inflated; robots.txt `Sitemap:`
  * lines discover sitemap URLs. Regex XML handling matches the synthetic
  * corpus shapes; semantics (recursion, gunzip, discovery) are the point. */
object Sitemap {

  final case class Parsed(locs: Seq[String], isIndex: Boolean)

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

  private val LocRe = "(?is)<loc>\\s*([^<]+?)\\s*</loc>".r
  private val IndexRe = "(?is)<\\s*sitemapindex".r

  def parse(body0: Array[Byte]): Parsed = {
    val body = if (isGzip(body0)) gunzip(body0) else body0
    val text = new String(body, java.nio.charset.StandardCharsets.UTF_8)
    val locs = LocRe.findAllMatchIn(text).map(_.group(1)).toSeq
    Parsed(locs, IndexRe.findFirstIn(text).isDefined)
  }

  /** `Sitemap:` lines from a robots.txt body (`scrapy/spiders/sitemap.py:
    * 100-109` semantics). */
  def sitemapUrlsFromRobots(robots: String): Seq[String] =
    robots.linesIterator
      .map(_.trim)
      .filter(_.toLowerCase(java.util.Locale.ROOT).startsWith("sitemap:"))
      .map(_.substring("sitemap:".length).trim)
      .filter(_.nonEmpty)
      .toSeq

  /** Expand a root sitemap (possibly an index) to page locs, bounded depth. */
  def expand(fetch: String => Option[Array[Byte]], rootUrl: String, maxDepth: Int = 3): Seq[String] = {
    if (maxDepth < 0) return Nil
    fetch(rootUrl) match {
      case None => Nil
      case Some(body) =>
        val p = parse(body)
        if (p.isIndex) p.locs.flatMap(u => expand(fetch, u, maxDepth - 1))
        else p.locs
    }
  }
}
