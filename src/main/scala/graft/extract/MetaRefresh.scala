package graft.extract

/** `<meta http-equiv="refresh">` detection — reference MetaRefreshMiddleware
  * (`scrapy/downloadermiddlewares/redirect.py:184-212`, defaults
  * METAREFRESH_MAXDELAY=100, METAREFRESH_IGNORE_TAGS=["noscript"],
  * `default_settings.py:432-433`) over w3lib `html.get_meta_refresh`
  * semantics: strip comments and ignored-tag blocks, find the first
  * refresh meta tag, parse `content="<seconds>; url=<target>"`.
  *
  * w3lib is not installed in this container (CLAUDE.md invariant #2), so
  * this is a documented regex reimplementation of the common shapes
  * (either attribute order, optional quotes, `;` or `,` separator,
  * case-insensitive `URL=`); the oracle shares this code, keeping
  * conformance exact.
  */
object MetaRefresh {

  private val CommentRe = "(?s)<!--.*?-->".r

  private def stripTag(html: String, tag: String): String =
    s"(?is)<$tag\\b[^>]*>.*?</$tag\\s*>".r.replaceAllIn(html, " ")

  // <meta ... http-equiv=refresh ... content="..."> in either attribute order
  private val MetaRe1 =
    """(?is)<meta\s[^>]*?http-equiv\s*=\s*["']?\s*refresh\s*["']?[^>]*?content\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""".r
  private val MetaRe2 =
    """(?is)<meta\s[^>]*?content\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))[^>]*?http-equiv\s*=\s*["']?\s*refresh\s*["']?""".r

  private val ContentRe =
    """(?is)^\s*(\d+(?:\.\d+)?)\s*(?:[;,]\s*url\s*=\s*['"]?(.*?)['"]?\s*)?$""".r

  private val Token = "http-equiv"

  /** ASCII case-insensitive token scan over raw bytes. Exact as a
    * prefilter: UTF-8 multi-byte sequences have the high bit set, so they
    * can never alias the ASCII token. */
  private def containsTokenAscii(body: Array[Byte]): Boolean = {
    val n = Token.length
    var i = 0
    val max = body.length - n
    while (i <= max) {
      var j = 0
      var ok = true
      while (ok && j < n) {
        var c = body(i + j).toInt
        if (c >= 'A' && c <= 'Z') c += 32
        if (c != Token.charAt(j)) ok = false
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  /** [[find]] over the raw body bytes with a cheap prefilter: a page without
    * the `http-equiv` token (the ~97% case) can't match MetaRe1/2, so it
    * skips both the String decode and the comment/noscript regex passes.
    * This is the hot-path entry the engine and the oracle share. */
  def findInBytes(body: Array[Byte]): Option[(Double, String)] =
    if (!containsTokenAscii(body)) None
    else find(new String(body, java.nio.charset.StandardCharsets.UTF_8))

  /** First refresh directive as (delaySeconds, rawTargetUrl); None when the
    * page has none (or it carries no url — a self-refresh is not followed,
    * matching the reference's `if not url: return response`). */
  def find(html: String, ignoreTags: Seq[String] = Seq("noscript")): Option[(Double, String)] = {
    var text = CommentRe.replaceAllIn(html, " ")
    for (t <- ignoreTags) text = stripTag(text, t)
    val content = (MetaRe1.findFirstMatchIn(text), MetaRe2.findFirstMatchIn(text)) match {
      case (Some(m1), Some(m2)) => Some(if (m1.start <= m2.start) m1 else m2)
      case (a, b) => a.orElse(b)
    }
    content
      .map(m => Option(m.group(1)).orElse(Option(m.group(2))).getOrElse(m.group(3)))
      .flatMap {
        case ContentRe(delay, url) if url != null && url.nonEmpty =>
          Some((delay.toDouble, url.trim))
        case _ => None
      }
  }
}
