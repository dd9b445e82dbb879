package graft.extract

import graft.urlkit.{PyUrl, Requests, UrlKit}

/** AJAX-crawlable page handling — reference AjaxCrawlMiddleware
  * (`scrapy/downloadermiddlewares/ajaxcrawl.py:26-120`, deprecated legacy
  * Google `_escaped_fragment_` scheme, AJAXCRAWL_ENABLED off by default) +
  * `scrapy.utils.url.escape_ajax`.
  *
  * A 200 HTML page carrying `<meta name="fragment" content="!">` (outside
  * script/noscript/comments, within the first AJAXCRAWL_MAXSIZE bytes)
  * advertises an "AJAX crawlable" variant: the request is re-issued with
  * the `_escaped_fragment_=` query parameter. Batch shape: a pure URL
  * rewrite + body predicate — composable as a candidate-rewrite stage.
  */
object AjaxCrawl {

  /** `<meta name="fragment" content="!">` (either quote style, optional
    * self-close) — the reference's `_ajax_crawlable_re`. */
  private val MetaRe =
    """<meta\s+name=["']fragment["']\s+content=["']!["']/?>""".r

  private def stripTagWithContent(html: String, tag: String): String =
    s"(?is)<$tag\\b[^>]*>.*?</$tag\\s*>".r.replaceAllIn(html, " ")

  private val CommentRe = "(?s)<!--.*?-->".r

  /** Minimal `w3lib.html.replace_entities` subset: named quote/amp entities
    * and numeric references — enough to surface a meta tag written with
    * encoded quotes; everything else passes through untouched. */
  private[graft] def replaceBasicEntities(s: String): String =
    """&(#x?[0-9a-fA-F]+|quot|apos|amp|lt|gt);""".r.replaceAllIn(s, m => {
      val e = m.group(1)
      val repl = e match {
        case "quot" => "\""
        case "apos" => "'"
        case "amp" => "&"
        case "lt" => "<"
        case "gt" => ">"
        // supplementary code points (> U+FFFF) need a surrogate pair —
        // .toChar would silently truncate &#128512; to a wrong BMP char
        case hex if hex.startsWith("#x") || hex.startsWith("#X") =>
          new String(Character.toChars(Integer.parseInt(hex.drop(2), 16)))
        case dec if dec.startsWith("#") =>
          new String(Character.toChars(dec.drop(1).toInt))
      }
      scala.util.matching.Regex.quoteReplacement(repl)
    })

  /** The reference's `_has_ajaxcrawlable_meta` over the first
    * `lookupBytes` chars (AJAXCRAWL_MAXSIZE default 32768): fail-fast
    * substring checks, then strip script/noscript + comments, decode
    * entities, and match the meta pattern. */
  def hasAjaxCrawlableMeta(text: String, lookupBytes: Int = 32768): Boolean = {
    val t0 = if (text.length > lookupBytes) text.substring(0, lookupBytes) else text
    if (!t0.contains("fragment") || !t0.contains("content")) return false
    var t = t0
    for (tag <- Seq("script", "noscript")) t = stripTagWithContent(t, tag)
    t = replaceBasicEntities(t)
    t = CommentRe.replaceAllIn(t, " ")
    MetaRe.findFirstIn(t).isDefined
  }

  /** w3lib `add_or_replace_parameter`: decode the query pairs, replace the
    * named parameter (or append it), re-encode with quote_plus. */
  def addOrReplaceParameter(url: String, name: String, value: String): String = {
    val p = PyUrl.urlsplit(url)
    val pairs: Seq[(String, String)] =
      if (p.query.isEmpty) Nil
      else p.query.split("&", -1).toSeq.filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) (PyUrl.unquote(kv.replace('+', ' ')), "")
        else (PyUrl.unquote(kv.take(i).replace('+', ' ')),
          PyUrl.unquote(kv.drop(i + 1).replace('+', ' ')))
      }
    val updated =
      if (pairs.exists(_._1 == name))
        pairs.map { case (k, v) => if (k == name) (k, value) else (k, v) }
      else pairs :+ (name -> value)
    PyUrl.urlunsplit(p.scheme, p.netloc, p.path,
      Requests.urlencodeForm(updated), p.fragment)
  }

  /** `scrapy.utils.url.escape_ajax`: a `#!fragment` becomes the
    * `_escaped_fragment_` query parameter; other fragments pass through. */
  def escapeAjax(url: String): String = {
    val i = url.indexOf('#')
    if (i < 0) return url
    val frag = url.substring(i + 1)
    if (!frag.startsWith("!")) url
    else addOrReplaceParameter(url.substring(0, i), "_escaped_fragment_", frag.drop(1))
  }

  /** The middleware's rewrite: re-request the AJAX-crawlable variant
    * (`ajaxcrawl.py:68` `escape_ajax(request.url + "#!")`). */
  def ajaxCrawlableUrl(url: String): String =
    UrlKit.safeUrlString(escapeAjax(url + "#!"))
}
