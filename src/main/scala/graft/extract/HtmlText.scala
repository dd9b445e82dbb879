package graft.extract

/** HTML → visible-text extraction: the precursor every crawl→training-data
  * pipeline runs before quality scoring / language ID / dedup
  * (w3lib.html `remove_tags_with_content` + `remove_tags` +
  * `replace_entities` composition; the reference exposes the same
  * primitives and parsel's `::text` for this job).
  *
  * Deterministic documented scope: comments/doctype/PI dropped;
  * script/style/noscript/template dropped WITH their content; block-level
  * tags become line breaks, inline tags become spaces; character
  * references decoded ([[LinkExtract.replaceHtmlEntities]] semantics);
  * whitespace collapsed per line, blank lines dropped. Pure function —
  * usable as a UDF column and in plain Scala tests.
  */
object HtmlText {

  /** Content-suppressed elements (their text is not visible). */
  private val DropContent = Set("script", "style", "noscript", "template")

  /** Tags that imply a line break around them (HTML block-ish display set
    * plus br/tr/li — enough for stable paragraph structure). */
  private val BlockTags = Set(
    "address", "article", "aside", "blockquote", "br", "caption", "dd",
    "details", "dialog", "div", "dl", "dt", "fieldset", "figcaption",
    "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
    "header", "hr", "html", "body", "head", "li", "main", "nav", "ol",
    "option", "p", "pre", "section", "summary", "table", "tbody",
    "tfoot", "thead", "title", "tr", "ul") // td/th are cell separators (space)

  private def isNameStart(c: Char) =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Visible text of an HTML document, line-structured:
    * one line per block run, single-space-collapsed, no blank lines. */
  def visibleText(html: String): String = {
    val n = html.length
    val lower = html.toLowerCase(java.util.Locale.ROOT)
    val out = new java.lang.StringBuilder(n / 4)
    var i = 0
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { out.append(html, i, n); i = n }
      else {
        out.append(html, i, lt)
        if (lt + 1 >= n) { i = n }
        else {
          val c = html.charAt(lt + 1)
          if (c == '!') {
            if (html.startsWith("<!--", lt)) {
              val e = html.indexOf("-->", lt + 4)
              i = if (e < 0) n else e + 3
            } else {
              val e = html.indexOf('>', lt + 2)
              i = if (e < 0) n else e + 1
            }
          } else if (c == '?') {
            val e = html.indexOf('>', lt + 2)
            i = if (e < 0) n else e + 1
          } else if (c == '/' || isNameStart(c)) {
            var j = if (c == '/') lt + 2 else lt + 1
            val ts = j
            while (j < n && (isNameStart(html.charAt(j)) ||
              (html.charAt(j) >= '0' && html.charAt(j) <= '9'))) j += 1
            val tag = lower.substring(ts, j)
            // scan to '>' respecting quoted attribute values
            var q: Char = 0
            var k = j
            while (k < n && (q != 0 || html.charAt(k) != '>')) {
              val ch = html.charAt(k)
              if (q == 0 && (ch == '"' || ch == '\'')) q = ch
              else if (q != 0 && ch == q) q = 0
              k += 1
            }
            i = if (k < n) k + 1 else n
            if (c != '/' && DropContent.contains(tag)) {
              val close = lower.indexOf("</" + tag, i)
              if (close < 0) i = n
              else {
                val g = html.indexOf('>', close)
                i = if (g < 0) n else g + 1
              }
            }
            out.append(if (BlockTags.contains(tag)) '\n' else ' ')
          } else {
            out.append('<') // literal '<'
            i = lt + 1
          }
        }
      }
    }
    // entity decode, then per-line whitespace collapse, drop blank lines
    LinkExtract.replaceHtmlEntities(out.toString)
      .split('\n')
      .iterator
      .map(_.replaceAll("[\\s\\u00A0]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }
}
