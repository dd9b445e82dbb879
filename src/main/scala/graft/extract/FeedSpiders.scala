package graft.extract

/** XMLFeedSpider / CSVFeedSpider parsing (`scrapy/spiders/feed.py:23-172`,
  * `scrapy/utils/iterators.py` `xmliter_lxml`/`csviter`) — the per-response
  * row/node iteration those spiders are built on, as pure functions usable
  * inside a `flatMap` over fetched bodies (the batch form of `parse_row` /
  * `parse_node`; each response parses independently, so the stage
  * distributes with no shuffle). Pinned by the reference's own spider tests
  * (`tests/test_spider.py` TestXMLFeedSpider.test_register_namespace,
  * TestCSVFeedSpider.test_parse_rows + `feed-sample6.csv`) in
  * FeedSpidersSpec.
  *
  * The XML side is a namespace-aware element-tree subset (no XPath engine on
  * this stack): `itertag` node iteration plus the child-text and attribute
  * accessors feed spiders actually use (`a:loc/text()`, `other/@value`,
  * `other/@b:custom` in the reference test). The CSV side mirrors CPython's
  * `csv.reader` defaults: configurable delimiter/quotechar, doubled-quote
  * escapes, quoted fields spanning newlines, and csviter's header handling
  * (first row unless `headers` given; rows with a different field count are
  * skipped).
  */
object FeedSpiders {

  // ---- CSV (`csviter`) ----------------------------------------------------

  /** CPython csv.reader over a decoded body: returns raw rows. */
  private[extract] def csvParse(text: String, delimiter: Char,
      quotechar: Char): Seq[Seq[String]] = {
    val rows = Vector.newBuilder[Seq[String]]
    var row = Vector.newBuilder[String]
    val field = new StringBuilder
    var inQuotes = false
    var quoted = false // current field started with the quotechar
    var sawAny = false // any char consumed for the current row
    var i = 0
    def endField(): Unit = {
      row += field.toString; field.clear(); quoted = false
    }
    def endRow(): Unit = {
      // an entirely blank line yields an EMPTY row like CPython csv.reader
      // ([] — not ['']), so a single-column CSV's header-length filter
      // skips it (ADVICE r4)
      if (sawAny || field.nonEmpty || quoted) { endField(); rows += row.result() }
      else rows += Vector.empty
      row = Vector.newBuilder[String]
      field.clear(); quoted = false
      sawAny = false
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (inQuotes) {
        if (c == quotechar) {
          if (i + 1 < text.length && text.charAt(i + 1) == quotechar) {
            field.append(quotechar); i += 1 // doubled quote = literal
          } else inQuotes = false
        } else field.append(c)
        sawAny = true
      } else c match {
        case `quotechar` if field.isEmpty && !quoted =>
          inQuotes = true; quoted = true; sawAny = true
        case `delimiter` => endField(); sawAny = true
        case '\r' =>
          if (i + 1 < text.length && text.charAt(i + 1) == '\n') i += 1
          endRow()
        case '\n' => endRow()
        case other => field.append(other); sawAny = true
      }
      i += 1
    }
    if (sawAny || field.nonEmpty || quoted) endRow()
    rows.result()
  }

  /** `csviter(response, delimiter, headers, quotechar)`: header-keyed row
    * maps; headers from the first row unless given; mismatched-length rows
    * skipped (the reference logs + continues). */
  def csvRows(body: Array[Byte], delimiter: Option[Char] = None,
      headers: Option[Seq[String]] = None,
      quotechar: Option[Char] = None,
      charset: Option[String] = None): Seq[Map[String, String]] = {
    // csviter decodes with response.encoding; `charset` is the batch
    // analogue of an explicitly-typed TextResponse (plain Response bodies
    // assume utf-8 like the reference's to_unicode default)
    val text = charset match {
      case Some(cs) => new String(body, java.nio.charset.Charset.forName(cs))
      case None => Encoding.decode(body, None)
    }
    val all = csvParse(text, delimiter.getOrElse(','), quotechar.getOrElse('"'))
    val (hdr, rows) = headers match {
      case Some(h) => (h, all)
      case None =>
        if (all.isEmpty) return Nil
        (all.head, all.tail)
    }
    rows.filter(_.size == hdr.size).map(r => hdr.zip(r).toMap)
  }

  // ---- XML (`xmliter_lxml` iternodes subset) ------------------------------

  /** One parsed element: resolved namespace URI ("" = none), local name,
    * attributes as ((nsUri, localName) -> value), children in order, and
    * its own text content (entity-decoded, excluding children's text). */
  final case class XmlNode(
      nsUri: String,
      localName: String,
      attributes: Seq[((String, String), String)],
      children: Seq[XmlNode],
      text: String) {

    private def resolve(name: String, ns: Map[String, String]): (String, String) = {
      val i = name.indexOf(':')
      if (i < 0) ("", name)
      else (ns.getOrElse(name.substring(0, i), ""), name.substring(i + 1))
    }

    /** `<child>/text()` with a registered-namespace map (the spider's
      * `namespaces` attr): text of direct children matching `a:loc` /
      * `loc` (un-prefixed = no namespace, like lxml). */
    def childTexts(name: String, ns: Map[String, String] = Map.empty): Seq[String] = {
      val (uri, local) = resolve(name, ns)
      children.filter(c => c.nsUri == uri && c.localName == local).map(_.text)
    }

    /** `child/@attr` (attr optionally prefixed — un-prefixed attributes have
      * NO namespace per the XML spec, regardless of default xmlns). */
    def childAttrs(child: String, attr: String,
        ns: Map[String, String] = Map.empty): Seq[String] = {
      val (cUri, cLocal) = resolve(child, ns)
      val (aUri, aLocal) = resolve(attr, ns)
      children.filter(c => c.nsUri == cUri && c.localName == cLocal)
        .flatMap(_.attributes.collect {
          case ((u, l), v) if u == aUri && l == aLocal => v
        })
    }
  }

  // XML names are Unicode (lxml iterates <þingflokkur> fine — reference
  // test_xmliter_unicode); \p{L}\p{M}\p{Nd} covers NameStartChar/NameChar
  // for real-world feeds without the full XML 1.0 production
  private val TagRe = java.util.regex.Pattern.compile(
    """<(/?)([\p{L}_][\p{L}\p{M}\p{Nd}._:-]*)((?:\s+[\p{L}\p{M}\p{Nd}._:-]+\s*=\s*(?:"[^"]*"|'[^']*'))*)\s*(/?)>""",
    java.util.regex.Pattern.DOTALL)
  private val AttrRe = java.util.regex.Pattern.compile(
    """([\p{L}\p{M}\p{Nd}._:-]+)\s*=\s*("([^"]*)"|'([^']*)')""",
    java.util.regex.Pattern.DOTALL)

  private final class Builder(name: String, attrs: Seq[(String, String)],
      val nsInScope: Map[String, String]) {
    val children = Vector.newBuilder[XmlNode]
    val text = new java.lang.StringBuilder
    def build(): XmlNode = {
      val i = name.indexOf(':')
      val (prefix, local) = if (i < 0) ("", name) else (name.substring(0, i), name.substring(i + 1))
      val uri =
        if (prefix.nonEmpty) nsInScope.getOrElse(prefix, "")
        else nsInScope.getOrElse("", "") // default xmlns applies to elements
      val resolvedAttrs = attrs.collect {
        case (n, v) if !n.startsWith("xmlns") && n != "xmlns" =>
          val j = n.indexOf(':')
          if (j < 0) (("", n), v) // un-prefixed attr: no namespace
          else ((nsInScope.getOrElse(n.substring(0, j), ""), n.substring(j + 1)), v)
      }
      XmlNode(uri, local, resolvedAttrs, children.result(),
        AjaxCrawl.replaceBasicEntities(text.toString))
    }
  }

  /** Parse a (well-formed) XML body and return every element whose resolved
    * namespace is empty and local name equals `itertag`, in document order —
    * `xmliter_lxml(response, itertag)` (an un-prefixed `itertag` matches
    * no-namespace elements only, like lxml's `iterparse` tag filter). Pass
    * `namespace` to iterate a namespaced tag instead. */
  def xmlNodes(body: Array[Byte], itertag: String,
      namespace: Option[String] = None): Seq[XmlNode] = {
    val text0 = Encoding.decode(body, None)
    // strip comments / CDATA (keeping CDATA payload) / prolog + doctype
    val text = text0
      .replaceAll("(?s)<!--.*?-->", "")
      .replaceAll("(?s)<!\\[CDATA\\[(.*?)]]>", "$1")
      .replaceAll("(?s)<\\?.*?\\?>", "")
      .replaceAll("(?s)<!DOCTYPE[^>]*>", "")
    val wantUri = namespace.getOrElse("")
    val out = Vector.newBuilder[XmlNode]
    val stack = scala.collection.mutable.Stack.empty[Builder]
    val m = TagRe.matcher(text)
    var last = 0
    def addText(upTo: Int): Unit =
      if (stack.nonEmpty && upTo > last) stack.top.text.append(text, last, upTo)
    def close(b: Builder): Unit = {
      val node = b.build()
      if (node.localName == itertag && node.nsUri == wantUri) out += node
      if (stack.nonEmpty) stack.top.children += node
    }
    while (m.find()) {
      addText(m.start)
      last = m.end
      val closing = m.group(1).nonEmpty
      val name = m.group(2)
      if (closing) {
        // pop to the matching open tag (tolerates minor malformation)
        var done = false
        while (!done && stack.nonEmpty) {
          val b = stack.pop()
          close(b)
          done = true // well-formed input: top IS the match
        }
      } else {
        val attrs = Vector.newBuilder[(String, String)]
        val am = AttrRe.matcher(m.group(3))
        while (am.find())
          attrs += ((am.group(1),
            Option(am.group(3)).getOrElse(Option(am.group(4)).getOrElse(""))))
        val attrSeq = attrs.result()
        val parentNs = stack.headOption.map(_.nsInScope).getOrElse(Map.empty[String, String])
        val ns = attrSeq.foldLeft(parentNs) {
          case (acc, ("xmlns", v)) => acc + ("" -> v)
          case (acc, (n, v)) if n.startsWith("xmlns:") => acc + (n.substring(6) -> v)
          case (acc, _) => acc
        }
        val b = new Builder(name, attrSeq, ns)
        if (m.group(4).nonEmpty) close(b) // self-closing
        else stack.push(b)
      }
    }
    while (stack.nonEmpty) close(stack.pop())
    out.result()
  }
}
