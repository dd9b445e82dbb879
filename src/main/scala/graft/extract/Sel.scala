package graft.extract

import scala.collection.mutable.ArrayBuffer

import HtmlDom.{Comb, Compound, Descendant, Child, Adjacent, Sibling, El}

/** parsel-semantics Selector facade over [[HtmlDom]] — the reference's
  * user-facing query surface (`scrapy/selector/unified.py` wraps parsel;
  * `response.css(...)` / `response.xpath(...)` / `.get` / `.getall` /
  * `.attrib` / `.re` are the API every reference spider callback uses,
  * `docs/topics/selectors.rst`). Pinned by SelectorSpec goldens taken from
  * that doc page's worked examples (selectors-sample1.html) and the
  * in-subset cases of `tests/test_selector.py`.
  *
  * Documented scope (fail-fast beyond it, like [[HtmlDom]]'s parsers):
  *  - css: HtmlDom's subset (tag/#id/.class/[attr ops]/' '>'+'~') plus the
  *    parsel pseudo-elements `::text` and `::attr(name)`;
  *  - xpath: HtmlDom's subset (`//`/`/` steps, `[@a]`/`[@a='v']`/
  *    `[contains(@a,'v')]`/`[starts-with(@a,'v')]` predicates) plus the
  *    `text()` and `@attr` value endpoints, relative forms (`.//x`, `./x`,
  *    `x`, `@a`, `text()`), and the parsel gotcha that a nested query
  *    starting with `//` is evaluated against the WHOLE document;
  *  - `get()` of an element selector returns the raw source span of the
  *    element (this engine keeps the original markup), NOT lxml's
  *    re-serialization — equal for well-formed input, different where
  *    libxml2's recovery would rewrite tags;
  *  - `.re()` runs on the extracted string values with CPython `findall`
  *    group semantics; no second entity-decode pass (values are already
  *    decoded once, like lxml's parse).
  */
object Sel {

  sealed trait Node
  /** An element (or the virtual document root for a fresh `Sel(html)`). */
  final case class ElNode(el: El) extends Node
  /** A text node or attribute value, already entity-decoded. */
  final case class ValNode(value: String) extends Node
  /** A JSON value produced by [[Sel.jmespath]] (parsel's json-type
    * selector). A string value re-parses as HTML when css/xpath chains
    * onto it. */
  final case class JsonNode(value: Json.JVal) extends Node

  /** Document-level selector ("response.selector"): one root node. */
  def apply(html: String): Sel = {
    val doc = HtmlDom.parseDoc(html)
    new Sel(html, doc, Vector(ElNode(doc.root)))
  }

  // ------------------------------------------------------------ query forms

  private[extract] sealed trait Endpoint
  private[extract] case object Elements extends Endpoint
  /** Child text nodes of the matched elements. */
  private[extract] case object ChildText extends Endpoint
  /** All descendant text nodes of the matched elements ("//text()",
    * css "... *::text"). */
  private[extract] case object DescText extends Endpoint
  private[extract] final case class Attr(name: String) extends Endpoint

  /** A parsed query: optional element steps + a value endpoint.
    * `absolute` = evaluate from the document root even when nested. */
  private[extract] final case class Query(
      steps: Option[HtmlDom.Selector],
      endpoint: Endpoint,
      absolute: Boolean)

  private def bad(q: String, why: String): Nothing =
    throw new IllegalArgumentException(s"unsupported query '$q': $why")

  private val AttrEndRe = """^(.*?)/@([A-Za-z_][\w:.-]*)$""".r

  /** Parse an xpath query into steps + endpoint (see class doc for scope). */
  private[extract] def parseXPathQuery(q0: String): Query = {
    val q = q0.trim
    if (q.isEmpty) bad(q0, "empty xpath")
    val rel = !q.startsWith("/")
    // normalize: ".//a" -> "//a" (relative), "./a"/"a" -> "/a" (relative)
    val body0 =
      if (q.startsWith("./")) q.substring(1)
      else if (q.startsWith("descendant::")) "//" + q.substring(12)
      else if (rel) "/" + q
      else q
    val (base, endpoint) =
      if (body0 == "//text()") ("", DescText)
      else if (body0 == "/text()") ("", ChildText)
      else if (body0.endsWith("//text()")) (body0.dropRight(8), DescText)
      else if (body0.endsWith("/text()")) (body0.dropRight(7), ChildText)
      else body0 match {
        case AttrEndRe(b, name) => (b, Attr(name.toLowerCase(java.util.Locale.ROOT)))
        case _ => (body0, Elements)
      }
    val steps =
      if (base.isEmpty) None
      else Some(HtmlDom.parseXPath(base))
    Query(steps, endpoint, absolute = !rel)
  }

  private val CssAttrRe = """^(.*?)::attr\(\s*([^)\s]+)\s*\)$""".r

  /** Parse a css query with the parsel `::text` / `::attr(name)`
    * pseudo-elements. cssselect translates with a `descendant-or-self::*`
    * slash prefix, so a pseudo-element on the bare universal compound —
    * `*::text`, a trailing `X ::text`, or a lone `::text` — becomes
    * `descendant-or-self::text()`: ALL text under the anchor, not just
    * child text (csstranslator.py `XPathExpr.__str__` star rewrite;
    * pinned by the docs' `#images *::text` golden). */
  private[extract] def parseCssQuery(q0: String): Query = {
    // a pseudo-element after whitespace hangs off an implicit `*`
    val q = q0.trim.replaceAll("\\s+::", " *::")
    if (q.isEmpty) bad(q0, "empty css")
    def stepsOf(base: String): Option[HtmlDom.Selector] =
      if (base.trim.isEmpty) None else Some(HtmlDom.parseCss(base))
    if (q.endsWith("::text")) {
      val base = q.dropRight(6).trim
      stepsOf(base) match {
        case None => Query(None, DescText, absolute = false)
        case Some(sel) =>
          val (lastComb, lastComp) = sel.steps.last
          val bareStar = lastComp == Compound(Some("*"), None, Nil, Nil, Nil)
          if (bareStar && lastComb == Descendant) {
            val prefix = sel.steps.dropRight(1)
            if (prefix.isEmpty) Query(None, DescText, absolute = false)
            else Query(Some(HtmlDom.Selector(prefix)), DescText, absolute = false)
          } else Query(Some(sel), ChildText, absolute = false)
      }
    } else q match {
      case CssAttrRe(base, name) =>
        Query(stepsOf(base), Attr(name.toLowerCase(java.util.Locale.ROOT)),
          absolute = false)
      case _ => Query(stepsOf(q), Elements, absolute = false)
    }
  }

  // ------------------------------------------------- Spark-facing helpers

  private val queryCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Boolean), Query]()

  private def cachedQuery(q: String, isCss: Boolean): Query = {
    if (queryCache.size > 2048) queryCache.clear() // bound, never grows past
    queryCache.computeIfAbsent((q, isCss),
      k => if (k._2) parseCssQuery(k._1) else parseXPathQuery(k._1))
  }

  /** `Sel(html).css(q).getall` with the parsed query cached — the scalar
    * the `css_select` Catalyst expression calls per row. */
  def cssSelectAll(html: String, q: String): Seq[String] =
    Sel(html).run(cachedQuery(q, isCss = true)).getall

  /** `Sel(html).xpath(q).getall`, parsed-query cached (`xpath_select`). */
  def xpathSelectAll(html: String, q: String): Seq[String] =
    Sel(html).run(cachedQuery(q, isCss = false)).getall
}

final class Sel private[extract] (
    html: String,
    doc: HtmlDom.Doc,
    val nodes: Seq[Sel.Node]) {

  import Sel._

  def length: Int = nodes.length
  def isEmpty: Boolean = nodes.isEmpty

  /** parsel iteration: one single-node selector per result. */
  def items: Seq[Sel] = nodes.map(n => new Sel(html, doc, Vector(n)))

  def css(q: String): Sel = run(parseCssQuery(q))
  def xpath(q: String): Sel = run(parseXPathQuery(q))

  // ------------------------------------------------------------- evaluation

  private[extract] def run(query: Query): Sel = {
    // parsel: css/xpath on a json-type STRING selector re-parses the string
    // as HTML (`resp.jmespath("html").xpath(...)`, test_selector.py). The
    // fresh Sel carries its own source, so element serialization works.
    nodes match {
      case Seq(JsonNode(Json.JStr(s))) => return Sel(s).run(query)
      case _ =>
    }
    val out = Vector.newBuilder[Node]
    for (node <- nodes) node match {
      case ElNode(ctx) =>
        val ctxEff = if (query.absolute) doc.root else ctx
        val matched: Seq[El] = query.steps match {
          case Some(sel) => selectWithin(sel, ctxEff)
          case None => Seq(ctxEff) // endpoint applies to the context itself
        }
        query.endpoint match {
          case Elements => matched.foreach(out += ElNode(_))
          case Attr(name) =>
            matched.foreach(el => el.attrs.get(name).foreach(v => out += ValNode(v)))
          case ChildText =>
            textNodes(matched.iterator.map(childTextSpans)).foreach(out += _)
          case DescText =>
            textNodes(matched.iterator.map(descTextSpans)).foreach(out += _)
        }
      case ValNode(_) => // string values have no children/attributes
      case JsonNode(_) => // non-string JSON values have no HTML children
        // (a single string value was delegated above; mixed node sets keep
        // parsel's per-node semantics: nothing matches inside a non-string)
    }
    new Sel(html, doc, out.result())
  }

  // ------------------------------------------------------------- jmespath

  /** parsel `.jmespath(query)` ([[JmesPath]] documents the supported
    * subset). The JSON root per node: a prior jmespath result continues
    * from its value; a text/attribute value parses as JSON; the document
    * root parses the WHOLE source as JSON (a JSON response body); any other
    * element parses its direct text content (`<content>{...}</content>`).
    * A list result fans out into one selector per element, like parsel. */
  def jmespath(q: String): Sel = {
    val expr = JmesPath.parse(q)
    val out = Vector.newBuilder[Node]
    for (n <- nodes) {
      val root: Json.JVal = n match {
        case JsonNode(v) => v
        case ValNode(s) => Json.loads(s)
        case ElNode(el) =>
          if (el.parent == null) Json.loads(html)
          else Json.loads(
            childTextSpans(el).map(s =>
              LinkExtract.replaceHtmlEntities(html.substring(s._1, s._2)))
              .mkString)
      }
      JmesPath.eval(expr, root) match {
        case Json.JNull => // no result
        case Json.JArr(items) => items.foreach(v => out += JsonNode(v))
        case v => out += JsonNode(v)
      }
    }
    new Sel(html, doc, out.result())
  }

  /** One query evaluation = an XPath node-set: document order, each node
    * once (dedup by source offset across overlapping matched elements). */
  private def textNodes(spanSets: Iterator[Seq[(Int, Int)]]): Seq[Node] = {
    val seen = scala.collection.mutable.TreeMap.empty[Int, (Int, Int)]
    spanSets.foreach(_.foreach(s => seen(s._1) = s))
    seen.values.iterator
      .map(s => ValNode(LinkExtract.replaceHtmlEntities(html.substring(s._1, s._2))))
      .toVector
  }

  /** Matches of `sel` anchored at `ctx`, document order. First-step
    * Descendant = strict descendant (cssselect translates with a
    * `descendant-or-self::*` slash prefix — a CHILD of any
    * descendant-or-self node, i.e. never the context itself); every
    * intermediate step stays strictly below the anchor. */
  private def selectWithin(sel: HtmlDom.Selector, ctx: El): Seq[El] = {
    val steps = sel.steps
    def strictlyUnder(e: El): Boolean = {
      var p = e.parent
      while (p != null) { if (p eq ctx) return true; p = p.parent }
      false
    }
    def matchFrom(el: El, idx: Int): Boolean = {
      val (comb, comp) = steps(idx)
      if (!comp.matches(el)) return false
      if (idx == 0) comb match {
        case Descendant => strictlyUnder(el)
        case Child => el.parent eq ctx
        case Adjacent | Sibling => false
      } else comb match {
        case Descendant =>
          var p = el.parent
          while (p != null && (p ne ctx)) {
            if (matchFrom(p, idx - 1)) return true
            p = p.parent
          }
          false
        case Child =>
          el.parent != null && (el.parent ne ctx) && matchFrom(el.parent, idx - 1)
        case Adjacent =>
          el.precedingSiblings.headOption.exists(matchFrom(_, idx - 1))
        case Sibling =>
          el.precedingSiblings.exists(matchFrom(_, idx - 1))
      }
    }
    doc.all.filter(e => strictlyUnder(e) && matchFrom(e, steps.length - 1))
  }

  /** Source spans of the element's CHILD text nodes: the gaps of its
    * content range not covered by child-element outer spans or parser
    * skips (comments / doctype / PIs / ignored close tags). */
  private def childTextSpans(el: El): Seq[(Int, Int)] = {
    val from = if (el.parent == null) 0 else el.openEnd
    val to = el.end
    if (to <= from) return Nil
    val cover = ArrayBuffer.empty[(Int, Int)]
    el.children.foreach(c => cover += ((c.start, c.outerEnd)))
    doc.skips.foreach { s =>
      if (s._1 >= from && s._1 < to) cover += s
    }
    val sorted = cover.sortBy(_._1)
    val out = ArrayBuffer.empty[(Int, Int)]
    var pos = from
    sorted.foreach { case (s, e) =>
      if (s > pos) out += ((pos, s))
      pos = math.max(pos, e)
    }
    if (pos < to) out += ((pos, to))
    out.toSeq
  }

  /** Text spans of the whole subtree (descendant-or-self text nodes). */
  private def descTextSpans(el: El): Seq[(Int, Int)] = {
    val out = ArrayBuffer.empty[(Int, Int)]
    def walk(e: El): Unit = {
      out ++= childTextSpans(e)
      e.children.foreach(walk)
    }
    walk(el)
    out.toSeq
  }

  // ------------------------------------------------------------- extraction

  private def serialize(n: Node): String = n match {
    case ValNode(v) => v
    // parsel json-type get(): a string is itself, anything else renders
    // with json.dumps (so `.jmespath("total").get() == "4"`)
    case JsonNode(Json.JStr(s)) => s
    case JsonNode(v) => Json.dumps(v)
    case ElNode(el) =>
      if (el.parent == null) html // the virtual root = the whole document
      else html.substring(el.start, el.outerEnd)
  }

  /** First result, `None` when nothing matched (parsel `.get()`). */
  def get: Option[String] = nodes.headOption.map(serialize)

  /** parsel `.get(default=...)`. */
  def getOrElse(default: String): String = get.getOrElse(default)

  /** All results (parsel `.getall()` / legacy `.extract()`). */
  def getall: Seq[String] = nodes.map(serialize)

  /** Attributes of the FIRST node (parsel `SelectorList.attrib`); empty
    * for value nodes and empty lists. */
  def attrib: Map[String, String] = nodes.headOption match {
    case Some(ElNode(el)) => el.attrs
    case _ => Map.empty
  }

  /** parsel `.re()`: CPython `re.findall` over each extracted string —
    * no groups = whole match, else all group values ('' for a
    * non-participating group), flattened. */
  def re(pattern: String): Seq[String] = {
    val p = java.util.regex.Pattern.compile(pattern)
    getall.flatMap { s =>
      val m = p.matcher(s)
      val out = ArrayBuffer.empty[String]
      while (m.find()) {
        if (m.groupCount() == 0) out += m.group()
        else (1 to m.groupCount()).foreach { g =>
          out += (if (m.group(g) == null) "" else m.group(g))
        }
      }
      out
    }
  }

  /** parsel `.re_first()`. */
  def reFirst(pattern: String): Option[String] = re(pattern).headOption

  // ------------------------------------------------------- response.follow

  /** `response.follow(selector)`'s URL extraction (`_url_from_selector`,
    * reference `http/response/text.py:298-311`): an attribute/text value
    * node yields itself html5-whitespace-stripped; an `<a>`/`<link>`
    * element yields its raw `href`. Left = the reference's
    * `_InvalidSelector` message (follow raises it, follow_all suppresses). */
  private def urlOfNode(n: Node): Either[String, String] = n match {
    case ValNode(v) => Right(LinkExtract.stripHtml5Whitespace(v))
    case JsonNode(Json.JStr(s)) => Right(LinkExtract.stripHtml5Whitespace(s))
    case JsonNode(_) => Left("Unsupported selector: non-string JSON value")
    case ElNode(el) if el.parent == null =>
      Left("Unsupported selector: document root")
    case ElNode(el) if el.tag != "a" && el.tag != "link" =>
      Left(s"Only <a> and <link> elements are supported; got <${el.tag}>")
    case ElNode(el) => el.attrs.get("href")
      .toRight(s"<${el.tag}> element has no href attribute")
  }

  /** `response.follow(sel)` on the FIRST node: the absolute URL the built
    * Request would carry (`urljoin(base, url)`). Throws
    * IllegalArgumentException for unsupported selectors, like the
    * reference's `_InvalidSelector` / empty-list `ValueError`. */
  def follow(base: String): String = nodes.headOption match {
    case None => throw new IllegalArgumentException("no selector to follow")
    case Some(n) => urlOfNode(n) match {
      case Right(u) => graft.urlkit.PyUrl.urljoin(base, u)
      case Left(msg) => throw new IllegalArgumentException(msg)
    }
  }

  /** `response.follow_all(css=...|xpath=...|urls)`: absolute URLs of every
    * followable node — selectors without an obtainable link (anchor with no
    * href, non-link element) are silently skipped, per the reference doc. */
  def followAll(base: String): Seq[String] =
    nodes.flatMap(n => urlOfNode(n).toOption)
      .map(u => graft.urlkit.PyUrl.urljoin(base, u))
}
