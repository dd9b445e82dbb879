package graft.extract

import scala.collection.mutable.ArrayBuffer

/** Tolerant HTML element tree with source offsets, backing the
  * LinkExtractor's `restrict_xpaths` / `restrict_css` knobs (reference
  * `scrapy/linkextractors/lxmlhtml.py:199-201,270-277`: restricted
  * extraction selects subdocuments with lxml/parsel, then extracts links
  * from each subdocument in order). The graft keeps the existing scan-based
  * link extraction and uses this tree only to compute the character ranges
  * of the selected subtrees — a link is "inside" a subdocument iff its tag
  * offset falls within the subtree's [start, end) source span, which is
  * equivalent to lxml's `el.iter()` membership for any parse both stacks
  * agree on.
  *
  * Parser scope (documented subset, mirroring libxml2's HTML recovery for
  * the shapes the reference test suite exercises): comments / doctype / PI
  * skipped, rawtext elements (script/style/textarea/title) consume to their
  * close tag, void elements never nest, a close tag pops to the nearest
  * matching ancestor (implicitly closing children), unknown close tags are
  * ignored, unclosed elements end at EOF, and a repeated `p`/`li`/`tr`/
  * `td`/`th`/`option`/`dd`/`dt` auto-closes its open predecessor. */
object HtmlDom {

  /** One element. `start` = offset of its `<`; `end` = offset just past its
    * content (the `<` of its close tag, or past `>` for void/self-closed,
    * or EOF when unclosed). `attrs` keeps the FIRST occurrence of each
    * attribute (libxml2 drops duplicates), entity-decoded. */
  final class El(
      val tag: String,
      val attrs: Map[String, String],
      val start: Int,
      val parent: El) {
    var end: Int = -1
    /** Offset just past the open tag's '>' — text content of an element
      * with no child tags is `html.substring(openEnd, end)`. */
    var openEnd: Int = -1
    /** Offset just past the element INCLUDING its close tag (== `end` when
      * implicitly closed / void / unclosed-at-EOF): the source span a
      * selector `.get()` serializes is `[start, outerEnd)`. */
    var outerEnd: Int = -1
    val children: ArrayBuffer[El] = ArrayBuffer.empty

    def classes: Set[String] = attrs.get("class") match {
      case Some(c) => c.split("\\s+").filter(_.nonEmpty).toSet
      case None => Set.empty
    }

    /** Element-only preceding siblings, nearest last. */
    def precedingSiblings: Seq[El] =
      if (parent == null) Nil
      else parent.children.takeWhile(_ ne this).reverse.toSeq
  }

  private val VoidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "source", "track", "wbr", "param")
  private val RawText = Set("script", "style", "textarea", "title")
  /** Tags where a repeated open implies closing the previous one. */
  private val AutoClose = Set("p", "li", "tr", "td", "th", "option", "dd", "dt")

  private def isNameStart(c: Char) =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isNameChar(c: Char) = isNameStart(c) ||
    (c >= '0' && c <= '9') || c == '-' || c == '_' || c == ':' || c == '.'

  /** A parsed document: the virtual root (spanning the whole source), all
    * elements in document order, and the `skips` — source spans the parser
    * consumed that are neither element content nor text (comments, doctype,
    * PIs, ignored close tags), which text-node extraction must exclude. */
  final case class Doc(root: El, all: Seq[El], skips: Seq[(Int, Int)])

  /** Parse a decoded HTML string into a list of all elements in document
    * order (the synthetic root is not included). */
  def parse(html: String): Seq[El] = parseDoc(html).all

  /** Full-document parse ([[Doc]]): what [[Sel]] evaluates against. */
  def parseDoc(html: String): Doc = {
    val n = html.length
    val lower = html.toLowerCase(java.util.Locale.ROOT) // rawtext close scan
    val all = ArrayBuffer.empty[El]
    val skips = ArrayBuffer.empty[(Int, Int)]
    val root = new El("", Map.empty, 0, null)
    var stack = List(root)
    var i = 0

    def closeTo(depth: Int, at: Int): Unit = {
      while (stack.length > depth) {
        stack.head.end = at
        stack.head.outerEnd = at // implicit close: no close tag of its own
        stack = stack.tail
      }
    }

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { i = n }
      else if (lt + 1 >= n) { i = n }
      else {
        val c = html.charAt(lt + 1)
        if (c == '!') {
          if (html.startsWith("<!--", lt)) {
            val e = html.indexOf("-->", lt + 4)
            i = if (e < 0) n else e + 3
            skips += ((lt, i))
          } else {
            val e = html.indexOf('>', lt + 2)
            i = if (e < 0) n else e + 1
            skips += ((lt, i))
          }
        } else if (c == '?') {
          val e = html.indexOf('>', lt + 2)
          i = if (e < 0) n else e + 1
          skips += ((lt, i))
        } else if (c == '/') {
          var j = lt + 2
          val ts = j
          while (j < n && isNameChar(html.charAt(j))) j += 1
          val tag = html.substring(ts, j).toLowerCase(java.util.Locale.ROOT)
          val gt = html.indexOf('>', j)
          val after = if (gt < 0) n else gt + 1
          // pop to nearest matching ancestor; ignore unmatched close tags
          val depth = stack.indexWhere(_.tag == tag)
          if (depth >= 0 && stack(depth).tag.nonEmpty) {
            // children implicitly closed at this close tag's '<'
            closeTo(stack.length - depth, lt)
            stack.head.end = lt
            stack.head.outerEnd = after
            stack = stack.tail
          } else {
            skips += ((lt, after)) // ignored close tag: not a text node
          }
          i = after
        } else if (isNameStart(c)) {
          var j = lt + 1
          while (j < n && isNameChar(html.charAt(j))) j += 1
          val tag = html.substring(lt + 1, j).toLowerCase(java.util.Locale.ROOT)
          // scan to the closing '>' respecting quotes
          var q: Char = 0
          var k = j
          while (k < n && (q != 0 || html.charAt(k) != '>')) {
            val ch = html.charAt(k)
            if (q == 0 && (ch == '"' || ch == '\'')) q = ch
            else if (q != 0 && ch == q) q = 0
            k += 1
          }
          val gt = if (k < n) k else n - 1
          val attrsStr = html.substring(j, math.max(j, gt))
          val selfClosing = attrsStr.trim.endsWith("/")
          val attrs = parseAttrs(attrsStr)
          // implied end: <p> inside <p>, <li> inside <li>, ... (same tag);
          // td/th close each other; tr closes an open td/th/tr run. Scan
          // only the run of auto-closable ancestors (a <div> between
          // blocks the implication) and close through the DEEPEST match
          // so <tr> after [td, tr, table] pops both td and tr.
          if (AutoClose.contains(tag)) {
            def closes(open: String): Boolean = open == tag ||
              (Set("td", "th").contains(tag) && Set("td", "th").contains(open)) ||
              (tag == "tr" && Set("td", "th", "tr").contains(open))
            val runEnd = stack.indexWhere(e => !AutoClose.contains(e.tag))
            val limit = if (runEnd < 0) stack.length else runEnd
            var d = limit - 1
            while (d >= 0 && !closes(stack(d).tag)) d -= 1
            if (d >= 0) closeTo(stack.length - d - 1, lt)
          }
          val el = new El(tag, attrs, lt, stack.head)
          stack.head.children += el
          all += el
          i = gt + 1
          el.openEnd = i
          if (VoidTags.contains(tag) || selfClosing) {
            el.end = i
            el.outerEnd = i
          } else if (RawText.contains(tag)) {
            val close = lower.indexOf("</" + tag, i)
            if (close < 0) { el.end = n; el.outerEnd = n; i = n }
            else {
              el.end = close
              val g = html.indexOf('>', close)
              i = if (g < 0) n else g + 1
              el.outerEnd = i
            }
          } else {
            stack = el :: stack
          }
        } else {
          i = lt + 1 // literal '<'
        }
      }
    }
    closeTo(1, n)
    root.end = n
    root.openEnd = 0
    root.outerEnd = n
    Doc(root, all.toSeq, skips.toSeq)
  }

  private val AttrRe = java.util.regex.Pattern.compile(
    """([a-zA-Z_][\w:.-]*)\s*(?:=\s*("([^"]*)"|'([^']*)'|([^\s>]*)))?""",
    java.util.regex.Pattern.DOTALL)

  private def parseAttrs(s: String): Map[String, String] = {
    val m = AttrRe.matcher(s)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    while (m.find()) {
      val name = m.group(1).toLowerCase(java.util.Locale.ROOT)
      val v = Option(m.group(3)).orElse(Option(m.group(4)))
        .orElse(Option(m.group(5))).getOrElse("")
      if (!out.contains(name)) out(name) = LinkExtract.replaceHtmlEntities(v)
    }
    out.toMap
  }

  // ---------------------------------------------------------------- selectors

  /** One compound test: all present parts must match the element.
    * `attrOps` holds the non-equality attribute tests as `(op, name, value)`
    * with CSS operator spelling — `*=` substring (xpath `contains`), `^=`
    * prefix (xpath `starts-with`), `$=` suffix, `~=` whitespace-list word,
    * `|=` dash-match. cssselect compiles `^=`/`$=`/`*=` with an empty value
    * to a never-matching condition; mirrored here. */
  final case class Compound(
      tag: Option[String],
      id: Option[String],
      classes: Seq[String],
      attrEq: Seq[(String, String)],
      attrPresent: Seq[String],
      attrOps: Seq[(String, String, String)] = Nil) {
    def matches(el: El): Boolean =
      tag.forall(t => t == "*" || t == el.tag) &&
        id.forall(v => el.attrs.get("id").contains(v)) &&
        classes.forall(el.classes.contains) &&
        attrEq.forall { case (k, v) => el.attrs.get(k).contains(v) } &&
        attrPresent.forall(el.attrs.contains) &&
        attrOps.forall { case (op, k, v) =>
          el.attrs.get(k).exists { a =>
            op match {
              case "*=" => v.nonEmpty && a.contains(v)
              case "^=" => v.nonEmpty && a.startsWith(v)
              case "$=" => v.nonEmpty && a.endsWith(v)
              case "~=" => a.split("\\s+").contains(v)
              case "|=" => a == v || a.startsWith(v + "-")
              case _ => false
            }
          }
        }
  }

  sealed trait Comb
  case object Descendant extends Comb
  case object Child extends Comb
  case object Adjacent extends Comb // CSS '+'
  case object Sibling extends Comb // CSS '~'

  /** A parsed selector: steps applied left→right from the (virtual) root.
    * The first step's combinator is its axis from the root: Descendant for
    * CSS and `//`, Child for a leading `/`. */
  final case class Selector(steps: Seq[(Comb, Compound)]) {
    /** All matching elements of `doc`, document order. */
    def select(doc: Seq[El]): Seq[El] = doc.filter(matches)

    def matches(el: El): Boolean = matchFrom(el, steps.length - 1)

    private def matchFrom(el: El, stepIdx: Int): Boolean = {
      val (comb, comp) = steps(stepIdx)
      if (!comp.matches(el)) return false
      if (stepIdx == 0) {
        comb match {
          case Descendant => true // anywhere under the root
          case Child => el.parent != null && el.parent.tag.isEmpty
          case Adjacent | Sibling => false
        }
      } else {
        comb match {
          case Descendant =>
            var p = el.parent
            while (p != null && p.tag.nonEmpty) {
              if (matchFrom(p, stepIdx - 1)) return true
              p = p.parent
            }
            false
          case Child =>
            el.parent != null && el.parent.tag.nonEmpty &&
              matchFrom(el.parent, stepIdx - 1)
          case Adjacent =>
            el.precedingSiblings.headOption.exists(matchFrom(_, stepIdx - 1))
          case Sibling =>
            el.precedingSiblings.exists(matchFrom(_, stepIdx - 1))
        }
      }
    }
  }

  private def bad(sel: String, why: String): Nothing =
    throw new IllegalArgumentException(
      s"unsupported selector '$sel': $why (supported: css tag/#id/.class/" +
        "[attr=v] with ' '>'+'~' combinators; xpath //tag[@attr='v'] steps)")

  private val XPathFnPredRe =
    """^(contains|starts-with)\(\s*@([\w:.-]+)\s*,\s*(['"])(.*?)\3\s*\)$""".r

  /** Parse the XPath subset the reference tests exercise: `//` and `/`
    * separated steps of `tag` or `*` with `[@attr='v']` / `[@attr="v"]` /
    * `[@attr]` / `[contains(@attr,'v')]` / `[starts-with(@attr,'v')]`
    * predicates. Anything else fails fast. */
  def parseXPath(xp0: String): Selector = {
    var xp = xp0.trim
    if (xp.startsWith("descendant::")) xp = "//" + xp.substring(12)
    if (!xp.startsWith("/")) bad(xp0, "xpath must start with / or //")
    val steps = ArrayBuffer.empty[(Comb, Compound)]
    var i = 0
    while (i < xp.length) {
      val comb =
        if (xp.startsWith("//", i)) { i += 2; Descendant }
        else if (xp.charAt(i) == '/') { i += 1; Child }
        else bad(xp0, s"expected step separator at $i")
      val ts = i
      while (i < xp.length && (isNameChar(xp.charAt(i)) || xp.charAt(i) == '*')) i += 1
      val tag = xp.substring(ts, i)
      if (tag.isEmpty) bad(xp0, s"missing element name at $i")
      var id: Option[String] = None
      val attrEq = ArrayBuffer.empty[(String, String)]
      val attrPresent = ArrayBuffer.empty[String]
      val attrOps = ArrayBuffer.empty[(String, String, String)]
      while (i < xp.length && xp.charAt(i) == '[') {
        val e = xp.indexOf(']', i)
        if (e < 0) bad(xp0, "unterminated predicate")
        val pred = xp.substring(i + 1, e).trim
        pred match {
          case XPathFnPredRe(fn, name, _, v) =>
            val k = name.toLowerCase(java.util.Locale.ROOT)
            // contains(@a, '') is true whenever @a exists in XPath 1.0
            if (fn == "contains" && v.isEmpty) attrPresent += k
            else attrOps += ((if (fn == "contains") "*=" else "^=", k, v))
          case _ if pred.startsWith("@") =>
            val eq = pred.indexOf('=')
            if (eq < 0) attrPresent += pred.substring(1).trim
            else {
              val k = pred.substring(1, eq).trim
              var v = pred.substring(eq + 1).trim
              if (v.length >= 2 && (v.head == '"' || v.head == '\'') && v.last == v.head)
                v = v.substring(1, v.length - 1)
              else bad(xp0, s"predicate value must be quoted in [$pred]")
              attrEq += ((k, v))
            }
          case _ => bad(xp0, s"unsupported predicate [$pred]")
        }
        i = e + 1
      }
      steps += ((comb,
        Compound(Some(tag.toLowerCase(java.util.Locale.ROOT)), id,
          Nil, attrEq.toSeq, attrPresent.toSeq, attrOps.toSeq)))
    }
    if (steps.isEmpty) bad(xp0, "empty selector")
    Selector(steps.toSeq)
  }

  /** Parse the CSS subset (`parsel`'s translator feeds the same engine):
    * compound selectors of `tag`/`*`, `#id`, `.class`, `[attr=v]`,
    * `[attr="v"]`, `[attr]`, and the `*=`/`^=`/`$=`/`~=`/`|=` attribute
    * operators, joined by descendant (space), `>`, `+`, `~`.
    * Selector groups (`,`) are not needed by the reference tests — the
    * caller passes a Seq of selectors instead. */
  def parseCss(css0: String): Selector = {
    val css = css0.trim
    if (css.isEmpty) bad(css0, "empty selector")
    val steps = ArrayBuffer.empty[(Comb, Compound)]
    var i = 0
    var comb: Comb = Descendant
    while (i < css.length) {
      // consume combinator run
      var sawSpace = false
      var explicit: Option[Comb] = None
      while (i < css.length && (css.charAt(i) == ' ' || css.charAt(i) == '>' ||
        css.charAt(i) == '+' || css.charAt(i) == '~')) {
        css.charAt(i) match {
          case ' ' => sawSpace = true
          case '>' => explicit = Some(Child)
          case '+' => explicit = Some(Adjacent)
          case '~' => explicit = Some(Sibling)
        }
        i += 1
      }
      if (steps.nonEmpty) comb = explicit.getOrElse(
        if (sawSpace) Descendant else bad(css0, s"missing combinator at $i"))
      else if (explicit.isDefined) bad(css0, "leading combinator")
      if (i >= css.length) {
        if (explicit.isDefined) bad(css0, "dangling combinator")
      } else {
        var tag: Option[String] = None
        var id: Option[String] = None
        val classes = ArrayBuffer.empty[String]
        val attrEq = ArrayBuffer.empty[(String, String)]
        val attrPresent = ArrayBuffer.empty[String]
        val attrOps = ArrayBuffer.empty[(String, String, String)]
        var any = false
        // CSS identifiers: letters/digits/-/_ only — '.'/':' start the next
        // simple selector (unlike HTML/XPath names, which allow both)
        def cssNameChar(ch: Char) = isNameStart(ch) ||
          (ch >= '0' && ch <= '9') || ch == '-' || ch == '_'
        def name(): String = {
          val s = i
          while (i < css.length && cssNameChar(css.charAt(i))) i += 1
          if (i == s) bad(css0, s"expected name at $s")
          css.substring(s, i)
        }
        if (i < css.length && (isNameStart(css.charAt(i)) || css.charAt(i) == '*')) {
          if (css.charAt(i) == '*') { tag = Some("*"); i += 1 }
          else tag = Some(name().toLowerCase(java.util.Locale.ROOT))
          any = true
        }
        var more = true
        while (more && i < css.length) {
          css.charAt(i) match {
            case '#' => i += 1; id = Some(name()); any = true
            case '.' => i += 1; classes += name(); any = true
            case '[' =>
              val e = css.indexOf(']', i)
              if (e < 0) bad(css0, "unterminated attribute selector")
              val body = css.substring(i + 1, e).trim
              val eq = body.indexOf('=')
              if (eq < 0) attrPresent += body.toLowerCase(java.util.Locale.ROOT)
              else {
                val opChar = if (eq > 0) body.charAt(eq - 1) else ' '
                val isOp = "*^$~|".indexOf(opChar) >= 0
                val kEnd = if (isOp) eq - 1 else eq
                val k = body.substring(0, kEnd).trim.toLowerCase(java.util.Locale.ROOT)
                var v = body.substring(eq + 1).trim
                if (v.length >= 2 && (v.head == '"' || v.head == '\'') && v.last == v.head)
                  v = v.substring(1, v.length - 1)
                if (isOp) attrOps += ((s"$opChar=", k, v))
                else attrEq += ((k, v))
              }
              i = e + 1; any = true
            case ',' => bad(css0, "selector groups: pass multiple selectors")
            case ':' => bad(css0, "pseudo-classes/elements unsupported")
            case _ => more = false
          }
        }
        if (!any) bad(css0, s"expected compound selector at $i")
        steps += ((comb, Compound(tag, id, classes.toSeq, attrEq.toSeq,
          attrPresent.toSeq, attrOps.toSeq)))
      }
    }
    if (steps.isEmpty) bad(css0, "empty selector")
    Selector(steps.toSeq)
  }
}
