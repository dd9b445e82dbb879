package graft.extract

import Json._

/** JMESPath-subset evaluator over [[Json.JVal]] — the third leg of the
  * parsel selector trio (`response.jmespath(...)`, reference
  * `http/response/text.py:152-157` delegating to parsel >= 1.8; exercised
  * by `tests/test_selector.py::TestJMESPath`). Pure per-row function.
  *
  * Documented scope (fail-fast beyond it, like [[Sel]]'s css/xpath
  * parsers): dot-chained identifiers, `[n]` index (negative from the end),
  * `[*]` list projection (per-element continuation, null results dropped —
  * the JMESPath projection rule), and a trailing `to_string(@)` function
  * (strings pass through, anything else JSON-encodes). Filters, slices,
  * pipes, multiselects and other functions are out of scope.
  */
object JmesPath {

  sealed trait Comp
  private final case class Field(name: String) extends Comp
  private final case class Index(i: Int) extends Comp
  private case object Star extends Comp
  private case object ToString extends Comp

  private def bad(q: String, why: String): Nothing =
    throw new IllegalArgumentException(
      s"unsupported jmespath '$q' ($why) — supported: a.b, a[0], a[-1], a[*].b, to_string(@)")

  private val cache =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, Vector[Comp]](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Vector[Comp]]): Boolean = size > 512
      })

  def parse(q: String): Vector[Comp] = {
    val hit = cache.get(q)
    if (hit != null) return hit
    val out = Vector.newBuilder[Comp]
    var i = 0
    val s = q.trim
    if (s.isEmpty) bad(q, "empty expression")
    var expectDot = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '.') {
        if (!expectDot) bad(q, s"unexpected '.' at $i")
        expectDot = false; i += 1
      } else if (c == '[') {
        // subscript binds to the previous component, no dot before it
        val close = s.indexOf(']', i)
        if (close < 0) bad(q, "unclosed '['")
        val inner = s.substring(i + 1, close)
        if (inner == "*") out += Star
        else if (inner.matches("-?\\d+")) out += Index(inner.toInt)
        else bad(q, s"unsupported subscript [$inner]")
        i = close + 1
        expectDot = true
      } else if (!expectDot && s.startsWith("to_string(@)", i)) {
        out += ToString
        i += "to_string(@)".length
        expectDot = true
      } else if (!expectDot &&
        (c.isLetter || c == '_')) {
        var j = i + 1
        while (j < s.length && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
        out += Field(s.substring(i, j))
        i = j
        expectDot = true
      } else bad(q, s"unexpected '$c' at $i")
    }
    if (!expectDot) bad(q, "dangling '.'")
    val expr = out.result()
    cache.put(q, expr)
    expr
  }

  /** Evaluate against a root value. `JNull` = JMESPath null (no result). */
  def eval(expr: Vector[Comp], root: JVal): JVal = {
    // One(v) = a single current value; Proj(vs) = an open [*] projection
    // (components apply per element, nulls dropped)
    var proj: Vector[JVal] = null
    var one: JVal = root
    def step(v: JVal, c: Comp): JVal = c match {
      case Field(name) => v match {
        case JObj(fields) =>
          fields.collectFirst { case (k, x) if k == name => x }.getOrElse(JNull)
        case _ => JNull
      }
      case Index(i) => v match {
        case JArr(items) =>
          val k = if (i < 0) items.length + i else i
          if (k >= 0 && k < items.length) items(k) else JNull
        case _ => JNull
      }
      case ToString => v match {
        case s: JStr => s
        case other => JStr(Json.dumps(other))
      }
      case Star => throw new IllegalStateException("Star handled by caller")
    }
    for (c <- expr) c match {
      case Star =>
        if (proj != null)
          throw new IllegalArgumentException(
            "unsupported jmespath: nested [*] projections are out of scope")
        one match {
          case JArr(items) => proj = items; one = null
          case _ => one = JNull // [*] on a non-list is null
        }
      case comp =>
        if (proj != null) proj = proj.map(step(_, comp)).filter(_ != JNull)
        else if (one != JNull) one = step(one, comp)
    }
    if (proj != null) JArr(proj) else one
  }

  def search(q: String, root: JVal): JVal = eval(parse(q), root)

  /** `Sel(json).jmespath(q).getall` without the HTML round-trip — the
    * entry point for the `graft_jmespath` Catalyst expression: parse the
    * document, search, render each result like parsel `.getall()` (strings
    * raw, anything else json.dumps). */
  def selectAll(json: String, q: String): Seq[String] = {
    def render(v: JVal): String = v match {
      case JStr(s) => s
      case other => Json.dumps(other)
    }
    search(q, Json.loads(json)) match {
      case JNull => Seq.empty
      case JArr(items) => items.map(render)
      case v => Seq(render(v))
    }
  }
}
