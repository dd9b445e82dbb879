package graft.extract

import scala.collection.mutable

/** ItemLoader — the reference's user-facing item-population API
  * (`scrapy/loader/__init__.py`, a thin subclass of the `itemloaders`
  * package; semantics documented in `docs/topics/loaders.rst`). Pinned by
  * LoaderSpec, a port of the public battery in `tests/test_loader.py`.
  *
  * Model: a loader accumulates per-field value lists (`_values`). Adding a
  * value runs the field's INPUT processor over the flattened candidates and
  * appends; `loadItem()` runs each field's OUTPUT processor over the whole
  * list and assigns non-null results to the item. Values taken from the
  * initial item are NOT re-processed (the reference's no-reprocessing
  * guarantee). Nested loaders (`nestedXPath`/`nestedCss`) share `_values`
  * and the item with their parent and scope queries to a sub-selector.
  *
  * Python-isms kept because the battery pins them:
  *  - `argToIter`: null → [], Seq → itself, scalar → [scalar];
  *  - a processed input is appended only when truthy (empty list, "", 0,
  *    false are all skipped — CPython `if processed_value:`);
  *  - `loadItem` assigns on `is not None`, so falsy-but-present outputs
  *    (0.3, "", 0) still land on the item;
  *  - adding to an undeclared field raises (scrapy `Item.__setitem__`
  *    KeyError → NoSuchElementException here);
  *  - query methods without a selector raise (RuntimeError →
  *    IllegalStateException here).
  */
object ItemLoader {

  type Ctx = Map[String, Any]

  /** `itemloaders.utils.arg_to_iter`: None → [], list → itself,
    * anything else (strings and dicts included) → single-element list. */
  def argToIter(v: Any): Seq[Any] = v match {
    case null => Nil
    case None => Nil
    case s: Seq[_] => s.asInstanceOf[Seq[Any]]
    case Some(x) => Seq(x)
    case other => Seq(other)
  }

  /** CPython truthiness for the value shapes a loader carries. */
  private def pyTruthy(v: Any): Boolean = v match {
    case null | None => false
    case s: String => s.nonEmpty
    case s: Seq[_] => s.nonEmpty
    case m: collection.Map[_, _] => m.nonEmpty
    case b: Boolean => b
    case n: Int => n != 0
    case n: Long => n != 0L
    case n: Double => n != 0.0
    case _ => true
  }

  /** A processor (`itemloaders.processors`): whole-value in, Any out. */
  trait Proc { def apply(values: Any, ctx: Ctx): Any }

  object Proc {
    /** A plain function used as a processor (reference: any callable). */
    def fn(f: Seq[Any] => Any): Proc =
      (values: Any, _: Ctx) => f(argToIter(values))
  }

  /** `Identity()`: pass through unchanged. */
  object Identity extends Proc {
    def apply(values: Any, ctx: Ctx): Any = values
  }

  /** `TakeFirst()`: first value that is neither None nor ''. */
  object TakeFirst extends Proc {
    def apply(values: Any, ctx: Ctx): Any =
      argToIter(values).find(v => v != null && v != None && v != "").orNull
  }

  /** `Join(separator)`: string-join of the value list. */
  final case class Join(sep: String = " ") extends Proc {
    def apply(values: Any, ctx: Ctx): Any =
      argToIter(values).map(String.valueOf).mkString(sep)
  }

  /** `MapCompose(*fs)`: each value through the function chain; a function
    * returning None drops the value, returning a list flattens. */
  final case class MapCompose(fs: (Any => Any)*) extends Proc {
    def apply(values: Any, ctx: Ctx): Any = {
      var cur: Seq[Any] = argToIter(values)
      fs.foreach { f => cur = cur.flatMap(v => argToIter(f(v))) }
      cur
    }
  }

  /** `Compose(*fs)`: the whole list through the chain; stops at the first
    * None intermediate (`stop_on_none=True` default). */
  final case class Compose(fs: (Any => Any)*) extends Proc {
    def apply(values: Any, ctx: Ctx): Any = {
      var cur: Any = values
      val it = fs.iterator
      while (it.hasNext && cur != null && cur != None) cur = it.next()(cur)
      cur
    }
  }

  /** Loader configuration — the Scala shape of a reference loader subclass:
    * `{field}_in`/`{field}_out` attributes become [[fieldIn]]/[[fieldOut]],
    * item `Field(input_processor=..)` metadata merges into the same maps,
    * scrapy-`Item`-style declared fields (add to an unknown field raises)
    * become [[declaredFields]] (None = dict item, any field accepted). */
  final case class LoaderSpec(
      declaredFields: Option[Set[String]] = None,
      fieldIn: Map[String, Proc] = Map.empty,
      fieldOut: Map[String, Proc] = Map.empty,
      defaultIn: Proc = Identity,
      defaultOut: Proc = Identity)

  /** Shared loader state — one per root loader, shared by nested loaders
    * (the reference parents `_values` and the item object). */
  private[extract] final class State {
    val values = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Any]]
    val item = mutable.LinkedHashMap.empty[String, Any]
  }

  /** Root loader. Initial `item` values seed both the item and `_values`
    * WITHOUT input processing (reference `__init__`: `_values[f] +=
    * arg_to_iter(v)` — the no-reprocessing battery pins this). */
  def apply(
      spec: LoaderSpec = LoaderSpec(),
      item: Seq[(String, Any)] = Nil,
      selector: Option[Sel] = None,
      context: Ctx = Map.empty): ItemLoader = {
    val st = new State
    item.foreach { case (f, v) =>
      st.item(f) = v
      val seq = argToIter(v)
      if (seq.nonEmpty)
        st.values.getOrElseUpdate(f, mutable.ArrayBuffer.empty) ++= seq
    }
    new ItemLoader(selector, spec, context, st)
  }

  /** Loader over a parsed HTML document (the `response=` constructor
    * form: the selector is built from the response body). */
  def fromHtml(html: String, spec: LoaderSpec = LoaderSpec(),
      item: Seq[(String, Any)] = Nil, context: Ctx = Map.empty): ItemLoader =
    apply(spec, item, Some(Sel(html)), context)
}

final class ItemLoader private (
    val selector: Option[Sel],
    spec: ItemLoader.LoaderSpec,
    val context: ItemLoader.Ctx,
    state: ItemLoader.State) {

  import ItemLoader._

  private def requireField(field: String): Unit =
    spec.declaredFields.foreach { declared =>
      if (!declared.contains(field))
        throw new NoSuchElementException(
          s"$field is not a declared field of this item")
    }

  private def inputProc(field: String): Proc =
    spec.fieldIn.getOrElse(field, spec.defaultIn)

  private def outputProc(field: String): Proc =
    spec.fieldOut.getOrElse(field, spec.defaultOut)

  private def sel: Sel = selector.getOrElse(
    throw new IllegalStateException(
      "no selector: loader was built without a selector/response"))

  // ------------------------------------------------------------ get_value

  /** `get_value(value, *processors, re=...)`: optional regex extraction
    * (parsel `.re` semantics, flattened over the candidates), then the
    * ad-hoc processor chain; a None intermediate stops the chain. */
  def getValue(value: Any, procs: Seq[Proc] = Nil, re: String = null): Any = {
    var cur: Any =
      if (re == null) value
      else argToIter(value).flatMap(v => reFindall(re, String.valueOf(v)))
    val it = procs.iterator
    while (it.hasNext && cur != null && cur != None) cur = it.next()(cur, context)
    cur
  }

  /** CPython `re.findall` group semantics — same contract as [[Sel.re]]. */
  private def reFindall(pattern: String, s: String): Seq[String] = {
    val m = java.util.regex.Pattern.compile(pattern).matcher(s)
    val out = Seq.newBuilder[String]
    while (m.find()) {
      if (m.groupCount() == 0) out += m.group()
      else (1 to m.groupCount()).foreach { g =>
        out += (if (m.group(g) == null) "" else m.group(g))
      }
    }
    out.result()
  }

  // ------------------------------------------------------------ add_value

  /** `_add_value`: input-process the flattened candidates, append when the
    * processed result is truthy. */
  private def addRaw(field: String, value: Any): Unit = {
    requireField(field)
    val processed = inputProc(field)(argToIter(value), context)
    if (pyTruthy(processed))
      state.values.getOrElseUpdate(field, mutable.ArrayBuffer.empty) ++=
        argToIter(processed)
  }

  private def put(field: Option[String], value: Any, procs: Seq[Proc],
      re: String, replace: Boolean): Unit = {
    val v = getValue(value, procs, re)
    if (v == null || v == None) return
    field match {
      case Some(f) =>
        if (replace) state.values.remove(f)
        addRaw(f, v)
      case None =>
        // field_name=None: the processed value is a map of field -> value
        val m = v match {
          case m: collection.Map[_, _] =>
            m.asInstanceOf[collection.Map[String, Any]]
          case other => throw new IllegalArgumentException(
            s"field=None needs a Map-valued processor result, got $other")
        }
        m.foreach { case (f, fv) =>
          if (replace) state.values.remove(f)
          addRaw(f, fv)
        }
    }
  }

  def addValue(field: String, value: Any, procs: Seq[Proc] = Nil,
      re: String = null): Unit = put(Some(field), value, procs, re, replace = false)

  def replaceValue(field: String, value: Any, procs: Seq[Proc] = Nil,
      re: String = null): Unit = put(Some(field), value, procs, re, replace = true)

  /** `add_value(None, ...)`: the processed value maps fields to values. */
  def addValueMulti(value: Any, procs: Seq[Proc] = Nil, re: String = null): Unit =
    put(None, value, procs, re, replace = false)

  def replaceValueMulti(value: Any, procs: Seq[Proc] = Nil, re: String = null): Unit =
    put(None, value, procs, re, replace = true)

  // -------------------------------------------------------- query methods

  private def xpathValues(queries: Seq[String]): Seq[Any] =
    queries.flatMap(q => sel.xpath(q).getall)

  private def cssValues(queries: Seq[String]): Seq[Any] =
    queries.flatMap(q => sel.css(q).getall)

  def getXPath(q: String, procs: Seq[Proc] = Nil, re: String = null): Any =
    getValue(xpathValues(Seq(q)), procs, re)

  def getXPathAll(qs: Seq[String], procs: Seq[Proc] = Nil, re: String = null): Any =
    getValue(xpathValues(qs), procs, re)

  def addXPath(field: String, q: String, procs: Seq[Proc] = Nil,
      re: String = null): Unit =
    put(Some(field), xpathValues(Seq(q)), procs, re, replace = false)

  def addXPathAll(field: String, qs: Seq[String], procs: Seq[Proc] = Nil,
      re: String = null): Unit =
    put(Some(field), xpathValues(qs), procs, re, replace = false)

  def addXPathMulti(q: String, procs: Seq[Proc] = Nil, re: String = null): Unit =
    put(None, xpathValues(Seq(q)), procs, re, replace = false)

  def replaceXPath(field: String, q: String, procs: Seq[Proc] = Nil,
      re: String = null): Unit =
    put(Some(field), xpathValues(Seq(q)), procs, re, replace = true)

  def replaceXPathAll(field: String, qs: Seq[String], procs: Seq[Proc] = Nil,
      re: String = null): Unit =
    put(Some(field), xpathValues(qs), procs, re, replace = true)

  def replaceXPathMulti(q: String, procs: Seq[Proc] = Nil, re: String = null): Unit =
    put(None, xpathValues(Seq(q)), procs, re, replace = true)

  def getCss(q: String, procs: Seq[Proc] = Nil, re: String = null): Any =
    getValue(cssValues(Seq(q)), procs, re)

  def getCssAll(qs: Seq[String], procs: Seq[Proc] = Nil, re: String = null): Any =
    getValue(cssValues(qs), procs, re)

  def addCss(field: String, q: String, procs: Seq[Proc] = Nil,
      re: String = null): Unit =
    put(Some(field), cssValues(Seq(q)), procs, re, replace = false)

  def addCssMulti(q: String, procs: Seq[Proc] = Nil, re: String = null): Unit =
    put(None, cssValues(Seq(q)), procs, re, replace = false)

  def replaceCss(field: String, q: String, procs: Seq[Proc] = Nil,
      re: String = null): Unit =
    put(Some(field), cssValues(Seq(q)), procs, re, replace = true)

  def replaceCssAll(field: String, qs: Seq[String], procs: Seq[Proc] = Nil,
      re: String = null): Unit =
    put(Some(field), cssValues(qs), procs, re, replace = true)

  def replaceCssMulti(q: String, procs: Seq[Proc] = Nil, re: String = null): Unit =
    put(None, cssValues(Seq(q)), procs, re, replace = true)

  // ------------------------------------------------------- nested loaders

  /** `nested_xpath`: a child loader over the sub-selector, sharing
    * `_values` and the item with this loader. */
  def nestedXPath(q: String): ItemLoader =
    new ItemLoader(Some(sel.xpath(q)), spec, context, state)

  def nestedCss(q: String): ItemLoader =
    new ItemLoader(Some(sel.css(q)), spec, context, state)

  // --------------------------------------------------------------- output

  /** `get_output_value`: the field's output processor over the accumulated
    * list; does not consume or mutate. */
  def getOutputValue(field: String): Any =
    outputProc(field)(state.values.get(field).map(_.toSeq).getOrElse(Nil), context)

  /** Raw accumulated values (`loader._values[field]`), for tests. */
  def values(field: String): Seq[Any] =
    state.values.get(field).map(_.toSeq).getOrElse(Nil)

  /** `load_item()`: output-process every accumulated field (insertion
    * order) and assign non-None results; returns the SHARED item map, so
    * nested loaders observe the same object. */
  def loadItem(): mutable.LinkedHashMap[String, Any] = {
    state.values.keys.toSeq.foreach { f =>
      val out = getOutputValue(f)
      if (out != null && out != None) state.item(f) = out
    }
    state.item
  }

  /** The item object being populated (shared across nested loaders). */
  def item: mutable.LinkedHashMap[String, Any] = state.item
}
