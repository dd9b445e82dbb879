package graft.urlkit

import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.UTF_8

import graft.extract.{HtmlDom, LinkExtract}

/** Request construction helpers — reference FormRequest
  * (`scrapy/http/request/form.py:39-266`) and JsonRequest
  * (`scrapy/http/request/json_request.py`). The engine's fingerprint
  * ([[UrlKit.fingerprint]]) already hashes (method, body); these builders
  * produce the (url, method, body, headers) tuples that feed it.
  *
  * `fromResponse` parses the response with [[HtmlDom]] (since r5 — the
  * earlier regex subset could not see nested structure) and mirrors the
  * reference's lxml-backed pipeline: form selection by name/id/xpath/css/
  * number (`form.py:114-154` `_get_form`), form controls in document order
  * with the reference's type filter — submit/image/reset excluded,
  * checkbox/radio only when checked, checked checkables default to "on",
  * single select takes the first selected option else the first option,
  * `multiple` selects emit every selected option and nothing when none —
  * (`form.py:157-214`), first-clickable submit appended unless `dont_click`
  * with `clickdata` name/attr/nr targeting (`form.py:217-266`), user
  * formdata overriding form values (null value = drop the key), and the
  * page-encoding-driven urlencode (`form.py:105-111` `_urlencode`).
  */
object Requests {

  final case class BuiltRequest(
      url: String,
      method: String,
      body: Array[Byte],
      headers: Map[String, String]) {
    def fingerprint: Array[Byte] = UrlKit.fingerprint(url, method, body)
  }

  /** Python `urlencode(values, doseq=True)` over the response encoding:
    * quote_plus each strictly-encoded key/value, pairs joined with '&' in
    * order (`form.py:105-111`: `to_bytes(k, enc)` is a strict encode — an
    * unmappable character raises). */
  def urlencodeForm(pairs: Seq[(String, String)],
      cs: Charset = UTF_8): String =
    pairs.map { case (k, v) =>
      PyUrl.quotePlusBytes(UrlKit.encodeStrict(k, cs)) + "=" +
        PyUrl.quotePlusBytes(UrlKit.encodeStrict(v, cs))
    }.mkString("&")

  /** FormRequest(url, formdata): POST (default when formdata present) puts
    * the urlencoded pairs in the body with the form Content-Type; GET
    * replaces the URL's query string, keeping the fragment
    * (`form.py:42-61`). EMPTY formdata mirrors the reference's `if
    * formdata:` guard — no body, no Content-Type, and the URL's own query
    * is left untouched. */
  def formRequest(url: String, formdata: Seq[(String, String)],
      method: String = "POST", encoding: Charset = UTF_8): BuiltRequest = {
    val m = method.toUpperCase(java.util.Locale.ROOT)
    if (formdata.isEmpty)
      BuiltRequest(UrlKit.safeUrlString(url, encoding), m,
        Array.emptyByteArray, Map.empty)
    else if (m == "POST")
      BuiltRequest(UrlKit.safeUrlString(url, encoding), "POST",
        urlencodeForm(formdata, encoding).getBytes(UTF_8),
        Map("Content-Type" -> "application/x-www-form-urlencoded"))
    else {
      val p = PyUrl.urlsplit(url)
      BuiltRequest(
        UrlKit.safeUrlString(
          PyUrl.urlunsplit(p.scheme, p.netloc, p.path,
            urlencodeForm(formdata, encoding), p.fragment),
          encoding),
        "GET", Array.emptyByteArray, Map.empty)
    }
  }

  /** JsonRequest: serialized JSON body + the reference's default headers
    * (`json_request.py:28-56`). */
  def jsonRequest(url: String, jsonBody: String, method: String = "POST"): BuiltRequest =
    BuiltRequest(UrlKit.safeUrlString(url), method, jsonBody.getBytes(UTF_8),
      Map("Content-Type" -> "application/json",
        "Accept" -> "application/json, text/javascript, */*; q=0.01"))

  /** Crawl-loop form submission (contract 7g): `from_response` with its
    * defaults (first form, click the first clickable) over a response BODY,
    * None when the page has no form or the build fails — the shape of a
    * spider callback's try/except around
    * `yield FormRequest.from_response(response)`. THE single authority the
    * engine and the oracle both call, so a parse quirk can never diverge
    * them. Encoding detection mirrors link extraction (BOM → meta charset →
    * UTF-8 validity → latin-1). */
  def tryFromResponse(body: Array[Byte], pageUrl: String): Option[BuiltRequest] =
    try Some(fromResponse(graft.extract.Encoding.decode(body, None), pageUrl))
    catch { case _: RuntimeException => None }

  // ---- from_response (form.py:64-266) --------------------------------------

  private val Checkable = Set("checkbox", "radio")
  private val NonValueTypes = Set("submit", "image", "reset")

  /** Build a request from a form in an HTML body, reference
    * `FormRequest.from_response`. `formdata` pairs override form values and
    * are appended last; a pair with a null value DROPS the key (reference
    * `formdata={"k": None}`). `clickdata` holds attribute matchers — the
    * special key "nr" indexes the form's input/select/textarea controls.
    * Throws when no form matches (the reference raises too). */
  def fromResponse(html: String, pageUrl: String,
      formdata: Seq[(String, String)] = Nil,
      formname: String = null, formid: String = null, formnumber: Int = 0,
      dontClick: Boolean = false,
      clickdata: Seq[(String, String)] = null,
      formxpath: String = null, formcss: String = null,
      url: String = null, method: String = null,
      encoding: Charset = UTF_8): BuiltRequest = {
    val doc = HtmlDom.parse(html)
    val forms = doc.filter(_.tag == "form")
    if (forms.isEmpty)
      throw new IllegalArgumentException("No <form> element found")

    // _get_form (form.py:114-154): name, then id, then xpath/css (first
    // matching node, walk up to the enclosing form), then formnumber.
    val formEl: HtmlDom.El =
      Option(formname).flatMap(n => forms.find(_.attrs.get("name").contains(n)))
        .orElse(Option(formid).flatMap(i => forms.find(_.attrs.get("id").contains(i))))
        .getOrElse {
          val sel =
            if (formxpath != null) Some((formxpath, HtmlDom.parseXPath(formxpath)))
            else if (formcss != null) Some((formcss, HtmlDom.parseCss(formcss)))
            else None
          sel match {
            case Some((expr, s)) =>
              s.select(doc).headOption.flatMap { n =>
                var e = n
                while (e != null && e.tag != "form") e = e.parent
                Option(e)
              }.getOrElse(throw new IllegalArgumentException(
                s"No <form> element found with $expr"))
            case None =>
              if (formnumber < 0 || formnumber >= forms.size)
                throw new IndexOutOfBoundsException(
                  s"Form number $formnumber not found")
              forms(formnumber)
          }
        }

    val within = doc.filter(e => e.start > formEl.start && e.start < formEl.end)
    // textarea is rawtext (markup-looking content is literal text — lxml
    // serializes any children back into the value); option text strips tags
    def text(el: HtmlDom.El, stripTags: Boolean): String =
      if (el.openEnd < 0 || el.end < el.openEnd) ""
      else {
        val raw = html.substring(el.openEnd, el.end)
        LinkExtract.replaceHtmlEntities(
          if (stripTags) raw.replaceAll("(?s)<[^>]*>", "") else raw)
      }

    val overridden = formdata.map(_._1).toSet
    // form controls in document order with the reference's type filter
    // (_get_inputs xpath, form.py:170-177) and lxml value semantics
    val controls = within.filter(e =>
      e.tag == "input" || e.tag == "select" || e.tag == "textarea")
    val values = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (e <- controls) e.tag match {
      case "input" =>
        val typ = e.attrs.getOrElse("type", "").toLowerCase(java.util.Locale.ROOT)
        val checkable = Checkable.contains(typ)
        if (!NonValueTypes.contains(typ) && (!checkable || e.attrs.contains("checked")))
          for (n <- e.attrs.get("name") if n.nonEmpty && !overridden(n))
            // lxml InputElement.value: checked checkable without @value → "on"
            values += ((n, e.attrs.getOrElse("value", if (checkable) "on" else "")))
      case "textarea" =>
        for (n <- e.attrs.get("name") if n.nonEmpty && !overridden(n))
          values += ((n, text(e, stripTags = false)))
      case "select" =>
        // lxml SelectElement: option value = @value else stripped text;
        // single → first selected else first option (browser behavior,
        // form.py:205-214); multiple → all selected, nothing when none
        val opts = within.filter(o =>
          o.tag == "option" && o.start > e.start && o.start < e.end)
        def optVal(o: HtmlDom.El): String =
          o.attrs.get("value").getOrElse(text(o, stripTags = true)).trim
        for (n <- e.attrs.get("name") if n.nonEmpty && !overridden(n)) {
          if (e.attrs.contains("multiple"))
            opts.filter(_.attrs.contains("selected"))
              .foreach(o => values += ((n, optVal(o))))
          else
            opts.find(_.attrs.contains("selected")).orElse(opts.headOption)
              .foreach(o => values += ((n, optVal(o))))
        }
    }

    // _get_clickable (form.py:217-266): input[@type submit|image] or
    // button[no type | submit]; clickdata nr indexes form.inputs (ALL
    // controls, clickable or not); otherwise ALL clickdata pairs must match
    // an element's attributes exactly — 1 match required.
    def clickable: Option[(String, String)] = {
      val clickables = within.filter { e =>
        val typ = e.attrs.get("type").map(_.toLowerCase(java.util.Locale.ROOT))
        (e.tag == "input" && (typ.contains("submit") || typ.contains("image"))) ||
          (e.tag == "button" && (typ.isEmpty || typ.contains("submit")))
      }
      if (clickables.isEmpty) return None
      def pair(el: HtmlDom.El) =
        (el.attrs.getOrElse("name", null), el.attrs.getOrElse("value", ""))
      if (clickdata == null) return Some(pair(clickables.head))
      val nr = clickdata.collectFirst { case ("nr", v) => v.toInt }
      nr.filter(i => i >= 0 && i < controls.size).map(i => pair(controls(i)))
        .orElse {
          val matches = within.filter(e =>
            clickdata.forall { case (k, v) => e.attrs.get(k).contains(v) })
          if (matches.size == 1) Some(pair(matches.head))
          else if (matches.size > 1) throw new IllegalArgumentException(
            s"Multiple elements found (${matches.map(_.tag).mkString(", ")}) " +
              s"matching the criteria in clickdata: $clickdata")
          else throw new IllegalArgumentException(
            s"No clickable element matching clickdata: $clickdata")
        }
    }
    val clicked: Seq[(String, String)] =
      if (dontClick) Nil
      else clickable.filter(c => c._1 != null && !overridden(c._1)).toList

    val pairs = values.toSeq ++ clicked ++ formdata.filter(_._2 != null)

    // _get_form_url: action joins against the DOCUMENT base (<base href>
    // else page URL), html5-whitespace-stripped; explicit url= wins
    val base = LinkExtract.baseUrl(html, pageUrl)
    val action =
      if (url != null) PyUrl.urljoin(base, url)
      else formEl.attrs.get("action") match {
        case Some(a) => PyUrl.urljoin(base, LinkExtract.stripHtml5Whitespace(a))
        case None => base
      }
    // invalid form methods fall back to GET (form.py:86-91)
    val m = Option(method).getOrElse(formEl.attrs.getOrElse("method", "GET"))
      .toUpperCase(java.util.Locale.ROOT) match {
      case ok @ ("GET" | "POST") => ok
      case _ => "GET"
    }
    formRequest(action, pairs, m, encoding)
  }
}
