package graft.urlkit

import java.nio.charset.StandardCharsets.UTF_8

/** Request construction helpers — reference FormRequest
  * (`scrapy/http/request/form.py:39-266`) and JsonRequest
  * (`scrapy/http/request/json_request.py`). The engine's fingerprint
  * ([[UrlKit.fingerprint]]) already hashes (method, body); these builders
  * produce the (url, method, body, headers) tuples that feed it.
  *
  * `fromResponse` is a regex subset of the lxml-backed reference parser
  * (no lxml on the JVM): form selection by name/id/number, inputs in
  * document order with the reference's type filter (submit/image/reset
  * excluded, checkbox/radio only when checked), textarea, single select
  * (selected option else first), first-clickable submit appended unless
  * dont_click, user formdata overriding form values — the semantics the
  * reference's test battery exercises on plain markup.
  */
object Requests {

  final case class BuiltRequest(
      url: String,
      method: String,
      body: Array[Byte],
      headers: Map[String, String]) {
    def fingerprint: Array[Byte] = UrlKit.fingerprint(url, method, body)
  }

  /** Python `urlencode(values, doseq=True)` over UTF-8: quote_plus each
    * key/value, pairs joined with '&' in order. */
  def urlencodeForm(pairs: Seq[(String, String)]): String =
    pairs.map { case (k, v) =>
      PyUrl.quotePlusBytes(k.getBytes(UTF_8)) + "=" + PyUrl.quotePlusBytes(v.getBytes(UTF_8))
    }.mkString("&")

  /** FormRequest(url, formdata): POST (default when formdata present) puts
    * the urlencoded pairs in the body with the form Content-Type; GET
    * replaces the URL's query string (`form.py:42-61`). */
  def formRequest(url: String, formdata: Seq[(String, String)],
      method: String = "POST"): BuiltRequest = {
    val qs = urlencodeForm(formdata)
    if (method.toUpperCase(java.util.Locale.ROOT) == "POST")
      BuiltRequest(UrlKit.safeUrlString(url), "POST", qs.getBytes(UTF_8),
        Map("Content-Type" -> "application/x-www-form-urlencoded"))
    else {
      val p = PyUrl.urlsplit(url)
      BuiltRequest(
        UrlKit.safeUrlString(
          PyUrl.urlunsplit(p.scheme, p.netloc, p.path, qs, p.fragment)),
        "GET", Array.emptyByteArray, Map.empty)
    }
  }

  /** JsonRequest: serialized JSON body + the reference's default headers
    * (`json_request.py:28-56`). */
  def jsonRequest(url: String, jsonBody: String, method: String = "POST"): BuiltRequest =
    BuiltRequest(UrlKit.safeUrlString(url), method, jsonBody.getBytes(UTF_8),
      Map("Content-Type" -> "application/json",
        "Accept" -> "application/json, text/javascript, */*; q=0.01"))

  // ---- from_response (form.py:64-266 subset) ------------------------------

  private val FormRe = """(?is)<form\b([^>]*)>(.*?)</form\s*>""".r
  private val InputRe = """(?is)<(input|button)\b([^>]*?)/?>|<(textarea|select)\b([^>]*)>(.*?)</\3\s*>""".r
  private val OptionRe = """(?is)<option\b([^>]*?)/?>([^<]*)""".r
  private val AttrRe = """(?is)([a-zA-Z-]+)\s*(?:=\s*("([^"]*)"|'([^']*)'|([^\s>]+)))?""".r

  private def attrs(s: String): Map[String, String] =
    AttrRe.findAllMatchIn(s).map { m =>
      val v = Option(m.group(3)).orElse(Option(m.group(4))).orElse(Option(m.group(5))).getOrElse("")
      m.group(1).toLowerCase(java.util.Locale.ROOT) -> v
    }.toMap

  /** Build a request from the formnumber-th (or name/id-matched) form in an
    * HTML body. Throws when no form matches (reference raises too). */
  def fromResponse(html: String, baseUrl: String,
      formdata: Seq[(String, String)] = Nil,
      formname: String = null, formid: String = null, formnumber: Int = 0,
      dontClick: Boolean = false): BuiltRequest = {
    val forms = FormRe.findAllMatchIn(html).map(m => (attrs(m.group(1)), m.group(2))).toVector
    if (forms.isEmpty) throw new IllegalArgumentException(s"No <form> element found")
    val form = Option(formname).flatMap(n => forms.find(_._1.get("name").contains(n)))
      .orElse(Option(formid).flatMap(i => forms.find(_._1.get("id").contains(i))))
      .getOrElse {
        if (formnumber >= forms.size)
          throw new IndexOutOfBoundsException(s"Form number $formnumber not found")
        forms(formnumber)
      }
    val (fAttrs, fBody) = form

    val overridden = formdata.map(_._1).toSet
    val values = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var clickable: Option[(String, String)] = None
    for (m <- InputRe.findAllMatchIn(fBody)) {
      if (m.group(1) != null) { // <input> or <button>
        val tag = m.group(1).toLowerCase(java.util.Locale.ROOT)
        val a = attrs(m.group(2))
        val typ = a.getOrElse("type", if (tag == "button") "submit" else "text")
          .toLowerCase(java.util.Locale.ROOT)
        val name = a.get("name")
        val isClick = (tag == "input" && (typ == "submit" || typ == "image")) ||
          (tag == "button" && typ == "submit")
        if (isClick) {
          if (clickable.isEmpty && name.isDefined)
            clickable = Some((name.get, a.getOrElse("value", "")))
        } else if (tag == "input" && name.isDefined && typ != "reset" &&
            (!Set("checkbox", "radio").contains(typ) || a.contains("checked"))) {
          values += ((name.get, a.getOrElse("value", "")))
        }
      } else { // textarea | select
        val tag = m.group(3).toLowerCase(java.util.Locale.ROOT)
        val a = attrs(m.group(4))
        for (name <- a.get("name")) {
          if (tag == "textarea") values += ((name, m.group(5)))
          else { // select: selected option else first (form.py:210-223)
            val opts = OptionRe.findAllMatchIn(m.group(5)).map { o =>
              val oa = attrs(o.group(1))
              (oa.getOrElse("value", o.group(2).trim), oa.contains("selected"))
            }.toVector
            opts.find(_._2).orElse(opts.headOption).foreach(o => values += ((name, o._1)))
          }
        }
      }
    }
    val base = values.filter(kv => !overridden.contains(kv._1))
    val clicked =
      if (dontClick) Nil
      else clickable.filter(c => !overridden.contains(c._1)).toList
    val pairs = (base ++ clicked ++ formdata).toSeq

    val action = fAttrs.get("action")
      .map(a => PyUrl.urljoin(baseUrl, graft.extract.LinkExtract.stripHtml5Whitespace(a)))
      .getOrElse(baseUrl)
    val method = fAttrs.getOrElse("method", "GET").toUpperCase(java.util.Locale.ROOT) match {
      case m @ ("GET" | "POST") => m
      case _ => "GET" // invalid form methods fall back to GET (form.py:86-91)
    }
    formRequest(action, pairs, method)
  }
}
