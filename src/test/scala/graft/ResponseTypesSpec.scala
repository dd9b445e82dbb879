package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.ResponseTypes
import graft.extract.ResponseTypes._

/** Golden battery ported from the reference `tests/test_responsetypes.py` —
  * every mapping except `x.scrapytest` (which probes the scrapy-shipped
  * mime.types data file itself). Response→RPlain, TextResponse→RText,
  * HtmlResponse→RHtml, XmlResponse→RXml, JsonResponse→RJson.
  *
  * The non-ASCII Content-Disposition fixtures are the exact bytes the
  * reference test encodes (utf-8 / latin-1 / gbk / cp720 / iso2022_jp),
  * generated with CPython and hard-coded — cp720 has no JVM charset.
  * `binary_is_text` goldens come from `tests/test_utils_python.py`.
  */
class ResponseTypesSpec extends AnyFunSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def latin1(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("from_filename") {
    val mappings = Seq(
      "data.bin" -> RPlain,
      "file.txt" -> RText,
      "file.xml.gz" -> RPlain, // encoding suffix = undecoded body
      "file.xml" -> RXml,
      "file.html" -> RHtml,
      "file.unknownext" -> RPlain)
    for ((src, cls) <- mappings)
      assert(ResponseTypes.fromFilename(src) === cls, s"filename $src")
  }

  test("from_content_disposition") {
    assert(ResponseTypes.fromContentDisposition(
      latin1("attachment; filename=\"data.xml\"")) === RXml)
    assert(ResponseTypes.fromContentDisposition(
      latin1("attachment; filename=data.xml")) === RXml)
    // "attachment;filename=data<POUND>.tar.gz".encode() — utf-8
    assert(ResponseTypes.fromContentDisposition(b(97, 116, 116, 97, 99, 104,
      109, 101, 110, 116, 59, 102, 105, 108, 101, 110, 97, 109, 101, 61, 100,
      97, 116, 97, 194, 163, 46, 116, 97, 114, 46, 103, 122)) === RPlain)
    // "attachment;filename=data<MICRO>.tar.gz".encode("latin-1")
    assert(ResponseTypes.fromContentDisposition(b(97, 116, 116, 97, 99, 104,
      109, 101, 110, 116, 59, 102, 105, 108, 101, 110, 97, 109, 101, 61, 100,
      97, 116, 97, 181, 46, 116, 97, 114, 46, 103, 122)) === RPlain)
    // "attachment;filename=data<U+9AD8>.doc".encode("gbk")
    assert(ResponseTypes.fromContentDisposition(b(97, 116, 116, 97, 99, 104,
      109, 101, 110, 116, 59, 102, 105, 108, 101, 110, 97, 109, 101, 61, 100,
      97, 116, 97, 184, 223, 46, 100, 111, 99)) === RPlain)
    // "attachment;filename=<ARABIC>data.html".encode("cp720")
    assert(ResponseTypes.fromContentDisposition(b(97, 116, 116, 97, 99, 104,
      109, 101, 110, 116, 59, 102, 105, 108, 101, 110, 97, 109, 101, 61, 167,
      237, 169, 236, 100, 97, 116, 97, 46, 104, 116, 109, 108)) === RHtml)
    // "attachment;filename=<JA>Wikipedia.xml".encode("iso2022_jp")
    assert(ResponseTypes.fromContentDisposition(b(97, 116, 116, 97, 99, 104,
      109, 101, 110, 116, 59, 102, 105, 108, 101, 110, 97, 109, 101, 61, 27,
      36, 66, 70, 124, 75, 92, 56, 108, 72, 71, 27, 40, 66, 87, 105, 107, 105,
      112, 101, 100, 105, 97, 46, 120, 109, 108)) === RXml)
    // IndexError fallbacks: no ';' part, no '=' part
    assert(ResponseTypes.fromContentDisposition(latin1("attachment")) === RPlain)
    assert(ResponseTypes.fromContentDisposition(
      latin1("attachment; filename")) === RPlain)
  }

  test("from_content_type") {
    val mappings = Seq(
      "text/html; charset=UTF-8" -> RHtml,
      "text/xml; charset=UTF-8" -> RXml,
      "application/xhtml+xml; charset=UTF-8" -> RHtml,
      "application/vnd.wap.xhtml+xml; charset=utf-8" -> RHtml,
      "application/xml; charset=UTF-8" -> RXml,
      "application/octet-stream" -> RPlain,
      "application/json; encoding=UTF8;charset=UTF-8" -> RJson,
      "application/x-json; encoding=UTF8;charset=UTF-8" -> RJson,
      "application/json-amazonui-streaming;charset=UTF-8" -> RJson)
    for ((src, cls) <- mappings)
      assert(ResponseTypes.fromContentType(src) === cls, s"ct $src")
    // b"application/x-download; filename=\x80dummy.txt" → Response
    assert(ResponseTypes.fromContentType(
      latin1("application/x-download; filename=") ++ b(0x80) ++
        latin1("dummy.txt")) === RPlain)
    // a Content-Encoding always wins → plain Response
    assert(ResponseTypes.fromContentType(
      latin1("text/html"), Some("gzip")) === RPlain)
  }

  test("from_body") {
    assert(ResponseTypes.fromBody(b(0x03, 0x02, 0xdf, 0xdd, 0x23)) === RPlain)
    // b"Some plain text\ndata with tabs\t and null bytes\0"
    assert(ResponseTypes.fromBody(latin1("Some plain text") ++ b(10) ++
      latin1("data with tabs") ++ b(9) ++
      latin1(" and null bytes") ++ b(0)) === RText)
    assert(ResponseTypes.fromBody(
      latin1("<html><head><title>Hello</title></head>")) === RHtml)
    assert(ResponseTypes.fromBody(
      latin1("<!DOCTYPE html>") ++ b(10) ++ latin1("<title>.</title>")) === RHtml)
    assert(ResponseTypes.fromBody(
      latin1("<?xml version=\"1.0\" encoding=\"utf-8\"")) === RXml)
    // case-insensitive sniff (bytes.lower)
    assert(ResponseTypes.fromBody(latin1("<HTML><body/>")) === RHtml)
  }

  test("from_headers") {
    assert(ResponseTypes.fromHeaders(
      Map("Content-Type" -> "text/html; charset=utf-8")) === RHtml)
    assert(ResponseTypes.fromHeaders(Map(
      "Content-Type" -> "text/html; charset=utf-8",
      "Content-Encoding" -> "gzip")) === RPlain)
    assert(ResponseTypes.fromHeaders(Map(
      "Content-Type" -> "application/octet-stream",
      "Content-Disposition" -> "attachment; filename=data.txt")) === RText)
    // header names are caseless (scrapy.http.Headers)
    assert(ResponseTypes.fromHeaders(Map("content-type" -> "text/xml")) === RXml)
  }

  test("from_args") {
    assert(ResponseTypes.fromArgs(
      url = "http://www.example.com/data.csv") === RText)
    // headers take precedence over url
    assert(ResponseTypes.fromArgs(
      headers = Map("Content-Type" -> "text/html; charset=utf-8"),
      url = "http://www.example.com/item/") === RHtml)
    assert(ResponseTypes.fromArgs(
      headers = Map("Content-Disposition" -> "attachment; filename=\"data.xml.gz\""),
      url = "http://www.example.com/page/") === RPlain)
    // filename then body fallbacks
    assert(ResponseTypes.fromArgs(filename = "report.json") === RJson)
    assert(ResponseTypes.fromArgs(filename = "noext",
      body = latin1("<html>")) === RHtml)
  }

  test("binary_is_text (test_utils_python.py goldens)") {
    assert(ResponseTypes.binaryIsText(latin1("hello")))
    // "hello".encode("utf-16") = BOM + NUL-interleaved ASCII → still text
    assert(ResponseTypes.binaryIsText(
      b(0xff, 0xfe) ++ "hello".getBytes("UTF-16LE")))
    // b"<div>Price \xa3</div>" → True (high bytes are text)
    assert(ResponseTypes.binaryIsText(
      latin1("<div>Price ") ++ b(0xa3) ++ latin1("</div>")))
    // b"\x02\xa3" → False (control byte)
    assert(!ResponseTypes.binaryIsText(b(0x02, 0xa3)))
    // NUL / TAB / LF / CR are allowed
    assert(ResponseTypes.binaryIsText(b(0, 9, 10, 13)))
  }

  test("response_status_message (tests/test_utils_response.py)") {
    assert(ResponseTypes.statusMessage(200) === "200 OK")
    assert(ResponseTypes.statusMessage(404) === "404 Not Found")
    assert(ResponseTypes.statusMessage(573) === "573 Unknown Status")
    // a few more phrase-table spot checks (http.HTTPStatus 3.11)
    assert(ResponseTypes.statusMessage(418) === "418 I'm a Teapot")
    assert(ResponseTypes.statusMessage(308) === "308 Permanent Redirect")
    assert(ResponseTypes.statusMessage(451) === "451 Unavailable For Legal Reasons")
    assert(ResponseTypes.statusMessage(599) === "599 Unknown Status")
  }
}
