package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.{Charset, StandardCharsets}
import graft.extract.Encoding

class EncodingSpec extends AnyFunSuite {
  private val cp1252 = Charset.forName("windows-1252")

  test("BOM wins and is stripped on decode") {
    val body = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "héllo".getBytes("UTF-8")
    val (cs, src) = Encoding.detect(body, Some("text/html; charset=iso-8859-1"))
    assert(cs === StandardCharsets.UTF_8 && src === Encoding.Bom)
    assert(Encoding.decode(body, Some("text/html; charset=iso-8859-1")) === "héllo")
  }
  test("Content-Type header charset (iso-8859-1 resolves to cp1252 like w3lib)") {
    val body = "café".getBytes("ISO-8859-1")
    val (cs, src) = Encoding.detect(body, Some("text/html; charset=ISO-8859-1"))
    assert(cs === cp1252 && src === Encoding.Header)
    assert(Encoding.decode(body, Some("text/html; charset=ISO-8859-1")) === "café")
  }
  test("meta tag charset") {
    val html = """<html><head><meta charset="utf-8"></head><body>ü</body></html>"""
    val (cs, src) = Encoding.detect(html.getBytes("UTF-8"), None)
    assert(cs === StandardCharsets.UTF_8 && src === Encoding.MetaTag)
  }
  test("meta http-equiv content-type form") {
    val html = "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=iso-8859-1\">"
    val (cs, src) = Encoding.detect(html.getBytes("ISO-8859-1"), None)
    assert(cs === cp1252 && src === Encoding.MetaTag)
  }
  test("UTF-8 inference and cp1252 fallback") {
    // pure-ASCII body infers cp1252 (resolve_encoding("ascii") == "cp1252")
    val (cs0, s0) = Encoding.detect("plain ascii".getBytes("US-ASCII"), None)
    assert(cs0 === cp1252 && s0 === Encoding.Inferred)
    val (cs1, s1) = Encoding.detect("plain utf-8 ✓".getBytes("UTF-8"), None)
    assert(cs1 === StandardCharsets.UTF_8 && s1 === Encoding.Inferred)
    val bad = Array[Byte](0x68, 0x69, 0xa3.toByte, 0xff.toByte) // invalid UTF-8
    val (cs2, s2) = Encoding.detect(bad, None)
    assert(cs2 === cp1252 && s2 === Encoding.Inferred)
  }

  // ---- goldens from `tests/test_http_response.py::test_encoding` ----------

  test("reference r3: charset=iso-8859-1 header resolves to cp1252") {
    assert(Encoding.resolveEncoding("iso-8859-1").map(_._1) === Some("cp1252"))
    val (cs, src) =
      Encoding.detect(Array[Byte](0xa3.toByte), Some("text/html; charset=iso-8859-1"))
    assert(cs === cp1252 && src === Encoding.Header)
    assert(Encoding.decode(Array[Byte](0xa3.toByte),
      Some("text/html; charset=iso-8859-1")) === "£")
  }
  test("reference r5: charset=None is ignored, body infers utf-8") {
    val body = Array[Byte](0xc2.toByte, 0xa3.toByte)
    val (cs, src) = Encoding.detect(body, Some("text/html; charset=None"))
    assert(cs === StandardCharsets.UTF_8 && src === Encoding.Inferred)
    assert(Encoding.decode(body, Some("text/html; charset=None")) === "£")
  }
  test("reference r6/r7: gb2312 and gbk resolve to gb18030") {
    assert(Encoding.resolveEncoding("gb2312").map(_._1) === Some("gb18030"))
    assert(Encoding.resolveEncoding("gbk").map(_._1) === Some("gb18030"))
    val body = Array[Byte](0xa8.toByte, 'D'.toByte)
    assert(Encoding.decode(body, Some("text/html; charset=gb2312")) === "―")
    assert(Encoding.decode(body, Some("text/html; charset=gbk")) === "―")
  }
  test("reference r8: BOM beats a cp1251 header") {
    val body = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte, 0xc2.toByte, 0xa3.toByte)
    assert(Encoding.decode(body, Some("text/html; charset=cp1251")) === "£")
  }
  test("reference r9: lone \\x80 infers cp1252 and decodes to the euro sign") {
    val body = Array[Byte](0x80.toByte)
    val (cs, src) = Encoding.detect(body, Some("application/x-download"))
    assert(cs === cp1252 && src === Encoding.Inferred)
    assert(Encoding.decode(body, Some("application/x-download")) === "€")
  }
  test("reference test_declared_encoding_invalid: UNKNOWN charset ignored") {
    assert(Encoding.resolveEncoding("UNKNOWN") === None)
    val body = Array[Byte](0xc2.toByte, 0xa3.toByte)
    assert(Encoding.decode(body, Some("text/html; charset=UNKNOWN")) === "£")
  }
  test("python-undefined cp1252 bytes fail the strict probe, fall to replacement") {
    // 0x81 is undefined in CPython cp1252 (Java maps it to U+0081) — the
    // auto-detect chain must reject it and land on ascii-with-replacement
    val body = Array[Byte]('h'.toByte, 0x81.toByte)
    assert(Encoding.decode(body, None) === "h�")
  }
  test("resolve_encoding canonical names (w3lib pins)") {
    assert(Encoding.resolveEncoding("ascii").map(_._1) === Some("cp1252"))
    assert(Encoding.resolveEncoding("latin1").map(_._1) === Some("cp1252"))
    assert(Encoding.resolveEncoding("UTF-8").map(_._1) === Some("utf-8"))
    assert(Encoding.resolveEncoding("utf8").map(_._1) === Some("utf-8"))
    assert(Encoding.resolveEncoding("cp1251").map(_._1) === Some("cp1251"))
    assert(Encoding.resolveEncoding("windows-1251").map(_._1) === Some("cp1251"))
    assert(Encoding.resolveEncoding("cp852").map(_._1) === Some("cp852"))
    assert(Encoding.resolveEncoding("SHIFT_JIS").map(_._1) === Some("cp932"))
    assert(Encoding.resolveEncoding("euc-kr").map(_._1) === Some("cp949"))
    assert(Encoding.resolveEncoding("tis-620").map(_._1) === Some("cp874"))
    assert(Encoding.resolveEncoding("iso8859-9").map(_._1) === Some("cp1254"))
    assert(Encoding.resolveEncoding("macintosh").map(_._1) === Some("mac-roman"))
  }
}
