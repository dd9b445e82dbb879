package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import graft.extract.Encoding

class EncodingSpec extends AnyFunSuite {
  test("BOM wins and is stripped on decode") {
    val body = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "héllo".getBytes("UTF-8")
    val (cs, src) = Encoding.detect(body, Some("text/html; charset=iso-8859-1"))
    assert(cs === StandardCharsets.UTF_8 && src === Encoding.Bom)
    assert(Encoding.decode(body, Some("text/html; charset=iso-8859-1")) === "héllo")
  }
  test("Content-Type header charset") {
    val body = "café".getBytes("ISO-8859-1")
    val (cs, src) = Encoding.detect(body, Some("text/html; charset=ISO-8859-1"))
    assert(cs === StandardCharsets.ISO_8859_1 && src === Encoding.Header)
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
    assert(cs === StandardCharsets.ISO_8859_1 && src === Encoding.MetaTag)
  }
  test("UTF-8 inference and latin-1 fallback") {
    val (cs1, s1) = Encoding.detect("plain utf-8 ✓".getBytes("UTF-8"), None)
    assert(cs1 === StandardCharsets.UTF_8 && s1 === Encoding.Inferred)
    val bad = Array[Byte](0x68, 0x69, 0xa3.toByte, 0xff.toByte) // invalid UTF-8
    val (cs2, s2) = Encoding.detect(bad, None)
    assert(cs2 === StandardCharsets.ISO_8859_1 && s2 === Encoding.Inferred)
  }
}
