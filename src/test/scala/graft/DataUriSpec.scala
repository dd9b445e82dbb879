package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.LocalFetch
import graft.urlkit.{DataUri, UrlKit}

/** Golden battery for the data:/file: download handlers (contract 6e),
  * hard-coded from the reference handler tests
  * (`tests/test_downloader_handlers.py:309-361` TestDataURI) the same way
  * FingerprintSpec pins urlkit — the parser must reproduce the exact
  * media type / parameters / body bytes the reference's w3lib
  * `parse_data_uri` produces. */
class DataUriSpec extends AnyFunSuite {

  private def parsed(uri: String): DataUri.Parsed =
    DataUri.parse(uri).fold(e => fail(s"parse($uri) failed: $e"), identity)

  test("default mediatype + encoding (test_default_mediatype_encoding)") {
    val p = parsed("data:,A%20brief%20note")
    assert(p.mediaType === "text/plain")
    assert(p.charset === Some("US-ASCII"))
    assert(new String(p.data, "US-ASCII") === "A brief note")
  }

  test("charset without mediatype (test_default_mediatype)") {
    val p = parsed("data:;charset=iso-8859-7,%be%d3%be")
    assert(p.mediaType === "text/plain")
    assert(p.charset === Some("iso-8859-7"))
    assert(new String(p.data, "iso-8859-7") === "ΎΣΎ")
  }

  test("explicit text charset (test_text_charset)") {
    val p = parsed("data:text/plain;charset=iso-8859-7,%be%d3%be")
    assert(p.data.toSeq === Seq(0xbe.toByte, 0xd3.toByte, 0xbe.toByte))
    assert(p.charset === Some("iso-8859-7"))
  }

  test("quoted mediatype parameters (test_mediatype_parameters)") {
    val p = parsed(
      "data:text/plain;foo=%22foo;bar%5C%22%22;" +
        "charset=utf-8;bar=%22foo;%5C%22 foo ;/,%22" +
        ",%CE%8E%CE%A3%CE%8E")
    assert(p.mediaType === "text/plain")
    assert(p.charset === Some("utf-8"))
    assert(p.params("foo") === "foo;bar\"")
    assert(p.params("bar") === "foo;\" foo ;/,")
    assert(new String(p.data, "utf-8") === "ΎΣΎ")
  }

  test("base64 payload with encoded padding (test_base64)") {
    val p = parsed("data:text/plain;base64,SGVsbG8sIHdvcmxkLg%3D%3D")
    assert(new String(p.data, "utf-8") === "Hello, world.")
  }

  test("empty data (test_protocol / test_response_attrs)") {
    val p = parsed("data:,")
    assert(p.data.length === 0)
    assert(p.mediaType === "text/plain")
  }

  test("invalid URIs are the handler's ValueError") {
    assert(DataUri.parse("data:text/plain;base65,xx").isLeft) // bad marker
    assert(DataUri.parse("data:text/plain;base64").isLeft) // no comma
    assert(DataUri.parse("notdata:,x").isLeft)
  }

  test("base64 strictness matches CPython b64decode (ADVICE r4 goldens)") {
    def b64(payload: String): Either[String, Seq[Byte]] =
      DataUri.parse(s"data:text/plain;base64,$payload").map(_.data.toSeq)
    // unpadded input: Python raises Incorrect padding → handler ValueError
    assert(b64("SGVsbG8").isLeft)
    // data after completed padding is IGNORED, not an error
    assert(b64("QQ%3D%3DQQ") === Right(Seq[Byte]('A')))
    assert(b64("QQ%3D%3DQQQQ") === Right(Seq[Byte]('A')))
    // one '=' after 2 data chars without an immediate second '=' → error
    assert(b64("QQ%3D").isLeft)
    assert(b64("QQ%3DQ").isLeft)
    // '=' on a quad boundary is discarded (CPython a2b_base64)
    assert(b64("%3DQQQQ") === Right(Seq[Byte]('A', 0x04, 0x10)))
    assert(b64("QQQQ%3D") === Right(Seq[Byte]('A', 0x04, 0x10)))
    // '=' after 3 data chars completes the quad and stops
    assert(b64("QQA%3DQQ%3D%3D") === Right(Seq[Byte]('A', 0x00)))
    // 1 data char can never be padded into a byte
    assert(b64("A%3D%3D%3D").isLeft)
    // non-alphabet chars are discarded BEFORE the padding check
    assert(b64("SGV%20sbG8%21sIHdvcmxkLg%3D%3D") ===
      Right("Hello, world.".getBytes("US-ASCII").toSeq))
  }

  test("urlkit survives data:/file: URLs (sanitize, fingerprint, host)") {
    val sanitized = UrlKit.safeUrlString(
      """data:text/html,<a href="http://h1.test/p/1">one</a>""")
    // the Request-sanitized form percent-encodes and parses back to the
    // same HTML
    val p = parsed(sanitized)
    assert(new String(p.data, "utf-8") ===
      """<a href="http://h1.test/p/1">one</a>""")
    assert(p.mediaType === "text/html")
    assert(UrlKit.hostOf(sanitized) === "")
    assert(UrlKit.fingerprint(sanitized).length === 20)
    assert(UrlKit.hostOf("file:///tmp/x/y.html") === "")
    assert(UrlKit.fingerprint("file:///tmp/x/y.html").length === 20)
  }

  test("file_uri_to_path + dispatch (handlers/file.py)") {
    assert(LocalFetch.fileUriToPath("file:///tmp/a%20b/c.html") === "/tmp/a b/c.html")
    val d = java.nio.file.Files.createTempDirectory("graft-datauri").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(d, "x.html"),
      "<a href=\"http://h.test/\">x</a>".getBytes("UTF-8"))
    val ok = LocalFetch.fetch(s"file://$d/x.html")
    assert(ok.status === 200 && ok.isHtml)
    assert(new String(ok.body, "UTF-8").contains("h.test"))
    val miss = LocalFetch.fetch(s"file://$d/gone.html")
    assert(miss.status === 599 && miss.retryExc)
    assert(miss.excClass === "builtins.FileNotFoundError")
    assert(LocalFetch.excType(s"file://$d/gone.html") ===
      "builtins.FileNotFoundError")
    // a directory: CPython open() raises IsADirectoryError (ADVICE r4)
    val dirResp = LocalFetch.fetch(s"file://$d")
    assert(dirResp.status === 599 && dirResp.retryExc)
    assert(dirResp.excClass === "builtins.IsADirectoryError")
    val bad = LocalFetch.fetch("data:text/plain;base65,xx")
    assert(bad.status === 599 && !bad.retryExc)
    assert(LocalFetch.excType("data:x") === "builtins.ValueError")
  }
}
