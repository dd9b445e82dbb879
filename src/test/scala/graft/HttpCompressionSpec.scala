package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.HttpCompression
import java.nio.charset.StandardCharsets.UTF_8

/** Decompression semantics pinned to the reference middleware
  * (`scrapy/downloadermiddlewares/httpcompression.py` + `utils/gz.py` +
  * `utils/_compression.py`; scenario shapes from
  * `tests/test_downloadermiddleware_httpcompression.py`). */
class HttpCompressionSpec extends AnyFunSuite {

  private val html = ("<html><body>" + ("scrapy " * 50) + "</body></html>").getBytes(UTF_8)

  test("gzip and x-gzip round-trip") {
    val gz = HttpCompression.gzipBytes(html)
    assert(gz.length < html.length)
    assert(HttpCompression.decode(gz, "gzip")._1 === html)
    assert(HttpCompression.decode(gz, "x-gzip")._1 === html)
    assert(HttpCompression.decode(gz, "gzip")._2 === Nil)
  }

  test("deflate: zlib-wrapped and raw (Microsoft-server quirk) both decode") {
    val zlibBody = HttpCompression.deflateBytes(html)
    assert(HttpCompression.decode(zlibBody, "deflate")._1 === html)
    // raw deflate: strip the 2-byte zlib header and 4-byte adler trailer
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(html); d.finish()
    val bos = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](65536)
    while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
    assert(HttpCompression.decode(bos.toByteArray, "deflate")._1 === html)
  }

  test("chained codings decode rightmost-first") {
    // Content-Encoding: deflate, gzip  → body = gzip(deflate(html))
    val body = HttpCompression.gzipBytes(HttpCompression.deflateBytes(html))
    val (decoded, kept) = HttpCompression.decode(body, "deflate, gzip")
    assert(decoded === html)
    assert(kept === Nil)
  }

  test("unknown coding stops the chain and is kept (brotli-not-installed analogue)") {
    // rightmost gzip decodes; 'br' is unsupported in this build → kept along
    // with everything left of it, body stays partially decoded
    val inner = HttpCompression.deflateBytes(html) // stand-in for brotli bytes
    val body = HttpCompression.gzipBytes(inner)
    val (decoded, kept) = HttpCompression.decode(body, "deflate, br, gzip")
    assert(decoded === inner)
    assert(kept === List("deflate", "br"))
    // header parsing: case/space-insensitive split
    assert(HttpCompression.splitEncodings(" GZIP ,  x-gzip")._1 === List("x-gzip", "gzip"))
  }

  test("zstd round-trips and honors the max-size guard") {
    val body = HttpCompression.zstdBytes(html)
    val (decoded, kept) = HttpCompression.decode(body, "zstd")
    assert(decoded === html)
    assert(kept === Nil)
    // chained with gzip outermost
    val chained = HttpCompression.gzipBytes(HttpCompression.zstdBytes(html))
    val (d2, k2) = HttpCompression.decode(chained, "zstd, gzip")
    assert(d2 === html && k2 === Nil)
    intercept[HttpCompression.MaxSizeExceeded](
      HttpCompression.unzstd(HttpCompression.zstdBytes(html), maxSize = 4))
    // corrupt zstd bytes surface as IOException (decode_error drop path)
    intercept[java.io.IOException](
      HttpCompression.unzstd(Array[Byte](1, 2, 3, 4, 5)))
  }

  test("pure-unsupported coding decodes nothing (reference early return)") {
    // `br` alone: toDecode is empty → callers skip the httpcompression
    // counters entirely (httpcompression.py `if not to_decode`)
    val (toDecode, kept) = HttpCompression.splitEncodings("br")
    assert(toDecode === Nil && kept === List("br"))
    val (decoded, k) = HttpCompression.decode(html, "br")
    assert(decoded eq html) // untouched, same array
    assert(k === List("br"))
  }

  test("gunzip is resilient to truncation once some output exists") {
    val gz = HttpCompression.gzipBytes(html)
    val truncated = gz.take(gz.length - 5) // clipped CRC/length trailer
    val out = HttpCompression.gunzip(truncated)
    assert(out.nonEmpty && out.length <= html.length)
    assert(new String(out, UTF_8).startsWith("<html><body>"))
    // nothing decodable → the error propagates (gz.py re-raises)
    intercept[java.io.IOException] {
      HttpCompression.gunzip("totally not gzip".getBytes(UTF_8))
    }
  }

  test("max-size guard throws during decompression") {
    val gz = HttpCompression.gzipBytes(html)
    intercept[HttpCompression.MaxSizeExceeded] {
      HttpCompression.decode(gz, "gzip", maxSize = 10)
    }
    // under the cap: fine
    assert(HttpCompression.decode(gz, "gzip", maxSize = html.length.toLong)._1 === html)
  }
}
