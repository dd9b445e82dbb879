package graft.extract

import java.nio.charset.{Charset, StandardCharsets}

/** Response encoding detection (reference `scrapy/http/response/text.py:
  * 68-120`): BOM → Content-Type header charset → `<meta>` declared →
  * UTF-8 heuristic fallback. Returns the charset plus where it came from
  * (the reference tracks declared vs inferred the same way). */
object Encoding {

  sealed trait Source
  case object Bom extends Source
  case object Header extends Source
  case object MetaTag extends Source
  case object Inferred extends Source

  private val MetaCharsetRe =
    """(?is)<meta[^>]+charset\s*=\s*["']?\s*([\w][\w.:-]*)""".r
  private val HeaderCharsetRe =
    """(?i)charset\s*=\s*"?([\w][\w.:-]*)"?""".r

  def bomCharset(body: Array[Byte]): Option[Charset] = {
    def b(i: Int) = if (i < body.length) body(i) & 0xff else -1
    if (b(0) == 0xef && b(1) == 0xbb && b(2) == 0xbf) Some(StandardCharsets.UTF_8)
    else if (b(0) == 0xff && b(1) == 0xfe && (b(2) != 0 || b(3) != 0))
      Some(StandardCharsets.UTF_16LE)
    else if (b(0) == 0xfe && b(1) == 0xff) Some(StandardCharsets.UTF_16BE)
    else None
  }

  private def lookup(name: String): Option[Charset] =
    try Some(Charset.forName(name.trim)) catch { case _: Exception => None }

  /** Detect (charset, source) for a response body + Content-Type header. */
  def detect(body: Array[Byte], contentType: Option[String]): (Charset, Source) = {
    bomCharset(body).map((_, Bom)).getOrElse {
      contentType
        .flatMap(ct => HeaderCharsetRe.findFirstMatchIn(ct).map(_.group(1)))
        .flatMap(lookup).map((_, Header: Source))
        .orElse {
          // sniff a declared <meta charset> in the first 4KB (ascii-safe scan)
          val head = new String(body.take(4096), StandardCharsets.ISO_8859_1)
          MetaCharsetRe.findFirstMatchIn(head).map(_.group(1)).flatMap(lookup)
            .map((_, MetaTag: Source))
        }
        .getOrElse {
          // UTF-8 validity heuristic; else latin-1 (never fails)
          val dec = StandardCharsets.UTF_8.newDecoder()
            .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          val cs = try { dec.decode(java.nio.ByteBuffer.wrap(body)); StandardCharsets.UTF_8 }
          catch { case _: Exception => StandardCharsets.ISO_8859_1 }
          (cs, Inferred)
        }
    }
  }

  def decode(body: Array[Byte], contentType: Option[String] = None): String = {
    val (cs, src) = detect(body, contentType)
    val skip = src match {
      case Bom if cs == StandardCharsets.UTF_8 => 3
      case Bom => 2
      case _ => 0
    }
    new String(body, skip, body.length - skip, cs)
  }
}
