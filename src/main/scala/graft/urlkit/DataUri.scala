package graft.urlkit

import java.nio.charset.StandardCharsets

/** RFC 2397 `data:` URI parsing with w3lib `parse_data_uri` semantics
  * (the reference's DataURIDownloadHandler input,
  * `scrapy/core/downloader/handlers/datauri.py:15-28`), pinned by the
  * reference handler's golden cases (`tests/test_downloader_handlers.py:
  * 309-361`) in DataUriSpec:
  *
  *  - the URI is percent-DECODED before parsing (so quoted media-type
  *    parameters arrive as real `"`-quoted strings — the
  *    `test_mediatype_parameters` golden requires it), then
  *  - an optional `token/token` media type (default `text/plain` with
  *    parameter `charset=US-ASCII` recorded only when the media type is
  *    absent),
  *  - `;attr=value` parameters (token or `"quoted \"string\""` with
  *    backslash unescaping),
  *  - an optional `;base64` marker before the `,` (anything else there is
  *    an invalid data URI → the handler's ValueError), and
  *  - the data: raw percent-decoded bytes, or their base64 decode
  *    (non-alphabet characters discarded first, like CPython
  *    `base64.b64decode`).
  */
object DataUri {

  final case class Parsed(
      mediaType: String,
      params: Map[String, String],
      data: Array[Byte]) {
    /** Declared text encoding: the charset parameter when present (the
      * reference resolves `US-ASCII` via the no-media-type default). */
    def charset: Option[String] = params.get("charset")
  }

  private val Token = "[!#$%&'*+\\-.^_`{|}~0-9A-Za-z]+"
  private val MediaTypeRe = s"^$Token/$Token".r
  private val ParamRe =
    ("""^;(""" + Token + """)=(?:(""" + Token + """)|"((?:[^"\\]|\\.)*)")""").r

  /** Percent-decode to raw bytes ('+' NOT special — `unquote_to_bytes`). */
  private def percentDecode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        out.write(Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16))
        i += 3
      } else {
        // post-safe_url_string input is ASCII; non-ASCII falls back to UTF-8
        val bs = c.toString.getBytes(StandardCharsets.UTF_8)
        out.write(bs, 0, bs.length)
        i += 1
      }
    }
    out.toByteArray
  }

  /** CPython `binascii.a2b_base64` strictness over an alphabet-filtered
    * payload (ADVICE r4: java.util.Base64 is laxer on both sides — it
    * accepts missing padding where Python raises Incorrect padding, and
    * rejects data after padding where Python stops and ignores it).
    * Empirically pinned rules (see DataUriSpec goldens):
    *  - '=' with an empty current quad is discarded ('=QQQQ' → b'A\x04\x10')
    *  - '=' after 1 data char in the quad is an error (b64 can't encode it)
    *  - '=' after 2 data chars requires an immediate second '='
    *    ('QQ==' ok, 'QQ='/'QQ=Q' → Incorrect padding); decode then STOPS —
    *    later chars are ignored ('QQ==QQ' → b'A')
    *  - '=' after 3 data chars completes the quad and stops ('QQA=QQ==' →
    *    b'A\x00')
    *  - input exhausted mid-quad → Incorrect padding ('SGVsbG8' errors)
    * Returns the correctly-padded prefix java.util.Base64 can decode. */
  private def normalizeB64(filtered: String): Either[String, String] = {
    val sb = new StringBuilder
    var p = 0 // data chars in the current quad
    var i = 0
    val n = filtered.length
    while (i < n) {
      val c = filtered.charAt(i)
      if (c != '=') { sb.append(c); p = (p + 1) % 4; i += 1 }
      else if (p == 0) i += 1 // stray '=' on a quad boundary: discarded
      else if (p == 1) return Left("Invalid base64-encoded string: number " +
        "of data characters cannot be 1 more than a multiple of 4")
      else if (p == 2) {
        if (i + 1 < n && filtered.charAt(i + 1) == '=') {
          sb.append("==")
          return Right(sb.toString) // padding terminates the decode
        } else return Left("Incorrect padding")
      } else { // p == 3
        sb.append('=')
        return Right(sb.toString)
      }
    }
    if (p != 0) Left("Incorrect padding") else Right(sb.toString)
  }

  /** Parse a (request-sanitized) data URI. Left = the ValueError message the
    * reference handler would raise (an unretried download exception). */
  def parse(uri: String): Either[String, Parsed] = {
    val colon = uri.indexOf(':')
    if (colon < 0) return Left("invalid URI")
    if (!uri.substring(0, colon).equalsIgnoreCase("data"))
      return Left("not a data URI")
    // decode first (delimiters inside values are percent-encoded on the
    // wire), then parse over the decoded bytes as ISO-8859-1 (1:1 byte-char)
    val decoded = new String(percentDecode(uri.substring(colon + 1)),
      StandardCharsets.ISO_8859_1)

    var rest = decoded
    var mediaType = "text/plain"
    var params = Map.empty[String, String]
    MediaTypeRe.findFirstIn(rest) match {
      case Some(mt) =>
        mediaType = mt
        rest = rest.substring(mt.length)
      case None =>
        params += ("charset" -> "US-ASCII")
    }
    var more = true
    while (more) {
      ParamRe.findFirstMatchIn(rest) match {
        case Some(m) =>
          val value =
            if (m.group(2) != null) m.group(2)
            else m.group(3).replaceAll("""\\(.)""", "$1")
          params += (m.group(1) -> value)
          rest = rest.substring(m.end)
        case None => more = false
      }
    }
    val comma = rest.indexOf(',')
    if (comma < 0) return Left("invalid data URI")
    val marker = rest.substring(0, comma)
    val payload = rest.substring(comma + 1)
    if (marker == ";base64") {
      // CPython b64decode(validate=False): discard non-alphabet chars
      // before the padding check
      val filtered = payload.filter(c =>
        (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '+' || c == '/' || c == '=')
      normalizeB64(filtered) match {
        case Left(err) => Left(err)
        case Right(norm) =>
          try Right(Parsed(mediaType, params,
            java.util.Base64.getDecoder.decode(norm)))
          catch {
            case _: IllegalArgumentException =>
              Left("Invalid base64-encoded string")
          }
      }
    } else if (marker.isEmpty) {
      Right(Parsed(mediaType, params,
        payload.getBytes(StandardCharsets.ISO_8859_1)))
    } else Left("invalid data URI")
  }
}
