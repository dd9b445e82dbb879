package graft.extract

import java.nio.charset.{Charset, StandardCharsets}

/** Response encoding detection (reference `scrapy/http/response/text.py:
  * 68-137`): BOM → Content-Type header charset → `<meta>`/`<?xml?>` declared
  * → auto-detect (ascii → utf-8 → cp1252, each tried strictly) → ascii with
  * replacement. Every declared name runs through [[resolveEncoding]], the
  * w3lib `resolve_encoding` chain (Python codec-alias normalization + the
  * WHATWG `DEFAULT_ENCODING_TRANSLATION` table) — so `iso-8859-1` decodes as
  * cp1252 and `gb2312`/`gbk` as gb18030, exactly like the reference
  * (`tests/test_http_response.py::test_encoding` pins r3/r6/r7/r9).
  * Returns the charset plus where it came from (the reference tracks
  * declared vs inferred the same way). */
object Encoding {

  sealed trait Source
  case object Bom extends Source
  case object Header extends Source
  case object MetaTag extends Source
  case object Inferred extends Source

  private val MetaCharsetRe =
    """(?is)<meta[^>]+charset\s*=\s*["']?\s*([\w][\w.:-]*)""".r
  // w3lib html_body_declared_encoding also matches the XML declaration
  // (`<?xml version="1.0" encoding="ISO-8859-9"?>` — one alternation with
  // the meta rules; reference test_xmliter_encoding relies on it)
  private val XmlDeclRe =
    """(?is)<\?xml\s[^>]*?encoding\s*=\s*["']?([\w][\w.:-]*)""".r
  private val HeaderCharsetRe =
    """(?i)charset\s*=\s*"?([\w][\w.:-]*)"?""".r

  // ---- w3lib resolve_encoding -------------------------------------------

  /** CPython `encodings.normalize_encoding`: collapse runs of
    * non-alphanumeric chars (except '.') to a single '_', drop non-ASCII,
    * drop leading punctuation; then w3lib lowercases. */
  private[extract] def normalizeEncoding(enc: String): String = {
    val sb = new StringBuilder
    var punct = false
    enc.foreach { c =>
      if (Character.isLetterOrDigit(c) || c == '.') {
        if (punct && sb.nonEmpty) sb.append('_')
        if (c < 128) sb.append(c)
        punct = false
      } else punct = true
    }
    sb.result().toLowerCase(java.util.Locale.ROOT)
  }

  /** Curated subset of CPython `encodings.aliases.aliases` — the
    * web-relevant rows (full table is ~330 entries of EBCDIC lore). */
  private val pyAliases: Map[String, String] = Map(
    // ascii
    "646" -> "ascii", "us_ascii" -> "ascii", "us" -> "ascii",
    "ansi_x3.4_1968" -> "ascii", "ansi_x3.4_1986" -> "ascii",
    "ansi_x3_4_1968" -> "ascii", "cp367" -> "ascii", "ibm367" -> "ascii",
    "iso646_us" -> "ascii", "iso_646.irv_1991" -> "ascii",
    "iso_ir_6" -> "ascii",
    // utf family
    "utf8" -> "utf_8", "utf" -> "utf_8", "u8" -> "utf_8",
    "utf8_ucs2" -> "utf_8", "utf8_ucs4" -> "utf_8", "cp65001" -> "utf_8",
    "utf16" -> "utf_16", "u16" -> "utf_16",
    "unicodelittleunmarked" -> "utf_16_le", "utf_16le" -> "utf_16_le",
    "unicodebigunmarked" -> "utf_16_be", "utf_16be" -> "utf_16_be",
    "utf32" -> "utf_32", "u32" -> "utf_32",
    // latin-1
    "iso8859_1" -> "latin_1", "iso_8859_1" -> "latin_1",
    "iso_8859_1_1987" -> "latin_1", "8859" -> "latin_1",
    "cp819" -> "latin_1", "ibm819" -> "latin_1", "latin" -> "latin_1",
    "latin1" -> "latin_1", "l1" -> "latin_1",
    // other iso8859 parts
    "iso_8859_2" -> "iso8859_2", "latin2" -> "iso8859_2", "l2" -> "iso8859_2",
    "iso_8859_3" -> "iso8859_3", "latin3" -> "iso8859_3", "l3" -> "iso8859_3",
    "iso_8859_4" -> "iso8859_4", "latin4" -> "iso8859_4", "l4" -> "iso8859_4",
    "iso_8859_5" -> "iso8859_5", "cyrillic" -> "iso8859_5",
    "iso_8859_6" -> "iso8859_6", "arabic" -> "iso8859_6",
    "iso_8859_7" -> "iso8859_7", "greek" -> "iso8859_7",
    "greek8" -> "iso8859_7",
    "iso_8859_8" -> "iso8859_8", "hebrew" -> "iso8859_8",
    "iso_8859_9" -> "iso8859_9", "latin5" -> "iso8859_9", "l5" -> "iso8859_9",
    "iso_8859_10" -> "iso8859_10", "latin6" -> "iso8859_10",
    "iso_8859_11" -> "iso8859_11", "thai" -> "iso8859_11",
    "iso_8859_13" -> "iso8859_13", "latin7" -> "iso8859_13",
    "iso_8859_14" -> "iso8859_14", "latin8" -> "iso8859_14",
    "iso_8859_15" -> "iso8859_15", "latin9" -> "iso8859_15",
    "l9" -> "iso8859_15",
    "iso_8859_16" -> "iso8859_16", "latin10" -> "iso8859_16",
    // windows codepages
    "windows_1250" -> "cp1250", "windows_1251" -> "cp1251",
    "windows_1252" -> "cp1252", "windows_1253" -> "cp1253",
    "windows_1254" -> "cp1254", "windows_1255" -> "cp1255",
    "windows_1256" -> "cp1256", "windows_1257" -> "cp1257",
    "windows_1258" -> "cp1258",
    // cjk
    "chinese" -> "gb2312", "csiso58gb231280" -> "gb2312",
    "euc_cn" -> "gb2312", "euccn" -> "gb2312", "eucgb2312_cn" -> "gb2312",
    "gb2312_1980" -> "gb2312", "gb2312_80" -> "gb2312",
    "iso_ir_58" -> "gb2312",
    "936" -> "gbk", "cp936" -> "gbk", "ms936" -> "gbk",
    "gb18030_2000" -> "gb18030",
    "big5_tw" -> "big5", "csbig5" -> "big5",
    "big5_hkscs" -> "big5hkscs", "hkscs" -> "big5hkscs",
    "csshiftjis" -> "shift_jis", "shiftjis" -> "shift_jis",
    "sjis" -> "shift_jis", "s_jis" -> "shift_jis",
    "932" -> "cp932", "ms932" -> "cp932", "mskanji" -> "cp932",
    "ms_kanji" -> "cp932",
    "eucjp" -> "euc_jp", "ujis" -> "euc_jp", "u_jis" -> "euc_jp",
    "euckr" -> "euc_kr", "korean" -> "euc_kr", "ksc5601" -> "euc_kr",
    "ks_c_5601" -> "euc_kr", "ks_c_5601_1987" -> "euc_kr",
    "ksx1001" -> "euc_kr", "ks_x_1001" -> "euc_kr",
    "949" -> "cp949", "ms949" -> "cp949", "uhc" -> "cp949",
    // misc
    "cskoi8r" -> "koi8_r",
    "macintosh" -> "mac_roman", "macroman" -> "mac_roman",
    "tis260" -> "tactis", "tis620" -> "tis_620", "tis_620_0" -> "tis_620",
    "tis_620_2529_0" -> "tis_620", "tis_620_2529_1" -> "tis_620",
    "iso_ir_166" -> "tis_620",
    "866" -> "cp866", "ibm866" -> "cp866",
    "852" -> "cp852", "ibm852" -> "cp852")

  /** w3lib `DEFAULT_ENCODING_TRANSLATION` (w3lib/encoding.py): the WHATWG
    * superset re-mappings browsers apply. */
  private val encodingTranslation: Map[String, String] = Map(
    "ascii" -> "cp1252",
    "big5" -> "big5hkscs",
    "euc_kr" -> "cp949",
    "gb2312" -> "gb18030",
    "gb_2312_80" -> "gb18030",
    "gbk" -> "gb18030",
    "iso8859_11" -> "cp874",
    "iso8859_9" -> "cp1254",
    "latin_1" -> "cp1252",
    "macintosh" -> "mac_roman",
    "shift_jis" -> "cp932",
    "tis_620" -> "cp874",
    "win_1251" -> "cp1251",
    "windows_31j" -> "cp932",
    "win_31j" -> "cp932",
    "windows_874" -> "cp874",
    "win_874" -> "cp874",
    "x_sjis" -> "cp932",
    "zh_cn" -> "gb18030")

  /** Python codec → (codecs.lookup(...).name, JVM charset). Only codecs the
    * translation chain can produce need exact Python canonical names. */
  private val codecTable: Map[String, (String, String)] = Map(
    "ascii" -> ("ascii", "US-ASCII"),
    "utf_8" -> ("utf-8", "UTF-8"),
    "utf_16" -> ("utf-16", "UTF-16"),
    "utf_16_le" -> ("utf-16-le", "UTF-16LE"),
    "utf_16_be" -> ("utf-16-be", "UTF-16BE"),
    "utf_32" -> ("utf-32", "UTF-32"),
    "latin_1" -> ("iso8859-1", "ISO-8859-1"),
    "iso8859_2" -> ("iso8859-2", "ISO-8859-2"),
    "iso8859_3" -> ("iso8859-3", "ISO-8859-3"),
    "iso8859_4" -> ("iso8859-4", "ISO-8859-4"),
    "iso8859_5" -> ("iso8859-5", "ISO-8859-5"),
    "iso8859_6" -> ("iso8859-6", "ISO-8859-6"),
    "iso8859_7" -> ("iso8859-7", "ISO-8859-7"),
    "iso8859_8" -> ("iso8859-8", "ISO-8859-8"),
    "iso8859_13" -> ("iso8859-13", "ISO-8859-13"),
    "iso8859_15" -> ("iso8859-15", "ISO-8859-15"),
    "cp1250" -> ("cp1250", "windows-1250"),
    "cp1251" -> ("cp1251", "windows-1251"),
    "cp1252" -> ("cp1252", "windows-1252"),
    "cp1253" -> ("cp1253", "windows-1253"),
    "cp1254" -> ("cp1254", "windows-1254"),
    "cp1255" -> ("cp1255", "windows-1255"),
    "cp1256" -> ("cp1256", "windows-1256"),
    "cp1257" -> ("cp1257", "windows-1257"),
    "cp1258" -> ("cp1258", "windows-1258"),
    "cp874" -> ("cp874", "x-windows-874"),
    "cp932" -> ("cp932", "windows-31j"),
    "cp949" -> ("cp949", "x-windows-949"),
    "cp852" -> ("cp852", "IBM852"),
    "cp866" -> ("cp866", "IBM866"),
    "gb2312" -> ("gb2312", "GB2312"),
    "gbk" -> ("gbk", "GBK"),
    "gb18030" -> ("gb18030", "GB18030"),
    "big5" -> ("big5", "Big5"),
    "big5hkscs" -> ("big5hkscs", "Big5-HKSCS"),
    "shift_jis" -> ("shift_jis", "Shift_JIS"),
    "euc_jp" -> ("euc_jp", "EUC-JP"),
    "euc_kr" -> ("euc_kr", "EUC-KR"),
    "koi8_r" -> ("koi8-r", "KOI8-R"),
    "koi8_u" -> ("koi8-u", "KOI8-U"),
    "mac_roman" -> ("mac-roman", "x-MacRoman"),
    "tis_620" -> ("tis-620", "TIS-620"))

  /** w3lib `resolve_encoding`: normalize → Python alias → WHATWG translation
    * → codec lookup. Returns (Python canonical name, JVM charset), or None
    * for unknown names (reference: unknown declared encodings are ignored,
    * `test_declared_encoding_invalid`). */
  def resolveEncoding(alias: String): Option[(String, Charset)] = {
    val normed = normalizeEncoding(alias)
    val aliased = pyAliases.getOrElse(normed, normed)
    val translated = encodingTranslation.getOrElse(aliased, aliased)
    codecTable.get(translated) match {
      case Some((py, jv)) =>
        try Some((py, Charset.forName(jv))) catch { case _: Exception => None }
      case None =>
        // not in the curated table: accept whatever the JVM knows under the
        // same spelling (Python codecs.lookup is similarly permissive)
        try {
          val cs = Charset.forName(translated.replace('_', '-'))
          Some((cs.name.toLowerCase(java.util.Locale.ROOT), cs))
        } catch { case _: Exception => None }
    }
  }

  def bomCharset(body: Array[Byte]): Option[Charset] = {
    def b(i: Int) = if (i < body.length) body(i) & 0xff else -1
    if (b(0) == 0xef && b(1) == 0xbb && b(2) == 0xbf) Some(StandardCharsets.UTF_8)
    else if (b(0) == 0xff && b(1) == 0xfe && (b(2) != 0 || b(3) != 0))
      Some(StandardCharsets.UTF_16LE)
    else if (b(0) == 0xfe && b(1) == 0xff) Some(StandardCharsets.UTF_16BE)
    else None
  }

  private def lookup(name: String): Option[Charset] =
    resolveEncoding(name.trim).map(_._2)

  /** Python-strict cp1252 validity: bytes 0x81/0x8D/0x8F/0x90/0x9D are
    * undefined in CPython's cp1252 (Java's windows-1252 decoder is lenient
    * and maps them to C1 controls — can't be used for the strict probe). */
  private def isStrictCp1252(body: Array[Byte]): Boolean =
    body.forall { b =>
      val c = b & 0xff
      c != 0x81 && c != 0x8d && c != 0x8f && c != 0x90 && c != 0x9d
    }

  private def isValidUtf8(body: Array[Byte]): Boolean = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try { dec.decode(java.nio.ByteBuffer.wrap(body)); true }
    catch { case _: Exception => false }
  }

  /** Detect (charset, source) for a response body + Content-Type header.
    * Declared-but-unknown charsets fall through to the next stage, like
    * w3lib html_to_unicode. */
  def detect(body: Array[Byte], contentType: Option[String]): (Charset, Source) = {
    bomCharset(body).map((_, Bom)).getOrElse {
      contentType
        .flatMap(ct => HeaderCharsetRe.findFirstMatchIn(ct).map(_.group(1)))
        .flatMap(lookup).map((_, Header: Source))
        .orElse {
          // sniff a declared <meta charset> / <?xml encoding=?> in the first
          // 4KB (ascii-safe scan); earliest declaration wins like w3lib's
          // single-alternation body-encoding regex
          val head = new String(body.take(4096), StandardCharsets.ISO_8859_1)
          val meta = MetaCharsetRe.findFirstMatchIn(head)
          val xml = XmlDeclRe.findFirstMatchIn(head)
          val first = (meta, xml) match {
            case (Some(m), Some(x)) => Some(if (m.start <= x.start) m else x)
            case (m, x) => m.orElse(x)
          }
          first.map(_.group(1)).flatMap(lookup).map((_, MetaTag: Source))
        }
        .getOrElse {
          // TextResponse._auto_detect_fun: try ascii, utf-8, cp1252 strictly
          // (resolve_encoding("ascii") = cp1252, so a pure-ASCII body reads
          // as cp1252 like the reference); all-fail → _DEFAULT_ENCODING
          // ("ascii") decoded with errors="replace" — Java's String
          // constructor replaces malformed input the same way
          val cs =
            if (body.forall(b => (b & 0xff) < 0x80)) charsetCp1252
            else if (isValidUtf8(body)) StandardCharsets.UTF_8
            else if (isStrictCp1252(body)) charsetCp1252
            else StandardCharsets.US_ASCII
          (cs, Inferred)
        }
    }
  }

  private val charsetCp1252 = Charset.forName("windows-1252")

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
