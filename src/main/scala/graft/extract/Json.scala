package graft.extract

import java.nio.charset.{Charset, CodingErrorAction, StandardCharsets}

/** CPython-`json.loads`-faithful JSON parser — the `TextResponse.json()`
  * analogue (`scrapy/http/response/text.py:79-86` is literally
  * `json.loads(self.body)`, and `JsonResponse` adds nothing,
  * `response/json.py`). Spider-side callbacks over [[ResponseTypes.RJson]]
  * bodies parse with this; it is a pure per-row function, usable from
  * executor `map` stages (for declarative pipelines over JSON columns,
  * prefer Spark's codegen'd `from_json`/`get_json_object` — this facade
  * exists for the imperative parse-callback surface, not the hot path).
  *
  * Semantics pinned by JsonSpec goldens generated from CPython 3 `json`:
  *  - numbers: `-?(0|[1-9]\d*)(\.\d+)?([eE][+-]?\d+)?`; no frac/exp ⇒
  *    arbitrary-precision [[JInt]] (Python int), else [[JFloat]] with
  *    correctly-rounded IEEE-754 parse (overflow ⇒ ±Inf, like `float()`);
  *    the non-standard constants `NaN`/`Infinity`/`-Infinity` are accepted
  *    (CPython default `parse_constant`);
  *  - strings: unescaped control chars < 0x20 are errors (strict mode);
  *    `\uXXXX` appends the raw UTF-16 code unit, so surrogate pairs combine
  *    and LONE surrogates survive, exactly like CPython's scanner;
  *  - objects: duplicate keys keep the FIRST key position with the LAST
  *    value (CPython dict `__setitem__` semantics);
  *  - trailing non-whitespace after the document is an error ("Extra data");
  *  - [[loads(bytes*]] auto-detects UTF-8/16/32 (±BOM) with CPython
  *    `json.detect_encoding`'s exact BOM-then-null-byte-pattern rules.
  */
object Json {

  sealed trait JVal {
    /** Object field lookup (last-wins value, like a Python dict). */
    def apply(key: String): JVal = this match {
      case JObj(fields) =>
        fields.collectFirst { case (k, v) if k == key => v }
          .getOrElse(throw new NoSuchElementException(s"key not found: $key"))
      case other => throw new IllegalStateException(s"not an object: $other")
    }
    /** Array element lookup. */
    def apply(i: Int): JVal = this match {
      case JArr(items) => items(i)
      case other => throw new IllegalStateException(s"not an array: $other")
    }
  }
  case object JNull extends JVal
  final case class JBool(value: Boolean) extends JVal
  /** A JSON integer (no fraction/exponent) — arbitrary precision. */
  final case class JInt(value: BigInt) extends JVal
  final case class JFloat(value: Double) extends JVal
  final case class JStr(value: String) extends JVal
  final case class JArr(items: Vector[JVal]) extends JVal
  /** Insertion-ordered fields; duplicate keys already collapsed
    * (first position, last value). */
  final case class JObj(fields: Vector[(String, JVal)]) extends JVal {
    def keys: Vector[String] = fields.map(_._1)
  }

  final class JsonError(msg: String, val pos: Int)
      extends IllegalArgumentException(s"$msg (char $pos)")

  /** CPython-default `json.dumps`: separators `", "`/`": "`, ensure_ascii
    * (non-ASCII → `\uXXXX`), NaN/Infinity constants. One documented
    * divergence: float exponent formatting follows Java `Double.toString`
    * ("1.0E22") not CPython repr ("1e+22") — both shortest-round-trip;
    * integral-valued doubles render "1.0" like CPython. */
  def dumps(v: JVal): String = v match {
    case JNull => "null"
    case JBool(b) => if (b) "true" else "false"
    case JInt(n) => n.toString
    case JFloat(d) =>
      if (d.isNaN) "NaN"
      else if (d.isPosInfinity) "Infinity"
      else if (d.isNegInfinity) "-Infinity"
      else java.lang.Double.toString(d)
    case JStr(s) => quote(s)
    case JArr(items) => items.map(dumps).mkString("[", ", ", "]")
    case JObj(fields) =>
      fields.map { case (k, x) => quote(k) + ": " + dumps(x) }
        .mkString("{", ", ", "}")
  }

  private def quote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb += '"'
    for (c <- s) c match {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\b' => sb ++= "\\b"
      case '\f' => sb ++= "\\f"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c2 if c2 < 0x20 || c2 > 0x7e => sb ++= f"\\u${c2.toInt}%04x"
      case c2 => sb += c2
    }
    sb += '"'
    sb.toString
  }

  /** `json.loads(str)`. */
  def loads(s: String): JVal = new P(s).document()

  /** `json.loads(bytes)` — encoding auto-detected like CPython
    * `json.detect_encoding` (BOM first, then the null-byte pattern of the
    * first 2–4 bytes, default UTF-8). Malformed byte sequences for the
    * detected encoding raise, like `UnicodeDecodeError`. */
  def loads(b: Array[Byte]): JVal = loads(decodeDetected(b))

  // ---------------------------------------------------------------- decode

  private[extract] def decodeDetected(b: Array[Byte]): String = {
    def at(i: Int): Int = b(i) & 0xff
    def starts(bom: Int*): Boolean =
      b.length >= bom.length && bom.indices.forall(i => at(i) == bom(i))
    // BOM checks, UTF-32 before UTF-16 (BOM_UTF32_LE begins with BOM_UTF16_LE)
    val (cs, skip): (String, Int) =
      if (starts(0x00, 0x00, 0xfe, 0xff)) ("UTF-32BE", 4)
      else if (starts(0xff, 0xfe, 0x00, 0x00)) ("UTF-32LE", 4)
      else if (starts(0xfe, 0xff)) ("UTF-16BE", 2)
      else if (starts(0xff, 0xfe)) ("UTF-16LE", 2)
      else if (starts(0xef, 0xbb, 0xbf)) ("UTF-8", 3)
      else if (b.length >= 4 && at(0) == 0)
        (if (at(1) != 0) "UTF-16BE" else "UTF-32BE", 0)
      else if (b.length >= 4 && at(1) == 0)
        (if (at(2) != 0 || at(3) != 0) "UTF-16LE" else "UTF-32LE", 0)
      else if (b.length == 2 && at(0) == 0) ("UTF-16BE", 0)
      else if (b.length == 2 && at(1) == 0) ("UTF-16LE", 0)
      else ("UTF-8", 0)
    strictDecode(b, skip, Charset.forName(cs))
  }

  private def strictDecode(b: Array[Byte], skip: Int, cs: Charset): String = {
    val dec = cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)
    dec.decode(java.nio.ByteBuffer.wrap(b, skip, b.length - skip)).toString
  }

  // ---------------------------------------------------------------- parser

  private final class P(s: String) {
    private var i = 0
    private def err(msg: String): Nothing = throw new JsonError(msg, i)
    private def ws(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1

    def document(): JVal = {
      ws()
      if (i >= s.length) err("Expecting value")
      val v = value()
      ws()
      if (i < s.length) err("Extra data")
      v
    }

    private def lit(text: String, v: JVal): JVal = {
      if (!s.startsWith(text, i)) err("Expecting value")
      i += text.length; v
    }

    private def value(): JVal = {
      if (i >= s.length) err("Expecting value")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true", JBool(true))
        case 'f' => lit("false", JBool(false))
        case 'n' => lit("null", JNull)
        case 'N' => lit("NaN", JFloat(Double.NaN))
        case 'I' => lit("Infinity", JFloat(Double.PositiveInfinity))
        case '-' if i + 1 < s.length && s.charAt(i + 1) == 'I' =>
          lit("-Infinity", JFloat(Double.NegativeInfinity))
        case c if c == '-' || (c >= '0' && c <= '9') => number()
        case _ => err("Expecting value")
      }
    }

    private def number(): JVal = {
      val start = i
      if (i < s.length && s.charAt(i) == '-') i += 1
      // int part: 0 | [1-9][0-9]*
      if (i >= s.length) err("Expecting value")
      s.charAt(i) match {
        case '0' => i += 1
        case c if c >= '1' && c <= '9' =>
          while (i < s.length && s.charAt(i).isDigit) i += 1
        case _ => { i = start; err("Expecting value") }
      }
      var isInt = true
      if (i < s.length && s.charAt(i) == '.') {
        val dot = i; i += 1
        if (i >= s.length || !s.charAt(i).isDigit) { i = dot; failNumTail(start) }
        while (i < s.length && s.charAt(i).isDigit) i += 1
        isInt = false
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        val e = i; i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        if (i >= s.length || !s.charAt(i).isDigit) { i = e; failNumTail(start) }
        while (i < s.length && s.charAt(i).isDigit) i += 1
        isInt = false
      }
      val text = s.substring(start, i)
      if (isInt) JInt(BigInt(text)) else JFloat(java.lang.Double.parseDouble(text))
    }

    /** A malformed frac/exp tail: CPython's regex simply stops matching at
      * the int part, leaving '.'/'e' as trailing junk → "Extra data" at
      * top level, "Expecting ',' delimiter" inside containers. We surface
      * it as an error either way; the goldens only pin THAT it raises. */
    private def failNumTail(start: Int): Nothing = err("Extra data")

    private def hex4(): Char = {
      if (i + 4 > s.length) err("Invalid \\uXXXX escape")
      var v = 0
      var k = 0
      while (k < 4) {
        val c = s.charAt(i + k)
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else err("Invalid \\uXXXX escape")
        v = v * 16 + d
        k += 1
      }
      i += 4
      v.toChar
    }

    private def str(): String = {
      i += 1 // opening quote
      val sb = new StringBuilder
      while (true) {
        if (i >= s.length) err("Unterminated string starting at")
        val c = s.charAt(i)
        if (c == '"') { i += 1; return sb.toString }
        else if (c == '\\') {
          i += 1
          if (i >= s.length) err("Unterminated string starting at")
          s.charAt(i) match {
            case '"' => sb += '"'; i += 1
            case '\\' => sb += '\\'; i += 1
            case '/' => sb += '/'; i += 1
            case 'b' => sb += '\b'; i += 1
            case 'f' => sb += '\f'; i += 1
            case 'n' => sb += '\n'; i += 1
            case 'r' => sb += '\r'; i += 1
            case 't' => sb += '\t'; i += 1
            case 'u' => i += 1; sb += hex4() // raw code unit: pairs combine,
                                             // lone surrogates survive
            case _ => err("Invalid \\escape")
          }
        } else if (c < 0x20) err("Invalid control character at")
        else { sb += c; i += 1 }
      }
      sb.toString // unreachable
    }

    private def arr(): JVal = {
      i += 1; ws()
      if (i < s.length && s.charAt(i) == ']') { i += 1; return JArr(Vector.empty) }
      val items = Vector.newBuilder[JVal]
      while (true) {
        ws()
        items += value()
        ws()
        if (i >= s.length) err("Expecting ',' delimiter")
        s.charAt(i) match {
          case ']' => i += 1; return JArr(items.result())
          case ',' => i += 1
          case _ => err("Expecting ',' delimiter")
        }
      }
      JArr(items.result()) // unreachable
    }

    private def obj(): JVal = {
      i += 1; ws()
      if (i < s.length && s.charAt(i) == '}') { i += 1; return JObj(Vector.empty) }
      // first position, last value — CPython dict __setitem__
      val order = Vector.newBuilder[String]
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, JVal]
      while (true) {
        ws()
        if (i >= s.length || s.charAt(i) != '"')
          err("Expecting property name enclosed in double quotes")
        val k = str()
        ws()
        if (i >= s.length || s.charAt(i) != ':') err("Expecting ':' delimiter")
        i += 1; ws()
        val v = value()
        if (!seen.contains(k)) order += k
        seen(k) = v
        ws()
        if (i >= s.length) err("Expecting ',' delimiter")
        s.charAt(i) match {
          case '}' =>
            i += 1
            return JObj(order.result().map(k2 => (k2, seen(k2))))
          case ',' => i += 1
          case _ => err("Expecting ',' delimiter")
        }
      }
      JObj(Vector.empty) // unreachable
    }
  }
}
