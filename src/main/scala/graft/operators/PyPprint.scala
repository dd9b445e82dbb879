package graft.operators

import graft.operators.Py._

/** CPython `repr()` for the [[Py]] value tree — the text layer under
  * [[PyPprint]] (pprint.pformat) and the PprintItemExporter feed format.
  *
  * Semantics modeled from CPython 3.11 (`Objects/unicodeobject.c
  * unicode_repr`, `Objects/bytesobject.c`, `Python/pystrtod.c
  * format_float_short`, `Lib/pprint.py _safe_repr`):
  *
  *  - str: quote `'` unless the string contains `'` and no `"`;
  *    `\\`/quote/`\n`/`\r`/`\t` escapes; non-printable code points
  *    (categories Cc Cf Cs Co Cn Zl Zp Zs, except U+0020) render
  *    `\xXX` / `\uXXXX` / `\UXXXXXXXX` by magnitude.
  *  - bytes: `b'...'` with the same quote rule over raw bytes;
  *    0x20–0x7e literal, `\t\n\r` named, the rest `\xXX`.
  *  - float: shortest round-trip digits; fixed notation for decimal
  *    exponent in [-4, 16), else `de±XX` scientific with a ≥2-digit
  *    exponent; `-0.0`, `inf`, `nan` like CPython (NOT Java's
  *    `Infinity`/`NaN`). Shortest digits are found by precision probing
  *    (`%.{p}e` round-trip), which agrees with CPython's dtoa mode 0:
  *    an exact-tie rounding never survives the round-trip gate, so the
  *    Java/CPython rounding-mode difference is unobservable.
  *  - dict: insertion order is NOT kept — `sort_dicts=True` semantics,
  *    items sorted by `_safe_key` on the key (values are never compared:
  *    dict keys are unique). Mixed-type keys fall back to the
  *    `(str(type), id)` comparison; the id leg is nondeterministic in
  *    CPython and unsupported here (same-typename incomparable keys throw).
  *
  * Every branch is pinned by PyPprintSpec's CPython-generated battery.
  */
object PyRepr {

  def repr(v: Py): String = v match {
    case PyNone => "None"
    case PyBool(b) => if (b) "True" else "False"
    case PyInt(n) => n.toString
    case PyFloat(d) => floatRepr(d)
    case PyStr(s, _) => strRepr(s)
    case PyBytes(b) => bytesRepr(b)
    case PyList(xs) => xs.map(repr).mkString("[", ", ", "]")
    case PyTuple(xs) =>
      if (xs.length == 1) "(" + repr(xs.head) + ",)"
      else xs.map(repr).mkString("(", ", ", ")")
    case d: PyDict =>
      sortedItems(d).map { case (k, x) => repr(k) + ": " + repr(x) }
        .mkString("{", ", ", "}")
  }

  /** `sorted(object.items(), key=_safe_tuple)` — stable sort by the key's
    * `_safe_key` order (the value leg of `_safe_tuple` only breaks ties
    * between EQUAL keys, which a dict cannot contain). */
  def sortedItems(d: PyDict): Seq[(Py, Py)] =
    d.v.sortWith((a, b) => safeKeyLt(a._1, b._1))

  /** `_safe_key.__lt__`: Python `<` where defined, else the
    * `(str(type), id)` fallback — deterministic only when the type names
    * differ, which is the supported (and golden-pinned) domain. */
  def safeKeyLt(a: Py, b: Py): Boolean = pyLt(a, b) match {
    case Some(r) => r
    case None =>
      val (ta, tb) = (typeName(a), typeName(b))
      if (ta == tb)
        throw new IllegalArgumentException(
          s"unorderable same-type dict keys (id-dependent in CPython): $ta")
      ta < tb
  }

  private def typeName(v: Py): String = v match {
    case PyNone => "<class 'NoneType'>"
    case _: PyBool => "<class 'bool'>"
    case _: PyInt => "<class 'int'>"
    case _: PyFloat => "<class 'float'>"
    case _: PyStr => "<class 'str'>"
    case _: PyBytes => "<class 'bytes'>"
    case _: PyList => "<class 'list'>"
    case _: PyTuple => "<class 'tuple'>"
    case _: PyDict => "<class 'dict'>"
  }

  /** Python `a < b` on the Py subset; None = TypeError (unorderable). */
  def pyLt(a: Py, b: Py): Option[Boolean] = (a, b) match {
    case (x, y) if isNumeric(x) && isNumeric(y) => Some(numLt(x, y))
    case (PyStr(x, _), PyStr(y, _)) => Some(cpCompare(x, y) < 0)
    case (PyBytes(x), PyBytes(y)) =>
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return Some(c < 0)
        i += 1
      }
      Some(x.length < y.length)
    case (PyList(x), PyList(y)) => seqLt(x, y)
    case (PyTuple(x), PyTuple(y)) => seqLt(x, y)
    case _ => None
  }

  private def seqLt(x: Seq[Py], y: Seq[Py]): Option[Boolean] = {
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      if (!pyEq(x(i), y(i))) return pyLt(x(i), y(i))
      i += 1
    }
    Some(x.length < y.length)
  }

  /** Python `==` on the comparable subset (numeric cross-type, str, bytes,
    * same-type sequences). Only consulted by sequence ordering. */
  def pyEq(a: Py, b: Py): Boolean = (a, b) match {
    case (x, y) if isNumeric(x) && isNumeric(y) => numEq(x, y)
    case (PyStr(x, _), PyStr(y, _)) => x == y
    case (PyBytes(x), PyBytes(y)) => java.util.Arrays.equals(x, y)
    case (PyList(x), PyList(y)) =>
      x.length == y.length && x.indices.forall(i => pyEq(x(i), y(i)))
    case (PyTuple(x), PyTuple(y)) =>
      x.length == y.length && x.indices.forall(i => pyEq(x(i), y(i)))
    case (PyNone, PyNone) => true
    case _ => false
  }

  private def isNumeric(v: Py): Boolean = v match {
    case _: PyBool | _: PyInt | _: PyFloat => true
    case _ => false
  }

  private def numLt(a: Py, b: Py): Boolean = (a, b) match {
    case (PyFloat(x), PyFloat(y)) => x < y
    case (PyFloat(x), _) => !x.isNaN && floatVsInt(x, intVal(b)) < 0
    case (_, PyFloat(y)) => !y.isNaN && floatVsInt(y, intVal(a)) > 0
    case _ => intVal(a) < intVal(b)
  }

  private def numEq(a: Py, b: Py): Boolean = (a, b) match {
    case (PyFloat(x), PyFloat(y)) => x == y
    case (PyFloat(x), _) => !x.isNaN && !x.isInfinite && floatVsInt(x, intVal(b)) == 0
    case (_, PyFloat(y)) => !y.isNaN && !y.isInfinite && floatVsInt(y, intVal(a)) == 0
    case _ => intVal(a) == intVal(b)
  }

  private def intVal(v: Py): BigInt = v match {
    case PyBool(b) => if (b) BigInt(1) else BigInt(0)
    case PyInt(n) => n
    case _ => throw new IllegalStateException
  }

  /** Exact float-vs-BigInt comparison (sign of x − n); x finite or ±inf. */
  private def floatVsInt(x: Double, n: BigInt): Int = {
    if (x.isPosInfinity) return 1
    if (x.isNegInfinity) return -1
    BigDecimal.exact(x).compare(BigDecimal.exact(n))
  }

  /** Code-point (not UTF-16 code-unit) string comparison, like CPython. */
  private def cpCompare(x: String, y: String): Int = {
    var i = 0
    var j = 0
    while (i < x.length && j < y.length) {
      val a = x.codePointAt(i)
      val b = y.codePointAt(j)
      if (a != b) return Integer.compare(a, b)
      i += Character.charCount(a)
      j += Character.charCount(b)
    }
    Integer.compare(x.length - i, y.length - j)
  }

  // ------------------------------------------------------------------ str

  def strRepr(s: String): String = {
    val quote =
      if (s.indexOf('\'') >= 0 && s.indexOf('"') < 0) '"' else '\''
    val sb = new StringBuilder(s.length + 2)
    sb += quote
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cp match {
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case _ if cp == quote => sb += '\\' += quote
        case _ if isPrintable(cp) => sb.appendAll(Character.toChars(cp))
        case _ if cp < 0x100 => sb ++= f"\\x$cp%02x"
        case _ if cp < 0x10000 => sb ++= f"\\u$cp%04x"
        case _ => sb ++= f"\\U$cp%08x"
      }
      i += Character.charCount(cp)
    }
    sb += quote
    sb.toString
  }

  /** `str.isprintable` per code point: everything except categories
    * Cc Cf Cs Co Cn Zl Zp Zs, with U+0020 printable. (Java 17 carries
    * Unicode 13 vs CPython 3.11's 14 — codepoints assigned in between
    * differ; the golden battery sticks to stable ranges.) */
  def isPrintable(cp: Int): Boolean = {
    if (cp == 0x20) return true
    Character.getType(cp) match {
      case Character.CONTROL | Character.FORMAT | Character.SURROGATE |
          Character.PRIVATE_USE | Character.UNASSIGNED |
          Character.LINE_SEPARATOR | Character.PARAGRAPH_SEPARATOR |
          Character.SPACE_SEPARATOR => false
      case _ => true
    }
  }

  // ---------------------------------------------------------------- bytes

  def bytesRepr(b: Array[Byte]): String = {
    var hasSingle = false
    var hasDouble = false
    b.foreach { x =>
      if (x == '\'') hasSingle = true else if (x == '"') hasDouble = true
    }
    val quote = if (hasSingle && !hasDouble) '"' else '\''
    val sb = new StringBuilder(b.length + 3)
    sb += 'b' += quote
    b.foreach { x =>
      val c = x & 0xff
      c match {
        case '\\' => sb ++= "\\\\"
        case '\t' => sb ++= "\\t"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case _ if c == quote => sb += '\\' += quote
        case _ if c >= 0x20 && c <= 0x7e => sb += c.toChar
        case _ => sb ++= f"\\x$c%02x"
      }
    }
    sb += quote
    sb.toString
  }

  // ---------------------------------------------------------------- float

  def floatRepr(d: Double): String = {
    if (d.isNaN) return "nan"
    if (d.isPosInfinity) return "inf"
    if (d.isNegInfinity) return "-inf"
    if (d == 0.0d)
      return if (1.0 / d < 0) "-0.0" else "0.0"
    // Shortest round-trip digits, CORRECTLY rounded from the exact binary
    // value with ties-to-even, like CPython's dtoa. (Java's `%e` formatter
    // double-rounds — it re-rounds the Double.toString digit string with
    // HALF_UP — and picks a different same-length candidate for values
    // where two p-digit decimals both round-trip.)
    val exact = new java.math.BigDecimal(d)
    var p = 1
    var bd: java.math.BigDecimal = null
    var done = false
    while (!done) {
      bd = exact.round(new java.math.MathContext(
        p, java.math.RoundingMode.HALF_EVEN))
      if (java.lang.Double.doubleToLongBits(
            java.lang.Double.parseDouble(bd.toString)) ==
          java.lang.Double.doubleToLongBits(d)) done = true
      else p += 1
    }
    val unscaled = bd.unscaledValue.abs.toString
    val exp = (unscaled.length - 1) - bd.scale
    val digits = {
      val t = unscaled.reverse.dropWhile(_ == '0').reverse
      if (t.isEmpty) "0" else t // minimal p never keeps trailing zeros
    }
    val sign = if (d < 0) "-" else ""
    if (exp >= -4 && exp < 16) {
      // fixed notation, always with a fractional part
      if (exp >= digits.length - 1)
        sign + digits + "0" * (exp - (digits.length - 1)) + ".0"
      else if (exp >= 0)
        sign + digits.substring(0, exp + 1) + "." + digits.substring(exp + 1)
      else
        sign + "0." + "0" * (-exp - 1) + digits
    } else {
      val mant =
        if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      val es = if (exp < 0) "-" else "+"
      val ea = math.abs(exp)
      sign + mant + "e" + es + (if (ea < 10) "0" + ea else ea.toString)
    }
  }
}

/** CPython 3.11 `pprint.pformat` (width=80, indent=1, compact=False,
  * sort_dicts=True, depth=None — the PrettyPrinter defaults) over the
  * [[Py]] value tree, byte-exact, incl. the reference-visible quirks:
  *
  *  - a container whose single-line repr exceeds `width − indent −
  *    allowance` breaks one item per line at `indent + 1`;
  *  - dict entries indent continuation by `len(repr(key)) + 2`;
  *  - singleton tuples keep the trailing `(x,)` comma and reserve 2
  *    allowance columns for `,)`;
  *  - long strings re-wrap per `splitlines(keepends=True)` line on
  *    `\S*\s*` word boundaries, parenthesized only at top level, and the
  *    single-chunk path writes the LAST line's repr (the CPython loop-
  *    variable leak in `_pprint_str`);
  *  - bytes wrap in 4-byte groups, and the `len % 4 == 0` case never
  *    subtracts the allowance (faithful to `_wrap_bytes_repr`'s
  *    `last = len // 4 * 4` bound that `range` cannot reach);
  *  - scalars never wrap (no dispatch entry), however long.
  *
  * Backs the PprintItemExporter feed format (`exporters.py:325-332`:
  * `pprint.pformat(itemdict) + "\n"`); pinned by PyPprintSpec's
  * CPython-generated differential battery.
  */
object PyPprint {

  def pformat(obj: Py, width: Int = 80, indent: Int = 1): String = {
    val sb = new StringBuilder
    new Printer(width, indent, sb).format(obj, 0, 0, 0)
    sb.toString
  }

  /** Python `len()` of a repr string — code points, not UTF-16 units
    * (printable astral chars render raw and count 1 column in CPython's
    * width arithmetic). */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** PprintItemExporter line for one item: `to_bytes(pformat(d) + "\n")`. */
  def exportLine(item: Py): Array[Byte] =
    (pformat(item) + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)

  private final class Printer(width: Int, indentPerLevel: Int,
      sb: StringBuilder) {

    def format(obj: Py, indent: Int, allowance: Int, level: Int): Unit = {
      val rep = PyRepr.repr(obj)
      if (cpLen(rep) > width - indent - allowance) obj match {
        case d: PyDict => pprintDict(d, indent, allowance, level + 1)
        case PyList(xs) =>
          sb += '['
          formatItems(xs, indent, allowance + 1, level + 1)
          sb += ']'
        case PyTuple(xs) =>
          sb += '('
          val endchar = if (xs.length == 1) ",)" else ")"
          formatItems(xs, indent, allowance + endchar.length, level + 1)
          sb ++= endchar
        case PyStr(s, _) => pprintStr(s, indent, allowance, level + 1)
        case PyBytes(b) => pprintBytes(b, indent, allowance, level + 1)
        case _ => sb ++= rep // scalars have no dispatch entry
      }
      else sb ++= rep
    }

    private def pprintDict(d: PyDict, indent: Int, allowance: Int,
        level: Int): Unit = {
      sb += '{'
      if (indentPerLevel > 1) sb ++= " " * (indentPerLevel - 1)
      if (d.v.nonEmpty)
        formatDictItems(PyRepr.sortedItems(d), indent, allowance + 1, level)
      sb += '}'
    }

    private def formatDictItems(items: Seq[(Py, Py)], indent0: Int,
        allowance: Int, level: Int): Unit = {
      val indent = indent0 + indentPerLevel
      val delimnl = ",\n" + " " * indent
      val lastIndex = items.length - 1
      items.zipWithIndex.foreach { case ((k, ent), i) =>
        val last = i == lastIndex
        val rep = PyRepr.repr(k)
        sb ++= rep ++= ": "
        format(ent, indent + cpLen(rep) + 2, if (last) allowance else 1, level)
        if (!last) sb ++= delimnl
      }
    }

    private def formatItems(items: Seq[Py], indent0: Int, allowance: Int,
        level: Int): Unit = {
      val indent = indent0 + indentPerLevel
      if (indentPerLevel > 1) sb ++= " " * (indentPerLevel - 1)
      val delimnl = ",\n" + " " * indent
      val lastIndex = items.length - 1
      items.zipWithIndex.foreach { case (ent, i) =>
        if (i > 0) sb ++= delimnl
        format(ent, indent, if (i == lastIndex) allowance else 1, level)
      }
    }

    private def pprintStr(s: String, indent0: Int, allowance0: Int,
        level: Int): Unit = {
      if (s.isEmpty) { sb ++= PyRepr.strRepr(s); return }
      var indent = indent0
      var allowance = allowance0
      if (level == 1) { indent += 1; allowance += 1 }
      val lines = pySplitLinesKeepEnds(s)
      val chunks = scala.collection.mutable.ArrayBuffer.empty[String]
      val maxWidth = width - indent
      var maxWidth1 = maxWidth
      var lastLineRep: String = null
      lines.zipWithIndex.foreach { case (line, i) =>
        val rep = PyRepr.strRepr(line)
        lastLineRep = rep
        if (i == lines.length - 1) maxWidth1 -= allowance
        if (cpLen(rep) <= maxWidth1) chunks += rep
        else {
          // alternating (non-space, space) parts, like re.findall(r'\S*\s*')
          val parts = wordParts(line)
          var maxWidth2 = maxWidth
          var current = ""
          parts.zipWithIndex.foreach { case (part, j) =>
            val candidate = current + part
            if (j == parts.length - 1 && i == lines.length - 1)
              maxWidth2 -= allowance
            if (cpLen(PyRepr.strRepr(candidate)) > maxWidth2) {
              if (current.nonEmpty) chunks += PyRepr.strRepr(current)
              current = part
            } else current = candidate
          }
          if (current.nonEmpty) chunks += PyRepr.strRepr(current)
        }
      }
      if (chunks.length == 1) { sb ++= lastLineRep; return }
      if (level == 1) sb += '('
      chunks.zipWithIndex.foreach { case (rep, i) =>
        if (i > 0) sb ++= "\n" + " " * indent
        sb ++= rep
      }
      if (level == 1) sb += ')'
    }

    private def pprintBytes(b: Array[Byte], indent0: Int, allowance0: Int,
        level: Int): Unit = {
      if (b.length <= 4) { sb ++= PyRepr.bytesRepr(b); return }
      var indent = indent0
      var allowance = allowance0
      val parens = level == 1
      if (parens) { indent += 1; allowance += 1; sb += '(' }
      var delim = ""
      wrapBytesRepr(b, width - indent, allowance).foreach { rep =>
        sb ++= delim ++= rep
        if (delim.isEmpty) delim = "\n" + " " * indent
      }
      if (parens) sb += ')'
    }
  }

  /** `_wrap_bytes_repr`: 4-byte groups greedily packed per line; the
    * allowance is subtracted when the group STARTING at `len // 4 * 4`
    * is processed — unreachable when the length is a multiple of 4,
    * exactly like the CPython generator. */
  private def wrapBytesRepr(b: Array[Byte], width0: Int,
      allowance: Int): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var width = width0
    var current = Array.emptyByteArray
    val last = b.length / 4 * 4
    var i = 0
    while (i < b.length) {
      val part = java.util.Arrays.copyOfRange(b, i, math.min(i + 4, b.length))
      val candidate = current ++ part
      if (i == last) width -= allowance
      if (PyRepr.bytesRepr(candidate).length > width) {
        if (current.nonEmpty) out += PyRepr.bytesRepr(current)
        current = part
      } else current = candidate
      i += 4
    }
    if (current.nonEmpty) out += PyRepr.bytesRepr(current)
    out.toSeq
  }

  /** `str.splitlines(keepends=True)` — the full CPython line-break set
    * (\n \r \r\n \v \f \x1c \x1d \x1e \x85    ). */
  def pySplitLinesKeepEnds(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var start = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isLineBreak(c)) {
        var end = i + 1
        if (c == '\r' && end < s.length && s.charAt(end) == '\n') end += 1
        out += s.substring(start, end)
        start = end
        i = end
      } else i += 1
    }
    if (start < s.length) out += s.substring(start)
    out.result()
  }

  private def isLineBreak(c: Char): Boolean = c.toInt match {
    case 0x0a | 0x0d | 0x0b | 0x0c | 0x1c | 0x1d | 0x1e |
        0x85 | 0x2028 | 0x2029 => true
    case _ => false
  }

  /** `re.findall(r'\S*\s*', line)` with the trailing empty match dropped:
    * greedy runs of non-space then space, Python `str`-mode `\s`. */
  private def wordParts(line: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < line.length) {
      val start = i
      while (i < line.length && !isPySpace(line.charAt(i))) i += 1
      while (i < line.length && isPySpace(line.charAt(i))) i += 1
      out += line.substring(start, i)
    }
    out.result()
  }

  /** Python `str.isspace` / re `\s` set (stable across Unicode versions). */
  private def isPySpace(c: Char): Boolean = c.toInt match {
    case 0x20 | 0x09 | 0x0a | 0x0d | 0x0c | 0x0b => true
    case 0x1c | 0x1d | 0x1e | 0x1f | 0x85 => true
    case 0xa0 | 0x1680 | 0x2028 | 0x2029 | 0x202f | 0x205f | 0x3000 => true
    case x if x >= 0x2000 && x <= 0x200a => true
    case _ => false
  }
}
