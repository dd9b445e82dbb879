package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import graft.operators.{Py, PyPprint, PyRepr}
import Py._

/** Pins [[PyRepr]] (CPython `repr`) and [[PyPprint]] (CPython 3.11
  * `pprint.pformat`, PrettyPrinter defaults) byte-for-byte.
  *
  * The fixture `src/test/resources/pyprint_diff.json` is GENERATED from
  * CPython 3.11.7: 191 value trees (curated boundary shapes — width-80
  * edges, wrap quirks, sorted mixed-key dicts, byte wrapping — plus
  * seeded-random trees and feed-shaped items) each with the exact
  * `pprint.pformat` output as a codepoint array, and 1500 distinct doubles
  * with their exact `repr`. During development the same generator ran
  * differentially at 40k+ cases with zero mismatches (incl. the two
  * rounding-sensitive classes: astral-char column arithmetic and
  * same-length float candidates where Java's double-rounding `%e`
  * diverges from dtoa). Value-descriptor encoding matches
  * PySerialDiffSpec. */
class PyPprintSpec extends AnyFunSuite {

  private def toPy(n: JsonNode): Py = n.get("t").asText() match {
    case "none" => PyNone
    case "bool" => PyBool(n.get("v").asBoolean())
    case "int" => PyInt(BigInt(n.get("v").asText()))
    case "float" =>
      PyFloat(java.lang.Double.longBitsToDouble(
        java.lang.Long.parseUnsignedLong(n.get("bits").asText(), 16)))
    case "str" =>
      val sb = new java.lang.StringBuilder()
      n.get("cp").forEach(cp => sb.appendCodePoint(cp.asInt()))
      PyStr(sb.toString)
    case "bytes" =>
      val h = n.get("v").asText()
      PyBytes(Array.tabulate(h.length / 2)(i =>
        Integer.parseInt(h.substring(2 * i, 2 * i + 2), 16).toByte))
    case "list" =>
      val b = Vector.newBuilder[Py]; n.get("v").forEach(x => b += toPy(x))
      PyList(b.result())
    case "tuple" =>
      val b = Vector.newBuilder[Py]; n.get("v").forEach(x => b += toPy(x))
      PyTuple(b.result())
    case "dict" =>
      val b = Vector.newBuilder[(Py, Py)]
      n.get("v").forEach(kv => b += ((toPy(kv.get(0)), toPy(kv.get(1)))))
      PyDict(b.result())
  }

  private def cps(n: JsonNode): String = {
    val sb = new java.lang.StringBuilder()
    n.forEach(cp => sb.appendCodePoint(cp.asInt()))
    sb.toString
  }

  private lazy val fixture: JsonNode = {
    val in = getClass.getResourceAsStream("/pyprint_diff.json")
    assert(in != null, "fixture missing")
    try new ObjectMapper().readTree(in) finally in.close()
  }

  test("191 CPython-generated value trees pformat byte-identically") {
    var i = 0
    fixture.get("cases").forEach { c =>
      val v = toPy(c.get("value"))
      assert(PyPprint.pformat(v) === cps(c.get("pformat")), s"case $i")
      i += 1
    }
    assert(i === 191)
  }

  test("1500 CPython float reprs byte-identically") {
    var i = 0
    fixture.get("floats").forEach { c =>
      val d = java.lang.Double.longBitsToDouble(
        java.lang.Long.parseUnsignedLong(c.get("bits").asText(), 16))
      assert(PyRepr.floatRepr(d) === c.get("repr").asText(), s"float $i")
      i += 1
    }
    assert(i === 1500)
  }

  // ---- direct pins for the quirks the fixture exercises implicitly ------

  test("float repr formatting classes") {
    assert(PyRepr.floatRepr(0.0) === "0.0")
    assert(PyRepr.floatRepr(-0.0) === "-0.0")
    assert(PyRepr.floatRepr(1e22) === "1e+22")
    assert(PyRepr.floatRepr(1e16) === "1e+16")
    assert(PyRepr.floatRepr(1e15) === "1000000000000000.0")
    assert(PyRepr.floatRepr(1e-4) === "0.0001")
    assert(PyRepr.floatRepr(1e-5) === "1e-05")
    assert(PyRepr.floatRepr(0.1) === "0.1")
    assert(PyRepr.floatRepr(Double.PositiveInfinity) === "inf")
    assert(PyRepr.floatRepr(Double.NegativeInfinity) === "-inf")
    assert(PyRepr.floatRepr(Double.NaN) === "nan")
    assert(PyRepr.floatRepr(5e-324) === "5e-324")
    assert(PyRepr.floatRepr(1.7976931348623157e308) === "1.7976931348623157e+308")
    // the Java-%e double-rounding victim: exact value rounds DOWN at 16
    // digits (….998464 → ….998), and ties-to-even picks the CPython digits
    assert(PyRepr.floatRepr(
      java.lang.Double.longBitsToDouble(0x43d42594759367efL)) ===
      "5.806918750407998e+18")
  }

  test("str repr quoting and escapes") {
    assert(PyRepr.strRepr("plain") === "'plain'")
    assert(PyRepr.strRepr("it's") === "\"it's\"")
    assert(PyRepr.strRepr("both'\"") === "'both\\'\"'")
    assert(PyRepr.strRepr("a\tb\nc\\d") === "'a\\tb\\nc\\\\d\\x07'")
    assert(PyRepr.strRepr("\u00ad\u200b\u2028") === "'\\xad\\u200b\\u2028'")
    assert(PyRepr.strRepr(new String(Character.toChars(0x1d11e))) ===
      "'" + new String(Character.toChars(0x1d11e)) + "'") // printable astral, raw
  }

  test("bytes repr") {
    assert(PyRepr.bytesRepr("ab'c".getBytes) === "b\"ab'c\"")
    // contains ' and no " → double-quoted, the ' unescaped
    assert(PyRepr.bytesRepr(Array[Byte](0, 9, 10, 13, 0x5c, 0x27, 0x7e, -1)) ===
      "b\"\\x00\\t\\n\\r\\\\'~\\xff\"")
  }

  test("sorted-dict repr and safe-key mixed types") {
    val d = PyDict(Vector(
      (PyStr("b"), Py.int(2)), (PyStr("a"), Py.int(1))))
    assert(PyRepr.repr(d) === "{'a': 1, 'b': 2}")
    // int keys before str keys via the (str(type), id) typename fallback
    val m = PyDict(Vector((PyStr("s"), PyNone), (Py.int(3), PyNone)))
    assert(PyRepr.repr(m) === "{3: None, 's': None}")
    // equal-prefix tuples compare by length, like Python
    val pfx = PyDict(Vector(
      (PyTuple(Vector(PyNone, PyNone)), Py.int(2)),
      (PyTuple(Vector(PyNone)), Py.int(1))))
    assert(PyRepr.repr(pfx) === "{(None,): 1, (None, None): 2}")
    // same-typename unorderable keys are CPython-id-dependent: unsupported
    val bad = PyDict(Vector(
      (PyTuple(Vector(PyNone)), Py.int(1)),
      (PyTuple(Vector(Py.int(1))), Py.int(2))))
    intercept[IllegalArgumentException] { PyRepr.repr(bad) }
  }

  test("singleton tuple keeps the trailing comma when wrapped") {
    val t = PyTuple(Vector(PyStr("t" * 100)))
    val out = PyPprint.pformat(t)
    assert(out.startsWith("('tttt"))
    assert(out.endsWith(",)"))
  }

  test("scalars never wrap, however long") {
    val n = PyInt(BigInt("9" * 120))
    assert(PyPprint.pformat(n) === "9" * 120)
  }

  test("top-level long strings parenthesize; nested ones do not") {
    val s = PyStr(("word " * 40).trim)
    val top = PyPprint.pformat(s)
    assert(top.startsWith("('word") && top.endsWith("')"))
    val nested = PyPprint.pformat(PyDict(Vector((PyStr("k"), s))))
    assert(nested.startsWith("{'k': 'word") && !nested.contains("("))
  }

  test("pformat equals repr when it fits in 80 columns") {
    val v = PyDict(Vector((PyStr("k"), PyList(Vector(Py.int(1), Py.int(2))))))
    assert(PyPprint.pformat(v) === PyRepr.repr(v))
    assert(PyPprint.pformat(v) === "{'k': [1, 2]}")
  }

  test("exportLine is pformat + newline in UTF-8") {
    val item = PyDict(Vector((PyStr("caption"), PyStr("中文"))))
    assert(new String(PyPprint.exportLine(item), "UTF-8") ===
      "{'caption': '中文'}\n")
  }
}
