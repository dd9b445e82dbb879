package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Pickle, Py, PyMarshal}
import Py._

/** Golden battery for the CPython pickle-protocol-4 / marshal-version-4
  * writers. Expected bytes generated from CPython 3.11.7 with runtime-fresh
  * construction — `pickle.dumps(make(), 4)` / `marshal.dumps(make())` where
  * `make()` returns a new dict each call, keys are `sys.intern`ed, and
  * values are built by parsing (never shared constants) — i.e. exactly the
  * object shape `dict(exporter._get_serialized_fields(item))` has inside
  * the reference's PickleItemExporter/MarshalItemExporter
  * (`scrapy/exporters.py:297-322`). */
class PySerialSpec extends AnyFunSuite {

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString
  private def sha256(b: Array[Byte]): String =
    hex(java.security.MessageDigest.getInstance("SHA-256").digest(b))

  private def key(s: String) = PyStr(s, interned = true)
  private def d(items: (String, Py)*) = PyDict(items.map { case (k, v) => (key(k): Py, v) })

  private def checkHex(obj: Py, pickleHex: String, marshalHex: String): Unit = {
    assert(hex(Pickle.dumps(obj)) === pickleHex)
    assert(hex(PyMarshal.dumps(obj)) === marshalHex)
  }

  test("empty dict") {
    checkHex(d(), "80047d942e", "7b30")
  }

  test("one item — SETITEM, no MARK; frame header") {
    checkHex(d("url" -> PyStr("http://example.org/")),
      "80049520000000000000007d948c0375726c948c13687474703a2f2f6578616d706c652e6f72672f94732e",
      "7bda0375726c7a13687474703a2f2f6578616d706c652e6f72672f30")
  }

  test("two items — MARK/SETITEMS; small-int cache flagged in marshal") {
    checkHex(d("a" -> Py.int(1), "b" -> PyStr("xy")),
      "80049514000000000000007d94288c0161944b018c0162948c02787994752e",
      "7bda0161e901000000da01627a02787930")
  }

  test("repeated cached int — pickle repeats opcode, marshal emits TYPE_REF") {
    checkHex(d("a" -> Py.int(1), "b" -> Py.int(1)),
      "80049511000000000000007d94288c0161944b018c0162944b01752e",
      "7bda0161e901000000da0162720100000030")
  }

  test("repeated uncached int (257) — no sharing on either side") {
    checkHex(d("a" -> Py.int(257), "b" -> Py.int(257)),
      "80049513000000000000007d94288c0161944d01018c0162944d0101752e",
      "7bda01616901010000da0162690101000030")
  }

  test("interned key reused as value — pickle BINGET, marshal ref 0") {
    checkHex(PyDict(Seq((key("a"), key("a")))),
      "8004950a000000000000007d948c0161946801732e",
      "7bda0161720000000030")
  }

  test("1-char ascii values are cached singletons (non-interned in marshal)") {
    checkHex(d("a" -> PyStr("x"), "b" -> PyStr("x")),
      "80049513000000000000007d94288c0161948c0178948c0162946802752e",
      "7bda0161fa0178da0162720100000030")
  }

  test("1-char latin1 value — cached, marshal TYPE_UNICODE flagged") {
    checkHex(d("a" -> PyStr("é"), "b" -> PyStr("é")),
      "80049514000000000000007d94288c0161948c02c3a9948c0162946802752e",
      "7bda0161f502000000c3a9da0162720100000030")
  }

  test("1-char CJK value — NOT cached, repeats verbatim") {
    checkHex(d("a" -> PyStr("漢"), "b" -> PyStr("漢")),
      "80049519000000000000007d94288c0161948c03e6bca2948c0162948c03e6bca294752e",
      "7bda01617503000000e6bca2da01627503000000e6bca230")
  }

  test("empty strings are interned singletons") {
    checkHex(d("e" -> PyStr(""), "f" -> PyStr("")),
      "80049512000000000000007d94288c0165948c00948c0166946802752e",
      "7bda0165da00da0166720100000030")
  }

  test("mixed list — MARK/APPENDS, None/True/False opcodes") {
    checkHex(d("k" -> PyList(Seq(PyStr("u1"), PyStr("u2"), Py.int(3), PyNone,
        PyBool(true), PyBool(false)))),
      "8004951b000000000000007d948c016b945d94288c027531948c027532944b034e888965732e",
      "7bda016b5b060000007a0275317a027532e9030000004e544630")
  }

  test("single-element list — APPEND without MARK") {
    checkHex(d("l" -> PyList(Seq(PyStr("only")))),
      "80049512000000000000007d948c016c945d948c046f6e6c799461732e",
      "7bda016c5b010000007a046f6e6c7930")
  }

  test("empty list") {
    checkHex(d("l" -> PyList(Nil)),
      "8004950a000000000000007d948c016c945d94732e",
      "7bda016c5b0000000030")
  }

  test("small bytes — SHORT_BINBYTES / unflagged TYPE_STRING") {
    checkHex(d("body" -> PyBytes(Array[Byte](0, 1, -1, 'a', 'b', 'c'))),
      "80049514000000000000007d948c04626f64799443060001ff61626394732e",
      "7bda04626f647973060000000001ff61626330")
  }

  test("empty bytes are a shared singleton") {
    checkHex(d("b1" -> PyBytes(Array.empty), "b2" -> PyBytes(Array.empty)),
      "80049514000000000000007d94288c026231944300948c026232946802752e",
      "7bda026231f300000000da026232720100000030")
  }

  test("floats — BINFLOAT big-endian / marshal little-endian, unflagged") {
    checkHex(d("f" -> PyFloat(3.5), "g" -> PyFloat(-0.1), "h" -> PyFloat(1e308)),
      "8004952c000000000000007d94288c01669447400c0000000000008c01679447bfb999999999999a8c016894477fe1ccf385ebc8a0752e",
      "7bda0166670000000000000c40da0167679a9999999999b9bfda016867a0c8eb85f3cce17f30")
  }

  test("int encodings across every width boundary") {
    checkHex(d(
        "i0" -> Py.int(0), "i1" -> Py.int(255), "i2" -> Py.int(256),
        "i3" -> Py.int(65535), "i4" -> Py.int(65536), "i5" -> Py.int(-1),
        "i6" -> Py.int(2147483647), "i7" -> Py.int(-2147483648L),
        "i8" -> Py.int(2147483648L), "i9" -> Py.int(Long.MaxValue),
        "ia" -> Py.int(Long.MinValue),
        "ib" -> PyInt(BigInt(2).pow(70)), "ic" -> PyInt(-BigInt(2).pow(70))),
      "80049595000000000000007d94288c026930944b008c026931944bff8c026932944d00018c026933944dffff8c026934944a000001008c026935944affffffff8c026936944affffff7f8c026937944a000000808c026938948a0500000080008c026939948a08ffffffffffffff7f8c026961948a0800000000000000808c026962948a090000000000000000408c026963948a090000000000000000c0752e",
      "7bda026930e900000000da026931e9ff000000da026932e900010000da02693369ffff0000da0269346900000100da026935e9ffffffffda02693669ffffff7fda0269376900000080da0269386c03000000000000000200da0269396c05000000ff7fff7fff7fff7f0700da0269616cfbffffff00000000000000000800da0269626c0500000000000000000000000004da0269636cfbffffff0000000000000000000430")
  }

  test("320-char ascii string — BINUNICODE / TYPE_ASCII") {
    val v = "abcdefgh" * 40
    val body = hex(v.getBytes("US-ASCII"))
    checkHex(d("s" -> PyStr(v)),
      "8004954e010000000000007d948c01739458400100" + "00" + body + "94732e",
      "7bda01736140010000" + body + "30")
  }

  test("non-ascii unicode — utf8 byte length") {
    checkHex(d("u" -> PyStr("héllo — ✓ 漢字")),
      "80049520000000000000007d948c0175948c1568c3a96c6c6f20e2809420e29c9320e6bca2e5ad9794732e",
      "7bda0175751500000068c3a96c6c6f20e2809420e29c9320e6bca2e5ad9730")
  }

  test("tuple — TUPLE3 + memoize / TYPE_SMALL_TUPLE") {
    checkHex(d("t" -> PyTuple(Seq(Py.int(1), PyStr("a2"), PyNone))),
      "80049512000000000000007d948c0174944b018c026132944e8794732e",
      "7bda01742903e9010000007a0261324e30")
  }

  test("nested dict/list/dict — SETITEM chain, NULL terminators") {
    checkHex(d("d" -> PyDict(Seq((key("x"),
        PyList(Seq(PyDict(Seq((key("y"), Py.int(2)))))))))),
      "8004951b000000000000007d948c0164947d948c0178945d947d948c0179944b02736173732e",
      "7bda01647bda01785b010000007bda0179e902000000303030")
  }

  // ── large payloads: pickle out-of-frame writes, multi-frame splits ──

  private def checkBig(obj: Py, pickleSha: String, pickleLen: Int,
      marshalSha: String, marshalLen: Int): Unit = {
    val p = Pickle.dumps(obj)
    assert((sha256(p), p.length) === ((pickleSha, pickleLen)))
    val m = PyMarshal.dumps(obj)
    assert((sha256(m), m.length) === ((marshalSha, marshalLen)))
  }

  test("70000-byte bytes — BINBYTES written outside the frame") {
    checkBig(d("data" -> PyBytes(Array.fill[Byte](70000)('Z'))),
      "b58b9ec3704616d939e2e9f3af78a5517411f19aa2e43999b193686a3b5c1808", 70028,
      "1ca11ab8ce523c6191e03d6cfd0a4deb564994af0f6ce266087f2990e789a9fd", 70013)
  }

  test("70000-char string — BINUNICODE written outside the frame") {
    checkBig(d("data" -> PyStr("Z" * 70000)),
      "aa1ca5c6aaef4332e9db2c304f7898dfac09dec2da79f22df9f435f806ef79dd", 70028,
      "4fba1a672a82b89d799fbd4eb2b5674afb04eed1b90dc721094564575de3cc0b", 70013)
  }

  test("3000-element list — APPENDS batching at 1000 + multi-frame output") {
    val items = (0 until 3000).map(i => PyStr(f"http://host$i%04d.example/p/$i%06d"))
    checkBig(d("rows" -> PyList(items)),
      "2d0a228b80bd8ca5635d0f67c427290492e0d2e8a621d689135888e0d969fe76", 105039,
      "6b155c1fbaf39d3707989123c9eaf06fb06be3193dc88bf09a85123ee5f6cbba", 102013)
  }
}
