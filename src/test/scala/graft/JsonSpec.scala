package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Json
import graft.extract.Json._

/** Golden battery for [[graft.extract.Json]] — every expected value below
  * was GENERATED with CPython 3 `json.loads` (see the canon encoding in the
  * doc comment) and hard-coded, the FingerprintSpec pinning pattern. The
  * headline case is the reference's own `tests/test_http_response.py
  * test_json_response` fixture.
  *
  * canon encoding (mirrors the Python generator exactly):
  * null/true/false literal; `int:<decimal>`; `flt:<16-hex IEEE-754 bits>`
  * (canonical NaN); `str:<hex UTF-16BE code units, surrogatepass>`;
  * `[a,b]`; `{key=val,...}` in dict order (first key position, last value).
  */
class JsonSpec extends AnyFunSuite {

  private def canon(v: JVal): String = v match {
    case JNull => "null"
    case JBool(b) => if (b) "true" else "false"
    case JInt(n) => s"int:$n"
    case JFloat(d) => f"flt:${java.lang.Double.doubleToLongBits(d)}%016x"
    case JStr(s) => "str:" + s.map(c => f"${c.toInt}%04x").mkString
    case JArr(items) => items.map(canon).mkString("[", ",", "]")
    case JObj(fields) =>
      fields.map { case (k, x) => canon(JStr(k)) + "=" + canon(x) }
        .mkString("{", ",", "}")
  }

  test("CPython json.loads value goldens") {
    val golden: Seq[(String, String)] = Seq(
      // the reference test_json_response fixture
      "{\"ip\": \"109.187.217.200\"}" ->
        "{str:00690070=str:003100300039002e003100380037002e003200310037002e003200300030}",
      "  [1, 2.5, -3, 1e3, -0.0, 1E+2, 4e-2] " ->
        "[int:1,flt:4004000000000000,int:-3,flt:408f400000000000,flt:8000000000000000,flt:4059000000000000,flt:3fa47ae147ae147b]",
      "\"h\\u00e9llo \\uD83D\\uDE00 \\n\\t\\\"\\\\\\/ \\b\\f\\r\"" ->
        "str:006800e9006c006c006f0020d83dde000020000a00090022005c002f00200008000c000d",
      // lone surrogate survives (CPython scanner keeps it)
      "\"\\ud800 lone\"" -> "str:d8000020006c006f006e0065",
      // duplicate keys: first position, last value
      "{\"a\": 1, \"b\": {\"c\": [true, false, null]}, \"a\": 9}" ->
        "{str:0061=int:9,str:0062={str:0063=[true,false,null]}}",
      // arbitrary-precision int
      "123456789012345678901234567890" -> "int:123456789012345678901234567890",
      // float overflow/underflow like CPython float()
      "1e400" -> "flt:7ff0000000000000",
      "-1e-400" -> "flt:8000000000000000",
      // non-standard constants, default parse_constant
      "NaN" -> "flt:7ff8000000000000",
      "Infinity" -> "flt:7ff0000000000000",
      "-Infinity" -> "flt:fff0000000000000",
      "[NaN]" -> "[flt:7ff8000000000000]",
      "{}" -> "{}",
      "[]" -> "[]",
      "\"\"" -> "str:",
      "\"\u4e2d\u6587\"" -> "str:4e2d6587",
      "0" -> "int:0",
      "-0" -> "int:0",
      "0.5" -> "flt:3fe0000000000000",
      "-0.5e-1" -> "flt:bfa999999999999a",
      "[[[[1]]]]" -> "[[[[int:1]]]]",
      "{\"\": 0}" -> "{str:=int:0}",
      "\t\n\r {\"x\":[ ]}" -> "{str:0078=[]}")
    for ((in, want) <- golden)
      assert(canon(Json.loads(in)) == want, s"input: ${in.take(60)}")
  }

  test("CPython json.loads error goldens (all raise)") {
    val bad = Seq(
      "", "   ", "{'a':1}", "{\"a\":1,}", "[1,]", "[1 2]", "01", "+1", ".5",
      "1.", "0x10", "\"abc", "\"ctl\u0001\"", "{\"a\" 1}", "{1:2}", "tru",
      "[1]]", "{\"a\":1} x", "nan", "inf", "--1", "1e", "1e+", "\"\\x41\"",
      "'str'", "[",
      // literal TAB inside a string is a control character in strict mode
      "\"tab\tliteral\"")
    for (in <- bad)
      assertThrows[IllegalArgumentException](Json.loads(in))
  }

  test("bytes encoding auto-detection (json.detect_encoding goldens)") {
    def hex(h: String): Array[Byte] =
      h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val golden: Seq[(String, String)] = Seq(
      // {"k": "vé"} in 8 encodings
      "7b226b223a202276c3a9227d" -> "{str:006b=str:007600e9}",
      "007b0022006b0022003a00200022007600e90022007d" -> "{str:006b=str:007600e9}",
      "7b0022006b0022003a00200022007600e90022007d00" -> "{str:006b=str:007600e9}",
      "0000007b000000220000006b000000220000003a000000200000002200000076000000e9000000220000007d" -> "{str:006b=str:007600e9}",
      "7b000000220000006b000000220000003a000000200000002200000076000000e9000000220000007d000000" -> "{str:006b=str:007600e9}",
      "efbbbf7b226b223a202276c3a9227d" -> "{str:006b=str:007600e9}",
      "fffe7b0022006b0022003a00200022007600e90022007d00" -> "{str:006b=str:007600e9}",
      "fffe00007b000000220000006b000000220000003a000000200000002200000076000000e9000000220000007d000000" -> "{str:006b=str:007600e9}",
      // [1,2]
      "5b312c325d" -> "[int:1,int:2]",
      "005b0031002c0032005d" -> "[int:1,int:2]",
      "5b0031002c0032005d00" -> "[int:1,int:2]",
      "0000005b000000310000002c000000320000005d" -> "[int:1,int:2]",
      "5b000000310000002c000000320000005d000000" -> "[int:1,int:2]",
      "fffe5b0031002c0032005d00" -> "[int:1,int:2]",
      "fffe00005b000000310000002c000000320000005d000000" -> "[int:1,int:2]",
      // "中" — a non-ASCII body in all widths
      "22e4b8ad22" -> "str:4e2d",
      "00224e2d0022" -> "str:4e2d",
      "22002d4e2200" -> "str:4e2d",
      "0000002200004e2d00000022" -> "str:4e2d",
      "220000002d4e000022000000" -> "str:4e2d",
      "fffe22002d4e2200" -> "str:4e2d",
      "fffe0000220000002d4e000022000000" -> "str:4e2d",
      // ' 7 ' — bare scalar with surrounding whitespace
      "203720" -> "int:7",
      "002000370020" -> "int:7",
      "200037002000" -> "int:7",
      "000000200000003700000020" -> "int:7",
      "200000003700000020000000" -> "int:7",
      "fffe200037002000" -> "int:7",
      "fffe0000200000003700000020000000" -> "int:7")
    for ((h, want) <- golden)
      assert(canon(Json.loads(hex(h))) == want, s"bytes: $h")
    // a 2-byte UTF-16 body (the len==2 pattern branch)
    assert(canon(Json.loads(hex("0037"))) == "int:7")
    assert(canon(Json.loads(hex("3700"))) == "int:7")
    // invalid UTF-8 raises like UnicodeDecodeError
    assertThrows[Exception](Json.loads(hex("22ff2222")))
  }

  test("navigation helpers") {
    val v = Json.loads("{\"items\": [{\"id\": 7}], \"n\": 1}")
    assert(v("items")(0)("id") == JInt(7))
    assert(v.asInstanceOf[JObj].keys == Vector("items", "n"))
    assertThrows[NoSuchElementException](v("missing"))
    assertThrows[IllegalStateException](v("n")("x"))
  }
}
