package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.operators.{Pickle, Py, PyMarshal}
import Py._

/** Differential battery: 128 value trees (boundary shapes + seeded-random
  * feed items) serialized by CPython 3.11 (`pickle.dumps(x, 4)` /
  * `marshal.dumps(x)`) with runtime-fresh construction, compared
  * byte-for-byte against the Scala writers. The fixture
  * (`src/test/resources/pyserial_diff.json`) carries the value descriptors
  * and both expected hex streams; regenerate with the generator documented
  * in PySerialSpec if the value domain grows. */
class PySerialDiffSpec extends AnyFunSuite {

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
      PyStr(sb.toString,
        interned = n.has("interned") && n.get("interned").asBoolean())
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

  private def hex(b: Array[Byte]): String = b.map(x => f"$x%02x").mkString

  test("128 CPython-generated value trees serialize byte-identically") {
    val in = getClass.getResourceAsStream("/pyserial_diff.json")
    assert(in != null, "fixture missing")
    val root = new ObjectMapper().readTree(in)
    var i = 0
    root.forEach { c =>
      val v = toPy(c.get("value"))
      assert(hex(Pickle.dumps(v)) === c.get("pickle").asText(), s"pickle case $i")
      assert(hex(PyMarshal.dumps(v)) === c.get("marshal").asText(), s"marshal case $i")
      i += 1
    }
    assert(i === 128)
  }
}
