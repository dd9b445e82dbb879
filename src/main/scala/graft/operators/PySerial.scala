package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** CPython binary serialization for feed items — the reference's
  * PickleItemExporter / MarshalItemExporter (`scrapy/exporters.py:297-322`)
  * write `pickle.dump(dict(fields), file, protocol)` (default protocol 4)
  * and `marshal.dump(dict(fields), file)` (format version 4) per item.
  * Both formats are publicly specified (CPython `Lib/pickle.py`,
  * `Lib/pickletools.py`, `Python/marshal.c`); this is a byte-for-byte
  * writer for the value domain feed items actually inhabit: dict / list /
  * tuple / str / bytes / int / float / bool / None.
  *
  * Byte parity is defined against what CPython 3.11 emits for an item dict
  * built the way the reference builds one at runtime — keys are interned
  * identifier constants, values are freshly parsed objects. The
  * runtime-visible CPython object-sharing rules that leak into both formats
  * are modeled explicitly:
  *
  *  - interned strings (field names) are singletons: pickle memo hits
  *    (BINGET) and marshal TYPE_*_INTERNED + FLAG_REF, shared by value;
  *  - the empty string is an interned singleton; 1-char strings with
  *    codepoint < 256 are cached singletons (marshal: non-interned but
  *    FLAG_REF'd; pickle: memo-shared by value). Caveat: CPython's
  *    marshal renders a cached 1-char as TYPE_SHORT_ASCII_INTERNED if any
  *    code in the process ever used that character as an interned constant
  *    — process-global state no static model can know; graft pins the
  *    fresh-interpreter render (non-interned), sharing behavior identical;
  *  - small ints in the CPython cache [-5, 256] are singletons (marshal
  *    FLAG_REF + 'r' refs on reuse; pickle never memoizes ints);
  *  - the empty bytes object is a singleton; all other runtime values are
  *    fresh (refcount 1 ⇒ marshal unflagged, pickle memo by node identity).
  *
  * Pinned by PySerialSpec goldens generated from CPython 3.11 with
  * runtime-fresh construction (see the spec header).
  */
sealed trait Py
object Py {
  case object PyNone extends Py
  final case class PyBool(v: Boolean) extends Py
  final case class PyInt(v: BigInt) extends Py
  final case class PyFloat(v: Double) extends Py
  /** `interned = true` marks identifier-like constants (field names). */
  final case class PyStr(v: String, interned: Boolean = false) extends Py
  final case class PyBytes(v: Array[Byte]) extends Py
  final case class PyList(v: Seq[Py]) extends Py
  final case class PyTuple(v: Seq[Py]) extends Py
  /** Insertion-ordered, like a CPython dict. */
  final case class PyDict(v: Seq[(Py, Py)]) extends Py

  def int(v: Long): Py = PyInt(BigInt(v))

  /** CPython's utf-8 "surrogatepass" codec: valid pairs encode as the
    * 4-byte code point, lone surrogates as the 3-byte encoding of the
    * UTF-16 unit itself (both pickle and marshal use it). */
  def utf8SurrogatePass(s: String): Array[Byte] = {
    val out = new ByteArrayOutputStream(s.length + (s.length >> 1))
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val cp =
        if (Character.isHighSurrogate(c) && i + 1 < s.length &&
            Character.isLowSurrogate(s.charAt(i + 1))) {
          i += 1; Character.toCodePoint(c, s.charAt(i))
        } else c.toInt
      if (cp < 0x80) out.write(cp)
      else if (cp < 0x800) {
        out.write(0xc0 | (cp >> 6)); out.write(0x80 | (cp & 0x3f))
      } else if (cp < 0x10000) { // includes lone surrogates (surrogatepass)
        out.write(0xe0 | (cp >> 12)); out.write(0x80 | ((cp >> 6) & 0x3f))
        out.write(0x80 | (cp & 0x3f))
      } else {
        out.write(0xf0 | (cp >> 18)); out.write(0x80 | ((cp >> 12) & 0x3f))
        out.write(0x80 | ((cp >> 6) & 0x3f)); out.write(0x80 | (cp & 0x3f))
      }
      i += 1
    }
    out.toByteArray
  }

  /** Value-identity key for CPython singleton objects, or null when the
    * node is a fresh runtime object (identity semantics). Shared between
    * the pickle memo and the marshal ref table. */
  private[operators] def singletonKey(p: Py): AnyRef = p match {
    case PyStr(s, interned) if interned || s.isEmpty ||
        (s.length == 1 && s.charAt(0) < 0x100) => ("str", s)
    case PyBytes(b) if b.isEmpty => "bytes0"
    // the empty tuple is a CPython singleton: marshal flags + refs it;
    // pickle never memoizes it (save_tuple returns before PUT), so this
    // key is registered only by the marshal writer
    case PyTuple(v) if v.isEmpty => "tuple0"
    case _ => null
  }
}

/** Pickle protocol 4 writer (`pickle.dumps(obj, 4)` parity). */
object Pickle {
  import Py._

  private val FrameSizeTarget = 64 * 1024
  private val FrameSizeMin = 4
  private val BatchSize = 1000 // pickle._BATCHSIZE

  def dumps(obj: Py): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    out.write(0x80); out.write(4) // PROTO 4
    val p = new Pickler(out)
    p.save(obj)
    p.buf.write('.') // STOP
    p.endFraming()
    out.toByteArray
  }

  private final class Pickler(out: ByteArrayOutputStream) {
    val buf = new ByteArrayOutputStream(256)
    // memo: singleton values by value, fresh nodes by identity
    private val memoValue = new java.util.HashMap[AnyRef, Integer]()
    private val memoId = new java.util.IdentityHashMap[Py, Integer]()
    private var memoSize = 0

    private def commitFrame(force: Boolean): Unit = {
      if (buf.size() >= FrameSizeTarget || force) {
        if (buf.size() >= FrameSizeMin) {
          out.write(0x95) // FRAME
          val len = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            .putLong(buf.size().toLong).array()
          out.write(len, 0, 8)
        }
        buf.writeTo(out); buf.reset()
      }
    }
    def endFraming(): Unit = commitFrame(force = true)

    private def u8(v: Int): Unit = buf.write(v & 0xff)
    private def u16le(v: Int): Unit = { u8(v); u8(v >> 8) }
    private def i32le(v: Int): Unit = { u8(v); u8(v >> 8); u8(v >> 16); u8(v >> 24) }

    private def memoLookup(p: Py): Integer = {
      val k = singletonKey(p)
      if (k != null) memoValue.get(k) else memoId.get(p)
    }
    private def memoize(p: Py): Unit = {
      val idx = memoSize; memoSize += 1
      val k = singletonKey(p)
      if (k != null) memoValue.put(k, idx) else memoId.put(p, idx)
      u8(0x94) // MEMOIZE
    }
    private def binGet(idx: Int): Unit =
      if (idx < 256) { u8('h'); u8(idx) } else { u8('j'); i32le(idx) }

    /** `n >= FRAME_SIZE_TARGET` str/bytes payloads are written outside any
      * frame (pickle.Pickler._write_large_bytes). */
    private def writeLarge(header: Array[Byte], payload: Array[Byte]): Unit = {
      commitFrame(force = true)
      out.write(header, 0, header.length)
      out.write(payload, 0, payload.length)
    }

    def save(p: Py): Unit = {
      commitFrame(force = false) // opcode-boundary frame split
      val hit = memoLookup(p)
      if (hit != null) { binGet(hit.intValue()); return }
      p match {
        case PyNone => u8('N')
        case PyBool(true) => u8(0x88)
        case PyBool(false) => u8(0x89)
        case PyInt(v) => saveInt(v)
        case PyFloat(v) =>
          u8('G')
          // raw bits: NaN payloads round-trip like CPython's struct pack
          val bits = java.lang.Double.doubleToRawLongBits(v)
          var i = 56
          while (i >= 0) { u8((bits >> i).toInt); i -= 8 }
        case s @ PyStr(v, _) =>
          val enc = utf8SurrogatePass(v)
          if (enc.length < 256) {
            u8(0x8c); u8(enc.length); buf.write(enc, 0, enc.length) // SHORT_BINUNICODE
          } else if (enc.length >= FrameSizeTarget) {
            val h = ByteBuffer.allocate(5).order(ByteOrder.LITTLE_ENDIAN)
              .put('X'.toByte).putInt(enc.length).array()
            writeLarge(h, enc) // BINUNICODE out-of-frame
          } else {
            u8('X'); i32le(enc.length); buf.write(enc, 0, enc.length)
          }
          memoize(s)
        case b @ PyBytes(v) =>
          if (v.length < 256) {
            u8('C'); u8(v.length); buf.write(v, 0, v.length) // SHORT_BINBYTES
          } else if (v.length >= FrameSizeTarget) {
            val h = ByteBuffer.allocate(5).order(ByteOrder.LITTLE_ENDIAN)
              .put('B'.toByte).putInt(v.length).array()
            writeLarge(h, v) // BINBYTES out-of-frame
          } else {
            u8('B'); i32le(v.length); buf.write(v, 0, v.length)
          }
          memoize(b)
        case l @ PyList(items) =>
          u8(']'); memoize(l) // EMPTY_LIST
          batch(items)(save)(single = 'a', multi = 'e') // APPEND / APPENDS
        case t @ PyTuple(items) =>
          if (items.isEmpty) u8(')') // EMPTY_TUPLE, not memoized
          else if (items.size <= 3) {
            items.foreach(save); u8(0x84 + items.size); memoize(t) // TUPLE1/2/3
          } else {
            u8('('); items.foreach(save); u8('t'); memoize(t)
          }
        case d @ PyDict(items) =>
          u8('}'); memoize(d) // EMPTY_DICT
          batch(items) { kv => save(kv._1); save(kv._2) }(
            single = 's', multi = 'u') // SETITEM / SETITEMS
      }
    }

    /** The C pickler's batch_list/batch_dict (Modules/_pickle.c): the
      * single-op form (APPEND/SETITEM) fires only when the WHOLE container
      * has exactly one element; otherwise every 1000-chunk — including a
      * trailing 1-element one — is MARK…APPENDS/SETITEMS. */
    private def batch[A](items: Seq[A])(one: A => Unit)(
        single: Char, multi: Char): Unit =
      if (items.size == 1) { one(items.head); u8(single) }
      else items.grouped(BatchSize).foreach { chunk =>
        if (chunk.nonEmpty) { u8('('); chunk.foreach(one); u8(multi) }
      }

    private def saveInt(v: BigInt): Unit = {
      if (v >= 0 && v <= 0xff) { u8('K'); u8(v.toInt) } // BININT1
      else if (v >= 0 && v <= 0xffff) { u8('M'); u16le(v.toInt) } // BININT2
      else if (v >= Int.MinValue && v <= Int.MaxValue) { u8('J'); i32le(v.toInt) }
      else {
        // LONG1/LONG4: minimal two's-complement little-endian (encode_long)
        val be = v.toByteArray // big-endian two's complement, minimal
        val le = be.reverse
        if (le.length < 256) { u8(0x8a); u8(le.length) }
        else { u8(0x8b); i32le(le.length) }
        buf.write(le, 0, le.length)
      }
    }
  }
}

/** Marshal format version 4 writer (`marshal.dumps(obj)` parity).
  * FLAG_REF (0x80) models CPython's refcount>1 rule under the runtime
  * conventions documented on [[Py]]: singleton values are flagged and
  * enter the ref table (reuse emits TYPE_REF 'r'); fresh objects are not. */
object PyMarshal {
  import Py._

  def dumps(obj: Py): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    new Writer(out).write(obj)
    out.toByteArray
  }

  private final class Writer(out: ByteArrayOutputStream) {
    private val refs = new java.util.HashMap[AnyRef, Integer]()
    private var refCount = 0

    private def u8(v: Int): Unit = out.write(v & 0xff)
    private def i32le(v: Int): Unit = { u8(v); u8(v >> 8); u8(v >> 16); u8(v >> 24) }

    def write(p: Py): Unit = p match {
      case PyNone => u8('N')
      case PyBool(true) => u8('T')
      case PyBool(false) => u8('F')
      case PyFloat(v) => // TYPE_BINARY_FLOAT, LE double; fresh ⇒ unflagged
        u8('g')
        val bits = java.lang.Double.doubleToRawLongBits(v)
        var i = 0
        while (i < 64) { u8((bits >> i).toInt); i += 8 }
      case PyInt(v) =>
        if (v >= -5 && v <= 256) { // small-int cache: flagged singleton
          val k = ("int", v)
          val hit = refs.get(k)
          if (hit != null) { u8('r'); i32le(hit.intValue()) }
          else {
            refs.put(k, refCount); refCount += 1
            u8('i' | 0x80); i32le(v.toInt)
          }
        } else if (v >= Int.MinValue && v <= Int.MaxValue) {
          u8('i'); i32le(v.toInt)
        } else writeLong(v)
      case s @ PyStr(v, interned) =>
        val k = singletonKey(s)
        val hit = if (k != null) refs.get(k) else null
        if (hit != null) { u8('r'); i32le(hit.intValue()) }
        else {
          val flag = if (k != null) 0x80 else 0
          if (k != null) { refs.put(k, refCount); refCount += 1 }
          val ascii = v.forall(_ < 0x80)
          val internedNow = interned || v.isEmpty // '' is an interned singleton
          val enc = utf8SurrogatePass(v)
          if (ascii && v.length < 256) {
            u8((if (internedNow) 'Z' else 'z') | flag); u8(v.length)
          } else if (ascii) {
            u8((if (internedNow) 'A' else 'a') | flag); i32le(v.length)
          } else {
            u8((if (internedNow) 't' else 'u') | flag); i32le(enc.length)
          }
          out.write(enc, 0, enc.length)
        }
      case b @ PyBytes(v) =>
        val k = singletonKey(b)
        val hit = if (k != null) refs.get(k) else null
        if (hit != null) { u8('r'); i32le(hit.intValue()) }
        else {
          val flag = if (k != null) { refs.put(k, refCount); refCount += 1; 0x80 } else 0
          u8('s' | flag); i32le(v.length); out.write(v, 0, v.length)
        }
      case PyList(items) =>
        u8('['); i32le(items.size); items.foreach(write)
      case t @ PyTuple(items) =>
        if (items.isEmpty) { // the () singleton: flagged + ref on reuse
          val k = singletonKey(t)
          val hit = refs.get(k)
          if (hit != null) { u8('r'); i32le(hit.intValue()) }
          else { refs.put(k, refCount); refCount += 1; u8(')' | 0x80); u8(0) }
        } else {
          if (items.size < 256) { u8(')'); u8(items.size) } // TYPE_SMALL_TUPLE
          else { u8('('); i32le(items.size) }
          items.foreach(write)
        }
      case PyDict(items) =>
        u8('{')
        items.foreach { case (k, v) => write(k); write(v) }
        u8('0') // TYPE_NULL terminator
    }

    /** TYPE_LONG: signed i32 digit count, 15-bit digits as LE u16. */
    private def writeLong(v: BigInt): Unit = {
      u8('l')
      val neg = v.signum < 0
      var a = v.abs
      val digits = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (a.signum != 0) { digits += (a & 0x7fff).toInt; a >>= 15 }
      i32le(if (neg) -digits.size else digits.size)
      digits.foreach { d => u8(d); u8(d >> 8) }
    }
  }
}

/** Pickle reader for the value domain [[Pickle]] writes (`pickle.loads`
  * over None/bool/int/float/str/bytes/list/tuple/dict trees — the
  * `spider.state` / disk-queue payload domain). Handles protocol 2-4
  * framing and memoization: PROTO, FRAME, MEMOIZE + BINPUT/LONG_BINPUT,
  * BINGET/LONG_BINGET, the int family (BININT1/2, BININT, LONG1/LONG4),
  * BINFLOAT, (SHORT_)BINUNICODE(8), (SHORT_)BINBYTES(8), list/tuple/dict
  * construction via MARK + APPEND(S)/SETITEM(S)/TUPLE{,1,2,3}. Strings
  * decode with the utf-8 "surrogatepass" codec (the inverse of
  * [[Py.utf8SurrogatePass]]) so lone surrogates round-trip. Class
  * instances (GLOBAL/REDUCE — e.g. datetime) are OUT of the domain and
  * raise, like the documented exporter scope. The Py domain is acyclic,
  * so memo entries are complete values by the time they are referenced
  * (the writer cannot emit a self-referential structure). */
object Unpickle {
  import Py._

  def loads(data: Array[Byte]): Py = {
    var i = 0
    def u8(): Int = { val v = data(i) & 0xff; i += 1; v }
    def take(n: Int): Array[Byte] = {
      val a = java.util.Arrays.copyOfRange(data, i, i + n); i += n; a }
    def u16le(): Int = u8() | (u8() << 8)
    def i32le(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    def u64le(): Long = {
      var v = 0L; var s = 0
      while (s < 64) { v |= (u8().toLong << s); s += 8 }; v
    }
    val stack = scala.collection.mutable.ArrayBuffer.empty[Any]
    val marks = scala.collection.mutable.ArrayBuffer.empty[Int]
    // memo stores the LIVE value (a container's builder is memoized
    // before its fills — APPENDS/SETITEMS run after MEMOIZE); by the time
    // any BINGET dereferences it, the sequential tree walk has completed
    // the fills, and the final freeze resolves builders structurally
    val memo = scala.collection.mutable.ArrayBuffer.empty[Any]
    // containers under construction are mutable builders on the stack;
    // freeze converts (shared nodes were frozen before memo reference).
    // ADVICE r5: a legal CPython pickle CAN memo-cycle a container into
    // itself — cycles are out of the exporter's acyclic Py domain, so a
    // builder revisited ON THE CURRENT PATH (identity, not equality — DAG
    // sharing stays legal) raises the same clean out-of-domain error as an
    // unsupported opcode instead of recursing to StackOverflow.
    val inPath = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    def freeze(v: Any): Py = v match {
      case p: Py => p
      case b: scala.collection.mutable.ArrayBuffer[_] =>
        if (!inPath.add(b)) throw new IllegalArgumentException(
          "unpickle: self-referential container (cycle) is outside the supported domain")
        val r = PyList(b.map(x => freeze(x)).toSeq)
        inPath.remove(b)
        r
      case m: scala.collection.mutable.LinkedHashMap[_, _] =>
        if (!inPath.add(m)) throw new IllegalArgumentException(
          "unpickle: self-referential container (cycle) is outside the supported domain")
        val r = PyDict(m.toSeq.map { case (k, v2) => (freeze(k), freeze(v2)) })
        inPath.remove(m)
        r
    }
    def popMark(): Seq[Any] = {
      val m = marks.remove(marks.size - 1)
      val items = stack.slice(m, stack.size).toSeq
      stack.remove(m, stack.size - m)
      items
    }
    def surrogatePassDecode(b: Array[Byte]): String = {
      val sb = new java.lang.StringBuilder(b.length)
      var j = 0
      while (j < b.length) {
        val c0 = b(j) & 0xff
        if (c0 < 0x80) { sb.append(c0.toChar); j += 1 }
        else if ((c0 & 0xe0) == 0xc0) {
          sb.append((((c0 & 0x1f) << 6) | (b(j + 1) & 0x3f)).toChar); j += 2
        } else if ((c0 & 0xf0) == 0xe0) {
          // includes the surrogate range D800-DFFF (surrogatepass)
          sb.append((((c0 & 0x0f) << 12) | ((b(j + 1) & 0x3f) << 6) |
            (b(j + 2) & 0x3f)).toChar); j += 3
        } else {
          val cp = ((c0 & 0x07) << 18) | ((b(j + 1) & 0x3f) << 12) |
            ((b(j + 2) & 0x3f) << 6) | (b(j + 3) & 0x3f)
          sb.appendCodePoint(cp); j += 4
        }
      }
      sb.toString
    }
    def decodeLongLE(le: Array[Byte]): BigInt =
      if (le.isEmpty) BigInt(0) else BigInt(le.reverse) // two's complement BE
    // ADVICE r5: string/bytes lengths are validated instead of being fed
    // to copyOfRange as raw signed values (a negative/oversized length is
    // a corrupt or out-of-domain stream, same clean error class)
    def len32(n: Int): Int =
      if (n < 0 || n > data.length - i) throw new IllegalArgumentException(
        s"unpickle: invalid length $n at offset $i") else n
    def len64(n: Long): Int =
      if (n < 0 || n > data.length - i) throw new IllegalArgumentException(
        s"unpickle: invalid length $n at offset $i") else n.toInt
    while (true) {
      val op = u8()
      op match {
        case 0x80 => u8() // PROTO
        case 0x95 => u64le() // FRAME (length advisory)
        case '.' =>
          return freeze(stack.last)
        case 'N' => stack += PyNone
        case 0x88 => stack += PyBool(true)
        case 0x89 => stack += PyBool(false)
        case 'K' => stack += PyInt(BigInt(u8()))
        case 'M' => stack += PyInt(BigInt(u16le()))
        case 'J' => stack += PyInt(BigInt(i32le()))
        case 0x8a => stack += PyInt(decodeLongLE(take(u8()))) // LONG1
        case 0x8b => stack += PyInt(decodeLongLE(take(len32(i32le())))) // LONG4
        case 'G' =>
          var bits = 0L
          var k = 0
          while (k < 8) { bits = (bits << 8) | u8(); k += 1 }
          stack += PyFloat(java.lang.Double.longBitsToDouble(bits))
        case 0x8c => stack += PyStr(surrogatePassDecode(take(u8())))
        case 'X' => stack += PyStr(surrogatePassDecode(take(len32(i32le()))))
        case 0x8d => stack += PyStr(surrogatePassDecode(take(len64(u64le()))))
        case 'C' => stack += PyBytes(take(u8()))
        case 'B' => stack += PyBytes(take(len32(i32le())))
        case 0x8e => stack += PyBytes(take(len64(u64le())))
        case ']' => stack += scala.collection.mutable.ArrayBuffer.empty[Any]
        case '}' => stack += scala.collection.mutable.LinkedHashMap.empty[Py, Any]
        case ')' => stack += PyTuple(Nil)
        case '(' => marks += stack.size
        case 't' => stack += PyTuple(popMark().map(freeze))
        case 0x85 | 0x86 | 0x87 =>
          val n = op - 0x84
          val items = stack.slice(stack.size - n, stack.size).toSeq.map(freeze)
          stack.remove(stack.size - n, n)
          stack += PyTuple(items)
        case 'a' => // APPEND
          val v = stack.remove(stack.size - 1)
          stack.last.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]] += v
        case 'e' => // APPENDS
          val items = popMark()
          stack.last.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]] ++= items
        case 's' => // SETITEM
          val v = stack.remove(stack.size - 1)
          val k = freeze(stack.remove(stack.size - 1))
          stack.last.asInstanceOf[
            scala.collection.mutable.LinkedHashMap[Py, Any]].put(k, v)
        case 'u' => // SETITEMS
          val items = popMark()
          val m = stack.last.asInstanceOf[
            scala.collection.mutable.LinkedHashMap[Py, Any]]
          items.grouped(2).foreach { kv => m.put(freeze(kv.head), kv(1)) }
        case 0x94 => memo += stack.last // MEMOIZE
        case 'q' => u8(); memo += stack.last // BINPUT (proto 2)
        case 'r' => i32le(); memo += stack.last // LONG_BINPUT
        case 'h' => stack += memo(u8()) // BINGET
        case 'j' => stack += memo(i32le()) // LONG_BINGET
        case other => throw new IllegalArgumentException(
          f"unsupported pickle opcode 0x$other%02x at ${i - 1} " +
            "(GLOBAL/REDUCE class instances are outside the Py domain)")
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
