package graft.urlkit

import scala.collection.mutable

/** The reference's case-insensitive multi-value HTTP headers container
  * (`scrapy/http/headers.py` Headers over `utils/datatypes.py`
  * CaselessDict), modeled with its exact observable semantics:
  *
  *  - keys normalize to `key.title()` encoded bytes (Python `str.title`:
  *    titlecase after any non-cased char, lowercase otherwise — so
  *    `content-type` → `Content-Type`, `x-forwarded-for` →
  *    `X-Forwarded-For`);
  *  - values normalize to a LIST of byte strings via the instance
  *    encoding: None → [], str/bytes/int → single element, iterable →
  *    elements; anything else raises "Unsupported value type";
  *  - `apply`/`get` return the LAST value (None on an empty list — the
  *    `h[k] = None` tombstone shape), `getlist` the stored list itself
  *    (identity-shared, like the reference's `super().__getitem__`);
  *  - `setdefault` returns the stored list; `appendlist` re-sets a fresh
  *    normalized list; `toUnicodeDict` comma-joins; `toWire` renders
  *    `Key: value\r\n` lines per value (w3lib `headers_dict_to_raw`).
  *
  * Values are `Vector[Array[Byte]]` snapshots in comparisons but the
  * stored buffers are mutable to preserve the reference's aliasing
  * behavior. Pinned by HttpHeadersSpec — the full
  * `tests/test_http_headers.py` battery. */
final class HttpHeaders(encoding: String = "utf-8") {
  import HttpHeaders._

  // insertion-ordered: normalized key bytes (as an immutable wrapper) →
  // stored value buffer
  private val order = mutable.LinkedHashMap.empty[BKey, mutable.ArrayBuffer[Array[Byte]]]

  def this(seq: Iterable[(String, Any)], encoding: String) = {
    this(encoding)
    update(seq)
  }

  def this(seq: Iterable[(String, Any)]) = this(seq, "utf-8")

  private def charset: java.nio.charset.Charset = encoding.toLowerCase match {
    case "latin1" | "latin-1" | "iso-8859-1" => java.nio.charset.StandardCharsets.ISO_8859_1
    case "utf-8" | "utf8" => java.nio.charset.StandardCharsets.UTF_8
    case other => java.nio.charset.Charset.forName(other)
  }

  private def toBytes(x: Any): Array[Byte] = x match {
    case b: Array[Byte] => b
    case s: String => s.getBytes(charset)
    case i: Int => i.toString.getBytes(charset)
    case l: Long => l.toString.getBytes(charset)
    case other =>
      throw new IllegalArgumentException(
        s"Unsupported value type: ${other.getClass}")
  }

  /** `normkey`: Python `str.title()` then encode. */
  def normKey(key: String): Array[Byte] = pyTitle(key).getBytes(charset)

  /** `normvalue`: always a fresh list of byte strings. */
  def normValue(value: Any): mutable.ArrayBuffer[Array[Byte]] = {
    val out = mutable.ArrayBuffer.empty[Array[Byte]]
    value match {
      case null | None => ()
      case s: String => out += toBytes(s)
      case b: Array[Byte] => out += b
      case it: Iterable[_] => it.foreach(v => out += toBytes(v))
      case arr: Array[_] => arr.foreach(v => out += toBytes(v))
      case other => out += toBytes(other)
    }
    out
  }

  /** `h[key] = value`. */
  def set(key: String, value: Any): Unit =
    order(BKey(normKey(key))) = normValue(value)

  /** `h[key]` — last value; null when the stored list is empty; throws
    * on a missing key like Python KeyError. */
  def apply(key: String): Array[Byte] = {
    val lst = order.getOrElse(BKey(normKey(key)),
      throw new NoSuchElementException(key))
    if (lst.isEmpty) null else lst.last
  }

  /** `h.get(key, default)` — last value of the stored (or normalized
    * default) list; null when that list is empty. */
  def get(key: String, defVal: Any = null): Array[Byte] = {
    val lst = order.get(BKey(normKey(key))) match {
      case Some(l) => l
      case None => if (defVal == null) return null else normValue(defVal)
    }
    if (lst.isEmpty) null else lst.last
  }

  /** `getlist` — the stored buffer itself (aliased), or the normalized
    * default / empty for a missing key. */
  def getlist(key: String, defVal: Any = null): mutable.ArrayBuffer[Array[Byte]] =
    order.get(BKey(normKey(key))) match {
      case Some(l) => l
      case None =>
        if (defVal != null) normValue(defVal)
        else mutable.ArrayBuffer.empty
    }

  def setlist(key: String, values: Any): Unit = set(key, values)

  /** `setdefault` — stores (and returns) the normalized default only when
    * the key is absent; otherwise returns the existing stored list. */
  def setdefault(key: String, defVal: Any = null): mutable.ArrayBuffer[Array[Byte]] = {
    val k = BKey(normKey(key))
    order.get(k) match {
      case Some(l) => l
      case None =>
        val l = normValue(defVal)
        order(k) = l
        l
    }
  }

  def setlistdefault(key: String, defaultList: Any = Nil): mutable.ArrayBuffer[Array[Byte]] =
    setdefault(key, defaultList)

  /** `appendlist` — extend a copy and re-set (fresh stored list). */
  def appendlist(key: String, value: Any): Unit = {
    val lst = mutable.ArrayBuffer.from(getlist(key))
    lst ++= normValue(value)
    set(key, lst.toSeq)
  }

  def contains(key: String): Boolean = order.contains(BKey(normKey(key)))

  def delete(key: String): Unit = order.remove(BKey(normKey(key)))

  /** Normalized keys, insertion order. */
  def keys: Seq[Array[Byte]] = order.keys.map(_.bytes).toSeq

  def items: Seq[(Array[Byte], Seq[Array[Byte]])] =
    order.toSeq.map { case (k, v) => (k.bytes, v.toSeq) }

  /** Last value per key (None-able like the reference's values()). */
  def values: Seq[Array[Byte]] =
    order.values.map(l => if (l.isEmpty) null else l.last).toSeq

  def update(seq: Iterable[(String, Any)]): Unit = {
    // the reference coalesces duplicate keys in the INPUT first
    // (iseq.setdefault(...).extend), then replaces stored entries
    val iseq = mutable.LinkedHashMap.empty[BKey, mutable.ArrayBuffer[Array[Byte]]]
    seq.foreach { case (k, v) =>
      iseq.getOrElseUpdate(BKey(normKey(k)),
        mutable.ArrayBuffer.empty) ++= normValue(v)
    }
    iseq.foreach { case (k, v) => order(k) = v }
  }

  /** `to_unicode_dict` — str keys, comma-joined str values. */
  def toUnicodeDict: Map[String, String] =
    items.map { case (k, vs) =>
      (new String(k, charset), vs.map(new String(_, charset)).mkString(","))
    }.toMap

  /** `to_string` / w3lib `headers_dict_to_raw`: `Key: value` lines joined
    * with CRLF, one line per value. */
  def toWire: Array[Byte] = {
    val sep = ": ".getBytes
    val crlf = "\r\n".getBytes
    val out = new java.io.ByteArrayOutputStream()
    var first = true
    items.foreach { case (k, vs) =>
      vs.foreach { v =>
        if (!first) out.write(crlf)
        first = false
        out.write(k); out.write(sep); out.write(v)
      }
    }
    out.toByteArray
  }

  def copy(): HttpHeaders = {
    val h = new HttpHeaders(encoding)
    items.foreach { case (k, vs) =>
      h.order(BKey(k)) = mutable.ArrayBuffer.from(vs)
    }
    h
  }

  def size: Int = order.size

  override def equals(o: Any): Boolean = o match {
    case h: HttpHeaders =>
      h.items.map { case (k, v) => (BKey(k), v.map(_.toSeq)) }.toMap ==
        items.map { case (k, v) => (BKey(k), v.map(_.toSeq)) }.toMap
    case _ => false
  }

  override def hashCode(): Int =
    items.map { case (k, v) => (BKey(k), v.map(_.toSeq)) }.toMap.hashCode()
}

object HttpHeaders {

  /** Byte-array key with value equality. */
  final case class BKey(bytes: Array[Byte]) {
    override def equals(o: Any): Boolean = o match {
      case BKey(b) => java.util.Arrays.equals(bytes, b)
      case _ => false
    }
    override def hashCode(): Int = java.util.Arrays.hashCode(bytes)
  }

  /** Python `str.title()`: titlecase a cased char that follows a
    * non-cased char, lowercase the rest; cased = upper/lower/titlecase
    * letters. Code-point faithful (header names are ASCII in practice). */
  def pyTitle(s: String): String = {
    val sb = new StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cased = Character.isUpperCase(cp) || Character.isLowerCase(cp) ||
        Character.getType(cp) == Character.TITLECASE_LETTER
      val mapped =
        if (cased && !prevCased) Character.toTitleCase(cp)
        else if (cased) Character.toLowerCase(cp)
        else cp
      sb.appendAll(Character.toChars(mapped))
      prevCased = cased
      i += Character.charCount(cp)
    }
    sb.toString
  }
}
