package graft.extract

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, IOException}
import java.util.zip.{DataFormatException, GZIPInputStream, Inflater}

/** HTTP response decompression — reference
  * `scrapy/downloadermiddlewares/httpcompression.py:57-214` +
  * `scrapy/utils/gz.py:15-41` + `scrapy/utils/_compression.py:34-63`.
  *
  * Supported codings: gzip / x-gzip / deflate (zlib-wrapped with a raw-
  * deflate fallback, the Microsoft-server quirk `_compression.py:38-43`).
  * brotli/zstd are optional in the reference and their codecs are not in
  * this container; like a reference install without those packages, they
  * are treated as unknown codings (kept, not decoded).
  *
  * Chained codings decode RIGHTMOST-FIRST and stop at the first unsupported
  * coding, which stays in the returned `kept` list
  * (`httpcompression.py:176-194` `_split_encodings`). gunzip is resilient
  * to CRC/truncation errors: mid-stream failures return the bytes decoded
  * so far if non-empty (`gz.py:15-38`). Exceeding `maxSize` during
  * decompression throws [[HttpCompression.MaxSizeExceeded]] — callers drop
  * the response (the reference raises IgnoreRequest,
  * `httpcompression.py:127-135`).
  */
object HttpCompression {

  final class MaxSizeExceeded(val decompressedSize: Long, val maxSize: Long)
    extends RuntimeException(
      s"decompressed $decompressedSize B exceeded maximum $maxSize B")

  private val ChunkSize = 65536

  private def checkMax(size: Long, maxSize: Long): Unit =
    if (maxSize > 0 && size > maxSize) throw new MaxSizeExceeded(size, maxSize)

  /** Codings this build can decode — reference ACCEPTED_ENCODINGS with the
    * optional zstd present (zstd-jni ships with Spark), plus the x-gzip
    * alias; brotli has no codec in this container and stays an unknown
    * coding (kept, body opaque), like a reference install without the
    * brotli package (`httpcompression.py:31-54`). */
  val SupportedEncodings: Set[String] = Set("gzip", "x-gzip", "deflate", "zstd")

  /** Split a Content-Encoding header into (toDecode rightmost-first, kept) —
    * reference `_split_encodings`. */
  def splitEncodings(header: String): (List[String], List[String]) = {
    val toKeep = scala.collection.mutable.ListBuffer(
      header.split(",").map(_.trim.toLowerCase(java.util.Locale.ROOT))
        .filter(_.nonEmpty).toSeq: _*)
    val toDecode = scala.collection.mutable.ListBuffer.empty[String]
    var stop = false
    while (toKeep.nonEmpty && !stop) {
      val enc = toKeep.remove(toKeep.size - 1)
      if (SupportedEncodings.contains(enc)) toDecode += enc
      else { toKeep += enc; stop = true }
    }
    (toDecode.toList, toKeep.toList)
  }

  /** CRC/truncation-resilient gunzip (`scrapy/utils/gz.py:15-38`): return as
    * much data as possible; fail only when nothing was decodable. */
  def gunzip(data: Array[Byte], maxSize: Long = 0): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(data), ChunkSize)
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](ChunkSize)
    var done = false
    while (!done) {
      val n =
        try in.read(buf)
        catch {
          case e @ (_: IOException | _: EOFException) =>
            if (out.size() > 0) -1 // partial output is acceptable
            else throw e
        }
      if (n < 0) done = true
      else {
        out.write(buf, 0, n)
        checkMax(out.size().toLong, maxSize)
      }
    }
    out.toByteArray
  }

  /** zlib inflate with raw-deflate fallback (`_compression.py:34-49`). */
  def inflate(data: Array[Byte], maxSize: Long = 0): Array[Byte] = {
    def run(raw: Boolean): Array[Byte] = {
      val inf = new Inflater(raw)
      inf.setInput(data)
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](ChunkSize)
      while (!inf.finished() && !(inf.needsInput() && inf.getRemaining == 0)) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw new DataFormatException("truncated")
        out.write(buf, 0, n)
        checkMax(out.size().toLong, maxSize)
      }
      inf.end()
      out.toByteArray
    }
    try run(raw = false)
    catch {
      case _: DataFormatException | _: java.util.zip.ZipException =>
        try run(raw = true)
        catch {
          case e: DataFormatException => throw new IOException(e) // callers catch IO
        }
    }
  }

  /** Streaming zstd decode with the max-size guard
    * (`scrapy/utils/_compression.py:50-63` _unzstd). zstd-jni errors extend
    * IOException, which callers already map to the decode-error drop. */
  def unzstd(data: Array[Byte], maxSize: Long = 0): Array[Byte] = {
    val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
      new ByteArrayInputStream(data))
    try {
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](ChunkSize)
      var n = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        checkMax(out.size().toLong, maxSize)
        n = in.read(buf)
      }
      out.toByteArray
    } finally in.close()
  }

  /** Decode a body per its Content-Encoding header. Returns the (possibly
    * partially) decoded body and the codings that could NOT be decoded
    * (empty = fully decoded; non-empty = treat the body as opaque, the way
    * the reference falls back to a non-Text response class). When NOTHING is
    * decodable (`toDecode` empty) the input array is returned as-is —
    * callers skip the httpcompression counters then, matching the
    * reference's early `if not to_decode: return response`. */
  def decode(body: Array[Byte], contentEncoding: String,
      maxSize: Long = 0): (Array[Byte], List[String]) = {
    val (toDecode, kept) = splitEncodings(contentEncoding)
    var b = body
    for (enc <- toDecode) {
      b = enc match {
        case "gzip" | "x-gzip" => gunzip(b, maxSize)
        case "deflate" => inflate(b, maxSize)
        case "zstd" => unzstd(b, maxSize)
        case other => throw new IllegalStateException(s"unreachable: $other")
      }
    }
    (b, kept)
  }

  // -- corpus-side encoders (deterministic: Java's GZIP header has mtime=0) --

  def gzipBytes(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }

  def deflateBytes(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](ChunkSize)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Deterministic for a fixed zstd-jni version + level (same jar on both
    * sides of the conformance compare). */
  def zstdBytes(data: Array[Byte], level: Int = 3): Array[Byte] =
    com.github.luben.zstd.Zstd.compress(data, level)
}
